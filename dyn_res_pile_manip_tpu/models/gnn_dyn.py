"""PropNet-style GNN dynamics model conditioned on particle density.

TPU-native re-design of the reference's PropNetDiffDenModel
(model/gnn_dyn.py:113-254). Differences by design, same math:

- the reference builds ragged relation matrices Rr/Rs via ``nonzero`` and
  scatters (gnn_dyn.py:242-251) — data-dependent shapes that cannot jit.
  Here the graph is a dense fixed-K top-k edge tensor (B, N, K) with a
  validity mask; receiver aggregation is a masked sum over K. The relation
  set is identical (top-k<=10 nearest within adj_thresh, gnn_dyn.py:229-237),
  so the message passing computes the same function.
- encoders/propagators run on (B*N[*K], F) matmuls that map onto the MXU.

Inputs/outputs follow the reference contract: predict_one_step(a_cur, s_cur,
s_delta, particle_den) -> next positions; density normalized by 5000
(gnn_dyn.py:158); 3 propagation steps with residual (gnn_dyn.py:182-193).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    features: tuple
    relu_last: bool = True

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.relu_last:
                x = nn.relu(x)
        return x


class PropNetDiffDen(nn.Module):
    """nf_effect=64, pstep=3 message passing (gnn_dyn.py:113-198)."""

    nf_effect: int = 64
    pstep: int = 3

    @nn.compact
    def __call__(self, a_cur, s_cur, s_delta, nbr_idx, nbr_ok, particle_den,
                 particle_mask=None):
        """
        a_cur: (B, N) attributes; s_cur/s_delta: (B, N, 3);
        nbr_idx: (B, N, K) int sender index per receiver;
        nbr_ok: (B, N, K) edge validity; particle_den: (B,);
        particle_mask: (B, N) validity of (padded) particles.
        Returns predicted next positions (B, N, 3).
        """
        nf = self.nf_effect
        B, N, K = nbr_idx.shape
        den = (particle_den / 5000.0)[:, None, None]

        if particle_mask is None:
            particle_mask = jnp.ones((B, N), dtype=s_cur.dtype)

        # Sender-feature selection as a one-hot batched matmul: TPU gathers
        # are serial and slow, MXU matmuls are not. R plays the role of the
        # reference's Rs relation matrix (gnn_dyn.py:248-251) with fixed
        # (B, N*K, N) shape.
        R = jax.nn.one_hot(nbr_idx.reshape(B, N * K), N, dtype=s_cur.dtype)

        def gather_nbr(x, exact=False):
            # x: (B, N, F) -> (B, N, K, F) sender features. ``exact`` uses
            # full f32 MXU precision (positions feed relative offsets and
            # must be selected exactly); feature matmuls keep the fast path.
            out = jnp.einsum(
                "bmn,bnf->bmf", R, x,
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST if exact
                           else jax.lax.Precision.DEFAULT))
            return out.reshape(B, N, K, -1)

        edge_w = (nbr_ok.astype(s_cur.dtype)
                  * particle_mask[:, :, None]
                  * gather_nbr(particle_mask[..., None])[..., 0])

        # particle encoder: [s_delta(3), attr(1), den(1)] (gnn_dyn.py:127-128)
        p_in = jnp.concatenate(
            [s_delta, a_cur[..., None], jnp.broadcast_to(den, (B, N, 1))],
            axis=-1)
        particle_encode = MLP((nf, nf), name="particle_encoder")(p_in)
        particle_effect = particle_encode

        # relation encoder: [attr_r(1), attr_s(1), offset(3), den(1)]
        s_rel = s_cur  # receiver/sender positions (offsets thereof)
        a_s = gather_nbr(a_cur[..., None], exact=True)        # (B,N,K,1)
        s_s = gather_nbr(s_rel, exact=True)                   # (B,N,K,3)
        r_in = jnp.concatenate([
            jnp.broadcast_to(a_cur[:, :, None, None], (B, N, K, 1)),
            a_s,
            s_rel[:, :, None, :] - s_s,
            jnp.broadcast_to(den[:, :, None], (B, N, K, 1)),
        ], axis=-1)
        relation_encode = MLP((nf, nf, nf), name="relation_encoder")(r_in)

        rel_prop = nn.Dense(nf, name="relation_propagator")
        part_prop = nn.Dense(nf, name="particle_propagator")

        for _ in range(self.pstep):
            eff_r = jnp.broadcast_to(particle_effect[:, :, None, :],
                                     (B, N, K, nf))
            eff_s = gather_nbr(particle_effect)
            rel_in = jnp.concatenate([
                relation_encode, eff_r, eff_s,
                jnp.broadcast_to(den[:, :, None], (B, N, K, 1))], axis=-1)
            effect_rel = nn.relu(rel_prop(rel_in))            # (B,N,K,nf)
            agg = jnp.sum(effect_rel * edge_w[..., None], axis=2)

            part_in = jnp.concatenate(
                [particle_encode, agg, jnp.broadcast_to(den, (B, N, 1))],
                axis=-1)
            particle_effect = nn.relu(part_prop(part_in) + particle_effect)

        pred = MLP((nf, 3), relu_last=False,
                   name="particle_predictor")(particle_effect)
        return pred + s_cur


class PropNetDiffDenModel:
    """Wrapper with the reference's predict_one_step graph-building contract
    (model/gnn_dyn.py:200-254): dense pairwise distances on s_cur + s_delta,
    threshold adj_thresh, top-k <= 10 neighbors."""

    def __init__(self, config, params=None):
        self.config = config
        self.adj_thresh = config["train"]["particle"]["adj_thresh"]
        self.nf_effect = config["train"]["particle"]["nf_effect"]
        self.net = PropNetDiffDen(nf_effect=self.nf_effect)
        self.params = params

    def init(self, key, n=32, k=10):
        dummy = dict(
            a_cur=jnp.zeros((1, n)), s_cur=jnp.zeros((1, n, 3)),
            s_delta=jnp.zeros((1, n, 3)),
            nbr_idx=jnp.zeros((1, n, k), jnp.int32),
            nbr_ok=jnp.ones((1, n, k), bool),
            particle_den=jnp.ones((1,)))
        self.params = self.net.init(key, **dummy)
        return self.params

    def build_graph(self, s, particle_nums=None, max_rel: int | None = None):
        """Top-k graph on positions s: (B, N, 3) -> idx (B,N,K), ok (B,N,K).

        Matches gnn_dyn.py:224-242: k = min(10, N), edges where squared
        distance < adj_thresh^2, padded particles excluded.
        """
        B, N, _ = s.shape
        k = min(10, N) if max_rel is None else max_rel
        d2 = jnp.sum((s[:, None, :, :] - s[:, :, None, :]) ** 2, axis=-1)
        if particle_nums is not None:
            rng = jnp.arange(N)
            valid = rng[None, :] < particle_nums[:, None]     # (B, N)
            pair_ok = valid[:, :, None] & valid[:, None, :]
            d2 = jnp.where(pair_ok, d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k)                      # (B, N, K)
        ok = (-neg) < self.adj_thresh ** 2
        return idx, ok

    def predict_one_step(self, params, a_cur, s_cur, s_delta, particle_den,
                         particle_nums=None):
        s = s_cur + s_delta
        nbr_idx, nbr_ok = self.build_graph(s, particle_nums)
        mask = None
        if particle_nums is not None:
            mask = (jnp.arange(s.shape[1])[None, :]
                    < particle_nums[:, None]).astype(s.dtype)
        return self.net.apply(params, a_cur, s_cur, s_delta, nbr_idx, nbr_ok,
                              particle_den, mask)
