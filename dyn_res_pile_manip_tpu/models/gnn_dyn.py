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


class _DenseParams(nn.Module):
    """Owns a Dense-shaped (kernel, bias) under this module's name without
    applying it — the caller splits the kernel to restructure a
    Dense-over-concat into hoisted partial matmuls while keeping the
    checkpoint param tree identical to nn.Dense."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _MLPParams(nn.Module):
    """Own the params of an MLP (same tree paths as MLP/nn.Dense:
    <name>/Dense_i/{kernel,bias}) without applying it, so the caller can
    route them either through the plain jnp chain or the fused Pallas
    edge-MLP kernel (ops/edge_mlp.py) with checkpoint compatibility."""

    in_features: int
    features: tuple

    @nn.compact
    def __call__(self):
        out = []
        fin = self.in_features
        for i, f in enumerate(self.features):
            out.append(_DenseParams(fin, f, name=f"Dense_{i}")())
            fin = f
        return out


class MLP(nn.Module):
    features: tuple
    relu_last: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            if i < len(self.features) - 1 or self.relu_last:
                x = nn.relu(x)
        return x


class PropNetDiffDen(nn.Module):
    """nf_effect=64, pstep=3 message passing (gnn_dyn.py:113-198).

    compute_dtype=bfloat16 runs the whole message-passing stack (one-hot
    relation matmuls AND the MLP activations — both bandwidth-bound at
    planner batch sizes) in bf16, which roughly halves iteration time.
    Position SELECTION stays exact through a hi/lo split: a one-hot row
    has a single nonzero, so R@s_hi + R@s_lo reconstructs the f32 sender
    position to ~2^-16 relative error before the offset subtraction (the
    quantity that must not lose precision — CLAUDE.md notes this backend
    demotes f32 matmuls by default). Training uses float32 (oracle-parity
    tested); the planner opts into bf16.
    """

    nf_effect: int = 64
    pstep: int = 3
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a_cur, s_cur, s_delta, nbr_idx, nbr_ok, particle_den,
                 particle_mask=None, fused_edges=False,
                 pallas_interpret=False):
        """
        a_cur: (B, N) attributes; s_cur/s_delta: (B, N, 3);
        nbr_idx: (B, N, K) int sender index per receiver;
        nbr_ok: (B, N, K) edge validity; particle_den: (B,);
        particle_mask: (B, N) validity of (padded) particles.
        fused_edges: run the relation-encoder MLP in the fused Pallas
        kernel (ops/edge_mlp.py) — ONLY valid when no gradient flows
        through the relation branch (planner rollout step 0; the kernel
        is fwd-only by design). Training keeps the XLA path.
        Returns predicted next positions (B, N, 3), float32.
        """
        nf = self.nf_effect
        cdt = self.compute_dtype
        exact_hi = cdt == jnp.float32
        B, N, K = nbr_idx.shape
        den = (particle_den.astype(cdt) / 5000.0)[:, None, None]

        if particle_mask is None:
            particle_mask = jnp.ones((B, N), dtype=cdt)
        particle_mask = particle_mask.astype(cdt)

        # Sender-feature selection as a one-hot batched matmul: TPU gathers
        # are serial and slow, MXU matmuls are not. R plays the role of the
        # reference's Rs relation matrix (gnn_dyn.py:248-251) with fixed
        # (B, N*K, N) shape — but it is REBUILT inside every einsum rather
        # than materialized once: XLA fuses the iota-compare into the dot
        # operand, so R never touches HBM (measured 1.25 vs 1.61 ms
        # fwd+bwd per F=64 gather at the bench shape vs the shared
        # tensor; a Pallas lane-gather sat between at 1.45 —
        # scripts/profile_gather_variants.py).
        idx_flat = nbr_idx.reshape(B, N * K)

        def _R():
            return jax.nn.one_hot(idx_flat, N, dtype=cdt)

        def gather_nbr(x):
            # x: (B, N, F) -> (B, N, K, F) sender features (compute dtype)
            out = jnp.einsum("bmn,bnf->bmf", _R(), x.astype(cdt),
                             precision=jax.lax.Precision.DEFAULT)
            return out.reshape(B, N, K, -1)

        # ALL loop-invariant sender gathers (mask, attr, position) fused
        # into ONE einsum over R instead of three/four separate ones — R
        # is the dominant HBM operand at planner batch sizes (roofline:
        # 14.2 GB/iter materialized vs 5.0 fused), so every extra read of
        # it costs ~0.4 GB. Position selection stays exact: a one-hot row
        # has one nonzero, so hi+lo bf16 planes reassemble f32 to ~2^-16
        # relative before the offset subtraction (CLAUDE.md: this backend
        # demotes f32 matmuls by default).
        if exact_hi:
            inv = jnp.concatenate(
                [particle_mask[..., None], a_cur[..., None], s_cur], -1)
            g = jnp.einsum("bmn,bnf->bmf", _R(), inv,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            g = g.reshape(B, N, K, 5)
            mask_s, a_s, s_s = g[..., 0], g[..., 1:2], g[..., 2:5]
        else:
            s_hi = s_cur.astype(cdt)
            s_lo = (s_cur - s_hi.astype(jnp.float32)).astype(cdt)
            inv = jnp.concatenate(
                [particle_mask[..., None], a_cur[..., None].astype(cdt),
                 s_hi, s_lo], -1)
            g = jnp.einsum("bmn,bnf->bmf", _R(), inv,
                           preferred_element_type=jnp.float32)
            g = g.reshape(B, N, K, 8)
            mask_s, a_s = g[..., 0], g[..., 1:2]
            s_s = g[..., 2:5] + g[..., 5:8]

        edge_w = (nbr_ok.astype(cdt)
                  * particle_mask[:, :, None]
                  * mask_s.astype(cdt))

        dense = dict(dtype=cdt)
        a_cdt = a_cur.astype(cdt)

        # particle encoder: [s_delta(3), attr(1), den(1)] (gnn_dyn.py:127-128)
        p_in = jnp.concatenate(
            [s_delta.astype(cdt), a_cdt[..., None],
             jnp.broadcast_to(den, (B, N, 1))], axis=-1)
        particle_encode = MLP((nf, nf), name="particle_encoder",
                              **dense)(p_in)
        particle_effect = particle_encode

        # relation encoder: [attr_r(1), attr_s(1), offset(3), den(1)].
        # The offset is formed in f32 BEFORE casting: positions are large
        # relative to inter-particle offsets. a_s/s_s come from the fused
        # invariant gather above.
        offset = (s_cur[:, :, None, :] - s_s).astype(cdt)
        r_in = jnp.concatenate([
            jnp.broadcast_to(a_cdt[:, :, None, None], (B, N, K, 1)),
            a_s.astype(cdt),
            offset,
            jnp.broadcast_to(den[:, :, None], (B, N, K, 1)),
        ], axis=-1)
        rel_w = _MLPParams(r_in.shape[-1], (nf, nf, nf),
                           name="relation_encoder")()

        # relation propagator restructured: Dense over
        # concat([relation_encode, eff_r, eff_s, den]) ==
        #   re@Wre + eff_r@Wr + eff_s@Ws + den*Wden + b.
        # The re/den/bias part is loop-invariant (hoisted out of the pstep
        # loop), eff_r@Wr is computed at (B, N, nf) BEFORE broadcasting
        # over K, and eff_s@Ws is matmul'd before the sender gather —
        # together this removes the (B, N, K, 3nf+1) concat and most of
        # the per-edge activation traffic (the planner-batch bottleneck).
        rk, rb = _DenseParams(3 * nf + 1, nf,
                              name="relation_propagator")()
        rk_c = rk.astype(cdt)
        w_re, w_er, w_es, w_den = (rk_c[:nf], rk_c[nf:2 * nf],
                                   rk_c[2 * nf:3 * nf], rk_c[3 * nf:])
        if fused_edges and not exact_hi:
            # VMEM-resident relation MLP: streams r_in, writes only
            # rel_base (saves ~1.7 GB/iter of XLA intermediates). The
            # den term is added outside and fuses into the pstep reads.
            from ..ops.edge_mlp import edge_mlp
            flat = edge_mlp(r_in.reshape(B * N * K, -1), rel_w,
                            rk[:nf], rb, interpret=pallas_interpret)
            rel_base = (flat.reshape(B, N, K, nf)
                        + (den[:, :, None] * w_den[0]).astype(cdt))
        else:
            h = r_in
            for w, b in rel_w:                 # == MLP(relu_last=True)
                h = nn.relu(h @ w.astype(cdt) + b.astype(cdt))
            rel_base = (h @ w_re
                        + den[:, :, None] * w_den[0]
                        + rb.astype(cdt))                      # (B,N,K,nf)
        part_prop = nn.Dense(nf, name="particle_propagator", **dense)

        for _ in range(self.pstep):
            pe_r = particle_effect @ w_er                      # (B,N,nf)
            pe_s = gather_nbr(particle_effect @ w_es)          # (B,N,K,nf)
            effect_rel = nn.relu(rel_base + pe_r[:, :, None, :] + pe_s)
            agg = jnp.sum(effect_rel * edge_w[..., None], axis=2)

            part_in = jnp.concatenate(
                [particle_encode, agg, jnp.broadcast_to(den, (B, N, 1))],
                axis=-1)
            particle_effect = nn.relu(part_prop(part_in) + particle_effect)

        pred = MLP((nf, 3), relu_last=False, name="particle_predictor",
                   **dense)(particle_effect)
        return pred.astype(jnp.float32) + s_cur


class PropNetDiffDenModel:
    """Wrapper with the reference's predict_one_step graph-building contract
    (model/gnn_dyn.py:200-254): dense pairwise distances on s_cur + s_delta,
    threshold adj_thresh, top-k <= 10 neighbors."""

    def __init__(self, config, params=None):
        self.config = config
        self.adj_thresh = config["train"]["particle"]["adj_thresh"]
        self.nf_effect = config["train"]["particle"]["nf_effect"]
        self.net = PropNetDiffDen(nf_effect=self.nf_effect)
        # bandwidth-halved inference stack for the planner (same params:
        # flax dtype only sets compute dtype, param storage stays f32)
        self.net_bf16 = PropNetDiffDen(nf_effect=self.nf_effect,
                                       compute_dtype=jnp.bfloat16)
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
                         particle_nums=None, bf16: bool = False,
                         fused_edges: bool = False,
                         pallas_interpret: bool = False):
        """fused_edges routes the relation-encoder MLP through the Pallas
        kernel (bf16 path only) — valid ONLY when no gradient flows
        through s_cur (the planner's rollout step 0; its action gradient
        reaches the GNN through s_delta -> particle encoder alone, and
        jaxpr dot-counts confirm the relation backward is pruned)."""
        s = s_cur + s_delta
        nbr_idx, nbr_ok = self.build_graph(s, particle_nums)
        mask = None
        if particle_nums is not None:
            mask = (jnp.arange(s.shape[1])[None, :]
                    < particle_nums[:, None]).astype(s.dtype)
        net = self.net_bf16 if bf16 else self.net
        return net.apply(params, a_cur, s_cur, s_delta, nbr_idx, nbr_ok,
                         particle_den, mask, fused_edges=fused_edges,
                         pallas_interpret=pallas_interpret)
