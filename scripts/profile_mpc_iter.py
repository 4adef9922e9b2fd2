"""Ablation profile of the GNN-MPC optimize iteration (the headline
bench metric): times each stage of predict_one_step at the bench shape
(B=1920 = 64 samples x 30 hypotheses, N=100, K=10) in isolation, inside
a lax.scan so each number is one dispatch (micro-benchmarks through the
axon tunnel are unreliable otherwise — CLAUDE.md).

Run on an idle chip: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/profile_mpc_iter.py [B] [N]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.utils.config import load_config

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100
K = 10
REPS = 30


def timed(name, fn, x0):
    """fn(x) where x varies per scan step (x0 + eps*carry) so XLA cannot
    hoist the body out of the measurement loop."""
    @jax.jit
    def loop(x0):
        def body(c, _):
            out = fn(x0 + 1e-12 * c)
            leaves = jax.tree_util.tree_leaves(out)
            acc = sum(jnp.sum(jnp.abs(l[..., :1]).astype(jnp.float32))
                      if l.ndim else jnp.abs(l).astype(jnp.float32)
                      for l in leaves)
            return acc * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return acc

    acc = loop(x0)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    acc = loop(x0)
    jax.block_until_ready(acc)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:38s} {ms:8.2f} ms")
    return ms


def main():
    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, N, 3)), jnp.float32)
    s_delta = jnp.asarray(rng.normal(0, 0.01, (B, N, 3)), jnp.float32)
    a = jnp.zeros((B, N), jnp.float32)
    den = jnp.full((B,), 1000.0, jnp.float32)
    nums = jnp.full((B,), N, jnp.int32)

    print(f"B={B} N={N} K={K} reps={REPS}")
    timed("build_graph (d2 + top_k)",
          lambda x: model.build_graph(x, nums), s)

    d2 = jnp.sum((s[:, None] - s[:, :, None]) ** 2, -1)
    timed("  pairwise d2 only", lambda x: jnp.sum(
        (x[:, None] - x[:, :, None]) ** 2, -1), s)
    timed("  top_k only", lambda d: jax.lax.top_k(-d, K), d2)
    try:
        timed("  approx_min_k only",
              lambda d: jax.lax.approx_min_k(d, K), d2)
    except Exception as e:  # pragma: no cover
        print("  approx_min_k unavailable:", e)

    idx, ok = model.build_graph(s, nums)
    mask = (jnp.arange(N)[None] < nums[:, None]).astype(jnp.float32)

    timed("net.apply (forward)", lambda sd: model.net.apply(
        model.params, a, s, sd, idx, ok, den, mask), s_delta)

    def fwd_loss(sd):
        out = model.net.apply(model.params, a, s, sd, idx, ok, den, mask)
        return jnp.sum(out * out)

    timed("forward+grad wrt s_delta", jax.grad(fwd_loss), s_delta)

    timed("predict_one_step (graph+fwd)",
          lambda sd: model.predict_one_step(model.params, a, s, sd, den,
                                            nums), s_delta)

    def full_loss(sd):
        out = model.predict_one_step(model.params, a, s, sd, den, nums)
        return jnp.sum(out * out)

    timed("predict_one_step + grad", jax.grad(full_loss), s_delta)

    timed("bf16 predict_one_step",
          lambda sd: model.predict_one_step(model.params, a, s, sd, den,
                                            nums, bf16=True), s_delta)

    def full_loss16(sd):
        out = model.predict_one_step(model.params, a, s, sd, den, nums,
                                     bf16=True)
        return jnp.sum(out * out)

    timed("bf16 predict_one_step + grad", jax.grad(full_loss16), s_delta)

    # numeric check: bf16 path vs f32 path
    o32 = model.predict_one_step(model.params, a, s, s_delta, den, nums)
    o16 = model.predict_one_step(model.params, a, s, s_delta, den, nums,
                                 bf16=True)
    err = jnp.max(jnp.abs(o32 - o16))
    dmag = jnp.max(jnp.abs(o32 - s))
    print(f"bf16 max |delta| err {float(err):.2e} "
          f"(max |pred delta| {float(dmag):.2e})")


if __name__ == "__main__":
    main()
