"""A/B the sender-gather formulations of the GNN message passing at the
planner bench shape (B=1920, N=100, K=10, F=64) — the roofline says the
one-hot relation matmul dominates MPC-iteration HBM traffic
(results/r4/roofline_r4.txt: 14.2 GB materialized vs 5.0 GB fused).

Variants:
  r_bf16      materialized bf16 one-hot R, einsum        (current)
  r_inline    one_hot built inside the einsum (does XLA fuse the
              iota-compare into the dot operand, skipping HBM?)
  r_int8      R stored int8, converted per use
  xla_gather  jnp.take_along_axis (expected slow: serial TPU gathers)
  pallas      ops/lane_gather kernel (lane-space take_along_axis)
Each timed fwd-only and fwd+bwd, inside one lax.scan dispatch
(micro-benchmarks through the axon tunnel are unreliable — CLAUDE.md).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_gather_variants.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.ops.lane_gather import lane_gather

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100
K = 10
F = 64
REPS = 20


def timed(name, fn, *args):
    @jax.jit
    def loop(*args):
        def body(c, _):
            out = fn(args[0] + 1e-12 * c, *args[1:])
            leaves = jax.tree_util.tree_leaves(out)
            acc = sum(jnp.sum(l[..., :1].astype(jnp.float32))
                      for l in leaves)
            return acc * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return acc

    acc = loop(*args)
    jax.block_until_ready(acc)
    best = np.inf
    for _ in range(3):                      # min-of-3 (CLAUDE.md tunnels)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS * 1e3)
    print(f"{name:34s} {best:8.3f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, (B, N * K)), jnp.int32)
    co = jnp.asarray(rng.normal(size=(B, N * K, F)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    R = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
    R8 = jax.nn.one_hot(idx, N, dtype=jnp.int8)

    print(f"B={B} N={N} K={K} F={F} reps={REPS} (min of 3)")

    def v_r(x, R):
        return jnp.einsum("bmn,bnf->bmf", R, x)

    def v_inline(x, idx):
        Ri = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
        return jnp.einsum("bmn,bnf->bmf", Ri, x)

    def v_int8(x, R8):
        return jnp.einsum("bmn,bnf->bmf", R8.astype(jnp.bfloat16), x)

    def v_xla(x, idx):
        return jnp.take_along_axis(x, idx[..., None], axis=1)

    def v_pallas(x, idx):
        return lane_gather(x, idx, False)

    timed("fwd r_bf16 (R prematerialized)", v_r, xb, R)
    timed("fwd r_inline (one_hot in jit)", v_inline, xb, idx)
    timed("fwd r_int8", v_int8, xb, R8)
    timed("fwd pallas lane_gather", v_pallas, xb, idx)
    if "--xla-gather" in sys.argv:
        timed("fwd xla take_along_axis", v_xla, xb, idx)

    def g_r(x, R):
        return jax.grad(lambda x: jnp.sum(v_r(x, R) * co).astype(
            jnp.float32))(x)

    def g_inline(x, idx):
        return jax.grad(lambda x: jnp.sum(v_inline(x, idx) * co).astype(
            jnp.float32))(x)

    def g_pallas(x, idx):
        return jax.grad(lambda x: jnp.sum(
            v_pallas(x, idx) * co).astype(jnp.float32))(x)

    timed("fwd+bwd r_bf16", g_r, xb, R)
    timed("fwd+bwd r_inline", g_inline, xb, idx)
    timed("fwd+bwd pallas lane_gather", g_pallas, xb, idx)

    # correctness cross-check on chip
    ref = jnp.take_along_axis(xb, idx[..., None], axis=1)
    for name, got in [("r_bf16", v_r(xb, R)),
                      ("pallas", v_pallas(xb, idx))]:
        err = jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        print(f"{name} max err vs gather: {float(err):.2e}")


if __name__ == "__main__":
    main()
