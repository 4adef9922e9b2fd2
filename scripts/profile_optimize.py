"""Ground-truth profile of the planner's jitted optimize iteration at the
bench shape, plus candidate reformulations of the reward:

- coverage min-distance via an MXU matmul (d^2 = |g|^2 + |p|^2 - 2 g.p)
  instead of the broadcast-diff norm
- goal-field bilinear sample via a rank-K SVD factorization
  (sample(r,c) = w_r^T U S V^T w_c as two matmuls) instead of a 192k-point
  gather (map_coordinates)

Run on the TPU: each number is one lax.scan dispatch.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dyn_res_pile_manip_tpu.core.camera import Camera
from dyn_res_pile_manip_tpu.env import rewards as rew
from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.planner import planner as pl
from dyn_res_pile_manip_tpu.utils.config import load_config
from dyn_res_pile_manip_tpu.utils.imaging import gen_subgoal

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100
REPS = 20


def timed(name, fn, x0):
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
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    cam = Camera.default(24.0)
    cam_params = tuple(jnp.float32(c) for c in cam.cam_params())
    subgoal, _ = gen_subgoal(360, 360, 100, h=720, w=720)
    goal_field = rew.prepare_goal(subgoal)
    M = min(N * 5, int((subgoal < 0.5).sum()))
    goal_coor = jnp.asarray(rew.goal_coords(subgoal, M))
    M = goal_coor.shape[0]
    print(f"B={B} N={N} M={M}")

    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.uniform(-0.2, 0.2, (B, N, 3)), jnp.float32)
    state = state.at[..., 2].add(0.75)
    acts = jnp.asarray(rng.uniform(-4, 4, (B, 1, 4)), jnp.float32)
    den = jnp.full((B,), 1000.0, jnp.float32)
    attr = jnp.zeros((B, N), jnp.float32)
    w2c = jnp.asarray(pl.world2cam_matrix(np.asarray(cam.extrinsics())),
                      jnp.float32)

    # --- the real loss (mirrors planner._optimize.loss_fn, bf16 path) ---
    def rollout(a):
        s = state
        s_delta = pl.gen_s_delta(s, a[:, 0, :], w2c, 24.0)
        return model.predict_one_step(model.params, attr, s, s_delta, den,
                                      bf16=True)

    def loss_real(a):
        final = rollout(a)
        r = rew.config_reward_ptcl(final, goal_field, cam_params, goal_coor)
        return -jnp.sum(r)

    timed("REAL loss fwd", loss_real, acts)
    timed("REAL loss fwd+grad(acts)", jax.grad(loss_real), acts)

    # --- current reward pieces at real M ---
    def reward_cur(s):
        return jnp.sum(rew.config_reward_ptcl(s, goal_field, cam_params,
                                              goal_coor))

    timed("reward cur fwd+grad", jax.grad(reward_cur), state)

    fx, fy, cx, cy = cam_params

    def pix_of(s):
        col = s[..., 0] * fx / s[..., 2] + cx
        row = s[..., 1] * fy / s[..., 2] + cy
        return col, row

    # --- coverage via matmul d^2 ---
    def coverage_mm(s):
        col, row = pix_of(s)
        pix = jnp.stack([col, row], axis=-1)              # (B, N, 2)
        g2 = jnp.sum(goal_coor ** 2, axis=-1)             # (M,)
        p2 = jnp.sum(pix ** 2, axis=-1)                   # (B, N)
        cross = jnp.einsum("md,bnd->bmn", goal_coor, pix,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = g2[None, :, None] + p2[:, None, :] - 2.0 * cross
        return jnp.sqrt(jnp.maximum(d2.min(axis=2), 0.0)).sum()

    def coverage_cur(s):
        col, row = pix_of(s)
        pix = jnp.stack([col, row], axis=-1)
        d = jnp.linalg.norm(goal_coor[None, :, None, :]
                            - pix[:, None, :, :], axis=-1)
        return d.min(axis=2).sum()

    timed("coverage cur fwd+grad", jax.grad(coverage_cur), state)
    timed("coverage matmul fwd+grad", jax.grad(coverage_mm), state)

    # --- field sample: gather vs rank-K SVD matmul ---
    F = np.asarray(goal_field)
    U, S, Vt = np.linalg.svd(F, full_matrices=False)
    for K in (16, 32, 64):
        approx = (U[:, :K] * S[:K]) @ Vt[:K]
        err = np.abs(approx - F)
        print(f"  SVD rank {K}: max err {err.max():.3f} "
              f"mean {err.mean():.4f} (field range {F.max():.1f})")
    K = 32
    US = jnp.asarray(U[:, :K] * S[:K], jnp.float32)       # (720, K)
    V = jnp.asarray(Vt[:K].T, jnp.float32)                # (720, K)
    H = F.shape[0]

    def field_gather(s):
        col, row = pix_of(s)

        def sample(r, c):
            return jax.scipy.ndimage.map_coordinates(
                goal_field, [r - 0.5, c - 0.5], order=1, mode="nearest")
        return jax.vmap(sample)(row, col).sum()

    def interp_rows(tbl, q):
        """tbl: (H, K); q: (P,) fractional index. Returns (P, K) via
        two-hot bilinear weight matmul (gather-free, MXU)."""
        qc = jnp.clip(q, 0.0, H - 1.0)
        i0 = jnp.floor(qc)
        w1 = (qc - i0)[:, None]
        iota = jnp.arange(H, dtype=jnp.float32)[None, :]
        h0 = (iota == i0[:, None]).astype(jnp.bfloat16)
        h1 = (iota == jnp.minimum(i0 + 1, H - 1.0)[:, None]).astype(
            jnp.bfloat16)
        t = tbl.astype(jnp.bfloat16)
        r0 = (h0 @ t).astype(jnp.float32)
        r1 = (h1 @ t).astype(jnp.float32)
        return r0 * (1 - w1) + r1 * w1

    def field_svd(s):
        col, row = pix_of(s)
        P = B * N
        u = interp_rows(US, (row - 0.5).reshape(P))       # (P, K)
        v = interp_rows(V, (col - 0.5).reshape(P))        # (P, K)
        return jnp.sum(u * v)

    timed("field gather fwd+grad", jax.grad(field_gather), state)
    timed("field SVD-matmul fwd+grad", jax.grad(field_svd), state)

    # numeric check of the SVD path
    col, row = pix_of(state[:4])
    ref = jax.vmap(lambda r, c: jax.scipy.ndimage.map_coordinates(
        goal_field, [r - 0.5, c - 0.5], order=1,
        mode="nearest"))(row, col)
    P = 4 * N
    u = interp_rows(US, (row - 0.5).reshape(P))
    v = interp_rows(V, (col - 0.5).reshape(P))
    got = jnp.sum(u * v, -1).reshape(4, N)
    print("  svd-sample max abs err:",
          float(jnp.max(jnp.abs(got - ref))),
          " field range:", float(goal_field.max()))


if __name__ == "__main__":
    main()
