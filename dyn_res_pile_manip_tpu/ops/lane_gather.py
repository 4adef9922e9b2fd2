"""Pallas TPU batched row-gather via lane-space take_along_axis.

The GNN's sender gathers (models/gnn_dyn.py) select K=10 neighbor rows
per receiver from a pool of N<=128 particles, batched over ~2k planner
samples. The XLA formulation is a one-hot matmul: R (B, N*K, N) against
x (B, N, F) — R is the dominant HBM operand of the whole MPC iteration
(roofline_r4: 14.2 GB/iter materialized vs 5.0 fused). A plain XLA
gather is worse (TPU gathers run at ~10-50M rows/s — CLAUDE.md).

This kernel avoids R entirely: x is viewed transposed (B, F, N) with N
padded to the 128-lane width, each batch slice is gathered in VMEM with
``jnp.take_along_axis`` along lanes (the one dynamic-gather pattern the
axon Mosaic helper compiles — CLAUDE.md), transposed in VMEM, and
written as (M, F). Traffic per gather: x + idx + out ~ 0.3 GB at the
bench shape vs ~0.65 GB for the R einsum (plus R's one-time 0.4 GB
materialization).

The backward pass (scatter-add of the output cotangent) is a per-batch
in-VMEM one-hot matmul — the one-hot lives only in VMEM, never HBM.

Replaces the relation-matrix machinery of the reference's PropNet
(model/gnn_dyn.py:242-251) on the planner hot path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128


def _gather_kernel(xt_ref, idx_ref, out_ref, *, chunks):
    # Mosaic's gather lowering only accepts take_along_axis whose index
    # shape EQUALS the operand shape, and it rejects broadcasting an i32
    # (1,128) vector to (F,128) ("Invalid input layout"), so the gather
    # runs on (8, LANES) tiles: indices arrive pre-tiled to 8 sublanes
    # and each 8-row slab of x is gathered separately.
    # Mosaic's dynamic_gather also requires index and data bitwidths to
    # MATCH — bf16 data is upcast to f32 in VMEM for the gather (i32
    # indices) and downcast on the write; exact for a pure permutation.
    xt = xt_ref[0].astype(jnp.float32)   # (F, LANES) in VMEM
    idx8 = idx_ref[0]                    # (8, M) int32 (row-replicated)
    f = xt.shape[0]
    dt = out_ref.dtype
    for j in range(chunks):
        sel = idx8[:, j * LANES:(j + 1) * LANES]      # (8, LANES)
        for f0 in range(0, f, 8):
            g = jnp.take_along_axis(xt[f0:f0 + 8], sel, axis=1)
            out_ref[0, j * LANES:(j + 1) * LANES,
                    f0:f0 + 8] = g.T.astype(dt)


def _scatter_kernel(idx_ref, g_ref, out_ref, *, n_pad):
    g = g_ref[0]                          # (M, F)
    idx = idx_ref[0]                      # (1, M)
    m = g.shape[0]
    onehot = (idx.reshape(m, 1)
              == jax.lax.broadcasted_iota(jnp.int32, (m, n_pad), 1))
    out_ref[0] = jax.lax.dot_general(
        g.T.astype(jnp.float32), onehot.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (F, Np)


def _pad_to(v, mult):
    return -(-v // mult) * mult


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lane_gather(x, idx, interpret=False):
    """x: (B, N, F) with N <= 128; idx: (B, M) int32 in [0, N).

    Returns (B, M, F) = x[b, idx[b, m], :], same dtype as x.
    interpret=True runs the Pallas kernels in interpreter mode (CPU
    tests; resolve like sim/pbd.py resolve_pallas).
    """
    return _lane_gather_fwd_impl(x, idx, interpret)


def _lane_gather_fwd_impl(x, idx, interpret=False):
    B, N, F = x.shape
    M = idx.shape[1]
    if N > LANES:
        raise ValueError(f"lane_gather needs N <= {LANES}, got {N}")
    n_pad = LANES
    m_pad = _pad_to(max(M, LANES), LANES)
    f_pad = _pad_to(max(F, 8), 8)
    xt = jnp.swapaxes(x, 1, 2)                       # (B, F, N)
    xt = jnp.pad(xt, ((0, 0), (0, f_pad - F), (0, n_pad - N)))
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, m_pad - M)))
    idx8 = jnp.broadcast_to(idx_p[:, None, :], (B, 8, m_pad))
    out = pl.pallas_call(
        functools.partial(_gather_kernel, chunks=m_pad // LANES),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, f_pad, n_pad), lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, 8, m_pad), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, m_pad, f_pad), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, f_pad), x.dtype),
        interpret=interpret,
    )(xt, idx8)
    return out[:, :M, :F]


def _fwd(x, idx, interpret):
    # custom_vjp calls fwd with args in their ORIGINAL positions; only
    # bwd receives the nondiff args as leading arguments.
    # zero-size array carries x's shape/dtype through the residual
    # pytree (plain tuples/dtypes are not valid JAX residual leaves)
    proto = jnp.zeros((0,) + x.shape[1:], x.dtype)
    return _lane_gather_fwd_impl(x, idx, interpret), (idx, proto)


def _bwd(interpret, res, g):
    idx, proto = res
    B, M = idx.shape
    N, F = proto.shape[1], proto.shape[2]
    x_dtype = proto.dtype
    n_pad = LANES
    m_pad = _pad_to(max(M, 8), 8)
    f_pad = _pad_to(max(F, 8), 8)
    g_p = jnp.pad(g, ((0, 0), (0, m_pad - M), (0, f_pad - F)))
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, m_pad - M)),
                    constant_values=n_pad - 1)
    # padded rows scatter into column n_pad-1 (>= N, sliced away) only if
    # their cotangent is nonzero; g_p pads with zeros so any column is safe
    dxt = pl.pallas_call(
        functools.partial(_scatter_kernel, n_pad=n_pad),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, m_pad, f_pad), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, f_pad, n_pad), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, f_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(idx_p.reshape(B, 1, m_pad), g_p.astype(jnp.float32))
    dx = jnp.swapaxes(dxt, 1, 2)[:, :N, :F].astype(x_dtype)
    return dx, None


lane_gather.defvjp(_fwd, _bwd)


def lane_gather_ref(x, idx):
    """NumPy/XLA reference for tests."""
    return jnp.take_along_axis(
        x, idx[..., None].astype(jnp.int32), axis=1)
