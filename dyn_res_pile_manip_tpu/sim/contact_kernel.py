"""Pallas TPU kernel for the sorted-window contact sweep.

The XLA formulation of the sweep (sim/pbd.py solve_contacts_window) is
HBM-bound: the ~15 (tiles, TILE, W*TILE) intermediates don't all fuse, so
each sweep streams hundreds of MB. This kernel keeps one tile's whole
pair computation resident in VMEM: inputs are W affine block views of a
16-channel packed particle array (positions, substep anchors, inverse
mass, group id, active flag), outputs are the updated tile positions.
No gathers, no scatters — the window structure comes entirely from the
sorted order (see pbd.py).

Replaces the contact phase of the closed FleX CUDA solver
(NvFlexUpdateSolver, PyFleX/bindings/pyflex.cpp:2045; parameter
semantics NvFlex.h:95-154).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
HMAX = 4          # supports window tiers up to W = 2*HMAX + 1 = 9
_PAD_POS = 1.0e6

# packed channel layout (16 rows, f32)
_CH_XP = 0        # 0:3   current positions
_CH_X0 = 3        # 3:6   substep-start positions (friction anchor)
_CH_WI = 6        # inverse mass
_CH_GRP = 7       # rigid group id (float; exact for |id| < 2^24)
_CH_ACT = 8       # active flag (1.0 / 0.0)
_NCH = 16


def make_packed(x0, invm, group, active):
    """Static per-substep channels of the packed array (16, Np) with
    HMAX*TILE padding tiles on both ends; xp rows are filled per sweep."""
    n = x0.shape[0]
    pad = HMAX * TILE
    np_ = n + 2 * pad
    packed = jnp.zeros((_NCH, np_), jnp.float32)
    packed = packed.at[_CH_XP:_CH_XP + 3, :].set(_PAD_POS)
    packed = packed.at[_CH_X0:_CH_X0 + 3, :].set(_PAD_POS)
    packed = packed.at[_CH_X0:_CH_X0 + 3, pad:pad + n].set(x0.T)
    packed = packed.at[_CH_WI, pad:pad + n].set(invm)
    packed = packed.at[_CH_GRP, pad:pad + n].set(group.astype(jnp.float32))
    packed = packed.at[_CH_ACT, pad:pad + n].set(active.astype(jnp.float32))
    return packed


def set_xp(packed, xp):
    """Refresh the current-position channels."""
    n = xp.shape[0]
    pad = HMAX * TILE
    return packed.at[_CH_XP:_CH_XP + 3, pad:pad + n].set(xp.T)


def _make_kernel(w_tiles: int):
    h = (w_tiles - 1) // 2
    wlen = w_tiles * TILE

    def kernel(scal_ref, *refs):
        win_refs, out_ref = refs[:-1], refs[-1]
        rest_d = scal_ref[0, 0]
        k_shock = scal_ref[0, 1]
        mu_s = scal_ref[0, 2]
        mu_d = scal_ref[0, 3]
        relax = scal_ref[0, 4]

        win = jnp.concatenate([r[:] for r in win_refs], axis=1)  # (16, WT)
        own = win_refs[h][:]                                     # (16, T)

        xp = own[_CH_XP:_CH_XP + 3]                              # (3, T)
        x0 = own[_CH_X0:_CH_X0 + 3]
        wi = own[_CH_WI]
        gi = own[_CH_GRP]
        ai = own[_CH_ACT]
        xw = win[_CH_XP:_CH_XP + 3]                              # (3, WT)
        x0w = win[_CH_X0:_CH_X0 + 3]
        wj = win[_CH_WI]
        gj = win[_CH_GRP]
        aj = win[_CH_ACT]

        diff = xp[:, :, None] - xw[:, None, :]                   # (3, T, WT)
        d2 = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
        inv_dist = jax.lax.rsqrt(jnp.maximum(d2, 1e-18))
        pen = rest_d - d2 * inv_dist                             # (T, WT)

        same = (gi[:, None] == gj[None, :]) & (gi[:, None] >= 0.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, wlen), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, wlen), 1)
        selfm = cols == rows + h * TILE
        contact = ((pen > 0) & (ai[:, None] > 0) & (aj[None, :] > 0)
                   & ~same & ~selfm)

        nrm = diff * inv_dist[None, :, :]

        # shock propagation (single-exp ratio; see pbd.py)
        hh = (xw[1][None, :] - xp[1][:, None]) / rest_d
        wjk = wj[None, :] * jnp.exp(jnp.minimum(k_shock * hh, 60.0))
        ratio = wi[:, None] / jnp.maximum(wi[:, None] + wjk, 1e-9)

        push_s = ratio * pen                                     # (T, WT)

        dmove = (xp - x0)[:, :, None] - (xw - x0w)[:, None, :]
        dot = (dmove[0] * nrm[0] + dmove[1] * nrm[1]
               + dmove[2] * nrm[2])
        dt_tan = dmove - nrm * dot[None, :, :]
        t2 = (dt_tan[0] * dt_tan[0] + dt_tan[1] * dt_tan[1]
              + dt_tan[2] * dt_tan[2])
        inv_tan = jax.lax.rsqrt(jnp.maximum(t2, 1e-18))
        static_ok = t2 * inv_tan < mu_s * pen
        scale = jnp.where(static_ok, 1.0,
                          jnp.minimum(1.0, mu_d * pen * inv_tan))
        fric_s = scale * ratio                                   # (T, WT)

        c = contact.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(c, axis=1, keepdims=True), 1.0)  # (T, 1)
        delta = (push_s[None, :, :] * nrm - dt_tan * fric_s[None, :, :])
        # keep everything >= 2D for Mosaic: per-component (1, T) rows
        dx = jnp.concatenate(
            [(jnp.sum(delta[k] * c, axis=1, keepdims=True) / cnt).T
             for k in range(3)], axis=0)                          # (3, T)
        out_ref[:] = jnp.concatenate(
            [xp + relax * dx, jnp.zeros((5, TILE), jnp.float32)], axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("w_tiles", "color", "interpret"))
def sweep(packed, scalars, w_tiles: int, color=None,
          interpret: bool = False):
    """One contact sweep over the packed array.

    packed: (16, n + 2*HMAX*TILE); scalars: (1, 8) f32
    [rest_d, shock_k, mu_s, mu_d, relaxation, ...].
    Returns updated positions for the swept tiles: (3, U*TILE) where
    U = n_tiles (color None) or n_tiles // 2 (red-black half sweep).
    """
    n = packed.shape[1] - 2 * HMAX * TILE
    nt = n // TILE
    h = (w_tiles - 1) // 2
    step, col = (1, 0) if color is None else (2, color)
    upd = nt if color is None else nt // 2

    def imap(w):
        return lambda g: (0, g * step + col + (HMAX - h) + w)

    in_specs = ([pl.BlockSpec((1, 8), lambda g: (0, 0),
                              memory_space=pltpu.SMEM)]
                + [pl.BlockSpec((_NCH, TILE), imap(w),
                                memory_space=pltpu.VMEM)
                   for w in range(w_tiles)])
    out = pl.pallas_call(
        _make_kernel(w_tiles),
        grid=(upd,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, TILE), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, upd * TILE), jnp.float32),
        interpret=interpret,
    )(scalars, *([packed] * w_tiles))
    return out[0:3]


def scalars_from_params(params) -> jnp.ndarray:
    s = jnp.zeros((1, 8), jnp.float32)
    s = s.at[0, 0].set(params.radius)
    s = s.at[0, 1].set(params.shock_propagation)
    s = s.at[0, 2].set(params.static_friction)
    s = s.at[0, 3].set(params.dynamic_friction)
    s = s.at[0, 4].set(params.relaxation_factor)
    return s
