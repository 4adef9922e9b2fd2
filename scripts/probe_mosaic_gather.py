"""Reprobe the axon Mosaic-helper blocker on PERFORMANCE.md roadmap #2
(Pallas VMEM-resident substep: integration + shape matching joining the
contact kernel needs general dynamic row gathers inside the kernel).

Two formulations of an 8-row dynamic gather from a (64, 128) VMEM block:
  1. int fancy indexing  `src_ref[idx]`   — rejected client-side by the
     Pallas TPU lowering ("Cannot do int indexing on TPU");
  2. per-row dynamic slices `src_ref[pl.ds(j, 1), :]` in a fori_loop —
     compiles client-side but the remote Mosaic compile helper dies
     (HTTP 500: tpu_compile_helper subprocess exit code 1, no diagnostic).

Last probed 2026-08-19 (round 4 continuation): BOTH still fail. The
lane-width-128 `take_along_axis` pattern used by sim/contact_kernel.py
remains the only working in-kernel gather shape on this toolchain.

Run: PYTHONPATH=/root/.axon_site python scripts/probe_mosaic_gather.py
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, kern):
    src = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 64, 8), jnp.int32)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(idx, src)
        err = float(jnp.abs(out - src[idx]).max())
        print(f"{name}: OK (max err {err:.2e})")
        return True
    except Exception as e:  # noqa: BLE001 — probe reports any failure mode
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return False


def fancy_kern(idx_ref, src_ref, out_ref):
    out_ref[...] = src_ref[idx_ref[...]]


def ds_kern(idx_ref, src_ref, out_ref):
    def body(i, _):
        j = idx_ref[i]
        out_ref[pl.ds(i, 1), :] = src_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, 8, body, 0)


if __name__ == "__main__":
    ok1 = probe("int fancy indexing", fancy_kern)
    ok2 = probe("per-row dynamic slice", ds_kern)
    if ok1 or ok2:
        print("=> dynamic gathers WORK now: unblock PERFORMANCE.md "
              "roadmap #2 (Pallas VMEM-resident substep)")
    else:
        print("=> roadmap #2 still blocked on the Mosaic helper")
