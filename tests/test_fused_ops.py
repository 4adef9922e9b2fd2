"""Pallas planner-path kernels vs their XLA references (interpret mode
on CPU; the same kernels compile for TPU via the axon remote helper).

- ops/lane_gather: batched row gather + scatter-add VJP
- ops/edge_mlp: fused relation-encoder MLP (fwd-only by design)
- models/gnn_dyn fused_edges path == plain bf16 path
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.models.gnn_dyn import PropNetDiffDenModel
from dyn_res_pile_manip_tpu.ops.edge_mlp import edge_mlp, edge_mlp_ref
from dyn_res_pile_manip_tpu.ops.lane_gather import (lane_gather,
                                                    lane_gather_ref)
from dyn_res_pile_manip_tpu.utils.config import load_config

pytestmark = pytest.mark.quick


def test_lane_gather_fwd_bwd():
    rng = np.random.default_rng(0)
    B, N, F, M = 3, 100, 64, 990
    x = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, M)), jnp.int32)
    out = lane_gather(x, idx, True)
    ref = lane_gather_ref(x, idx)
    assert jnp.max(jnp.abs(out - ref)) == 0.0
    co = jnp.asarray(rng.normal(size=(B, M, F)), jnp.float32)
    gx = jax.grad(lambda x: jnp.sum(lane_gather(x, idx, True) * co))(x)
    gr = jax.grad(lambda x: jnp.sum(lane_gather_ref(x, idx) * co))(x)
    assert jnp.max(jnp.abs(gx - gr)) < 1e-4


def test_edge_mlp_matches_ref():
    rng = np.random.default_rng(1)
    rows, nf = 2000, 64
    r_in = jnp.asarray(rng.normal(size=(rows, 6)), jnp.bfloat16)
    weights = []
    fin = 6
    for f in (nf, nf, nf):
        weights.append((jnp.asarray(rng.normal(size=(fin, f)) * 0.2,
                                    jnp.float32),
                        jnp.asarray(rng.normal(size=(f,)) * 0.1,
                                    jnp.float32)))
        fin = f
    w_re = jnp.asarray(rng.normal(size=(nf, nf)) * 0.2, jnp.float32)
    rb = jnp.asarray(rng.normal(size=(nf,)) * 0.1, jnp.float32)
    out = edge_mlp(r_in, weights, w_re, rb, interpret=True)
    ref = edge_mlp_ref(r_in, weights, w_re, rb)
    err = jnp.max(jnp.abs(out.astype(jnp.float32)
                          - ref.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-6
    # bf16 chains accumulate slightly differently (kernel uses f32
    # accumulation); allow a few bf16 ulps relative
    assert float(err / scale) < 0.03, (err, scale)


def test_gnn_fused_edges_matches_bf16_path():
    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    B, N = 3, 40
    s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, N, 3)), jnp.float32)
    sd = jnp.asarray(rng.normal(0, 0.01, (B, N, 3)), jnp.float32)
    a = jnp.zeros((B, N), jnp.float32)
    den = jnp.full((B,), 1000.0, jnp.float32)
    nums = jnp.full((B,), N, jnp.int32)
    base = model.predict_one_step(model.params, a, s, sd, den, nums,
                                  bf16=True)
    fused = model.predict_one_step(model.params, a, s, sd, den, nums,
                                   bf16=True, fused_edges=True,
                                   pallas_interpret=True)
    err = float(jnp.max(jnp.abs(base - fused)))
    dmag = float(jnp.max(jnp.abs(base - s))) + 1e-6
    assert err / dmag < 0.05, (err, dmag)
    # the action gradient (through s_delta) must flow through the fused
    # path identically — the relation branch carries no gradient
    g1 = jax.grad(lambda sd: jnp.sum(model.predict_one_step(
        model.params, a, s, sd, den, nums, bf16=True) ** 2))(sd)
    g2 = jax.grad(lambda sd: jnp.sum(model.predict_one_step(
        model.params, a, s, sd, den, nums, bf16=True, fused_edges=True,
        pallas_interpret=True) ** 2))(sd)
    rel = float(jnp.max(jnp.abs(g1 - g2)) / (jnp.max(jnp.abs(g1)) + 1e-6))
    assert rel < 0.05, rel


def test_gnn_f32_path_ignores_fused_flag():
    """Training path (f32) must be byte-identical with or without the
    flag (fused is bf16-only)."""
    cfg = load_config()
    model = PropNetDiffDenModel(cfg)
    model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B, N = 2, 24
    s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, N, 3)), jnp.float32)
    sd = jnp.asarray(rng.normal(0, 0.01, (B, N, 3)), jnp.float32)
    a = jnp.zeros((B, N), jnp.float32)
    den = jnp.full((B,), 1000.0, jnp.float32)
    o1 = model.predict_one_step(model.params, a, s, sd, den)
    o2 = model.predict_one_step(model.params, a, s, sd, den,
                                fused_edges=True, pallas_interpret=True)
    assert jnp.array_equal(o1, o2)
