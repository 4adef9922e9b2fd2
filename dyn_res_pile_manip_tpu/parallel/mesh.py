"""Device-mesh parallelism.

The reference has no distributed machinery (single CUDA GPU, single
process — SURVEY.md §2.3). The TPU-native scaling axes are:

- dp over MPC candidate samples x state hypotheses (the planner's
  n_sample x n_batch rollout batch, planners.py:336-359) and over training
  batches: params replicated, batch sharded, gradients psum'd by XLA;
- multi-host data generation stays embarrassingly parallel (no
  collectives), matching the reference's disabled mp pool.

Everything rides jax.sharding + jit: annotate shardings, let XLA insert
the collectives over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp",
              platform: str | None = None) -> Mesh:
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        # fall back to virtual CPU devices (e.g. single-chip dev boxes)
        try:
            cpus = jax.devices("cpu")
            if len(cpus) >= n_devices:
                devs = cpus
        except RuntimeError:
            pass
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Put a pytree with a leading batch axis onto the mesh, sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(model, optimizer, n_rollout: int, mesh: Mesh,
                       axis: str = "dp"):
    """Data-parallel GNN train step: params replicated, batch sharded on
    ``axis``; XLA inserts the gradient all-reduce over ICI."""
    from ..train.train_gnn_dyn import make_train_step

    step = make_train_step(model, optimizer, n_rollout)

    def dp_step(params, opt_state, states, states_delta, attrs, nums, dens):
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        batch = shard_batch(mesh, (states, states_delta, attrs, nums, dens),
                            axis)
        return step(params, opt_state, *batch, update=True)

    return dp_step


def shard_mpc_inputs(mesh: Mesh, acts0, axis: str = "dp"):
    """Shard the planner's (S, n_act, 4) candidate-action tensor over the
    sample axis; the jitted optimize loop then runs SPMD with per-iteration
    reward reductions as psums."""
    return jax.device_put(acts0, NamedSharding(mesh, P(axis)))
