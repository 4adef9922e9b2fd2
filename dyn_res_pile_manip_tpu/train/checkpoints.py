"""Checkpoint I/O.

Replaces the reference's torch state_dict files (train_gnn_dyn.py:214-228:
net_epoch_%d_iter_%d.pth + net_best.pth) with msgpack-serialized flax
pytrees (same naming scheme, .ckpt suffix); orbax is used for full train
state (params + optimizer) when resuming.
"""
from __future__ import annotations

import os

import flax.serialization
import jax
import numpy as np


def save_model_params(params, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(params))


def load_model_params(path: str):
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def save_train_state(state, path: str) -> None:
    """Full train state (params + optimizer) via orbax for resume."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
