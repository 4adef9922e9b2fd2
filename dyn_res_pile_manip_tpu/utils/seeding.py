"""Seeding + small random helpers (reference utils.py:195-213)."""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    """Seed every host RNG and return a jax PRNG key (the reference also
    seeds torch/cudnn, utils.py:195-201; JAX randomness is explicit)."""
    np.random.seed(seed)
    random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)


def rand_float(lo, hi):
    return np.random.rand() * (hi - lo) + lo


def rand_int(lo, hi):
    return np.random.randint(lo, hi)


def calc_dis(a, b):
    return np.sqrt((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2)


def count_trainable_parameters(params) -> int:
    import jax

    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
