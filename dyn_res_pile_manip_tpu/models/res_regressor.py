"""Resolution regressor: picks the particle count (state resolution) for a
task from init/goal masks.

Re-design of the reference's MPCResRgrNoPool (model/res_regressor.py:106-177)
in flax: the same pix2pix-style 5-conv stride-2 encoder + 5 FC head on a
6-channel 224x224 input (init mask, goal mask, their distance transforms,
init\\goal, goal\\init — res_regressor.py:146-173). The classifier variant
(MPCResCls, res_regressor.py:15-104) shares the trunk with a 6-way head over
{4, 8, 16, 32, 64, 128}.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.imaging import distance_transform, resize_area

RES_CLASSES = (4, 8, 16, 32, 64, 128)


class _Trunk(nn.Module):
    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 6)
        for f in (64, 128, 256, 512, 512):
            x = nn.Conv(f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape((x.shape[0], -1))          # (B, 7*7*512)
        for f in (4096, 1024, 256, 64):
            x = nn.Dense(f)(x)
            x = nn.leaky_relu(x, 0.2)
        return x


class ResRegressorNet(nn.Module):
    out_dim: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_dim)(_Trunk()(x))


def build_input(init_img: np.ndarray, goal_img: np.ndarray,
                state_h: int = 224, state_w: int = 224) -> np.ndarray:
    """The 6-channel input tensor (res_regressor.py:146-173). Host-side.

    init_img/goal_img: binary (H, W) masks. Returns (state_h, state_w, 6).
    """
    assert init_img.shape == goal_img.shape
    h = init_img.shape[0]
    init_dist = distance_transform(1 - init_img.astype(np.uint8)) / h
    goal_dist = distance_transform(1 - goal_img.astype(np.uint8)) / h
    init_excl = np.logical_and(init_img, 1 - goal_img).astype(np.float32)
    goal_excl = np.logical_and(goal_img, 1 - init_img).astype(np.float32)
    chans = [init_img.astype(np.float32), goal_img.astype(np.float32),
             init_dist, goal_dist, init_excl, goal_excl]
    out = np.stack([resize_area(c, (state_h, state_w)) for c in chans],
                   axis=-1)
    return out.astype(np.float32)


class MPCResRgrNoPool:
    """Regressor wrapper with the reference's infer_param contract."""

    def __init__(self, config, params=None):
        self.config = config
        self.state_h = config["train_res_cls"]["state_h"]
        self.state_w = config["train_res_cls"]["state_w"]
        self.net = ResRegressorNet(out_dim=1)
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def init(self, key):
        dummy = jnp.zeros((1, self.state_h, self.state_w, 6))
        self.params = self.net.init(key, dummy)
        return self.params

    def infer_param(self, init_img: np.ndarray, goal_img: np.ndarray) -> int:
        x = build_input(init_img, goal_img, self.state_h, self.state_w)
        out = self._apply(self.params, jnp.asarray(x[None]))
        return int(float(out[0, 0]))


class MPCResCls:
    """Classifier variant: argmax over RES_CLASSES."""

    def __init__(self, config, params=None):
        self.config = config
        self.state_h = config["train_res_cls"]["state_h"]
        self.state_w = config["train_res_cls"]["state_w"]
        self.net = ResRegressorNet(out_dim=len(RES_CLASSES))
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def init(self, key):
        dummy = jnp.zeros((1, self.state_h, self.state_w, 6))
        self.params = self.net.init(key, dummy)
        return self.params

    def infer_param(self, init_img: np.ndarray, goal_img: np.ndarray) -> int:
        x = build_input(init_img, goal_img, self.state_h, self.state_w)
        out = self._apply(self.params, jnp.asarray(x[None]))
        return RES_CLASSES[int(jnp.argmax(out[0]))]
