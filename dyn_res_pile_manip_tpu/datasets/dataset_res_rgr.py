"""Resolution-regressor dataset (reference dataset/dataset_res_rgr.py:14-130).

Reads {i}/init.png, goal.png, opt_den.npy, opt_y.npy; builds the same
6-channel input as infer_param; regression targets carry the confidence
weight conf = min(exp(-opt_y - 1), 1) (dataset_res_rgr.py:123-126)."""
from __future__ import annotations

import os

import numpy as np

from ..models.res_regressor import RES_CLASSES, build_input
from ..utils.imageio import read_color


class DatasetResRgr:
    def __init__(self, data_dir, config, phase):
        self.config = config
        self.num_data = config["train_res_cls"]["num_data"]
        ratio = config["train_res_cls"]["train_valid_ratio"]
        n_train = int(self.num_data * ratio)
        if phase == "train":
            self.epi_st_idx, self.n_episode = 0, n_train
        elif phase == "valid":
            self.epi_st_idx, self.n_episode = n_train, self.num_data - n_train
        else:
            raise AssertionError(f"Unknown phase {phase}")
        self.data_dir = data_dir
        self.state_h = config["train_res_cls"]["state_h"]
        self.state_w = config["train_res_cls"]["state_w"]
        self.model_type = config["train_res_cls"]["model_type"]

    def __len__(self):
        return self.n_episode

    def __getitem__(self, idx):
        i = idx + self.epi_st_idx
        init_img = read_color(os.path.join(self.data_dir, f"{i}/init.png")
                              )[..., 0] / 255.0
        goal_img = read_color(os.path.join(self.data_dir, f"{i}/goal.png")
                              )[..., 0] / 255.0
        x = build_input(init_img, goal_img, self.state_h, self.state_w)
        opt_den = np.load(os.path.join(self.data_dir, f"{i}/opt_den.npy")).reshape(-1)[:1]
        if self.model_type == "classifier":
            target = int(np.nonzero(
                np.array(RES_CLASSES) == opt_den[0])[0][0])
            return {"input_img": x, "target": np.int32(target),
                    "scores": np.ones(1, np.float32)}
        opt_y = np.load(os.path.join(self.data_dir, f"{i}/opt_y.npy")).reshape(-1)[:1]
        conf = np.minimum(np.exp(-opt_y - 1.0), 1.0).astype(np.float32)
        return {"input_img": x,
                "optimal_den": opt_den.astype(np.float32),
                "conf": conf}


def iterate_batches(dataset, batch_size, shuffle=True, seed=0):
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, len(order), batch_size):
        idxs = order[i:i + batch_size]
        items = [dataset[int(j)] for j in idxs]
        out = {}
        for k in items[0]:
            out[k] = np.stack([it[k] for it in items])
        yield out
