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
        # sharded GP labeling can leave holes in the scene numbering
        # (worker crashes); index only complete scene dirs. The reference
        # assumes contiguous 0..num_data-1 (dataset_res_rgr.py:14-40) —
        # same ordering here, minus the holes.
        self.scenes = sorted(
            (int(d) for d in os.listdir(data_dir)
             if d.isdigit()
             and os.path.exists(os.path.join(data_dir, d, "opt_den.npy"))
             and os.path.exists(os.path.join(data_dir, d, "init.png"))))
        self.num_data = min(self.num_data, len(self.scenes))
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
        # Dihedral-8 augmentation (train phase only, opt-in): the optimal
        # resolution is invariant under rotations/flips of the workspace,
        # and every input channel (masks, distance transforms, exclusions)
        # is equivariant — so the label passes through unchanged. This is
        # a TPU-repo extra over the reference (no augmentation in
        # train_res_rgr.py): our labeled set is ~5% of the reference's
        # 2760 scenes (config/mpc/config.yaml:64), and the 100M-param FC
        # head memorizes 125 raw scenes within ~20 epochs.
        self.augment = (phase == "train"
                        and bool(config["train_res_cls"].get("augment")))
        self._aug_rng = np.random.default_rng(
            config["train_res_cls"].get("random_seed", 0))

    def __len__(self):
        return self.n_episode

    def __getitem__(self, idx):
        i = self.scenes[idx + self.epi_st_idx]
        init_img = read_color(os.path.join(self.data_dir, f"{i}/init.png")
                              )[..., 0] / 255.0
        goal_img = read_color(os.path.join(self.data_dir, f"{i}/goal.png")
                              )[..., 0] / 255.0
        x = build_input(init_img, goal_img, self.state_h, self.state_w)
        if self.augment:
            k = int(self._aug_rng.integers(8))
            x = np.rot90(x, k % 4, axes=(0, 1))
            if k >= 4:
                x = x[:, ::-1]
            x = np.ascontiguousarray(x)
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


def test_dataset(config=None):
    """Load one random sample and print its shapes/ranges — the dataset
    smoke entry (reference dataset/dataset_res_rgr.py:132-136)."""
    from ..utils.config import load_config

    config = config or load_config()
    ds = DatasetResRgr(config["train_res_cls"]["data_root"], config,
                       "train")
    data = ds[int(np.random.randint(0, len(ds)))]
    for k, v in data.items():
        v = np.asarray(v)
        print(f"{k}: shape={v.shape} range=[{v.min():.4f},{v.max():.4f}]")
    return data


def viz_dataset(config=None, out_dir="mpc_res_dataset_viz"):
    """Histogram the labeled optimal densities/confidences and dump a few
    (init, goal, density) sample cards per density band (reference
    dataset/dataset_res_rgr.py:176-222)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.config import load_config

    config = config or load_config()
    os.makedirs(out_dir, exist_ok=True)
    ds = DatasetResRgr(config["train_res_cls"]["data_root"], config,
                       "train")
    densities = np.zeros(len(ds))
    conf = np.zeros(len(ds))
    for i in range(len(ds)):
        data = ds[i]
        densities[i] = float(np.asarray(data["optimal_den"]).item())
        conf[i] = float(np.asarray(data["conf"]).item())
    for name, vals in [("density_hist", densities), ("conf_hist", conf)]:
        plt.hist(vals, bins=10)
        plt.savefig(os.path.join(out_dir, f"{name}.png"))
        plt.close()
    rng = np.random.default_rng(0)
    for den in (10, 30, 50, 100, 150):
        band = np.flatnonzero(np.abs(densities - den) < 50)
        if band.size == 0:
            continue
        idx = int(rng.choice(band))
        data = ds[idx]
        fig, axes = plt.subplots(1, 3, figsize=(9, 3))
        axes[0].imshow(np.asarray(data["input_img"])[0])
        axes[0].set_title("init")
        axes[1].imshow(np.asarray(data["input_img"])[1])
        axes[1].set_title("goal")
        axes[2].hist(densities, bins=10)
        axes[2].axvline(densities[idx], color="r")
        axes[2].set_title(f"opt_den={densities[idx]:.0f} "
                          f"conf={conf[idx]:.2f}")
        fig.savefig(os.path.join(out_dir, f"{idx}_{den}.png"))
        plt.close(fig)
    print(f"wrote histograms + sample cards to {out_dir}/")


if __name__ == "__main__":
    import sys

    (viz_dataset if "viz" in sys.argv[1:] else test_dataset)()
