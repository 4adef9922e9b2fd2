"""YAML config system — plain nested dicts, same keys as the reference
(config/{mpc,train,data_gen}/*.yaml; loader utils.py:185-192)."""
from __future__ import annotations

import copy
import datetime
import os

import yaml


def load_yaml(filename: str) -> dict:
    with open(filename, "r") as f:
        return yaml.safe_load(f)


def save_yaml(data: dict, filename: str) -> None:
    with open(filename, "w") as f:
        yaml.dump(data, f, default_flow_style=False)


def timestamp_dir_name() -> str:
    """YYYY-MM-DD-hh-mm-ss-us run-directory name (utils.py:160-182)."""
    now = datetime.datetime.now()
    return "%0.4d-%0.2d-%0.2d-%0.2d-%0.2d-%0.2d-%0.6d" % (
        now.year, now.month, now.day, now.hour, now.minute, now.second,
        now.microsecond)


def merge(base: dict, override: dict) -> dict:
    """Recursively merge ``override`` into ``base`` (returns a new dict)."""
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))


def repo_path(*parts: str) -> str:
    return os.path.join(_REPO_ROOT, *parts)


def default_config() -> dict:
    """A fully-populated config with the reference defaults
    (config/mpc/config.yaml + config/train/gnn_dyn.yaml)."""
    return {
        "dataset": {
            "init_pos": "rand_spread",
            "global_scale": 24,
            "obj": "carrots",
            "particle_r": 0.125,
            "cam_idx": 0,
            "num_worker": 1,
            "wkspc_w": 5.0,
            "headless": True,
            "cont_motion": False,
            "robot_type": "franka",
            "folder": "data/gnn_dyn_data",
            "n_episode": 2000,
            "n_timestep": 10,
        },
        "train": {
            "data_root": "data/gnn_dyn_data",
            "random_seed": 42,
            "n_epoch": 2000,
            "lr": 1.0e-3,
            "adam_beta1": 0.9,
            "batch_size": 4,
            "nf_hidden": 64,
            "num_workers": 5,
            "train_valid_ratio": 0.9,
            "log_per_iter": 50,
            "ckp_per_iter": 1000,
            "n_history": 1,
            "n_rollout": 5,
            "particle": {
                "nf_effect": 64,
                "adj_thresh": 0.08,
                "add_delta": False,
                "resume": {"active": False, "epoch": 0, "iter": 0,
                           "folder": "None"},
            },
        },
        "mpc": {
            "sigma": 0.3,
            "model_folder": "default",
            "iter_num": -1,
            "mppi": {"beta_filter": 0.7, "reward_weight": 0.1},
            "gd": {"beta_filter": 0.7, "lr": 0.05},
            "n_mpc": 20,
            "n_look_ahead": 1,
            "n_sample": 50,
            "n_update_iter": 200,
            "gd_loop": 1,
            "mpc_type": "GD",
            "time_lim": 2000,
            "task": {"type": "target_shape", "goal_row": 360,
                     "goal_col": 360, "goal_r": 75, "target_char": "I"},
            "res_sel": {"active": True, "model_folder": "default",
                        "iter_num": -1},
        },
        "train_res_cls": {
            "model_type": "regressor",
            "random_seed": 42,
            "data_root": "data/res_rgr_data_small",
            "num_data": 30,
            "train_valid_ratio": 0.9,
            "state_h": 224,
            "state_w": 224,
            "res_dim": 6,
            "batch_size": 16,
            "num_worker": 10,
            "n_epoch": 2000,
            "adam_beta1": 0.9,
            "lr": 1.0e-5,
            "lam_reg": 2.0e-4,
            "log_per_iter": 50,
            "ckp_per_iter": 1000,
        },
        "mpc_data": {
            "folder": "data/res_rgr_data",
            "num_scene": 2,
            "mode": "random",
            "record_data": False,
            "gp": {"length": 1.0, "nu": 2.5, "noise": 0.2},
        },
    }


def load_config(filename: str | None = None, overrides: dict | None = None
                ) -> dict:
    cfg = default_config()
    if filename is not None:
        cfg = merge(cfg, load_yaml(filename))
    if overrides:
        cfg = merge(cfg, overrides)
    return cfg
