"""Resolution-regressor training (reference train/train_res_rgr.py).

Confidence-weighted MSE regression (or cross-entropy for the classifier
variant) + L1 weight regularization over kernels (train_res_rgr.py:164-176),
StepLR schedule, net_dy_iter_%d / net_best_dy checkpoints.

Run: python -m dyn_res_pile_manip_tpu.train.train_res_rgr [config.yaml]
"""
from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..datasets.dataset_res_rgr import DatasetResRgr, iterate_batches
from ..models.res_regressor import MPCResCls, MPCResRgrNoPool
from ..utils.config import load_config, save_yaml, timestamp_dir_name
from ..utils.logging import AverageMeter
from .checkpoints import save_model_params


def l1_reg(params):
    leaves = []
    n = 0

    def visit(path, p):
        nonlocal n
        if path and path[-1] == "kernel":
            leaves.append(jnp.sum(jnp.abs(p)))
            n += int(np.prod(p.shape))

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            visit(path, tree)

    walk(params)
    return sum(leaves) / max(n, 1)


def train(config=None):
    if config is None:
        path = sys.argv[1] if len(sys.argv) > 1 else None
        config = load_config(path)
    c = config["train_res_cls"]
    model_type = c["model_type"]
    lam_reg = float(c["lam_reg"])

    train_dir = os.path.join("data/res_rgr_model", timestamp_dir_name())
    os.makedirs(train_dir, exist_ok=True)
    save_yaml(config, os.path.join(train_dir, "config.yaml"))

    datasets = {ph: DatasetResRgr(c["data_root"], config, ph)
                for ph in ("train", "valid")}

    wrapper = (MPCResRgrNoPool if model_type == "regressor"
               else MPCResCls)(config)
    params = wrapper.init(jax.random.PRNGKey(c["random_seed"]))
    net = wrapper.net

    sched = optax.exponential_decay(
        float(c["lr"]), transition_steps=c["lr_scheduler"]["step_size"]
        if "lr_scheduler" in c else 1000,
        decay_rate=c.get("lr_scheduler", {}).get("gamma", 0.1),
        staircase=True) if c.get("lr_scheduler", {}).get("enabled", True) \
        else float(c["lr"])
    optimizer = optax.adam(sched, b1=c["adam_beta1"], b2=0.999)
    opt_state = optimizer.init(params)

    @functools.partial(jax.jit, static_argnames=("update",))
    def step(params, opt_state, batch, update=True):
        def loss_fn(params):
            out = net.apply(params, batch["input_img"])
            if model_type == "regressor":
                mse = ((out[:, 0] - batch["optimal_den"][:, 0]) ** 2
                       * batch["conf"][:, 0]).mean()
                main = mse
            else:
                main = optax.softmax_cross_entropy_with_integer_labels(
                    out, batch["target"]).mean()
            return main + l1_reg(params["params"]) * lam_reg, main

        if update:
            (loss, main), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, main
        loss, main = loss_fn(params)
        return params, opt_state, loss, main

    best_valid_loss = np.inf
    global_iteration = 0
    for epoch in range(c["n_epoch"]):
        for phase in ("train", "valid"):
            meter = AverageMeter()
            for i, batch in enumerate(iterate_batches(
                    datasets[phase], c["batch_size"],
                    shuffle=(phase == "train"), seed=epoch)):
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                params, opt_state, loss, main = step(
                    params, opt_state, jb, update=(phase == "train"))
                loss = float(loss)
                meter.update(loss, batch["input_img"].shape[0])
                if phase == "train":
                    global_iteration += 1
                    if i % c["log_per_iter"] == 0:
                        print("%s %d [%d/%d] loss: %.6f main: %.6f" % (
                            phase, global_iteration, epoch, c["n_epoch"],
                            loss, float(main)))
                    if global_iteration % c["ckp_per_iter"] == 0:
                        save_model_params(
                            params, "%s/net_dy_iter_%d.ckpt"
                            % (train_dir, global_iteration))
            print("%s [%d/%d] Loss: %.6f, Best valid: %.6f" % (
                phase, epoch, c["n_epoch"], meter.avg, best_valid_loss))
            if phase == "valid" and meter.avg < best_valid_loss:
                best_valid_loss = meter.avg
                save_model_params(params, "%s/net_best_dy.ckpt" % train_dir)
    return params


def test_pred_overfit(config=None, params=None, out_dir="res_rgr_overfit"):
    """Render predicted vs ground-truth particle counts per training sample
    (reference train_res_rgr.test_pred_overfit, 231-285)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.config import load_config as _load

    config = config or _load()
    c = config["train_res_cls"]
    wrapper = MPCResRgrNoPool(config)
    if params is None:
        from .checkpoints import load_model_params
        params = load_model_params(
            os.path.join("data/res_rgr_model", "net_best_dy.ckpt"))
    wrapper.params = params
    ds = DatasetResRgr(c["data_root"], config, "train")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(ds)):
        item = ds[i]
        pred = float(wrapper.net.apply(
            params, jnp.asarray(item["input_img"][None]))[0, 0])
        gt = float(item["optimal_den"][0])
        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        axes[0].imshow(item["input_img"][..., 0])
        axes[0].set_title("init")
        axes[1].imshow(item["input_img"][..., 1])
        axes[1].set_title(f"goal | pred {pred:.1f} vs gt {gt:.1f}")
        fig.savefig(os.path.join(out_dir, f"{i}.png"))
        plt.close(fig)
    return out_dir


if __name__ == "__main__":
    train()
