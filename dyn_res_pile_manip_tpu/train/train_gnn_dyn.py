"""GNN dynamics training (reference train/train_gnn_dyn.py).

Differences by design:
- the reference boots a live FlexEnv solely to read camera constants
  (train_gnn_dyn.py:54-59); the Camera module provides them directly.
- ragged batches are padded to power-of-two buckets so the jitted train
  step compiles a handful of times instead of per-shape.
- 5-step autoregressive rollout loss with per-sample masked MSE
  (train_gnn_dyn.py:153-191); Adam lr 1e-3; checkpoints
  net_epoch_%d_iter_%d.ckpt + net_best.ckpt by valid loss (214-228).

Run: python -m dyn_res_pile_manip_tpu.train.train_gnn_dyn [config.yaml]
"""
from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.camera import Camera
from ..datasets.dataset_gnn_dyn import ParticleDataset, iterate_batches
from ..models.gnn_dyn import PropNetDiffDenModel
from ..utils.config import load_config, save_yaml, timestamp_dir_name
from ..utils.logging import AverageMeter
from .checkpoints import save_model_params


def bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def make_train_step(model: PropNetDiffDenModel, optimizer, n_rollout: int):
    @functools.partial(jax.jit, static_argnames=("update",))
    def step(params, opt_state, states, states_delta, attrs, nums, dens,
             update: bool = True):
        B, T, N, _ = states.shape
        mask = (jnp.arange(N)[None, :] < nums[:, None]).astype(jnp.float32)

        def loss_fn(params):
            s_cur = states[:, 0]
            a_cur = attrs[:, 0]
            loss = 0.0
            for t in range(n_rollout):
                s_pred = model.predict_one_step(
                    params, a_cur, s_cur, states_delta[:, t], dens,
                    particle_nums=nums)
                err = (s_pred - states[:, t + 1]) ** 2 * mask[..., None]
                per_sample = err.sum(axis=(1, 2)) / jnp.maximum(
                    nums * 3, 1)
                loss = loss + per_sample.sum()
                s_cur = s_pred
            return loss / (n_rollout * B)

        if update:
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
        return params, opt_state, loss_fn(params)

    return step


def train(config=None):
    if config is None:
        path = sys.argv[1] if len(sys.argv) > 1 else None
        config = load_config(path)
    n_rollout = config["train"]["n_rollout"]
    ckp_per_iter = config["train"]["ckp_per_iter"]
    log_per_iter = config["train"]["log_per_iter"]
    n_epoch = config["train"]["n_epoch"]
    gs = config["dataset"]["global_scale"]

    camera = Camera.default(gs, config["dataset"].get("cam_idx", 0))
    cam = [camera.cam_params(), camera.extrinsics()]

    train_root = "data/gnn_dyn_model"
    resume = config["train"]["particle"]["resume"]
    train_dir = os.path.join(
        train_root, resume["folder"] if resume["active"]
        else timestamp_dir_name())
    os.makedirs(train_dir, exist_ok=True)
    save_yaml(config, os.path.join(train_dir, "config.yaml"))
    log_path = os.path.join(train_dir, "log.txt")
    log_fout = open(log_path, "a" if resume["active"] else "w")

    datasets = {ph: ParticleDataset(config["train"]["data_root"], config,
                                    ph, cam) for ph in ("train", "valid")}

    model = PropNetDiffDenModel(config)
    params = model.init(jax.random.PRNGKey(config["train"]["random_seed"]))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print("model #params: %d" % n_params)

    if resume["active"]:
        from .checkpoints import load_model_params
        ckpt = os.path.join(train_dir, "net_epoch_%d_iter_%d.ckpt"
                            % (resume["epoch"], resume["iter"]))
        print("Loading saved ckp from %s" % ckpt)
        params = load_model_params(ckpt)

    optimizer = optax.adam(float(config["train"]["lr"]),
                           b1=config["train"]["adam_beta1"], b2=0.999)
    opt_state = optimizer.init(params)
    if resume["active"]:
        # full-state resume (params + optimizer moments) via orbax, when a
        # state checkpoint exists alongside the weights
        from .checkpoints import restore_train_state
        state_dir = os.path.join(train_dir, "state_epoch_%d_iter_%d"
                                 % (resume["epoch"], resume["iter"]))
        if os.path.isdir(state_dir):
            params, opt_state = restore_train_state(
                state_dir, (params, opt_state))
            print("Restored optimizer state from %s" % state_dir)
    train_step = make_train_step(model, optimizer, n_rollout)

    st_epoch = resume["epoch"] if resume["active"] and resume["epoch"] > 0 \
        else 0
    best_valid_loss = np.inf
    bs = config["train"]["batch_size"]
    for epoch in range(st_epoch, n_epoch):
        for phase in ("train", "valid"):
            meter = AverageMeter()
            for i, batch in enumerate(iterate_batches(
                    datasets[phase], bs, shuffle=(phase == "train"),
                    seed=epoch)):
                s, d, a, nums, dens = batch
                nb = bucket(s.shape[2])
                pad = nb - s.shape[2]
                if pad:
                    s = np.pad(s, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    d = np.pad(d, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    a = np.pad(a, ((0, 0), (0, 0), (0, pad)))
                params, opt_state, loss = train_step(
                    params, opt_state, jnp.asarray(s), jnp.asarray(d),
                    jnp.asarray(a), jnp.asarray(nums), jnp.asarray(dens),
                    update=(phase == "train"))
                loss = float(loss)
                meter.update(loss, s.shape[0])

                if i % log_per_iter == 0:
                    log = "%s [%d/%d][%d] Loss: %.6f (%.6f)" % (
                        phase, epoch, n_epoch, i, np.sqrt(loss),
                        np.sqrt(meter.avg))
                    print(log)
                    log_fout.write(log + "\n")
                    log_fout.flush()
                if phase == "train" and i % ckp_per_iter == 0:
                    save_model_params(params, "%s/net_epoch_%d_iter_%d.ckpt"
                                      % (train_dir, epoch, i))
                    from .checkpoints import save_train_state
                    save_train_state((params, opt_state),
                                     "%s/state_epoch_%d_iter_%d"
                                     % (train_dir, epoch, i))
            log = "%s [%d/%d] Loss: %.6f, Best valid: %.6f" % (
                phase, epoch, n_epoch, np.sqrt(meter.avg),
                np.sqrt(best_valid_loss))
            print(log)
            log_fout.write(log + "\n")
            log_fout.flush()
            if phase == "valid" and meter.avg < best_valid_loss:
                best_valid_loss = meter.avg
                save_model_params(params, "%s/net_best.ckpt" % train_dir)
    log_fout.close()
    return params


if __name__ == "__main__":
    train()
