"""Dynamics-dataset generation (reference data_gen/gnn_dyn_data.py:37-130).

Per episode: reset -> save frame 0 (color/depth/particles) -> 10 random
pushes, each retried until the post-push image changes (color_diff >= 0.001
no-op rejection, gnn_dyn_data.py:83-95), NaN explosions restart the episode.
Episode layout on disk matches the reference exactly.

Run: python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data [config.yaml]
Multi-host scaling: shard episodes by worker via --base-epi/--n-epi
(embarrassingly parallel; the reference's disabled mp pool,
gnn_dyn_data.py:113-130).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import pickle
import time

import numpy as np

from ..env.flex_env import FlexEnv
from ..utils.config import load_config
from ..utils.imageio import write_color, write_depth

FG_THRESHOLD = 0.599 / 0.8


def push_hits_pile(u: np.ndarray, positions: np.ndarray,
                   margin: float = 0.95) -> bool:
    """Geometric pre-filter for the no-op rejection loop: a push whose swept
    pusher segment stays > margin away from every particle footprint cannot
    change the image (the reference discovers this only after simulating,
    gnn_dyn_data.py:83-95 — rejected pushes are resampled BEFORE paying a
    simulated push; the color-diff test stays as the final arbiter, so the
    accepted-action distribution is unchanged).

    u: [xs, ys, xe, ye] in workspace coords (y maps to -z).
    positions: flat (n*4,) pyflex positions.
    """
    p = positions.reshape(-1, 4)
    pts = np.stack([p[:, 0], -p[:, 2]], axis=1)      # (n, 2) in action coords
    s, e = u[:2], u[2:4]
    d = e - s
    len2 = float(d @ d)
    if len2 < 1e-12:
        dist2 = ((pts - s) ** 2).sum(axis=1)
    else:
        t = np.clip((pts - s) @ d / len2, 0.0, 1.0)
        dist2 = ((pts - (s + t[:, None] * d)) ** 2).sum(axis=1)
    return bool((dist2 < margin * margin).any())


def save_frame(epi_dir: str, t: int, img: np.ndarray, positions: np.ndarray,
               global_scale: float) -> np.ndarray:
    """White out background, write color/depth/particles; returns the
    whited image used for the diff test."""
    img = img.copy()
    img[:, :, :3][img[:, :, -1] > FG_THRESHOLD * global_scale] = 255.0
    write_color(os.path.join(epi_dir, f"{t}_color.png"), img[:, :, :3])
    write_depth(os.path.join(epi_dir, f"{t}_depth.png"), img[:, :, -1])
    np.save(os.path.join(epi_dir, f"{t}_particles.npy"), positions)
    return img


def write_manifest(epi_dir: str, n_timestep: int, seed, base_epi: int,
                   extra=None):
    """Per-episode content manifest (VERDICT r4 #6: episode trees are
    wipe-bait; a committed manifest makes any regenerated tree verifiable
    bit-exact or flagged). Hashes every frame artifact + actions.p.
    Layout parity: the reference's episode dir
    (data_gen/gnn_dyn_data.py:97-103) plus this one extra file.

    NOTE on regeneration: workers seed one global stream per shard, so
    episode k's bytes depend on the full retry history since the shard
    start — regeneration must replay the shard from its base seed; the
    hashes verify the result either way.
    """
    names = [f"{t}_{kind}" for t in range(n_timestep + 1)
             for kind in ("color.png", "depth.png", "particles.npy")]
    names.append("actions.p")
    hashes = {}
    for name in names:
        p = os.path.join(epi_dir, name)
        if os.path.exists(p):
            hashes[name] = hashlib.md5(open(p, "rb").read()).hexdigest()
    doc = {"episode": os.path.basename(epi_dir), "shard_seed": seed,
           "shard_base_epi": base_epi,
           "written_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                        time.gmtime()),
           "hashes": hashes}
    if extra:
        doc.update(extra)
    tmp = os.path.join(epi_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, os.path.join(epi_dir, "manifest.json"))


def episode_complete(epi_dir: str, n_timestep: int) -> bool:
    """True if the episode dir holds every frame file + actions.p (exact
    index set, not a raw count — see scripts/merge_datagen_shards.py)."""
    if not os.path.isdir(epi_dir):
        return False
    for t in range(n_timestep + 1):
        for suffix in (f"{t}_color.png", f"{t}_depth.png",
                       f"{t}_particles.npy"):
            if not os.path.exists(os.path.join(epi_dir, suffix)):
                return False
    return os.path.exists(os.path.join(epi_dir, "actions.p"))


def gen_data(config, base_epi=0, n_episodes=None, seed=None,
             skip_existing=False):
    data_dir = config["dataset"]["folder"]
    n_episode = n_episodes if n_episodes is not None \
        else config["dataset"]["n_episode"]
    n_timestep = config["dataset"]["n_timestep"]
    global_scale = config["dataset"]["global_scale"]
    obj = config["dataset"]["obj"]
    os.makedirs(data_dir, exist_ok=True)

    env = FlexEnv(config)
    shard_seed = (seed if seed is not None
                  else round(time.time() * 1000) % 2 ** 32)
    env.seed(shard_seed)

    idx_episode = base_epi
    while idx_episode < base_epi + n_episode:
        epi_dir = os.path.join(data_dir, str(idx_episode))
        if skip_existing and episode_complete(epi_dir, n_timestep):
            # restart-idempotent sharding: a supervisor loop can relaunch
            # a worker after a TPU-tunnel drop without redoing episodes
            idx_episode += 1
            continue
        env.reset()
        os.makedirs(epi_dir, exist_ok=True)
        actions = np.zeros((n_timestep, env.act_dim))

        if obj == "ball":
            init_u = np.array([
                env.init_x + 1.2 * (np.random.randint(0, 2) - 0.6),
                -env.init_z - 1.2 * (np.random.randint(0, 2) - 0.6),
                env.init_x, -env.init_z])
            if env.step(init_u) is None:
                print("rerun episode %d" % idx_episode, flush=True)
                continue
        img = env.render()
        last_img = save_frame(epi_dir, 0, img, env.get_positions(),
                              global_scale)

        valid = True
        t_epi = time.time()
        n_tries = 0
        n_prefiltered = 0
        for t in range(n_timestep):
            color_diff = 0.0
            while color_diff < 0.001:
                positions = env.get_positions()
                while True:
                    if config["dataset"].get("action_bias", False):
                        u = env.sample_action_obj_biased(1)[0]
                    else:
                        u, _ = env.sample_action(1)
                        u = u[0, 0]
                    if push_hits_pile(u, positions):
                        break
                    n_prefiltered += 1
                n_tries += 1
                img = env.step(u)
                if img is None:
                    valid = False
                    print("rerun episode %d" % idx_episode, flush=True)
                    break
                img = img.copy()
                img[:, :, :3][img[:, :, -1]
                              > FG_THRESHOLD * global_scale] = 255.0
                color_diff = np.mean(
                    np.abs(img[:, :, :3] - last_img[:, :, :3]))
            if not valid:
                break
            last_img = save_frame(epi_dir, t + 1, img, env.get_positions(),
                                  global_scale)
            actions[t] = u
        with open(os.path.join(epi_dir, "actions.p"), "wb") as fp:
            pickle.dump(actions, fp)
        if valid:
            print("episode %d: %.1fs, %d pushes (%d no-op retries, "
                  "%d prefiltered)"
                  % (idx_episode, time.time() - t_epi, n_timestep,
                     n_tries - n_timestep, n_prefiltered), flush=True)
            write_manifest(epi_dir, n_timestep, shard_seed, base_epi)
            idx_episode += 1
    env.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--base-epi", type=int, default=0)
    ap.add_argument("--n-epi", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--skip-existing", action="store_true")
    args = ap.parse_args()
    config = load_config(args.config)
    gen_data(config, base_epi=args.base_epi, n_episodes=args.n_epi,
             seed=args.seed, skip_existing=args.skip_existing)


if __name__ == "__main__":
    main()
