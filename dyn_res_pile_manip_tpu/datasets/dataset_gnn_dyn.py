"""GNN-dynamics dataset: dynamic-resolution tracked-particle sequences.

Re-implementation of the reference ParticleDataset
(dataset/dataset_gnn_dyn.py:27-201), framework-free (no torch DataLoader):

per sample: draw particle density ~ U(15, 6500) -> radius; FPS-rad sample
tracked particles from the frame's depth; bind each to the nearest GT sim
particle (KDTree); states = GT particle trajectories at those indices over
n_his + n_roll frames; states_delta computed by the same pusher model as the
planner's gen_s_delta (dataset_gnn_dyn.py:121-194). Episode layout on disk
matches the reference (data_dir/{epi}/{t}_color.png, {t}_depth.png uint16 mm,
{t}_particles.npy, actions.p), so reference-generated data loads directly.
"""
from __future__ import annotations

import os
import pickle

import numpy as np
from scipy.spatial import cKDTree

from ..utils import pointcloud as pc
from ..utils.imageio import read_depth

FG_THRESHOLD = 0.599 / 0.8
DEN_MIN, DEN_MAX = 15.0, 6500.0
PUSHER_W = 0.8 / 24.0


def pusher_delta(particles_cam: np.ndarray, action: np.ndarray,
                 cam_extrinsic: np.ndarray, global_scale: float) -> np.ndarray:
    """NumPy twin of planner.gen_s_delta for dataset labeling
    (dataset_gnn_dyn.py:121-194)."""
    s, e = action[:2], action[2:]
    s_3d = np.array([s[0], 0.0, -s[1]])
    e_3d = np.array([e[0], 0.0, -e[1]])
    s_cam = pc.opengl2cam(s_3d[None], cam_extrinsic, global_scale)[0]
    e_cam = pc.opengl2cam(e_3d[None], cam_extrinsic, global_scale)[0]
    push_dir = e_cam - s_cam
    push_l = np.linalg.norm(push_dir)
    push_dir = push_dir / max(push_l, 1e-9)
    ortho = np.array([-push_dir[1], push_dir[0], 0.0])
    pos_diff = particles_cam - s_cam[None]
    proj_ortho = pos_diff @ ortho
    proj = pos_diff @ push_dir
    l_mask = ((proj < push_l) & (proj > 0.0)).astype(np.float32)
    w_excess = np.maximum(np.maximum(-PUSHER_W - proj_ortho, 0.0),
                          np.maximum(proj_ortho - PUSHER_W, 0.0))
    w_mask = np.exp(-w_excess / 0.01)
    to_end = (e_cam[None] - particles_cam) @ push_dir
    return (to_end[:, None] * push_dir[None]
            * l_mask[:, None] * w_mask[:, None])


class _FileCache:
    """Per-process cache of decoded episode files: the 1-core host is the
    training bottleneck otherwise (each sample re-decodes a 720^2 PNG and
    six particle arrays)."""

    def __init__(self, max_items=4096):
        self.store = {}
        self.max_items = max_items

    def get(self, key, loader):
        if key not in self.store:
            if len(self.store) >= self.max_items:
                self.store.pop(next(iter(self.store)))
            self.store[key] = loader()
        return self.store[key]


_CACHE = _FileCache()


class ParticleDataset:
    @staticmethod
    def list_episodes(data_dir, n_timestep, cap=None):
        """Sorted COMPLETE episode indices on disk (actions.p + the last
        frame's triple). Gap-tolerant: sharded datagen workers write
        disjoint contiguous ranges, so mid-run the union has holes — the
        loader indexes this explicit list instead of range(n_episode)."""
        try:
            dirs = sorted(int(d) for d in os.listdir(data_dir)
                          if d.isdigit())
        except FileNotFoundError:
            return []
        out = []
        for e in dirs:
            d = os.path.join(data_dir, str(e))
            if (os.path.exists(os.path.join(d, "actions.p"))
                    and os.path.exists(
                        os.path.join(d, f"{n_timestep}_particles.npy"))):
                out.append(e)
            if cap is not None and len(out) >= cap:
                break
        return out

    def __init__(self, data_dir, config, phase, cam):
        self.config = config
        n_episode = config["dataset"]["n_episode"]
        n_timestep = config["dataset"]["n_timestep"]
        self.global_scale = config["dataset"]["global_scale"]
        ratio = config["train"]["train_valid_ratio"]
        episodes = self.list_episodes(data_dir, n_timestep, cap=n_episode)
        if not episodes:
            episodes = list(range(n_episode))  # trust the config blindly
        n_train = int(len(episodes) * ratio)
        if phase == "train":
            self.episodes = episodes[:n_train]
        elif phase == "valid":
            self.episodes = episodes[n_train:]
        else:
            raise AssertionError(f"Unknown phase {phase}")
        self.n_episode = len(self.episodes)
        self.n_timestep = n_timestep + 1
        self.n_his = config["train"]["n_history"]
        self.n_roll = config["train"]["n_rollout"]
        self.data_dir = data_dir
        self.cam_params, self.cam_extrinsic = cam
        self.rng = np.random.default_rng()

    def __len__(self):
        return self.n_episode * (self.n_timestep - self.n_his
                                 - self.n_roll + 1)

    def read_particles(self, path):
        def load():
            particles = np.load(path).reshape(-1, 4).copy()
            particles[:, 3] = 1.0
            return pc.opengl2cam(particles[:, :3], self.cam_extrinsic,
                                 self.global_scale)
        return _CACHE.get(("ptcl", path), load)

    def read_depth_raw(self, path):
        return _CACHE.get(("depth", path),
                          lambda: read_depth(path).astype(np.uint16))

    def __getitem__(self, idx):
        particle_den = self.rng.uniform(DEN_MIN, DEN_MAX)
        particle_r = 1.0 / np.sqrt(particle_den)

        offset = self.n_timestep - self.n_his - self.n_roll + 1
        idx_episode = self.episodes[idx // offset]
        idx_timestep = idx % offset
        epi = os.path.join(self.data_dir, str(idx_episode))

        with open(os.path.join(epi, "actions.p"), "rb") as fp:
            actions = pickle.load(fp)

        # foreground cloud, voxel-prefiltered at 0.01 (the same filter the
        # env's perception path applies, flex_env.obs2ptcl_fixed_num) and
        # cached per frame: radius-FPS on the raw ~100k-pixel cloud is a
        # host-side O(N * particle_num) loop that would starve the trainer
        # at datagen scale. 0.01 < min sampling radius 1/sqrt(DEN_MAX).
        def load_fgpcd():
            depth = self.read_depth_raw(
                os.path.join(epi, f"{idx_timestep}_depth.png")
            ).astype(np.float64) / (self.global_scale * 1000.0)
            full = pc.depth2fgpcd(depth, depth < FG_THRESHOLD,
                                  self.cam_params)
            return pc.downsample_pcd(full, 0.01)

        fgpcd = _CACHE.get(("fgpcd", epi, idx_timestep), load_fgpcd)
        sampled = pc.fps_rad(fgpcd, particle_r)
        particle_num = sampled.shape[0]
        sampled = pc.recenter(fgpcd, sampled, r=min(0.02, 0.5 * particle_r))

        first = self.read_particles(
            os.path.join(epi, f"{idx_timestep}_particles.npy"))
        _, nearest = cKDTree(first).query(sampled, k=1)

        T = self.n_his + self.n_roll
        states = np.zeros((T, particle_num, 3))
        states_delta = np.zeros((T - 1, particle_num, 3))
        attrs = np.zeros((T, particle_num))
        for i in range(idx_timestep, idx_timestep + T):
            particles = self.read_particles(
                os.path.join(epi, f"{i}_particles.npy"))
            t = i - idx_timestep
            states[t] = particles[nearest]
            if t < T - 1:
                states_delta[t] = pusher_delta(
                    particles[nearest], actions[i], self.cam_extrinsic,
                    self.global_scale)
        return (states.astype(np.float32),
                states_delta.astype(np.float32),
                attrs.astype(np.float32), particle_num,
                np.float32(particle_den))


def collate_pad(batch, n_max=None):
    """Zero-pad a ragged batch to a common particle count
    (train_gnn_dyn.py:20-43). Returns numpy arrays + particle_nums."""
    states, deltas, attrs, nums, dens = zip(*batch)
    max_len = max(nums) if n_max is None else n_max
    B = len(batch)
    T = states[0].shape[0]
    s = np.zeros((B, T, max_len, 3), np.float32)
    d = np.zeros((B, T - 1, max_len, 3), np.float32)
    a = np.zeros((B, T, max_len), np.float32)
    nums = [min(n, max_len) for n in nums]
    for i in range(B):
        n = nums[i]
        s[i, :, :n] = states[i][:, :n]
        d[i, :, :n] = deltas[i][:, :n]
        a[i, :, :n] = attrs[i][:, :n]
    return s, d, a, np.asarray(nums, np.int32), np.asarray(dens, np.float32)


def iterate_batches(dataset, batch_size, shuffle=True, seed=0, n_max=None):
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        batch = [dataset[int(j)] for j in order[i:i + batch_size]]
        yield collate_pad(batch, n_max=n_max)


def dataset_test(config=None, out="dataset_tracked.gif"):
    """Render tracked particles + pusher-delta arrows over an episode
    (reference dataset_gnn_dyn.dataset_test, 203-226)."""
    from ..core.camera import Camera
    from ..utils.config import load_config
    from ..utils.imageio import read_color
    from ..utils.obs import _draw_line
    from ..utils.video import VideoRecorder

    config = config or load_config()
    cam_obj = Camera.default(config["dataset"]["global_scale"])
    cam = [cam_obj.cam_params(), cam_obj.extrinsics()]
    ds = ParticleDataset(config["train"]["data_root"], config, "train", cam)
    states, states_delta, _, num, _ = ds[0]
    vid = VideoRecorder(out, fps=1)
    for t in range(states.shape[0] - 1):
        img = read_color(
            f"{ds.data_dir}/0/{t}_color.png").astype(np.float64).copy()
        pix = pc.pcd2pix(states[t], cam[0])
        nxt = pc.pcd2pix(states[t] + states_delta[t], cam[0])
        for j in range(pix.shape[0]):
            _draw_line(img, (pix[j, 1], pix[j, 0]), (pix[j, 1], pix[j, 0]),
                       (0, 0, 255), 5)
            _draw_line(img, (pix[j, 1], pix[j, 0]), (nxt[j, 1], nxt[j, 0]),
                       (0, 255, 0), 2)
        vid.write(img)
    vid.close()
    return out


def calibrate_res_range(config=None):
    """Measure the usable particle-density range on extreme scenes
    (reference dataset_gnn_dyn.calibrate_res_range, 228-251)."""
    from ..env.flex_env import FlexEnv
    from ..utils.config import load_config

    config = config or load_config()
    env = FlexEnv(config)
    out = {}
    for name, preset, n in (("max", "rb_corner", 100),
                            ("min", "extra_small_wkspc_spread", 2)):
        env.init_pos = preset
        env.reset()
        raw = env.render()
        depth = raw[..., -1] / config["dataset"]["global_scale"]
        fgpcd = pc.depth2fgpcd(depth, depth < FG_THRESHOLD,
                               env.get_cam_params())
        _, r = pc.fps_np(fgpcd, n)
        out[f"{name}_particle_den"] = 1.0 / (r ** 2)
        print(f"{name}_particle_den: {out[f'{name}_particle_den']:.1f}")
    return out


if __name__ == "__main__":
    calibrate_res_range()
