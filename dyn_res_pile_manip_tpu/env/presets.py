"""Carrot-scene initial-distribution presets.

Port of the ~18 named ``init_pos`` presets that build the 20-float carrots
scene-parameter vector (env/flex_env.py:448-797). Each preset returns the
dict of named fields; ``carrots_scene_params`` assembles the vector in the
reference layout (flex_env.py:777-796 <-> yx_carrots.h:18-46).
"""
from __future__ import annotations

import numpy as np


def carrots_preset(init_pos: str, global_scale: float,
                   rng: np.random.Generator) -> dict:
    gs = global_scale
    p = dict(y=0.5, add_singular=0.0, add_sing_x=-1, add_sing_y=-1,
             add_sing_z=-1, add_noise=0.0, num_y=10)

    def grid(max_s, min_s, xz, space_mult, num_fn, n_car_fn, **kw):
        max_scale = max_s * gs / 8.0
        min_scale = min_s * gs / 8.0
        x = z = xz * gs / 8.0
        inter_space = space_mult * max_scale
        num_x = num_fn(abs(x), max_scale, space_mult)
        num_z = num_fn(abs(z), max_scale, space_mult)
        p.update(max_scale=max_scale, min_scale=min_scale, x=x, z=z,
                 inter_space=inter_space, num_x=num_x, num_z=num_z,
                 num_carrots=n_car_fn(num_x, num_z), **kw)

    def n_half_plus1(ax, ms, sm):      # int(|x/sm|/ms + 1) * 2
        return int(ax / sm / ms + 1) * 2

    def n_half(ax, ms, sm):            # int(|x/sm|/ms) * 2
        return int(ax / sm / ms) * 2

    if init_pos == "spread":
        grid(0.1, 0.1, -1.5, 2.0,
             lambda ax, ms, sm: int(ax / 2.0 / ms + 1) * 2 + 1,
             lambda nx, nz: (nx * nz - 1) * 3)
    elif init_pos == "wkspc_spread":
        grid(0.2, 0.2, -1.2, 2.0, n_half_plus1, lambda nx, nz: nx * nz - 1)
    elif init_pos == "wkspc_spread_double":
        grid(0.2, 0.2, -1.2, 2.0, n_half_plus1,
             lambda nx, nz: 2 * (nx * nz - 1))
    elif init_pos == "wkspc_spread_triple":
        grid(0.2, 0.2, -1.2, 2.0, n_half_plus1,
             lambda nx, nz: 3 * (nx * nz - 1))
    elif init_pos == "wkspc_spread_4":
        grid(0.2, 0.2, -1.2, 2.0, n_half_plus1,
             lambda nx, nz: 4 * (nx * nz - 1))
    elif init_pos == "extra_large_wkspc_spread":
        grid(0.3, 0.3, -1.2, 2.0, n_half, lambda nx, nz: 2 * (nx * nz - 1))
    elif init_pos == "extra_small_wkspc_spread":
        grid(0.09, 0.09, -1.2, 2.0, n_half_plus1,
             lambda nx, nz: 4 * (nx * nz - 1))
    elif init_pos == "extra_small_half_spread":
        grid(0.09, 0.09, -0.9, 2.0, n_half_plus1,
             lambda nx, nz: 4 * (nx * nz - 1))
    elif init_pos == "rand_blob":
        rand_scale = rng.uniform(0.07, 0.12) * gs / 8.0
        blob_r = rng.uniform(0.3, 0.5)
        x = z = -blob_r * gs / 8.0
        num_x = int(abs(x) / rand_scale) * 2
        num_z = int(abs(z) / rand_scale) * 2
        x_off = gs * rng.uniform(-1.0 / 12.0, 1.0 / 8.0)
        z_off = gs * rng.uniform(-1.0 / 12.0, 1.0 / 8.0)
        p.update(max_scale=rand_scale, min_scale=rand_scale,
                 x=x + x_off, z=z + z_off, inter_space=rand_scale,
                 num_x=num_x, num_z=num_z,
                 num_carrots=(num_x * num_z - 1) * 3)
    elif init_pos == "rand_spread":
        rand_scale = rng.uniform(0.09, 0.12) * gs / 8.0
        blob_r = rng.uniform(0.7, 1.0)
        x = z = -blob_r * gs / 8.0
        num_x = int(abs(x / 1.5) / rand_scale + 1) * 2
        num_z = int(abs(z / 1.5) / rand_scale + 1) * 2
        x_off = gs * rng.uniform(-1.0 / 24.0, 1.0 / 24.0)
        z_off = gs * rng.uniform(-1.0 / 24.0, 1.0 / 24.0)
        p.update(max_scale=rand_scale, min_scale=rand_scale,
                 x=x + x_off, z=z + z_off, inter_space=1.5 * rand_scale,
                 num_x=num_x, num_z=num_z,
                 num_carrots=(num_x * num_z - 1) * 3)
    elif init_pos == "rand_sparse_spread":
        rand_scale = 0.12 * gs / 8.0
        blob_r = rng.uniform(1.0, 1.5)
        x = z = -blob_r * gs / 8.0
        num_x = int(abs(x / 2.0) / rand_scale) * 2
        num_z = int(abs(z / 2.0) / rand_scale) * 2
        p.update(max_scale=rand_scale, min_scale=rand_scale, x=x, z=z,
                 inter_space=rand_scale * 2, num_x=num_x, num_z=num_z,
                 num_carrots=(num_x * num_z - 1) * 1)
    elif init_pos == "rb_corner":
        ms = 0.12 * gs / 8.0
        x = z = -0.4 * gs / 8.0
        num_x = num_z = int(abs(x) / ms) * 2
        p.update(max_scale=ms, min_scale=ms, x=x + gs / 8.0, z=z + gs / 8.0,
                 inter_space=ms, num_x=num_x, num_z=num_z,
                 num_carrots=(num_x * num_z - 1) * 3)
    elif init_pos == "center":
        ms = 0.12 * gs / 8.0
        x = z = -0.4 * gs / 8.0
        num_x = num_z = int(abs(x) / ms) * 2
        p.update(max_scale=ms, min_scale=ms, x=x, z=z, inter_space=ms,
                 num_x=num_x, num_z=num_z,
                 num_carrots=(num_x * num_z - 1) * 3)
    elif init_pos == "center_init_2":
        ms = 0.12 * gs / 8.0
        x = z = -1.0 * gs / 8.0
        num_x = num_z = int(abs(x / 2.0) / ms) * 2
        p.update(max_scale=ms, min_scale=ms, x=x, z=z, inter_space=ms * 2,
                 num_x=num_x, num_z=num_z,
                 num_carrots=(num_x * num_z - 1) * 1, add_noise=1.0)
    elif init_pos == "rt_corner":
        ms = 0.15 * gs / 8.0
        x = z = -0.35 * gs / 8.0
        num_x = num_z = int(abs(x) / ms) * 2
        p.update(max_scale=ms, min_scale=ms, x=x + gs / 8.0, z=z - gs / 8.0,
                 inter_space=ms, num_x=num_x, num_z=num_z,
                 num_carrots=int(0.25 * gs / (ms ** 2)))
    elif init_pos == "wkspc_spread_multi_granularity":
        ms, mn = 0.2 * gs / 8.0, 0.05 * gs / 8.0
        x = z = -1.2 * gs / 8.0
        num_x = num_z = int(abs(x / 2.0) / ms + 1) * 2
        p.update(max_scale=ms, min_scale=mn, x=x, z=z, inter_space=2 * ms,
                 num_x=num_x, num_z=num_z,
                 num_carrots=(num_x * num_z - 1) * 2)
    elif init_pos == "singular":
        ms = 0.15 * gs / 8.0
        x = z = -0.35 * gs / 8.0
        num_x = num_z = int(abs(x) / ms) * 2
        p.update(max_scale=ms, min_scale=ms, x=x - gs / 8.0, z=z,
                 inter_space=ms, num_x=num_x, num_z=num_z,
                 num_carrots=int(0.25 * gs / (ms ** 2)),
                 add_singular=1.0, add_sing_x=3.0 * gs / 24.0,
                 add_sing_y=0.5, add_sing_z=0.0)
    elif init_pos == "blank":
        ms = 0.15 * gs / 8.0
        x = z = -0.35 * gs / 8.0
        p.update(max_scale=ms, min_scale=ms, x=x - gs, z=z,
                 inter_space=ms, num_x=1, num_z=1, num_carrots=1,
                 add_sing_x=3.0 * gs / 24.0, add_sing_y=0.5, add_sing_z=0.0)
    else:
        raise NotImplementedError(init_pos)
    return p


def carrots_scene_params(init_pos: str, global_scale: float,
                         rng: np.random.Generator,
                         static_friction: float = 1.0,
                         dynamic_friction: float = 0.9) -> np.ndarray:
    """Assemble the 20-float carrots scene-parameter vector."""
    p = carrots_preset(init_pos, global_scale, rng)
    return np.array([
        p["max_scale"], p["min_scale"], p["x"], p["y"], p["z"],
        static_friction, dynamic_friction, 1.0,  # draw_skin
        p["num_carrots"], 10.0, 20.0,            # min_dist, max_dist
        p["num_x"], p["num_y"], p["num_z"], p["inter_space"],
        p["add_singular"], p["add_sing_x"], p["add_sing_y"],
        p["add_sing_z"], p["add_noise"],
    ])
