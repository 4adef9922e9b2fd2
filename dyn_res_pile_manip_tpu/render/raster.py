"""Fused JAX depth/RGB point-splat rasterizer.

Replaces the reference's headless OpenGL renderer
(PyFleX/bindings/opengl/shadersGL.cpp: EGL context 3326, DrawPoints 892,
ReadFrame/ReadDepth 497-510) with a pure-JAX rasterizer that runs fused with
the simulator under one jit:

- particles are splatted as z-buffered spheres through the same projection
  (45 deg fov, near 0.01, far 1000 — pyflex.cpp:1246-1248) and view matrix;
- ground plane and oriented boxes (walls / pusher) are ray-traced
  analytically per pixel;
- the depth channel is linear eye-space depth in world units, matching
  pyflex.cpp:3775-3784's z-buffer linearization, so the perception contract
  (foreground = depth/global_scale < 0.599/0.8, env/flex_env.py:912) holds.

Output: (H, W, 5) float32 = RGBA in 0..255 plus depth.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.types import Colliders

SPLAT = 5  # splat footprint is SPLAT x SPLAT pixels

FLOOR_COLOR = jnp.array([0.78, 0.78, 0.80])
BOX_COLOR = jnp.array([0.9, 0.9, 0.9])
LIGHT_DIR = jnp.array([0.1, 2.0, 0.1]) / jnp.linalg.norm(
    jnp.array([0.1, 2.0, 0.1]))


def _yaw_rot(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, z, s], -1),
                      jnp.stack([z, o, z], -1),
                      jnp.stack([-s, z, c], -1)], -2)


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "skin", "shadows",
                                    "expand"))
def render_rgbd(x: jnp.ndarray, active: jnp.ndarray, colliders: Colliders,
                cv_from_world: jnp.ndarray, fx, fy, cx, cy,
                particle_color: jnp.ndarray, draw_radius,
                width: int = 720, height: int = 720,
                skin: bool = False, shadows: bool = False,
                expand: int | None = None,
                box_colors: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rasterize particles + analytic colliders to an RGBD observation.

    cv_from_world: 4x4 matrix to OpenCV camera coords (x right, y down,
    z forward = depth); see core.camera.Camera.opencv_from_world.

    skin: approximate the reference's skinned rigid-body hulls
        (CreateParticleShape skin=true + draw_skin, yx_carrots.h:69-81,
        pyflex.cpp DrawShapes:1525-1620) by expanding splats ~the skin
        offset so rigid groups merge into smooth blobs. Video/demo path
        only — the perception contract keeps the exact particle radius.
    shadows: one-bounce directional shadow map (opengl/shadersGL.cpp:984
        shadow pass): particle centers are scattered into a light-space
        ortho depth buffer; floor/box/particle pixels darken when occluded
        toward the light. Off in the fused hot path (costs one H*W gather).
    """
    H, W = height, width
    far = jnp.float32(1e4)

    # ---------------- background: floor + boxes, per-pixel rays ------------
    world_from_cv = jnp.linalg.inv(cv_from_world)
    origin = world_from_cv[:3, 3]
    px = jnp.arange(W, dtype=jnp.float32)
    py = jnp.arange(H, dtype=jnp.float32)
    dirx = (px[None, :] - cx) / fx
    diry = (py[:, None] - cy) / fy
    dir_cv = jnp.stack([jnp.broadcast_to(dirx, (H, W)),
                        jnp.broadcast_to(diry, (H, W)),
                        jnp.ones((H, W))], axis=-1)           # (H,W,3)
    dir_world = dir_cv @ world_from_cv[:3, :3].T

    # floor y=0: origin.y + t*dir.y = 0  (depth == t since dir_cv.z == 1)
    t_floor = jnp.where(dir_world[..., 1] < -1e-6,
                        -origin[1] / dir_world[..., 1], far)
    bg_depth = jnp.where(t_floor > 0, t_floor, far)
    checker = ((jnp.floor((origin[0] + t_floor * dir_world[..., 0]) / 2.0)
                + jnp.floor((origin[2] + t_floor * dir_world[..., 2]) / 2.0))
               % 2.0)
    floor_rgb = FLOOR_COLOR[None, None, :] * (0.92 + 0.08 * checker[..., None])
    bg_rgb = jnp.where((t_floor < far)[..., None], floor_rgb, 0.0)

    # boxes (slab test in the box frame)
    has_quat = colliders.box_quat.shape[0] == colliders.box_center.shape[0]

    def box_body(b, carry):
        bg_depth, bg_rgb = carry
        R = _yaw_rot(colliders.box_yaw[b])
        if has_quat:
            from ..sim.pbd import _quat_to_mat
            R = R @ _quat_to_mat(colliders.box_quat[b][None])[0]
        o_l = (origin - colliders.box_center[b]) @ R
        d_l = dir_world @ R
        half = colliders.box_half[b]
        inv = 1.0 / jnp.where(jnp.abs(d_l) < 1e-9,
                              jnp.sign(d_l) * 1e-9 + 1e-12, d_l)
        t0 = (-half - o_l) * inv
        t1 = (half - o_l) * inv
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & colliders.box_active[b]
        t = jnp.where(hit, jnp.where(tmin > 0, tmin, tmax), far)
        closer = t < bg_depth
        shade = 0.75 + 0.25 * jnp.clip(-d_l[..., 1], 0, 1)
        # per-shape colors (AddBox color arg, pyflex.cpp:1525-1620
        # DrawShapes per-shape g_colors lookup)
        bc = BOX_COLOR if box_colors is None else box_colors[b]
        rgb = bc[None, None, :] * shade[..., None]
        return (jnp.where(closer, t, bg_depth),
                jnp.where(closer[..., None], rgb, bg_rgb))

    bg_depth, bg_rgb = jax.lax.fori_loop(
        0, colliders.box_center.shape[0], box_body, (bg_depth, bg_rgb))

    # capsules (analytic ray-capsule intersection)
    def cap_body(c, carry):
        bg_depth, bg_rgb = carry
        pa = colliders.cap_p0[c]
        ba = colliders.cap_p1[c] - pa
        r = colliders.cap_radius[c]
        oa = origin - pa
        baba = jnp.dot(ba, ba) + 1e-9
        bard = dir_world @ ba
        baoa = jnp.dot(oa, ba)
        rdoa = dir_world @ oa
        oaoa = jnp.dot(oa, oa)
        rdrd = jnp.sum(dir_world * dir_world, axis=-1)
        a = baba * rdrd - bard * bard
        b = baba * rdoa - baoa * bard
        cq = baba * oaoa - baoa * baoa - r * r * baba
        hdet = b * b - a * jnp.maximum(cq, -1e18)
        t_body = (-b - jnp.sqrt(jnp.maximum(hdet, 0.0))) / jnp.maximum(
            a, 1e-9)
        y = baoa + t_body * bard
        body_hit = (hdet > 0) & (y > 0) & (y < baba) & (t_body > 0)

        def sphere_t(center):
            oc = origin - center
            bq = dir_world @ oc
            cq2 = jnp.dot(oc, oc) - r * r
            h2 = bq * bq - cq2 * jnp.sum(dir_world * dir_world, axis=-1)
            t = (-bq - jnp.sqrt(jnp.maximum(h2, 0.0))) / jnp.maximum(
                jnp.sum(dir_world * dir_world, axis=-1), 1e-9)
            return jnp.where((h2 > 0) & (t > 0), t, far)

        t = jnp.where(body_hit, t_body,
                      jnp.minimum(sphere_t(pa), sphere_t(pa + ba)))
        t = jnp.where(colliders.cap_active[c], t, far)
        closer = t < bg_depth
        rgb = BOX_COLOR[None, None, :] * 0.85
        return (jnp.where(closer, t, bg_depth),
                jnp.where(closer[..., None], rgb, bg_rgb))

    bg_depth, bg_rgb = jax.lax.fori_loop(
        0, colliders.cap_p0.shape[0], cap_body, (bg_depth, bg_rgb))

    # ---------------- particles: sphere splats -----------------------------
    # ONE packed scatter-min fragment per particle (z in the top bits wins;
    # 5-bit subpixel offsets ride along), then a dense 5x5 shifted-window
    # min pass expands each center into its sphere footprint. TPU scatters
    # run at ~10-50M rows/s, so fragments-per-particle is the renderer's
    # cost; the dense expansion is VPU-cheap.
    n = x.shape[0]
    homo = jnp.concatenate([x, jnp.ones((n, 1))], axis=1)
    cam = homo @ cv_from_world.T                               # (N,4)
    xc, yc, zc = cam[:, 0], cam[:, 1], cam[:, 2]
    vis = active & (zc > 0.05)
    u = xc * fx / jnp.maximum(zc, 1e-6) + cx
    v = yc * fy / jnp.maximum(zc, 1e-6) + cy
    u0 = jnp.round(u).astype(jnp.int32)
    v0 = jnp.round(v).astype(jnp.int32)
    su = jnp.clip((u - u0.astype(jnp.float32) + 0.5) * 31.0, 0, 31
                  ).astype(jnp.int32)
    sv = jnp.clip((v - v0.astype(jnp.float32) + 0.5) * 31.0, 0, 31
                  ).astype(jnp.int32)

    depth_cap = jnp.float32(40.0)
    zq = (jnp.clip(zc / depth_cap, 0.0, 1.0)
          * ((1 << 20) - 1)).astype(jnp.int32)
    packed = (zq << 10) | (su << 5) | sv
    okc = vis & (u0 >= 0) & (u0 < W) & (v0 >= 0) & (v0 < H)
    flat = jnp.where(okc, v0 * W + u0, H * W)
    sentinel = jnp.iinfo(jnp.int32).max
    pbuf = jnp.full((H * W + 1,), sentinel, jnp.int32)
    pbuf = pbuf.at[flat].min(jnp.where(okc, packed, sentinel))
    win = pbuf[:H * W].reshape(H, W)

    # per-particle colors (test_colorRigidFall.py set_phases coloring /
    # DrawPoints' per-phase g_colors, pyflex.cpp): re-scatter each cell
    # winner's RGB555-quantized color into a parallel grid. Gated on the
    # color array's rank so the fused hot path (scalar scene color) pays
    # nothing.
    per_particle = particle_color.ndim == 2
    cwin = None
    if per_particle:
        cq = jnp.clip(particle_color * 31.0 + 0.5, 0, 31).astype(jnp.int32)
        rgb555 = (cq[:, 0] << 10) | (cq[:, 1] << 5) | cq[:, 2]
        match = okc & (pbuf[flat] == packed)
        cb = jnp.zeros((H * W + 1,), jnp.int32)
        cb = cb.at[flat].max(jnp.where(match, rgb555, 0))
        cwin = cb[:H * W].reshape(H, W)

    # dense expansion: each output pixel takes the nearest sphere surface
    # among the neighboring particle centers. ``skin`` expands the visual
    # radius (~the reference's skin offset/expand) so rigid groups read as
    # merged smooth hulls rather than individual grains.
    vis_radius = draw_radius * (1.7 if skin else 1.0)
    r2 = vis_radius * vis_radius
    pdepth = jnp.full((H, W), far)
    pbulge = jnp.zeros((H, W))
    pnx = jnp.zeros((H, W))
    pny = jnp.zeros((H, W))
    pcol = jnp.zeros((H, W), jnp.int32)
    # footprint half-width in pixels. The granular workload's top-down
    # camera projects grains to ~3-5 px (SPLAT=5 is exact); close-up
    # small-scale scenes (the yz_* families) need wider footprints —
    # callers pass ``expand`` from the projected pixel radius.
    half = (int(expand) if expand is not None
            else SPLAT // 2 + (1 if skin else 0))
    for di in range(-half, half + 1):
        for dj in range(-half, half + 1):
            # candidate centers at pixel (i-di, j-dj) contribute to (i, j)
            shifted = jnp.full((H, W), sentinel, jnp.int32)
            src = win[max(0, -di):H - max(0, di),
                      max(0, -dj):W - max(0, dj)]
            shifted = jax.lax.dynamic_update_slice(
                shifted, src, (max(0, di), max(0, dj)))
            hit = shifted != sentinel
            zcn = (shifted >> 10).astype(jnp.float32) / ((1 << 20) - 1) \
                * depth_cap
            sun = ((shifted >> 5) & 31).astype(jnp.float32) / 31.0 - 0.5
            svn = (shifted & 31).astype(jnp.float32) / 31.0 - 0.5
            ox = (di - svn) * zcn / fy   # di indexes rows = v
            oy = (dj - sun) * zcn / fx
            d2 = ox * ox + oy * oy
            inside = hit & (d2 < r2)
            bulge = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
            zpix = jnp.where(inside, zcn - bulge, far)
            closer = zpix < pdepth
            pdepth = jnp.where(closer, zpix, pdepth)
            pbulge = jnp.where(closer, bulge, pbulge)
            pnx = jnp.where(closer, oy, pnx)   # cam x offset (u direction)
            pny = jnp.where(closer, ox, pny)   # cam y offset (v direction)
            if per_particle:
                shc = jnp.zeros((H, W), jnp.int32)
                srcc = cwin[max(0, -di):H - max(0, di),
                            max(0, -dj):W - max(0, dj)]
                shc = jax.lax.dynamic_update_slice(
                    shc, srcc, (max(0, di), max(0, dj)))
                pcol = jnp.where(closer, shc, pcol)

    # diffuse shading from the sphere-surface normal (camera space), the
    # role of the reference's per-fragment lighting (shadersGL.cpp)
    light_cam = cv_from_world[:3, :3] @ LIGHT_DIR
    inv_r = 1.0 / vis_radius
    # surface normal in cam coords = (pnx, pny, -pbulge)/r; diffuse = n.l
    ndotl = (pnx * light_cam[0] + pny * light_cam[1]
             - pbulge * light_cam[2]) * inv_r
    pshade = jnp.where(pdepth < far,
                       0.40 + 0.25 * (pbulge * inv_r)
                       + 0.35 * jnp.clip(ndotl, 0.0, 1.0), 0.0)

    particle_won = pdepth < bg_depth
    depth = jnp.where(particle_won, pdepth, bg_depth)
    if per_particle:
        base = jnp.stack([((pcol >> 10) & 31).astype(jnp.float32),
                          ((pcol >> 5) & 31).astype(jnp.float32),
                          (pcol & 31).astype(jnp.float32)], -1) / 31.0
    else:
        base = jnp.broadcast_to(particle_color[None, None, :], (H, W, 3))
    rgb = jnp.where(particle_won[..., None],
                    base * pshade[..., None],
                    bg_rgb)

    if shadows:
        # light-space ortho shadow map: scatter particle centers, then one
        # gather per image pixel (video/demo path; see docstring)
        ldir = LIGHT_DIR
        e1 = jnp.array([ldir[1], -ldir[0], 0.0])
        e1 = e1 / jnp.linalg.norm(e1)
        e2 = jnp.cross(ldir, e1)
        SM, ext = 512, 8.0   # 3 cm texels over the pile workspace
        pa = (x @ e1 / (2 * ext) + 0.5) * SM
        pb = (x @ e2 / (2 * ext) + 0.5) * SM
        pd = -(x @ ldir)
        ia = jnp.clip(pa.astype(jnp.int32), 0, SM - 1)
        ib = jnp.clip(pb.astype(jnp.int32), 0, SM - 1)
        ok = active
        sflat = jnp.where(ok, ia * SM + ib, SM * SM)
        smap = jnp.full((SM * SM + 1,), 1e9, jnp.float32)
        smap = smap.at[sflat].min(jnp.where(ok, pd, 1e9))
        # image pixels -> world -> light space
        pw = origin[None, None, :] + depth[..., None] * dir_world
        qa = jnp.clip(((pw @ e1 / (2 * ext) + 0.5) * SM).astype(jnp.int32),
                      0, SM - 1)
        qb = jnp.clip(((pw @ e2 / (2 * ext) + 0.5) * SM).astype(jnp.int32),
                      0, SM - 1)
        qd = -(pw @ ldir)
        occ_d = jnp.take(smap[:SM * SM], qa * SM + qb)
        lit = qd <= occ_d + 1.5 * draw_radius
        rgb = rgb * jnp.where(lit[..., None], 1.0, 0.62)

    out = jnp.concatenate([
        jnp.clip(rgb * 255.0, 1.0, 255.0),
        jnp.full((H, W, 1), 255.0),
        depth[..., None],
    ], axis=-1)
    return out
