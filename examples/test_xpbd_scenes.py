"""Drive the XPBD scene families through the pyflex shim, mirroring the
reference's example scripts (PyFleX/bindings/examples/test_FluidShake.py,
test_MassRope.py, test_SoftFall.py, test_RigidFall.py, test_Flag.py
driving patterns — kinematic glass via set_shape_states, Update()-driven
control particles, render frames).

Usage: python examples/test_xpbd_scenes.py [scene ...]
  scenes: dam_break fluid_shake mass_rope flag soft_fall rigid_fall
          cloth_rigid (default: a fast subset)
Writes rendered frames to out_xpbd/.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dyn_res_pile_manip_tpu import pyflex_shim as pyflex  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "out_xpbd")


def _save(name):
    os.makedirs(OUT, exist_ok=True)
    img = pyflex.render().reshape(pyflex._rt.screen_h,
                                  pyflex._rt.screen_w, 5)
    rgb = np.clip(img[..., :3], 0, 255).astype(np.uint8)
    try:
        import imageio
        imageio.imwrite(os.path.join(OUT, name + ".png"), rgb)
    except Exception:
        np.save(os.path.join(OUT, name + ".npy"), rgb)


def _report(name):
    act = np.asarray(pyflex._rt.state.active)
    x = np.asarray(pyflex._rt.state.x)[act]
    v = np.asarray(pyflex._rt.state.v)[act]
    print(f"{name}: n={act.sum()} nan={np.isnan(x).any()} "
          f"y=[{x[:, 1].min():.3f},{x[:, 1].max():.3f}] "
          f"max|v|={np.abs(v).max():.2f}")
    _save(name)


def _cam(pos=(0.6, 1.6, 2.2), angle=(0.0, -0.6, 0.0)):
    pyflex.set_camPos(np.array(pos))
    pyflex.set_camAngle(np.array(angle))


def dam_break(frames=150):
    pyflex.set_scene(2, np.zeros(1))
    _cam((0.8, 1.2, 2.6))
    for _ in range(frames):
        pyflex.step()
    _report("dam_break")


def fluid_shake(frames=200):
    """Fluid in a shaking kinematic glass (test_FluidShake.py pattern)."""
    border, height = 0.025, 0.6
    dis_x, dis_z = 0.5, 0.35
    pyflex.set_scene(6, np.array([0.08, 0.08, 0.08, 6, 10, 5, 0, 0, 0]))
    _cam((0.3, 1.0, 1.8))
    walls = [  # (halfEdge, y-center offset, axis-offset)
        ((border / 2, height / 2, dis_z / 2), (-dis_x / 2, height / 2, 0)),
        ((border / 2, height / 2, dis_z / 2), (dis_x / 2, height / 2, 0)),
        ((dis_x / 2, height / 2, border / 2), (0, height / 2, -dis_z / 2)),
        ((dis_x / 2, height / 2, border / 2), (0, height / 2, dis_z / 2)),
    ]
    quat = np.array([0.0, 0.0, 0.0, 1.0])
    for half, c in walls:
        pyflex.add_box(np.array(half),
                       np.array(c) + np.array([0.2, 0.0, 0.15]), quat)
    x_last = 0.2
    states = np.zeros((4, 14))
    for f in range(frames):
        x_curr = 0.2 + 0.12 * np.sin(f * 0.06)
        for i, (half, c) in enumerate(walls):
            states[i, :3] = np.array(c) + [x_curr, 0.0, 0.15]
            states[i, 3:6] = np.array(c) + [x_last, 0.0, 0.15]
            states[i, 6:10] = quat
            states[i, 10:] = quat
        pyflex.set_shape_states(states)
        x_last = x_curr
        pyflex.step()
    _report("fluid_shake")


def mass_rope(frames=150):
    pyflex.set_scene(9, np.array([0.0, 0.5, 0.0, 1.0, 0.8, 0.0]))
    _cam((0.0, 1.6, 3.0), (0.0, -0.35, 0.0))
    for f in range(frames):
        # swing the pinned end in a circle (test_MassRope.py pattern)
        d = 0.008 * np.array([np.cos(f * 0.05), 0.0, np.sin(f * 0.05)])
        pyflex.step(update_params=d)
    _report("mass_rope")


def flag(frames=150):
    pyflex.set_scene(10, np.array([1.0, 32, 24, 0.9, 0.5, 0.6, 2.0, 0]))
    _cam((0.8, 1.2, 2.4))
    for _ in range(frames):
        pyflex.step(update_params=np.zeros(6))
    _report("flag")


def soft_fall(frames=120):
    pyflex.set_scene(16, np.array([0, 12.0, 0.0, 0.8, 0.0, 0.0]))
    _cam((0.6, 1.2, 2.4))
    for _ in range(frames):
        pyflex.step()
    _report("soft_fall")


def rigid_fall(frames=120):
    pyflex.set_scene(3, np.array([3.0, -9.8,
                                  0.1, 0.3, 0.1,
                                  0.35, 0.6, 0.12,
                                  0.2, 0.9, 0.2, 0.0]))
    _cam((0.3, 0.9, 1.6))
    for _ in range(frames):
        pyflex.step()
    _report("rigid_fall")


def cloth_rigid(frames=120):
    pyflex.set_scene(12, np.array([16, 16, 1.0, 0.0, 0.0, 0.0,
                                   3, 3, 3, 2, 1, 1, 0, 1]))
    _cam((1.2, 1.8, 3.2), (0.0, -0.5, 0.0))
    for _ in range(frames):
        pyflex.step(update_params=np.zeros(3))
    _report("cloth_rigid")


SCENES = dict(dam_break=dam_break, fluid_shake=fluid_shake,
              mass_rope=mass_rope, flag=flag, soft_fall=soft_fall,
              rigid_fall=rigid_fall, cloth_rigid=cloth_rigid)

if __name__ == "__main__":
    pyflex.init(True)
    names = sys.argv[1:] or ["fluid_shake", "mass_rope", "soft_fall",
                             "rigid_fall"]
    for name in names:
        SCENES[name]()
