"""Granular manipulation smoke: scripted kinematic box pusher sweeping a
granular pile via set_shape_states (the role of the reference's
PyFleX/bindings/examples/test_GranularManip.py, ported with an import
swap)."""
import numpy as np

import dyn_res_pile_manip_tpu.pyflex_shim as pyflex


def quat_from_axis_angle(axis, angle):
    axis = axis / np.linalg.norm(axis)
    half = angle * 0.5
    return np.array([*(axis * np.sin(half)), np.cos(half)])


def main(rounds=2, time_step=60, seed=0):
    rng = np.random.default_rng(seed)
    pyflex.set_screenWidth(360)
    pyflex.set_screenHeight(360)
    pyflex.init()

    scale = 1.5
    scene_params = np.array([scale, -scale / 2, 0.0, -scale / 2, 1.0, 1.0])
    pyflex.set_scene(18, scene_params, 0)
    print("Num particles:", pyflex.get_n_particles())

    pos0 = pyflex.get_positions().reshape(-1, 4)[:, :3]
    box_added = False
    for _ in range(rounds):
        pusher_angle = np.deg2rad(rng.uniform(0.0, 360.0))
        pusher_dis = 1.8
        half_edge = np.array([0.05, 1.0, 0.4])
        quat = quat_from_axis_angle(np.array([0.0, 1.0, 0.0]),
                                    -pusher_angle)

        def center_at(d):
            return np.array([d * np.cos(pusher_angle), half_edge[1],
                             d * np.sin(pusher_angle)])

        if not box_added:
            pyflex.add_box(half_edge, center_at(pusher_dis), quat)
            box_added = True

        for _ in range(time_step):
            states = np.zeros((1, 14))
            states[0, 3:6] = center_at(pusher_dis)
            pusher_dis -= 0.015
            states[0, :3] = center_at(pusher_dis)
            states[0, 6:10] = quat
            states[0, 10:] = quat
            pyflex.set_shape_states(states)
            pyflex.step()

    pos1 = pyflex.get_positions().reshape(-1, 4)[:, :3]
    assert not np.isnan(pos1).any()
    moved = np.linalg.norm(pos1 - pos0, axis=1).max()
    print("max displacement after pushes:", float(moved))
    assert moved > 0.05, "pusher did not move the pile"
    img = pyflex.render().reshape(360, 360, 5)
    assert img[..., -1].max() > 0.0
    pyflex.clean()
    print("ok")


if __name__ == "__main__":
    main()
