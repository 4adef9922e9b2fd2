"""All init_pos presets build; the pyflex shim round-trips a scene."""
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.env import presets, scene

pytestmark = pytest.mark.quick

ALL_PRESETS = [
    "spread", "wkspc_spread", "wkspc_spread_double", "wkspc_spread_triple",
    "wkspc_spread_4", "extra_large_wkspc_spread", "extra_small_wkspc_spread",
    "extra_small_half_spread", "rand_blob", "rand_spread",
    "rand_sparse_spread", "rb_corner", "center", "center_init_2",
    "rt_corner", "wkspc_spread_multi_granularity", "singular", "blank",
]


@pytest.mark.parametrize("name", ALL_PRESETS)
def test_preset_params_build(name):
    rng = np.random.default_rng(0)
    params = presets.carrots_scene_params(name, 24.0, rng)
    assert params.shape == (20,)
    assert params[8] >= 1  # num_carrots
    # geometry builds (host only, no sim)
    build = scene.build_carrots(params, seed=1)
    assert build.positions.shape[0] > 0
    assert build.num_groups >= 1
    assert np.isfinite(build.positions).all()


def test_unknown_preset_raises():
    with pytest.raises(NotImplementedError):
        presets.carrots_preset("nope", 24.0, np.random.default_rng(0))


def test_scene_registry_indices():
    # the granular family at its reference indices, plus the full
    # registered registry 0-23 (scenes_extra; pyflex.cpp:2458-2502)
    for idx in (18, 20, 21, 22, 23):
        assert idx in scene.SCENE_REGISTRY
    import dyn_res_pile_manip_tpu.env.scenes_extra  # noqa: F401
    assert sorted(scene.SCENE_REGISTRY) == list(range(24))


def test_pyflex_shim_roundtrip():
    import dyn_res_pile_manip_tpu.pyflex_shim as pyflex

    pyflex.set_screenWidth(180)
    pyflex.set_screenHeight(180)
    pyflex.init(True)
    pyflex.set_scene(18, np.array([0.4, -0.2, 0.0, -0.2, 1.0, 0.7, 0.075]))
    n = pyflex.get_n_particles()
    assert n > 20
    for _ in range(3):
        pyflex.step()
    pos = pyflex.get_positions().reshape(-1, 4)
    assert pos.shape[0] == n
    pyflex.set_positions(pos.reshape(-1))
    img = pyflex.render(render_depth=True).reshape(180, 180, 5)
    assert img[..., -1].max() <= 0.8 * 24.0
    proj = pyflex.get_projMatrix().reshape(4, 4).T
    assert np.isclose(proj[0, 0], 1.0 / np.tan(np.deg2rad(22.5)))
    view = pyflex.get_viewMatrix().reshape(4, 4).T
    assert view.shape == (4, 4)
    b = pyflex.add_box(np.array([0.1, 1.0, 5.0]),
                       np.array([5.0, 1.0, 0.0]),
                       np.array([0, 0, 0, 1]), 0, np.ones(3))
    assert b >= 0  # shape-state row index (reference add_box returns void)
    pyflex.clean()


def test_set_phases_and_box_growth():
    """set_phases colors roundtrip (test_colorRigidFall.py protocol) and
    add_box beyond the preallocated collider capacity auto-grows."""
    from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

    pyflex.set_screenWidth(96)
    pyflex.set_screenHeight(96)
    pyflex.init(True)
    pyflex.set_scene(3, np.array([2, -9.8, 0.0, 0.1, 0.0,
                                  0.05, 0.35, 0.05, 0.0]))
    n = pyflex.get_n_particles()
    ph = [i % 2 for i in range(n)]
    pyflex.set_phases(ph)
    assert (np.asarray(pyflex.get_phases()) == np.asarray(ph)).all()

    # 9 user boxes exceeds the preallocated 8-slot capacity
    quat = np.array([0.0, 0.0, 0.0, 1.0])
    for k in range(9):
        pyflex.add_box(np.array([0.05, 0.05, 0.05]),
                       np.array([2.0 + 0.2 * k, 0.05, 0.0]), quat,
                       color=[0.5, 0.2, 0.8])
    col = pyflex._rt.colliders
    assert col.box_center.shape[0] >= 10
    assert bool(col.box_active[9])          # the 9th user box landed
    states = pyflex.get_shape_states()
    assert states.shape == (9, 14)
    pyflex.step()
    pyflex.clean()


def test_shape_state_quat_roundtrip():
    """Full-quaternion shape states survive set_shape_states ->
    get_shape_states (box_quat path, core/types.py): the reference's
    tilting-container scripts read back the pose they set
    (PyFleX/bindings/pyflex.cpp get_shape_states)."""
    from dyn_res_pile_manip_tpu import pyflex_shim as pyflex

    pyflex.init(True)
    pyflex.set_scene(3, np.array([1, -9.8, 0.0, 0.1, 0.0,
                                  0.05, 0.35, 0.05, 0.0]))
    q0 = np.array([0.0, 0.0, 0.0, 1.0])
    pyflex.add_box(np.array([0.2, 0.05, 0.2]), np.array([2.0, 0.5, 0.0]), q0)
    a = np.deg2rad(65.0)
    q = np.array([np.sin(a / 2) * 0.6, np.sin(a / 2) * 0.8, 0.0,
                  np.cos(a / 2)])                     # xyzw, mixed axis
    st = np.zeros((1, 14))
    st[0, :3] = st[0, 3:6] = [2.0, 0.6, 0.1]
    st[0, 6:10] = st[0, 10:] = q
    pyflex.set_shape_states(st)
    back = pyflex.get_shape_states()
    assert back.shape == (1, 14)
    assert np.allclose(back[0, :3], [2.0, 0.6, 0.1], atol=1e-6)
    d = min(np.abs(back[0, 6:10] - q).max(),
            np.abs(back[0, 6:10] + q).max())          # sign ambiguity
    assert d < 1e-5
    pyflex.clean()
