"""FlexRobotHelper: analytic Panda FK/IK chain + link mirroring
(reference env/flex_env.py:78-158, PyBullet-free)."""
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.env.robot import (FlexRobotHelper, PandaChain,
                                              _Q_HOME)

pytestmark = pytest.mark.quick


def test_fk_home_pose():
    ee = PandaChain().ee(_Q_HOME)
    # classic Panda ready pose: ~0.47 m forward, ~0.52 m up
    assert 0.4 < ee[0] < 0.55
    assert 0.45 < ee[2] < 0.6
    assert abs(ee[1]) < 0.02


def test_ik_converges():
    c = PandaChain()
    rng = np.random.default_rng(0)
    for _ in range(5):
        tgt = np.array([rng.uniform(0.3, 0.6), rng.uniform(-0.3, 0.3),
                        rng.uniform(0.2, 0.6)])
        q = c.ik(tgt)
        assert np.linalg.norm(c.ee(q) - tgt) < 5e-3


def test_shape_states_and_capsules():
    h = FlexRobotHelper()
    gs = 24.0
    h.loadURDF("franka_panda/panda.urdf", [-4.5 * gs / 8.0, 0, 0],
               [0, 0, 0, 1], globalScaling=gs)
    h.set_ee(np.array([0.0, gs / 8.0, 0.0]), yaw=0.2)
    st = h.getRobotShapeStates()
    assert st.shape == (10, 14)
    # flange row reaches the requested EE point (scaled world coords)
    flange = st[-2, :3]
    assert np.linalg.norm(flange - [0.0, gs / 8.0, 0.0]) < 0.3
    # prev-pose columns lag by one call
    h.set_ee(np.array([1.0, gs / 8.0, 0.5]), yaw=0.2)
    st2 = h.getRobotShapeStates()
    np.testing.assert_allclose(st2[:, 3:6], st[:, :3], atol=1e-9)
    caps = h.link_capsules()
    assert len(caps) >= 5
    for p0, p1, r in caps:
        assert r > 0 and np.isfinite(p0).all() and np.isfinite(p1).all()


def test_reset_joint_state():
    h = FlexRobotHelper()
    h.loadURDF("franka_panda/panda.urdf", [0, 0, 0], [0, 0, 0, 1])
    st0 = h.getRobotShapeStates()
    st1 = h.resetJointState(3, -1.5)
    assert not np.allclose(st0[:, :3], st1[:, :3])
