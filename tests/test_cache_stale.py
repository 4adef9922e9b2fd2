"""Regression lock for the round-4 staleness revert (PERFORMANCE.md
"Round-4: the r3 push regression"): `pbd.cache_stale` must measure
ABSOLUTE displacement. The round-3 translation-aware variant (relative
to the active set's mean shift) returned False under uniform
translation, deferring rebuilds — and with them active-set re-tiering —
which cost 45% on the 19.3k push and 70% on the settle tail
(logs/bisect_push_r4.json)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dyn_res_pile_manip_tpu.env import scene as scene_lib
from dyn_res_pile_manip_tpu.sim import pbd

pytestmark = pytest.mark.quick

GS = 24.0
TINY_CARROTS = np.array([
    0.36, 0.36, -1.2, 0.5, -1.2, 1.0, 0.9, 1.0,
    4, 10.0, 20.0, 2, 4, 2, 0.72, 0.0, -1, -1, -1, 0.0])


@pytest.fixture(scope="module")
def built():
    state, sp, _ = scene_lib.set_scene(
        22, TINY_CARROTS, seed=0, capacity_multiple=256, group_multiple=32)
    col = scene_lib.make_colliders_with_walls(GS)
    st, cache = pbd.build_cache(state, sp, colliders=col)
    return st, sp, cache


def test_fresh_cache_not_stale(built):
    st, sp, cache = built
    assert not bool(pbd.cache_stale(st, sp, cache))


def test_small_motion_not_stale(built):
    st, sp, cache = built
    eps = 0.2 * sp.particle_collision_margin
    moved = st.replace(x=st.x + jnp.array([eps, 0.0, 0.0]))
    assert not bool(pbd.cache_stale(moved, sp, cache))


def test_uniform_translation_tiered_is_stale(built):
    # the r4 regression lock: on a TIERED build a free-fall-style uniform
    # shift MUST trigger a rebuild (re-tiering rides on rebuilds;
    # logs/bisect_push_r4.json). The tiny scene builds at the full tier,
    # so the tiered path is exercised by overriding the flag.
    st, sp, cache = built
    cache = dict(cache)
    cache["full_tier"] = jnp.bool_(False)
    shift = 1.1 * 0.5 * sp.particle_collision_margin
    moved = st.replace(x=st.x + jnp.array([0.0, -shift, 0.0]))
    assert bool(pbd.cache_stale(moved, sp, cache))


def test_full_tier_translation_rule_is_opt_in(built):
    # round-5d bench A/B: the full-tier translation rule cost 36% on the
    # 19.3k push (full-tier push spikes LINGER at the full prefix when
    # rebuilds are deferred) for ~1% on its 4k target row — so the
    # DEFAULT build must mark every cache as NOT full_tier (absolute
    # staleness everywhere); DYNRES_FULLTIER_TRANSLATION=1 re-enables.
    st, sp, cache = built
    assert not bool(cache["full_tier"])
    shift = 1.1 * 0.5 * sp.particle_collision_margin
    moved = st.replace(x=st.x + jnp.array([0.0, -shift, 0.0]))
    assert bool(pbd.cache_stale(moved, sp, cache))


def test_uniform_translation_full_tier_reuses_cache(built):
    # behavior of the opt-in rule itself (flag forced on): at the FULL
    # prefix tier, window pair-coverage is translation-invariant, so
    # coherent free fall reuses one cache...
    st, sp, cache = built
    cache = dict(cache)
    cache["full_tier"] = jnp.bool_(True)
    shift = 3.0 * sp.particle_collision_margin
    moved = st.replace(x=st.x + jnp.array([0.0, -shift, 0.0]))
    assert not bool(pbd.cache_stale(moved, sp, cache))
    # ...but any RELATIVE motion past the margin still rebuilds
    x = moved.x.at[0, 0].add(2.0 * sp.particle_collision_margin)
    assert bool(pbd.cache_stale(moved.replace(x=x), sp, cache))


def test_env_opt_in_restores_full_tier_flag(monkeypatch):
    monkeypatch.setenv("DYNRES_FULLTIER_TRANSLATION", "1")
    state, sp, _ = scene_lib.set_scene(
        22, TINY_CARROTS, seed=0, capacity_multiple=256, group_multiple=32)
    col = scene_lib.make_colliders_with_walls(GS)
    _, cache = pbd.build_cache(state, sp, colliders=col)
    assert bool(cache["full_tier"])   # tiny scene builds at the full tier


def test_single_particle_motion_is_stale(built):
    st, sp, cache = built
    shift = 2.0 * sp.particle_collision_margin
    x = st.x.at[0, 0].add(shift)
    assert bool(pbd.cache_stale(st.replace(x=x), sp, cache))
