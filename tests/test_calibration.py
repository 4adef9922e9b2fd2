"""PlannerGD._calibrate: the online iter-time measurement that converts
`time_lim` budgets into jit-static iteration counts (reference keeps a
wall-clock loop instead, planners.py:549-561; ours must predict because
the optimize loop is one compiled scan).

Locked-in lessons:
- min-of-3 per dispatch size (BENCH_r03's 6.4 ms/iter was a single-sample
  tunnel fluke, a 4x error);
- every timed dispatch must carry a DISTINCT input perturbation:
  byte-identical repeat dispatches through the axon tunnel can return
  ~instantly (result caching), which collapses/inflates the slope — the
  likely source of the r4 77k-vs-114k bench spread on identical code.
"""
import pytest

from dyn_res_pile_manip_tpu.planner.planner import PlannerGD

pytestmark = pytest.mark.quick


class _FakeClock:
    def __init__(self):
        self.t = 0.0

    def advance(self, dt):
        self.t += dt


def _make_planner():
    # _calibrate touches only self._iter_ms; bypass __init__
    p = PlannerGD.__new__(PlannerGD)
    p._iter_ms = {}
    return p


def test_slope_and_distinct_perturbations(monkeypatch):
    clock = _FakeClock()
    import dyn_res_pile_manip_tpu.planner.planner as mod
    monkeypatch.setattr(mod.time, "perf_counter", lambda: clock.t)

    calls = []

    class _Ready:
        pass

    def run_fn(n, eps):
        calls.append((n, eps))
        clock.advance(0.010 + 0.020 * n)     # 10 ms overhead + 20 ms/iter
        return _Ready()

    monkeypatch.setattr(mod.jax, "block_until_ready", lambda x: x)
    p = _make_planner()
    ms = p._calibrate(run_fn, key=(100, 2, 1, 1, False))
    # slope cancels the 10 ms per-dispatch overhead exactly
    assert ms == pytest.approx(20.0, rel=1e-6)

    # compile dispatches use eps=0; every TIMED dispatch is perturbed,
    # and no two timed dispatches of the same size share a perturbation
    timed = [(n, e) for (n, e) in calls if e != 0.0]
    assert len(timed) == 6
    for n in (5, 15):
        epss = [e for (nn, e) in timed if nn == n]
        assert len(epss) == len(set(epss)) == 3

    # second call for the same key hits the cache, no new dispatches
    n_calls = len(calls)
    assert p._calibrate(run_fn, key=(100, 2, 1, 1, False)) == ms
    assert len(calls) == n_calls


def test_min_strips_one_sided_spikes(monkeypatch):
    clock = _FakeClock()
    import dyn_res_pile_manip_tpu.planner.planner as mod
    monkeypatch.setattr(mod.time, "perf_counter", lambda: clock.t)
    monkeypatch.setattr(mod.jax, "block_until_ready", lambda x: x)

    seen = {5: 0, 15: 0}

    def run_fn(n, eps):
        dt = 0.020 * n
        if eps != 0.0:
            seen[n] += 1
            if seen[n] == 2:        # one tunnel latency spike per size
                dt += 0.500
        clock.advance(dt)
        return None

    p = _make_planner()
    ms = p._calibrate(run_fn, key=(60, 2, 1, 1, False))
    assert ms == pytest.approx(20.0, rel=1e-6)


def test_nearby_particle_counts_reuse_measurement():
    p = _make_planner()
    p._iter_ms[(100, 2, 1, 1, False)] = 25.0

    def boom(n, eps):
        raise AssertionError("should not re-measure for nearby N")

    assert p._calibrate(boom, key=(90, 2, 1, 1, False)) == 25.0
    # different batch geometry must NOT reuse
    with pytest.raises(AssertionError):
        p._calibrate(boom, key=(90, 4, 1, 1, False))
