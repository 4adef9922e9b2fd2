"""Minimal Bayesian-optimization loop over an integer domain.

Stands in for skopt.gp_minimize as used by the reference labeler
(data_gen/res_rgr_data.py:421-432): a sklearn GaussianProcessRegressor
(Matern + WhiteKernel, the same base estimator the reference constructs)
with Expected-Improvement acquisition evaluated exhaustively on the small
integer domain, warm-started from x0, plus ``expected_minimum`` = argmin of
the GP posterior mean.
"""
from __future__ import annotations

import dataclasses

import numpy as np
from scipy.stats import norm


@dataclasses.dataclass
class GpResult:
    x: list
    fun: float
    x_iters: list
    func_vals: np.ndarray
    model: object


def gp_minimize_int(func, lo: int, hi: int, base_estimator, n_calls: int = 10,
                    x0=None, random_state: int = 42) -> GpResult:
    """Minimize func([x]) for integer x in [lo, hi]."""
    rng = np.random.default_rng(random_state)
    xs, ys = [], []
    x0 = x0 or []
    for x in x0:
        x = int(x[0]) if isinstance(x, (list, tuple)) else int(x)
        xs.append(x)
        ys.append(float(func([x])))

    domain = np.arange(lo, hi + 1, dtype=float)[:, None]
    model = base_estimator
    for _ in range(max(0, n_calls - len(x0))):
        if len(xs) >= 2 and np.std(ys) > 0:
            model.fit(np.array(xs, dtype=float)[:, None], np.array(ys))
            mu, sigma = model.predict(domain, return_std=True)
            best = np.min(ys)
            sigma = np.maximum(sigma, 1e-12)
            imp = best - mu
            z = imp / sigma
            ei = imp * norm.cdf(z) + sigma * norm.pdf(z)
            ei[np.isin(domain[:, 0], xs)] = -np.inf
            x_next = int(domain[np.argmax(ei), 0])
        else:
            x_next = int(rng.integers(lo, hi + 1))
        xs.append(x_next)
        ys.append(float(func([x_next])))

    ys_arr = np.array(ys)
    if len(xs) >= 2 and np.std(ys) > 0:
        model.fit(np.array(xs, dtype=float)[:, None], ys_arr)
    i_best = int(np.argmin(ys_arr))
    return GpResult(x=[xs[i_best]], fun=float(ys_arr[i_best]),
                    x_iters=[[x] for x in xs], func_vals=ys_arr, model=model)


def expected_minimum(res: GpResult, lo: int = None, hi: int = None):
    """argmin of the GP posterior mean over the domain
    (skopt.expected_minimum equivalent)."""
    xs = np.array([x[0] for x in res.x_iters], dtype=float)
    lo = int(xs.min()) if lo is None else lo
    hi = int(xs.max()) if hi is None else hi
    domain = np.arange(lo, hi + 1, dtype=float)[:, None]
    try:
        mu = res.model.predict(domain)
        i = int(np.argmin(mu))
        return [float(domain[i, 0])], float(mu[i])
    except Exception:
        return [float(res.x[0])], float(res.fun)
