"""Special functions in pure numpy (this environment has no scipy).

Regularized incomplete beta via the Lentz continued-fraction method
(classical algorithm, e.g. Numerical Recipes §6.4 / DLMF 8.17), vectorized
with numpy; accurate to ~1e-12 for the (a, b) ranges statistics needs.
Used by the pandas-UDF tier for exact Student-t p-values.
"""

from __future__ import annotations

import numpy as np

_MAX_ITER = 300
_EPS = 3e-14
_FPMIN = 1e-300


def _betacf(a: np.ndarray, b: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    return h


def betainc_reg(a, b, x):
    """Regularized incomplete beta I_x(a, b), vectorized."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    x = np.asarray(x, dtype=float)
    a, b, x = np.broadcast_arrays(a, b, x)
    out = np.empty_like(x)
    ln_beta = (
        np.vectorize(_lgamma)(a) + np.vectorize(_lgamma)(b) - np.vectorize(_lgamma)(a + b)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        ln_bt = a * np.log(np.clip(x, 1e-320, None)) + b * np.log(
            np.clip(1.0 - x, 1e-320, None)
        ) - ln_beta
    bt = np.where((x <= 0.0) | (x >= 1.0), 0.0, np.exp(ln_bt))
    use_direct = x < (a + 1.0) / (a + b + 2.0)
    # direct branch
    xd = np.where(use_direct, x, 0.5)
    direct = bt * _betacf(a, b, xd) / a
    # symmetric branch
    xs = np.where(use_direct, 0.5, 1.0 - x)
    symm = 1.0 - bt * _betacf(b, a, xs) / b
    out = np.where(use_direct, direct, symm)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x >= 1.0, 1.0, out)
    return np.clip(out, 0.0, 1.0)


def _lgamma(v: float) -> float:
    import math

    return math.lgamma(v)


def t_sf(t, df):
    """Student-t survival function P(T > t), vectorized (scipy.stats.t.sf
    parity to ~1e-12)."""
    t = np.asarray(t, dtype=float)
    df = np.asarray(df, dtype=float)
    x = df / (df + t * t)
    tail = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return np.where(t >= 0, tail, 1.0 - tail)


def t_pvalue_two_sided(t, df):
    """2 * sf(|t|) with the reference's NaN -> 1.0 discipline
    (agent1_deg.py:390-414)."""
    t = np.asarray(t, dtype=float)
    df = np.asarray(df, dtype=float)
    p = 2.0 * t_sf(np.abs(t), df)
    return np.nan_to_num(np.clip(p, 0.0, 1.0), nan=1.0)


def normal_sf(z):
    """Standard-normal survival function P(Z > z) via erfc, vectorized
    (scipy.stats.norm.sf parity to machine precision)."""
    import math

    z = np.asarray(z, dtype=float)
    return 0.5 * np.vectorize(math.erfc)(z / math.sqrt(2.0))


def _log_comb(n, k):
    """log C(n, k) via lgamma, vectorized; -inf outside 0 <= k <= n."""
    n = np.asarray(n, dtype=float)
    k = np.asarray(k, dtype=float)
    lg = np.vectorize(_lgamma)
    with np.errstate(invalid="ignore"):
        out = lg(n + 1.0) - lg(k + 1.0) - lg(n - k + 1.0)
    return np.where((k < 0) | (k > n), -np.inf, out)


def hypergeom_sf(k, N, K, n):
    """P(X > k) for X ~ Hypergeometric(N population, K successes, n draws) —
    the enrichment tail probability (Fisher one-sided; SURVEY M7,
    agent3_pathway.py:148-202 semantics). Vectorized; exact to ~1e-12 via
    lgamma log-pmf summation over the (bounded) upper tail."""
    k = np.asarray(k, dtype=float)
    N = np.asarray(N, dtype=float)
    K = np.asarray(K, dtype=float)
    n = np.asarray(n, dtype=float)
    k, N, K, n = np.broadcast_arrays(k, N, K, n)
    out = np.zeros_like(k)
    denom = _log_comb(N, n)
    for i in np.ndindex(k.shape):
        lo = int(max(k[i] + 1, 0))
        hi = int(min(K[i], n[i]))
        if lo > hi:
            out[i] = 0.0
            continue
        js = np.arange(lo, hi + 1, dtype=float)
        logp = _log_comb(K[i], js) + _log_comb(N[i] - K[i], n[i] - js) - denom[i]
        m = logp.max()
        out[i] = float(np.exp(m) * np.exp(logp - m).sum())
    return np.clip(out, 0.0, 1.0)


def f_sf(f, d1, d2):
    """F-distribution survival function P(F_{d1,d2} > f), via the
    regularized incomplete beta: sf = I_{d2/(d2 + d1 f)}(d2/2, d1/2).
    scipy.stats.f.sf parity to ~1e-12."""
    f = np.asarray(f, dtype=float)
    d1 = np.asarray(d1, dtype=float)
    d2 = np.asarray(d2, dtype=float)
    x = d2 / (d2 + d1 * np.clip(f, 0.0, None))
    out = betainc_reg(d2 / 2.0, d1 / 2.0, x)
    return np.where(f <= 0, 1.0, np.clip(out, 0.0, 1.0))
