"""Pin the numpy special functions against external reference values
(computed with mpmath at 30 decimal digits — see the generation snippet in
each table's comment). These anchor the whole exact-p-value tier."""

from __future__ import annotations

import numpy as np

from vectordb_bioinsight_spark.functions.special import betainc_reg, t_pvalue_two_sided, t_sf

# (t, df, sf) where sf = betainc(df/2, 1/2, 0, df/(df+t^2), regularized)/2
# computed with mpmath.mp.dps=30 (independent of the engine's Lentz CF code).
T_SF_REFERENCE = [
    (0.0, 5.0, 0.5),
    (1.0, 1.0, 0.25),  # Cauchy: 1/2 - arctan(1)/pi, exact
    (2.0, 10.0, 0.03669401738537018),
    (2.5, 3.0, 0.04385332350403277),
    (-1.5, 8.0, 0.9139983540240444),
    (4.0, 30.0, 0.00019092281804187843),
    (10.0, 2.0, 0.004926228511662845),  # closed form 0.5*(1 - 10/sqrt(102))
    (0.5, 100.0, 0.3090867829154433),
]

# (a, b, x, mpmath.betainc(a, b, 0, x, regularized=True)) at dps=30
BETAINC_REFERENCE = [
    (0.5, 0.5, 0.5, 0.5),
    (2.0, 3.0, 0.4, 0.5248),  # exact: 1 - 0.6^4 - 4*0.4*0.6^3
    (5.0, 1.0, 0.9, 0.5904900000000001),  # exact: 0.9^5
    (0.5, 5.0, 0.1, 0.6833570849799877),
    (10.0, 10.0, 0.3, 0.03255335688130095),
]


def test_t_sf_reference_values():
    for t, df, want in T_SF_REFERENCE:
        got = float(t_sf(t, df))
        assert np.isclose(got, want, rtol=1e-10, atol=1e-14), (t, df, got, want)


def test_betainc_reference_values():
    for a, b, x, want in BETAINC_REFERENCE:
        got = float(betainc_reg(a, b, x))
        assert np.isclose(got, want, rtol=1e-10, atol=1e-14), (a, b, x, got, want)


def test_two_sided_p_properties():
    t = np.array([0.0, 1.0, -1.0, 5.0, np.nan])
    df = np.array([10.0, 10.0, 10.0, 10.0, 10.0])
    p = t_pvalue_two_sided(t, df)
    assert np.isclose(p[0], 1.0)
    assert np.isclose(p[1], p[2])  # symmetric in |t|
    assert p[3] < 0.001
    assert p[4] == 1.0  # NaN -> 1.0 discipline
    assert ((p >= 0) & (p <= 1)).all()


def test_normal_sf_reference_values():
    import math

    from vectordb_bioinsight_spark.functions.special import normal_sf

    # exact via erfc identity; anchor points from the standard normal table
    for z, want in [(0.0, 0.5), (1.959963984540054, 0.025), (-1.0, 0.8413447460685429)]:
        assert np.isclose(float(normal_sf(z)), want, rtol=1e-12), (z, want)


def test_hypergeom_sf_matches_exact_comb():
    """Exact oracle: integer arithmetic with math.comb (no precision loss)."""
    from math import comb

    from vectordb_bioinsight_spark.functions.special import hypergeom_sf

    def exact_sf(k, N, K, n):
        hi = min(K, n)
        if k >= hi:
            return 0.0
        return sum(comb(K, j) * comb(N - K, n - j) for j in range(k + 1, hi + 1)) / comb(N, n)

    cases = [(3, 50, 10, 12), (0, 100, 5, 10), (9, 20, 10, 10), (10, 20, 10, 10),
             (5, 1000, 40, 100), (-1, 30, 7, 9), (2, 10, 3, 4)]
    for k, N, K, n in cases:
        got = float(hypergeom_sf(k, N, K, n))
        want = exact_sf(k, N, K, n)
        assert np.isclose(got, want, rtol=1e-10, atol=1e-15), (k, N, K, n, got, want)
