"""Regularized incomplete gamma functions (f64) for the Poisson CDF.

The reference evaluates ``Poisson(median).cdf(cov)`` via statrs's
``gamma_ur(x+1, lambda)`` (statrs 0.16 Poisson::cdf) to cap coverage
outliers (sylph src/contain.rs:663-675). We implement the standard
series/continued-fraction pair (Cephes-style) in double precision; agreement
with statrs is ~1e-14 relative, far inside the decision margin of the
CUTOFF_PVALUE comparison except for adversarially exact boundaries.
"""

import math

_EPS = 1.0e-15
_BIG = 4.503599627370496e15
_BIGINV = 2.22044604925031308085e-16


def igam(a: float, x: float) -> float:
    """Lower regularized incomplete gamma P(a, x)."""
    if x <= 0.0 or a <= 0.0:
        return 0.0
    if x > 1.0 and x > a:
        return 1.0 - igamc(a, x)
    ax = a * math.log(x) - x - math.lgamma(a)
    if ax < -709.78:
        return 0.0
    ax = math.exp(ax)
    r = a
    c = 1.0
    ans = 1.0
    while True:
        r += 1.0
        c *= x / r
        ans += c
        if c / ans <= _EPS:
            break
    return ans * ax / a


def igamc(a: float, x: float) -> float:
    """Upper regularized incomplete gamma Q(a, x)."""
    if x <= 0.0 or a <= 0.0:
        return 1.0
    if x < 1.0 or x < a:
        return 1.0 - igam(a, x)
    ax = a * math.log(x) - x - math.lgamma(a)
    if ax < -709.78:
        return 0.0
    ax = math.exp(ax)
    # continued fraction (modified Lentz)
    y = 1.0 - a
    z = x + y + 1.0
    c = 0.0
    pkm2 = 1.0
    qkm2 = x
    pkm1 = x + 1.0
    qkm1 = z * x
    ans = pkm1 / qkm1
    while True:
        c += 1.0
        y += 1.0
        z += 2.0
        yc = y * c
        pk = pkm1 * z - pkm2 * yc
        qk = qkm1 * z - qkm2 * yc
        if qk != 0.0:
            r = pk / qk
            t = abs((ans - r) / r)
            ans = r
        else:
            t = 1.0
        pkm2, pkm1 = pkm1, pk
        qkm2, qkm1 = qkm1, qk
        if abs(pk) > _BIG:
            pkm2 *= _BIGINV
            pkm1 *= _BIGINV
            qkm2 *= _BIGINV
            qkm1 *= _BIGINV
        if t <= _EPS:
            break
    return ans * ax


def poisson_cdf(k: float, lam: float) -> float:
    """P(X <= k) for X ~ Poisson(lam), k integer-valued (statrs semantics:
    ``gamma_ur(k+1, lam)``)."""
    return igamc(math.floor(k) + 1.0, lam)
