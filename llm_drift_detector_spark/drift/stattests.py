"""Pure-numpy statistical distributions (the sandbox has no scipy).

The reference calls ``scipy.stats`` (``detectors/distribution.py:202-259``);
we re-derive the two tail functions it needs:

- :func:`kolmogorov_sf` — the asymptotic two-sided KS survival function
  Q(lambda) = 2 * sum_{k>=1} (-1)^{k-1} exp(-2 k^2 lambda^2)
  (scipy's ks_2samp(mode='asymp') distribution; scipy's exact mode for
  tiny n differs — documented delta, see tests/test_comparators.py).
- :func:`student_t_sf` — Student-t survival function via the regularized
  incomplete beta function (continued-fraction evaluation, the classic
  Lentz/Thompson-Barnett scheme), supporting fractional Welch df.

These run driver-side on *collected aggregate scalars only* — never per
row — so the Spark plans stay fully native.
"""

from __future__ import annotations

import math


def kolmogorov_sf(lam: float) -> float:
    """Two-sided asymptotic KS survival function Q(lambda).

    Two regimes: the alternating series 2*sum (-1)^{k-1} exp(-2k^2 l^2)
    converges fast for large lambda but needs thousands of oscillating
    terms below ~1 (a hypothesis property test caught the resulting
    non-monotonicity); for small lambda the Jacobi-theta dual form
    Q = 1 - (sqrt(2*pi)/l) * sum exp(-(2k-1)^2 pi^2 / (8 l^2))
    converges in a handful of terms.
    """
    if lam <= 1e-3:  # Q(0.001) = 1 - O(e^-600000); also avoids lam^2 underflow
        return 1.0
    if lam > 8.0:
        return 0.0
    if lam < 1.18:  # dual (theta) form
        cdf = 0.0
        for k in range(1, 21):
            cdf += math.exp(-((2 * k - 1) ** 2) * math.pi**2 / (8.0 * lam * lam))
        cdf *= math.sqrt(2.0 * math.pi) / lam
        return min(1.0, max(0.0, 1.0 - cdf))
    total = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        total += term
        if abs(term) < 1e-16:
            break
    return min(1.0, max(0.0, total))


def ks_2samp_p(d: float, n: int, m: int) -> float:
    """Asymptotic two-sample KS p-value for statistic d with sizes n, m."""
    if n <= 0 or m <= 0:
        return 1.0
    en = math.sqrt(n * m / (n + m))
    return kolmogorov_sf(en * d)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def student_t_sf(t: float, df: float) -> float:
    """P(T > t) for Student-t with (possibly fractional) df."""
    if df <= 0:
        return float("nan")
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def welch_t(m1: float, v1: float, n1: int, m2: float, v2: float, n2: int) -> tuple[float, float, float]:
    """Welch t statistic, df, two-sided p from per-side mean/var(ddof=1)/n.

    Mirrors ``scipy.stats.ttest_ind(equal_var=False)`` semantics
    (reference ``distribution.py:248-259``).
    """
    se1, se2 = v1 / n1, v2 / n2
    denom = math.sqrt(se1 + se2)
    if denom == 0.0:
        return 0.0, float(n1 + n2 - 2), 1.0
    t = (m1 - m2) / denom
    df_num = (se1 + se2) ** 2
    df_den = se1**2 / (n1 - 1) + se2**2 / (n2 - 1) if n1 > 1 and n2 > 1 else 0.0
    df = df_num / df_den if df_den > 0 else float(n1 + n2 - 2)
    p = 2.0 * student_t_sf(abs(t), df)
    return t, df, min(1.0, max(0.0, p))
