"""Adaptive sequential stopping + estimator sizing (driver-side planning).

Spark twins of the reference's second mini-system and its "optimizer":

  * :class:`IEStop` — CLT-based sequential stopping: stop when
    ``z(alpha/2) * sd / (sqrt(t) * mean) <= delta``, minimum 10 samples
    (/root/reference/sampling/IEStop.cpp:27-58, params
     /root/reference/sampling/main.cpp:13-14).
  * :class:`EBStop` — empirical-Bernstein bound stopping
    (/root/reference/sampling/EBStop.cpp:27-41).
  * :func:`fit_k` — unbiased y = kx regression, k = sum(xy)/sum(xx)
    (/root/reference/src/Regression.cpp:17-29).
  * :func:`size_estimators` — pilot-run sizing: run a small batch on a
    sampled subgraph, fit the error-vs-bound line, return the estimator
    count needed for (eps, conf) — the ErrorProfile pattern
    (/root/reference/src/ErrorLatencyProfile.cpp:72-207), simplified to the
    CLT form N = (z * cv / eps)^2.

The driver loop IS the reference architecture: rank-0 folds per-batch
estimates and broadcasts stop (/root/reference/sampling/main.cpp:97-146);
here each "work item" is one batch DataFrame job whose scalar lands in the
accumulator.  All math is driver-side (tiny); all data work is Spark.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass, field


def _z(alpha: float) -> float:
    """Two-sided normal quantile z(alpha/2) via Acklam-style inverse erf
    approximation (no scipy in the sandbox); alpha in (0, 1)."""
    # Beasley-Springer-Moro
    p = 1.0 - alpha / 2.0
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p <= phigh:
        q = p - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
        )
    q = math.sqrt(-2 * math.log(1 - p))
    return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )


@dataclass
class IEStop:
    """Sequential CLT stopping accumulator (one sample per work item)."""

    alpha: float = 0.05
    delta: float = 0.05
    min_samples: int = 10
    max_samples: int = 10_000
    n: int = 0
    _sum: float = 0.0
    _sumsq: float = 0.0

    def add(self, x: float) -> bool:
        """Fold one estimate; returns True when sampling may stop."""
        self.n += 1
        self._sum += x
        self._sumsq += x * x
        return self.should_stop()

    @property
    def mean(self) -> float:
        return self._sum / self.n if self.n else 0.0

    @property
    def sd(self) -> float:
        if self.n < 2:
            return float("inf")
        var = (self._sumsq - self._sum * self._sum / self.n) / (self.n - 1)
        return math.sqrt(max(var, 0.0))

    def should_stop(self) -> bool:
        if self.n >= self.max_samples:
            return True
        if self.n < self.min_samples or self.mean == 0:
            return False
        z = _z(self.alpha)
        return z * self.sd / (math.sqrt(self.n) * abs(self.mean)) <= self.delta

    def run(self, draw: Callable[[int], float]) -> float:
        """Pump work items (the reference's main-rank loop) until stop."""
        while not (self.n >= self.min_samples and self.should_stop()):
            self.add(draw(self.n))
            if self.n >= self.max_samples:
                break
        return self.mean


@dataclass
class EBStop:
    """Empirical-Bernstein stopping: halt when the EB radius
    sd * sqrt(2 ln(3/delta)/t) + 3 R ln(3/delta)/t <= eps * |mean|."""

    eps: float = 0.05
    delta: float = 0.05
    value_range: float = 1.0
    min_samples: int = 10
    max_samples: int = 100_000
    n: int = 0
    _sum: float = 0.0
    _sumsq: float = 0.0
    _max: float = field(default=0.0)

    def add(self, x: float) -> bool:
        self.n += 1
        self._sum += x
        self._sumsq += x * x
        self._max = max(self._max, abs(x))
        return self.should_stop()

    @property
    def mean(self) -> float:
        return self._sum / self.n if self.n else 0.0

    @property
    def sd(self) -> float:
        if self.n < 2:
            return float("inf")
        var = (self._sumsq - self._sum * self._sum / self.n) / (self.n - 1)
        return math.sqrt(max(var, 0.0))

    def radius(self) -> float:
        if self.n < 2:
            return float("inf")
        ln = math.log(3.0 / self.delta)
        R = max(self.value_range, self._max)
        return self.sd * math.sqrt(2 * ln / self.n) + 3 * R * ln / self.n

    def should_stop(self) -> bool:
        if self.n >= self.max_samples:
            return True
        if self.n < self.min_samples or self.mean == 0:
            return False
        return self.radius() <= self.eps * abs(self.mean)


@dataclass
class TimeBudget:
    """Wall-clock-budgeted estimator sizing by batch doubling — the twin of
    the reference's TimeProfile
    (/root/reference/src/ErrorLatencyProfile.cpp:25-47): run a batch of
    ``base_batch`` estimators, fold its estimate into the running weighted
    mean, double the batch, and repeat while the NEXT batch (predicted to
    cost 2x the last one) still fits in the budget; then spend whatever
    budget remains on one final pro-rated batch
    ``next_n * (limit - used) / (2 * last_batch_time)``.

    Each ``calculate(n)`` call is one Spark job over an n-row estimator
    table (e.g. :func:`linkgraph.algos.triangles.triangle_count_sampled`);
    the fold is the reference's Estimation::update incremental weighted
    mean (/root/reference/src/ZGraphInstance.cpp:15-35), so the result is
    identical to one flat run over the same draws.  The doubling schedule
    is the classic guess-and-double argument: total work is within 2x of
    the largest batch that fits, so the budget is never overshot by more
    than the final batch's misprediction.

    ``clock`` is injectable (tests use a fake clock to pin the schedule);
    ``max_batches`` is a runaway guard for degenerate zero-cost clocks.
    """

    time_limit: float
    base_batch: int = 64
    max_batches: int = 48
    n: int = 0
    estimate: float = 0.0
    batches: list[int] = field(default_factory=list)

    def reset(self) -> None:
        self.n = 0
        self.estimate = 0.0
        self.batches = []

    def update(self, n_new: int, est_new: float) -> None:
        """Incremental weighted mean (ZGraphInstance.cpp:24-27 verbatim)."""
        tot = self.n + n_new
        self.estimate = (
            self.estimate * (self.n / tot) + est_new * (n_new / tot)
        )
        self.n = tot

    def run(
        self,
        calculate: Callable[[int], float],
        clock: Callable[[], float] | None = None,
    ) -> float:
        if clock is None:
            import time

            clock = time.monotonic
        self.reset()
        used = 0.0
        curr = 0.0
        next_n = self.base_batch
        while used + curr * 2 <= self.time_limit:
            t0 = clock()
            est = calculate(next_n)
            curr = clock() - t0
            self.update(next_n, est)
            self.batches.append(next_n)
            next_n <<= 1
            used += curr
            if len(self.batches) >= self.max_batches:
                return self.estimate
        if curr > 0:
            remained = int(next_n * (self.time_limit - used) / (curr * 2))
            if remained > 0:
                self.update(remained, calculate(remained))
                self.batches.append(remained)
        return self.estimate


def fit_k(points: list[tuple[float, float]]) -> float:
    """Unbiased zero-intercept regression y = kx: k = sum(xy) / sum(x^2)."""
    sxy = sum(x * y for x, y in points)
    sxx = sum(x * x for x, _ in points)
    if sxx == 0:
        return 0.0
    return sxy / sxx


def size_estimators(
    pilot_values: list[float], eps: float = 0.05, conf: float = 0.95
) -> int:
    """Estimator count for relative error eps at confidence conf, from a
    pilot batch of per-estimator values: N = (z * cv / eps)^2."""
    n = len(pilot_values)
    if n < 2:
        raise ValueError("need >= 2 pilot values")
    mean = sum(pilot_values) / n
    if mean == 0:
        raise ValueError("pilot mean is 0; increase the pilot batch")
    var = sum((v - mean) ** 2 for v in pilot_values) / (n - 1)
    cv = math.sqrt(var) / abs(mean)
    z = _z(1.0 - conf)
    return max(1, math.ceil((z * cv / eps) ** 2))
