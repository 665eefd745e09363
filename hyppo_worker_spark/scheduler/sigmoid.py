"""Gompertz sigmoid backoff curve.

Same function family and parameter semantics as the reference's
probabilistic resource-contention backoff
(``worker/.../scheduling/Sigmoid.scala:21-49``): the probability of
re-attempting a contended resource after ``t`` seconds is
``y(t) = a·e^(−b·e^(−c·t))`` with ``a = 1`` fixed, ``b`` the
displacement (the configured minimum delay, seconds) and ``c`` the
growth/scale factor (default 0.2 — ``reference.conf:84-88``).
"""

from __future__ import annotations

import math


def gompertz(a: float, b: float, c: float, t: float) -> float:
    """General Gompertz function y(t) = a·e^(−b·e^(−c·t)).

    Validation parity: a must be nonzero; b and c strictly positive.
    """
    if a == 0.0:
        raise ValueError("the a value must not be 0.0")
    if b <= 0.0 or c <= 0.0:
        raise ValueError(f"the b and c values must be > 0; received b={b} c={c}")
    be = b * math.exp(-(c * t))
    return math.exp(-be) * a


def gompertz_backoff_factor(seconds: int, scale_factor: float, delay_factor: float) -> float:
    """Probability in (0, 1] that a worker should re-attempt a
    resource ``seconds`` after the last acquisition failure."""
    if seconds < 0:
        raise ValueError(f"seconds must be >= 0; received {seconds}")
    return gompertz(1.0, delay_factor, scale_factor, float(seconds))
