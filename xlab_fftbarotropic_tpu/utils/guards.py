"""Numerical-health guards (SURVEY.md §6 "race detection / sanitizers" row).

The reference crashes or silently produces NaN fields on blow-up; here the
runner can check each recorded state and fail loudly with the step index —
the jit hot path stays untouched (checks run only at record boundaries, on
values already fetched for output).
"""

from __future__ import annotations

import numpy as np


class BlowUpError(RuntimeError):
    """State became non-finite (CFL violation / instability)."""


def check_finite(step: int, **fields) -> None:
    """Raise BlowUpError naming the first non-finite recorded field."""
    for name, arr in fields.items():
        if arr is None:
            continue
        a = np.asarray(arr)
        finite = np.isfinite(a)
        if not finite.all():
            bad = int(np.size(a) - finite.sum())
            peak = (f"max |finite| = {np.abs(a[finite]).max():.3e}"
                    if finite.any() else "no finite values left")
            raise BlowUpError(
                f"step {step}: field {name!r} has {bad} non-finite values "
                f"({peak}) — likely CFL violation; reduce dt or increase nu")
