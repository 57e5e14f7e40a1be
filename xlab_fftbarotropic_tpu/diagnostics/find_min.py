"""Field minima extraction.

Equivalent of find_min.out (/root/reference/src/find_min.cpp): for a field,
find the n smallest values and their grid coordinates. The reference's
selection-scan (find_min.cpp:42-64) emits the 30 minima in an unspecified
internal order; we return them sorted ascending by value (a superset
guarantee: the SET of minima matches; tests pin this). Coordinate decoding
follows find_min.cpp:86-87: for flat index p, y = p % ny, x = p // ny.

Runs as one jitted jax.lax.top_k on device — O(N^2) scan parallelized on
the VPU rather than the reference's serial O(N^2 * n) loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_min_n(field, n: int = 30) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (x_idx, y_idx, values) of the n smallest entries, sorted
    ascending by value. Matches find_min.cpp's default min_n=30
    (find_min.cpp:72)."""
    a = jnp.asarray(field, jnp.float32)
    ny = a.shape[-1]
    flat = a.reshape(-1)
    neg_vals, idx = jax.lax.top_k(-flat, n)
    vals = -neg_vals
    # top_k returns descending in -vals => vals ascending already
    x = idx // ny                       # find_min.cpp:87
    y = idx % ny                        # find_min.cpp:86
    return np.asarray(x), np.asarray(y), np.asarray(vals)


def format_minima(x, y, vals) -> str:
    """The reference's stdout contract: '%zu %zu %.5e' per line
    (find_min.cpp:89)."""
    return "\n".join(f"{int(xi)} {int(yi)} {float(vi):.5e}"
                     for xi, yi, vi in zip(x, y, vals))
