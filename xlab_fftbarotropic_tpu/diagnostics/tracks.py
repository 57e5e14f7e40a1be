"""Vortex-center tracking across record steps.

The reference's minima workflow ends at a flat concatenation of per-file
minima (`find_min.out` lines piped into pres_timeseries.txt,
/root/reference/test/02-test_invert_pressure/example.sh:16) — every
record step contributes its 30 deepest pressure points with no identity
between steps, and the "time series" is disentangled by eye. This module
completes that workflow: it reduces each step's minima to distinct vortex
CORES (non-maximum suppression — the 30 smallest values of a deep vortex
all sit in one well) and associates cores across steps into tracks by
periodic-domain nearest neighbor, giving per-vortex (step, x, y, depth)
trajectories — the quantity the reference pipeline was built to extract
(vortex-merger position/depth evolution).

Host-side numpy on O(30)-point sets per step: there is no device work
worth dispatching here; the heavy part (top-k over the field) already ran
in diagnostics/find_min.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np


def periodic_delta(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Signed minimal displacement a-b on a ring of n points."""
    d = (np.asarray(a, np.float64) - np.asarray(b, np.float64)) % n
    return np.where(d > n / 2, d - n, d)


def cluster_minima(x, y, vals, nx: int, ny: int,
                   radius: float) -> List[Tuple[int, int, float]]:
    """Reduce a step's minima list to distinct cores.

    Greedy non-maximum suppression in depth order: the deepest point
    opens a core; every later point within `radius` grid cells
    (periodic) of an accepted core belongs to that core's well and is
    dropped. Returns [(x, y, value), ...] deepest-first."""
    order = np.argsort(np.asarray(vals))
    xs = np.asarray(x)[order]
    ys = np.asarray(y)[order]
    vs = np.asarray(vals)[order]
    cores: List[Tuple[int, int, float]] = []
    for xi, yi, vi in zip(xs, ys, vs):
        keep = True
        for cx, cy, _ in cores:
            dx = periodic_delta(xi, cx, nx)
            dy = periodic_delta(yi, cy, ny)
            if dx * dx + dy * dy <= radius * radius:
                keep = False
                break
        if keep:
            cores.append((int(xi), int(yi), float(vi)))
    return cores


@dataclasses.dataclass
class Track:
    """One vortex trajectory: parallel per-sample lists."""

    track_id: int
    steps: List[int]
    x: List[int]
    y: List[int]
    value: List[float]

    def last(self) -> Tuple[int, int]:
        return self.x[-1], self.y[-1]


def build_tracks(records: Sequence[Tuple[int, Sequence, Sequence, Sequence]],
                 nx: int, ny: int, cluster_radius: float = 8.0,
                 max_jump: float = 64.0) -> List[Track]:
    """Associate per-step minima into tracks.

    records: iterable of (step, x_idx, y_idx, values) as produced by
    diagnostics.find_min.find_min_n per record step, in time order.
    cluster_radius: grid-cell radius of one vortex well (see
    cluster_minima). max_jump: largest per-record-step core displacement
    (grid cells, periodic) still treated as the same vortex; cores
    farther than this from every live track start a new track.

    Greedy globally-nearest matching between the live track heads and
    the new step's cores (each pair used at most once), so a deep new
    core cannot steal a closer track from a shallow one."""
    tracks: List[Track] = []
    live: List[Track] = []
    for step, xs, ys, vs in records:
        cores = cluster_minima(xs, ys, vs, nx, ny, cluster_radius)
        if not live:
            for cx, cy, cv in cores:
                t = Track(len(tracks), [step], [cx], [cy], [cv])
                tracks.append(t)
                live.append(t)
            continue
        # distance matrix live-heads x cores (periodic)
        pairs = []
        for i, t in enumerate(live):
            hx, hy = t.last()
            for j, (cx, cy, _) in enumerate(cores):
                dx = periodic_delta(cx, hx, nx)
                dy = periodic_delta(cy, hy, ny)
                d2 = float(dx * dx + dy * dy)
                if d2 <= max_jump * max_jump:
                    pairs.append((d2, i, j))
        pairs.sort()
        used_t, used_c = set(), set()
        for _, i, j in pairs:
            if i in used_t or j in used_c:
                continue
            used_t.add(i)
            used_c.add(j)
            cx, cy, cv = cores[j]
            live[i].steps.append(step)
            live[i].x.append(cx)
            live[i].y.append(cy)
            live[i].value.append(cv)
        next_live = [t for i, t in enumerate(live) if i in used_t]
        for j, (cx, cy, cv) in enumerate(cores):
            if j not in used_c:
                t = Track(len(tracks), [step], [cx], [cy], [cv])
                tracks.append(t)
                next_live.append(t)
        live = next_live
    return tracks


def format_tracks(tracks: Sequence[Track]) -> str:
    """One line per sample: 'track_id step x y value' (value in the
    reference's %.5e format), tracks in id order — a machine-greppable
    extension of the find_min stdout contract."""
    out = []
    for t in tracks:
        for s, x, y, v in zip(t.steps, t.x, t.y, t.value):
            out.append(f"{t.track_id} {s} {x} {y} {v:.5e}")
    return "\n".join(out)
