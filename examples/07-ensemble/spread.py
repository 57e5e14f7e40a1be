#!/usr/bin/env python
"""Reduce per-member pressure-minima tracks (find_min output: one
``x y value`` line per record) to an ensemble spread summary.

Reads output/mNN/pres_timeseries.txt for every member and prints, per
record index, the cross-member mean and standard deviation of the
minimum's (x, y) position and pressure depth — the standard ensemble
read-out of vortex-track uncertainty. Member 0 is the unperturbed
control, so its track is also shown as the deterministic baseline.
"""
import sys
import glob

import numpy as np


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                rows.append([float(parts[0]), float(parts[1]),
                             float(parts[2])])
    return np.asarray(rows)


def main(outdir):
    paths = sorted(glob.glob(f"{outdir}/m*/pres_timeseries.txt"))
    if not paths:
        raise SystemExit(f"no member tracks under {outdir}")
    tracks = np.stack([load(p) for p in paths])   # (M, T, 3)
    m, t, _ = tracks.shape
    print(f"# ensemble of {m} members, {t} records (member 0 = control)")
    print("# rec  ctrl_x ctrl_y ctrl_min | mean_x mean_y mean_min |"
          " std_x std_y std_min")
    for k in range(t):
        c = tracks[0, k]
        mu = tracks[:, k].mean(axis=0)
        sd = tracks[:, k].std(axis=0)
        print(f"{k:4d}  {c[0]:7.1f} {c[1]:7.1f} {c[2]:10.4g} |"
              f" {mu[0]:7.1f} {mu[1]:7.1f} {mu[2]:10.4g} |"
              f" {sd[0]:6.2f} {sd[1]:6.2f} {sd[2]:9.3g}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "output")
