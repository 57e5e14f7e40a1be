"""Profile the 4096^2 fast-mode barotropic scan segment (VERDICT r3
item 5): turn the roofline entry's "bubble/compute-bound" INFERENCE into
per-kernel DATA.

One process (tunnel discipline, CLAUDE.md): warm-up fetch, compile the
scan segment, then capture a `jax.profiler.trace` around a timed segment
and aggregate device kernel durations from the perfetto
`*.trace.json.gz` the profiler writes. Prints per-kernel totals (top-N
by accumulated duration) plus the measured ms/step, so the largest
non-DMA stall is identified from observation rather than from the
analytic traffic table (BASELINE.md roofline entry).

If the tunnel yields no device events (remote profiling may be
unsupported), says so explicitly — the fallback is the chained-scan
kernel decomposition of scripts/fft_breakdown.py.

Usage: python scripts/profile_bt.py [--nx 4096] [--steps 20]
       [--mm fast|fp32] [--trace-dir /tmp/xfb_trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, ".")


def progress(*a):
    print(time.strftime("%H:%M:%S"), *a, file=sys.stderr)
    sys.stderr.flush()


def aggregate_trace(trace_dir: str, top: int = 30):
    """Aggregate 'X' (complete) events by name from every
    trace.json(.gz) under trace_dir; returns (rows, lane_names)."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
        + glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                    recursive=True))
    totals: dict = {}
    lanes: dict = {}
    for p in paths:
        op = gzip.open if p.endswith(".gz") else open
        with op(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            ph = ev.get("ph")
            if ph == "M" and ev.get("name") == "process_name":
                lanes[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ph == "X":
                name = ev.get("name", "?")
                dur = float(ev.get("dur", 0.0))  # microseconds
                t, c = totals.get(name, (0.0, 0))
                totals[name] = (t + dur, c + 1)
    rows = sorted(((t, c, n) for n, (t, c) in totals.items()),
                  reverse=True)[:top]
    return rows, lanes, len(paths)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--model", default="barotropic",
                    choices=["barotropic", "sw", "sw-etdrk4"])
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--mm", default="fast", choices=["fast", "fp32"])
    ap.add_argument("--trace-dir", default="/tmp/xfb_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    if args.mm == "fast":
        os.environ["XFB_PALLAS_MM"] = "default"

    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel

    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    progress(f"warm-up fetch {time.perf_counter() - t0:.1f}s")

    cfg = ModelConfig(nx=args.nx, ny=args.nx)
    if args.model == "barotropic":
        if args.dt is not None:
            cfg = cfg.replace(dt=args.dt)
        model = BarotropicModel.build(cfg)
        z = model.init_state(makefields.gaussian(cfg))
        src = jnp.zeros(cfg.grid_shape, jnp.float32)
        checksum = lambda o: float(jnp.max(jnp.abs(o)))
    else:
        from xlab_fftbarotropic_tpu.models.shallow_water import (
            ShallowWaterModel, max_stable_dt)
        scheme = "etdrk4" if args.model.endswith("etdrk4") else "rk4"
        dflt = (7.5 if scheme == "etdrk4"
                else 0.9 * max_stable_dt(cfg))
        cfg = cfg.replace(dt=args.dt if args.dt is not None else dflt,
                          time_scheme=scheme)
        model = ShallowWaterModel.build(cfg)
        z = model.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
        src = None
        checksum = lambda o: float(jnp.max(jnp.abs(o.zeta_hat)))

    progress("compiling segment")
    out = model.segment(z, src, args.steps)
    c_w = checksum(out)
    progress("warm, checksum", c_w)

    os.makedirs(args.trace_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        out = model.segment(z, src, args.steps)
        c_t = checksum(out)
    dt = time.perf_counter() - t0
    assert c_t == c_w, "nondeterministic segment"
    ms = dt / args.steps * 1e3
    progress(f"traced segment: {ms:.2f} ms/step")

    rows, lanes, n_files = aggregate_trace(args.trace_dir, args.top)
    print(json.dumps({
        "nx": args.nx, "steps": args.steps, "mm": args.mm,
        "ms_per_step_traced": round(ms, 2),
        "trace_files": n_files,
        "lanes": lanes,
    }), flush=True)
    if not rows:
        print("# NO trace events captured — remote profiling "
              "unsupported on this transport; use the chained-scan "
              "fallback (scripts/fft_breakdown.py)", flush=True)
        return
    total_us = sum(t for t, _, _ in rows)
    print(f"# top {len(rows)} events by total duration "
          f"({n_files} trace file(s)); segment wall "
          f"{dt * 1e3:.1f} ms", flush=True)
    for t, c, n in rows:
        print(f"{t / 1e3:10.2f} ms  x{c:<5d} "
              f"{t / 10.0 / max(total_us, 1e-9):5.1f}%  {n}",
              flush=True)


if __name__ == "__main__":
    main()
