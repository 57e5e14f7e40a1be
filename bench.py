"""Benchmark harness — prints ONE JSON line with the headline metric.

North-star metric (BASELINE.md): grid-points/s/chip for a full RK4 step
(20 FFTs + spectral pointwise work) at 4096^2. The reference publishes no
numbers (SURVEY.md §7), so `vs_baseline` is measured against this repo's
own CPU oracle (oracle/reference_cpu.py) — a line-for-line float32
numpy re-implementation of the serial reference pipeline — standing in
for the single-threaded FFTW3f reference binary which cannot be built
here (no FFTW; SURVEY.md Phase 0 note). The oracle is timed at a small
grid (running it at 4096^2 would take minutes per step) and its
grid-points/s is extrapolated to the bench grid with the serial
N^2 log N FFT cost model: per-point cost scales with log(nx), so
gp/s(bench_nx) = gp/s(oracle_nx) * log(oracle_nx)/log(bench_nx). The
JSON records the method in `baseline_method`.

The headline runs the production fast-transforms mode (`--mm fast`,
the `xfb-run --fast-transforms` configuration: single-pass bf16 Pallas
kernel matmuls) — measured at 4096^2 on hardware 2026-08-18: 20.7
ms/step sustained over a 2000-step soak, rel-L2 vs the fp32 XLA core
1.8e-5 at 20 steps growing sublinearly to 1.2e-4 at 200 (BASELINE.md
fast-horizon entry). `--mm fp32` keeps the strict reference-parity
float32 mode (42.95 ms/step there). The JSON discloses the mode and
its measured accuracy so the two are never conflated.

The default invocation measures ALL THREE model families (barotropic,
shallow-water, tracer) in this one process — tunnel discipline: one
client, one warm-up — and reports them in the `families` field of the
single JSON line, so the driver-captured artifact carries every family
headline (round-3 VERDICT weakness 5). The barotropic number remains
the headline `metric`/`value`.

Usage: python bench.py [--nx N] [--steps S] [--quick] [--mm fast|fp32]
       [--model all|barotropic|sw|tracer]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def measure_tpu(nx: int, steps: int, model_kind: str = "barotropic"):
    """Wall-clock a `steps`-long jitted scan segment; returns
    (grid-points/s on one chip, ms/step, dt_used). Compile excluded;
    device-synchronized timing."""
    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields

    cfg = ModelConfig(nx=nx, ny=nx)
    extra = {}
    if model_kind == "sw-etdrk4":
        # the round-4 flagship: exponential integration at a dt far
        # above the gravity-wave CFL bound (BASELINE.md ETDRK4 entry:
        # 8.9x the bound, soak-stable for 1000 steps at 4096^2 with
        # flat conservation scalars). dt pinned to 7.5 s at 4096^2
        # (the ledgered operating point) and scaled as 8.85x the bound
        # elsewhere. phi tables come through the disk cache
        # (models/etdrk4.py:build_tables_cached) — the JSON discloses
        # whether this process built or loaded them.
        from xlab_fftbarotropic_tpu.models import etdrk4 as etd_mod
        from xlab_fftbarotropic_tpu.models.shallow_water import (
            ShallowWaterModel, max_stable_dt)
        bound = max_stable_dt(cfg)
        dt_big = 7.5 if nx == 4096 else round(8.85 * bound, 3)
        cfg = cfg.replace(dt=dt_big, time_scheme="etdrk4")
        key = etd_mod.tables_cache_key(cfg, dt_big, kind="sw")
        cdir = etd_mod._cache_dir(cfg)
        cached = bool(cdir and (cdir / f"sw_etd_{key}.npy").exists())
        t_b = time.perf_counter()
        model = ShallowWaterModel.build(cfg)
        extra = {"dt_multiple_of_rk4_bound": round(dt_big / bound, 2),
                 "etd_tables": "cache" if cached else "built",
                 "build_s": round(time.perf_counter() - t_b, 1)}
        z = model.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
        src = None
    elif model_kind in ("shallow-water", "sw"):
        from xlab_fftbarotropic_tpu.models.shallow_water import (
            ShallowWaterModel, max_stable_dt)
        # the default dt=3 s violates the RK4 gravity-wave CFL bound at
        # >= 2048^2 (0.847 s at 4096^2) and the segment would NaN
        cfg = cfg.replace(dt=min(float(cfg.dt), max_stable_dt(cfg)))
        model = ShallowWaterModel.build(cfg)
        z = model.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
        src = None
    elif model_kind == "tracer":
        from xlab_fftbarotropic_tpu.models.tracer import (TracerModel,
                                                          tracer_ic)
        model = TracerModel.build(cfg, kappa=50.0)
        z = model.init_state(makefields.gaussian(cfg),
                             tracer_ic(cfg, "gaussian"))
        src = model.zero_source()
    else:
        from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
        model = BarotropicModel.build(cfg)
        z = model.init_state(makefields.gaussian(cfg))
        src = jnp.zeros(cfg.grid_shape, jnp.float32)

    # Timing contract: block_until_ready on a remote-device pytree can
    # return before execution completes (observed through the device
    # tunnel), so completion is forced by fetching a scalar checksum that
    # data-depends on the full integration.
    def checksum(state):
        leaf = state[0] if isinstance(state, tuple) else state
        return float(jnp.max(jnp.abs(leaf)))

    z_w = model.segment(z, src, steps)          # compile + warm-up
    c_w = checksum(z_w)

    t0 = time.perf_counter()
    z_t = model.segment(z, src, steps)
    c_t = checksum(z_t)
    dt = time.perf_counter() - t0
    assert c_t == c_w, "nondeterministic segment result"
    ms = dt / steps * 1e3
    if extra:
        extra["sim_s_per_wall_s"] = round(float(cfg.dt) / ms * 1e3, 1)
    return nx * nx * steps / dt, ms, float(cfg.dt), extra


def measure_oracle(nx: int, steps: int) -> float:
    """CPU-oracle (stand-in for the serial C++/FFTW reference) gp/s."""
    import numpy as np

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.oracle import reference_cpu as oracle

    cfg = ModelConfig(nx=nx, ny=nx)
    vort0 = makefields.gaussian(cfg)
    model = oracle.OracleBarotropic(cfg)
    t0 = time.perf_counter()
    model.run(vort0, steps)
    dt = time.perf_counter() - t0
    return nx * nx * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--oracle-nx", type=int, default=256)
    ap.add_argument("--oracle-steps", type=int, default=10)
    ap.add_argument("--model", default="all",
                    choices=["all", "barotropic", "sw", "shallow-water",
                             "tracer", "sw-etdrk4"],
                    help="'all' (default) measures every family in this "
                         "one process and reports them in a 'families' "
                         "field (the barotropic headline stays the "
                         "metric/value); a family name restricts to it")
    ap.add_argument("--quick", action="store_true",
                    help="small grid for smoke runs")
    ap.add_argument("--mm", default="fast", choices=["fast", "fp32"],
                    help="transform precision mode: 'fast' = the "
                         "production --fast-transforms configuration "
                         "(bf16 Pallas kernel matmuls, horizon-validated "
                         "in BASELINE.md), 'fp32' = strict reference-"
                         "parity float32 (HIGHEST). One mode per process "
                         "(in-process kernel rebuilds trip the MLIR "
                         "lowering cache; CLAUDE.md).")
    args = ap.parse_args()
    if args.quick:
        args.nx, args.steps = 512, 10

    if args.mm == "fast":
        # Must land before ops.pallas_fft is imported (it reads the env
        # at import); mirror into an already-imported module the way
        # cli/run.py --fast-transforms does.
        import os
        os.environ["XFB_PALLAS_MM"] = "default"
        mod = sys.modules.get("xlab_fftbarotropic_tpu.ops.pallas_fft")
        if mod is not None:
            mod.MM_MODE = "default"

    kinds = (["barotropic", "sw", "tracer", "sw-etdrk4"]
             if args.model == "all" else [args.model])
    families = {}
    for kind in kinds:
        gps_k, ms_k, dt_k, extra = measure_tpu(args.nx, args.steps, kind)
        key = ("sw" if kind == "shallow-water"
               else "etdrk4" if kind == "sw-etdrk4" else kind)
        families[key] = {"gp_per_s": round(gps_k, 1),
                         "ms_per_step": round(ms_k, 2), "dt": dt_k,
                         **extra}
        print(f"# {key}: {ms_k:.2f} ms/step ({gps_k / 1e6:.1f} M gp/s)",
              file=sys.stderr, flush=True)
    head = kinds[0]     # barotropic headline when measuring all
    head_key = ("sw" if head == "shallow-water"
                else "etdrk4" if head == "sw-etdrk4" else head)
    gps = families[head_key]["gp_per_s"]
    try:
        base = measure_oracle(args.oracle_nx, args.oracle_steps)
    except Exception as e:  # oracle failure must not kill the bench
        print(f"# oracle baseline failed: {e}", file=sys.stderr)
        base = None

    tag = ("" if head == "barotropic"
           else "_tracer" if head == "tracer"
           else "_etdrk4" if head == "sw-etdrk4" else "_sw")
    out = {
        "metric": f"rk4{tag}_grid_points_per_s_per_chip_{args.nx}x{args.nx}",
        "value": gps,
        "unit": "grid-points/s/chip",
        "families": families,
        "mm_mode": ("fast-transforms (bf16 Pallas matmuls; the xfb-run "
                    "--fast-transforms production mode; rel-L2 vs fp32 "
                    "core 1.8e-5 @20 steps / 1.2e-4 @200, 2000-step "
                    "soak-stable — BASELINE.md 2026-08-18)"
                    if args.mm == "fast" else
                    "fp32 strict reference parity (Precision.HIGHEST)"),
    }
    if base:
        import math
        # serial per-grid-point cost ~ log(nx) (N^2 log N FFTs), so the
        # oracle's gp/s measured at oracle_nx shrinks by
        # log(oracle_nx)/log(nx) at the bench grid.
        base_at_bench = base * math.log(args.oracle_nx) / math.log(args.nx)
        out["vs_baseline"] = round(gps / base_at_bench, 2)
        out["baseline_method"] = (
            f"serial CPU oracle measured at {args.oracle_nx}^2 "
            f"({base / 1e6:.2f}M gp/s), extrapolated to {args.nx}^2 by "
            "N^2logN scaling (gp/s * log(oracle_nx)/log(nx))")
    else:
        out["vs_baseline"] = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
