"""Ensemble throughput sweep: aggregate grid-points/s vs member count.

The capability claim to verify on hardware: at the reference-scale grids
(256^2..1024^2) a single run leaves the TPU idle (launch/pipeline-bound),
and vmap-batching M members into one jitted scan multiplies AGGREGATE
throughput well past M=1 at near-constant wall per step. One process,
all combos (tunnel session tax — batch everything); timing contract as
in bench.py: scan-inside-jit segments, completion forced by a scalar
checksum fetch, second call timed.

Usage: python scripts/bench_ensemble.py [--steps 100]
       [--combos 256x1 256x8 256x64 512x1 512x8 512x32 1024x1 1024x8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--combos", nargs="+",
                    default=["256x1", "256x8", "256x64",
                             "512x1", "512x8", "512x32",
                             "1024x1", "1024x8"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
    from xlab_fftbarotropic_tpu.models.ensemble import EnsembleModel

    def progress(*a):
        print(time.strftime("%H:%M:%S"), *a, file=sys.stderr)
        sys.stderr.flush()

    progress("warming backend:",
             float(jnp.max(jnp.zeros((8,), jnp.float32))))

    base = {}
    for combo in args.combos:
        # NXxM[xW][:backend] — W chunks the vmap; backend defaults to
        # xla (the round-2 sweep's configuration). ':auto' exercises the
        # width-aware gate (models/ensemble._resolve_member_backend):
        # width-1 chunks at >= the pallas floor run the plane stepper.
        spec = combo.lower()
        backend = "xla"
        if ":" in spec:
            spec, backend = spec.split(":", 1)
        parts = [int(v) for v in spec.split("x")]
        nx, m = parts[0], parts[1]
        width = parts[2] if len(parts) > 2 else m  # NXxMxW = chunked
        cfg = ModelConfig(nx=nx, ny=nx, fft_backend=backend)
        vort0 = makefields.gaussian(cfg)
        src = jnp.zeros(cfg.grid_shape, jnp.float32)
        if m == 1:
            model = BarotropicModel.build(cfg)
            state = model.init_state(vort0)
        else:
            model = EnsembleModel.build(cfg, m, vmap_width=width)
            state = model.init_from_physical(vort0, amplitude=0.05, seed=0)

        def checksum(s):
            return float(jnp.max(jnp.real(s)))

        progress(combo, "compiling")
        cw = checksum(model.segment(state, src, args.steps))
        progress(combo, "warm, checksum", cw)
        t0 = time.perf_counter()
        ct = checksum(model.segment(state, src, args.steps))
        dt = time.perf_counter() - t0
        assert ct == cw, "nondeterministic segment"
        agg = nx * nx * m * args.steps / dt
        rec = {"nx": nx, "members": m, "width": width,
               "backend": backend, "steps": args.steps,
               "ms_per_step": round(dt / args.steps * 1e3, 3),
               "agg_gp_per_s": round(agg, 0)}
        if (nx, backend) in base:
            rec["agg_speedup_vs_m1"] = round(agg / base[(nx, backend)], 2)
        if m == 1:
            base[(nx, backend)] = agg
        print(json.dumps(rec))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
