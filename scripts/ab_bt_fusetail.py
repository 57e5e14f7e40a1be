"""Hardware A/B of the RK4 tail fusion (XFB_BT_FUSETAIL) on the
barotropic plane stepper — the round-4 profiler-informed bubble probe
(the tail combine measured 0.59 ms/step of the 17.8 ms device step at
4096² fast; _kx_visc_tail_kernel deletes the pass + launch).

ONE process (tunnel discipline): warm-up, then off/on segments with the
module-global toggle (safe in-process — only BLOCK/PRECISION rebuilds
trip the lowering cache, CLAUDE.md). Checksums must be identical (the
fusion is bit-identical by construction, pinned in interpret mode).

Usage: python scripts/ab_bt_fusetail.py [--nx 4096] [--steps 30]
       [--mm fast|fp32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mm", default="fast", choices=["fast", "fp32"])
    args = ap.parse_args()
    if args.mm == "fast":
        os.environ["XFB_PALLAS_MM"] = "default"

    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
    from xlab_fftbarotropic_tpu.ops import pallas_fft as pf

    def progress(*a):
        print(time.strftime("%H:%M:%S"), *a, file=sys.stderr)
        sys.stderr.flush()

    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    progress(f"warm-up fetch {time.perf_counter() - t0:.1f}s")

    cfg = ModelConfig(nx=args.nx, ny=args.nx)
    vort0 = makefields.gaussian(cfg)
    src = jnp.zeros(cfg.grid_shape, jnp.float32)

    for setting in ("0", "1"):
        pf.FUSETAIL = setting
        t_b = time.perf_counter()
        model = BarotropicModel.build(cfg)
        z = model.init_state(vort0)
        out = model.segment(z, src, args.steps)
        c_w = float(jnp.max(jnp.abs(out)))
        compile_s = time.perf_counter() - t_b
        t0 = time.perf_counter()
        out = model.segment(z, src, args.steps)
        c_t = float(jnp.max(jnp.abs(out)))
        dt = time.perf_counter() - t0
        assert c_t == c_w, "nondeterministic segment"
        ms = dt / args.steps * 1e3
        print(json.dumps({
            "fusetail": setting, "nx": args.nx, "steps": args.steps,
            "mm": args.mm, "ms_per_step": round(ms, 2),
            "gp_per_s": round(args.nx * args.nx / ms * 1e3, 1),
            "checksum": c_t,
            "build_plus_compile_s": round(compile_s - dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
