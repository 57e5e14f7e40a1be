"""Shallow-water backend A/B at the north-star grid (one TPU process).

Measures ms/step of the 20-step scanned SW segment at --nx (default
4096^2, dt=0.75 — inside the gravity-wave CFL bound, see
models/shallow_water.py:max_stable_dt) for three backends IN ONE
process (tunnel discipline, CLAUDE.md):

  xla     jnp.fft core (round-1: 137.4 ms/step at 4096^2)
  pallas-transforms   fused per-transform pipeline, plane stepper
                      disabled via XFB_PLANE_STEPPER_MAX=0 at build time
                      (round-1: 96.6 ms/step)
  pallas-planes       the fused plane-state stepper (ops/pallas_sw.py)

Each non-XLA result is compared to the XLA segment output by an
ON-DEVICE relative L2 per state component (only scalars cross the
tunnel). Prints one JSON line per backend.
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dt", type=float, default=0.75)
    ap.add_argument("--backends", default="xla,transforms,planes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.shallow_water import ShallowWaterModel

    # tunnel warm-up: first device fetch of a process can stall minutes
    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    print(f"# warm-up fetch {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    def build(backend, scheme="rk4", dt=None):
        cfg = ModelConfig(nx=args.nx, ny=args.nx,
                          dt=args.dt if dt is None else dt,
                          fft_backend=backend, time_scheme=scheme)
        m = ShallowWaterModel.build(cfg)
        s = m.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
        return m, s

    def run(m, s):
        """(ms_per_step, final state); compile excluded, completion forced
        by a scalar checksum fetch."""
        out = m.segment(s, None, args.steps)
        c_w = float(jnp.max(jnp.abs(out.zeta_hat)))
        t0 = time.perf_counter()
        out = m.segment(s, None, args.steps)
        c_t = float(jnp.max(jnp.abs(out.zeta_hat)))
        dt = time.perf_counter() - t0
        assert c_t == c_w, "nondeterministic segment"
        return dt / args.steps * 1e3, out, c_t

    @jax.jit
    def rel_l2(a, b):
        def r(x, y):
            return jnp.linalg.norm(jnp.ravel(x - y)) / jnp.maximum(
                jnp.linalg.norm(jnp.ravel(y)), 1e-30)
        return (r(a.zeta_hat, b.zeta_hat), r(a.div_hat, b.div_hat),
                r(a.eta_hat, b.eta_hat))

    from xlab_fftbarotropic_tpu.ops import pallas_fft, pallas_sw
    default_yfirst = pallas_sw.YFIRST
    default_split = pallas_sw.SPLIT_LINEAR
    default_store = pallas_fft.STORE
    default_kyall = pallas_sw.KY_ALL
    default_pstore = pallas_sw.PSTORE
    wanted = args.backends.split(",")
    ref_out = None
    for name in wanted:
        t_build = time.perf_counter()
        # reset the order/split/store toggles so a variant entry cannot
        # leak into a later plain 'planes' row and mislabel the default
        pallas_sw.YFIRST = default_yfirst
        pallas_sw.SPLIT_LINEAR = default_split
        pallas_fft.STORE = default_store
        pallas_sw.KY_ALL = default_kyall
        pallas_sw.PSTORE = default_pstore
        # intermediate-plane storage A/B (pallas_fft STORE note):
        # '-bf16store' / '-f32store' suffix on any planes variant
        base = name
        if "-kyloop" in base:
            pallas_sw.KY_ALL = "loop"
            base = base.replace("-kyloop", "")
        elif "-kyall" in base:
            pallas_sw.KY_ALL = "1"
            base = base.replace("-kyall", "")
        if "-pstore" in base:
            pallas_sw.PSTORE = "bf16"
            base = base.replace("-pstore", "")
        if base.endswith("-bf16store"):
            pallas_fft.STORE = "bf16"
            base = base[:-len("-bf16store")]
        elif base.endswith("-f32store"):
            pallas_fft.STORE = "f32"
            base = base[:-len("-f32store")]
        if base == "xla":
            m, s = build("xla")
        elif base == "transforms":
            os.environ["XFB_PLANE_STEPPER_MAX"] = "0"
            try:
                m, s = build("pallas")
            finally:
                del os.environ["XFB_PLANE_STEPPER_MAX"]
        elif base == "planes":
            m, s = build("pallas")
        elif base in ("planes-yfirst", "planes-xfirst"):
            # forward-pipeline order A/B (module-global toggle, safe
            # in-process like PLANE_STEPPER; only BLOCK/PRECISION
            # rebuilds trip the lowering-cache bug)
            pallas_sw.YFIRST = base.endswith("yfirst")
            m, s = build("pallas")
        elif base in ("planes-split", "planes-nosplit"):
            # split-linear formulation A/B (ops/pallas_sw.py module
            # note); pair with XFB_PALLAS_MM=default in the env for the
            # fast-transforms accuracy/speed comparison
            pallas_sw.SPLIT_LINEAR = ("1" if base.endswith("-split")
                                      else "0")
            m, s = build("pallas")
        elif base.startswith("etdrk4"):
            # exponential integrator (models/etdrk4.py): dt may carry
            # as a suffix multiple of args.dt, e.g. etdrk4x10 = 10x;
            # '-xlafft' pins the XLA transform path for N; '-fuse'
            # turns on the COMBINE matvec-epilogue stage fusion
            spec2 = base[len("etdrk4"):]
            be = "pallas"
            if spec2.endswith("-fuse"):
                os.environ["XFB_SW_ETD_FUSE"] = "1"
                spec2 = spec2[:-len("-fuse")]
            else:
                os.environ.pop("XFB_SW_ETD_FUSE", None)
            if spec2.endswith("-xlafft"):
                be, spec2 = "xla", spec2[:-len("-xlafft")]
            mult = float(spec2[1:]) if spec2.startswith("x") else 1.0
            m, s = build(be, scheme="etdrk4", dt=args.dt * mult)
        else:
            raise SystemExit(f"unknown backend {name}")
        ms, out, csum = run(m, s)
        dt_used = float(m.cfg.dt)
        rec = {"backend": name, "nx": args.nx, "steps": args.steps,
               "dt": dt_used, "ms_per_step": round(ms, 2),
               "gp_per_s": round(args.nx * args.nx / ms * 1e3, 1),
               "sim_s_per_wall_s": round(dt_used / ms * 1e3, 1),
               "checksum": csum,
               "build_plus_compile_s":
                   round(time.perf_counter() - t_build - ms
                         * args.steps / 1e3, 1)}
        if name == "xla":
            ref_out = out
        elif ref_out is not None and dt_used == args.dt:
            # same dt + steps = same horizon; a scaled-dt etdrk4 row
            # ends at a different simulated time, no state comparison
            rz, rd, re_ = (float(v) for v in rel_l2(out, ref_out))
            rec["rel_l2_vs_xla"] = {"zeta": rz, "div": rd, "eta": re_}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
