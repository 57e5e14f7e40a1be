"""Model-level A/B of FFT backends (xla vs mxu) on the barotropic core.

One process, both variants (the first device fetch of a process through
the tunnel can cost minutes — batch measurements). Timing contract as in
bench.py: scan-inside-jit segments, completion forced by scalar checksum.

Usage: python scripts/ab_fft_backend.py [--nx 4096] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backends", nargs="+", default=["xla", "mxu"])
    ap.add_argument("--model", default="barotropic",
                    choices=["barotropic", "sw", "tracer"])
    ap.add_argument("--kappa", type=float, default=50.0,
                    help="tracer diffusivity (tracer model only)")
    ap.add_argument("--dt", type=float, default=None,
                    help="override cfg.dt (the SW gravity-wave CFL bound "
                         "is ~0.85 s at 4096^2; barotropic default 3 s)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel

    def progress(*a):
        print(time.strftime("%H:%M:%S"), *a, file=sys.stderr)
        sys.stderr.flush()

    progress("warming backend:",
             float(jnp.max(jnp.zeros((8,), jnp.float32))))

    # gaussian IC (bench.py's config): kuo2004's 75 m/s peak wind violates
    # CFL at 4096^2 with the default dt and the segment goes NaN
    cfg0 = ModelConfig(nx=args.nx, ny=args.nx)
    if args.dt is not None:
        cfg0 = cfg0.replace(dt=args.dt)
    results = {}
    ref_out = None
    for name in args.backends:
        # pseudo-backends: '-high' suffix = Precision.HIGH (bf16x3)
        # matmuls, '-b256' = 256-lane blocks, 'pallas-planes*' = the
        # fused plane-state stepper (barotropic.PLANE_STEPPER). BLOCK
        # changes are only safe ACROSS processes (XFB_PALLAS_BLOCK env;
        # in-process rebuilds trip a lowering-cache bug), so '-b256' in
        # a mixed list is refused.
        build_name = name
        planes = False
        if name.startswith("pallas"):
            import jax as _jax

            from xlab_fftbarotropic_tpu.ops import pallas_fft
            from xlab_fftbarotropic_tpu.ops import pallas_sw
            pallas_fft.PRECISION = (_jax.lax.Precision.HIGH
                                    if name.endswith("-high")
                                    else _jax.lax.Precision.HIGHEST)
            # reset every toggle to its SHIPPED (env-derived) default per
            # entry so a variant suffix cannot leak into a later plain
            # name and mislabel it; plain names therefore measure the
            # shipped configuration, suffixes override explicitly
            if not hasattr(main, "_defaults"):
                main._defaults = (pallas_fft.FWD_YFIRST, pallas_sw.YFIRST,
                                  pallas_fft.FUSEKB, pallas_fft.STORE,
                                  pallas_fft.FUSEKX,
                                  pallas_sw.KA_FMINOR, pallas_sw.KY_FMINOR)
            (pallas_fft.FWD_YFIRST, pallas_sw.YFIRST, pallas_fft.FUSEKB,
             pallas_fft.STORE, pallas_fft.FUSEKX, pallas_sw.KA_FMINOR,
             pallas_sw.KY_FMINOR) = main._defaults
            if "yfirst" in name or "xfirst" in name:
                # forward-pipeline order A/B (in-process global toggle,
                # safe like PLANE_STEPPER). Toggles BOTH families'
                # globals: barotropic reads pallas_fft.FWD_YFIRST (and
                # only via the plane stepper — require '-planes'), the
                # SW stepper reads pallas_sw.YFIRST.
                if args.model == "barotropic" and "planes" not in name:
                    raise SystemExit("yfirst/xfirst needs the plane "
                                     "stepper: use pallas-planes-*")
                pallas_fft.FWD_YFIRST = "yfirst" in name
                pallas_sw.YFIRST = "yfirst" in name
            if name.endswith("-b256"):
                if len(args.backends) > 1:
                    raise SystemExit("-b256 variants need their own "
                                     "process: XFB_PALLAS_BLOCK=256 + a "
                                     "single backend")
                pallas_fft.BLOCK = 256
            # KB+advection fusion A/B (safe in-process: selects different
            # call paths / pallas_calls, like PLANE_STEPPER)
            if "fusefull" in name:
                pallas_fft.FUSEKB = "full"
            elif "fusehalf" in name:
                pallas_fft.FUSEKB = "half"
            elif "nofuse" in name:
                pallas_fft.FUSEKB = "0"
            # intermediate-plane storage A/B (pallas_fft STORE note)
            if "bf16store" in name:
                pallas_fft.STORE = "bf16"
            elif "f32store" in name:
                pallas_fft.STORE = "f32"
            # KX+VISC epilogue fusion A/B (pallas_fft FUSEKX note)
            if "fusekx" in name:
                pallas_fft.FUSEKX = "1"
            elif "nokx" in name:
                pallas_fft.FUSEKX = "0"
            # SW grid-order probes (pure iteration order, bit-identical)
            if "kafminor" in name or "bothminor" in name:
                pallas_sw.KA_FMINOR = True
            elif "kafmajor" in name:
                pallas_sw.KA_FMINOR = False
            if "kyfminor" in name or "bothminor" in name:
                pallas_sw.KY_FMINOR = True
            elif "kyfmajor" in name:
                pallas_sw.KY_FMINOR = False
            planes = name.startswith("pallas-planes")
            build_name = "pallas"
        from xlab_fftbarotropic_tpu.models import barotropic as _bt
        _bt.PLANE_STEPPER = planes
        cfg = cfg0.replace(fft_backend=build_name)
        if args.model == "sw":
            from xlab_fftbarotropic_tpu.models.shallow_water import (
                ShallowWaterModel)
            model = ShallowWaterModel.build(cfg)
            z = model.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
            src = None
        elif args.model == "tracer":
            from xlab_fftbarotropic_tpu.models.tracer import (
                TracerModel, tracer_ic)
            model = TracerModel.build(cfg, kappa=args.kappa)
            vort0 = makefields.gaussian(cfg)
            z = model.init_state(vort0, tracer_ic(cfg, "gaussian"))
            src = model.zero_source()
        else:
            model = BarotropicModel.build(cfg)
            z = model.init_state(makefields.gaussian(cfg))
            src = jnp.zeros(cfg.grid_shape, jnp.float32)
        import jax

        def checksum(state):
            leaf = jax.tree_util.tree_leaves(state)[0]
            return float(jnp.max(jnp.real(leaf)))

        progress(name, "compiling")
        zw = model.segment(z, src, args.steps)
        cw = checksum(zw)
        progress(name, "warm, checksum", cw)
        t0 = time.perf_counter()
        zt = model.segment(z, src, args.steps)
        ct = checksum(zt)
        dt = time.perf_counter() - t0
        assert ct == cw, "nondeterministic segment"
        gps = args.nx * args.nx * args.steps / dt
        results[name] = gps
        rec = {"backend": name, "nx": args.nx,
               "ms_per_step": round(dt / args.steps * 1e3, 2),
               "gp_per_s": round(gps, 0)}
        # on-device rel-L2 vs the FIRST backend in the list (only a
        # scalar crosses the tunnel)
        if ref_out is None:
            ref_out = zt
        else:
            leaves = list(zip(jax.tree_util.tree_leaves(zt),
                              jax.tree_util.tree_leaves(ref_out)))
            num = sum(float(jnp.linalg.norm(jnp.ravel(a - b)) ** 2)
                      for a, b in leaves)
            den = sum(float(jnp.linalg.norm(jnp.ravel(b)) ** 2)
                      for _, b in leaves)
            rec["rel_l2_vs_" + args.backends[0]] = round(
                (num / max(den, 1e-300)) ** 0.5, 9)
        print(json.dumps(rec))
        sys.stdout.flush()
    if len(results) > 1 and "xla" in results:
        base = results["xla"]
        for k, v in results.items():
            if k != "xla":
                print(json.dumps({"speedup_vs_xla": {k: round(v / base, 3)}}))


if __name__ == "__main__":
    main()
