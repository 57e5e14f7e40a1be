"""Forward-pair A/B on the SW XLA path (one TPU process).

The SW tendency has 5 forward transforms per RK stage; forward_pair
(ops/fft.py — rev+concat (-k mod n) map, replacing the flip+roll
formulation that hung the TPU compiler at 4096^2) packs the two flux
pairs into one complex fft2 each, 5 -> 3. This measures paired vs
unpaired ms/step at --nx (default 2048^2, where fft_backend=auto
resolves to xla) with an on-device rel-L2 cross-check.

Ascending sizes; pass --nx 2048,4096 to also compile-check larger grids
LAST so a (historically possible) compile hang cannot cost earlier
measurements.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", default="2048")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dt", type=float, default=0.75)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.shallow_water import ShallowWaterModel

    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    print(f"# warm-up fetch {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    @jax.jit
    def rel_l2(a, b):
        def r(x, y):
            return jnp.linalg.norm(jnp.ravel(x - y)) / jnp.maximum(
                jnp.linalg.norm(jnp.ravel(y)), 1e-30)
        return (r(a.zeta_hat, b.zeta_hat), r(a.div_hat, b.div_hat),
                r(a.eta_hat, b.eta_hat))

    for nx in (int(v) for v in args.nx.split(",")):
        cfg = ModelConfig(nx=nx, ny=nx, dt=args.dt, fft_backend="xla")
        outs = {}
        for paired in (False, True):
            os.environ["XFB_FORWARD_PAIR"] = "1" if paired else "0"
            os.environ["XFB_FORWARD_PAIR_MAX"] = str(nx)
            m = ShallowWaterModel.build(cfg)
            s = m.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
            t_c = time.perf_counter()
            out = m.segment(s, None, args.steps)
            c_w = float(jnp.max(jnp.abs(out.zeta_hat)))
            compile_s = time.perf_counter() - t_c
            t1 = time.perf_counter()
            out = m.segment(s, None, args.steps)
            c_t = float(jnp.max(jnp.abs(out.zeta_hat)))
            ms = (time.perf_counter() - t1) / args.steps * 1e3
            assert c_t == c_w, "nondeterministic segment"
            outs[paired] = out
            rec = {"nx": nx, "paired": paired,
                   "ms_per_step": round(ms, 2),
                   "gp_per_s": round(nx * nx / ms * 1e3, 1),
                   "checksum": c_t,
                   "compile_s": round(compile_s, 1)}
            if paired and False in outs:
                rz, rd, re_ = (float(v) for v in
                               rel_l2(outs[True], outs[False]))
                rec["rel_l2_vs_unpaired"] = {"zeta": rz, "div": rd,
                                             "eta": re_}
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
