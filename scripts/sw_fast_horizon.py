"""SW fast-transforms (split-linear) error-growth + stability soak.

One TPU process (tunnel discipline, CLAUDE.md). Run with
XFB_PALLAS_MM=default in the env. At --nx (default 4096², dt=0.75,
balanced gaussian IC):

1. Error growth: step the XLA fp32 core and the fast split-linear plane
   stepper side by side in --segment-step chunks out to --horizon steps,
   printing per-checkpoint on-device rel-L2 (zeta, eta; div is a
   near-zero balance residual, reported relative to zeta's norm) — the
   20-step 5.5e-5 / 4.3e-4 A/B numbers (BASELINE.md 2026-08-18) extended
   to a production-length horizon.
2. Stability soak: the fast model alone continues to --soak-steps,
   printing max|zeta_hat|, max|eta_hat| and wall-clock per segment —
   catches any slow bf16-noise accumulation the short A/B can't.

Only scalars cross the tunnel. One JSON line per record.
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
    ap.add_argument("--dt", type=float, default=None,
                    help="default: 0.75 for sw (gravity-wave CFL), "
                         "3.0 for barotropic")
    ap.add_argument("--model", default="sw", choices=["sw", "barotropic"])
    ap.add_argument("--segment-steps", type=int, default=20)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--soak-steps", type=int, default=2000)
    args = ap.parse_args()
    if args.dt is None:
        args.dt = 0.75 if args.model == "sw" else 3.0

    if os.environ.get("XFB_PALLAS_MM") != "default":
        raise SystemExit("run with XFB_PALLAS_MM=default")

    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields

    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    print(f"# warm-up fetch {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    if args.model == "sw":
        from xlab_fftbarotropic_tpu.models.shallow_water import (
            ShallowWaterModel)

        def build(backend):
            cfg = ModelConfig(nx=args.nx, ny=args.nx, dt=args.dt,
                              fft_backend=backend)
            m = ShallowWaterModel.build(cfg)
            s = m.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
            return m, s

        @jax.jit
        def rel(a, b):
            def r(x, y, n):
                return jnp.linalg.norm(jnp.ravel(x - y)) / jnp.maximum(
                    jnp.linalg.norm(jnp.ravel(n)), 1e-30)
            return (r(a.zeta_hat, b.zeta_hat, b.zeta_hat),
                    r(a.div_hat, b.div_hat, b.zeta_hat),
                    r(a.eta_hat, b.eta_hat, b.eta_hat))
    else:
        from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel

        class _BT:
            """Adapt the barotropic (state, src) API to the SW-shaped
            loop below (segment(s, None, n))."""

            def __init__(self, cfg):
                self.m = BarotropicModel.build(cfg)
                self.src = jnp.zeros(cfg.grid_shape, jnp.float32)

            def segment(self, s, _src, n):
                return self.m.segment(s, self.src, n)

        def build(backend):
            cfg = ModelConfig(nx=args.nx, ny=args.nx, dt=args.dt,
                              fft_backend=backend)
            m = _BT(cfg)
            return m, m.m.init_state(makefields.gaussian(cfg))

        @jax.jit
        def rel(a, b):
            r = jnp.linalg.norm(jnp.ravel(a - b)) / jnp.maximum(
                jnp.linalg.norm(jnp.ravel(b)), 1e-30)
            return (r, jnp.zeros(()), jnp.zeros(()))

    m_ref, s_ref = build("xla")
    m_fast, s_fast = build("pallas")   # MM=default => fast kernels
    n = args.segment_steps
    done = 0
    while done < args.horizon:
        s_ref = m_ref.segment(s_ref, None, n)
        s_fast = m_fast.segment(s_fast, None, n)
        done += n
        rz, rd, re_ = (float(v) for v in rel(s_fast, s_ref))
        print(json.dumps({"stage": "error_growth", "steps": done,
                          "rel_l2_zeta": rz,
                          "rel_l2_div_over_zeta_norm": rd,
                          "rel_l2_eta": re_}), flush=True)

    def zeta_of(s):
        return s.zeta_hat if hasattr(s, "zeta_hat") else s

    while done < args.soak_steps:
        t1 = time.perf_counter()
        s_fast = m_fast.segment(s_fast, None, n)
        mz = float(jnp.max(jnp.abs(zeta_of(s_fast))))   # forces completion
        dt_w = time.perf_counter() - t1
        done += n
        if done % 200 == 0 or done >= args.soak_steps:
            me = (float(jnp.max(jnp.abs(s_fast.eta_hat)))
                  if hasattr(s_fast, "eta_hat") else 0.0)
            print(json.dumps({"stage": "soak", "steps": done,
                              "max_abs_zeta_hat": mz,
                              "max_abs_eta_hat": me,
                              "ms_per_step": round(dt_w / n * 1e3, 2),
                              "finite": mz == mz and me == me}),
                  flush=True)


if __name__ == "__main__":
    main()
