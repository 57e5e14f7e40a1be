"""Hybrid/precision A/B on the barotropic RK4 core: which transforms to
run on the MXU matmul FFT vs XLA's FFT, and at what matmul precision.

Variants (all one process — tunnel session tax):
  xla        — jnp.fft forward + Hermitian-paired c2c inverses (baseline)
  mxu        — matmul FFT everywhere, Precision.HIGHEST
  mxu-high   — matmul FFT everywhere, Precision.HIGH (bf16x3)
  fwd-mxu    — matmul forward rfft2, XLA paired inverses
  inv-mxu    — XLA forward, matmul paired inverses

Usage: python scripts/ab_fft_hybrid.py [--nx 4096] [--steps 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models import barotropic as m
    from xlab_fftbarotropic_tpu.ops import fft, mxu_fft
    from xlab_fftbarotropic_tpu.ops.spectral import SpectralTables

    def progress(*a):
        print(time.strftime("%H:%M:%S"), *a, file=sys.stderr)
        sys.stderr.flush()

    progress("warming backend:", float(jnp.max(jnp.zeros((8,), jnp.float32))))

    cfg = ModelConfig(nx=args.nx, ny=args.nx)
    t = SpectralTables.from_config(cfg)
    g = cfg.grid_shape
    vort0 = makefields.gaussian(cfg)
    z0 = jnp.fft.rfft2(jnp.asarray(vort0, jnp.float32))
    src = jnp.zeros(g, jnp.float32)
    dt, nu = float(cfg.dt), float(cfg.nu)

    mxu_inv = lambda s, gs: mxu_fft.irfft2(s, s=gs)  # noqa: E731

    variants = {
        "xla": dict(fwd=fft.forward, inv=fft.inverse,
                    inv_pair=fft.inverse_pair),
        "mxu": dict(fwd=mxu_fft.rfft2, inv=mxu_inv,
                    inv_pair=mxu_fft.inverse_pair),
        "mxu-high": dict(fwd=mxu_fft.rfft2, inv=mxu_inv,
                         inv_pair=mxu_fft.inverse_pair,
                         precision=jax.lax.Precision.HIGH),
        "fwd-mxu": dict(fwd=mxu_fft.rfft2, inv=fft.inverse,
                        inv_pair=fft.inverse_pair),
        "inv-mxu": dict(fwd=fft.forward, inv=fft.inverse,
                        inv_pair=mxu_fft.inverse_pair),
    }

    results = {}
    for name, kw in variants.items():
        mxu_fft.PRECISION = kw.pop("precision", jax.lax.Precision.HIGHEST)

        @functools.partial(jax.jit, static_argnames=("n",))
        def seg(t, z, src, n, kw=kw):
            def body(c, _):
                return m.rk4_step(t, c, src, dt, nu, g, **kw), None
            out, _ = jax.lax.scan(body, z, None, length=n)
            return out

        progress(name, "compiling")
        zw = seg(t, z0, src, args.steps)
        cw = float(jnp.max(jnp.real(zw)))
        progress(name, "warm, checksum", cw)
        t0 = time.perf_counter()
        zt = seg(t, z0, src, args.steps)
        ct = float(jnp.max(jnp.real(zt)))
        el = time.perf_counter() - t0
        assert ct == cw
        results[name] = args.nx * args.nx * args.steps / el
        print(json.dumps({"variant": name,
                          "ms_per_step": round(el / args.steps * 1e3, 2),
                          "gp_per_s": round(results[name], 0),
                          "checksum": cw}))
        sys.stdout.flush()
    base = results.get("xla")
    if base:
        print(json.dumps({"speedup_vs_xla": {
            k: round(v / base, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
