"""Model-level FFT cost breakdown at a given grid size (default 4096^2).

Each variant is a dependency-chained scan inside one jit (bare-primitive
microbenches lie on this backend — XLA folds inverse pairs and async
dispatch skews timing; CLAUDE.md). Completion forced via scalar checksum
fetch (remote-device-safe). Prints one JSON line per variant with
per-iteration milliseconds.

Usage: python scripts/fft_breakdown.py [--nx 4096] [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")


def _progress(*a):
    print(time.strftime("%H:%M:%S"), *a, file=sys.stderr)
    sys.stderr.flush()


def timed(name, fn, init, iters):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(z, n):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, z, None, length=n)
        return out

    def checksum(z):
        leaves = jax.tree_util.tree_leaves(z)
        x = leaves[0]
        # fetch a real scalar; complex-abs as the very first fetch of a
        # process has been observed to stall the tunnel for minutes
        return float(jnp.max(jnp.real(x)) + jnp.min(jnp.real(x)))

    _progress(name, "compiling")
    _ = checksum(run(init, iters))          # compile + warm-up
    _progress(name, "warm")
    t0 = time.perf_counter()
    _ = checksum(run(init, iters))
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": name, "ms_per_iter": round(dt / iters * 1e3, 3)}))
    sys.stdout.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    nx = ny = args.nx
    hny = ny // 2 + 1

    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.ops import fft

    # warm the backend with a trivial fetch first — the first fetch of a
    # process can stall for a minute+ through the tunnel
    _progress("warming backend:", float(jnp.max(jnp.zeros((8,), jnp.float32))))

    g = (nx, ny)
    zr = jnp.zeros(g, jnp.float32).at[nx // 2, ny // 2].set(1.0)
    Z = jnp.fft.rfft2(zr)
    C = jnp.fft.fft2(zr)
    _progress("inputs ready:", float(jnp.max(jnp.real(Z))))

    # 1 irfft2 + 1 rfft2 per iteration
    timed("r2c_roundtrip",
          lambda Z: jnp.fft.rfft2(jnp.fft.irfft2(Z, s=g) * 0.999), Z,
          args.iters)
    # 1 c2c ifft2 + 1 c2c fft2 per iteration
    timed("c2c_roundtrip",
          lambda C: jnp.fft.fft2(jnp.fft.ifft2(C) * 0.999), C, args.iters)
    # 1 inverse_pair (2 hermitian packs + 1 c2c ifft2) + 1 rfft2
    def pair_chain(carry):
        Za, Zb = carry
        a, b = fft.inverse_pair(Za, Zb, g)
        Znew = jnp.fft.rfft2(a - b)
        return Znew, Znew * 0.5
    timed("pair_plus_rfft2", pair_chain, (Z, Z * 0.5), args.iters)
    # hermitian pack assembly only (no transform)
    def pack_chain(carry):
        Za, Zb = carry
        c = fft._hermitian_full(Za, ny) + 1j * fft._hermitian_full(Zb, ny)
        return c[:, :hny] * 0.999, c[:, 1:hny + 1] * 0.5
    timed("hermitian_pack_only", pack_chain, (Z, Z * 0.5), args.iters)

    # two separate irfft2 + rfft2 (pairing benefit check in chained mode)
    def sep_chain(carry):
        Za, Zb = carry
        a = jnp.fft.irfft2(Za, s=g)
        b = jnp.fft.irfft2(Zb, s=g)
        Znew = jnp.fft.rfft2(a - b)
        return Znew, Znew * 0.5
    timed("separate2_plus_rfft2", sep_chain, (Z, Z * 0.5), args.iters)
    # pointwise spectral work only (mask-multiply scale)
    mask = (jnp.abs(Z) < 1.0).astype(jnp.float32)
    timed("pointwise_only", lambda Z: Z * mask * 0.999 + Z * 1e-6, Z,
          args.iters)

    # matmul-FFT variants (ops/mxu_fft.py), HIGH precision
    import jax as _jax

    from xlab_fftbarotropic_tpu.ops import mxu_fft
    mxu_fft.PRECISION = _jax.lax.Precision.HIGH

    timed("mxu_r2c_roundtrip",
          lambda Z: mxu_fft.rfft2(mxu_fft.irfft2(Z, s=g) * 0.999), Z,
          args.iters)

    def mxu_pair_chain(carry):
        Za, Zb = carry
        a, b = mxu_fft.inverse_pair(Za, Zb, g)
        Znew = mxu_fft.rfft2(a - b)
        return Znew, Znew * 0.5
    timed("mxu_pair_plus_rfft2", mxu_pair_chain, (Z, Z * 0.5), args.iters)

    mxu_fft.FOLD_DIGIT_SWAP = True
    timed("mxu_pair_swapfold", mxu_pair_chain, (Z, Z * 0.5), args.iters)
    mxu_fft.FOLD_DIGIT_SWAP = False


if __name__ == "__main__":
    main()
