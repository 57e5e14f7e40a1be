"""Fused Pallas TPU FFT pipeline for the pseudo-spectral hot path.

Why this exists: the model step at 4096^2 is entirely transform-bound
(BASELINE.md breakdown), and both XLA's FFT and the einsum four-step
(ops/mxu_fft.py) run ~5-8 HBM round-trips per transform — every stage
(matmul, twiddle, digit swap, Hermitian extension) materializes a
128 MB intermediate. These kernels keep a whole column-block pipeline
resident in VMEM, so each 1-D transform stage costs exactly one HBM read
and one HBM write, with the matmuls, twiddles, digit swaps, Hermitian
logic, and layout transposes all fused in between.

Design rules (all kernels):

* Contractions run along SUBLANES (axis 0) only — every lane (column) is
  independent through the whole pipeline, so column-blocking is trivially
  correct and out-of-bounds lane padding is harmless garbage that never
  lands (OOB writes are dropped).
* The four-step factorization n = a*b (j = j1*b + j2) is computed as two
  stacked real matmuls per complex matmul on (a, b*BM)-shaped views; the
  digit-swap and the inter-axis TRANSPOSE are folded into the output
  write (out_specs index over the transposed array), so the y-stage reads
  exactly what the x-stage wrote with no standalone transpose pass.
* complex64 never appears inside a kernel (not Mosaic-native): all data
  moves as separate (re, im) float32 planes.
* The c2r y-stage needs no Hermitian extension: with the half-spectrum
  rows p = w[0..ny/2] and their conjugates q = conj(w[1..ny/2-1]), the
  full inverse sum splits as PartialIDFT(p) + PartialDFT(q); both
  partial transforms share their final-stage matmul (one 128-wide
  contraction), and the Nyquist row reduces to a (-1)^y rank-1 update.
  The self-conjugate rows j=0, ny/2 are projected to their real part
  first — the positive-Nyquist leak guard (see ops/fft.py:_hermitian_full
  and SURVEY.md §5.3).
* A PAIR of real fields shares one complex y-stage (pack a + i*b in
  VMEM), exactly like ops/fft.py:inverse_pair but without materializing
  any full 2-D spectrum.

Transform plan (per call):

  inverse_pair(Sa, Sb):  [spectral (nx, hny) -> real (nx, ny) x2]
      KA(inv, transpose-write)   x2  : S -> w^T (hny, nx)
      KB(pair y-stage, transpose-write): w^T x2 -> a, b (nx, ny)
  rfft2(f):              [real (nx, ny) -> spectral (nx, hny)]
      KA(fwd, real-in, transpose-write): f -> F1^T (ny, nx)
      KC(fwd partial y-stage, transpose-write): F1^T -> S (nx, hny)

Every kernel is verified against numpy in interpret mode
(tests/test_pallas_fft.py) and the whole RK4 trajectory is pinned against
the jnp.fft core. Power-of-two square grids (>= 256 on hardware; the
block width is 128 lanes).

Reference: replaces the serial FFTW3f plans of
/root/reference/src/main.cpp:126-135 on the single-chip TPU hot path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# lane width of one kernel invocation's column block (Mosaic requires a
# multiple of 128 for blocked lane dims); overridable for benchmarking
# via XFB_PALLAS_BLOCK (per-process — rebuilding pallas_calls with
# changed globals in one process trips a JAX lowering-cache bug)
BLOCK = int(_os.environ.get("XFB_PALLAS_BLOCK", "128"))

# raise the scoped-VMEM budget above the 16 MB flag default: the fused
# KA pipeline's live set (in + out + matmul temps) peaks at ~16.04 MB at
# 4096^2 with BLOCK=128. 112 MB (of the v5e core's 128 MB physical
# VMEM): the ETDRK4 COMBINE+matvec epilogue's extra operands (one
# (3,3,BLOCK,hny) phi-table block + 6 z0 planes, ~16 MB at 4096^2)
# measured 101.68 MB total against the previous 100 MB cap. At 8192^2
# the loop-chunked KX+VISC(+axpy) kernel's stack measures 116.65 MB
# (compile-time scoped-vmem check), so the default rises to 120 MB via
# XFB_PALLAS_VMEM_MB — still under the 128 MB physical core VMEM.
_COMPILER_PARAMS = None


def _compiler_params():
    global _COMPILER_PARAMS
    if _COMPILER_PARAMS is None:
        mb = int(_os.environ.get("XFB_PALLAS_VMEM_MB", "122"))
        _COMPILER_PARAMS = pltpu.CompilerParams(
            vmem_limit_bytes=mb * 1024 * 1024)
    return _COMPILER_PARAMS

# matmul precision inside kernels; HIGHEST = float32-accurate;
# XFB_PALLAS_PRECISION=high selects bf16x3 for benchmarking
PRECISION = (jax.lax.Precision.HIGH
             if _os.environ.get("XFB_PALLAS_PRECISION", "") == "high"
             else jax.lax.Precision.HIGHEST)

# Kernel matmul mode (process-global, like BLOCK/PRECISION — A/B across
# processes only, CLAUDE.md lowering-cache note):
#   fp32    dot_general at PRECISION (default HIGHEST = multi-pass
#           bf16 decomposition chosen by the backend). SHIPPED DEFAULT.
#   bf16x3  3-term split-operand decomposition Th.hi + Tl.hi + Th.lo
#           (the dropped low*low term is ~2^-16 of the product): tables
#           presplit host-side in f32, data split in-kernel by the
#           Veltkamp trick, three DEFAULT-precision dots whose internal
#           f32->bf16 conversion is exact for the hi parts. Same math
#           as Precision.HIGH, which itself fails to lower through
#           Mosaic (mlir lowering-cache KeyError, BASELINE.md).
#           MEASURED AND REJECTED (2026-08-17, BASELINE.md): 11.56
#           ms/step vs fp32's 10.83 at 2048^2 planes (the in-kernel
#           Veltkamp VPU work + doubled table reads outrun the saving
#           of 3 explicit passes vs HIGHEST's decomposition), and at
#           4096^2 the presplit-table MLIR OOM-SIGKILLs the remote
#           compile helper for BOTH pipelines. Hardware accuracy is
#           excellent (2048^2 30-step checksum identical to XLA at all
#           printed digits). Kept as an opt-in probe.
#           NOTE: under CPU interpret, DEFAULT-precision dots run full
#           f32, so interpret tests check the split STRUCTURE (exact
#           decomposition, no term lost) rather than MXU rounding.
#   bf16    single bf16 matmul (~4e-3 relative) — NOT for production;
#           a speed-of-light probe of the matmul-bound share.
#   default f32 dots at Precision.DEFAULT (backend casts to bf16,
#           1 pass) — same accuracy class as bf16, probe only.
MM_MODE = _os.environ.get("XFB_PALLAS_MM", "fp32")

# Storage dtype of the INTER-KERNEL intermediate planes of the fused
# plane steppers (the KA w stacks, the KB physical fields, the forward
# y-stage planes). Every one of these links feeds matmuls that already
# round their inputs to bf16 in fast mode (MM_MODE bf16/default), so
# storing them half-width adds one more rounding of the same magnitude
# while halving that link's HBM traffic — ~22% of the barotropic step's
# total traffic and ~28% of SW's at 4096² by the BASELINE.md roofline
# count. The RK carry (state planes), the spectral tendency planes and
# every table stay float32; f32 storage is bit-identical to the
# historical pipeline (the inserted astype casts are no-ops).
#   XFB_PALLAS_STORE: auto (default) | f32 | bf16
# MEASURED ~NEUTRAL on hardware (2026-08-19, 4096² fast mode, one
# process, 30/20-step segments): barotropic 19.72 -> 19.55 ms/step
# (1.009x), SW 40.97 -> 40.72 (1.006x) — within run noise — at a small
# accuracy cost (zeta rel-L2 vs the fp32 XLA core 2.48e-5 -> 2.59e-5
# bt; 5.46e-5 -> 6.16e-5 zeta / 4.3e-4 -> 5.2e-4 eta SW). The Pallas
# pipelines block DMA with compute, so the per-block CRITICAL PATH is
# the VPU/MXU work, not the (already hidden) HBM transfers — cutting
# traffic alone buys nothing until a kernel is DMA-bound. 'auto'
# therefore resolves to f32 (simpler accuracy story at zero measured
# cost); the knob stays for DMA-bound deployments and future shapes.
# Default/'auto' never goes lossy, so fp32-HIGHEST runs keep the <1e-6
# reference-parity contract; an EXPLICIT XFB_PALLAS_STORE=bf16 wins
# over any matmul mode (a deliberate probe, like XFB_PALLAS_MM=bf16).
STORE = _os.environ.get("XFB_PALLAS_STORE", "auto")


def store_dtype():
    """Resolve the intermediate-plane storage dtype at trace time."""
    if STORE in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def _f32(x):
    """Upcast an intermediate-plane block to the f32 compute dtype
    (no-op when stores are f32)."""
    return x.astype(jnp.float32)


def _mm(lhs, rhs, dims):
    """All kernel matmuls route through here (MM_MODE switch).

    bf16x3 = the split-operand decomposition Th.rh + Tl.rh + Th.rl
    (operand x = hi + lo; the dropped lo.lo term is ~2^-16 of the
    product). Spelling, shaped by three measured remote-compile
    failures (BASELINE.md):
      * the table side comes PRE-SPLIT host-side as [Th; Tl] stacked on
        axis 0 (_presplit_lhs), and Th.rh + Tl.rh runs as ONE
        row-stacked 2r-high dot folded by a VPU row-add — a 64-row dot
        idles half the MXU's output rows, and the row slices are
        tile-aligned (no relayout);
      * the data low bits come from _split_bf16's integer mask — the
        arithmetic (x - hi)-via-upcast spelling SIGKILLs the remote
        Mosaic compile at 4096^2;
      * rejected: one dot over a 3x-concatenated CONTRACTION axis
        (sublane-concat relayouts eat the matmul saving: 13.2 ms vs
        fp32's 12.2 at 2048^2, and the compile OOMs at 4096^2), and
        Precision.HIGH itself (mlir lowering-cache KeyError).
    """
    if MM_MODE in ("bf16x3", "bf16", "default"):
        bf = jnp.bfloat16
        d = functools.partial(
            jax.lax.dot_general, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32)
        if MM_MODE == "bf16":
            return d(lhs.astype(bf), rhs.astype(bf))
        if MM_MODE == "default":
            return d(lhs, rhs, precision=jax.lax.Precision.DEFAULT)
        dd = functools.partial(d, precision=jax.lax.Precision.DEFAULT)
        # lhs is a table, presplit host-side to the f32 stack [Th; Tl]
        # (_presplit_lhs rewrites EVERY matmul-lhs table in this mode)
        r = lhs.shape[0] // 2
        th, tl = lhs[:r], lhs[r:]
        hi, lo = _veltkamp_split(rhs)
        return dd(th, hi) + (dd(tl, hi) + dd(th, lo))
    return jax.lax.dot_general(lhs, rhs, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=PRECISION)


# Veltkamp splitting constant for an 8-significant-bit (= exactly
# bf16-representable) high part: 2^16 + 1
_VELT = np.float32(65537.0)


def _veltkamp_split(x):
    """x (f32) -> (hi, lo) f32 with x = hi + lo EXACTLY, hi carrying the
    top 8 significant bits (exactly bf16-representable, so the dot's
    internal f32->bf16 conversion of hi is lossless) and |lo| <=
    2^-8 |x|.

    Pure f32 mul/sub — the only splitting spelling that survives the
    remote Mosaic compile at 2048^2 when its result feeds a second dot:
    both the arithmetic (x - bf16(x))-via-upcast chain and the integer
    mask/bitcast chain SIGKILL the helper there (bisected via debug
    probes, BASELINE.md). At 4096^2 even this spelling OOMs the helper
    (the presplit tables double the constant payload), so bf16x3 is
    2048^2-and-below only in this environment. Relies on exact
    round-to-nearest f32 ops (no fast-math in XLA/Mosaic);
    overflow-safe for |x| < 2^111."""
    c = x * _VELT
    hi = c - (c - x)
    return hi, x - hi


def _presplit_lhs(tabs, idxs):
    """In bf16x3 mode, replace each matmul-LHS table (r, k) by its
    host-side split stack [Th ; Tl] (2r, k) — kept in FLOAT32 (Th is the
    bf16 rounding of T, exactly representable in f32; Tl = T - Th) so
    the kernels contain no bf16 values at all; _mm slices the halves
    apart on the sublane axis and the DEFAULT-precision dots convert
    internally. Twiddle / alternating-sign tables (elementwise VPU
    factors) are untouched."""
    if MM_MODE != "bf16x3":
        return tabs
    import ml_dtypes
    bf = ml_dtypes.bfloat16
    f32 = np.float32
    tabs = list(tabs)
    for i in idxs:
        t = np.asarray(tabs[i])
        th = t.astype(bf).astype(f32)
        tl = (t - th).astype(f32)
        tabs[i] = np.concatenate([th, tl], axis=0)
    return tabs


# four-step stage-1 factor override (probe knob): a=128 fills the MXU's
# contraction depth on stage 1 at the cost of a 26% FLOP increase
# (a + b = 160 vs 128 at n=4096) and changes every derived block shape
# in the KA-family kernels
_SPLIT_A = int(_os.environ.get("XFB_PALLAS_SPLIT_A", "0"))


def _split(n: int) -> Tuple[int, int]:
    if n & (n - 1) or n < 16:
        raise ValueError(f"pallas FFT requires power-of-two length >= 16, "
                         f"got {n}")
    if _SPLIT_A and n % _SPLIT_A == 0 and _SPLIT_A <= n:
        return _SPLIT_A, n // _SPLIT_A
    log = n.bit_length() - 1
    a = 1 << (log - log // 2)
    return a, n // a


def _dot(lhs, rhs, dims):
    return _mm(lhs, rhs, dims)


def _cmatmul_left(fr, fi, xr, xi):
    """(fr + i fi) @ (xr + i xi) -> (re, im); plain 2-D matmuls."""
    rr = _dot(fr, xr, ((1,), (0,)))
    ri = _dot(fr, xi, ((1,), (0,)))
    ir = _dot(fi, xr, ((1,), (0,)))
    ii = _dot(fi, xi, ((1,), (0,)))
    return rr - ii, ri + ir


def _rmatmul_left(fr, fi, x):
    """(fr + i fi) @ real x -> (re, im)."""
    return _dot(fr, x, ((1,), (0,))), _dot(fi, x, ((1,), (0,)))


# ---------------------------------------------------------------------------
# KA: c2c (or r2c) DFT along axis 0, transposed write.
# in  (n, m) planes, block (n, BLOCK)
# out (m, n) planes, block (BLOCK, n)   [out[c, r] = y[r, c]]
# ---------------------------------------------------------------------------

def _ka_tables(n: int, forward: bool, scale: float = 1.0):
    a, b = _split(n)
    sign = -2j if forward else 2j
    j1 = np.arange(a)
    j2 = np.arange(b)
    f_a = np.exp(sign * np.pi * np.outer(j1, j1) / a) * scale  # [k1, j1]
    tw = np.exp(sign * np.pi * np.outer(j1, j2) / n)           # [k1, j2]
    # stage-2 matrix pre-transposed: [k2, j2]
    f_bt = np.exp(sign * np.pi * np.outer(j2, j2) / b)
    f32 = np.float32
    return _presplit_lhs(
        (f_a.real.astype(f32), f_a.imag.astype(f32),
         tw.real.astype(f32), tw.imag.astype(f32),
         f_bt.real.astype(f32), f_bt.imag.astype(f32)),
        (0, 1, 4, 5))


def _dot2(f, g):
    """Stage-2 contraction with the pre-transposed [k2, j2] matrix;
    dot_general emits (k2, k1, m) — already digit-swap order k = k1+a*k2."""
    return _mm(f, g, ((1,), (1,)))


# Loop-form kernel bodies (round-5 VERDICT item 1): the remote AOT
# compile helper's host-RAM budget scales with the per-kernel unrolled
# op-tile count, which doubles from 4096^2 to 8192^2 at fixed
# BLOCK=128 lanes (lane blocks must be 128-divisible on hardware, so
# shrinking BLOCK is not an option) — the 8192^2 Pallas compiles
# OOM-SIGKILL the helper (BASELINE.md 8192^2 entry). The round-4
# KY_ALL lesson (lax.fori_loop body -> ~5x smaller MLIR -> a
# previously-OOM 4096^2 compile FITS) generalizes: chunk each DFT
# body over the stage-1 OUTPUT digit (k1 for _four_step/_kc_body, y1
# for _kb_compute) in a fori_loop — every op inside the body shrinks
# to area/chunks and only the block load, two rotate-concats and the
# final transpose/store stay full-area. Mosaic lowers neither
# dynamic_slice nor dynamic_update_slice on VALUES, so the loop uses
# STATIC slices with rotation: each iteration consumes the first
# `rows/ch` rows of loop-carried table copies and rotates them, and
# appends its output chunk to the carry with a left-shifting concat —
# after ch iterations the chunks sit in order. Per-element contraction
# grouping is unchanged (chunks are disjoint; no accumulation), so
# results differ from the unrolled body only where the backend gemm
# re-blocks by shape (float32 round-off; bit-identical on the MXU's
# fixed contraction depth). XFB_PALLAS_CHUNKS: 0/1 = off (default),
# N = chunk count. bf16x3 presplit tables stack [Th; Tl] on the row
# axis the rotation walks, so chunking is off in that (rejected-probe)
# mode.
# XFB_PALLAS_CHUNKS: -1 (auto, default: 2 exactly at transform length
# >= 8192 — the measured fit; see the 8192^2 r5 ledger) | 0 (off) | N.
CHUNKS = int(_os.environ.get("XFB_PALLAS_CHUNKS", "-1"))
# Separate gate for the single-_four_step bodies (KA grid / KA_SW /
# KX): their unrolled form is already compile-memory-lean (one DFT) —
# the 8192^2 compile fits with them UNROLLED once the op-heavy KB/KC
# bodies chunk, and skipping the loop is faster (bt 8192^2: 96.73
# ms/step fully chunked vs 89.78 with four-steps unrolled) — while the
# fori_loop's carry+rotation buffers cost Mosaic ~15-30 MB of scoped
# stack. Default 0 = never chunk four-steps; N = chunk count.
CHUNKS_FS = int(_os.environ.get("XFB_PALLAS_CHUNKS_FS", "0"))


def _chunks_for(n: int) -> int:
    if MM_MODE == "bf16x3":
        return 0
    if CHUNKS >= 0:
        return CHUNKS
    return 2 if n >= 8192 else 0


def _chunks_fs() -> int:
    return 0 if MM_MODE == "bf16x3" else max(0, CHUNKS_FS)


def _rot(t, rows):
    """Rotate the leading axis left by `rows` (static slices only)."""
    return jnp.concatenate([t[rows:], t[:rows]], axis=0)


def _shift_append(carry, chunk, axis=1):
    """Drop the oldest chunk off the front of `axis`, append the new
    one at the back — after ch appends the carry holds the chunks in
    emission order."""
    rows = chunk.shape[axis]
    idx = [slice(None)] * carry.ndim
    idx[axis] = slice(rows, None)
    return jnp.concatenate([carry[tuple(idx)], chunk], axis=axis)


def _four_step_k1loop(xr, xi, n, m, far, fai, twr, twi, fbr, fbi,
                      ch: int):
    """_four_step with the k1 output digit chunked in a fori_loop
    (header note above)."""
    a, b = _split(n)
    ac = a // ch
    xr2 = xr.reshape(a, b * m)
    xi2 = None if xi is None else xi.reshape(a, b * m)

    def body(_, carry):
        yr, yi, fr_c, fi_c, tr_c, ti_c = carry
        fr, fi_ = fr_c[:ac], fi_c[:ac]
        if xi2 is None:
            s1r, s1i = _rmatmul_left(fr, fi_, xr2)
        else:
            s1r, s1i = _cmatmul_left(fr, fi_, xr2, xi2)
        s1r = s1r.reshape(ac, b, m)
        s1i = s1i.reshape(ac, b, m)
        tr = tr_c[:ac][:, :, None]
        ti = ti_c[:ac][:, :, None]
        hr = s1r * tr - s1i * ti
        hi = s1r * ti + s1i * tr
        rr = _dot2(fbr, hr)                     # (b, ac, m)
        ri = _dot2(fbr, hi)
        ir = _dot2(fbi, hr)
        ii = _dot2(fbi, hi)
        return (_shift_append(yr, rr - ii), _shift_append(yi, ri + ir),
                _rot(fr_c, ac), _rot(fi_c, ac), _rot(tr_c, ac),
                _rot(ti_c, ac))

    z = jnp.zeros((b, a, m), jnp.float32)
    yr, yi, *_ = jax.lax.fori_loop(
        0, ch, body, (z, z, far, fai, twr, twi))
    return yr.reshape(n, m), yi.reshape(n, m)


def _four_step(xr, xi, n, m, far, fai, twr, twi, fbr, fbi):
    """In-VMEM four-step DFT along axis 0 of (n, m) planes. xi=None for a
    real input. Returns (yr, yi) of shape (n, m)."""
    a, b = _split(n)
    ch = _chunks_fs()
    if ch > 1 and a % ch == 0:
        return _four_step_k1loop(xr, xi, n, m, far, fai, twr, twi,
                                 fbr, fbi, ch)
    if xi is None:
        s1r, s1i = _rmatmul_left(far, fai, xr.reshape(a, b * m))
    else:
        s1r, s1i = _cmatmul_left(far, fai, xr.reshape(a, b * m),
                                 xi.reshape(a, b * m))
    s1r = s1r.reshape(a, b, m)
    s1i = s1i.reshape(a, b, m)
    twr3 = twr[:, :, None]
    twi3 = twi[:, :, None]
    hr = s1r * twr3 - s1i * twi3
    hi = s1r * twi3 + s1i * twr3
    rr = _dot2(fbr, hr)
    ri = _dot2(fbr, hi)
    ir = _dot2(fbi, hr)
    ii = _dot2(fbi, hi)
    return (rr - ii).reshape(n, m), (ri + ir).reshape(n, m)


# ---------------------------------------------------------------------------
# Three-factor DFT probe (round-5 VERDICT item 7): n = a*b*c with three
# near-equal power-of-two factors (4096 = 16*16*16) cuts the per-point
# matmul work from (a+b) = 128 to (a+b+c) = 48 MACs (~2.6x less MXU
# work) at the cost of one extra twiddle+reshape stage in VMEM and a
# contraction depth of 16 (vs 64), which underfills the 128-deep MXU —
# whether the FLOP cut or the depth underfill wins is exactly what the
# hardware A/B decides. Probe scope: the grid-mode KA x-stage alone
# (XFB_PALLAS_SPLIT3=ka), the largest single kernel in the round-4
# profile. Digit algebra (j = j1*bc + j2*c + j3, k = k1 + a*k2 + ab*k3):
#   S1 contract j1: F1[k1,j1] = W^(j1*k1*bc)        (a, a)
#   T1 twiddle:     TW1[k1, j2*c+j3] = W^(k1*(j2*c+j3))
#   S2 contract j2: F2[k2,j2] = W^(j2*k2*ca)        (b, b)
#   T2 twiddle:     TW2[k2,j3] = W^(j3*k2*a)        (b, c)
#   S3 contract j3: F3[k3,j3] = W^(j3*k3*ab)        (c, c)
# with W = e^(sign*2*pi*i/n); output lands (k3, k2, k1, m) which
# reshapes to natural frequency order p = k3*ab + k2*a + k1 = k, the
# same digit-major trick the two-factor path uses.
# ---------------------------------------------------------------------------

SPLIT3 = _os.environ.get("XFB_PALLAS_SPLIT3", "")


def split3_mode() -> str:
    """'' (off, default) | 'ka' (grid-mode KA x-stage only)."""
    return "" if SPLIT3 in ("", "0") else SPLIT3


def _split3(n: int) -> Tuple[int, int, int]:
    """Three near-equal power-of-two factors, largest first."""
    if n & (n - 1) or n < 64:
        raise ValueError(f"three-factor split needs power-of-two >= 64, "
                         f"got {n}")
    log = n.bit_length() - 1
    la = (log + 2) // 3
    lb = (log - la + 1) // 2
    return 1 << la, 1 << lb, 1 << (log - la - lb)


def _ka_tables3(n: int, forward: bool, scale: float = 1.0):
    a, b, c = _split3(n)
    sign = -2j if forward else 2j
    j1 = np.arange(a)
    j2 = np.arange(b)
    j3 = np.arange(c)
    jr = np.arange(b * c)
    f1 = np.exp(sign * np.pi * np.outer(j1, j1) / a) * scale
    tw1 = np.exp(sign * np.pi * np.outer(j1, jr) / n)
    f2 = np.exp(sign * np.pi * np.outer(j2, j2) / b)
    tw2 = np.exp(sign * np.pi * np.outer(j2, j3) / (b * c))
    f3 = np.exp(sign * np.pi * np.outer(j3, j3) / c)
    f32 = np.float32
    return _presplit_lhs(
        (f1.real.astype(f32), f1.imag.astype(f32),
         tw1.real.astype(f32), tw1.imag.astype(f32),
         f2.real.astype(f32), f2.imag.astype(f32),
         tw2.real.astype(f32), tw2.imag.astype(f32),
         f3.real.astype(f32), f3.imag.astype(f32)),
        (0, 1, 4, 5, 8, 9))


def _four_step3(xr, xi, n, m, f1r, f1i, tw1r, tw1i, f2r, f2i,
                tw2r, tw2i, f3r, f3i):
    """In-VMEM three-factor DFT along axis 0 of (n, m) planes (header
    note above); same contract as _four_step."""
    a, b, c = _split3(n)
    if xi is None:
        s1r, s1i = _rmatmul_left(f1r, f1i, xr.reshape(a, b * c * m))
    else:
        s1r, s1i = _cmatmul_left(f1r, f1i, xr.reshape(a, b * c * m),
                                 xi.reshape(a, b * c * m))
    s1r = s1r.reshape(a, b * c, m)
    s1i = s1i.reshape(a, b * c, m)
    t1r = tw1r[:, :, None]
    t1i = tw1i[:, :, None]
    hr = (s1r * t1r - s1i * t1i).reshape(a, b, c * m)
    hi = (s1r * t1i + s1i * t1r).reshape(a, b, c * m)
    rr = _mm(f2r, hr, ((1,), (1,)))          # (k2, k1, c*m)
    ri = _mm(f2r, hi, ((1,), (1,)))
    ir = _mm(f2i, hr, ((1,), (1,)))
    ii = _mm(f2i, hi, ((1,), (1,)))
    g2r = (rr - ii).reshape(b, a, c, m)
    g2i = (ri + ir).reshape(b, a, c, m)
    t2r = tw2r[:, None, :, None]
    t2i = tw2i[:, None, :, None]
    h2r = g2r * t2r - g2i * t2i              # (k2, k1, j3, m)
    h2i = g2r * t2i + g2i * t2r
    rr = _mm(f3r, h2r, ((1,), (2,)))         # (k3, k2, k1, m)
    ri = _mm(f3r, h2i, ((1,), (2,)))
    ir = _mm(f3i, h2r, ((1,), (2,)))
    ii = _mm(f3i, h2i, ((1,), (2,)))
    return ((rr - ii).reshape(n, m), (ri + ir).reshape(n, m))


def _four_step_any(xr, xi, n, m, tabs):
    """Dispatch on the table tuple: 6 refs/arrays = two-factor
    (_four_step), 10 = three-factor (_four_step3)."""
    if len(tabs) == 10:
        return _four_step3(xr, xi, n, m, *tabs)
    return _four_step(xr, xi, n, m, *tabs)


def _ka_kernel(real_input: bool, n: int, *refs):
    if real_input:
        (xr_ref, far_ref, fai_ref, twr_ref, twi_ref,
         fbr_ref, fbi_ref, or_ref, oi_ref) = refs
    else:
        (xr_ref, xi_ref, far_ref, fai_ref, twr_ref, twi_ref,
         fbr_ref, fbi_ref, or_ref, oi_ref) = refs
    m = xr_ref.shape[1]
    yr, yi = _four_step(xr_ref[:], None if real_input else xi_ref[:],
                        n, m, far_ref[:], fai_ref[:], twr_ref[:],
                        twi_ref[:], fbr_ref[:], fbi_ref[:])
    # transposed write: out block is (m, n)
    or_ref[:] = yr.T
    oi_ref[:] = yi.T


def _ka_call(xr, xi, n_rows, forward, real_input, scale=1.0):
    """Apply KA to (n_rows, m) planes; returns (m, n_rows) planes.

    real_input=True transforms the single real plane xr (xi ignored)."""
    m = xr.shape[1]
    tables = [jnp.asarray(t) for t in _ka_tables(n_rows, forward, scale)]
    grid = (pl.cdiv(m, BLOCK),)
    in_spec = pl.BlockSpec((n_rows, BLOCK), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tab_spec = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for t in tables]
    out_spec = pl.BlockSpec((BLOCK, n_rows), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_ka_kernel, real_input, n_rows)
    data = (xr,) if real_input else (xr, xi)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * len(data) + tab_spec,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((m, n_rows), jnp.float32),
                   jax.ShapeDtypeStruct((m, n_rows), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*data, *tables)
    return outs


# ---------------------------------------------------------------------------
# KA4: the fused derivative x-stage. Reads zeta_hat ONCE per block and
# emits the x-stage of all four derivative spectra of the barotropic RHS
# (main.cpp:146-244) without materializing any of them in HBM:
#   dvdx = i kx * Z          dvdy = i ky * Z
#   psi  = Z * rlap   (rlap = 1/inv_lap, multiply-form inversion)
#   u    = -i ky * psi       v    = i kx * psi
# The diagonals are elementwise in VMEM (kx varies along the contraction
# rows, ky along the lanes); the four inverse transforms then run
# sequentially on the same resident block and write transposed.
# ---------------------------------------------------------------------------

def _ka4_kernel(n: int, zr_ref, zi_ref, rlap_ref, kx_ref, ky_ref,
                far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                *o_refs):
    m = zr_ref.shape[1]
    zr, zi = zr_ref[:], zi_ref[:]
    kx = kx_ref[:]                       # (n, 1)
    ky = ky_ref[:]                       # (1, m)
    rlap = rlap_ref[:]
    pr = zr * rlap
    pi = zi * rlap
    fields = (
        (-kx * zi, kx * zr),             # i kx Z
        (-ky * zi, ky * zr),             # i ky Z
        (ky * pi, -ky * pr),             # -i ky psi
        (-kx * pi, kx * pr),             # i kx psi
    )
    tabs = (far_ref[:], fai_ref[:], twr_ref[:], twi_ref[:],
            fbr_ref[:], fbi_ref[:])
    for idx, (xr, xi) in enumerate(fields):
        yr, yi = _four_step(xr, xi, n, m, *tabs)
        o_refs[2 * idx][:] = yr.T
        o_refs[2 * idx + 1][:] = yi.T


def _ka2_kernel(which: str, n: int, zr_ref, zi_ref, rlap_ref, kx_ref,
                ky_ref, far_ref, fai_ref, twr_ref, twi_ref, fbr_ref,
                fbi_ref, *o_refs):
    """Two-transform variant of KA4 ('zderiv': i kx Z, i ky Z;
    'pderiv': -i ky psi, i kx psi) — half the kernel body, for when the
    4-transform kernel overwhelms the Mosaic compiler."""
    m = zr_ref.shape[1]
    zr, zi = zr_ref[:], zi_ref[:]
    kx = kx_ref[:]
    ky = ky_ref[:]
    if which == "zderiv":
        fields = ((-kx * zi, kx * zr), (-ky * zi, ky * zr))
    else:
        rlap = rlap_ref[:]
        pr = zr * rlap
        pi = zi * rlap
        fields = ((ky * pi, -ky * pr), (-kx * pi, kx * pr))
    tabs = (far_ref[:], fai_ref[:], twr_ref[:], twi_ref[:],
            fbr_ref[:], fbi_ref[:])
    for idx, (xr, xi) in enumerate(fields):
        yr, yi = _four_step(xr, xi, n, m, *tabs)
        o_refs[2 * idx][:] = yr.T
        o_refs[2 * idx + 1][:] = yi.T


# 'grid' = one KA call with a 4-long grid dimension over fields (one
#          four-step body; the per-field diagonal is DATA — stacked
#          separable row/column factors — so there is no control flow
#          and the Mosaic compile cost matches the plain KA kernel);
# 'quad' = one 4-transform KA4 call (9-minute Mosaic compile, kept for
#          reference); 'split' = two 2-transform KA2 calls.
QUAD_MODE = "grid"

# Grid-mode KA iteration order: field-minor puts the 4-long field axis
# LAST so the state/rlap input blocks are revisited (not re-fetched)
# across the 4 field steps — in principle a 4x cut of the state+rlap
# reads (~13% of step traffic). MEASURED SLOWER on hardware (2026-08-18,
# 4096² fast mode, 30-step segments, checksums bit-identical): fmajor
# 20.18 ms/step vs fminor 21.01 (0.96x) — with f minor the output block
# jumps across the stacked field dim every grid step and the write-side
# pipelining loses more than the read-side revisiting saves. Default
# stays fmajor; probe via XFB_KA_ORDER=fminor.
KA_FIELD_MINOR = _os.environ.get("XFB_KA_ORDER", "fmajor") == "fminor"


def _ka_field_minor() -> bool:
    return KA_FIELD_MINOR


def _ka_diag_compute(n: int, zr, zi, rlap, ar, ai, br, bi, e, tabs):
    """The KA diagonal-times-four-step body: one inverse transform of
    D * Z with D = (ar + i ai)[rows] * (br + i bi)[cols] * rlap^e —
    shared by the barotropic grid-mode kernel below and the tracer
    family's stacked-state twin (ops/pallas_tracer.py:_ka6_kernel).
    Returns the TRANSPOSED mixed-domain planes (m, n)."""
    m = zr.shape[1]
    rl = 1.0 + e * (rlap - 1.0)            # rlap^e, e in {0, 1}
    t1r = zr * ar - zi * ai
    t1i = zr * ai + zi * ar
    xr = (t1r * br - t1i * bi) * rl
    xi = (t1r * bi + t1i * br) * rl
    yr, yi = _four_step_any(xr, xi, n, m, tabs)
    return yr.T, yi.T


def _ka_diag_kernel(n: int, zr_ref, zi_ref, rlap_ref,
                    ar_ref, ai_ref, br_ref, bi_ref, e_ref, *rest):
    """Grid-mode KA: the field-index grid dimension selects the stacked
    diagonal factor inputs (ar (n,1), br (1,m), e scalar). `rest` is
    the DFT table refs (6 two-factor / 10 three-factor, SPLIT3 probe)
    followed by the two output refs."""
    tabs = rest[:-2]
    owr_ref, owi_ref = rest[-2:]
    yrt, yit = _ka_diag_compute(
        n, zr_ref[:], zi_ref[:], rlap_ref[:],
        ar_ref[0], ai_ref[0], br_ref[0], bi_ref[0], e_ref[0],
        tuple(t[:] for t in tabs))
    owr_ref[0] = yrt.astype(owr_ref.dtype)
    owi_ref[0] = yit.astype(owi_ref.dtype)


def _stack_factors(kx, ky, nx, hny):
    """(Ar, Ai) (4, nx, 1), (Br, Bi) (4, 1, hny), e (4, 1, 1) float32."""
    one_r = jnp.ones((nx, 1), jnp.float32)
    zero_r = jnp.zeros((nx, 1), jnp.float32)
    one_c = jnp.ones((1, hny), jnp.float32)
    zero_c = jnp.zeros((1, hny), jnp.float32)
    kxc = kx.reshape(nx, 1)
    kyc = ky.reshape(1, hny)
    # fields: i kx Z | i ky Z | -i ky psi | i kx psi
    ar = jnp.stack([zero_r, one_r, one_r, zero_r])
    ai = jnp.stack([kxc, zero_r, zero_r, kxc])
    br = jnp.stack([one_c, zero_c, zero_c, one_c])
    bi = jnp.stack([zero_c, kyc, -kyc, zero_c])
    e = jnp.asarray([0.0, 0.0, 1.0, 1.0],
                    jnp.float32).reshape(4, 1, 1)
    return ar, ai, br, bi, e


def derivative_xstage_planes(zr: jax.Array, zi: jax.Array, kx: jax.Array,
                             ky: jax.Array, rlap: jax.Array,
                             grid_shape, store=None) -> tuple:
    """The grid-mode KA x-stage alone: ONE read of the spectral state
    planes emitting the stacked (4, hny, nx) mixed-domain planes
    (wr, wi) of (i kx Z, i ky Z, -i ky psi, i kx psi) — consumed by the
    KB pair y-stages (derivative_quad_planes) or by the fused
    KB+advection kernel (kb_adv_full / kb_adv_half). `store` is the
    output storage dtype (STORE note above; default float32)."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    tables = [jnp.asarray(t) for t in
              (_ka_tables3(nx, forward=False)
               if split3_mode() == "ka"
               else _ka_tables(nx, forward=False))]
    ar, ai, br, bi, e = _stack_factors(kx, ky, nx, hny)
    if _ka_field_minor():
        # grid (blocks, FIELDS): the field axis is MINOR, so the
        # (zr, zi, rlap) block index is unchanged across the 4
        # consecutive field steps and the Pallas pipeline skips the
        # re-fetch (block revisiting) — the state+rlap HBM reads
        # drop 4x (~13% of the 4096² step's total traffic,
        # BASELINE.md roofline entry). Bit-identical output order.
        def _f(a, b):          # raw grid args (i, f) -> (f, i)
            return b, a
    else:
        def _f(a, b):          # raw grid args (f, i) -> (f, i)
            return a, b
    rvec_spec = pl.BlockSpec(
        (1, nx, 1), lambda a, b: (_f(a, b)[0], 0, 0),
        memory_space=pltpu.VMEM)
    cvec_spec = pl.BlockSpec(
        (1, 1, BLOCK), lambda a, b: (_f(a, b)[0], 0, _f(a, b)[1]),
        memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec(
        (1, 1, 1), lambda a, b: (_f(a, b)[0], 0, 0),
        memory_space=pltpu.VMEM)
    g2 = ((pl.cdiv(hny, BLOCK), 4) if _ka_field_minor()
          else (4, pl.cdiv(hny, BLOCK)))
    sp2 = pl.BlockSpec((nx, BLOCK), lambda a, b: (0, _f(a, b)[1]),
                       memory_space=pltpu.VMEM)
    t2 = [pl.BlockSpec(t.shape, lambda a, b: (0, 0),
                       memory_space=pltpu.VMEM) for t in tables]
    ow_spec = pl.BlockSpec(
        (1, BLOCK, nx), lambda a, b: (_f(a, b)[0], _f(a, b)[1], 0),
        memory_space=pltpu.VMEM)
    sd = store if store is not None else jnp.float32
    return pl.pallas_call(
        functools.partial(_ka_diag_kernel, nx),
        grid=g2,
        in_specs=[sp2, sp2, sp2, rvec_spec, rvec_spec, cvec_spec,
                  cvec_spec, e_spec] + t2,
        out_specs=(ow_spec, ow_spec),
        out_shape=(jax.ShapeDtypeStruct((4, hny, nx), sd),
                   jax.ShapeDtypeStruct((4, hny, nx), sd)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(zr, zi, rlap, ar, ai, br, bi, e, *tables)


def derivative_quad_planes(zr: jax.Array, zi: jax.Array, kx: jax.Array,
                           ky: jax.Array, rlap: jax.Array,
                           grid_shape, ymajor: bool = False) -> tuple:
    """(zeta_x, zeta_y, u, v) physical fields from the spectral state
    PLANES in one fused pipeline: KA4 (one read of the state) + 2x KB
    pair y-stages.

    kx: (nx,) signed wavenumbers; ky: (hny,) half-axis wavenumbers;
    rlap: (nx, hny) reciprocal inverse-Laplacian table (SpectralTables).
    ymajor=True returns the fields (ny, nx) y-major — the free layout
    flip (KB's folded write) feeding the y-first forward pipeline;
    supported in QUAD_MODE 'grid' only.
    """
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    scale = 1.0 / (nx * ny)
    tables = [jnp.asarray(t) for t in _ka_tables(nx, forward=False)]
    grid = (pl.cdiv(hny, BLOCK),)
    spec_in = pl.BlockSpec((nx, BLOCK), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    kx_spec = pl.BlockSpec((nx, 1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    ky_spec = pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tab_spec = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for t in tables]
    out_spec = pl.BlockSpec((BLOCK, nx), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    args = (zr, zi, rlap, kx.reshape(nx, 1), ky.reshape(1, hny), *tables)
    in_specs = [spec_in] * 3 + [kx_spec, ky_spec] + tab_spec
    if QUAD_MODE == "grid":
        wr, wi = derivative_xstage_planes(zr, zi, kx, ky, rlap,
                                          grid_shape)
        dvdx, dvdy = _kb_call_stacked(wr, wi, 0, 1, ny, scale,
                                      transpose_out=not ymajor)
        u, v = _kb_call_stacked(wr, wi, 2, 3, ny, scale,
                                transpose_out=not ymajor)
        return dvdx, dvdy, u, v
    if ymajor:
        raise NotImplementedError("ymajor requires QUAD_MODE='grid'")
    if QUAD_MODE == "quad":
        w = pl.pallas_call(
            functools.partial(_ka4_kernel, nx),
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec,) * 8,
            out_shape=tuple(jax.ShapeDtypeStruct((hny, nx), jnp.float32)
                            for _ in range(8)),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(*args)
    else:
        w = ()
        for which in ("zderiv", "pderiv"):
            w = w + pl.pallas_call(
                functools.partial(_ka2_kernel, which, nx),
                grid=grid,
                in_specs=in_specs,
                out_specs=(out_spec,) * 4,
                out_shape=tuple(
                    jax.ShapeDtypeStruct((hny, nx), jnp.float32)
                    for _ in range(4)),
                interpret=_interpret(),
                compiler_params=_compiler_params(),
            )(*args)
    dvdx, dvdy = _kb_call((w[0], w[1]), (w[2], w[3]), ny, scale)
    u, v = _kb_call((w[4], w[5]), (w[6], w[7]), ny, scale)
    return dvdx, dvdy, u, v


def derivative_quad(zeta_hat: jax.Array, kx: jax.Array, ky: jax.Array,
                    rlap: jax.Array, grid_shape) -> tuple:
    """Complex-state wrapper around derivative_quad_planes."""
    return derivative_quad_planes(jnp.real(zeta_hat), jnp.imag(zeta_hat),
                                  kx, ky, rlap, grid_shape)


# ---------------------------------------------------------------------------
# KB: paired c2r y-stage. Inputs are the TRANSPOSED mixed-domain planes
# w^T (hny, nx) for two fields; output the two real (nx, ny) fields —
# the write is transposed back, so out rows are physical x.
#
# Math (per lane = one physical x column, contracting spectral rows):
#   out = sum_{j=0}^{ny-1} full[j] e^{+2 pi i j y / ny}
# with full[j] = p[j] (j <= ny/2), conj(p[ny-j]) mirrored above, done as
#   PartialIDFT_{j in [0, 2048)}(p) + PartialDFT_{j in [0, 2048)}(q)
#   + p[ny/2] * (-1)^y
# where q[0] = 0, q[j] = conj(p[j]); p packs the two fields a + i b.
# Digit split j = j1 + (ny/64) ... concretely j = j1 + A*j2 with A = 64,
# j2 in [0, B2=2048/A); output y = y1 + 64*y2 (y1 in [64], y2 in [ny/64]):
#   stage A: contract j2 with E1[y1, j2] = e^(s 2 pi i j2 y1 / 64)
#   twiddle: TW[y1, j1] = e^(s 2 pi i j1 y1 / ny)
#   stage C: contract j1 (p and q merged: 2*64 wide) with
#            E2[y2, j1] = e^(s 2 pi i j1 y2 / (ny/64))
# ---------------------------------------------------------------------------

def _kb_split(ny: int) -> Tuple[int, int, int]:
    """(A, M, b2): spectral digits j = j1 + A*j2 (j1 in [A], j2 in [b2]),
    output digits y = y1 + M*y2 (y1 in [M], y2 in [A]); M = ny/A is even
    for every power-of-two ny > A, which the (-1)^y = (-1)^y1 Nyquist
    shortcut relies on."""
    half = ny // 2
    a = min(64, half)
    return a, ny // a, half // a


def _kb_tables(ny: int, scale: float):
    """Tables for the merged p/q partial transforms (inverse sign for p,
    forward sign for q), with the 1/(nx*ny) normalization folded in."""
    a, m_dig, b2 = _kb_split(ny)
    j1 = np.arange(a)
    j2 = np.arange(b2)
    y1 = np.arange(m_dig)
    y2 = np.arange(a)
    out = {}
    for name, sign in (("p", 2j), ("q", -2j)):
        # e^(s 2 pi i j2 y1 A / ny), e^(s 2 pi i j1 y1 / ny),
        # e^(s 2 pi i j1 y2 M / ny) = e^(s 2 pi i j1 y2 / A)
        e1 = np.exp(sign * np.pi * np.outer(y1, j2) * a / ny)   # [y1, j2]
        tw = np.exp(sign * np.pi * np.outer(y1, j1) / ny)       # [y1, j1]
        e2 = np.exp(sign * np.pi * np.outer(y2, j1) / a)        # [y2, j1]
        out[name] = (e1, tw, e2)
    f32 = np.float32
    tabs = []
    for name in ("p", "q"):
        e1, tw, e2 = out[name]
        tabs += [e1.real.astype(f32), e1.imag.astype(f32),
                 tw.real.astype(f32), tw.imag.astype(f32)]
    # merged stage-C matrix [y2, 2*A]: p block then q block, scaled
    e2cat = np.concatenate([out["p"][2], out["q"][2]], axis=1) * scale
    tabs += [e2cat.real.astype(f32), e2cat.imag.astype(f32)]
    # (-1)^y depends only on y1 (M even); fold scale in
    alt = ((-1.0) ** y1 * scale).astype(f32).reshape(m_dig, 1)
    tabs.append(alt)
    return _presplit_lhs(tabs, (0, 1, 4, 5, 8, 9))


def _kb_body(ny: int, war, wai, wbr, wbi,
             e1pr_ref, e1pi_ref, twpr_ref, twpi_ref,
             e1qr_ref, e1qi_ref, twqr_ref, twqi_ref,
             e2r_ref, e2i_ref, alt_ref,
             oa_ref, ob_ref, transpose_out: bool = True):
    """Shared KB body; inputs are the (ny/2+1, m) mixed-domain plane
    ARRAYS (already loaded/sliced by the wrapping kernel).
    transpose_out=False writes the physical block y-major ((ny, m)
    instead of (m, ny)) — the layout the y-first forward pipeline reads,
    making the layout flip free (the transpose was only ever a fold into
    this write)."""
    outr, outi = _kb_compute(
        ny, war, wai, wbr, wbi, e1pr_ref, e1pi_ref, twpr_ref, twpi_ref,
        e1qr_ref, e1qi_ref, twqr_ref, twqi_ref, e2r_ref, e2i_ref, alt_ref)
    if transpose_out:
        oa_ref[:] = outr.T.astype(oa_ref.dtype)
        ob_ref[:] = outi.T.astype(ob_ref.dtype)
    else:
        oa_ref[:] = outr.astype(oa_ref.dtype)
        ob_ref[:] = outi.astype(ob_ref.dtype)


def _kb_compute(ny: int, war, wai, wbr, wbi,
                e1pr_ref, e1pi_ref, twpr_ref, twpi_ref,
                e1qr_ref, e1qi_ref, twqr_ref, twqi_ref,
                e2r_ref, e2i_ref, alt_ref):
    """The KB pair c2r y-stage math, returning the two physical field
    ARRAYS y-major (ny, m) — shared by the writing wrapper (_kb_body)
    and the fused KB+advection kernels that consume the fields in VMEM
    without ever writing them to HBM."""
    a, _m_dig, b2 = _kb_split(ny)
    m = war.shape[1]
    half = ny // 2

    # project self-conjugate rows to their real part (leak guard)
    zero_rows = jax.lax.broadcasted_iota(jnp.int32, (half + 1, 1), 0)
    selfconj = (zero_rows == 0) | (zero_rows == half)
    wai = jnp.where(selfconj, 0.0, wai)
    wbi = jnp.where(selfconj, 0.0, wbi)

    # pack: p = wa + i wb ; q = conj(wa) + i conj(wb), q[0] = 0
    p_r = war - wbi
    p_i = wai + wbr
    q_r = war + wbi
    q_i = wbr - wai
    row = zero_rows
    q_r = jnp.where(row == 0, 0.0, q_r)
    q_i = jnp.where(row == 0, 0.0, q_i)

    def partial_stageA(cr3, ci3, e1r, e1i, twr, twi, rows):
        # rows [0, half) as (b2, a, m): j = j1 + a*j2 -> natural reshape
        gr, gi = _cmatmul_left(e1r, e1i, cr3, ci3)     # [y1, a*m]
        gr = gr.reshape(rows, a, m)
        gi = gi.reshape(rows, a, m)
        twr3 = twr[:, :, None]
        twi3 = twi[:, :, None]
        return gr * twr3 - gi * twi3, gr * twi3 + gi * twr3  # [y1, j1, m]

    pr3 = p_r[0:half, :].reshape(b2, a * m)
    pi3 = p_i[0:half, :].reshape(b2, a * m)
    qr3 = q_r[0:half, :].reshape(b2, a * m)
    qi3 = q_i[0:half, :].reshape(b2, a * m)
    e2r = e2r_ref[:]
    e2i = e2i_ref[:]
    y2n = e2r.shape[0]
    pnr = p_r[half, :][None, None, :]
    pni = p_i[half, :][None, None, :]

    def stage_rest(e1p, e1q, twp, twq, alt, rows):
        """stage A (both p/q halves) + merged stage C + the Nyquist
        rank-1 update for `rows` y1 digits — the shared body of the
        full and loop-chunked paths (bit-identical grouping)."""
        hpr, hpi = partial_stageA(pr3, pi3, *e1p, *twp, rows)
        hqr, hqi = partial_stageA(qr3, qi3, *e1q, *twq, rows)
        hr = jnp.concatenate([hpr, hqr], axis=1)       # [y1, 128, m]
        hi = jnp.concatenate([hpi, hqi], axis=1)
        # merged stage C: contract the 128-wide j1 axis with E2cat
        rr = _dot2(e2r, hr)                            # [y2, y1, m]
        ri = _dot2(e2r, hi)
        ir = _dot2(e2i, hr)
        ii = _dot2(e2i, hi)
        # Nyquist rank-1 update: + p[half] * (-1)^y, (-1)^y = alt[y1]
        outr = rr - ii + alt[None, :, :] * pnr
        outi = ri + ir + alt[None, :, :] * pni
        return outr, outi

    ch = _chunks_for(ny)
    if ch > 1 and _m_dig % ch == 0:
        yc = _m_dig // ch

        def body(_, carry):
            (outr, outi, e1pr, e1pi, e1qr, e1qi, twpr, twpi, twqr,
             twqi, alt) = carry
            cr, ci = stage_rest(
                (e1pr[:yc], e1pi[:yc]), (e1qr[:yc], e1qi[:yc]),
                (twpr[:yc], twpi[:yc]), (twqr[:yc], twqi[:yc]),
                alt[:yc], yc)
            return (_shift_append(outr, cr), _shift_append(outi, ci),
                    _rot(e1pr, yc), _rot(e1pi, yc), _rot(e1qr, yc),
                    _rot(e1qi, yc), _rot(twpr, yc), _rot(twpi, yc),
                    _rot(twqr, yc), _rot(twqi, yc), _rot(alt, yc))

        z = jnp.zeros((y2n, _m_dig, m), jnp.float32)
        outr, outi, *_ = jax.lax.fori_loop(
            0, ch, body,
            (z, z, e1pr_ref[:], e1pi_ref[:], e1qr_ref[:], e1qi_ref[:],
             twpr_ref[:], twpi_ref[:], twqr_ref[:], twqi_ref[:],
             alt_ref[:]))
    else:
        outr, outi = stage_rest(
            (e1pr_ref[:], e1pi_ref[:]), (e1qr_ref[:], e1qi_ref[:]),
            (twpr_ref[:], twpi_ref[:]), (twqr_ref[:], twqi_ref[:]),
            alt_ref[:], _m_dig)

    # y = y1 + 64*y2: (y2, y1) flatten order
    return outr.reshape(ny, m), outi.reshape(ny, m)


def _kb_kernel(ny: int, war_ref, wai_ref, wbr_ref, wbi_ref, *rest):
    half = ny // 2
    _kb_body(ny, war_ref[0:half + 1, :], wai_ref[0:half + 1, :],
             wbr_ref[0:half + 1, :], wbi_ref[0:half + 1, :], *rest)


def _kb_kernel_stacked(ny: int, transpose_out: bool,
                       wr_a_ref, wi_a_ref, wr_b_ref, wi_b_ref, *rest):
    """KB over two fields of the STACKED (4, hny, nx) quad output; the
    leading field index is pinned by the BlockSpec index_map."""
    half = ny // 2
    _kb_body(ny, _f32(wr_a_ref[0, 0:half + 1, :]),
             _f32(wi_a_ref[0, 0:half + 1, :]),
             _f32(wr_b_ref[0, 0:half + 1, :]),
             _f32(wi_b_ref[0, 0:half + 1, :]),
             *rest, transpose_out=transpose_out)


def _kb_call(wat, wbt, ny: int, scale: float):
    """wat/wbt: ((hny, nx) re, im) plane pairs. Returns a, b (nx, ny)."""
    war, wai = wat
    wbr, wbi = wbt
    hny, nx = war.shape
    tables = [jnp.asarray(t) for t in _kb_tables(ny, scale)]
    grid = (pl.cdiv(nx, BLOCK),)
    in_spec = pl.BlockSpec((hny, BLOCK), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tab_spec = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for t in tables]
    out_spec = pl.BlockSpec((BLOCK, ny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kb_kernel, ny),
        grid=grid,
        in_specs=[in_spec] * 4 + tab_spec,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nx, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nx, ny), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(war, wai, wbr, wbi, *tables)
    return outs


def _kb_call_stacked(wr, wi, fa: int, fb: int, ny: int, scale: float,
                     transpose_out: bool = True, store=None):
    """KB reading fields fa, fb directly out of the stacked (4, hny, nx)
    quad output — no slicing copy; the field index is pinned in the
    BlockSpec index_map. Returns a, b (nx, ny) — or (ny, nx) y-major
    with transpose_out=False (free: the flip is just the write fold).
    `store` sets the output storage dtype (STORE note; default f32)."""
    _, hny, nx = wr.shape
    tables = [jnp.asarray(t) for t in _kb_tables(ny, scale)]
    grid = (pl.cdiv(nx, BLOCK),)

    def fspec(f):
        return pl.BlockSpec((1, hny, BLOCK), lambda i, f=f: (f, 0, i),
                            memory_space=pltpu.VMEM)
    tab_spec = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for t in tables]
    if transpose_out:
        out_spec = pl.BlockSpec((BLOCK, ny), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        oshape = (nx, ny)
    else:
        out_spec = pl.BlockSpec((ny, BLOCK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        oshape = (ny, nx)
    sd = store if store is not None else jnp.float32
    return pl.pallas_call(
        functools.partial(_kb_kernel_stacked, ny, transpose_out),
        grid=grid,
        in_specs=[fspec(fa), fspec(fa), fspec(fb), fspec(fb)] + tab_spec,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct(oshape, sd),
                   jax.ShapeDtypeStruct(oshape, sd)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(wr, wi, wr, wi, *tables)


# ---------------------------------------------------------------------------
# KB_ADV: the fused inverse-to-tendency y-stage. One kernel runs the KB
# pair c2r y-stage for BOTH derivative pairs ((zeta_x, zeta_y) and
# (u, v)), forms the advection product -u*zx - v*zy + S in VMEM, and
# immediately runs the REAL-input partial y r2c (_kc_body) — the four
# physical fields NEVER land in HBM. Replaces 2x KB + KY_adv per RK
# stage: at 4096^2 that deletes ~536 MB of HBM traffic per stage (KB's
# 268 MB of physical-field writes + KY_adv's 268 MB of re-reads), ~24%
# of the plane stepper's 9.0 GB/step (BASELINE.md roofline entry).
# 'half' variant fuses only the (u, v) pair (zx, zy still materialize):
# half the traffic saving, a much smaller kernel body for Mosaic.
# ---------------------------------------------------------------------------

# XFB_BT_FUSEKB: 'auto' (default) / '0' / 'half' / 'full'. Hardware A/B
# at 4096^2, 30-step segments, checksums identical (2026-08-19):
#   fast mode (MM=default):  unfused 20.09 ms/step | half 19.56 (1.027x,
#                            ADOPTED) | full 20.42 (0.98x, rejected —
#                            the 2xKB+KC mega-body's per-block pipeline
#                            stalls outweigh its extra traffic saving)
#   fp32 HIGHEST:            unfused 42.80 | half 42.93 (neutral: the
#                            step is matmul-pass-bound there, so the
#                            traffic cut doesn't show; default stays off
#                            to keep the pinned fp32 ledger numbers)
# 'auto' therefore resolves to 'half' exactly when the kernel matmuls
# are in fast mode, mirroring pallas_sw.split_linear's gate.
FUSEKB = _os.environ.get("XFB_BT_FUSEKB", "auto")


def fusekb_mode() -> str:
    if FUSEKB == "auto":
        return "half" if MM_MODE in ("bf16", "default") else ""
    return "" if FUSEKB in ("", "0") else FUSEKB


def _kb_adv_full_kernel(ny: int, beta: float, *refs):
    (w0r, w0i, w1r, w1i, w2r, w2i, w3r, w3i, src_ref) = refs[:9]
    kb = refs[9:20]
    kc = refs[20:26]
    or_ref, oi_ref = refs[26:]
    half = ny // 2

    def fld(r):
        return _f32(r[0, 0:half + 1, :])

    zx, zy = _kb_compute(ny, fld(w0r), fld(w0i), fld(w1r), fld(w1i), *kb)
    u, v = _kb_compute(ny, fld(w2r), fld(w2i), fld(w3r), fld(w3i), *kb)
    if beta != 0.0:
        zy = zy + beta
    adv = -(u * zx) - v * zy + src_ref[:]
    yr, yi = _kc_body(ny, adv, None, kc[0][:], kc[1][:], kc[2][:],
                      kc[3][:], kc[4][:], kc[5][:])
    or_ref[:] = yr.T.astype(or_ref.dtype)
    oi_ref[:] = yi.T.astype(oi_ref.dtype)


def _kb_adv_half_kernel(ny: int, beta: float, *refs):
    (zx_ref, zy_ref, w2r, w2i, w3r, w3i, src_ref) = refs[:7]
    kb = refs[7:18]
    kc = refs[18:24]
    or_ref, oi_ref = refs[24:]
    half = ny // 2

    def fld(r):
        return _f32(r[0, 0:half + 1, :])

    u, v = _kb_compute(ny, fld(w2r), fld(w2i), fld(w3r), fld(w3i), *kb)
    zy = _f32(zy_ref[:]) + beta if beta != 0.0 else _f32(zy_ref[:])
    adv = -(u * _f32(zx_ref[:])) - v * zy + src_ref[:]
    yr, yi = _kc_body(ny, adv, None, kc[0][:], kc[1][:], kc[2][:],
                      kc[3][:], kc[4][:], kc[5][:])
    or_ref[:] = yr.T.astype(or_ref.dtype)
    oi_ref[:] = yi.T.astype(oi_ref.dtype)


def _kb_adv_specs(ny: int, kb_tables, kc_tables):
    hny = ny // 2 + 1

    def fspec(f):
        return pl.BlockSpec((1, hny, BLOCK), lambda i, f=f: (f, 0, i),
                            memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((ny, BLOCK), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    tab_spec = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for t in list(kb_tables) + list(kc_tables)]
    row_spec = pl.BlockSpec((BLOCK, hny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return fspec, y_spec, tab_spec, row_spec


def kb_adv_full(wr, wi, src, grid_shape, beta: float = 0.0, store=None):
    """Stacked quad output (4, hny, nx) planes + y-major src (ny, nx)
    -> forward y-stage tendency planes (nx, hny): 2x KB + advection +
    real partial y r2c in ONE kernel (bit-identical to the composed
    _kb_call_stacked x2 + KY_adv pipeline)."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    scale = 1.0 / (nx * ny)
    kb_tables = [jnp.asarray(t) for t in _kb_tables(ny, scale)]
    kc_tables = [jnp.asarray(t) for t in _kc_tables(ny)]
    fspec, y_spec, tab_spec, row_spec = _kb_adv_specs(
        ny, kb_tables, kc_tables)
    plane = jax.ShapeDtypeStruct(
        (nx, hny), store if store is not None else jnp.float32)
    return pl.pallas_call(
        functools.partial(_kb_adv_full_kernel, ny, float(beta)),
        grid=(pl.cdiv(nx, BLOCK),),
        in_specs=[fspec(0), fspec(0), fspec(1), fspec(1),
                  fspec(2), fspec(2), fspec(3), fspec(3), y_spec]
        + tab_spec,
        out_specs=(row_spec, row_spec),
        out_shape=(plane, plane),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(wr, wi, wr, wi, wr, wi, wr, wi, src, *kb_tables, *kc_tables)


def kb_adv_half(zx, zy, wr, wi, src, grid_shape, beta: float = 0.0,
                store=None):
    """Half fusion: zx, zy arrive y-major from a materialized KB pair;
    the (u, v) KB pair + advection + y r2c run fused."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    scale = 1.0 / (nx * ny)
    kb_tables = [jnp.asarray(t) for t in _kb_tables(ny, scale)]
    kc_tables = [jnp.asarray(t) for t in _kc_tables(ny)]
    fspec, y_spec, tab_spec, row_spec = _kb_adv_specs(
        ny, kb_tables, kc_tables)
    plane = jax.ShapeDtypeStruct(
        (nx, hny), store if store is not None else jnp.float32)
    return pl.pallas_call(
        functools.partial(_kb_adv_half_kernel, ny, float(beta)),
        grid=(pl.cdiv(nx, BLOCK),),
        in_specs=[y_spec, y_spec, fspec(2), fspec(2), fspec(3), fspec(3),
                  y_spec] + tab_spec,
        out_specs=(row_spec, row_spec),
        out_shape=(plane, plane),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(zx, zy, wr, wi, wr, wi, src, *kb_tables, *kc_tables)


# ---------------------------------------------------------------------------
# KC: forward partial y-stage. Input: F1^T (ny, nx) planes (x already
# transformed, rows = physical y). Output: half-spectrum (nx, hny) planes
# (transposed write). Rows k = k1 + 64*k2 computed for k <= ny/2 only:
# full stage A/twiddle (64 x 64 digits), stage C restricted to
# k2 in [0, B2] plus the explicit Nyquist row.
# ---------------------------------------------------------------------------

def _kc_tables(ny: int):
    a = 64                      # k1 digit
    b = ny // a                 # j2 digit of the INPUT split j = j1*b + j2
    # forward: X[k] = sum_j x[j] e^(-2 pi i j k / ny); four-step with
    # j = j1*b + j2: stage1 contract j1 (F_a[k1, j1], a x a), twiddle
    # [k1, j2], stage2 contract j2 restricted to k2 rows [0, ny/(2a)]
    j1 = np.arange(a)
    j2 = np.arange(b)
    k2 = np.arange(b // 2 + 1)
    f_a = np.exp(-2j * np.pi * np.outer(j1, j1) / a)
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / ny)
    f_bt = np.exp(-2j * np.pi * np.outer(k2, j2) / b)   # [k2_half, j2]
    f32 = np.float32
    return _presplit_lhs(
        (f_a.real.astype(f32), f_a.imag.astype(f32),
         tw.real.astype(f32), tw.imag.astype(f32),
         f_bt.real.astype(f32), f_bt.imag.astype(f32)),
        (0, 1, 4, 5))


def _kc_body(ny: int, xr, xi, far, fai, twr, twi, fbr, fbi):
    """Partial forward y four-step of (ny, m) ARRAYS -> (hny, m) rows
    k in [0, ny/2] (digit order k = k1 + 64*k2, stage 2 restricted to
    the (b/2+1) k2-blocks). xi=None for REAL input, which halves stage 1
    (_rmatmul_left) — the building block of the y-first forward pipeline
    where the r2c runs along the halved axis FIRST so every later stage
    touches only hny columns."""
    a = 64
    b = ny // a
    m = xr.shape[1]
    hk2 = b // 2 + 1
    xr2 = xr.reshape(a, b * m)
    xi2 = None if xi is None else xi.reshape(a, b * m)

    def stage_rest(fr, fi_, tr, ti, rows):
        if xi2 is None:
            s1r, s1i = _rmatmul_left(fr, fi_, xr2)
        else:
            s1r, s1i = _cmatmul_left(fr, fi_, xr2, xi2)
        s1r = s1r.reshape(rows, b, m)
        s1i = s1i.reshape(rows, b, m)
        tr3 = tr[:, :, None]
        ti3 = ti[:, :, None]
        hr = s1r * tr3 - s1i * ti3
        hi = s1r * ti3 + s1i * tr3
        rr = _dot2(fbr, hr)                     # [k2_half, k1, m]
        ri = _dot2(fbr, hi)
        ir = _dot2(fbi, hr)
        ii = _dot2(fbi, hi)
        return rr - ii, ri + ir

    ch = _chunks_for(ny)
    if ch > 1 and a % ch == 0:
        ac = a // ch

        def body(_, carry):
            yr, yi, fr_c, fi_c, tr_c, ti_c = carry
            cr, ci = stage_rest(fr_c[:ac], fi_c[:ac], tr_c[:ac],
                                ti_c[:ac], ac)
            return (_shift_append(yr, cr), _shift_append(yi, ci),
                    _rot(fr_c, ac), _rot(fi_c, ac), _rot(tr_c, ac),
                    _rot(ti_c, ac))

        z = jnp.zeros((hk2, a, m), jnp.float32)
        yr3, yi3, *_ = jax.lax.fori_loop(
            0, ch, body, (z, z, far, fai, twr, twi))
    else:
        yr3, yi3 = stage_rest(far, fai, twr, twi, a)
    yr = yr3.reshape(hk2 * a, m)                # rows k = k1 + a*k2
    yi = yi3.reshape(hk2 * a, m)
    # keep rows [0, ny/2]: the (b/2+1) k2-blocks cover k up to
    # a*(b/2+1)-1 = ny/2 + 63; the slice keeps the first hny rows
    return yr[0:ny // 2 + 1, :], yi[0:ny // 2 + 1, :]


def _kc_kernel(ny: int, xr_ref, xi_ref,
               far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
               or_ref, oi_ref):
    yr, yi = _kc_body(ny, xr_ref[:], xi_ref[:], far_ref[:], fai_ref[:],
                      twr_ref[:], twi_ref[:], fbr_ref[:], fbi_ref[:])
    or_ref[:] = yr.T
    oi_ref[:] = yi.T


def _kc_call(xt, ny: int):
    xr, xi = xt
    nrows, nx = xr.shape
    hny = ny // 2 + 1
    tables = [jnp.asarray(t) for t in _kc_tables(ny)]
    grid = (pl.cdiv(nx, BLOCK),)
    in_spec = pl.BlockSpec((ny, BLOCK), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tab_spec = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for t in tables]
    out_spec = pl.BlockSpec((BLOCK, hny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kc_kernel, ny),
        grid=grid,
        in_specs=[in_spec, in_spec] + tab_spec,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nx, hny), jnp.float32),
                   jax.ShapeDtypeStruct((nx, hny), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xr, xi, *tables)
    return outs


# ---------------------------------------------------------------------------
# KA_adv: fused advection product + forward x-stage. Reads the four
# derivative fields and the forcing, forms the RHS product
# -u*zeta_x - v*zeta_y + S (main.cpp:225-227) in VMEM, and immediately
# runs the real-input forward x-stage with a transposed write — the
# physical-space tendency never lands in HBM.
# ---------------------------------------------------------------------------

def _ka_adv_kernel(n: int, beta: float, u_ref, zx_ref, v_ref, zy_ref,
                   src_ref,
                   far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                   or_ref, oi_ref):
    m = u_ref.shape[1]
    zy = zy_ref[:] + beta if beta != 0.0 else zy_ref[:]
    adv = -(u_ref[:] * zx_ref[:]) - v_ref[:] * zy + src_ref[:]
    yr, yi = _four_step(adv, None, n, m, far_ref[:], fai_ref[:],
                        twr_ref[:], twi_ref[:], fbr_ref[:], fbi_ref[:])
    or_ref[:] = yr.T
    oi_ref[:] = yi.T


# ---------------------------------------------------------------------------
# KC_visc: forward partial y-stage + spectral epilogue. On top of KC's
# half-spectrum output it adds the spectral viscosity of the CURRENT
# stage state (nu * lap * Z, main.cpp:240-243) and applies the dealias
# mask (main.cpp:296-306) — the un-dealiased tendency spectrum never
# lands in HBM. Emits (re, im) planes.
# ---------------------------------------------------------------------------

def _kc_visc_kernel(ny: int, nu: float, xr_ref, xi_ref,
                    lap_ref, mask_ref, zr_ref, zi_ref,
                    far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                    or_ref, oi_ref):
    a = 64
    b = ny // a
    m = xr_ref.shape[1]
    hk2 = b // 2 + 1
    xr = xr_ref[:].reshape(a, b * m)
    xi = xi_ref[:].reshape(a, b * m)
    s1r, s1i = _cmatmul_left(far_ref[:], fai_ref[:], xr, xi)
    s1r = s1r.reshape(a, b, m)
    s1i = s1i.reshape(a, b, m)
    twr = twr_ref[:][:, :, None]
    twi = twi_ref[:][:, :, None]
    hr = s1r * twr - s1i * twi
    hi = s1r * twi + s1i * twr
    rr = _dot2(fbr_ref[:], hr)
    ri = _dot2(fbr_ref[:], hi)
    ir = _dot2(fbi_ref[:], hr)
    ii = _dot2(fbi_ref[:], hi)
    yr = (rr - ii).reshape(hk2 * a, m)[0:ny // 2 + 1, :].T
    yi = (ri + ir).reshape(hk2 * a, m)[0:ny // 2 + 1, :].T
    or_ref[:], oi_ref[:] = _visc_epilogue(
        nu, yr, yi, lap_ref[:], mask_ref[:], zr_ref[:], zi_ref[:])


def forward_tendency(u, zx, v, zy, src, lap, mask, zr, zi, nu: float,
                     grid_shape, beta: float = 0.0) -> tuple:
    """Dealiased spectral tendency planes of the barotropic RHS, fully
    fused: KA_adv (product + forward x-stage) + KC_visc (forward y-stage
    + viscosity + dealias). Matches
    dealias(rfft2(-u*zx - v*zy + src) + nu*lap*Z) to round-off."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    ka_tables = [jnp.asarray(t) for t in _ka_tables(nx, forward=True)]
    in_spec = pl.BlockSpec((nx, BLOCK), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tab_spec_a = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for t in ka_tables]
    out_spec_a = pl.BlockSpec((BLOCK, nx), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    f1t = pl.pallas_call(
        functools.partial(_ka_adv_kernel, nx, float(beta)),
        grid=(pl.cdiv(ny, BLOCK),),
        in_specs=[in_spec] * 5 + tab_spec_a,
        out_specs=(out_spec_a, out_spec_a),
        out_shape=(jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((ny, nx), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(u, zx, v, zy, src, *ka_tables)

    kc_tables = [jnp.asarray(t) for t in _kc_tables(ny)]
    in_spec_c = pl.BlockSpec((ny, BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((BLOCK, hny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec_c = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for t in kc_tables]
    return pl.pallas_call(
        functools.partial(_kc_visc_kernel, ny, float(nu)),
        grid=(pl.cdiv(nx, BLOCK),),
        in_specs=[in_spec_c, in_spec_c] + [row_spec] * 4 + tab_spec_c,
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((nx, hny), jnp.float32),
                   jax.ShapeDtypeStruct((nx, hny), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(f1t[0], f1t[1], lap, mask, zr, zi, *kc_tables)


# ---------------------------------------------------------------------------
# Y-first forward pipeline (barotropic). The r2c runs along the HALVED
# axis first — KY_adv forms the advection product from y-major fields
# and immediately runs the REAL-input partial y r2c (_kc_body, real
# stage 1 + k2-restricted stage 2), so KX's full x c2c touches only
# hny ~ ny/2 columns: ~33% less forward matmul volume and half the
# forward-intermediate HBM vs the x-first order. Same reason the
# INVERSE pipeline runs x-on-half-spectrum then c2r-y-last (and FFTW's
# r2c transforms the contiguous axis first). The viscosity/dealias
# epilogue moves to a separate elementwise pass (VISC) because KX's
# VMEM live set has no room for the four epilogue operand blocks.
# ---------------------------------------------------------------------------

FWD_YFIRST = _os.environ.get("XFB_BT_YFIRST", "1") != "0"


def fwd_yfirst_active() -> bool:
    """y-first forward order for the barotropic plane stepper (needs the
    grid-mode derivative kernel for the free y-major layout flip)."""
    return FWD_YFIRST and QUAD_MODE == "grid"


def _ky_adv_kernel(ny: int, beta: float, u_ref, zx_ref, v_ref, zy_ref,
                   src_ref,
                   far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                   or_ref, oi_ref):
    # beta-plane: -u*zx - v*zy - beta*v = -u*zx - v*(zy + beta)
    # (static branch; beta=0 traces the exact f-plane expression)
    zy = _f32(zy_ref[:]) + beta if beta != 0.0 else _f32(zy_ref[:])
    adv = -(_f32(u_ref[:]) * _f32(zx_ref[:])) - _f32(v_ref[:]) * zy \
        + src_ref[:]
    yr, yi = _kc_body(ny, adv, None, far_ref[:], fai_ref[:], twr_ref[:],
                      twi_ref[:], fbr_ref[:], fbi_ref[:])
    or_ref[:] = yr.T
    oi_ref[:] = yi.T


def _kx_fwd_bt_kernel(nx: int, xr_ref, xi_ref,
                      far_ref, fai_ref, twr_ref, twi_ref,
                      fbr_ref, fbi_ref, or_ref, oi_ref):
    # single-field twin of pallas_sw._kx_fwd_kernel (which carries a
    # leading stacked-field dim); both are thin wrappers over _four_step
    # — change transform semantics THERE, not here
    m = xr_ref.shape[1]
    yr, yi = _four_step(_f32(xr_ref[:]), _f32(xi_ref[:]), nx, m, far_ref[:],
                       fai_ref[:], twr_ref[:], twi_ref[:], fbr_ref[:],
                       fbi_ref[:])
    # natural orientation: rows are already spectral x
    or_ref[:] = yr
    oi_ref[:] = yi


def _visc_epilogue(nu: float, yr, yi, lap, mask, zr, zi):
    """mask * (Y + nu*lap*Z): the viscosity + dealias tendency epilogue
    (SURVEY §5.5-5.7) — single source shared by the x-first fused KC
    (_kc_visc_kernel) and the y-first VISC passes below."""
    nulap = nu * lap
    return mask * (yr + nulap * zr), mask * (yi + nulap * zi)


def _visc_kernel(nu: float, fr_ref, fi_ref, lap_ref, mask_ref,
                 zr_ref, zi_ref, or_ref, oi_ref):
    or_ref[:], oi_ref[:] = _visc_epilogue(
        nu, fr_ref[:], fi_ref[:], lap_ref[:], mask_ref[:],
        zr_ref[:], zi_ref[:])


def _visc_axpy_kernel(nu: float, coef: float, fr_ref, fi_ref, lap_ref,
                      mask_ref, zsr_ref, zsi_ref, z0r_ref, z0i_ref,
                      rr_ref, ri_ref, nr_ref, ni_ref):
    """VISC epilogue fused with the RK stage-state update: emits the
    stage tendency r = mask*(F + nu*lap*Z_stage) AND the next stage
    state z0 + coef*r in one HBM pass — no XLA elementwise remains
    between the forward pipeline and the next stage's derivative read."""
    rr, ri = _visc_epilogue(
        nu, fr_ref[:], fi_ref[:], lap_ref[:], mask_ref[:],
        zsr_ref[:], zsi_ref[:])
    rr_ref[:] = rr
    ri_ref[:] = ri
    nr_ref[:] = z0r_ref[:] + coef * rr
    ni_ref[:] = z0i_ref[:] + coef * ri


def forward_tendency_yfirst(u, zx, v, zy, src, lap, mask, zr, zi,
                            nu: float, grid_shape, axpy=None,
                            beta: float = 0.0, tail=None) -> tuple:
    """forward_tendency with Y-MAJOR (ny, nx) physical inputs and the
    y-first transform order: KY_adv (product + real partial y r2c) +
    KX (x c2c over hny columns) + VISC (viscosity + dealias epilogue).
    Same contract: dealias(rfft2(-u*zx - v*zy + src) + nu*lap*Z).

    axpy=(z0r, z0i, coef) fuses the RK stage-state update into the
    epilogue, returning (rr, ri, z0r+coef*rr, z0i+coef*ri); tail=(...)
    fuses the RK4 tail combine instead (see forward_tail)."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    kc_tables = [jnp.asarray(t) for t in _kc_tables(ny)]
    y_in = pl.BlockSpec((ny, BLOCK), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    tab_spec_c = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for t in kc_tables]
    row_spec = pl.BlockSpec((BLOCK, hny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    g1 = pl.pallas_call(
        functools.partial(_ky_adv_kernel, ny, float(beta)),
        grid=(pl.cdiv(nx, BLOCK),),
        in_specs=[y_in] * 5 + tab_spec_c,
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((nx, hny), jnp.float32),
                   jax.ShapeDtypeStruct((nx, hny), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(u, zx, v, zy, src, *kc_tables)

    return forward_tail(g1[0], g1[1], lap, mask, zr, zi, nu, grid_shape,
                        axpy=axpy, tail=tail)


# Fuse the VISC epilogue (+ RK stage axpy) INTO the KX forward kernel:
# the tendency spectrum f2 never lands in HBM (268 MB/stage of
# write+re-read deleted at 4096², ~12% of the fast step's traffic by
# the roofline count) and one whole kernel launch per RK stage
# disappears. The epilogue operands (lap, mask, stage state, base
# state) arrive as COLUMN blocks (nx, BLOCK) — elementwise math is
# blocking-agnostic, and KX's grid already walks hny columns. The
# historical objection ("no VMEM room", round-2 note) predates the
# 100 MB scoped-vmem budget. XFB_BT_FUSEKX: auto (default) | 0 | 1.
# ADOPTED (hardware A/B 2026-08-19, 4096², 30-step segments,
# BIT-IDENTICAL outputs both modes): fast 19.53 -> 18.81 ms/step
# (1.038x, 892 M gp/s); fp32 HIGHEST 42.76 -> 40.78 (1.049x,
# 411 M gp/s) — unlike the traffic-only bf16-store probe, deleting the
# separate DMA-bound VISC pass (and its launch) shortens the critical
# path in BOTH matmul regimes, so 'auto' is ON wherever the y-first
# plane stepper runs. Scope: barotropic only — the tracer family's
# forward_tail_tracer (ops/pallas_tracer.py) is ALWAYS fused (no
# unfused variant exists there; its global escape hatch is
# XFB_PLANE_STEPPER_MAX=0, and its bit-parity vs the XLA core is
# pinned at 2e-9 on hardware, BASELINE.md).
FUSEKX = _os.environ.get("XFB_BT_FUSEKX", "auto")

# RK4 tail combine fused into the stage-4 KX kernel (see
# _kx_visc_tail_kernel): deletes plane_rk4_combine's 0.40 GB/step +
# launch. Probe status: bit-identity pinned in interpret mode
# (tests/test_pallas_fft.py); auto follows the hardware A/B verdict
# recorded in BASELINE.md. XFB_BT_FUSETAIL: auto | 0 | 1.
FUSETAIL = _os.environ.get("XFB_BT_FUSETAIL", "auto")


def fusetail_on() -> bool:
    if FUSETAIL == "auto":
        # measured NEUTRAL (2026-08-20, 18.59 vs 18.49 ms/step — the
        # tail's DMA was already hidden behind the next step's KA
        # dispatch, so fusing buys only the launch); auto stays off
        return False
    return FUSETAIL not in ("", "0")


def fusekx_on(nx: int = 0) -> bool:
    """KX+VISC fusion gate. Size-capped: at 8192^2 the fused kernel's
    12 full-plane live set (6 inputs + 2 axpy operands + 4 outputs,
    4 MB each at BLOCK=128, double-buffered) measures 124.9 MB of
    scoped VMEM against the 128 MB physical core — the unfused
    KX + row-blocked VISC pair fits. XFB_FUSEKX_MAX overrides."""
    if nx and nx > int(_os.environ.get("XFB_FUSEKX_MAX", "4096")):
        return False
    if FUSEKX == "auto":
        return True
    return FUSEKX not in ("", "0")


def _kx_visc_kernel(nx: int, nu: float, coef, xr_ref, xi_ref,
                    lap_ref, mask_ref, zsr_ref, zsi_ref, *rest):
    """KX four-step + VISC epilogue (+ optional axpy when coef is not
    None: rest = (z0r_ref, z0i_ref, rr, ri, nr, ni), else (rr, ri))."""
    m = xr_ref.shape[1]
    tabs = rest[:-6] if coef is not None else rest[:-2]
    # table refs sit between the plane refs and the outputs
    if coef is not None:
        z0r_ref, z0i_ref = rest[len(tabs):len(tabs) + 2]
        outs = rest[len(tabs) + 2:]
    else:
        outs = rest[len(tabs):]
    yr, yi = _four_step(_f32(xr_ref[:]), _f32(xi_ref[:]), nx, m,
                        *(t[:] for t in tabs))
    rr, ri = _visc_epilogue(nu, yr, yi, lap_ref[:], mask_ref[:],
                            zsr_ref[:], zsi_ref[:])
    outs[0][:] = rr
    outs[1][:] = ri
    if coef is not None:
        outs[2][:] = z0r_ref[:] + coef * rr
        outs[3][:] = z0i_ref[:] + coef * ri


def _kx_visc_tail_kernel(nx: int, nu: float, c: float, xr_ref, xi_ref,
                         lap_ref, mask_ref, zsr_ref, zsi_ref, *rest):
    """KX four-step + VISC epilogue + the RK4 TAIL combine: emits
    z_{n+1} = z0 + (r1 + 2 r2 + 2 r3 + r4)*c directly (c = dt/6,
    main.cpp:309-312), so stage 4's tendency r4 never lands in HBM and
    the separate plane_rk4_combine pass (0.40 GB/step + one launch,
    measured 0.59 ms/step at 4096² fast — the round-4 profiler capture)
    disappears from the critical path. Same accumulation grouping as
    _rk4_combine_kernel, so the fusion is bit-identical.
    rest = tabs + (z0r, z0i, r1r, r1i, r2r, r2i, r3r, r3i) + (nr, ni)."""
    m = xr_ref.shape[1]
    tabs = rest[:-10]
    z0r, z0i, r1r, r1i, r2r, r2i, r3r, r3i = rest[len(tabs):len(tabs) + 8]
    nr_ref, ni_ref = rest[len(tabs) + 8:]
    yr, yi = _four_step(_f32(xr_ref[:]), _f32(xi_ref[:]), nx, m,
                        *(t[:] for t in tabs))
    rr, ri = _visc_epilogue(nu, yr, yi, lap_ref[:], mask_ref[:],
                            zsr_ref[:], zsi_ref[:])
    nr_ref[:] = z0r[:] + (r1r[:] + 2.0 * r2r[:] + 2.0 * r3r[:] + rr) * c
    ni_ref[:] = z0i[:] + (r1i[:] + 2.0 * r2i[:] + 2.0 * r3i[:] + ri) * c


def forward_tail(fr, fi, lap, mask, zr, zi, nu: float, grid_shape,
                 axpy=None, tail=None) -> tuple:
    """The y-first forward pipeline's tail: KX (x c2c over hny columns)
    + VISC (viscosity + dealias epilogue, optionally fused with the RK
    stage axpy). Input: the forward y-stage planes (nx, hny). With
    fusekx_on() the epilogue runs inside the KX kernel (column-blocked
    operands) and the tendency spectrum never lands in HBM.

    tail=(z0r, z0i, r1r, r1i, r2r, r2i, r3r, r3i, c) fuses the RK4
    TAIL combine into the stage-4 KX kernel instead (returns the
    stepped state planes directly); requires fusekx_on()."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    row_spec = pl.BlockSpec((BLOCK, hny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ka_tables = [jnp.asarray(t) for t in _ka_tables(nx, forward=True)]
    x_in = pl.BlockSpec((nx, BLOCK), lambda j: (0, j),
                        memory_space=pltpu.VMEM)
    tab_spec_a = [pl.BlockSpec(t.shape, lambda j: (0, 0),
                               memory_space=pltpu.VMEM) for t in ka_tables]
    x_out = pl.BlockSpec((nx, BLOCK), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((nx, hny), jnp.float32)
    if tail is not None:
        assert fusekx_on(nx), "tail fusion requires the fused KX kernel"
        *tail_planes, c = tail
        ins = (fr, fi, lap, mask, zr, zi, *ka_tables, *tail_planes)
        specs = [x_in] * 6 + tab_spec_a + [x_in] * 8
        return pl.pallas_call(
            functools.partial(_kx_visc_tail_kernel, nx, float(nu),
                              float(c)),
            grid=(pl.cdiv(hny, BLOCK),),
            in_specs=specs,
            out_specs=(x_out, x_out),
            out_shape=(plane, plane),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(*ins)
    if fusekx_on(nx):
        if axpy is None:
            ins = (fr, fi, lap, mask, zr, zi, *ka_tables)
            n_out, coef = 2, None
        else:
            z0r, z0i, coef = axpy
            ins = (fr, fi, lap, mask, zr, zi, *ka_tables, z0r, z0i)
            n_out = 4
        n_planes = len(ins) - len(ka_tables)
        specs = ([x_in] * 6 + tab_spec_a + [x_in] * (n_planes - 6))
        outs = pl.pallas_call(
            functools.partial(_kx_visc_kernel, nx, float(nu),
                              None if coef is None else float(coef)),
            grid=(pl.cdiv(hny, BLOCK),),
            in_specs=specs,
            out_specs=(x_out,) * n_out,
            out_shape=(plane,) * n_out,
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(*ins)
        return outs if axpy is not None else (outs[0], outs[1])
    f2 = pl.pallas_call(
        functools.partial(_kx_fwd_bt_kernel, nx),
        grid=(pl.cdiv(hny, BLOCK),),
        in_specs=[x_in, x_in] + tab_spec_a,
        out_specs=(x_out, x_out),
        out_shape=(jax.ShapeDtypeStruct((nx, hny), jnp.float32),
                   jax.ShapeDtypeStruct((nx, hny), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(fr, fi, *ka_tables)

    if axpy is None:
        return pl.pallas_call(
            functools.partial(_visc_kernel, float(nu)),
            grid=(pl.cdiv(nx, BLOCK),),
            in_specs=[row_spec] * 6,
            out_specs=(row_spec, row_spec),
            out_shape=(plane, plane),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(f2[0], f2[1], lap, mask, zr, zi)
    z0r, z0i, coef = axpy
    return pl.pallas_call(
        functools.partial(_visc_axpy_kernel, float(nu), float(coef)),
        grid=(pl.cdiv(nx, BLOCK),),
        in_specs=[row_spec] * 8,
        out_specs=(row_spec,) * 4,
        out_shape=(plane,) * 4,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(f2[0], f2[1], lap, mask, zr, zi, z0r, z0i)


def tendency_yfirst_fusedkb(sr, si, src, kx, ky, rlap, lap, mask,
                            nu: float, grid_shape, axpy=None,
                            mode: str = "full",
                            beta: float = 0.0, tail=None) -> tuple:
    """One full RK-stage tendency with the KB+advection fusion: KA grid
    x-stage -> KB_ADV (physical fields never in HBM) -> KX -> VISC.
    Bit-identical math to derivative_quad_planes(ymajor=True) +
    forward_tendency_yfirst (with f32 stores; bf16 stores trade the
    bf16-class storage rounding for ~22% of the step's HBM traffic —
    STORE note at the top of the module)."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    st = store_dtype()
    wr, wi = derivative_xstage_planes(sr, si, kx, ky, rlap, grid_shape,
                                      store=st)
    if mode == "full":
        fr, fi = kb_adv_full(wr, wi, src, grid_shape, beta=beta, store=st)
    elif mode == "half":
        zx, zy = _kb_call_stacked(wr, wi, 0, 1, ny, 1.0 / (nx * ny),
                                  transpose_out=False, store=st)
        fr, fi = kb_adv_half(zx, zy, wr, wi, src, grid_shape, beta=beta,
                             store=st)
    else:
        raise ValueError(f"unknown fusekb mode {mode!r}")
    return forward_tail(fr, fi, lap, mask, sr, si, nu, grid_shape,
                        axpy=axpy, tail=tail)


# ---------------------------------------------------------------------------
# public API (ops/fft.py conventions: forward unnormalized, inverse 1/N^2)
# ---------------------------------------------------------------------------

_INTERPRET = False


def _interpret() -> bool:
    """Interpret mode: explicit override, else on for non-TPU backends so
    the same model code runs in CPU tests."""
    if _INTERPRET:
        return True
    return jax.default_backend() != "tpu"


def rfft2(x: jax.Array) -> jax.Array:
    """Real (nx, ny) -> half-spectrum (nx, hny) complex64, unnormalized."""
    nx, ny = x.shape
    f1t = _ka_call(x, None, nx, forward=True, real_input=True)  # (ny, nx)
    sr, si = _kc_call(f1t, ny)
    return jax.lax.complex(sr, si)


def inverse_pair(spec_a: jax.Array, spec_b: jax.Array,
                 grid_shape) -> tuple:
    """Two real inverse transforms, fully fused: 2x KA + 1x KB."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    scale = 1.0 / (nx * ny)
    wat = _ka_call(jnp.real(spec_a), jnp.imag(spec_a), nx,
                   forward=False, real_input=False)
    wbt = _ka_call(jnp.real(spec_b), jnp.imag(spec_b), nx,
                   forward=False, real_input=False)
    return _kb_call(wat, wbt, ny, scale)


def irfft2(spec: jax.Array, s: Tuple[int, int]) -> jax.Array:
    """Single-field inverse; runs the pair kernel with a zero partner."""
    a, _ = inverse_pair(spec, jnp.zeros_like(spec), s)
    return a
