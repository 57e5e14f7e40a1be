"""Fused Pallas plane-state pipeline for the shallow-water RK4 stage.

Round-1 measured the SW model at 96.6 ms/step at 4096^2 (fused
per-transform pipeline) vs the barotropic plane stepper's 44.0 ms — the
whole gap is per-transform HBM round-trips and XLA elementwise passes in
the 5-inverse + 5-forward stage structure (models/shallow_water.py:
tendency; capability root /root/reference/src/main-shallow-water.cpp:
146-244, which the reference only ever filled with barotropic dynamics).
This module gives SW the same treatment the barotropic core got in
ops/pallas_fft.py: every transform stage is one HBM read + one write,
all diagonals/products/epilogues fused in VMEM, float32 (re, im) planes
everywhere, and compile-friendly grid-over-fields bodies (ONE four-step
transform per kernel body; the per-field diagonal is DATA — the KA4
lesson from BASELINE.md).

Per RK stage (vs 10 separate XLA transforms + ~10 elementwise passes):

  KA_SW   grid (4, cols): x-stages of u_hat, v_hat, zeta_hat, eta_hat.
          Each field is D1*Z + D2*Dv + c3*E with D = A(row) B(col) rlap^e
          stacked factor DATA:
            u = -i ky rlap Z + i kx rlap Dv      (u = -psi_y + chi_x)
            v =  i kx rlap Z + i ky rlap Dv      (v =  psi_x + chi_y)
            zeta = Z,   eta = E
  KB x2   (pallas_fft._kb_call_stacked): paired c2r y-stages ->
          physical u, v, zeta, eta.
  KA_FWD  grid (5, cols): pointwise products + real-input forward
          x-stage: qu, qv, eta*u, eta*v, Phi = g*eta + (u^2+v^2)/2,
          with q = zeta + f. Product selected by program_id around ONE
          transform body (a (1,5) one-hot table block would violate
          Mosaic's min-tile rule).
  KC_SW   grid (5, cols): forward partial y-stages -> stacked product
          spectra (5, nx, hny).
  COMBINE grid (cols): the three dealiased spectral tendencies
          (SURVEY.md §5.5-5.7 contract: dealias the TENDENCY, viscosity
          from the current stage state) in one elementwise kernel:
            dzeta = mask * (-(ikx)QU - (iky)QV + nu lap Z + S_hat)
            ddiv  = mask * ( (ikx)QV - (iky)QU - lap PHI + nu lap D)
            deta  = mask * (-(ikx)EU - (iky)EV - H D)

RK4 plane arithmetic (stage axpy, final combination) also runs as
trivial Pallas elementwise kernels: XLA elementwise passes measured only
~140 GB/s effective on this chip (BASELINE.md chained-scan breakdown),
and the SW state is 6 planes — 3x the barotropic carry.

Differentially tested against the XLA SW core in interpret mode
(tests/test_pallas_sw.py); selected on TPU via fft_backend='auto' at the
plane-stepper sizes (models/shallow_water.py).
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

from .pallas_fft import (BLOCK, _compiler_params, _f32, _four_step,
                         _interpret, _ka_tables, _kb_call_stacked,
                         _kc_body, _kc_tables, _cmatmul_left, _dot2,
                         store_dtype)

# Forward pipeline order. y-first (default) runs the real-input partial
# r2c along the HALVED axis first (pallas_fft._kc_body with xi=None:
# real stage-1 matmuls + the k2-restricted stage 2), so the following x
# c2c touches only hny ~ ny/2 columns — ~33% less forward matmul volume
# and half the forward-intermediate HBM vs the historical x-first order
# (KA_FWD full-ny x-stage then partial y). This is the same reason the
# INVERSE pipeline runs x-on-half-spectrum then c2r-y-last, and the same
# reason FFTW's r2c transforms the contiguous axis first. The physical
# fields arrive y-major for free (KB's folded write flipped,
# _kb_call_stacked(transpose_out=False)). x-first kept for A/B.
YFIRST = _os.environ.get("XFB_SW_YFIRST", "1") != "0"

# Split-linear formulation (XFB_SW_SPLIT: auto|1|0). The SW divergence
# equation is a near-cancellation in balanced flow: curl_z(q u) carries
# f0*curl_z(u_vec) and lap(Phi) carries g*lap(eta), two terms ~1/Ro
# larger than their sum. Routing them through lossy (bf16-class)
# transforms turns transform round-off into SPURIOUS DIVERGENCE that
# d(eta)/dt = -H*div integrates into gravity-wave noise (measured: eta
# 7% rel-L2 after 20 steps at 4096^2 in fast-transforms mode). But the
# linear parts never needed transforms at all — they are EXACT spectral
# multiplies on the prognostic planes:
#     curl_z(f0 u_vec) = f0 * lap*rlap * zeta_hat   (= f0 zeta_hat, k!=0)
#     div   (f0 u_vec) = f0 * lap*rlap * div_hat
#     lap(g eta)       = g * lap * eta_hat
# (lap*rlap vanishes at the mean mode — gradients kill it — hence the
# nonzero-k guard in COMBINE). Split mode transforms only the genuinely
# NONLINEAR products (zeta*u, zeta*v, eta*u, eta*v, KE) and applies the
# linear terms in COMBINE's float32 VPU pass, so the geostrophic/
# gravity-wave balance is exact float32 regardless of the kernel matmul
# precision. 'auto' (default) turns it on exactly when the matmuls are
# lossy (pallas_fft.MM_MODE in bf16/default); at fp32-HIGHEST the
# default formulation is kept so pinned checksums stay bit-identical.
# Hardware A/B at 4096² (2026-08-18, BASELINE.md): under MM=default the
# split cuts the 20-step eta corruption 164x (7.0e-2 -> 4.3e-4; zeta
# 2.3e-4 -> 5.5e-5) at identical speed — 41.5 ms/step, 1.94x the fp32
# plane stepper — which is why 'auto' ships as the default.
SPLIT_LINEAR = _os.environ.get("XFB_SW_SPLIT", "auto")


def split_linear() -> bool:
    """Resolve SPLIT_LINEAR at trace time (see module note above)."""
    if SPLIT_LINEAR == "auto":
        from . import pallas_fft
        return pallas_fft.MM_MODE in ("bf16", "default")
    return SPLIT_LINEAR not in ("0", "off", "")


# Grid iteration order for the two grid-over-fields SW stages. With the
# FIELD axis minor the per-field input blocks keep the same index across
# consecutive grid steps, so the Pallas pipeline revisits them instead
# of re-fetching: KA_SW re-reads 7 planes (6 state + rlap) per field =
# ~714 MB/stage excess at 4096², and KY_FWD re-reads the 4 physical
# fields per product = ~1.07 GB/stage. The cost is the barotropic
# KA-probe lesson (BASELINE.md fminor entry): the stacked OUTPUT block
# jumps across the field dim every step, stalling write-side
# pipelining. Hardware A/B at 4096² fast mode, 20-step segments,
# checksums identical (2026-08-19):
#   fmajor/fmajor 41.44 ms/step | KA fminor 40.88 (1.4%, ADOPTED) |
#   KY fminor alone 43.79 (write-side stall dominates its 5 tiny
#   outputs) | both 40.83 (= KA alone within noise; KY stays fmajor)
# KA wins where the barotropic KA probe lost because SW's KA re-reads 7
# input planes per field vs barotropic's 3. Outputs are bit-identical
# either way (pure iteration order) — pinned by
# test_field_minor_orders_bit_identical.
KA_FMINOR = _os.environ.get("XFB_SW_KA_ORDER", "fminor") == "fminor"
KY_FMINOR = _os.environ.get("XFB_SW_KY_ORDER", "fmajor") == "fminor"

# KY_ALL: run ALL FIVE products + their real y r2c's in ONE grid pass
# per column block — the 4 physical fields are fetched once per block
# instead of once per (product, block), deleting the KY stage's 4x
# re-read (~1.07 GB/stage at 4096², the largest single traffic item
# left in the SW step). The trade is a 5x bigger serial kernel body.
# Hardware A/B (2026-08-20, fast mode, bench_sw_ab.py): 2048²
# 11.06 -> 10.20 ms/step (1.084x, outputs BIT-IDENTICAL — pure
# iteration-order change), ADOPTED there; at 4096² the 5x UNROLLED body
# OOM-SIGKILLs the remote AOT compile helper (same host-RAM ceiling as
# 8192²/BLOCK=256/bf16x3 — BASELINE.md). The 'loop' form runs the same
# five-product pass as a lax.fori_loop inside the kernel (runtime
# product selection + dynamic leading-axis store) — same math in the
# same order, ~1/5 the kernel MLIR — and FITS at 4096² (hardware
# 2026-08-20: 63 s compile, 39.38 ms/step vs 40.02 off, outputs
# bit-identical), so auto = unroll <= KYALL_MAX, loop above it.
# XFB_SW_KYALL: auto | 0 | 1 | loop.
KY_ALL = _os.environ.get("XFB_SW_KYALL", "auto")
KYALL_MAX = int(_os.environ.get("XFB_SW_KYALL_MAX", "2048"))

# Product-spectra storage dtype: the KX_FWD outputs (pr, pi) are only
# read by COMBINE (a pure elementwise, DMA-bound pass); storing them
# bf16 cuts ~335 MB/stage of write+read at 4096² at bf16-class noise
# on the nonlinear flux terms (the split-linear exact f0/gravity terms
# read the f32 STATE and are unaffected). Hardware A/B (2026-08-20,
# fast mode): 4096² 41.04 -> 40.02 ms/step (1.025x, max|zeta_hat|
# checksum identical); 2048² 11.06 -> 10.70 (1.034x, eta rel-L2
# 4.4389e-4 vs 4.4384e-4 — noise at the fast-mode accuracy class).
# auto = bf16 exactly when the kernel matmuls are already lossy (fast
# mode, same rule as split_linear); fp32-HIGHEST keeps f32 stores (the
# <1e-6 parity contract). XFB_SW_PSTORE: auto | f32 | bf16.
PSTORE = _os.environ.get("XFB_SW_PSTORE", "auto")


def ky_all_mode(grid_shape=None) -> str:
    """Resolve KY_ALL at trace time: 'off' | 'unroll' | 'loop'.

    auto = the unrolled body at <= KYALL_MAX (measured 1.084x at 2048²,
    bit-identical) and the fori_loop form above it: the loop body's
    ~1/5 MLIR fits the compile-helper host-RAM ceiling that kills the
    unrolled form at 4096² (hardware 2026-08-20: compiles in 63 s and
    measures 39.38 ms/step vs 40.02 without — outputs identical to the
    per-product path, bit-for-bit). XFB_SW_KYALL: auto | 0 | 1 | loop."""
    if KY_ALL == "loop":
        return "loop"
    if KY_ALL == "auto":
        if grid_shape is None:
            return "off"
        return "unroll" if max(grid_shape) <= KYALL_MAX else "loop"
    return "off" if KY_ALL in ("", "0") else "unroll"


def ky_all_on(grid_shape=None) -> bool:
    return ky_all_mode(grid_shape) != "off"


def pstore_dtype():
    if PSTORE == "auto":
        from . import pallas_fft
        return (jnp.bfloat16 if pallas_fft.MM_MODE in ("bf16", "default")
                else jnp.float32)
    if PSTORE in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def _fgrid(nf: int, nblocks: int, fminor: bool):
    """(grid, fmap) with fmap(raw grid args) -> (field, block)."""
    if fminor:
        return (nblocks, nf), lambda a, b: (b, a)
    return (nf, nblocks), lambda a, b: (a, b)


def fused_rk() -> bool:
    """Fuse the RK stage axpys into COMBINE (models/shallow_water.py:
    rk4_step_planes) — one fewer elementwise pass per stage."""
    return _os.environ.get("XFB_SW_FUSED_RK", "1") != "0"


# ---------------------------------------------------------------------------
# KA_SW: grid-over-fields inverse x-stage of (u, v, zeta, eta).
# ---------------------------------------------------------------------------

def _ka_sw_kernel(n: int, zr_ref, zi_ref, dr_ref, di_ref, er_ref, ei_ref,
                  rlap_ref,
                  a1r_ref, a1i_ref, b1r_ref, b1i_ref, e1_ref,
                  a2r_ref, a2i_ref, b2r_ref, b2i_ref, e2_ref, c3_ref,
                  far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                  owr_ref, owi_ref):
    m = zr_ref.shape[1]
    rlap = rlap_ref[:]

    def diag(ar, ai, br, bi, e, xr, xi):
        rl = 1.0 + e * (rlap - 1.0)          # rlap^e, e in {0, 1}
        t1r = xr * ar - xi * ai
        t1i = xr * ai + xi * ar
        return (t1r * br - t1i * bi) * rl, (t1r * bi + t1i * br) * rl

    x1r, x1i = diag(a1r_ref[0], a1i_ref[0], b1r_ref[0], b1i_ref[0],
                    e1_ref[0], zr_ref[:], zi_ref[:])
    x2r, x2i = diag(a2r_ref[0], a2i_ref[0], b2r_ref[0], b2i_ref[0],
                    e2_ref[0], dr_ref[:], di_ref[:])
    c3 = c3_ref[0]
    xr = x1r + x2r + c3 * er_ref[:]
    xi = x1i + x2i + c3 * ei_ref[:]
    yr, yi = _four_step(xr, xi, n, m, far_ref[:], fai_ref[:], twr_ref[:],
                        twi_ref[:], fbr_ref[:], fbi_ref[:])
    owr_ref[0] = yr.T.astype(owr_ref.dtype)
    owi_ref[0] = yi.T.astype(owi_ref.dtype)


def _ka_sw2_kernel(n: int, p1r_ref, p1i_ref, p2r_ref, p2i_ref, rlap_ref,
                   a1r_ref, a1i_ref, b1r_ref, b1i_ref, e1_ref,
                   a2r_ref, a2i_ref, b2r_ref, b2i_ref, e2_ref,
                   far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                   owr_ref, owi_ref):
    """Two-field split of _ka_sw_kernel (x = diag1*P1 + diag2*P2): at
    8192^2 the 7-input KA_SW kernel's windows + its intrinsic ~28 MB of
    register spill exceed the 128 MB core VMEM however the scoped limit
    is tuned (r5 ledger); two calls of 4-5 inputs each fit. Pair A
    (u, v): P1 = Z, P2 = Dv; pair B (zeta, eta): P1 = Z, P2 = E with
    diag2 degenerate to the eta pairing scale."""
    m = p1r_ref.shape[1]
    rlap = rlap_ref[:]

    def diag(ar, ai, br, bi, e, xr, xi):
        rl = 1.0 + e * (rlap - 1.0)          # rlap^e, e in {0, 1}
        t1r = xr * ar - xi * ai
        t1i = xr * ai + xi * ar
        return (t1r * br - t1i * bi) * rl, (t1r * bi + t1i * br) * rl

    x1r, x1i = diag(a1r_ref[0], a1i_ref[0], b1r_ref[0], b1i_ref[0],
                    e1_ref[0], p1r_ref[:], p1i_ref[:])
    x2r, x2i = diag(a2r_ref[0], a2i_ref[0], b2r_ref[0], b2i_ref[0],
                    e2_ref[0], p2r_ref[:], p2i_ref[:])
    yr, yi = _four_step(x1r + x2r, x1i + x2i, n, m, far_ref[:],
                        fai_ref[:], twr_ref[:], twi_ref[:], fbr_ref[:],
                        fbi_ref[:])
    owr_ref[0] = yr.T.astype(owr_ref.dtype)
    owi_ref[0] = yi.T.astype(owi_ref.dtype)


def ka_split_on(nx: int) -> bool:
    """XFB_SW_KA_SPLIT: auto (default: split exactly when nx exceeds
    4096 — the VMEM geometry above) | 0 | 1."""
    v = _os.environ.get("XFB_SW_KA_SPLIT", "auto")
    if v == "auto":
        return nx > 4096
    return v not in ("", "0")


def _sw_factors(kx, ky, nx, hny, eta_scale):
    """Stacked per-field diagonal factors for (u, v, zeta, eta_scale*eta)."""
    one_r = jnp.ones((nx, 1), jnp.float32)
    zero_r = jnp.zeros((nx, 1), jnp.float32)
    one_c = jnp.ones((1, hny), jnp.float32)
    zero_c = jnp.zeros((1, hny), jnp.float32)
    kxc = kx.reshape(nx, 1)
    kyc = ky.reshape(1, hny)
    # D1 acts on Z: u: -i ky rlap | v: i kx rlap | zeta: 1 | eta: 0
    a1r = jnp.stack([one_r, zero_r, one_r, zero_r])
    a1i = jnp.stack([zero_r, kxc, zero_r, zero_r])
    b1r = jnp.stack([zero_c, one_c, one_c, zero_c])
    b1i = jnp.stack([-kyc, zero_c, zero_c, zero_c])
    e1 = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32).reshape(4, 1, 1)
    # D2 acts on Dv: u: i kx rlap | v: i ky rlap | zeta: 0 | eta: 0
    a2r = jnp.stack([zero_r, one_r, zero_r, zero_r])
    a2i = jnp.stack([kxc, zero_r, zero_r, zero_r])
    b2r = jnp.stack([one_c, zero_c, zero_c, zero_c])
    b2i = jnp.stack([zero_c, kyc, zero_c, zero_c])
    e2 = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32).reshape(4, 1, 1)
    # c3 selects E for the eta slot, SCALED: eta_scale is the dynamic
    # power-of-two that brings eta to zeta's magnitude before the two are
    # Hermitian-PAIRED in one c2r y-stage — float32 pairing cross-talk is
    # ~eps * max(|partner|), so pairing metre-scale eta with 1e-4-scale
    # zeta unbalanced would bury zeta's low bits (measured 8e-3 relative
    # at 5.0 m vs 1e-4 s^-1). Power-of-two scaling is EXACT in float32.
    s = jnp.asarray(eta_scale, jnp.float32).reshape(())
    c3 = jnp.concatenate([jnp.zeros((3,), jnp.float32),
                          s[None]]).reshape(4, 1, 1)
    return (a1r, a1i, b1r, b1i, e1, a2r, a2i, b2r, b2i, e2, c3)


def eta_pair_scale(planes):
    """Power-of-two ratio max|zeta_hat| / max|eta_hat| from the spectral
    state planes — the pairing equalizer for inverse_quad_planes.
    Computed ONCE per jit call / segment (magnitudes drift slowly; the
    scale only needs to be right to within a couple of orders)."""
    zr, zi, _dr, _di, er, ei = planes
    m_z = jnp.maximum(jnp.max(jnp.abs(zr)), jnp.max(jnp.abs(zi)))
    m_e = jnp.maximum(jnp.max(jnp.abs(er)), jnp.max(jnp.abs(ei)))
    ratio = jnp.where((m_z > 0) & (m_e > 0), m_z / jnp.maximum(m_e, 1e-30),
                      1.0)
    # EXACT power of two via exponent bits — jnp.exp2 lowers through
    # exp(x*ln2) and lands 1 ulp off an exact power, which would make the
    # scale/unscale round trip lossy
    e = jnp.clip(jnp.round(jnp.log2(ratio)), -126.0, 126.0)
    bits = (e.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def inverse_quad_planes(zr, zi, dr, di, er, ei, kx, ky, rlap, grid_shape,
                        eta_scale=1.0, store=None):
    """(u, v, zeta, eta_scale*eta) physical fields from the SW spectral
    state planes in one fused pipeline: KA_SW (grid over 4 fields) + 2x
    stacked-KB. The eta slot comes back SCALED by eta_scale (see
    _sw_factors); forward_tendencies unscales it in VMEM. `store` is
    the intermediate/output storage dtype (pallas_fft STORE note;
    None resolves via store_dtype())."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    scale = 1.0 / (nx * ny)
    tables = [jnp.asarray(t) for t in _ka_tables(nx, forward=False)]
    factors = _sw_factors(kx, ky, nx, hny, eta_scale)

    st = store if store is not None else store_dtype()
    tab_spec = [pl.BlockSpec(t.shape, lambda a, b: (0, 0),
                             memory_space=pltpu.VMEM) for t in tables]

    if ka_split_on(nx):
        # two 2-field calls (see _ka_sw2_kernel note): pair A (u, v)
        # reads (Z, Dv, rlap); pair B (zeta, eta) reads (Z, E) with
        # diag2 degenerate to the eta pairing scale
        (a1r, a1i, b1r, b1i, e1, a2r, a2i, b2r, b2i, e2, c3) = factors
        one_r = jnp.ones((2, nx, 1), jnp.float32)
        zero_r = jnp.zeros((2, nx, 1), jnp.float32)
        one_c = jnp.ones((1, 1, hny), jnp.float32)
        zero_c = jnp.zeros((1, 1, hny), jnp.float32)
        facA = tuple(f[0:2] for f in
                     (a1r, a1i, b1r, b1i, e1, a2r, a2i, b2r, b2i, e2))
        facB = (a1r[2:4], a1i[2:4], b1r[2:4], b1i[2:4], e1[2:4],
                one_r, zero_r,
                jnp.concatenate([zero_c, c3[3] * one_c]),
                jnp.concatenate([zero_c, zero_c]),
                jnp.zeros((2, 1, 1), jnp.float32))

        def ka2(p1r, p1i, p2r, p2i, fac):
            grid, fm = _fgrid(2, pl.cdiv(hny, BLOCK), KA_FMINOR)
            spec_in = pl.BlockSpec((nx, BLOCK),
                                   lambda a, b: (0, fm(a, b)[1]),
                                   memory_space=pltpu.VMEM)
            rvec = pl.BlockSpec((1, nx, 1),
                                lambda a, b: (fm(a, b)[0], 0, 0),
                                memory_space=pltpu.VMEM)
            cvec = pl.BlockSpec(
                (1, 1, BLOCK),
                lambda a, b: (fm(a, b)[0], 0, fm(a, b)[1]),
                memory_space=pltpu.VMEM)
            svec = pl.BlockSpec((1, 1, 1),
                                lambda a, b: (fm(a, b)[0], 0, 0),
                                memory_space=pltpu.VMEM)
            fac_specs = [rvec, rvec, cvec, cvec, svec,
                         rvec, rvec, cvec, cvec, svec]
            ow_spec = pl.BlockSpec(
                (1, BLOCK, nx),
                lambda a, b: (fm(a, b)[0], fm(a, b)[1], 0),
                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                functools.partial(_ka_sw2_kernel, nx),
                grid=grid,
                in_specs=[spec_in] * 5 + fac_specs + tab_spec,
                out_specs=(ow_spec, ow_spec),
                out_shape=(jax.ShapeDtypeStruct((2, hny, nx), st),
                           jax.ShapeDtypeStruct((2, hny, nx), st)),
                interpret=_interpret(),
                compiler_params=_compiler_params(),
            )(p1r, p1i, p2r, p2i, rlap, *fac, *tables)

        wrA, wiA = ka2(zr, zi, dr, di, facA)
        wrB, wiB = ka2(zr, zi, er, ei, facB)
        u, v = _kb_call_stacked(wrA, wiA, 0, 1, ny, scale,
                                transpose_out=not YFIRST, store=st)
        zeta, eta = _kb_call_stacked(wrB, wiB, 0, 1, ny, scale,
                                     transpose_out=not YFIRST, store=st)
        return u, v, zeta, eta

    grid, fm = _fgrid(4, pl.cdiv(hny, BLOCK), KA_FMINOR)
    spec_in = pl.BlockSpec((nx, BLOCK), lambda a, b: (0, fm(a, b)[1]),
                           memory_space=pltpu.VMEM)
    rvec = pl.BlockSpec((1, nx, 1), lambda a, b: (fm(a, b)[0], 0, 0),
                        memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((1, 1, BLOCK),
                        lambda a, b: (fm(a, b)[0], 0, fm(a, b)[1]),
                        memory_space=pltpu.VMEM)
    svec = pl.BlockSpec((1, 1, 1), lambda a, b: (fm(a, b)[0], 0, 0),
                        memory_space=pltpu.VMEM)
    fac_specs = [rvec, rvec, cvec, cvec, svec,
                 rvec, rvec, cvec, cvec, svec, svec]
    ow_spec = pl.BlockSpec((1, BLOCK, nx),
                           lambda a, b: (fm(a, b)[0], fm(a, b)[1], 0),
                           memory_space=pltpu.VMEM)
    wr, wi = pl.pallas_call(
        functools.partial(_ka_sw_kernel, nx),
        grid=grid,
        in_specs=[spec_in] * 7 + fac_specs + tab_spec,
        out_specs=(ow_spec, ow_spec),
        out_shape=(jax.ShapeDtypeStruct((4, hny, nx), st),
                   jax.ShapeDtypeStruct((4, hny, nx), st)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(zr, zi, dr, di, er, ei, rlap, *factors, *tables)
    # y-first forward consumes the physical fields y-major — the layout
    # flip is free (KB's folded transpose write, not an extra pass)
    u, v = _kb_call_stacked(wr, wi, 0, 1, ny, scale,
                            transpose_out=not YFIRST, store=st)
    zeta, eta = _kb_call_stacked(wr, wi, 2, 3, ny, scale,
                                 transpose_out=not YFIRST, store=st)
    return u, v, zeta, eta


# ---------------------------------------------------------------------------
# KA_FWD: grid-over-products forward x-stage. The product is a one-hot
# DATA combination of the five flux/Bernoulli groups, so the body is one
# real-input four-step.
# ---------------------------------------------------------------------------

def _ka_fwd_kernel(n: int, f0: float, grav: float, split: bool,
                   u_ref, v_ref, ze_ref, et_ref, ies_ref,
                   far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                   owr_ref, owi_ref):
    m = u_ref.shape[1]
    u = _f32(u_ref[:])
    v = _f32(v_ref[:])
    # undo the pairing equalizer (exact: 1/power-of-two)
    eta = _f32(et_ref[:]) * ies_ref[0, 0]
    # split mode: the f0*u / g*eta linear parts ride COMBINE exactly
    # (module note) — only the nonlinear products are transformed
    q = _f32(ze_ref[:]) if split else _f32(ze_ref[:]) + f0
    # product selected by grid index — VPU selects around ONE transform
    # body (a (1, 5) one-hot table block would violate Mosaic's min-tile
    # rule; program_id comparison keeps the table out entirely)
    f = pl.program_id(0)
    ke = 0.5 * (u * u + v * v)
    phi = ke if split else grav * eta + ke
    prod = jnp.where(
        f == 0, q * u,
        jnp.where(f == 1, q * v,
                  jnp.where(f == 2, eta * u,
                            jnp.where(f == 3, eta * v, phi))))
    yr, yi = _four_step(prod, None, n, m, far_ref[:], fai_ref[:],
                        twr_ref[:], twi_ref[:], fbr_ref[:], fbi_ref[:])
    owr_ref[0] = yr.T.astype(owr_ref.dtype)
    owi_ref[0] = yi.T.astype(owi_ref.dtype)


# ---------------------------------------------------------------------------
# KY_FWD / KX_FWD: the y-first forward pipeline (YFIRST). KY forms the
# products from the y-major physical fields and immediately runs the
# REAL-input partial r2c along y (halved axis first: real stage-1
# matmuls + k2-restricted stage 2, pallas_fft._kc_body), writing the
# half-spectrum x-major; KX then runs the full x c2c over only
# hny ~ ny/2 columns. Same product set and epilogue contract as
# KA_FWD/KC_SW — only the transform order differs.
# ---------------------------------------------------------------------------

def _ky_fwd_kernel(ny: int, f0: float, grav: float, split: bool,
                   u_ref, v_ref, ze_ref, et_ref, ies_ref,
                   far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                   or_ref, oi_ref):
    u = _f32(u_ref[:])
    v = _f32(v_ref[:])
    # undo the pairing equalizer (exact: 1/power-of-two)
    eta = _f32(et_ref[:]) * ies_ref[0, 0]
    # split mode: linear parts ride COMBINE exactly (module note)
    q = _f32(ze_ref[:]) if split else _f32(ze_ref[:]) + f0
    f = pl.program_id(1) if KY_FMINOR else pl.program_id(0)
    ke = 0.5 * (u * u + v * v)
    phi = ke if split else grav * eta + ke
    prod = jnp.where(
        f == 0, q * u,
        jnp.where(f == 1, q * v,
                  jnp.where(f == 2, eta * u,
                            jnp.where(f == 3, eta * v, phi))))
    yr, yi = _kc_body(ny, prod, None, far_ref[:], fai_ref[:],
                      twr_ref[:], twi_ref[:], fbr_ref[:], fbi_ref[:])
    or_ref[0] = yr.T.astype(or_ref.dtype)
    oi_ref[0] = yi.T.astype(oi_ref.dtype)


def _ky_all_kernel(ny: int, f0: float, grav: float, split: bool,
                   u_ref, v_ref, ze_ref, et_ref, ies_ref,
                   far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                   or_ref, oi_ref):
    """All five products + real partial y r2c's in ONE body — the
    fields are read once per block (KY_ALL note above)."""
    u = _f32(u_ref[:])
    v = _f32(v_ref[:])
    eta = _f32(et_ref[:]) * ies_ref[0, 0]
    q = _f32(ze_ref[:]) if split else _f32(ze_ref[:]) + f0
    ke = 0.5 * (u * u + v * v)
    phi = ke if split else grav * eta + ke
    tabs = (far_ref[:], fai_ref[:], twr_ref[:], twi_ref[:], fbr_ref[:],
            fbi_ref[:])
    for i, prod in enumerate((q * u, q * v, eta * u, eta * v, phi)):
        yr, yi = _kc_body(ny, prod, None, *tabs)
        or_ref[i] = yr.T.astype(or_ref.dtype)
        oi_ref[i] = yi.T.astype(oi_ref.dtype)


def _ky_all_loop_kernel(ny: int, f0: float, grav: float, split: bool,
                        u_ref, v_ref, ze_ref, et_ref, ies_ref,
                        far_ref, fai_ref, twr_ref, twi_ref, fbr_ref,
                        fbi_ref, or_ref, oi_ref):
    """The KY_ALL pass as a fori_loop over the five products: one
    transform body + runtime jnp.where product selection + a dynamic
    leading-axis store, instead of the 5x unrolled body. Identical
    per-product math and iteration order -> bit-identical outputs; the
    point is the ~5x smaller kernel MLIR (KY_ALL note above)."""
    u = _f32(u_ref[:])
    v = _f32(v_ref[:])
    eta = _f32(et_ref[:]) * ies_ref[0, 0]
    q = _f32(ze_ref[:]) if split else _f32(ze_ref[:]) + f0
    ke = 0.5 * (u * u + v * v)
    phi = ke if split else grav * eta + ke
    tabs = (far_ref[:], fai_ref[:], twr_ref[:], twi_ref[:], fbr_ref[:],
            fbi_ref[:])

    def body(i, carry):
        prod = jnp.where(
            i == 0, q * u,
            jnp.where(i == 1, q * v,
                      jnp.where(i == 2, eta * u,
                                jnp.where(i == 3, eta * v, phi))))
        yr, yi = _kc_body(ny, prod, None, *tabs)
        or_ref[pl.dslice(i, 1)] = yr.T[None].astype(or_ref.dtype)
        oi_ref[pl.dslice(i, 1)] = yi.T[None].astype(oi_ref.dtype)
        return carry

    jax.lax.fori_loop(0, 5, body, 0, unroll=False)


def _kx_fwd_kernel(nx: int, xr_ref, xi_ref,
                   far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                   or_ref, oi_ref):
    m = xr_ref.shape[2]
    yr, yi = _four_step(_f32(xr_ref[0]), _f32(xi_ref[0]), nx, m, far_ref[:],
                        fai_ref[:], twr_ref[:], twi_ref[:], fbr_ref[:],
                        fbi_ref[:])
    # natural orientation — COMBINE reads (f, x, ky) directly
    or_ref[0] = yr.astype(or_ref.dtype)
    oi_ref[0] = yi.astype(oi_ref.dtype)


# ---------------------------------------------------------------------------
# KC_SW: stacked forward partial y-stage (one field per grid step).
# ---------------------------------------------------------------------------

def _kc_sw_kernel(ny: int, xr_ref, xi_ref,
                  far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                  or_ref, oi_ref):
    a = 64
    b = ny // a
    m = xr_ref.shape[2]
    hk2 = b // 2 + 1
    xr = _f32(xr_ref[0]).reshape(a, b * m)
    xi = _f32(xi_ref[0]).reshape(a, b * m)
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
    or_ref[0] = (rr - ii).reshape(hk2 * a, m)[0:ny // 2 + 1, :].T
    oi_ref[0] = (ri + ir).reshape(hk2 * a, m)[0:ny // 2 + 1, :].T


# ---------------------------------------------------------------------------
# COMBINE: the three dealiased spectral tendencies from the five product
# spectra + state + forcing spectrum, one elementwise pass.
# ---------------------------------------------------------------------------

def _combine_body(nu: float, H: float, has_src: bool,
                  split: Tuple[float, float] | None,
                  pr_ref, pi_ref, zr_ref, zi_ref, dr_ref, di_ref,
                  er_ref, ei_ref, sr_ref, si_ref,
                  kx_ref, ky_ref, lap_ref, mask_ref):
    """The three dealiased tendency plane BLOCKS from the stacked
    product-spectra block + state + forcing refs. split=(f0, grav)
    applies the exact linear terms the product kernels dropped
    (module note): the products are then QU=zeta*u etc. and PHI=KE."""
    # product spectra stacked (5, BLOCK, hny): QU QV EU EV PHI
    # (upcast: they may arrive bf16 under XFB_SW_PSTORE)
    qur, qvr, eur, evr, phr = (_f32(pr_ref[i]) for i in range(5))
    qui, qvi, eui, evi, phi_ = (_f32(pi_ref[i]) for i in range(5))
    kx = kx_ref[:]                           # (BLOCK, 1)
    ky = ky_ref[:]                           # (1, hny)
    lap = lap_ref[:]
    mask = mask_ref[:]
    nulap = nu * lap
    zr, zi = zr_ref[:], zi_ref[:]
    dr, di = dr_ref[:], di_ref[:]
    # dzeta = -(ikx)QU - (iky)QV + nu lap Z (+ S_hat)
    dzr = kx * qui + ky * qvi + nulap * zr
    dzi = -kx * qur - ky * qvr + nulap * zi
    # ddiv = (ikx)QV - (iky)QU - lap PHI + nu lap D
    ddr = -kx * qvi + ky * qui - lap * phr + nulap * dr
    ddi = kx * qvr - ky * qur - lap * phi_ + nulap * di
    if split is not None:
        f0, grav = split
        er, ei = er_ref[:], ei_ref[:]
        # exact linear terms: curl_z(f0 u) = f0*lap*rlap*Z and
        # div(f0 u) = f0*lap*rlap*D vanish at the mean mode (gradients
        # kill it) — hence the nonzero-k guard; lap(g eta) needs none
        # (lap(0,0) = 0)
        fz = f0 * jnp.where(lap != 0.0, 1.0, 0.0)
        dzr = dzr - fz * dr
        dzi = dzi - fz * di
        ddr = ddr + fz * zr - grav * (lap * er)
        ddi = ddi + fz * zi - grav * (lap * ei)
    if has_src:
        dzr = dzr + sr_ref[:]
        dzi = dzi + si_ref[:]
    return (mask * dzr, mask * dzi,
            mask * ddr,
            mask * ddi,
            # deta = -(ikx)EU - (iky)EV - H D
            mask * (kx * eui + ky * evi - H * dr),
            mask * (-kx * eur - ky * evr - H * di))


def _pad_combine_ins(ins, has_src: bool, split):
    """Insert the Nones for absent (er, ei) / (sr, si) refs so
    _combine_body always sees the full 14-ref layout."""
    n_state = 8 if split is not None else 6
    state, rest = ins[:n_state], ins[n_state:]
    if split is None:
        state = state + (None, None)
    if not has_src:
        rest = (None, None) + rest
    return state + rest


def _combine_kernel(nu: float, H: float, has_src: bool, split, *refs):
    n_in = 10 + (2 if has_src else 0) + (2 if split is not None else 0)
    ins, outs = refs[:n_in], refs[n_in:]
    ins = _pad_combine_ins(ins, has_src, split)
    for ref, val in zip(outs, _combine_body(nu, H, has_src, split, *ins)):
        ref[:] = val


def _combine_axpy_kernel(nu: float, H: float, has_src: bool, split,
                         coef: float, *refs):
    """COMBINE fused with the RK stage-state update: also reads the six
    BASE state planes z0 and writes next = z0 + coef * tendency — the
    separate plane_axpy pass (and its re-read of the tendency) vanishes."""
    n_in = 10 + (2 if has_src else 0) + (2 if split is not None else 0)
    ins, z0, outs = refs[:n_in], refs[n_in:n_in + 6], refs[n_in + 6:]
    ins = _pad_combine_ins(ins, has_src, split)
    tend = _combine_body(nu, H, has_src, split, *ins)
    for p in range(6):
        outs[p][:] = tend[p]
        outs[6 + p][:] = z0[p][:] + coef * tend[p]


def _combine_mv_kernel(nu: float, H: float, has_src: bool, split,
                       scale: float, emit_tend: bool, *refs):
    """COMBINE fused with an ETDRK4 stage construction: writes
    stage = z0 + scale * (Q @ tendency) with Q the per-mode 3x3
    phi-coefficient block (models/etdrk4.py) — the tendency is consumed
    in VMEM instead of round-tripping HBM for a separate matvec pass.
    emit_tend=False drops the tendency outputs entirely (the final
    ETDRK4 stage never reads N(cn) again — it need not land in HBM)."""
    n_in = 10 + (2 if has_src else 0) + (2 if split is not None else 0)
    ins = refs[:n_in]
    q_ref = refs[n_in]
    z0 = refs[n_in + 1:n_in + 7]
    outs = refs[n_in + 7:]
    ins = _pad_combine_ins(ins, has_src, split)
    tend = _combine_body(nu, H, has_src, split, *ins)
    if emit_tend:
        for p in range(6):
            outs[p][:] = tend[p]
        outs = outs[6:]
    q = q_ref[:]
    for i in range(3):
        qi0 = scale * q[i, 0]
        qi1 = scale * q[i, 1]
        qi2 = scale * q[i, 2]
        outs[2 * i][:] = (z0[2 * i][:] + qi0 * tend[0]
                          + qi1 * tend[2] + qi2 * tend[4])
        outs[2 * i + 1][:] = (z0[2 * i + 1][:] + qi0 * tend[1]
                              + qi1 * tend[3] + qi2 * tend[5])


def forward_tendencies(u, v, zeta, eta, state_planes, src_planes,
                       kx, ky, lap, mask, f0: float, grav: float,
                       nu: float, H: float, grid_shape, eta_scale=1.0,
                       axpy=None, store=None, mv_axpy=None):
    """Dealiased spectral tendency planes (dz, dd, de) of the SW RHS,
    fully fused: KA_FWD (products + forward x-stages) + KC_SW (forward
    y-stages) + COMBINE (gradients/Laplacians/viscosity/forcing/dealias).

    axpy=(z0_planes, coef) fuses the RK stage-state update into COMBINE
    and returns (tendency_planes, z0 + coef*tendency) instead.
    mv_axpy=(z0_planes, q_table, scale, emit_tend) is the ETDRK4
    analogue (models/etdrk4.py): the epilogue applies the per-mode 3x3
    table, returning (tendency_planes, z0 + scale*(Q @ tendency)) —
    tendency_planes is None when emit_tend=False (the final stage's
    N(cn) never lands in HBM). Mutually exclusive with axpy.

    state_planes: (zr, zi, dr, di, er, ei) of the CURRENT stage state
    (viscosity and the -H*div term use it; the split-linear mode's exact
    f0/gravity terms read zr..ei in COMBINE — see split_linear()).
    src_planes: (sr, si) spectrum of the forcing, or None. eta is
    expected PRE-SCALED by eta_scale (inverse_quad_planes's pairing
    equalizer); KA_FWD unscales in VMEM."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    zr, zi, dr, di, er, ei = state_planes
    split = split_linear()
    # storage dtype of the forward y-stage planes (the x-stage output
    # pr/pi feeding COMBINE stays float32: it is the tendency spectrum)
    st = store if store is not None else store_dtype()

    ies = (1.0 / jnp.asarray(eta_scale, jnp.float32)).reshape(1, 1)
    ies_spec = pl.BlockSpec((1, 1), lambda f, i: (0, 0),
                            memory_space=pltpu.VMEM)
    kc_tabs = [jnp.asarray(t) for t in _kc_tables(ny)]
    kc_tab_spec = [pl.BlockSpec(t.shape, lambda f, i: (0, 0),
                                memory_space=pltpu.VMEM) for t in kc_tabs]
    ka_tabs = [jnp.asarray(t) for t in _ka_tables(nx, forward=True)]
    ka_tab_spec = [pl.BlockSpec(t.shape, lambda f, i: (0, 0),
                                memory_space=pltpu.VMEM) for t in ka_tabs]
    spec_out = pl.BlockSpec((1, BLOCK, hny), lambda f, i: (f, i, 0),
                            memory_space=pltpu.VMEM)

    if YFIRST:
        # --- KY_FWD: products + real-input partial y r2c (y-major in,
        # x-major half-spectrum out) ---
        kyall = ky_all_mode((nx, ny))
        if kyall != "off":
            y1 = pl.BlockSpec((ny, BLOCK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
            ies1 = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
            tabs1 = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for t in kc_tabs]
            out1 = pl.BlockSpec((5, BLOCK, hny), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
            kern = (_ky_all_loop_kernel if kyall == "loop"
                    else _ky_all_kernel)
            g1r, g1i = pl.pallas_call(
                functools.partial(kern, ny, float(f0),
                                  float(grav), split),
                grid=(pl.cdiv(nx, BLOCK),),
                in_specs=[y1] * 4 + [ies1] + tabs1,
                out_specs=(out1, out1),
                out_shape=(jax.ShapeDtypeStruct((5, nx, hny), st),
                           jax.ShapeDtypeStruct((5, nx, hny), st)),
                interpret=_interpret(),
                compiler_params=_compiler_params(),
            )(u, v, zeta, eta, ies, *kc_tabs)
        else:
            kygrid, kyfm = _fgrid(5, pl.cdiv(nx, BLOCK), KY_FMINOR)
            y_in = pl.BlockSpec((ny, BLOCK),
                                lambda a, b: (0, kyfm(a, b)[1]),
                                memory_space=pltpu.VMEM)
            ky_ies = pl.BlockSpec((1, 1), lambda a, b: (0, 0),
                                  memory_space=pltpu.VMEM)
            ky_tabs = [pl.BlockSpec(t.shape, lambda a, b: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for t in kc_tabs]
            ky_out = pl.BlockSpec(
                (1, BLOCK, hny),
                lambda a, b: (kyfm(a, b)[0], kyfm(a, b)[1], 0),
                memory_space=pltpu.VMEM)
            g1r, g1i = pl.pallas_call(
                functools.partial(_ky_fwd_kernel, ny, float(f0),
                                  float(grav), split),
                grid=kygrid,
                in_specs=[y_in] * 4 + [ky_ies] + ky_tabs,
                out_specs=(ky_out, ky_out),
                out_shape=(jax.ShapeDtypeStruct((5, nx, hny), st),
                           jax.ShapeDtypeStruct((5, nx, hny), st)),
                interpret=_interpret(),
                compiler_params=_compiler_params(),
            )(u, v, zeta, eta, ies, *kc_tabs)

        # --- KX_FWD: full x c2c over the hny ~ ny/2 columns only ---
        x_in = pl.BlockSpec((1, nx, BLOCK), lambda f, j: (f, 0, j),
                            memory_space=pltpu.VMEM)
        x_out = pl.BlockSpec((1, nx, BLOCK), lambda f, j: (f, 0, j),
                             memory_space=pltpu.VMEM)
        psd = pstore_dtype()
        pr, pi = pl.pallas_call(
            functools.partial(_kx_fwd_kernel, nx),
            grid=(5, pl.cdiv(hny, BLOCK)),
            in_specs=[x_in, x_in] + ka_tab_spec,
            out_specs=(x_out, x_out),
            out_shape=(jax.ShapeDtypeStruct((5, nx, hny), psd),
                       jax.ShapeDtypeStruct((5, nx, hny), psd)),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(g1r, g1i, *ka_tabs)
    else:
        # --- KA_FWD ---
        f_in = pl.BlockSpec((nx, BLOCK), lambda f, i: (0, i),
                            memory_space=pltpu.VMEM)
        ow_spec = pl.BlockSpec((1, BLOCK, nx), lambda f, i: (f, i, 0),
                               memory_space=pltpu.VMEM)
        f1r, f1i = pl.pallas_call(
            functools.partial(_ka_fwd_kernel, nx, float(f0), float(grav),
                              split),
            grid=(5, pl.cdiv(ny, BLOCK)),
            in_specs=[f_in] * 4 + [ies_spec] + ka_tab_spec,
            out_specs=(ow_spec, ow_spec),
            out_shape=(jax.ShapeDtypeStruct((5, ny, nx), st),
                       jax.ShapeDtypeStruct((5, ny, nx), st)),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(u, v, zeta, eta, ies, *ka_tabs)

        # --- KC_SW ---
        c_in = pl.BlockSpec((1, ny, BLOCK), lambda f, i: (f, 0, i),
                            memory_space=pltpu.VMEM)
        pr, pi = pl.pallas_call(
            functools.partial(_kc_sw_kernel, ny),
            grid=(5, pl.cdiv(nx, BLOCK)),
            in_specs=[c_in, c_in] + kc_tab_spec,
            out_specs=(spec_out, spec_out),
            out_shape=(jax.ShapeDtypeStruct((5, nx, hny), jnp.float32),
                       jax.ShapeDtypeStruct((5, nx, hny), jnp.float32)),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(f1r, f1i, *kc_tabs)

    # --- COMBINE ---
    has_src = src_planes is not None
    # row-block height: full-hny windows are ~10 MB each at 8192^2 and
    # COMBINE reads/writes up to ~20 of them — 64 rows (sublanes need
    # only 8-divisibility) halves every window so the kernel fits the
    # 128 MB core VMEM there (r5 8192^2 ledger); 4096^2 and below keep
    # the measured BLOCK=128 geometry.
    cb = BLOCK if nx <= 4096 else 64
    stk = pl.BlockSpec((5, cb, hny), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((cb, hny), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    kx_spec = pl.BlockSpec((cb, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    ky_spec = pl.BlockSpec((1, hny), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    data = [pr, pi, zr, zi, dr, di]
    specs = [stk, stk, row, row, row, row]
    split_params = (float(f0), float(grav)) if split else None
    if split:
        data += [er, ei]
        specs += [row, row]
    if has_src:
        data += [src_planes[0], src_planes[1]]
        specs += [row, row]
    data += [kx.reshape(nx, 1), ky.reshape(1, hny), lap, mask]
    specs += [kx_spec, ky_spec, row, row]
    plane = jax.ShapeDtypeStruct((nx, hny), jnp.float32)
    if mv_axpy is not None:
        # ETDRK4 stage fusion: stage = z0 + scale * (Q @ tendency)
        # (models/etdrk4.py; _combine_mv_kernel note)
        z0, qtab, scale, emit_tend = mv_axpy
        q_spec = pl.BlockSpec((3, 3, cb, hny), lambda i: (0, 0, i, 0),
                              memory_space=pltpu.VMEM)
        n_out = 12 if emit_tend else 6
        outs = pl.pallas_call(
            functools.partial(_combine_mv_kernel, float(nu), float(H),
                              has_src, split_params, float(scale),
                              bool(emit_tend)),
            grid=(pl.cdiv(nx, cb),),
            in_specs=specs + [q_spec] + [row] * 6,
            out_specs=(row,) * n_out,
            out_shape=(plane,) * n_out,
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(*data, qtab, *z0)
        if emit_tend:
            return outs[:6], outs[6:]
        return None, outs
    if axpy is None:
        return pl.pallas_call(
            functools.partial(_combine_kernel, float(nu), float(H),
                              has_src, split_params),
            grid=(pl.cdiv(nx, cb),),
            in_specs=specs,
            out_specs=(row,) * 6,
            out_shape=(plane,) * 6,
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(*data)       # (dzr, dzi, ddr, ddi, der, dei)
    z0, coef = axpy
    outs = pl.pallas_call(
        functools.partial(_combine_axpy_kernel, float(nu), float(H),
                          has_src, split_params, float(coef)),
        grid=(pl.cdiv(nx, cb),),
        in_specs=specs + [row] * 6,
        out_specs=(row,) * 12,
        out_shape=(plane,) * 12,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*data, *z0)
    return outs[:6], outs[6:]   # (tendency planes, z0 + coef*tendency)


# ---------------------------------------------------------------------------
# RK4 plane arithmetic as Pallas elementwise kernels. XLA elementwise
# measured ~140 GB/s effective on this chip (BASELINE.md); these run at
# HBM speed and matter at 6 planes of SW carry.
# ---------------------------------------------------------------------------

def _axpy_kernel(coef: float, n_planes: int, *refs):
    ins = refs[:2 * n_planes]
    outs = refs[2 * n_planes:]
    for p in range(n_planes):
        outs[p][:] = ins[p][:] + coef * ins[n_planes + p][:]


def plane_axpy(s, r, coef: float):
    """out_p = s_p + coef * r_p over tuples of same-shape planes."""
    n = len(s)
    nx = s[0].shape[0]
    rb = BLOCK if s[0].shape[1] <= 2560 else 64   # VMEM note (COMBINE)
    row = pl.BlockSpec((rb, s[0].shape[1]), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_axpy_kernel, float(coef), n),
        grid=(pl.cdiv(nx, rb),),
        in_specs=[row] * (2 * n),
        out_specs=(row,) * n,
        out_shape=tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in s),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*s, *r)


def _rk4_combine_kernel(c: float, n_planes: int, *refs):
    s0 = refs[0:n_planes]
    r1 = refs[n_planes:2 * n_planes]
    r2 = refs[2 * n_planes:3 * n_planes]
    r3 = refs[3 * n_planes:4 * n_planes]
    r4 = refs[4 * n_planes:5 * n_planes]
    outs = refs[5 * n_planes:]
    for p in range(n_planes):
        outs[p][:] = s0[p][:] + (r1[p][:] + 2.0 * r2[p][:]
                                 + 2.0 * r3[p][:] + r4[p][:]) * c


def plane_rk4_combine(s0, r1, r2, r3, r4, c: float):
    """out_p = s0_p + (r1_p + 2 r2_p + 2 r3_p + r4_p) * c (c = dt/6),
    the RK4 tail (main.cpp:309-312) over tuples of same-shape planes."""
    n = len(s0)
    nx = s0[0].shape[0]
    rb = BLOCK if s0[0].shape[1] <= 2560 else 64  # VMEM note (COMBINE)
    row = pl.BlockSpec((rb, s0[0].shape[1]), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rk4_combine_kernel, float(c), n),
        grid=(pl.cdiv(nx, rb),),
        in_specs=[row] * (5 * n),
        out_specs=(row,) * n,
        out_shape=tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in s0),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*s0, *r1, *r2, *r3, *r4)


def forward_planes(x):
    """Unnormalized forward rfft2 of a real field, returned as (re, im)
    float32 planes (nx, hny) — the source spectrum is computed ONCE per
    segment (forcing is fixed across RK stages AND steps within a
    segment, main-shallow-water.cpp:304) and fed to COMBINE as planes so
    no complex array enters the scan."""
    from .pallas_fft import _ka_call, _kc_call
    nx, ny = x.shape
    f1t = _ka_call(x, None, nx, forward=True, real_input=True)
    return _kc_call(f1t, ny)
