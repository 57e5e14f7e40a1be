"""Fused Pallas plane-state pipeline for the passive-tracer family.

The tracer model (models/tracer.py: joint barotropic flow + advected
scalar q, the prognostic closure of the reference's advertised-but-
unimplemented eddy-diffusivity diagnostic, /root/reference/README.md:6)
ran only on the per-transform XLA path. This gives it the same
treatment as the barotropic core (ops/pallas_fft.py) and SW
(ops/pallas_sw.py): per RK stage,

  KA6     grid (6, cols): ONE kernel emits the x-stages of all six
          derivative spectra — (i kx Z, i ky Z, -i ky psi, i kx psi,
          i kx Q, i ky Q) — reading the stacked state planes
          (2, nx, hny) = [zeta_hat | q_hat] with the state index a pure
          function of the field index (f // 4), the per-field diagonal
          DATA (stacked separable factors + rlap exponent selector: the
          compile-friendly KA4 lesson, BASELINE.md).
  KB x2   (pallas_fft._kb_call_stacked): paired c2r y-stages ->
          y-major (zeta_x, zeta_y) and (q_x, q_y).
  KB_ADV  one kernel runs the (u, v) KB pair in VMEM, BOTH advection
          products (-u zx - v (zy + beta) + S and -u qx - v qy), and
          TWO real partial y r2c's -> stacked (2, nx, hny) planes; the
          velocities never land in HBM (the barotropic 'half' fusion,
          extended).
  KX+VISC grid (2, cols): x c2c + the per-field diffusion epilogue
          r = mask * (F + lapS * state) with the STACKED diffusion
          table lapS = [nu*lap - r_drag - nu4*lap^2 | kappa*lap] (the
          exact table-fold trick of models/barotropic.py:build), fused
          with the RK stage axpy (pallas_fft FUSEKX, adopted).

The scan carry is the stacked float32 planes (2, nx, hny) x2 (re, im);
RK plane arithmetic runs on their free (2*nx, hny) reshape views
through pallas_sw's plane kernels. Same numerics contract as
models/tracer.py:rk4_step (dealiased tendencies, state never dealiased,
src fixed across stages — SURVEY.md §5); differentially pinned against
the XLA tracer core in tests/test_pallas_tracer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fft import (BLOCK, _compiler_params, _f32, _four_step,
                         _interpret, _ka_tables, _kb_call_stacked,
                         _kb_compute, _kb_tables, _kc_body, _kc_tables,
                         _visc_epilogue, store_dtype)


# ---------------------------------------------------------------------------
# KA6: grid-over-fields inverse x-stage of the six derivative spectra.
# ---------------------------------------------------------------------------

def _ka6_kernel(n: int, sr_ref, si_ref, rlap_ref,
                ar_ref, ai_ref, br_ref, bi_ref, e_ref,
                far_ref, fai_ref, twr_ref, twi_ref, fbr_ref, fbi_ref,
                owr_ref, owi_ref):
    """One four-step inverse transform of D * S[state(f)] — the
    stacked-state twin of pallas_fft._ka_diag_kernel (the transform
    math lives in the shared pallas_fft._ka_diag_compute)."""
    from .pallas_fft import _ka_diag_compute
    yrt, yit = _ka_diag_compute(
        n, sr_ref[0], si_ref[0], rlap_ref[:],
        ar_ref[0], ai_ref[0], br_ref[0], bi_ref[0], e_ref[0],
        (far_ref[:], fai_ref[:], twr_ref[:], twi_ref[:], fbr_ref[:],
         fbi_ref[:]))
    owr_ref[0] = yrt.astype(owr_ref.dtype)
    owi_ref[0] = yit.astype(owi_ref.dtype)


def _tracer_factors(kx, ky, nx, hny):
    """Stacked per-field diagonal factors for the six fields
    (i kx Z, i ky Z, -i ky psi, i kx psi, i kx Q, i ky Q)."""
    one_r = jnp.ones((nx, 1), jnp.float32)
    zero_r = jnp.zeros((nx, 1), jnp.float32)
    one_c = jnp.ones((1, hny), jnp.float32)
    zero_c = jnp.zeros((1, hny), jnp.float32)
    kxc = kx.reshape(nx, 1)
    kyc = ky.reshape(1, hny)
    ar = jnp.stack([zero_r, one_r, one_r, zero_r, zero_r, one_r])
    ai = jnp.stack([kxc, zero_r, zero_r, kxc, kxc, zero_r])
    br = jnp.stack([one_c, zero_c, zero_c, one_c, one_c, zero_c])
    bi = jnp.stack([zero_c, kyc, -kyc, zero_c, zero_c, kyc])
    e = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0, 0.0],
                    jnp.float32).reshape(6, 1, 1)
    return ar, ai, br, bi, e


def tracer_xstage_planes(sr2, si2, kx, ky, rlap, grid_shape, store=None):
    """Stacked states (2, nx, hny) -> stacked mixed-domain planes
    (6, hny, nx) of the six derivative x-stages, one kernel."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    tables = [jnp.asarray(t) for t in _ka_tables(nx, forward=False)]
    ar, ai, br, bi, e = _tracer_factors(kx, ky, nx, hny)
    state_spec = pl.BlockSpec((1, nx, BLOCK), lambda f, c: (f // 4, 0, c),
                              memory_space=pltpu.VMEM)
    rlap_spec = pl.BlockSpec((nx, BLOCK), lambda f, c: (0, c),
                             memory_space=pltpu.VMEM)
    rvec = pl.BlockSpec((1, nx, 1), lambda f, c: (f, 0, 0),
                        memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((1, 1, BLOCK), lambda f, c: (f, 0, c),
                        memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((1, 1, 1), lambda f, c: (f, 0, 0),
                          memory_space=pltpu.VMEM)
    t_spec = [pl.BlockSpec(t.shape, lambda f, c: (0, 0),
                           memory_space=pltpu.VMEM) for t in tables]
    ow_spec = pl.BlockSpec((1, BLOCK, nx), lambda f, c: (f, c, 0),
                           memory_space=pltpu.VMEM)
    sd = store if store is not None else store_dtype()
    return pl.pallas_call(
        functools.partial(_ka6_kernel, nx),
        grid=(6, pl.cdiv(hny, BLOCK)),
        in_specs=[state_spec, state_spec, rlap_spec,
                  rvec, rvec, cvec, cvec, e_spec] + t_spec,
        out_specs=(ow_spec, ow_spec),
        out_shape=(jax.ShapeDtypeStruct((6, hny, nx), sd),
                   jax.ShapeDtypeStruct((6, hny, nx), sd)),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(sr2, si2, rlap, ar, ai, br, bi, e, *tables)


# ---------------------------------------------------------------------------
# KB_ADV (tracer): (u, v) pair in VMEM + both advection products + two
# real partial y r2c's.
# ---------------------------------------------------------------------------

def _kb_adv_tracer_kernel(ny: int, beta: float, has_src: bool, *refs):
    (zx_ref, zy_ref, qx_ref, qy_ref, w2r, w2i, w3r, w3i) = refs[:8]
    rest = refs[8:]
    src_ref = rest[0] if has_src else None
    rest = rest[1 if has_src else 0:]
    kb = rest[:11]
    kc = rest[11:17]
    or_ref, oi_ref = rest[17:]
    half = ny // 2

    def fld(r):
        return _f32(r[0, 0:half + 1, :])

    u, v = _kb_compute(ny, fld(w2r), fld(w2i), fld(w3r), fld(w3i), *kb)
    zy = _f32(zy_ref[:]) + beta if beta != 0.0 else _f32(zy_ref[:])
    adv_z = -(u * _f32(zx_ref[:])) - v * zy
    if has_src:
        adv_z = adv_z + src_ref[:]
    adv_q = -(u * _f32(qx_ref[:])) - v * _f32(qy_ref[:])
    kc_arrays = tuple(t[:] for t in kc)
    yzr, yzi = _kc_body(ny, adv_z, None, *kc_arrays)
    yqr, yqi = _kc_body(ny, adv_q, None, *kc_arrays)
    or_ref[0] = yzr.T.astype(or_ref.dtype)
    oi_ref[0] = yzi.T.astype(oi_ref.dtype)
    or_ref[1] = yqr.T.astype(or_ref.dtype)
    oi_ref[1] = yqi.T.astype(oi_ref.dtype)


def kb_adv_tracer(zx, zy, qx, qy, wr, wi, src, grid_shape,
                  beta: float = 0.0, store=None):
    """y-major gradients + the stacked w (fields 2, 3 = u, v x-stages)
    + y-major src -> stacked (2, nx, hny) forward y-stage planes of
    (d zeta advective tendency, d q advective tendency)."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    scale = 1.0 / (nx * ny)
    kb_tables = [jnp.asarray(t) for t in _kb_tables(ny, scale)]
    kc_tables = [jnp.asarray(t) for t in _kc_tables(ny)]
    has_src = src is not None

    def fspec(f):
        return pl.BlockSpec((1, hny, BLOCK), lambda i, f=f: (f, 0, i),
                            memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((ny, BLOCK), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    tab_spec = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for t in kb_tables + kc_tables]
    out_spec = pl.BlockSpec((2, BLOCK, hny), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    sd = store if store is not None else store_dtype()
    plane = jax.ShapeDtypeStruct((2, nx, hny), sd)
    ins = [zx, zy, qx, qy, wr, wi, wr, wi]
    specs = [y_spec] * 4 + [fspec(2), fspec(2), fspec(3), fspec(3)]
    if has_src:
        ins.append(src)
        specs.append(y_spec)
    return pl.pallas_call(
        functools.partial(_kb_adv_tracer_kernel, ny, float(beta),
                          has_src),
        grid=(pl.cdiv(nx, BLOCK),),
        in_specs=specs + tab_spec,
        out_specs=(out_spec, out_spec),
        out_shape=(plane, plane),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*ins, *kb_tables, *kc_tables)


# ---------------------------------------------------------------------------
# KX+VISC (tracer): stacked x c2c + per-field diffusion epilogue (+ RK
# stage axpy), the FUSEKX tail with a leading field dimension.
# ---------------------------------------------------------------------------

def _kx_visc_tracer_kernel(nx: int, coef, xr_ref, xi_ref,
                           lap2_ref, mask_ref, zs_r, zs_i, *rest):
    m = xr_ref.shape[2]
    n_tab = 6
    tabs = rest[:n_tab]
    if coef is not None:
        z0r_ref, z0i_ref = rest[n_tab:n_tab + 2]
        outs = rest[n_tab + 2:]
    else:
        outs = rest[n_tab:]
    yr, yi = _four_step(_f32(xr_ref[0]), _f32(xi_ref[0]), nx, m,
                        *(t[:] for t in tabs))
    # nu is folded into the stacked lap table (lapS = nu*lap - r - ...
    # for the flow slot, kappa*lap for the tracer slot)
    rr, ri = _visc_epilogue(1.0, yr, yi, lap2_ref[0], mask_ref[:],
                            zs_r[0], zs_i[0])
    outs[0][0] = rr
    outs[1][0] = ri
    if coef is not None:
        outs[2][0] = z0r_ref[0] + coef * rr
        outs[3][0] = z0i_ref[0] + coef * ri


def forward_tail_tracer(fr, fi, lap2, mask, sr2, si2, grid_shape,
                        axpy=None):
    """Stacked forward y-stage planes (2, nx, hny) -> dealiased
    diffusive tendencies (and optionally the axpy'd next stage state):
    KX x c2c + per-field epilogue in one kernel."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    hny = ny // 2 + 1
    ka_tables = [jnp.asarray(t) for t in _ka_tables(nx, forward=True)]
    fcol = pl.BlockSpec((1, nx, BLOCK), lambda f, j: (f, 0, j),
                        memory_space=pltpu.VMEM)
    mcol = pl.BlockSpec((nx, BLOCK), lambda f, j: (0, j),
                        memory_space=pltpu.VMEM)
    t_spec = [pl.BlockSpec(t.shape, lambda f, j: (0, 0),
                           memory_space=pltpu.VMEM) for t in ka_tables]
    plane = jax.ShapeDtypeStruct((2, nx, hny), jnp.float32)
    if axpy is None:
        ins = (fr, fi, lap2, mask, sr2, si2, *ka_tables)
        specs = [fcol, fcol, fcol, mcol, fcol, fcol] + t_spec
        n_out, coef = 2, None
    else:
        z0r, z0i, coef = axpy
        ins = (fr, fi, lap2, mask, sr2, si2, *ka_tables, z0r, z0i)
        specs = [fcol, fcol, fcol, mcol, fcol, fcol] + t_spec + [fcol, fcol]
        n_out = 4
    outs = pl.pallas_call(
        functools.partial(_kx_visc_tracer_kernel, nx,
                          None if coef is None else float(coef)),
        grid=(2, pl.cdiv(hny, BLOCK)),
        in_specs=specs,
        out_specs=(fcol,) * n_out,
        out_shape=(plane,) * n_out,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*ins)
    return outs


def tendency_tracer_planes(sr2, si2, src, kx, ky, rlap, lap2, mask,
                           grid_shape, axpy=None, beta: float = 0.0):
    """One full RK-stage tendency of the joint (zeta, q) system on
    stacked planes: KA6 -> 2x KB -> KB_ADV -> KX+VISC."""
    nx, ny = grid_shape[-2], grid_shape[-1]
    st = store_dtype()
    wr, wi = tracer_xstage_planes(sr2, si2, kx, ky, rlap, grid_shape,
                                  store=st)
    scale = 1.0 / (nx * ny)
    zx, zy = _kb_call_stacked(wr, wi, 0, 1, ny, scale,
                              transpose_out=False, store=st)
    qx, qy = _kb_call_stacked(wr, wi, 4, 5, ny, scale,
                              transpose_out=False, store=st)
    fr, fi = kb_adv_tracer(zx, zy, qx, qy, wr, wi, src, grid_shape,
                           beta=beta, store=st)
    return forward_tail_tracer(fr, fi, lap2, mask, sr2, si2, grid_shape,
                               axpy=axpy)


def _flat(p):
    """(2, nx, hny) -> (2*nx, hny) view for the plane RK kernels."""
    return p.reshape(p.shape[0] * p.shape[1], p.shape[2])


def _unflat(p, nx):
    return p.reshape(2, nx, p.shape[1])


def rk4_step_tracer_planes(t, sr2, si2, src, dt: float, lap2,
                           grid_shape, beta: float = 0.0):
    """RK4 on the stacked tracer state planes — the fully fused Pallas
    path. Same math as models/tracer.py:rk4_step (per-stage dealiased
    tendencies, src fixed across stages); diffusion/drag/hyperviscosity
    ride the stacked lap2 table fold."""
    from . import pallas_sw as psw

    nx = grid_shape[-2]
    h = dt * 0.5

    def d(ar, ai, axpy=None):
        return tendency_tracer_planes(ar, ai, src, t.kx, t.ky, t.rlap,
                                      lap2, t.mask, grid_shape,
                                      axpy=axpy, beta=beta)

    r1r, r1i, s2r, s2i = d(sr2, si2, axpy=(sr2, si2, h))
    r2r, r2i, s3r, s3i = d(s2r, s2i, axpy=(sr2, si2, h))
    r3r, r3i, s4r, s4i = d(s3r, s3i, axpy=(sr2, si2, dt))
    r4r, r4i = d(s4r, s4i)
    out = psw.plane_rk4_combine(
        (_flat(sr2), _flat(si2)), (_flat(r1r), _flat(r1i)),
        (_flat(r2r), _flat(r2i)), (_flat(r3r), _flat(r3i)),
        (_flat(r4r), _flat(r4i)), dt / 6.0)
    return _unflat(out[0], nx), _unflat(out[1], nx)
