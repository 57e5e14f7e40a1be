"""Barotropic vorticity model — the flagship dynamical core.

TPU-native re-design of the reference drivers main.cpp (unforced) and
main-shallow-water.cpp (forced; despite its name it integrates the same 2-D
barotropic vorticity equation — see /root/reference/TODO.md:5 and
SURVEY.md C6). Where the reference hand-schedules 19 fftwf buffers, 8 FFTW
plans and memcpy backup/restore around destructive c2r transforms
(main.cpp:103-135, 272-281), here the entire RK4 step is one pure function
of the spectral state, traced once by XLA and scanned over time — XLA owns
buffer allocation, fusion of pointwise stages into FFT epilogues, and
transparent sharding when the inputs carry a NamedSharding.

Equation (main.cpp:225-243):
    d zeta / dt = -u * zeta_x - v * zeta_y + S + nu * lap(zeta)
with u = -psi_y, v = +psi_x, lap(psi) = zeta, advanced by classic RK4 on the
half-spectrum state zeta_hat (complex64, shape (nx, ny//2+1)); each stage
tendency is dealiased (main.cpp:296-306), the state itself never is.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import fft
from ..ops import spectral as sp
from ..ops.spectral import SpectralTables


# Route the pallas backend through the fully fused plane-state stepper
# (rk4_step_planes: derivative_quad + fused forward_tendency, float32-
# plane scan carry). With the grid-over-fields KA restructure
# (ops/pallas_fft.py:QUAD_MODE='grid') the Mosaic compile cost is normal
# (~80 s for the whole 4096^2 scan segment vs the 9-minute pathology of
# the unrolled 4-transform body) and the measured step is 44.0 ms at
# 4096^2 — 381 M gp/s/chip, 1.16x the per-transform fused pipeline,
# 1.73x the XLA-FFT core, with a bit-identical 30-step checksum
# (BASELINE.md ledger, 2026-08-17). ON by default up to
# PLANE_STEPPER_MAX = 8192 since round 5: the loop-chunked KB/KC
# bodies (+ split KA_SW and narrow COMBINE rows for SW) fit the
# 8192^2 compile that OOM-SIGKILLed the AOT helper in r2-r4, measured
# 3.96x/4.07x/4.34x the XLA core in fast mode (bt/SW/tracer) and
# 2.00x in fp32 barotropic (r5 ledger). Whether pallas is actually
# SELECTED at a size is the resolve_fft_backend_name gate's call
# (fp32 SW/tracer capped at 4096: measured VMEM rejections).
PLANE_STEPPER = True
PLANE_STEPPER_MAX = 8192


def _plane_stepper_max() -> int:
    import os
    return int(os.environ.get("XFB_PLANE_STEPPER_MAX", PLANE_STEPPER_MAX))


def _fused_rk() -> bool:
    """Fuse the RK stage-state axpy into the VISC epilogue and run the
    RK tail as a Pallas plane combine (y-first path only)."""
    import os
    return os.environ.get("XFB_BT_FUSED_RK", "1") != "0"


def use_plane_stepper(grid_shape) -> bool:
    return (PLANE_STEPPER
            and max(grid_shape) <= _plane_stepper_max())


def resolve_fft_backend_name(name: str, grid_shape=None,
                             family: str = "barotropic") -> str:
    """Resolve 'auto' to a concrete backend name for this
    process/grid/family.

    Measured crossovers (BASELINE.md): the fused Pallas pipeline wins
    decisively at 4096^2 (1.73x fp32 / 3.7x fast with the plane
    stepper) but loses to XLA's FFT at 2048^2 fp32 (0.90x); in fast
    mode the floor drops to 1024^2 (1.32x there). The 8192^2 ceiling
    lifted in round 5 (loop-chunked kernel bodies + split KA_SW +
    narrow COMBINE rows): measured vs the XLA core there — fast mode
    3.96x bt / 4.07x SW / 4.34x tracer, fp32-HIGHEST 2.00x bt — so
    those caps are 8192. fp32 SW and fp32 tracer at 8192^2 REJECTED
    on measurement: the HIGHEST decomposition's extra operand buffers
    push the KA_SW pair (150.9 MB) and the 6-field tracer KA6 kernel
    (133.1 MB) past the 128 MB core VMEM — their caps stay 4096
    (r5 ledger, 2026-08-21).
    """
    if name != "auto":
        return name
    import os
    import sys
    nx, ny = (grid_shape if grid_shape is not None else (0, 0))
    # Range gate, not equality. XFB_PALLAS_MIN / XFB_PALLAS_MAX
    # override; explicit --fft-backend pallas bypasses the gate.
    mm = os.environ.get("XFB_PALLAS_MM", "fp32")
    pf = sys.modules.get("xlab_fftbarotropic_tpu.ops.pallas_fft")
    if pf is not None:      # in-process override (cli --fast-transforms)
        mm = pf.MM_MODE
    fast = mm in ("bf16", "default")
    lo = int(os.environ.get("XFB_PALLAS_MIN", 1024 if fast else 4096))
    if fast:
        hi_default = 8192 if family in ("barotropic", "sw",
                                        "tracer") else 4096
    else:
        hi_default = 8192 if family == "barotropic" else 4096
    hi = int(os.environ.get("XFB_PALLAS_MAX", hi_default))
    pallas_ok = (nx == ny and lo <= nx <= hi and nx & (nx - 1) == 0)
    if pallas_ok and jax.default_backend() == "tpu":
        return "pallas"
    return "xla"


def resolve_fft_backend(name: str, grid_shape=None):
    """(forward, inverse, inverse_pair, derivative_quad) for a
    ModelConfig.fft_backend name; derivative_quad is None unless the
    backend offers the fused (zeta_x, zeta_y, u, v) pipeline.

    'xla' is jnp.fft (ops/fft.py); 'mxu' is the einsum matmul four-step
    FFT (ops/mxu_fft.py); 'pallas' is the fused VMEM-resident kernel
    pipeline (ops/pallas_fft.py — with the plane stepper, measured 1.73x
    the XLA core at 4096^2). 'auto' picks 'pallas' on a real TPU
    backend over the measured range (resolve_fft_backend_name: floor
    4096 fp32 / 1024 fast, cap 8192 for fast barotropic/SW, else
    4096) and 'xla' everywhere else. All honor the FFTW normalization contract
    (SURVEY.md §5.2) and agree to float32 round-off.
    """
    name = resolve_fft_backend_name(name, grid_shape)
    if name == "mxu":
        from ..ops import mxu_fft
        return (mxu_fft.rfft2,
                lambda s, g: mxu_fft.irfft2(s, s=g),
                mxu_fft.inverse_pair, None)
    if name == "pallas":
        from ..ops import pallas_fft

        def quad(t, zeta_hat, grid_shape):
            return pallas_fft.derivative_quad(zeta_hat, t.kx, t.ky,
                                              t.rlap, grid_shape)
        return (pallas_fft.rfft2, pallas_fft.irfft2,
                pallas_fft.inverse_pair,
                quad if use_plane_stepper(grid_shape or (0, 0)) else None)
    if name == "xla":
        return fft.forward, fft.inverse, fft.inverse_pair, None
    raise ValueError(f"unknown fft_backend: {name!r}")


class DiagFields(NamedTuple):
    """Physical-space fields recorded every record_step (SURVEY.md §5.9)."""
    vort: jax.Array
    psi: jax.Array
    u: jax.Array
    v: jax.Array


def tendency(t: SpectralTables, zeta_hat: jax.Array, src: jax.Array,
             nu: float, grid_shape: Tuple[int, int],
             fwd: Callable = fft.forward,
             inv: Callable = fft.inverse,
             inv_pair: Optional[Callable] = None,
             deriv_quad: Optional[Callable] = None,
             r_drag: float = 0.0, beta: float = 0.0,
             nu4: float = 0.0) -> jax.Array:
    """getDvortdt (main.cpp:146-244): un-dealiased spectral tendency.

    4 inverse + 1 forward FFT per call; the pointwise advection stage
    (-u*zeta_x - v*zeta_y + S, main.cpp:225-227) is a single fused VPU
    expression XLA merges into the surrounding transforms.

    `fwd`/`inv` are the FFT pair — the single-device jnp.fft wrappers by
    default, or the shard_map-local distributed transforms from
    parallel/dfft.py when called inside a sharded step. On the default
    (single-device) path the four inverse transforms are PAIRED into two
    complex ifft2 calls via Hermitian packing (ops/fft.py:inverse_pair) —
    measured 15% faster per step at 2048^2 on TPU. (Stacking them into one
    batched irfft2 instead was measured 21% SLOWER at 4096^2 — XLA's
    batched FFT lowering pipelines worse than independent transforms.)
    """
    # nu == 0 is a static trace-time branch (the ETDRK4 N carries all
    # linear terms in its tables); nu != 0 traces the exact reference
    # expression
    lvort_hat = sp.laplacian(t, zeta_hat) if nu != 0.0 or nu4 != 0.0 \
        else None                                    # main.cpp:148
    if deriv_quad is not None:
        # fused pipeline: one read of zeta_hat, no derivative spectra in
        # HBM (ops/pallas_fft.py:derivative_quad)
        dvdx, dvdy, u, v = deriv_quad(t, zeta_hat, grid_shape)
    else:
        psi_hat = sp.invert_laplacian(t, zeta_hat)   # main.cpp:179
        if inv_pair is None and inv is fft.inverse:
            inv_pair = fft.inverse_pair
        if inv_pair is not None:
            # zeta_x, zeta_y (main.cpp:151-168) | u=-psi_y, v=psi_x
            # (:198-214)
            dvdx, dvdy = inv_pair(sp.gradx(t, zeta_hat),
                                  sp.grady(t, zeta_hat), grid_shape)
            u, v = inv_pair(-sp.grady(t, psi_hat),
                            sp.gradx(t, psi_hat), grid_shape)
        else:
            dvdx = inv(sp.gradx(t, zeta_hat), grid_shape)
            dvdy = inv(sp.grady(t, zeta_hat), grid_shape)
            u = -inv(sp.grady(t, psi_hat), grid_shape)
            v = inv(sp.gradx(t, psi_hat), grid_shape)
    if beta != 0.0:
        # beta-plane planetary-vorticity advection -beta*v folded into
        # the advection product: -u*zx - v*zy - beta*v =
        # -u*zx - v*(zy + beta). Static branch: beta=0 traces the exact
        # f-plane expression (bit-identical reference contract).
        dvdy = dvdy + beta
    dvortdt = -u * dvdx - v * dvdy + src             # main.cpp:225-227
    dvortdt_hat = fwd(dvortdt)                       # main.cpp:237
    out = (dvortdt_hat + lvort_hat * nu if nu != 0.0
           else dvortdt_hat)                         # main.cpp:240-243
    if r_drag != 0.0:
        # boundary-layer feedback (reference TODO.md:11, never
        # implemented there): Ekman/Rayleigh spin-down -r*zeta, applied
        # to the stage state like the viscous term. Static branch: the
        # default r_drag=0 traces the exact pre-drag computation.
        out = out - zeta_hat * r_drag
    if nu4 != 0.0:
        # biharmonic hyperviscosity -nu4*lap^2(zeta) (config.py nu4
        # note): an exact spectral diagonal, lap applied to the already
        # computed lap*zeta. Static branch when 0.
        out = out - sp.laplacian(t, lvort_hat) * nu4
    return out


def rk4_step(t: SpectralTables, zeta_hat: jax.Array, src: jax.Array,
             dt: float, nu: float, grid_shape: Tuple[int, int],
             fwd: Callable = fft.forward,
             inv: Callable = fft.inverse,
             inv_pair: Optional[Callable] = None,
             deriv_quad: Optional[Callable] = None,
             r_drag: float = 0.0, beta: float = 0.0,
             nu4: float = 0.0) -> jax.Array:
    """One RK4 step on zeta_hat (main.cpp:286-317).

    Each stage tendency is dealiased before use (main.cpp:296-306); the
    forcing src is held fixed across the 4 stages, refreshed at most once per
    step by the caller (main-shallow-water.cpp:304).
    """
    d = functools.partial(tendency, t, src=src, nu=nu, grid_shape=grid_shape,
                          fwd=fwd, inv=inv, inv_pair=inv_pair,
                          deriv_quad=deriv_quad, r_drag=r_drag, beta=beta,
                          nu4=nu4)
    rk1 = sp.dealias(t, d(zeta_hat))
    rk2 = sp.dealias(t, d(zeta_hat + rk1 * (dt * 0.5)))
    rk3 = sp.dealias(t, d(zeta_hat + rk2 * (dt * 0.5)))
    rk4 = sp.dealias(t, d(zeta_hat + rk3 * dt))
    return zeta_hat + (rk1 + 2.0 * rk2 + 2.0 * rk3 + rk4) * (dt / 6.0)


def rk4_step_planes(t: SpectralTables, zr: jax.Array, zi: jax.Array,
                    src: jax.Array, dt: float, nu: float,
                    grid_shape: Tuple[int, int], beta: float = 0.0):
    """RK4 on the spectral state as (re, im) float32 PLANES — the fully
    fused Pallas path: derivative_quad_planes + forward_tendency per
    stage, RK combines as plain plane arithmetic. No complex64 array and
    no real/imag extraction exists anywhere inside the scan; the
    conversion happens once per segment at the jit boundary.

    Same math as rk4_step (main.cpp:286-317): each stage tendency is
    viscous + dealiased inside forward_tendency's epilogue.

    With pallas_fft.fwd_yfirst_active() (default), `src` must arrive
    Y-MAJOR (ny, nx) — callers transpose it ONCE per jit call, outside
    the scan (see BarotropicModel.build), so the hot loop never pays the
    flip; the physical intermediates flow y-major for free via KB's
    folded write and the forward pipeline runs y-first.
    """
    from ..ops import pallas_fft as pf

    yfirst = pf.fwd_yfirst_active()
    fusekb = pf.fusekb_mode() if yfirst else ""
    h = dt * 0.5

    def d(sr, si, axpy=None, tail=None):
        if fusekb:
            # KB+advection fusion: the four physical fields never land
            # in HBM (ops/pallas_fft.py KB_ADV section)
            return pf.tendency_yfirst_fusedkb(
                sr, si, src, t.kx, t.ky, t.rlap, t.lap, t.mask, nu,
                grid_shape, axpy=axpy, mode=fusekb, beta=beta,
                tail=tail)
        dvdx, dvdy, u, v = pf.derivative_quad_planes(
            sr, si, t.kx, t.ky, t.rlap, grid_shape, ymajor=yfirst)
        if yfirst:
            return pf.forward_tendency_yfirst(
                u, dvdx, v, dvdy, src, t.lap, t.mask, sr, si, nu,
                grid_shape, axpy=axpy, beta=beta, tail=tail)
        return pf.forward_tendency(u, dvdx, v, dvdy, src, t.lap, t.mask,
                                   sr, si, nu, grid_shape, beta=beta)

    if yfirst and _fused_rk():
        # stage updates fused into the VISC epilogue and the RK tail as
        # a Pallas plane combine: no XLA elementwise inside the loop
        from ..ops import pallas_sw as psw
        r1r, r1i, s2r, s2i = d(zr, zi, axpy=(zr, zi, h))
        r2r, r2i, s3r, s3i = d(s2r, s2i, axpy=(zr, zi, h))
        r3r, r3i, s4r, s4i = d(s3r, s3i, axpy=(zr, zi, dt))
        if pf.fusetail_on() and pf.fusekx_on(grid_shape[0]):
            # RK4 tail rides the stage-4 KX epilogue: r4 never lands in
            # HBM and the plane_rk4_combine pass disappears
            # (_kx_visc_tail_kernel; bit-identical grouping)
            return d(s4r, s4i,
                     tail=(zr, zi, r1r, r1i, r2r, r2i, r3r, r3i,
                           dt / 6.0))
        r4r, r4i = d(s4r, s4i)
        return psw.plane_rk4_combine(
            (zr, zi), (r1r, r1i), (r2r, r2i), (r3r, r3i), (r4r, r4i),
            dt / 6.0)

    r1r, r1i = d(zr, zi)
    r2r, r2i = d(zr + r1r * h, zi + r1i * h)
    r3r, r3i = d(zr + r2r * h, zi + r2i * h)
    r4r, r4i = d(zr + r3r * dt, zi + r3i * dt)
    c = dt / 6.0
    return (zr + (r1r + 2.0 * r2r + 2.0 * r3r + r4r) * c,
            zi + (r1i + 2.0 * r2i + 2.0 * r3i + r4i) * c)


def diag_fields(t: SpectralTables, zeta_hat: jax.Array,
                grid_shape: Tuple[int, int],
                inv: Callable = fft.inverse) -> DiagFields:
    """Step-start physical fields: the record block (main.cpp:266-282) plus
    the first RK stage's psi/u/v dumps (main.cpp:181-222)."""
    psi_hat = sp.invert_laplacian(t, zeta_hat)
    u_hat, v_hat = sp.velocities(t, psi_hat)
    return DiagFields(
        vort=inv(zeta_hat, grid_shape),
        psi=inv(psi_hat, grid_shape),
        u=inv(u_hat, grid_shape),
        v=inv(v_hat, grid_shape),
    )


class DebugFields(NamedTuple):
    """The reference's debug-output-as-test dumps (SURVEY.md §4): the
    OUTPUT_GRAD_VORT / OUTPUT_DVORTDT #ifdef blocks of main.cpp:156-162,
    170-176 and 216-222 write, at each record step from the FIRST RK
    stage's RHS evaluation, the physical zeta gradients and the advective
    tendency -u*zeta_x - v*zeta_y + S as it stands BEFORE the forward
    transform and the spectral viscosity add."""
    dvortdx: jax.Array
    dvortdy: jax.Array
    dvortdt: jax.Array


def debug_fields(t: SpectralTables, zeta_hat: jax.Array, src: jax.Array,
                 grid_shape: Tuple[int, int],
                 inv: Callable = fft.inverse,
                 beta: float = 0.0) -> DebugFields:
    """Step-start debug intermediates (main.cpp:156-176, 216-222)."""
    dvdx = inv(sp.gradx(t, zeta_hat), grid_shape)
    dvdy = inv(sp.grady(t, zeta_hat), grid_shape)
    psi_hat = sp.invert_laplacian(t, zeta_hat)
    u = -inv(sp.grady(t, psi_hat), grid_shape)
    v = inv(sp.gradx(t, psi_hat), grid_shape)
    adv_y = dvdy + beta if beta != 0.0 else dvdy
    return DebugFields(dvortdx=dvdx, dvortdy=dvdy,
                       dvortdt=-u * dvdx - v * adv_y + src)


class StepStats(NamedTuple):
    """Cheap per-step scalars (new capability; SURVEY.md §6 observability)."""
    max_abs_vort: jax.Array
    energy: jax.Array      # 0.5 * mean(u^2 + v^2)
    enstrophy: jax.Array   # 0.5 * mean(zeta^2)
    cfl: jax.Array         # max(|u|/dx + |v|/dy) * dt


def step_stats(t: SpectralTables, zeta_hat: jax.Array, cfg: ModelConfig) -> StepStats:
    g = cfg.grid_shape
    psi_hat = sp.invert_laplacian(t, zeta_hat)
    u_hat, v_hat = sp.velocities(t, psi_hat)
    u = fft.inverse(u_hat, g)
    v = fft.inverse(v_hat, g)
    vort = fft.inverse(zeta_hat, g)
    return StepStats(
        max_abs_vort=jnp.max(jnp.abs(vort)),
        energy=0.5 * jnp.mean(u * u + v * v),
        enstrophy=0.5 * jnp.mean(vort * vort),
        cfl=jnp.max(jnp.abs(u) / cfg.dx + jnp.abs(v) / cfg.dy) * cfg.dt,
    )


@dataclasses.dataclass(frozen=True)
class BarotropicModel:
    """Compiled stepper bundle for a given configuration.

    `step`:    zeta_hat, src -> zeta_hat after ONE RK4 step.
    `segment`: zeta_hat, src -> zeta_hat after `record_step` RK4 steps, as a
               single jitted lax.scan — the hot path between record points
               (no host round-trips, constant forcing within the segment).
    `diags`:   zeta_hat -> DiagFields (physical vort/psi/u/v).
    `stats`:   zeta_hat -> StepStats scalars.
    """

    cfg: ModelConfig
    tables: SpectralTables
    step: Callable
    segment: Callable
    diags: Callable
    stats: Callable
    debug: Optional[Callable] = None   # zeta_hat, src -> DebugFields

    @classmethod
    def build(cls, cfg: ModelConfig,
              tables: Optional[SpectralTables] = None) -> "BarotropicModel":
        if cfg.time_scheme not in ("rk4", "etdrk4"):
            raise ValueError(f"unknown time_scheme {cfg.time_scheme!r}")
        etd = cfg.time_scheme == "etdrk4"
        t = tables if tables is not None else SpectralTables.from_config(cfg)
        g = cfg.grid_shape
        dt, nu = float(cfg.dt), float(cfg.nu)
        r_drag = float(cfg.r_drag)
        beta = float(cfg.beta)
        nu4 = float(cfg.nu4)
        resolved = resolve_fft_backend_name(cfg.fft_backend, g)
        fwd, inv, inv_pair, deriv_quad = resolve_fft_backend(resolved, g)
        t_step = t

        # The coefficient tables are passed as jit ARGUMENTS (bound via
        # partial), not closed over: closure arrays get embedded as MLIR
        # constants, which forces a device->host fetch at lowering time —
        # slow, bloats the executable, and unsupported over remote-device
        # tunnels for large buffers.
        if etd:
            # ETDRK4 with per-mode SCALAR phi tables (models/etdrk4.py
            # scalar-family section): the linear operator
            # nu*lap - r - nu4*lap^2 (+ i*beta*kx*rlap) is integrated
            # exactly — only the advective CFL remains, lifting the
            # nu4-stiffness dt cap. N is the advection-only tendency
            # (every linear coefficient zero), dealiased per stage;
            # drag/beta/nu4 live in the tables, so the plane-stepper
            # lap fold below must NOT apply here.
            from . import etdrk4 as etd_mod
            etabs = etd_mod.build_scalar_tables(cfg, dt,
                                                kind="barotropic")
            if resolved == "pallas" and use_plane_stepper(g):
                from ..ops import pallas_fft as _pf

                def _esrc_layout(src):
                    return jnp.transpose(src) \
                        if _pf.fwd_yfirst_active() else src

                def _eplane_step(et, t, p, src_l):
                    yfirst = _pf.fwd_yfirst_active()
                    fusekb = _pf.fusekb_mode() if yfirst else ""

                    def N(q):
                        sr, si = q
                        if fusekb:
                            return _pf.tendency_yfirst_fusedkb(
                                sr, si, src_l, t.kx, t.ky, t.rlap,
                                t.lap, t.mask, 0.0, g, mode=fusekb)
                        dvdx, dvdy, u, v = _pf.derivative_quad_planes(
                            sr, si, t.kx, t.ky, t.rlap, g,
                            ymajor=yfirst)
                        if yfirst:
                            return _pf.forward_tendency_yfirst(
                                u, dvdx, v, dvdy, src_l, t.lap,
                                t.mask, sr, si, 0.0, g)
                        return _pf.forward_tendency(
                            u, dvdx, v, dvdy, src_l, t.lap, t.mask,
                            sr, si, 0.0, g)

                    def mul(T, q):
                        return etd_mod.smul_planes(T, q[0], q[1])

                    return etd_mod.etd_scheme(N, mul, et, p)

                @jax.jit
                def estep_(et, t, zeta_hat, src):
                    p = _eplane_step(et, t, (jnp.real(zeta_hat),
                                             jnp.imag(zeta_hat)),
                                     _esrc_layout(src))
                    return jax.lax.complex(*p)

                @functools.partial(jax.jit,
                                   static_argnames=("n_steps",))
                def esegment_(et, t, zeta_hat, src, n_steps: int):
                    src_l = _esrc_layout(src)

                    def body(p, _):
                        return _eplane_step(et, t, p, src_l), None
                    p, _ = jax.lax.scan(
                        body, (jnp.real(zeta_hat), jnp.imag(zeta_hat)),
                        None, length=n_steps)
                    return jax.lax.complex(*p)
            else:
                def _eN(t, zeta_hat, src):
                    return sp.dealias(t, tendency(
                        t, zeta_hat, src, nu=0.0, grid_shape=g,
                        fwd=fwd, inv=inv, inv_pair=inv_pair,
                        deriv_quad=deriv_quad))

                @jax.jit
                def estep_(et, t, zeta_hat, src):
                    return etd_mod.etd_scheme(
                        functools.partial(_eN, t, src=src),
                        lambda T, z: T * z, et, zeta_hat)

                @functools.partial(jax.jit,
                                   static_argnames=("n_steps",))
                def esegment_(et, t, zeta_hat, src, n_steps: int):
                    def body(z, _):
                        return etd_mod.etd_scheme(
                            functools.partial(_eN, t, src=src),
                            lambda T, x: T * x, et, z), None
                    z, _ = jax.lax.scan(body, zeta_hat, None,
                                        length=n_steps)
                    return z

            # tables ride as leading jit ARGUMENTS (axon closure rule)
            step_ = functools.partial(estep_, etabs)
            segment_ = functools.partial(esegment_, etabs)
        elif resolved == "pallas" and use_plane_stepper(g):
            # plane-state stepper: complex <-> (re, im) conversion only
            # at the segment boundary (see rk4_step_planes). With the
            # y-first forward order the forcing field is transposed to
            # y-major ONCE per jit call, outside the scan.
            from ..ops import pallas_fft as _pf

            if r_drag != 0.0 or nu4 != 0.0:
                # Fold the Ekman drag AND the biharmonic hyperviscosity
                # into the viscous multiplier: the plane kernels' only
                # linear term is nu*lap*z (the VISC epilogue of
                # forward_tendency), so lap := nu*lap - r - nu4*lap^2
                # with nu := 1 applies the exact
                # (nu*lap - r - nu4*lap^2)*zeta_hat operator without
                # touching any kernel (lap = -k^2, so -nu4*lap^2 =
                # -nu4*k^4). derivative_quad reads only kx/ky/rlap,
                # which stay untouched; diags/stats below are bound to
                # the ORIGINAL tables.
                t_step = dataclasses.replace(
                    t, lap=t.lap * nu - r_drag - nu4 * t.lap * t.lap)
                nu = 1.0

            def _src_layout(src):
                return jnp.transpose(src) if _pf.fwd_yfirst_active() \
                    else src

            @jax.jit
            def step_(t, zeta_hat, src):
                zr, zi = rk4_step_planes(t, jnp.real(zeta_hat),
                                         jnp.imag(zeta_hat),
                                         _src_layout(src),
                                         dt, nu, g, beta=beta)
                return jax.lax.complex(zr, zi)

            @functools.partial(jax.jit, static_argnames=("n_steps",))
            def segment_(t, zeta_hat, src, n_steps: int):
                src_l = _src_layout(src)

                def body(zc, _):
                    return rk4_step_planes(t, zc[0], zc[1], src_l,
                                           dt, nu, g, beta=beta), None
                zc, _ = jax.lax.scan(
                    body, (jnp.real(zeta_hat), jnp.imag(zeta_hat)),
                    None, length=n_steps)
                return jax.lax.complex(*zc)
        else:
            @jax.jit
            def step_(t, zeta_hat, src):
                return rk4_step(t, zeta_hat, src, dt, nu, g,
                                fwd=fwd, inv=inv, inv_pair=inv_pair,
                                deriv_quad=deriv_quad, r_drag=r_drag,
                                beta=beta, nu4=nu4)

            @functools.partial(jax.jit, static_argnames=("n_steps",))
            def segment_(t, zeta_hat, src, n_steps: int):
                def body(z, _):
                    return rk4_step(t, z, src, dt, nu, g,
                                    fwd=fwd, inv=inv, inv_pair=inv_pair,
                                    deriv_quad=deriv_quad,
                                    r_drag=r_drag, beta=beta,
                                    nu4=nu4), None
                z, _ = jax.lax.scan(body, zeta_hat, None, length=n_steps)
                return z

        @jax.jit
        def diags_(t, zeta_hat):
            return diag_fields(t, zeta_hat, g)

        @jax.jit
        def stats_(t, zeta_hat):
            return step_stats(t, zeta_hat, cfg)

        @jax.jit
        def debug_(t, zeta_hat, src):
            return debug_fields(t, zeta_hat, src, g, beta=beta)

        def segment(zeta_hat, src, n_steps: int):
            return segment_(t_step, zeta_hat, src, n_steps)

        return cls(cfg=cfg, tables=t,
                   step=functools.partial(step_, t_step),
                   segment=segment,
                   diags=functools.partial(diags_, t),
                   stats=functools.partial(stats_, t),
                   debug=functools.partial(debug_, t))

    def init_state(self, vort0) -> jax.Array:
        """Physical initial vorticity -> spectral state (main.cpp:256)."""
        return fft.forward(jnp.asarray(vort0, dtype=jnp.float32))

    def zero_source(self) -> jax.Array:
        """The reference never initializes vort_src (fresh zero pages,
        SURVEY.md §5.10-1); we zero it explicitly."""
        return jnp.zeros(self.cfg.grid_shape, dtype=jnp.float32)
