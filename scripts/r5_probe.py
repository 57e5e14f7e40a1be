"""Round-5 hardware probes (one subcommand = one TPU process).

Subcommands (tunnel discipline: ONE process at a time, trivial warm-up
fetch first, scalar-only fetches, generous outer timeout, never killed
mid-flight — CLAUDE.md):

  bt-etd    4096^2 barotropic fast mode: (a) RK4-planes 30-step control
            (doubles as the SPLIT3 A/B control), (b) scalar-table ETDRK4
            at a high-nu4 config where the RK4 viscous bound is violated
            ~8.6x (nu4 = 2.785/(k_max^4 * 0.35 s), dt = 3 s): ms/step,
            200-step stability soak, rel-L2 vs a 10x-finer-dt RK4
            reference, and RK4-at-the-same-dt blow-up confirmation.
            Tables cached under ./output/etd_cache.
  sw-warm   4096^2 SW ETDRK4 dt=7.5 (the ledgered operating point):
            COLD table build (ledger build_s; populates the cache the
            driver bench will hit), 20-step measure, checkpoint saved.
  sw-warm2  Same config in a FRESH process: ledger the WARM build time
            (cache mmap-load), resume from the checkpoint, one segment.
  split3    4096^2 barotropic fast RK4-planes with the three-factor KA
            x-stage (env XFB_PALLAS_SPLIT3=ka set by the caller):
            30-step ms/step + checksum (compare to bt-etd's control).
  n8192     8192^2 barotropic fast: XLA-core 10-step control, then the
            plane stepper (caller sets XFB_PALLAS_BLOCK=64
            XFB_PALLAS_MAX=8192 XFB_PLANE_STEPPER_MAX=8192 — every
            kernel block then has the same area as the fitting
            4096^2/BLOCK=128 config, the remote-compile-memory
            hypothesis this probe tests). Planes LAST so an
            OOM-SIGKILLed compile still leaves the XLA number.
  n8192-sw  8192^2 shallow-water, same shape (xla control + planes).
  n8192-tracer  8192^2 tracer family, same shape — probes the KA6
            kernel + chunked KB/KC bodies at the frontier size (its
            auto cap stays 4096 until this measures a win).

Each prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

sys.path.insert(0, ".")


def warmup():
    import jax.numpy as jnp
    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    print(f"# warm-up fetch {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)


def seg_time(model, s, src, steps, checksum):
    """(ms/step, out, csum): compile+warm excluded, completion forced by
    a scalar checksum fetch."""
    out = model.segment(s, src, steps)
    c_w = checksum(out)
    t0 = time.perf_counter()
    out = model.segment(s, src, steps)
    c_t = checksum(out)
    dt = time.perf_counter() - t0
    assert c_t == c_w, "nondeterministic segment"
    return dt / steps * 1e3, out, c_t


def emit(**kw):
    print(json.dumps(kw), flush=True)


def cmd_bt_etd(nx: int):
    import jax
    import jax.numpy as jnp
    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel

    warmup()

    def csum(z):
        return float(jnp.max(jnp.abs(z)))

    @jax.jit
    def rel(a, b):
        return jnp.linalg.norm(jnp.ravel(a - b)) / jnp.maximum(
            jnp.linalg.norm(jnp.ravel(b)), 1e-30)

    # (a) control: plain fast RK4 planes (SPLIT3 A/B control)
    cfg0 = ModelConfig(nx=nx, ny=nx)
    m0 = BarotropicModel.build(cfg0)
    v0 = makefields.gaussian(cfg0)
    src = jnp.zeros(cfg0.grid_shape, jnp.float32)
    z0 = m0.init_state(v0)
    ms, _, c = seg_time(m0, z0, src, 30, csum)
    emit(probe="bt-rk4-control", nx=nx, ms_per_step=round(ms, 2),
         gp_per_s=round(nx * nx / ms * 1e3, 1), checksum=c)

    # (b) high-nu4 ETDRK4: RK4's real-axis bound 2.785/(nu4*k_max^4)
    # set to 0.35 s; ETD runs dt=3 s (8.6x the bound)
    k2 = (math.pi * nx / cfg0.lx) ** 2 + (math.pi * nx / cfg0.ly) ** 2
    nu4 = 2.785 / (k2 ** 2 * 0.35)
    cfg = ModelConfig(nx=nx, ny=nx, nu4=nu4, dt=3.0)
    t_b = time.perf_counter()
    met = BarotropicModel.build(cfg.replace(time_scheme="etdrk4"))
    build_s = round(time.perf_counter() - t_b, 1)
    ze = met.init_state(v0)
    ms_e, out30, c_e = seg_time(met, ze, src, 30, csum)
    emit(probe="bt-etd-hinu4", nx=nx, nu4=nu4, dt=3.0,
         rk4_nu4_bound_s=0.35, dt_multiple=round(3.0 / 0.35, 1),
         ms_per_step=round(ms_e, 2),
         gp_per_s=round(nx * nx / ms_e * 1e3, 1),
         build_plus_compile_s=build_s, checksum=c_e)

    # RK4 at the same (cfg, dt) must blow up — the bound is real
    mrk = BarotropicModel.build(cfg)
    bad = mrk.segment(z0, src, 30)
    finite = bool(jax.jit(lambda z: jnp.all(jnp.isfinite(jnp.abs(z))))(
        bad))
    emit(probe="bt-rk4-hinu4-blowup", nx=nx, finite_after_30=finite)

    # accuracy: ETD(dt=3) vs RK4(dt=0.3, stable: |lam*dt| = 2.4) over
    # the same 90 s horizon
    mfine = BarotropicModel.build(cfg.replace(dt=0.3))
    ref = mfine.segment(z0, src, 300)
    r = float(rel(out30, ref))
    emit(probe="bt-etd-vs-fine-rk4", nx=nx, rel_l2=r,
         horizon_s=90.0)

    # stability soak: 200 big steps
    out200 = met.segment(ze, src, 200)
    emit(probe="bt-etd-soak200", nx=nx, checksum=csum(out200))


def cmd_sw_warm(nx: int, resume: bool):
    import numpy as np
    import jax.numpy as jnp
    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.io.checkpoint import (load_checkpoint,
                                                      save_checkpoint)
    from xlab_fftbarotropic_tpu.models.shallow_water import (
        ShallowWaterModel, SWState)

    warmup()
    cfg = ModelConfig(nx=nx, ny=nx, dt=7.5, time_scheme="etdrk4")
    t_b = time.perf_counter()
    m = ShallowWaterModel.build(cfg)
    build_s = round(time.perf_counter() - t_b, 1)

    def csum(s):
        return float(jnp.max(jnp.abs(s.zeta_hat)))

    ck = "output/r5_sw_etd_ckpt.npz"
    if resume:
        import jax
        packed, step, _ = load_checkpoint(ck, cfg, kind="sw")
        # complex64 HOST->DEVICE transfers are as UNIMPLEMENTED over
        # the tunnel as the fetches: upload float32 re/im planes and
        # recombine on device
        s = SWState(*(jax.jit(jax.lax.complex)(
            jnp.asarray(np.ascontiguousarray(a.real)),
            jnp.asarray(np.ascontiguousarray(a.imag)))
            for a in packed))
        ms, out, c = seg_time(m, s, None, 20, csum)
        emit(probe="sw-etd-warm", nx=nx, dt=7.5, build_s=build_s,
             resumed_from_step=step, ms_per_step=round(ms, 2),
             sim_s_per_wall_s=round(7.5 / ms * 1e3, 1), checksum=c)
        return
    s0 = m.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
    ms, out, c = seg_time(m, s0, None, 20, csum)
    # emit BEFORE any big fetch (a failed fetch must not lose the
    # measurement — learned the hard way this round)
    emit(probe="sw-etd-cold", nx=nx, dt=7.5, build_s=build_s,
         ms_per_step=round(ms, 2),
         sim_s_per_wall_s=round(7.5 / ms * 1e3, 1), checksum=c,
         checkpoint=ck)
    # big device->host fetches must go through the chunked helper AND
    # as FLOAT planes: a complex64 fetch is UNIMPLEMENTED over the
    # tunnel even chunked (measured 2026-08-20) — fetch re/im float32
    # planes and recombine on host
    import jax
    from xlab_fftbarotropic_tpu.parallel.multihost import gather_to_host
    planes = [jax.jit(lambda a, f=f: f(a))(a)
              for a in out for f in (jnp.real, jnp.imag)]
    host = [gather_to_host(p) for p in planes]
    packed = np.stack([host[2 * i] + 1j * host[2 * i + 1]
                       for i in range(3)]).astype(np.complex64)
    save_checkpoint(ck, cfg, packed, step=40, kind="sw")
    emit(probe="sw-etd-ckpt-saved", checkpoint=ck)


def cmd_split3(nx: int):
    import jax.numpy as jnp
    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
    from xlab_fftbarotropic_tpu.ops import pallas_fft as pf

    warmup()
    assert pf.split3_mode() == "ka", "run with XFB_PALLAS_SPLIT3=ka"
    cfg = ModelConfig(nx=nx, ny=nx)
    m = BarotropicModel.build(cfg)
    z0 = m.init_state(makefields.gaussian(cfg))
    src = jnp.zeros(cfg.grid_shape, jnp.float32)

    def csum(z):
        return float(jnp.max(jnp.abs(z)))

    ms, _, c = seg_time(m, z0, src, 30, csum)
    emit(probe="bt-rk4-split3", nx=nx, ms_per_step=round(ms, 2),
         gp_per_s=round(nx * nx / ms * 1e3, 1), checksum=c,
         factors=pf._split3(nx))


def cmd_n8192(model_kind: str, nx: int = 8192):
    import os
    import jax
    import jax.numpy as jnp
    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields

    warmup()
    steps = 10

    def build(backend):
        cfg = ModelConfig(nx=nx, ny=nx, fft_backend=backend)
        if model_kind == "sw":
            from xlab_fftbarotropic_tpu.models.shallow_water import (
                ShallowWaterModel, max_stable_dt)
            cfg = cfg.replace(dt=min(3.0, max_stable_dt(cfg)))
            m = ShallowWaterModel.build(cfg)
            s = m.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
            return m, s, None, (lambda o: float(jnp.max(
                jnp.abs(o.zeta_hat))))
        if model_kind == "tracer":
            from xlab_fftbarotropic_tpu.models.tracer import (
                TracerModel, tracer_ic)
            m = TracerModel.build(cfg, kappa=50.0)
            s = m.init_state(makefields.gaussian(cfg),
                             tracer_ic(cfg, "gaussian"))
            return m, s, m.zero_source(), (lambda o: float(jnp.max(
                jnp.abs(o.zeta_hat))))
        from xlab_fftbarotropic_tpu.models.barotropic import (
            BarotropicModel)
        m = BarotropicModel.build(cfg)
        s = m.init_state(makefields.gaussian(cfg))
        src = jnp.zeros(cfg.grid_shape, jnp.float32)
        return m, s, src, (lambda o: float(jnp.max(jnp.abs(o))))

    # XLA control first — if the planes compile OOM-kills the remote
    # helper, the control number is already out. At 16384^2 the XLA
    # core's HBM footprint may itself not fit the chip: a failed arm
    # emits an error line and the next arm still runs.
    for backend in ("xla", "pallas"):
        t_b = time.perf_counter()
        try:
            m, s, src, csum = build(backend)
            ms, _, c = seg_time(m, s, src, steps, csum)
        except Exception as e:  # noqa: BLE001 — probe must survive
            emit(probe=f"{model_kind}-{nx}-{backend}", nx=nx,
                 error=f"{type(e).__name__}: {str(e)[:400]}")
            continue
        emit(probe=f"{model_kind}-{nx}-{backend}", nx=nx,
             block=int(os.environ.get("XFB_PALLAS_BLOCK", "128")),
             ms_per_step=round(ms, 2),
             gp_per_s=round(nx * nx / ms * 1e3, 1),
             build_plus_compile_s=round(
                 time.perf_counter() - t_b - ms * steps / 1e3, 1),
             checksum=c)


def cmd_soak8192():
    """1000-step RK4-planes soak at the 8192² frontier (the r4 ledger
    ran 2000 steps at 4096²): stability + the conservation scalars'
    drift class at the biggest grid."""
    import jax
    import jax.numpy as jnp
    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel

    warmup()
    nx = 8192
    cfg = ModelConfig(nx=nx, ny=nx, fft_backend="pallas")
    m = BarotropicModel.build(cfg)
    z = m.init_state(makefields.gaussian(cfg))
    src = jnp.zeros(cfg.grid_shape, jnp.float32)

    @jax.jit
    def scalars(zh):
        # mean enstrophy in spectral form (Parseval over the
        # half-spectrum with the Hermitian double-count)
        nx_, hny = zh.shape
        w = jnp.where((jnp.arange(hny) == 0)
                      | (jnp.arange(hny) == hny - 1), 1.0, 2.0)
        norm = (float(nx_) * float(nx_)) ** 2     # 8192^4 overflows i32
        ens = jnp.sum(w[None, :] * jnp.abs(zh) ** 2) / norm
        return jnp.max(jnp.abs(zh)), ens

    mx0, e0 = (float(v) for v in scalars(z))
    t0 = time.perf_counter()
    for seg in range(10):
        z = m.segment(z, src, 100)
        mx, e = (float(v) for v in scalars(z))
        emit(probe="bt-8192-soak", steps=(seg + 1) * 100,
             max_abs=mx, enstrophy=e,
             finite=bool(mx == mx and mx != float("inf")))
    dt_w = time.perf_counter() - t0
    emit(probe="bt-8192-soak-final", steps=1000,
         ms_per_step=round(dt_w, 1),
         enstrophy_ratio_vs_t0=e / e0, max_ratio_vs_t0=mx / mx0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["bt-etd", "sw-warm", "sw-warm2",
                                    "split3", "n8192", "n8192-sw",
                                    "n8192-tracer", "soak8192"])
    ap.add_argument("--nx", type=int, default=4096)
    args = ap.parse_args()
    if args.cmd == "bt-etd":
        cmd_bt_etd(args.nx)
    elif args.cmd == "sw-warm":
        cmd_sw_warm(args.nx, resume=False)
    elif args.cmd == "sw-warm2":
        cmd_sw_warm(args.nx, resume=True)
    elif args.cmd == "split3":
        cmd_split3(args.nx)
    elif args.cmd == "n8192":
        cmd_n8192("bt", args.nx if args.nx != 4096 else 8192)
    elif args.cmd == "n8192-sw":
        cmd_n8192("sw")
    elif args.cmd == "n8192-tracer":
        cmd_n8192("tracer")
    elif args.cmd == "soak8192":
        cmd_soak8192()


if __name__ == "__main__":
    main()
