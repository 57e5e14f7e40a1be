"""Fused Pallas SW plane-state pipeline (ops/pallas_sw.py) vs the XLA
shallow-water core, in interpret mode (CPU). The grid-over-fields
inverse pipeline, the grid-over-products forward pipeline, the COMBINE
tendency kernel, and the plane RK4 arithmetic must reproduce the
rk4_step trajectory (models/shallow_water.py) to float32 round-off —
the same differential gate the barotropic plane stepper passes
(tests/test_pallas_fft.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlab_fftbarotropic_tpu.config import ModelConfig
from xlab_fftbarotropic_tpu.models import shallow_water as sw
from xlab_fftbarotropic_tpu.ops import fft
from xlab_fftbarotropic_tpu.ops import pallas_sw as psw
from xlab_fftbarotropic_tpu.ops import spectral as sp
from xlab_fftbarotropic_tpu.ops.spectral import SpectralTables


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)


N = 128


def _cfg(**kw):
    kw.setdefault("nx", N)
    kw.setdefault("ny", N)
    kw.setdefault("dt", 1.0)
    kw.setdefault("fft_backend", "pallas")
    return ModelConfig(**kw)


def _random_state(t, cfg, seed=0):
    rng = np.random.default_rng(seed)
    g = cfg.grid_shape

    def f32(amp):
        return (amp * rng.standard_normal(g)).astype(np.float32)

    z = fft.forward(jnp.asarray(f32(1e-4)))
    d = fft.forward(jnp.asarray(f32(1e-6)))
    e = fft.forward(jnp.asarray(f32(5.0)))
    return sw.SWState(zeta_hat=z, div_hat=d, eta_hat=e)


def test_inverse_quad_planes_matches_xla():
    """With the pairing equalizer, ALL four fields must come back at
    float32 round-off even though zeta (1e-4) and eta (5.0) share one
    paired c2r transform — unequalized, zeta's error is ~8e-3 relative
    (cross-talk ~eps*|eta|, the scale-mismatch leak this guards)."""
    cfg = _cfg()
    t = SpectralTables.from_config(cfg)
    s = _random_state(t, cfg)
    g = cfg.grid_shape
    planes = sw._state_to_planes(s)
    es = psw.eta_pair_scale(planes)
    assert float(es) > 0 and np.log2(float(es)) == round(np.log2(float(es)))

    u, v, zeta, eta_s = psw.inverse_quad_planes(
        *planes, t.kx, t.ky, t.rlap, g, eta_scale=es)
    if psw.YFIRST:      # physical fields come back y-major
        u, v, zeta, eta_s = (x.T for x in (u, v, zeta, eta_s))
    eta = eta_s / es

    u_hat, v_hat = sw.sw_velocities(t, s.zeta_hat, s.div_hat)
    assert _rel(fft.inverse(u_hat, g), u) < 3e-6
    assert _rel(fft.inverse(v_hat, g), v) < 3e-6
    assert _rel(fft.inverse(s.zeta_hat, g), zeta) < 3e-6
    assert _rel(fft.inverse(s.eta_hat, g), eta) < 3e-6


def test_forward_tendencies_match_composition():
    """forward_tendencies == dealias(spectral SW RHS) computed with
    jnp.fft FROM THE SAME physical inputs — verifies the forward pipeline
    (KA_FWD products + KC_SW + COMBINE) in isolation, the same gate the
    barotropic forward_tendency passes."""
    cfg = _cfg()
    t = SpectralTables.from_config(cfg)
    s = _random_state(t, cfg, seed=1)
    g = cfg.grid_shape
    f0, grav, nu, H = float(cfg.f), float(cfg.gravity), float(cfg.nu), \
        float(cfg.mean_depth)
    rng = np.random.default_rng(7)
    src = jnp.asarray((1e-9 * rng.standard_normal(g)).astype(np.float32))

    planes = sw._state_to_planes(s)
    es = psw.eta_pair_scale(planes)
    u, v, zeta, eta_s = psw.inverse_quad_planes(*planes, t.kx, t.ky,
                                                t.rlap, g, eta_scale=es)
    sp_pl = psw.forward_planes(src)
    got = sw._planes_to_state(psw.forward_tendencies(
        u, v, zeta, eta_s, planes, sp_pl, t.kx, t.ky, t.lap, t.mask,
        f0, grav, nu, H, g, eta_scale=es))

    # reference from the SAME u, v, zeta, eta (x-major for jnp.fft)
    if psw.YFIRST:
        u, v, zeta, eta_s = (x.T for x in (u, v, zeta, eta_s))
    eta = eta_s / es
    q = zeta + f0
    qu, qv = fft.forward(q * u), fft.forward(q * v)
    eu, ev = fft.forward(eta * u), fft.forward(eta * v)
    phi = fft.forward(grav * eta + 0.5 * (u * u + v * v))
    dz = -(sp.gradx(t, qu) + sp.grady(t, qv)) \
        + nu * sp.laplacian(t, s.zeta_hat) + fft.forward(src)
    dd = (sp.gradx(t, qv) - sp.grady(t, qu)) - sp.laplacian(t, phi) \
        + nu * sp.laplacian(t, s.div_hat)
    de = -(sp.gradx(t, eu) + sp.grady(t, ev)) - H * s.div_hat
    ref = sw._dealias_state(t, sw.SWState(dz, dd, de))
    for name, a, b in (("zeta", ref.zeta_hat, got.zeta_hat),
                      ("div", ref.div_hat, got.div_hat),
                      ("eta", ref.eta_hat, got.eta_hat)):
        assert _rel(a, b) < 2e-5, name


def _phys(s, g):
    return (np.asarray(fft.inverse(s.zeta_hat, g)),
            np.asarray(fft.inverse(s.div_hat, g)),
            np.asarray(fft.inverse(s.eta_hat, g)))


def _assert_close_phys(sa, sb, g, tol):
    """div is normalized by max(|div|, |zeta|): in balanced flow div is
    the small residual of cancelling large terms (curl(q u) vs lap(Phi)),
    so its float32 round-off floor is set by the zeta-scale dynamics, not
    by |div| itself — normalizing a near-zero residual by its own max
    would demand accuracy float32 cannot represent."""
    az, ad, ae = _phys(sa, g)
    bz, bd, be = _phys(sb, g)
    nz = np.max(np.abs(az))
    for name, a, b, norm in (("zeta", az, bz, nz),
                             ("div", ad, bd, max(np.max(np.abs(ad)), nz)),
                             ("eta", ae, be, np.max(np.abs(ae)))):
        assert np.max(np.abs(a - b)) < tol * max(norm, 1e-12), name


def test_rk4_step_planes_matches_rk4_step():
    cfg = _cfg()
    t = SpectralTables.from_config(cfg)
    s = _random_state(t, cfg, seed=2)
    g = cfg.grid_shape
    f0, grav, nu, H = float(cfg.f), float(cfg.gravity), float(cfg.nu), \
        float(cfg.mean_depth)
    dt = float(cfg.dt)
    src = jnp.zeros(g, jnp.float32)

    out = sw._planes_to_state(sw.rk4_step_planes(
        t, sw._state_to_planes(s), psw.forward_planes(src),
        dt, f0, grav, nu, H, g))
    ref = sw.rk4_step(t, s, src, dt, f0, grav, nu, H, g)
    _assert_close_phys(ref, out, g, 1e-5)


def test_model_segment_trajectory_pin():
    """20 scanned steps through the pallas-backed SW model must track the
    XLA model in PHYSICAL space — the same whole-trajectory gate the
    barotropic plane stepper passes. A balanced vortex IC exercises all
    three equations (advection, gravity-wave pressure terms, mass
    flux)."""
    from xlab_fftbarotropic_tpu.ic import makefields

    cfg_p = _cfg()
    cfg_x = _cfg(fft_backend="xla")
    vort = makefields.gaussian(cfg_p)
    m_p = sw.ShallowWaterModel.build(cfg_p)
    m_x = sw.ShallowWaterModel.build(cfg_x)
    s_p = m_p.geostrophic_init(vort)
    s_x = m_x.geostrophic_init(vort)
    src = m_p.zero_source()

    out_p = m_p.segment(s_p, src, 20)
    out_x = m_x.segment(s_x, src, 20)
    # drift pin, not a round-off gate (those are the per-step and
    # same-input tests above): two independent float32 pipelines diverge
    # through the gravity-wave coupling — div round-off (~eps*|lap Phi|,
    # measured 1.3e-8 abs) feeds eta at d(eta)/dt = -H*div, so
    # delta_eta ~ H*dt*n*delta_div ~ 2.6e-4 at 20 steps; measured
    # 1.44e-4 (5.8e-5 relative). 2e-4 leaves ~3x margin.
    _assert_close_phys(out_x, out_p, cfg_p.grid_shape, 2e-4)


def test_forced_step_matches_xla():
    """The forcing spectrum path (COMBINE's has_src branch + the
    per-segment forward_planes) against the XLA fwd(src) path."""
    cfg_p = _cfg()
    cfg_x = _cfg(fft_backend="xla")
    t = SpectralTables.from_config(cfg_p)
    s = _random_state(t, cfg_p, seed=3)
    g = cfg_p.grid_shape
    rng = np.random.default_rng(11)
    src = jnp.asarray((1e-8 * rng.standard_normal(g)).astype(np.float32))

    m_p = sw.ShallowWaterModel.build(cfg_p)
    m_x = sw.ShallowWaterModel.build(cfg_x)
    out_p = m_p.step(s, src)
    out_x = m_x.step(s, src)
    _assert_close_phys(out_x, out_p, g, 1e-5)

    # and the source actually lands: differs from the unforced step
    out_p0 = m_p.step(s, jnp.zeros(g, jnp.float32))
    assert np.max(np.abs(np.asarray(out_p.zeta_hat - out_p0.zeta_hat))) > 0


def test_split_linear_matches_default(monkeypatch):
    """The split-linear formulation (nonlinear-only products + exact
    f0/gravity terms in COMBINE, ops/pallas_sw.py module note) is a
    reformulation, not a new scheme: at fp32 HIGHEST it must track the
    default pallas pipeline AND the XLA core over a 5-step scanned
    segment at float32 round-off."""
    from xlab_fftbarotropic_tpu.ic import makefields

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setattr(psw, "SPLIT_LINEAR", mode)
        cfg = _cfg()
        m = sw.ShallowWaterModel.build(cfg)
        s = m.geostrophic_init(makefields.gaussian(cfg))
        outs[mode] = m.segment(s, m.zero_source(), 5)
    _assert_close_phys(outs["1"], outs["0"], _cfg().grid_shape, 1e-5)

    cfg_x = _cfg(fft_backend="xla")
    m_x = sw.ShallowWaterModel.build(cfg_x)
    s_x = m_x.geostrophic_init(makefields.gaussian(cfg_x))
    out_x = m_x.segment(s_x, m_x.zero_source(), 5)
    _assert_close_phys(out_x, outs["1"], _cfg().grid_shape, 1e-5)


def test_split_linear_mean_mode_guard(monkeypatch):
    """curl_z(f0 u) = f0*lap*rlap*zeta_hat VANISHES at the mean mode
    (gradients kill it), so split COMBINE must not inject f0*Z(0,0) /
    f0*D(0,0) — exercised with a state carrying nonzero mean vorticity,
    divergence, AND height (the gaussian IC has nonzero mean zeta)."""
    cfg = _cfg()
    t = SpectralTables.from_config(cfg)
    g = cfg.grid_shape
    rng = np.random.default_rng(5)

    def fld(amp, mean):
        return jnp.asarray(
            (amp * rng.standard_normal(g) + mean).astype(np.float32))

    s = sw.SWState(zeta_hat=fft.forward(fld(1e-4, 3e-5)),
                   div_hat=fft.forward(fld(1e-6, 2e-6)),
                   eta_hat=fft.forward(fld(2.0, 1.5)))
    f0, grav, nu, H = float(cfg.f), float(cfg.gravity), float(cfg.nu), \
        float(cfg.mean_depth)

    tend = {}
    for mode in ("0", "1"):
        monkeypatch.setattr(psw, "SPLIT_LINEAR", mode)
        planes = sw._state_to_planes(s)
        es = psw.eta_pair_scale(planes)
        u, v, zeta, eta_s = psw.inverse_quad_planes(
            *planes, t.kx, t.ky, t.rlap, g, eta_scale=es)
        tend[mode] = sw._planes_to_state(psw.forward_tendencies(
            u, v, zeta, eta_s, planes, None, t.kx, t.ky, t.lap, t.mask,
            f0, grav, nu, H, g, eta_scale=es))
    for name in ("zeta_hat", "div_hat", "eta_hat"):
        a = np.asarray(getattr(tend["1"], name))
        b = np.asarray(getattr(tend["0"], name))
        # whole-plane agreement (reformulation exact up to round-off)...
        assert _rel(a, b) < 2e-5, name
        # ...and the mean mode in particular (the nz guard): scale by the
        # magnitude of the would-be spurious injection f0*|X(0,0)|
        leak = abs(a[0, 0] - b[0, 0])
        assert leak <= 1e-6 * max(abs(a[0, 0]), 1.0), name


def test_split_linear_auto_follows_mm_mode(monkeypatch):
    from xlab_fftbarotropic_tpu.ops import pallas_fft

    monkeypatch.setattr(psw, "SPLIT_LINEAR", "auto")
    monkeypatch.setattr(pallas_fft, "MM_MODE", "fp32")
    assert not psw.split_linear()
    monkeypatch.setattr(pallas_fft, "MM_MODE", "default")
    assert psw.split_linear()
    monkeypatch.setattr(pallas_fft, "MM_MODE", "bf16")
    assert psw.split_linear()
    monkeypatch.setattr(pallas_fft, "MM_MODE", "bf16x3")
    assert not psw.split_linear()   # bf16x3 is accurate — keep parity


def test_yfirst_matches_xfirst(monkeypatch):
    """The y-first forward pipeline (KY_FWD real partial r2c along the
    halved axis + KX_FWD x c2c over hny columns) against the historical
    x-first order (KA_FWD + KC_SW) over a 5-step scanned segment — the
    two factorizations must agree at float32 round-off (they differ only
    in op order; the transform math is identical)."""
    from xlab_fftbarotropic_tpu.ic import makefields

    outs = {}
    for yfirst in (True, False):
        monkeypatch.setattr(psw, "YFIRST", yfirst)
        cfg = _cfg()
        m = sw.ShallowWaterModel.build(cfg)
        s = m.geostrophic_init(makefields.gaussian(cfg))
        outs[yfirst] = m.segment(s, m.zero_source(), 5)
    _assert_close_phys(outs[True], outs[False], _cfg().grid_shape, 1e-5)


def test_bf16_transforms_corrupt_sw_balance_asymmetrically(monkeypatch):
    """Why --fast-transforms warns for SW, reproduced off-hardware:
    MM_MODE='bf16' casts the kernel matmul operands to bfloat16 for
    real even under CPU interpret (unlike 'default', whose DEFAULT-
    precision dots run full f32 on CPU). The lossy transforms hit the
    three prognostics ASYMMETRICALLY: zeta (advected quantity, errors
    stay relative to its own scale) holds ~2e-4, while div — the
    near-zero residual of cancelling zeta/eta-scale terms — is
    destroyed outright and d(eta)/dt = -H div integrates the noise
    into eta (measured here: div O(0.5), eta ~1e-2 at 20 steps; on
    hardware at 4096^2, eta 7%, BASELINE.md).

    NOTE the split-linear mode does NOT rescue this small-grid regime:
    with ~4e-3 operand rounding the nonlinear-flux and u,v inverse-
    transform errors swamp the exact-linear-term saving (measured:
    split ~= nosplit here). Its target regime is the hardware one —
    tiny per-transform error but k^2-amplified g*lap(eta) dominance at
    4096^2 — and the hardware A/B (scripts/bench_sw_ab.py, 2026-08-18,
    BASELINE.md) confirmed exactly that split: eta 7.0e-2 -> 4.3e-4,
    zeta 2.3e-4 -> 5.5e-5 at 41.5 ms/step (1.94x fp32)."""
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.ops import pallas_fft

    cfg_x = _cfg(fft_backend="xla")
    m_x = sw.ShallowWaterModel.build(cfg_x)
    s_x = m_x.geostrophic_init(makefields.gaussian(cfg_x))
    ref = m_x.segment(s_x, m_x.zero_source(), 20)
    g = cfg_x.grid_shape

    def phys(state):
        return {k: np.asarray(jnp.fft.irfft2(getattr(state, k), s=g))
                for k in ("zeta_hat", "div_hat", "eta_hat")}

    refp = phys(ref)
    monkeypatch.setattr(pallas_fft, "MM_MODE", "bf16")
    cfg = _cfg()
    m = sw.ShallowWaterModel.build(cfg)
    s = m.geostrophic_init(makefields.gaussian(cfg))
    outp = phys(m.segment(s, m.zero_source(), 20))
    err = {k: np.linalg.norm(outp[k] - refp[k])
           / max(np.linalg.norm(refp[k]), 1e-30) for k in refp}
    # zeta: bf16-transform class, relative to its own dynamics
    assert err["zeta_hat"] < 2e-3, err
    # div: destroyed (the balance residual has no scale of its own)
    assert err["div_hat"] > 0.05, err
    # eta: integrates the div noise — an order above zeta's error
    assert err["eta_hat"] > 5 * err["zeta_hat"], err


@pytest.mark.parametrize("ka, ky", [(True, False), (False, True),
                                    (True, True)])
def test_field_minor_orders_bit_identical(ka, ky, monkeypatch):
    """KA_SW / KY_FWD with the field axis minor (input-block revisiting:
    the 7-plane / 4-field re-reads drop away on hardware) are pure
    iteration-order changes — 5-step trajectories must be BIT-identical
    to the field-major order."""
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.ops import pallas_sw as psw

    cfg = _cfg()
    vort = makefields.gaussian(cfg)
    m0 = sw.ShallowWaterModel.build(cfg)
    out0 = m0.segment(m0.geostrophic_init(vort), m0.zero_source(), 5)
    monkeypatch.setattr(psw, "KA_FMINOR", ka)
    monkeypatch.setattr(psw, "KY_FMINOR", ky)
    m1 = sw.ShallowWaterModel.build(cfg)
    out1 = m1.segment(m1.geostrophic_init(vort), m1.zero_source(), 5)
    for a, b in zip(jax.tree_util.tree_leaves(out0),
                    jax.tree_util.tree_leaves(out1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ky_all_bit_identical(monkeypatch):
    """KY_ALL (all five products in one grid pass) is a pure scheduling
    change — identical products, identical _kc_body math — so the
    trajectory must be BIT-identical to the per-product grid path."""
    from xlab_fftbarotropic_tpu.ops import pallas_fft
    cfg = _cfg()
    t = SpectralTables.from_config(cfg)
    s = _random_state(t, cfg)
    g = cfg.grid_shape
    p = sw._state_to_planes(s)

    def run():
        q = p
        for _ in range(2):
            q = sw.rk4_step_planes(t, q, None, 1.0, float(cfg.f),
                                   float(cfg.gravity), float(cfg.nu),
                                   float(cfg.mean_depth), g)
        return [np.asarray(x) for x in q]

    monkeypatch.setattr(psw, "KY_ALL", "0")
    ref = run()
    monkeypatch.setattr(psw, "KY_ALL", "1")
    got = run()
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)
    # loop form: same per-product math and order, fori_loop scheduling
    monkeypatch.setattr(psw, "KY_ALL", "loop")
    got = run()
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


def test_pstore_bf16_bounded(monkeypatch):
    """bf16 product-spectra storage: f32 mode bit-identical, bf16 a
    bounded bf16-class drift (split-linear keeps the balance exact)."""
    cfg = _cfg()
    t = SpectralTables.from_config(cfg)
    s = _random_state(t, cfg)
    g = cfg.grid_shape
    p = sw._state_to_planes(s)

    def run():
        q = p
        for _ in range(2):
            q = sw.rk4_step_planes(t, q, None, 1.0, float(cfg.f),
                                   float(cfg.gravity), float(cfg.nu),
                                   float(cfg.mean_depth), g)
        return [np.asarray(x) for x in q]

    monkeypatch.setattr(psw, "SPLIT_LINEAR", "1")
    monkeypatch.setattr(psw, "PSTORE", "f32")
    ref = run()
    monkeypatch.setattr(psw, "PSTORE", "auto")
    same = run()
    for a, b in zip(ref, same):
        assert np.array_equal(a, b)
    monkeypatch.setattr(psw, "PSTORE", "bf16")
    got = run()
    for i in (0, 2, 4):
        err = (np.linalg.norm(ref[i] - got[i])
               / max(np.linalg.norm(ref[i]), 1e-30))
        assert 1e-9 < err < 5e-2, (i, err)
        assert np.isfinite(got[i]).all()


def test_ka_split_matches_unsplit(monkeypatch):
    """XFB_SW_KA_SPLIT (the two-field split of the inverse x-stage that
    fits the 8192^2 KA_SW kernel into core VMEM — r5 ledger) must
    reproduce the unsplit 4-field kernel's physical fields at float32
    round-off: same diagonal factors, same four-step DFT, only the
    field batching differs (and the split path routes through
    _kb_call_stacked in two pairs)."""
    cfg = _cfg()
    t = SpectralTables.from_config(cfg)
    s = _random_state(t, cfg)
    g = cfg.grid_shape
    planes = sw._state_to_planes(s)
    es = psw.eta_pair_scale(planes)

    monkeypatch.setenv("XFB_SW_KA_SPLIT", "0")
    ref = psw.inverse_quad_planes(*planes, t.kx, t.ky, t.rlap, g,
                                  eta_scale=es)
    monkeypatch.setenv("XFB_SW_KA_SPLIT", "1")
    got = psw.inverse_quad_planes(*planes, t.kx, t.ky, t.rlap, g,
                                  eta_scale=es)
    for name, a, b in zip(("u", "v", "zeta", "eta"), ref, got):
        r = (np.linalg.norm(np.asarray(a) - np.asarray(b))
             / max(np.linalg.norm(np.asarray(a)), 1e-30))
        assert r < 1e-6, (name, r)
