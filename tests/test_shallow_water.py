"""Shallow-water model tests.

The reference has no SW implementation to diff against (TODO.md:5), so per
SURVEY.md §4 the strategy is physics-based: exact invariants (rest state,
mass), the analytic linear gravity-wave solution, geostrophic balance, and
energy conservation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xlab_fftbarotropic_tpu.config import ModelConfig
from xlab_fftbarotropic_tpu.ic import makefields
from xlab_fftbarotropic_tpu.models.shallow_water import ShallowWaterModel


def build(**kw):
    cfg = ModelConfig(nx=64, ny=64, **kw)
    return cfg, ShallowWaterModel.build(cfg)


def test_rest_state_is_steady():
    cfg, m = build(nu=0.0)
    s = m.init_state(np.zeros(cfg.grid_shape, np.float32))
    s2 = m.segment(s, None, 10)
    for a, b in zip(s, s2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_mass_exactly_conserved():
    cfg, m = build()
    s = m.geostrophic_init(makefields.gaussian(cfg))
    m0 = float(m.stats(s).mass)
    s = m.segment(s, None, 30)
    m1 = float(m.stats(s).mass)
    assert abs(m1 - m0) / m0 < 1e-6


def test_linear_gravity_wave_matches_analytic():
    """f=0, nu=0, tiny amplitude: h' = A cos(kx) evolves as
    A cos(kx) cos(c k t) with c = sqrt(g H) — standing gravity wave."""
    cfg = ModelConfig(nx=64, ny=64, f=0.0, nu=0.0, dt=3.0,
                      gravity=9.81, mean_depth=1000.0)
    m = ShallowWaterModel.build(cfg)
    k = 2 * np.pi * 4 / cfg.lx
    x, _ = cfg.coords()
    A = 1e-3 * cfg.mean_depth
    hp0 = (A * np.cos(k * x))[:, None] * np.ones((1, cfg.ny), np.float32)
    s = m.init_state(np.zeros(cfg.grid_shape), h0=cfg.mean_depth + hp0)

    c = np.sqrt(cfg.gravity * cfg.mean_depth)
    omega = c * k
    n_steps = 40
    s = m.segment(s, None, n_steps)
    t = n_steps * cfg.dt
    want = cfg.mean_depth + hp0 * np.cos(omega * t)
    got = np.asarray(m.diags(s).h)
    # linear theory exact to O(A/H)=1e-3 in the nonlinear model
    np.testing.assert_allclose(got, want, atol=3e-3 * A)


def test_geostrophic_balance_stays_balanced():
    """Balanced vortex: divergence stays tiny vs the vorticity scale and
    the height field barely moves over an inertial-fraction run."""
    cfg = ModelConfig(nx=64, ny=64, nu=0.0, dt=3.0,
                      gravity=9.81, mean_depth=1000.0)
    m = ShallowWaterModel.build(cfg)
    vort0 = makefields.gaussian(cfg, zeta0=1e-5)  # Ro ~ zeta/f = 1
    s0 = m.geostrophic_init(vort0)
    h0 = np.asarray(m.diags(s0).h)
    s = m.segment(s0, None, 100)
    d = m.diags(s)
    zeta_scale = float(jnp.max(jnp.abs(d.vort)))
    assert float(jnp.max(jnp.abs(d.div))) < 0.2 * zeta_scale
    dh = np.abs(np.asarray(d.h) - h0)
    eta_scale = max(1e-12, float(np.max(np.abs(h0 - cfg.mean_depth))))
    assert float(dh.max()) < 0.25 * eta_scale


def test_energy_conservation_inviscid():
    cfg = ModelConfig(nx=64, ny=64, nu=0.0, dt=3.0,
                      gravity=9.81, mean_depth=1000.0)
    m = ShallowWaterModel.build(cfg)
    s = m.geostrophic_init(makefields.kuo2004(cfg))
    e0 = float(m.stats(s).energy)
    pe_rest = 0.5 * cfg.gravity * cfg.mean_depth**2
    s = m.segment(s, None, 50)
    e1 = float(m.stats(s).energy)
    # compare against the dynamic part (total is dominated by 0.5*g*H^2)
    assert abs(e1 - e0) / max(1e-30, abs(e0 - pe_rest)) < 1e-3


def test_vorticity_source_forcing_enters():
    cfg, m = build()
    s = m.geostrophic_init(makefields.gaussian(cfg))
    src = np.zeros(cfg.grid_shape, np.float32)
    src[10:20, 10:20] = 1e-6
    s_forced = m.step(s, jnp.asarray(src))
    s_free = m.step(s, None)
    dz = np.abs(np.asarray(s_forced.zeta_hat) - np.asarray(s_free.zeta_hat))
    assert dz.max() > 0.0
    # h is not directly forced within a single stage's first evaluation,
    # but the coupled RK stages propagate it; just check state validity
    assert np.isfinite(np.asarray(s_forced.eta_hat)).all()


def test_sw_reduces_toward_barotropic_at_large_depth():
    """With huge mean depth (fast gravity waves already balanced away by
    geostrophic init) the vorticity evolution approaches the barotropic
    model's over a short run."""
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
    cfg = ModelConfig(nx=64, ny=64, nu=6.5, dt=1.0,
                      gravity=9.81, mean_depth=1e5)
    sw = ShallowWaterModel.build(cfg)
    bt = BarotropicModel.build(cfg)
    vort0 = makefields.kuo2004(cfg)
    s = sw.geostrophic_init(vort0)
    z = bt.init_state(vort0)
    src = jnp.zeros(cfg.grid_shape, jnp.float32)
    n = 20
    s = sw.segment(s, None, n)
    z = bt.segment(z, src, n)
    vort_sw = np.asarray(sw.diags(s).vort)
    vort_bt = np.asarray(bt.diags(z)[0])
    scale = np.abs(vort_bt).max()
    assert np.abs(vort_sw - vort_bt).max() < 0.05 * scale


def test_gravity_wave_cfl_warning():
    """dt above the RK4 gravity-wave bound must warn at build time (the
    4096^2 default-dt NaN, BASELINE.md); a compliant dt must not."""
    import warnings

    from xlab_fftbarotropic_tpu.models.shallow_water import (
        ShallowWaterModel, max_stable_dt)

    cfg = ModelConfig(nx=64, ny=64, dt=10 * max_stable_dt(
        ModelConfig(nx=64, ny=64)))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ShallowWaterModel.build(cfg)
    assert any("CFL" in str(x.message) for x in w)

    ok = ModelConfig(nx=64, ny=64)
    assert ok.dt < max_stable_dt(ok)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ShallowWaterModel.build(ok)
    assert not any("CFL" in str(x.message) for x in w)
