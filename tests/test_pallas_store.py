"""bf16 intermediate-plane storage (XFB_PALLAS_STORE) for the fused
plane steppers.

The inter-kernel HBM links of the fast path (the KA w stacks, the KB
physical fields, the forward y-stage planes) can be stored bfloat16:
every consumer feeds matmuls that already round their inputs to bf16 in
fast-transforms mode, so the storage rounding is one more noise source
of the same magnitude while the link's HBM traffic halves (~22% of the
barotropic step, ~28% of SW at 4096² — pallas_fft STORE note). These
tests pin, on the CPU interpret path where the dots themselves are
exact f32 (so storage rounding is the ONLY noise):

* f32 stores are bit-identical to the historical pipeline (the
  inserted astype casts are no-ops);
* bf16 stores change the trajectory by a bounded bf16-class amount
  and actually take effect (diff strictly nonzero);
* the state carry and tendency outputs stay float32 either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlab_fftbarotropic_tpu.config import ModelConfig
from xlab_fftbarotropic_tpu.models import barotropic as bt
from xlab_fftbarotropic_tpu.models import shallow_water as sw
from xlab_fftbarotropic_tpu.ops import fft
from xlab_fftbarotropic_tpu.ops import pallas_fft as pf
from xlab_fftbarotropic_tpu.ops import pallas_sw as psw
from xlab_fftbarotropic_tpu.ops.spectral import SpectralTables

N = 128


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)


def _bt_cfg():
    return ModelConfig(nx=N, ny=N, dt=1.0, fft_backend="pallas")


def _bt_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    vort = (1e-4 * rng.standard_normal(cfg.grid_shape)).astype(np.float32)
    return fft.forward(jnp.asarray(vort))


def _bt_traj(t, cfg, zeta_hat, n_steps=3):
    g = cfg.grid_shape
    src = jnp.zeros((g[1], g[0]), jnp.float32)      # y-major (yfirst)
    zr, zi = jnp.real(zeta_hat), jnp.imag(zeta_hat)
    for _ in range(n_steps):
        zr, zi = bt.rk4_step_planes(t, zr, zi, src, float(cfg.dt),
                                    float(cfg.nu), g)
    return np.asarray(zr), np.asarray(zi)


def test_store_dtype_resolution(monkeypatch):
    monkeypatch.setattr(pf, "STORE", "f32")
    assert pf.store_dtype() == jnp.float32
    monkeypatch.setattr(pf, "STORE", "bf16")
    assert pf.store_dtype() == jnp.bfloat16
    # 'auto' must NEVER go lossy at fp32-HIGHEST matmuls (the <1e-6
    # reference-parity contract)
    monkeypatch.setattr(pf, "STORE", "auto")
    monkeypatch.setattr(pf, "MM_MODE", "fp32")
    assert pf.store_dtype() == jnp.float32


def test_xstage_planes_store_dtype():
    cfg = _bt_cfg()
    t = SpectralTables.from_config(cfg)
    z = _bt_state(cfg)
    wr, wi = pf.derivative_xstage_planes(
        jnp.real(z), jnp.imag(z), t.kx, t.ky, t.rlap, cfg.grid_shape,
        store=jnp.bfloat16)
    assert wr.dtype == jnp.bfloat16 and wi.dtype == jnp.bfloat16
    # default stays f32
    wr2, _ = pf.derivative_xstage_planes(
        jnp.real(z), jnp.imag(z), t.kx, t.ky, t.rlap, cfg.grid_shape)
    assert wr2.dtype == jnp.float32
    # one bf16 rounding of the f32 planes: rel-L2 <= ~2^-9
    assert _rel(np.asarray(wr2), np.asarray(wr, np.float32)) < 4e-3


@pytest.mark.parametrize("mode", ["half", "full"])
def test_bt_f32_store_bit_identical(mode, monkeypatch):
    """STORE='f32' through the fused-KB path must be bit-identical to
    the historical pipeline (casts are no-ops)."""
    cfg = _bt_cfg()
    t = SpectralTables.from_config(cfg)
    z = _bt_state(cfg)
    monkeypatch.setattr(pf, "FUSEKB", mode)
    monkeypatch.setattr(pf, "STORE", "f32")
    ref = _bt_traj(t, cfg, z)
    monkeypatch.setattr(pf, "STORE", "auto")   # auto->f32 at fp32 MM
    got = _bt_traj(t, cfg, z)
    assert np.array_equal(ref[0], got[0]) and np.array_equal(ref[1], got[1])


@pytest.mark.parametrize("mode", ["half", "full"])
def test_bt_bf16_store_bounded(mode, monkeypatch):
    """bf16 stores: bounded bf16-class trajectory change, f32 carry."""
    cfg = _bt_cfg()
    t = SpectralTables.from_config(cfg)
    z = _bt_state(cfg)
    monkeypatch.setattr(pf, "FUSEKB", mode)
    monkeypatch.setattr(pf, "STORE", "f32")
    ref = _bt_traj(t, cfg, z)
    monkeypatch.setattr(pf, "STORE", "bf16")
    got = _bt_traj(t, cfg, z)
    err = _rel(ref[0], got[0])
    assert 1e-8 < err < 5e-2, err
    assert np.isfinite(got[0]).all() and np.isfinite(got[1]).all()


def _sw_cfg():
    return ModelConfig(nx=N, ny=N, dt=1.0, fft_backend="pallas")


def _sw_traj(t, cfg, s, n_steps=2):
    g = cfg.grid_shape
    p = sw._state_to_planes(s)
    for _ in range(n_steps):
        p = sw.rk4_step_planes(t, p, None, float(cfg.dt),
                               float(cfg.f), float(cfg.gravity),
                               float(cfg.nu), float(cfg.mean_depth), g)
    return [np.asarray(x) for x in p]


def test_sw_store_f32_bit_identical_and_bf16_bounded(monkeypatch):
    cfg = _sw_cfg()
    t = SpectralTables.from_config(cfg)
    rng = np.random.default_rng(3)

    def f32(amp):
        return (amp * rng.standard_normal(cfg.grid_shape)).astype(np.float32)

    s = sw.SWState(zeta_hat=fft.forward(jnp.asarray(f32(1e-4))),
                   div_hat=fft.forward(jnp.asarray(f32(1e-6))),
                   eta_hat=fft.forward(jnp.asarray(f32(5.0))))
    # production fast config keeps the linear terms exact in COMBINE
    monkeypatch.setattr(psw, "SPLIT_LINEAR", "1")
    monkeypatch.setattr(pf, "STORE", "f32")
    ref = _sw_traj(t, cfg, s)
    monkeypatch.setattr(pf, "STORE", "auto")
    same = _sw_traj(t, cfg, s)
    for a, b in zip(ref, same):
        assert np.array_equal(a, b)
    monkeypatch.setattr(pf, "STORE", "bf16")
    got = _sw_traj(t, cfg, s)
    # zeta / div / eta planes: bounded bf16-class drift, nonzero
    for i, tol in ((0, 5e-2), (2, 5e-2), (4, 5e-2)):
        err = _rel(ref[i], got[i])
        assert 1e-8 < err < tol, (i, err)
        assert np.isfinite(got[i]).all()


@pytest.mark.parametrize("store", ["f32", "bf16"])
def test_fusekx_bit_identical(store, monkeypatch):
    """KX+VISC(+axpy) fusion (XFB_BT_FUSEKX) is a pure scheduling
    change: same dot order, same epilogue math — trajectories must be
    bit-identical to the unfused tail for either storage dtype."""
    cfg = _bt_cfg()
    t = SpectralTables.from_config(cfg)
    z = _bt_state(cfg)
    monkeypatch.setattr(pf, "STORE", store)
    monkeypatch.setattr(pf, "FUSEKX", "0")
    ref = _bt_traj(t, cfg, z)
    monkeypatch.setattr(pf, "FUSEKX", "1")
    got = _bt_traj(t, cfg, z)
    assert np.array_equal(ref[0], got[0]) and np.array_equal(ref[1], got[1])


def test_fusekx_nonaxpy_path(monkeypatch):
    """The r4 stage (no axpy) also routes through the fused tail."""
    cfg = _bt_cfg()
    t = SpectralTables.from_config(cfg)
    z = _bt_state(cfg)
    g = cfg.grid_shape
    src = jnp.zeros((g[1], g[0]), jnp.float32)
    zr, zi = jnp.real(z), jnp.imag(z)
    monkeypatch.setattr(pf, "FUSEKX", "0")
    wr, wi = pf.derivative_xstage_planes(zr, zi, t.kx, t.ky, t.rlap, g)
    zx, zy = pf._kb_call_stacked(wr, wi, 0, 1, g[1],
                                 1.0 / (g[0] * g[1]), transpose_out=False)
    fr, fi = pf.kb_adv_half(zx, zy, wr, wi, src, g)
    ref = pf.forward_tail(fr, fi, t.lap, t.mask, zr, zi,
                          float(cfg.nu), g)
    monkeypatch.setattr(pf, "FUSEKX", "1")
    got = pf.forward_tail(fr, fi, t.lap, t.mask, zr, zi,
                          float(cfg.nu), g)
    assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))
