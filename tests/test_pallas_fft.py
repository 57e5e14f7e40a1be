"""Fused Pallas FFT pipeline (ops/pallas_fft.py) vs numpy, in interpret
mode (CPU). Kernel math — four-step digit splits, mixed-domain partial
Hermitian sums, transposed writes — must reproduce the library transforms
to float32 round-off, and the whole RK4 core must follow the jnp.fft
trajectory."""

import jax.numpy as jnp
import numpy as np
import pytest

from xlab_fftbarotropic_tpu.config import ModelConfig
from xlab_fftbarotropic_tpu.ic import makefields
from xlab_fftbarotropic_tpu.ops import pallas_fft as pf


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)


@pytest.mark.parametrize("n", [128, 256, 512])
def test_rfft2_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((n, n)).astype(np.float32)
    assert _rel(np.fft.rfft2(x), pf.rfft2(jnp.asarray(x))) < 2e-6


@pytest.mark.parametrize("n", [128, 512])
def test_inverse_pair_matches_numpy(n):
    rng = np.random.default_rng(n + 1)
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal((n, n)).astype(np.float32)
    sa = jnp.asarray(np.fft.rfft2(a).astype(np.complex64))
    sb = jnp.asarray(np.fft.rfft2(b).astype(np.complex64))
    ga, gb = pf.inverse_pair(sa, sb, (n, n))
    assert _rel(a, ga) < 2e-6
    assert _rel(b, gb) < 2e-6


def test_irfft2_matches_numpy():
    n = 256
    rng = np.random.default_rng(9)
    a = rng.standard_normal((n, n)).astype(np.float32)
    spec = np.fft.rfft2(a).astype(np.complex64)
    assert _rel(np.fft.irfft2(spec, s=(n, n)),
                pf.irfft2(jnp.asarray(spec), (n, n))) < 2e-6


def test_nyquist_leak_guard():
    """Non-Hermitian content in the self-conjugate columns (the
    positive-Nyquist gradient convention, SURVEY.md §5.3) must be
    projected out, not leaked into the paired field."""
    n = 128
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n, n)).astype(np.float32)
    sa = np.fft.rfft2(a).astype(np.complex64)
    # poison the self-conjugate columns with non-Hermitian junk
    sa_p = sa.copy()
    sa_p[:, 0] += (0.3 + 0.7j) * rng.standard_normal(n).astype(np.float32)
    sa_p[:, n // 2] += (0.1 - 0.4j) * rng.standard_normal(n).astype(
        np.float32)
    ref = np.fft.irfft2(sa_p, s=(n, n))       # numpy projects implicitly
    ga, gb = pf.inverse_pair(jnp.asarray(sa_p),
                             jnp.asarray(np.zeros_like(sa_p)), (n, n))
    assert _rel(ref, ga) < 2e-5
    assert np.max(np.abs(np.asarray(gb))) < 1e-5 * np.max(np.abs(ref))


def test_rk4_trajectory_equivalence():
    """20 RK4 steps on the pallas backend vs the jnp.fft core."""
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel

    cfg = ModelConfig(nx=128, ny=128)
    v0 = makefields.kuo2004(cfg)
    src = jnp.zeros(cfg.grid_shape, jnp.float32)
    m_ref = BarotropicModel.build(cfg)
    m_pal = BarotropicModel.build(cfg.replace(fft_backend="pallas"))
    z_ref = m_ref.segment(m_ref.init_state(v0), src, 20)
    z_pal = m_pal.segment(m_pal.init_state(v0), src, 20)
    a = np.asarray(jnp.fft.irfft2(z_ref, s=cfg.grid_shape))
    b = np.asarray(jnp.fft.irfft2(z_pal, s=cfg.grid_shape))
    assert np.max(np.abs(a - b)) < 1e-6 * max(1.0, np.max(np.abs(a)))


def test_plane_stepper_trajectory_equivalence():
    """The EXPERIMENTAL fully fused plane-state stepper (rk4_step_planes:
    derivative_quad + forward_tendency, off by default — see
    models/barotropic.py:PLANE_STEPPER) must follow the jnp.fft core."""
    from xlab_fftbarotropic_tpu.models import barotropic as bt

    cfg = ModelConfig(nx=128, ny=128)
    v0 = makefields.kuo2004(cfg)
    src = jnp.zeros(cfg.grid_shape, jnp.float32)
    m_ref = bt.BarotropicModel.build(cfg)
    z_ref = m_ref.segment(m_ref.init_state(v0), src, 20)
    old = bt.PLANE_STEPPER
    bt.PLANE_STEPPER = True
    try:
        m_pl = bt.BarotropicModel.build(cfg.replace(fft_backend="pallas"))
        z_pl = m_pl.segment(m_pl.init_state(v0), src, 20)
    finally:
        bt.PLANE_STEPPER = old
    a = np.asarray(jnp.fft.irfft2(z_ref, s=cfg.grid_shape))
    b = np.asarray(jnp.fft.irfft2(z_pl, s=cfg.grid_shape))
    assert np.max(np.abs(a - b)) < 1e-6 * max(1.0, np.max(np.abs(a)))


def test_forward_tendency_matches_composition():
    """forward_tendency == dealias(rfft2(-u*zx - v*zy + S) + nu*lap*Z)."""
    from xlab_fftbarotropic_tpu.ops.spectral import SpectralTables

    cfg = ModelConfig(nx=128, ny=128)
    t = SpectralTables.from_config(cfg)
    rng = np.random.default_rng(11)
    n = cfg.nx
    u, zx, v, zy, src = (rng.standard_normal((n, n)).astype(np.float32)
                         for _ in range(5))
    z = np.fft.rfft2(rng.standard_normal((n, n))).astype(np.complex64)
    nu = 6.5
    ref = np.asarray(t.mask) * (
        np.fft.rfft2(-u * zx - v * zy + src)
        + nu * np.asarray(t.lap) * z)
    tr, ti = pf.forward_tendency(
        jnp.asarray(u), jnp.asarray(zx), jnp.asarray(v), jnp.asarray(zy),
        jnp.asarray(src), t.lap, t.mask,
        jnp.asarray(z.real), jnp.asarray(z.imag), nu, cfg.grid_shape)
    got = np.asarray(tr) + 1j * np.asarray(ti)
    assert _rel(ref, got) < 2e-5


def test_plane_stepper_size_gate(monkeypatch):
    """The fused plane stepper is capped at PLANE_STEPPER_MAX (8192
    since round 5: the loop-chunked kernel bodies fit the compile that
    OOM-killed the AOT helper in r2-r4 — BASELINE.md r5 ledger); above
    the cap the pallas backend falls back to the per-transform
    pipeline, and XFB_PLANE_STEPPER_MAX moves the cap without a code
    change."""
    from xlab_fftbarotropic_tpu.models import barotropic as bt

    assert bt.use_plane_stepper((4096, 4096)) == bt.PLANE_STEPPER
    assert bt.use_plane_stepper((8192, 8192)) == bt.PLANE_STEPPER
    assert not bt.use_plane_stepper((16384, 16384))
    *_, quad = bt.resolve_fft_backend("pallas", (16384, 16384))
    assert quad is None
    *_, quad4 = bt.resolve_fft_backend("pallas", (4096, 4096))
    assert quad4 is not None
    monkeypatch.setenv("XFB_PLANE_STEPPER_MAX", "4096")
    assert not bt.use_plane_stepper((8192, 8192))


def test_auto_gate_is_range_based(monkeypatch):
    """fft_backend='auto' selects pallas over a RANGE [XFB_PALLAS_MIN,
    XFB_PALLAS_MAX] of square power-of-two grids (VERDICT r1 item 10) —
    the gate must not silently drop the pallas win for e.g. 8192^2 on a
    host whose compile-memory budget allows it."""
    import jax
    from xlab_fftbarotropic_tpu.models import barotropic as bt

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert bt.resolve_fft_backend_name("auto", (4096, 4096)) == "pallas"
    assert bt.resolve_fft_backend_name("auto", (2048, 2048)) == "xla"
    # fp32 caps (r5 ledger): barotropic measured 2.0x XLA at 8192^2 ->
    # cap 8192; SW/tracer fp32 kernels exceed core VMEM there
    # (150.9/133.1 MB vs 128, measured rejections) -> cap 4096
    assert bt.resolve_fft_backend_name("auto", (8192, 8192)) == "pallas"
    assert bt.resolve_fft_backend_name(
        "auto", (8192, 8192), family="sw") == "xla"
    assert bt.resolve_fft_backend_name(
        "auto", (8192, 8192), family="tracer") == "xla"
    assert bt.resolve_fft_backend_name("auto", (16384, 16384)) == "xla"
    # env override lifts the cap without a code change
    monkeypatch.setenv("XFB_PALLAS_MAX", "16384")
    assert bt.resolve_fft_backend_name("auto", (16384, 16384)) == "pallas"
    monkeypatch.setenv("XFB_PALLAS_MIN", "2048")
    assert bt.resolve_fft_backend_name("auto", (2048, 2048)) == "pallas"
    # non-square and non-power-of-two grids never take the gate
    assert bt.resolve_fft_backend_name("auto", (4096, 2048)) == "xla"
    assert bt.resolve_fft_backend_name("auto", (3000, 3000)) == "xla"
    # plane-stepper cap is env-adjustable the same way
    monkeypatch.setenv("XFB_PLANE_STEPPER_MAX", "8192")
    assert bt.use_plane_stepper((8192, 8192)) == bt.PLANE_STEPPER


def test_auto_gate_floor_drops_in_fast_mode(monkeypatch):
    """With lossy kernel matmuls (fast-transforms mode) the pallas floor
    moves to 1024: measured 1.32x XLA at 1024^2 and 1.94x at 2048^2
    (BASELINE.md 2026-08-18). Both the env var and the in-process
    MM_MODE override (cli --fast-transforms) must flip the gate."""
    import jax
    from xlab_fftbarotropic_tpu.models import barotropic as bt
    from xlab_fftbarotropic_tpu.ops import pallas_fft

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pallas_fft, "MM_MODE", "fp32")
    assert bt.resolve_fft_backend_name("auto", (2048, 2048)) == "xla"
    assert bt.resolve_fft_backend_name("auto", (1024, 1024)) == "xla"
    monkeypatch.setattr(pallas_fft, "MM_MODE", "default")
    assert bt.resolve_fft_backend_name("auto", (2048, 2048)) == "pallas"
    assert bt.resolve_fft_backend_name("auto", (1024, 1024)) == "pallas"
    assert bt.resolve_fft_backend_name("auto", (512, 512)) == "xla"
    # fast-mode 8192^2 measured for all three families (r5 ledger:
    # 3.96x/4.07x/4.34x XLA) -> cap 8192 everywhere in fast mode
    for fam in ("barotropic", "sw", "tracer"):
        assert bt.resolve_fft_backend_name(
            "auto", (8192, 8192), family=fam) == "pallas"
    # explicit floor still wins over the fast default
    monkeypatch.setenv("XFB_PALLAS_MIN", "4096")
    assert bt.resolve_fft_backend_name("auto", (2048, 2048)) == "xla"


def test_mm_bf16x3_trajectory_accuracy(monkeypatch):
    """XFB_PALLAS_MM=bf16x3 (Veltkamp split-operand decomposition +
    DEFAULT-precision dots, ops/pallas_fft._mm) must track the fp32
    kernels at float32 round-off over a scanned segment. Under CPU
    interpret, DEFAULT-precision dots run full f32, so this pins the
    SPLIT STRUCTURE (hi+lo exact, tables split without loss, no term
    dropped); the MXU's internal bf16 rounding of the lo/Tl parts adds
    a bounded ~2^-16-of-product term on hardware, cross-checked there
    by the A/B harness checksums (BASELINE.md). bf16 (single-pass) is a
    speed-of-light probe only: ~4e-3."""
    import jax.numpy as jnp
    import numpy as np

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
    from xlab_fftbarotropic_tpu.ops import pallas_fft

    cfg = ModelConfig(nx=128, ny=128, fft_backend="pallas")
    outs = {}
    for mode in ("fp32", "bf16x3"):
        monkeypatch.setattr(pallas_fft, "MM_MODE", mode)
        m = BarotropicModel.build(cfg)
        z = m.init_state(makefields.gaussian(cfg))
        outs[mode] = np.asarray(
            m.segment(z, jnp.zeros(cfg.grid_shape, jnp.float32), 5))
    rel = (np.linalg.norm(outs["bf16x3"] - outs["fp32"])
           / np.linalg.norm(outs["fp32"]))
    assert rel < 2e-6, rel


def test_mm_bf16x3_shallow_water(monkeypatch):
    """Same split-structure pin for the SW family: pallas_sw reuses the
    presplit-aware table builders (_ka_tables/_kc_tables) and the
    _mm-routed helpers (_four_step/_cmatmul_left/_dot2), so a bf16x3
    segment must track fp32 at float32 round-off under CPU interpret —
    this would fail loudly if any SW matmul-LHS table skipped
    _presplit_lhs (the halves would be sliced from an unsplit table)."""
    import jax
    import numpy as np

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.shallow_water import ShallowWaterModel
    from xlab_fftbarotropic_tpu.ops import pallas_fft

    cfg = ModelConfig(nx=128, ny=128, fft_backend="pallas", dt=1.0)
    outs = {}
    for mode in ("fp32", "bf16x3"):
        monkeypatch.setattr(pallas_fft, "MM_MODE", mode)
        m = ShallowWaterModel.build(cfg)
        z = m.geostrophic_init(makefields.gaussian(cfg, zeta0=1e-5))
        seg = m.segment(z, None, 5)
        outs[mode] = np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(seg)])
    rel = (np.linalg.norm(outs["bf16x3"] - outs["fp32"])
           / np.linalg.norm(outs["fp32"]))
    assert rel < 2e-6, rel


def test_bt_yfirst_matches_xfirst(monkeypatch):
    """Barotropic y-first forward order (KY_adv real partial y r2c +
    KX over hny columns + VISC epilogue) vs the x-first order
    (KA_adv + KC_visc) over a forced 5-step scanned segment — same
    transform math, different factorization order, so float32 round-off
    agreement; the nonzero forcing pins the once-per-jit src transpose
    in BarotropicModel.build."""
    import jax.numpy as jnp
    import numpy as np

    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel

    cfg = ModelConfig(nx=128, ny=128, fft_backend="pallas")
    rng = np.random.default_rng(23)
    src = jnp.asarray(
        (1e-9 * rng.standard_normal(cfg.grid_shape)).astype(np.float32))
    outs = {}
    for yf in (True, False):
        monkeypatch.setattr(pf, "FWD_YFIRST", yf)
        m = BarotropicModel.build(cfg)
        z = m.init_state(makefields.gaussian(cfg))
        outs[yf] = np.asarray(jnp.fft.irfft2(m.segment(z, src, 5),
                                             s=cfg.grid_shape))
    err = np.max(np.abs(outs[True] - outs[False]))
    assert err < 1e-5 * max(1.0, np.max(np.abs(outs[False]))), err


def test_ka_field_minor_order_bit_identical(monkeypatch):
    """Grid-mode KA with the field axis minor (input-block revisiting:
    the state/rlap reads drop 4x on hardware) is a pure iteration-order
    change — outputs must be BIT-identical to the field-major order."""
    import jax.numpy as jnp
    import numpy as np

    from xlab_fftbarotropic_tpu.ops.spectral import SpectralTables

    cfg = ModelConfig(nx=256, ny=256)
    t = SpectralTables.from_config(cfg)
    rng = np.random.default_rng(0)
    z = (rng.standard_normal(cfg.spectral_shape)
         + 1j * rng.standard_normal(cfg.spectral_shape)).astype(np.complex64)
    zr, zi = jnp.real(jnp.asarray(z)), jnp.imag(jnp.asarray(z))
    outs = {}
    for minor in (True, False):
        monkeypatch.setattr(pf, "KA_FIELD_MINOR", minor)
        outs[minor] = pf.derivative_quad_planes(zr, zi, t.kx, t.ky,
                                                t.rlap, cfg.grid_shape,
                                                ymajor=True)
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["half", "full"])
def test_fusekb_bit_identical(mode, monkeypatch):
    """The KB+advection fusion (physical fields never in HBM) composes
    the exact same kernel math as the unfused 2x KB + KY_adv pipeline —
    a 5-step forced plane-stepper trajectory must be BIT-identical."""
    from xlab_fftbarotropic_tpu.models import barotropic as bt

    cfg = ModelConfig(nx=128, ny=128, fft_backend="pallas")
    v0 = makefields.kuo2004(cfg)
    rng = np.random.default_rng(7)
    src = jnp.asarray(
        1e-6 * rng.standard_normal(cfg.grid_shape).astype(np.float32))
    monkeypatch.setattr(bt, "PLANE_STEPPER", True)
    monkeypatch.setattr(pf, "FUSEKB", "0")
    m0 = bt.BarotropicModel.build(cfg)
    z0 = m0.segment(m0.init_state(v0), src, 5)
    monkeypatch.setattr(pf, "FUSEKB", mode)
    m1 = bt.BarotropicModel.build(cfg)
    z1 = m1.segment(m1.init_state(v0), src, 5)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))


def test_fusetail_bit_identical(monkeypatch):
    """The RK4 tail fused into the stage-4 KX kernel
    (_kx_visc_tail_kernel) uses the same accumulation grouping as
    plane_rk4_combine, so a forced plane-stepper trajectory must be
    BIT-identical with the fusion on and off."""
    from xlab_fftbarotropic_tpu.models import barotropic as bt

    cfg = ModelConfig(nx=128, ny=128, fft_backend="pallas")
    v0 = makefields.kuo2004(cfg)
    rng = np.random.default_rng(11)
    src = jnp.asarray(
        1e-6 * rng.standard_normal(cfg.grid_shape).astype(np.float32))
    monkeypatch.setattr(bt, "PLANE_STEPPER", True)
    monkeypatch.setattr(pf, "FUSETAIL", "0")
    m0 = bt.BarotropicModel.build(cfg)
    z0 = m0.segment(m0.init_state(v0), src, 4)
    monkeypatch.setattr(pf, "FUSETAIL", "1")
    m1 = bt.BarotropicModel.build(cfg)
    z1 = m1.segment(m1.init_state(v0), src, 4)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))


def test_three_factor_dft_matches_numpy():
    """_four_step3 (n = a*b*c digit algebra) reproduces the full DFT of
    complex data to float32 round-off in interpret-trace (plain jnp
    here — the kernels call the identical function on VMEM arrays)."""
    n, m = 256, 8
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((n, m)).astype(np.float32)
    xi = rng.standard_normal((n, m)).astype(np.float32)
    for forward in (True, False):
        tabs = [jnp.asarray(t) for t in pf._ka_tables3(n, forward)]
        yr, yi = pf._four_step3(jnp.asarray(xr), jnp.asarray(xi), n, m,
                                *tabs)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(xr + 1j * xi, axis=0)
        if not forward:
            ref = np.conj(np.fft.fft(np.conj(xr + 1j * xi), axis=0))
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert err < 1e-5, (forward, err)
    # factor sanity at the probe sizes
    assert pf._split3(4096) == (16, 16, 16)
    assert pf._split3(2048) == (16, 16, 8)
    assert pf._split3(8192) == (32, 16, 16)


def test_split3_ka_trajectory_matches_two_factor(monkeypatch):
    """XFB_PALLAS_SPLIT3=ka (three-factor KA grid x-stage) reproduces
    the two-factor plane-stepper trajectory at float32 round-off — a
    regrouped but mathematically identical transform."""
    from xlab_fftbarotropic_tpu.models import barotropic as bt

    cfg = ModelConfig(nx=256, ny=256, fft_backend="pallas")
    v0 = makefields.kuo2004(cfg)
    src = jnp.zeros(cfg.grid_shape, jnp.float32)
    monkeypatch.setattr(bt, "PLANE_STEPPER", True)
    monkeypatch.setattr(pf, "SPLIT3", "")
    m0 = bt.BarotropicModel.build(cfg)
    z0 = m0.segment(m0.init_state(v0), src, 3)
    monkeypatch.setattr(pf, "SPLIT3", "ka")
    m1 = bt.BarotropicModel.build(cfg)
    z1 = m1.segment(m1.init_state(v0), src, 3)
    a, b = np.asarray(z0), np.asarray(z1)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 1e-6, rel


def test_chunked_kernel_bodies_match_unchunked(monkeypatch):
    """XFB_PALLAS_CHUNKS (loop-form DFT bodies for the 8192^2
    compile-memory budget) reproduces the unchunked trajectory at
    float32 round-off. Chunks write disjoint output slices with the
    same contraction grouping — on hardware the MXU accumulation depth
    is unchanged, on CPU the backend gemm may re-block small shapes, so
    the gate is a tight rel-L2 rather than bitwise."""
    from xlab_fftbarotropic_tpu.models import barotropic as bt
    from xlab_fftbarotropic_tpu.models.shallow_water import (
        ShallowWaterModel, max_stable_dt)

    cfg = ModelConfig(nx=256, ny=256, fft_backend="pallas")
    v0 = makefields.kuo2004(cfg)
    src = jnp.zeros(cfg.grid_shape, jnp.float32)
    monkeypatch.setattr(bt, "PLANE_STEPPER", True)
    monkeypatch.setattr(pf, "CHUNKS", 0)
    m0 = bt.BarotropicModel.build(cfg)
    z0 = m0.segment(m0.init_state(v0), src, 3)
    monkeypatch.setattr(pf, "CHUNKS", 4)
    m1 = bt.BarotropicModel.build(cfg)
    z1 = m1.segment(m1.init_state(v0), src, 3)
    rel = float(jnp.linalg.norm(z0 - z1) / jnp.linalg.norm(z0))
    assert rel < 1e-6, rel

    cfgs = ModelConfig(nx=128, ny=128, fft_backend="pallas")
    cfgs = cfgs.replace(dt=0.5 * max_stable_dt(cfgs))
    monkeypatch.setattr(pf, "CHUNKS", 0)
    ms0 = ShallowWaterModel.build(cfgs)
    s0 = ms0.geostrophic_init(makefields.gaussian(cfgs))
    a = ms0.segment(s0, None, 3)
    monkeypatch.setattr(pf, "CHUNKS", 2)
    ms1 = ShallowWaterModel.build(cfgs)
    b = ms1.segment(s0, None, 3)
    assert float(jnp.linalg.norm(a.zeta_hat - b.zeta_hat)
                 / jnp.linalg.norm(a.zeta_hat)) < 1e-6
    assert float(jnp.linalg.norm(a.eta_hat - b.eta_hat)
                 / jnp.linalg.norm(a.eta_hat)) < 1e-6
