"""x-pencil spectral layout (parallel/xpencil.py) on the 8-virtual-device
CPU mesh: one all_to_all per transform instead of the slab's two, for all
three fft impls (xla collectives, pallas DMA transposes, and the
gather/scatter halves of the overlapped transpose+DFT kernel).

Strategy per SURVEY.md §4: jnp.fft and the single-device model are the
oracles; the slab path (itself differentially verified) cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xlab_fftbarotropic_tpu.config import ModelConfig
from xlab_fftbarotropic_tpu.ic import makefields
from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
from xlab_fftbarotropic_tpu.parallel import model as pmodel
from xlab_fftbarotropic_tpu.parallel import xpencil
from xlab_fftbarotropic_tpu.parallel.model import (
    ShardedBarotropicModel, ShardedShallowWaterModel, make_mesh)

try:
    shard_map = jax.shard_map
except AttributeError:
    from jax.experimental.shard_map import shard_map

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices")

IMPLS = ["xla", "pallas", "overlap"]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices())


def _pair(mesh, impl, hny, check_vma=None):
    n = mesh.shape["x"]
    fwd_l, inv_l = xpencil.make_fft_pair("x", n, hny, fft_impl=impl,
                                         interpret=True)
    vma = impl == "xla" if check_vma is None else check_vma
    fwd = jax.jit(shard_map(fwd_l, mesh=mesh, in_specs=P("x", None),
                            out_specs=P(None, "x"), check_vma=vma))

    def inv_fn(s, gs):
        return inv_l(s, gs)

    return fwd, fwd_l, inv_fn, vma


@pytest.mark.parametrize("impl", IMPLS)
def test_xpencil_forward_matches_rfft2(mesh, rng, impl):
    n = mesh.shape["x"]
    f = rng.randn(64, 64).astype(np.float32)
    hny = 33
    fwd, *_ = _pair(mesh, impl, hny)
    got = np.asarray(fwd(jnp.asarray(f)))
    hpad = xpencil.hpad_for(hny, n, impl, interpret=True)
    assert got.shape == (64, hpad)
    want = np.fft.rfft2(f).astype(np.complex64)
    np.testing.assert_allclose(got[:, :hny], want, rtol=2e-5, atol=1e-3)
    # pad columns are exact zeros
    np.testing.assert_array_equal(got[:, hny:], 0.0)


@pytest.mark.parametrize("impl", IMPLS)
def test_xpencil_roundtrip(mesh, rng, impl):
    n = mesh.shape["x"]
    f = rng.randn(64, 64).astype(np.float32)
    hny = 33
    fwd_l, inv_l = xpencil.make_fft_pair("x", n, hny, fft_impl=impl,
                                         interpret=True)
    vma = impl == "xla"
    run = jax.jit(shard_map(
        lambda a: inv_l(fwd_l(a), (64, 64)), mesh=mesh,
        in_specs=P("x", None), out_specs=P("x", None), check_vma=vma))
    back = np.asarray(run(jnp.asarray(f)))
    np.testing.assert_allclose(back, f, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
def test_xpencil_inverse_matches_irfft2(mesh, rng, impl):
    """Inverse from a padded x-pencil (pad columns zero) == irfft2."""
    n = mesh.shape["x"]
    hny = 33
    hpad = xpencil.hpad_for(hny, n, impl, interpret=True)
    spec = (rng.randn(64, hny)
            + 1j * rng.randn(64, hny)).astype(np.complex64)
    padded = np.pad(spec, ((0, 0), (0, hpad - hny)))
    fwd_l, inv_l = xpencil.make_fft_pair("x", n, hny, fft_impl=impl,
                                         interpret=True)
    vma = impl == "xla"
    inv = jax.jit(shard_map(
        lambda s: inv_l(s, (64, 64)), mesh=mesh,
        in_specs=P(None, "x"), out_specs=P("x", None), check_vma=vma))
    got = np.asarray(inv(jnp.asarray(padded)))
    want = np.fft.irfft2(spec, s=(64, 64)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
def test_xpencil_barotropic_segment_matches_single(mesh, impl):
    cfg = ModelConfig(nx=64, ny=64, dt=3.0, nu=6.5)
    vort0 = makefields.gaussian(cfg)
    single = BarotropicModel.build(cfg)
    multi = ShardedBarotropicModel.build(cfg, mesh, fft_impl=impl,
                                         decomp="xpencil")
    assert multi.hpad == xpencil.hpad_for(33, mesh.shape["x"], impl,
                                          interpret=True)

    z1 = single.init_state(vort0)
    zN = multi.init_state(vort0)
    np.testing.assert_allclose(
        multi.unshard_spectral(zN), np.asarray(z1), rtol=2e-5, atol=1e-4)

    steps = 5
    z1 = single.segment(z1, single.zero_source(), steps)
    zN = multi.segment(zN, multi.zero_source(), steps)
    np.testing.assert_allclose(
        multi.unshard_spectral(zN), np.asarray(z1), rtol=5e-5, atol=5e-4)


def test_xpencil_matches_slab_trajectory(mesh):
    """Same mesh, same steps: x-pencil (1 a2a/transform) == slab
    (2 a2as/transform) to float round-off."""
    cfg = ModelConfig(nx=64, ny=64, dt=3.0, nu=6.5)
    vort0 = makefields.kuo2004(cfg)
    slab = ShardedBarotropicModel.build(cfg, mesh)
    xp = ShardedBarotropicModel.build(cfg, mesh, decomp="xpencil")
    z_s = slab.segment(slab.init_state(vort0), slab.zero_source(), 5)
    z_x = xp.segment(xp.init_state(vort0), xp.zero_source(), 5)
    np.testing.assert_allclose(
        xp.unshard_spectral(z_x), np.asarray(z_s), rtol=5e-5, atol=5e-4)


@pytest.mark.parametrize("impl", ["xla", "overlap"])
def test_xpencil_sw_segment_matches_single(mesh, impl):
    from xlab_fftbarotropic_tpu.models.shallow_water import (
        ShallowWaterModel)
    cfg = ModelConfig(nx=64, ny=64, dt=1.0)
    vort0 = makefields.gaussian(cfg, zeta0=1e-5)
    single = ShallowWaterModel.build(cfg)
    multi = ShardedShallowWaterModel.build(cfg, mesh, fft_impl=impl,
                                           decomp="xpencil")
    s1 = single.geostrophic_init(vort0)
    sN = multi.geostrophic_init(vort0)

    steps = 5
    s1 = single.segment(s1, single.zero_source(), steps)
    sN = multi.segment(sN, multi.zero_source(), steps)
    got = multi.unshard_state(sN)
    # div is the small residual of cancelling zeta-scale terms; its
    # round-off floor is set by the zeta-scale dynamics (same policy as
    # tests/test_pencil.py) — normalize it by the zeta scale
    zscale = max(np.abs(np.asarray(s1.zeta_hat)).max(), 1e-30)
    for a, b, name in ((got.zeta_hat, s1.zeta_hat, "zeta"),
                       (got.div_hat, s1.div_hat, "div"),
                       (got.eta_hat, s1.eta_hat, "eta")):
        b = np.asarray(b)
        scale = zscale if name == "div" else max(np.abs(b).max(), 1e-30)
        err = np.abs(np.asarray(a) - b).max() / scale
        assert err < 1e-4, (name, err)


def test_xpencil_diags_match_single(mesh):
    cfg = ModelConfig(nx=64, ny=64)
    vort0 = makefields.elliptic_vortex(cfg)
    single = BarotropicModel.build(cfg)
    multi = ShardedBarotropicModel.build(cfg, mesh, decomp="xpencil")
    d1 = single.diags(single.init_state(vort0))
    dN = multi.diags(multi.init_state(vort0))
    for a, b in zip(dN, d1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("n_chunks", [1, 2, 4])
def test_gather_kernel_matches_global_fft(mesh, rng, n_chunks):
    """xstage_gather == fft(transpose_to_columns(.), axis=0): the
    forward half of the overlap kernel, output column-sharded."""
    from xlab_fftbarotropic_tpu.parallel import pallas_overlap as po
    n = mesh.shape["x"]
    s = (rng.randn(64, 33) + 1j * rng.randn(64, 33)).astype(np.complex64)
    ours = jax.jit(shard_map(
        lambda a: po.xstage_gather(a, "x", n, forward=True,
                                   n_chunks=n_chunks, interpret=True),
        mesh=mesh, in_specs=P("x", None), out_specs=P(None, "x"),
        check_vma=False))
    got = np.asarray(ours(jnp.asarray(s)))
    hpad = got.shape[1]
    ref = np.fft.fft(np.pad(s, ((0, 0), (0, hpad - 33))),
                     axis=0).astype(np.complex64)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("n_chunks", [1, 2, 4])
def test_scatter_kernel_matches_global_ifft(mesh, rng, n_chunks):
    """xstage_scatter == transpose_to_rows(ifft(.)): the inverse half,
    input column-sharded, pad stripped on return."""
    from xlab_fftbarotropic_tpu.parallel import pallas_overlap as po
    n = mesh.shape["x"]
    hny = 33
    hpad = -(-hny // (n * n_chunks)) * (n * n_chunks)
    s = (rng.randn(64, hny)
         + 1j * rng.randn(64, hny)).astype(np.complex64)
    padded = np.pad(s, ((0, 0), (0, hpad - hny)))
    ours = jax.jit(shard_map(
        lambda a: po.xstage_scatter(a, "x", n, hny=hny, forward=False,
                                    n_chunks=n_chunks, interpret=True,
                                    scale=1.0 / 64),
        mesh=mesh, in_specs=P(None, "x"), out_specs=P("x", None),
        check_vma=False))
    got = np.asarray(ours(jnp.asarray(padded)))
    ref = np.fft.ifft(s, axis=0).astype(np.complex64)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)


def test_gather_scatter_hardware_chunk_geometry(mesh, rng):
    """The EXACT hardware chunk plan (fixed 128-lane slots, half axis
    padded to P*128) through both halves in interpret mode at P=8:
    hny=1025 -> hpad=2048, 2 chunks per shard — pod geometry."""
    from xlab_fftbarotropic_tpu.parallel import pallas_overlap as po
    n = mesh.shape["x"]
    hny = 1025
    s = (rng.randn(64, hny)
         + 1j * rng.randn(64, hny)).astype(np.complex64)
    run = jax.jit(shard_map(
        lambda a: po.xstage_scatter(
            po.xstage_gather(a, "x", n, forward=True, interpret=True,
                             lane_plan=True),
            "x", n, hny=hny, forward=False, interpret=True,
            lane_plan=True, scale=1.0 / 64),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))
    got = np.asarray(run(jnp.asarray(s)))
    np.testing.assert_allclose(got, s, rtol=3e-5, atol=3e-4)


def test_scatter_width_mismatch_raises(mesh):
    from xlab_fftbarotropic_tpu.parallel import pallas_overlap as po
    n = mesh.shape["x"]
    bad = jnp.zeros((64, 16), jnp.complex64)  # 16 != plan hpad (64)
    with pytest.raises(ValueError, match="inconsistent"):
        jax.jit(shard_map(
            lambda a: po.xstage_scatter(a, "x", n, hny=33,
                                        interpret=True),
            mesh=mesh, in_specs=P(None, "x"), out_specs=P("x", None),
            check_vma=False))(bad)


def test_xpencil_2d_mesh_multihost_layout():
    """Flattened ('host','chip') x-pencil with XLA collectives matches
    the single-device model — the multi-host halved-traffic layout on a
    virtual 2x4 mesh (tuple-axis all_to_all decomposes hierarchically,
    intra-host stage on ICI)."""
    from xlab_fftbarotropic_tpu.parallel import make_mesh2d
    cfg = ModelConfig(nx=64, ny=64)
    vort0 = makefields.gaussian(cfg)
    mesh2 = make_mesh2d((2, 4))
    multi2 = ShardedBarotropicModel.build(cfg, mesh2,
                                          axis=("host", "chip"),
                                          decomp="xpencil")
    single = BarotropicModel.build(cfg)
    z2 = multi2.segment(multi2.init_state(vort0),
                        multi2.zero_source(), 3)
    z1 = single.segment(single.init_state(vort0),
                        single.zero_source(), 3)
    scale = max(1e-30, float(jnp.max(jnp.abs(z1))))
    np.testing.assert_allclose(
        multi2.unshard_spectral(z2) / scale, np.asarray(z1) / scale,
        rtol=0, atol=5e-5)


def test_xpencil_validation_errors(mesh):
    with pytest.raises(ValueError, match="single mesh axis"):
        pmodel._xpencil_setup(ModelConfig(nx=64, ny=64), mesh,
                              ("a", "b"), "overlap")
    with pytest.raises(ValueError, match="not divisible"):
        ShardedBarotropicModel.build(ModelConfig(nx=60, ny=64), mesh,
                                     decomp="xpencil")
