"""Overlapped fused transpose+DFT+transpose kernel (parallel/pallas_overlap)
vs the unfused dfft path, interpret mode on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xlab_fftbarotropic_tpu.parallel import dfft, pallas_overlap as po

try:
    shard_map = jax.shard_map
except AttributeError:
    from jax.experimental.shard_map import shard_map

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices")


@pytest.fixture(scope="module")
def mesh():
    import numpy as _np
    return jax.sharding.Mesh(_np.array(jax.devices()), ("x",))


def _spec(rng, shape):
    return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(np.complex64)


@pytest.mark.parametrize("n_chunks", [1, 2, 4])
def test_xstage_forward_matches_global_fft(mesh, rng, n_chunks):
    n = mesh.shape["x"]
    s = _spec(rng, (64, 33))

    ours = jax.jit(shard_map(
        lambda a: po.xstage(a, "x", n, forward=True, n_chunks=n_chunks,
                            interpret=True),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))
    ref = np.fft.fft(s, axis=0).astype(np.complex64)
    got = np.asarray(ours(jnp.asarray(s)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)


def test_xstage_inverse_scale(mesh, rng):
    n = mesh.shape["x"]
    s = _spec(rng, (64, 33))
    ours = jax.jit(shard_map(
        lambda a: po.xstage(a, "x", n, forward=False, n_chunks=2,
                            interpret=True, scale=1.0 / 64),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))
    ref = np.fft.ifft(s, axis=0).astype(np.complex64)
    got = np.asarray(ours(jnp.asarray(s)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)


def test_overlapped_pair_matches_dfft(mesh, rng):
    """rfft2/irfft2 with the overlapped x-stage == the unfused dfft pair."""
    n = mesh.shape["x"]
    field = rng.randn(64, 64).astype(np.float32)

    fwd_o, inv_o = po.make_fft_pair("x", n, n_chunks=2, interpret=True)
    fwd_r, inv_r = dfft.make_fft_pair("x", n)

    run_o = jax.jit(shard_map(
        lambda a: inv_o(fwd_o(a), (64, 64)),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))
    run_r = jax.jit(shard_map(
        lambda a: inv_r(fwd_r(a), (64, 64)),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)))

    a = jnp.asarray(field)
    np.testing.assert_allclose(np.asarray(run_o(a)), np.asarray(run_r(a)),
                               rtol=2e-5, atol=2e-5)

    spec_o = jax.jit(shard_map(
        fwd_o, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))(a)
    ref = np.fft.rfft2(field).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(spec_o), ref, rtol=2e-5,
                               atol=2e-3)


def test_sharded_model_with_overlap_fft(mesh, rng):
    """5 RK4 steps of the sharded barotropic model on the overlapped FFT
    pair vs the single-device model."""
    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.models.barotropic import BarotropicModel
    from xlab_fftbarotropic_tpu.parallel.model import (
        ShardedBarotropicModel)

    cfg = ModelConfig(nx=64, ny=64)
    v0 = makefields.gaussian(cfg)
    single = BarotropicModel.build(cfg)
    z1 = single.segment(single.init_state(v0),
                        jnp.zeros(cfg.grid_shape, jnp.float32), 5)

    m = ShardedBarotropicModel.build(cfg, mesh, fft_impl="overlap")
    z = m.shard_spectral(single.init_state(v0))
    z2 = m.segment(z, m.zero_source(), 5)
    a = np.asarray(jnp.fft.irfft2(z1, s=cfg.grid_shape))
    b = np.asarray(jnp.fft.irfft2(jnp.asarray(z2), s=cfg.grid_shape))
    assert np.max(np.abs(a - b)) < 1e-6 * max(1.0, np.max(np.abs(a)))


def test_plan_chunks_hardware_mode():
    """Hardware chunk plan: 128-lane chunks, half axis padded to P*128
    (both Mosaic alignment constraints verified on hardware)."""
    from xlab_fftbarotropic_tpu.parallel.pallas_overlap import plan_chunks

    hpad, q = plan_chunks(2049, 8, 4, lane_plan=True)
    assert hpad == 3072 and q == 3          # 4096^2 north-star shape
    assert hpad % (8 * 128) == 0
    hpad, q = plan_chunks(257, 1, 4, lane_plan=True)
    assert hpad == 384 and q == 3           # 512^2 hardware smoke shape
    # the n_chunks plan honors n_chunks exactly
    hpad, q = plan_chunks(33, 8, 2, lane_plan=False)
    assert hpad == 48 and q == 2


def test_xstage_hardware_chunk_geometry(mesh, rng):
    """The EXACT hardware chunk plan (fixed 128-lane slots, padded to
    P*128) executed in interpret mode at P=8: hny=1025 -> hpad=2048,
    2 chunks of 128 lanes per shard — the geometry a pod will run."""
    n = mesh.shape["x"]
    s = _spec(rng, (64, 1025))

    ours = jax.jit(shard_map(
        lambda a: po.xstage(a, "x", n, forward=True, interpret=True,
                            lane_plan=True),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))
    ref = np.fft.fft(s, axis=0).astype(np.complex64)
    got = np.asarray(ours(jnp.asarray(s)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)
