"""Pallas DMA transpose kernels vs jax.lax.all_to_all, interpret mode.

The kernels move complex data as float32 views via explicit
make_async_remote_copy DMAs; these tests pin the data movement against the
XLA collective on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xlab_fftbarotropic_tpu.parallel import dfft, pallas_transpose as pt

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


def test_pallas_transpose_to_columns_matches_xla(mesh, rng):
    n = mesh.shape["x"]
    s = _spec(rng, (64, 33))

    ours = jax.jit(shard_map(
        lambda a: pt.transpose_to_columns(a, "x", n, interpret=True),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))
    xla = jax.jit(shard_map(
        lambda a: dfft.transpose_to_columns(a, "x", n),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)))
    a = jnp.asarray(s)
    np.testing.assert_array_equal(np.asarray(ours(a)), np.asarray(xla(a)))


def test_pallas_transpose_to_rows_matches_xla(mesh, rng):
    n = mesh.shape["x"]
    hny = 33
    hpad = -(-hny // n) * n
    s = _spec(rng, (64, hpad // n))

    ours = jax.jit(shard_map(
        lambda a: pt.transpose_to_rows(a, "x", n, hny, interpret=True),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
        check_vma=False))
    xla = jax.jit(shard_map(
        lambda a: dfft.transpose_to_rows(a, "x", n, hny),
        mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)))
    a = jnp.asarray(s)
    np.testing.assert_array_equal(np.asarray(ours(a)), np.asarray(xla(a)))


def test_pallas_roundtrip_is_identity(mesh, rng):
    n = mesh.shape["x"]
    s = _spec(rng, (64, 33))

    def local(a):
        cols = pt.transpose_to_columns(a, "x", n, interpret=True)
        return pt.transpose_to_rows(cols, "x", n, 33, interpret=True)

    f = jax.jit(shard_map(local, mesh=mesh,
                          in_specs=P("x", None), out_specs=P("x", None),
                          check_vma=False))
    np.testing.assert_array_equal(np.asarray(f(jnp.asarray(s))), s)


def test_distributed_fft_with_pallas_transposes(mesh, rng):
    from xlab_fftbarotropic_tpu.parallel import make_fft_pair
    n = mesh.shape["x"]
    f = rng.randn(64, 64).astype(np.float32)
    fwd_l, inv_l = make_fft_pair("x", n, use_pallas=True, interpret=True)
    fwd = jax.jit(shard_map(fwd_l, mesh=mesh, in_specs=P("x", None),
                            out_specs=P("x", None), check_vma=False))
    inv = jax.jit(shard_map(lambda s: inv_l(s, None), mesh=mesh,
                            in_specs=P("x", None), out_specs=P("x", None),
                            check_vma=False))
    got = np.asarray(fwd(jnp.asarray(f)))
    want = np.fft.rfft2(f).astype(np.complex64)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-3)
    back = np.asarray(inv(jnp.asarray(got)))
    np.testing.assert_allclose(back, f, rtol=1e-5, atol=1e-5)
