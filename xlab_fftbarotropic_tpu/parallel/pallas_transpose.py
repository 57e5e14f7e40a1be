"""Hand-rolled Pallas TPU all-to-all transpose for the distributed FFT.

EXPERIMENTAL, flag-gated (make_fft_pair(..., use_pallas=True)); the default
distributed path uses XLA's all_to_all (dfft.py). This module implements
the same tiled transpose as explicit inter-chip DMAs
(pltpu.make_async_remote_copy): every device starts its P chunk-sends
concurrently — saturating both ICI directions instead of a software ring —
then waits per-peer receive semaphores. It is the foundation for the
overlapped pencil transpose (chunked x-FFT interleaved with in-flight
DMAs), which lands on top of this kernel.

Complex data is moved as a float32 view (complex64 is not a Mosaic-native
dtype; DMAs are dtype-agnostic byte moves, and the (re, im) pairs stay
adjacent because every chunk width is even in float32 lanes).

Semaphore protocol: rotated-target phases. In phase k every device sends
its chunk for target (me+k)%P and receives from source (me-k)%P; both
semaphore arrays are indexed by PHASE, so every in-flight DMA system-wide
uses a distinct (send, recv) slot pair and all P phases can be in flight
concurrently. Receives are waited with size-matched wait-descriptors
(wait_recv on the phase slot), sends with wait_send.

Verified in Pallas interpret mode on a virtual CPU mesh against
jax.lax.all_to_all (tests/test_pallas_transpose.py); on real hardware the
same kernel lowers to Mosaic with LOGICAL device ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _a2a_cols_kernel(n_shards: int, axis_name: str,
                     in_ref, out_ref, send_sems, recv_sems):
    """rows-shard -> cols-shard: in (rows_l, W) -> out (rows_l*P, W/P).

    Column chunk t of my input goes to device t, landing at my row block.
    """
    me = lax.axis_index(axis_name)
    rows_l = in_ref.shape[0]
    chunk = in_ref.shape[1] // n_shards

    ops = []
    for k in range(n_shards):
        target = lax.rem(me + k, n_shards)
        ops.append(pltpu.make_async_remote_copy(
            src_ref=in_ref.at[:, pl.ds(target * chunk, chunk)],
            dst_ref=out_ref.at[pl.ds(me * rows_l, rows_l), :],
            send_sem=send_sems.at[k],
            recv_sem=recv_sems.at[k],
            device_id=target,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ))
    for op in ops:
        op.start()
    for op in ops:
        op.wait_send()
    for k in range(n_shards):
        # phase-k receive: source (me-k) wrote my row block `source`;
        # wait the phase slot with a size-matched descriptor
        source = lax.rem(me - k + n_shards, n_shards)
        pltpu.make_async_remote_copy(
            src_ref=in_ref.at[:, pl.ds(0, chunk)],
            dst_ref=out_ref.at[pl.ds(source * rows_l, rows_l), :],
            send_sem=send_sems.at[k],
            recv_sem=recv_sems.at[k],
            device_id=me,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_recv()


def _a2a_rows_kernel(n_shards: int, axis_name: str,
                     in_ref, out_ref, send_sems, recv_sems):
    """cols-shard -> rows-shard: in (R, w_l) -> out (R/P, w_l*P).

    Row block t of my input goes to device t, landing at my column block.
    """
    me = lax.axis_index(axis_name)
    rows_l = in_ref.shape[0] // n_shards
    w_l = in_ref.shape[1]

    ops = []
    for k in range(n_shards):
        target = lax.rem(me + k, n_shards)
        ops.append(pltpu.make_async_remote_copy(
            src_ref=in_ref.at[pl.ds(target * rows_l, rows_l), :],
            dst_ref=out_ref.at[:, pl.ds(me * w_l, w_l)],
            send_sem=send_sems.at[k],
            recv_sem=recv_sems.at[k],
            device_id=target,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ))
    for op in ops:
        op.start()
    for op in ops:
        op.wait_send()
    for k in range(n_shards):
        source = lax.rem(me - k + n_shards, n_shards)
        pltpu.make_async_remote_copy(
            src_ref=in_ref.at[pl.ds(0, rows_l), :],
            dst_ref=out_ref.at[:, pl.ds(source * w_l, w_l)],
            send_sem=send_sems.at[k],
            recv_sem=recv_sems.at[k],
            device_id=me,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_recv()


def _call(kernel, out_shape, n_shards, axis_name, x, interpret):
    return pl.pallas_call(
        functools.partial(kernel, n_shards, axis_name),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_shards,)),
                        pltpu.SemaphoreType.DMA((n_shards,))],
        # Mosaic rejects collective_id without real communication
        # (1-device mesh) — verified on hardware via pallas_overlap
        compiler_params=(pltpu.CompilerParams(collective_id=0)
                         if n_shards > 1 else pltpu.CompilerParams()),
        interpret=interpret,
    )(x)


def _c2f(x):
    """complex64 (r, c) -> float32 (r, 2c), (re, im) pairs adjacent."""
    f = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)  # (r, c, 2)
    return f.reshape(x.shape[0], x.shape[1] * 2)


def _f2c(x):
    """float32 (r, 2c) -> complex64 (r, c)."""
    f = x.reshape(x.shape[0], x.shape[1] // 2, 2)
    return lax.complex(f[..., 0], f[..., 1])


def transpose_to_columns(spec_rows: jax.Array, axis_name: str,
                         n_shards: int, interpret: bool = False) -> jax.Array:
    """Pallas analogue of dfft.transpose_to_columns (same contract:
    (nx/P, hny) complex -> (nx, hpad/P) complex, zero-padded half axis)."""
    hny = spec_rows.shape[1]
    hpad = -(-hny // n_shards) * n_shards
    if hpad != hny:
        spec_rows = jnp.pad(spec_rows, ((0, 0), (0, hpad - hny)))
    f = _c2f(spec_rows)                                 # (rows_l, 2*hpad)
    out = _call(_a2a_cols_kernel,
                (f.shape[0] * n_shards, f.shape[1] // n_shards),
                n_shards, axis_name, f, interpret)
    return _f2c(out)


def transpose_to_rows(spec_cols: jax.Array, axis_name: str, n_shards: int,
                      hny: int, interpret: bool = False) -> jax.Array:
    """Pallas analogue of dfft.transpose_to_rows: (nx, hpad/P) ->
    (nx/P, hny), pad stripped."""
    f = _c2f(spec_cols)                                 # (nx, 2*hpad/P)
    out = _call(_a2a_rows_kernel,
                (f.shape[0] // n_shards, f.shape[1] * n_shards),
                n_shards, axis_name, f, interpret)
    return _f2c(out)[:, :hny]
