"""Overlapped distributed x-stage: both all-to-all transposes and the
full-length x DFT fused in ONE Pallas kernel, chunk-pipelined.

This is the "overlapped pencil transpose" layer BASELINE.json mandates on
top of the plain DMA all-to-all (pallas_transpose.py): the reference has
zero parallelism (serial FFTW3f plans, /root/reference/src/main.cpp:126-135),
so its distributed analogue is designed TPU-first rather than ported. The
distributed 2-D transform's x-stage is

    rows-shard (nx/P, hpad) --all_to_all--> cols-shard (nx, hpad/P)
    --1-D DFT along x--> --all_to_all--> rows-shard (nx/P, hpad)

and the three steps pipeline perfectly over column chunks: the DFT of
chunk q only needs chunk q's P receives, and its result can be scattered
back to the P row-owners while chunk q+1 is still in flight. The kernel
therefore issues ALL phase-1 chunk DMAs up front (every (peer, chunk)
pair on its own semaphore slot, so the ICI links stay saturated), then for
each chunk: wait that chunk's P receives -> four-step DFT matmuls on the
resident (nx, w) block (ops/pallas_fft.py machinery, natural frequency
order) -> start its P return DMAs immediately. Communication for chunk
q+1 overlaps compute for chunk q on both transposes; no barrier exists
anywhere between the two collectives.

Complex data moves as (2, rows, cols) float32 planes: complex64 is not a
Mosaic-native dtype and the plane layout keeps the compute loads
contiguous (no lane de-interleave).

The half axis is padded so every chunk has equal, hardware-legal width
(plan_chunks: fixed 128-lane chunks on TPU, exact n_chunks in interpret
mode); the pad columns are zeros (DFT of zeros is zeros) and are stripped
on return, never observed. Verified in Pallas interpret mode on the
virtual CPU mesh against the unfused dfft.py path
(tests/test_pallas_overlap.py) AND compiled+run on a real TPU chip (P=1
mesh) with a trajectory bit-identical to the XLA-collective path; real
multi-chip hardware is not available in this environment (BASELINE.md),
so cross-chip timing awaits a pod.

For the x-pencil spectral layout (parallel/xpencil.py — the state stays
column-sharded, so each transform needs only ONE transpose) the kernel
splits into its two halves: `xstage_gather` (phase-1 receives pipelined
with the DFT, output drained by local VMEM->HBM copies) and
`xstage_scatter` (local HBM->VMEM chunk fetches pipelined with the DFT
and the phase-2 scatter DMAs). Same chunk plan, same semaphore
protocol, half the collective traffic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_fft import _four_step, _ka_tables


def _xstage_kernel(n_shards: int, n_chunks: int, axis_name: str,
                   in_ref, far_ref, fai_ref, twr_ref, twi_ref,
                   fbr_ref, fbi_ref, out_ref, sc_in, sc_out,
                   send1, recv1, send2, recv2):
    """in (2, rows_l, hpad) HBM -> out (2, rows_l, hpad) HBM with the
    length-nx DFT applied along the distributed x axis.

    sc_in/sc_out: (2, nx, W) VMEM receive/send staging. On hardware the
    chunk width w is a fixed 128 lanes (see xstage): Mosaic requires
    128-aligned lane widths both for DMA slices of VMEM refs ("Slice
    shape along dimension 2 must be aligned to tiling (128)") and for
    the matmul lane flattening ("unsupported shape cast") — both
    verified on real hardware. Sem arrays are (P, Q) so every in-flight
    DMA system-wide has a distinct slot (the rotated-phase protocol of
    pallas_transpose.py, extended by a chunk index)."""
    p = n_shards
    q_n = n_chunks
    me = lax.axis_index(axis_name)
    _, rows_l, hpad = in_ref.shape
    w_big = hpad // p           # W: my column width after transpose
    w = w_big // q_n            # chunk width (data lanes per slot)
    nx = rows_l * p

    # phase 1: all (peer, chunk) sends start now. Target t owns columns
    # [t*W, (t+1)*W); my rows land in its row block `me`.
    ops1 = []
    for k in range(p):
        t = lax.rem(me + k, p)
        for q in range(q_n):
            ops1.append(pltpu.make_async_remote_copy(
                src_ref=in_ref.at[:, :, pl.ds(t * w_big + q * w, w)],
                dst_ref=sc_in.at[:, pl.ds(me * rows_l, rows_l),
                                 pl.ds(q * w, w)],
                send_sem=send1.at[k, q], recv_sem=recv1.at[k, q],
                device_id=t,
                device_id_type=pltpu.DeviceIdType.LOGICAL))
    for op in ops1:
        op.start()

    # pipeline: per chunk, gather-wait -> DFT -> scatter-start. While
    # chunk q computes, chunks q+1..Q-1 are still arriving and chunk
    # q-1's returns are still draining — both directions overlap compute.
    ops2 = []
    for q in range(q_n):
        for k in range(p):
            s = lax.rem(me - k + p, p)
            pltpu.make_async_remote_copy(
                src_ref=in_ref.at[:, :, pl.ds(0, w)],
                dst_ref=sc_in.at[:, pl.ds(s * rows_l, rows_l),
                                 pl.ds(q * w, w)],
                send_sem=send1.at[k, q], recv_sem=recv1.at[k, q],
                device_id=me,
                device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()
        xr = sc_in[0, :, pl.ds(q * w, w)]
        xi = sc_in[1, :, pl.ds(q * w, w)]
        yr, yi = _four_step(xr, xi, nx, w, far_ref[:], fai_ref[:],
                            twr_ref[:], twi_ref[:], fbr_ref[:],
                            fbi_ref[:])
        sc_out[0, :, pl.ds(q * w, w)] = yr
        sc_out[1, :, pl.ds(q * w, w)] = yi
        for k in range(p):
            t = lax.rem(me + k, p)
            op = pltpu.make_async_remote_copy(
                src_ref=sc_out.at[:, pl.ds(t * rows_l, rows_l),
                                  pl.ds(q * w, w)],
                dst_ref=out_ref.at[:, :, pl.ds(me * w_big + q * w, w)],
                send_sem=send2.at[k, q], recv_sem=recv2.at[k, q],
                device_id=t,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            op.start()
            ops2.append(op)

    for op in ops1:
        op.wait_send()
    for op in ops2:
        op.wait_send()
    for q in range(q_n):
        for k in range(p):
            s = lax.rem(me - k + p, p)
            pltpu.make_async_remote_copy(
                src_ref=sc_out.at[:, pl.ds(0, rows_l), pl.ds(0, w)],
                dst_ref=out_ref.at[:, :, pl.ds(s * w_big + q * w, w)],
                send_sem=send2.at[k, q], recv_sem=recv2.at[k, q],
                device_id=me,
                device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()


def _gather_kernel(n_shards: int, n_chunks: int, axis_name: str,
                   in_ref, far_ref, fai_ref, twr_ref, twi_ref,
                   fbr_ref, fbi_ref, out_ref, sc_in, sc_out,
                   send1, recv1, loc):
    """Forward HALF of _xstage_kernel for the x-pencil spectral layout
    (parallel/xpencil.py): in (2, rows_l, hpad) y-row shard -> out
    (2, nx, W) x-pencil with the length-nx DFT applied — the result
    STAYS column-sharded, so the return scatter of the full kernel
    disappears along with its all_to_all traffic. Chunk pipeline:
    all (peer, chunk) sends start up front; per chunk wait -> DFT ->
    local VMEM->HBM drain overlapping the next chunk's receives."""
    p = n_shards
    q_n = n_chunks
    me = lax.axis_index(axis_name)
    _, rows_l, hpad = in_ref.shape
    w_big = hpad // p
    w = w_big // q_n
    nx = rows_l * p

    ops1 = []
    for k in range(p):
        t = lax.rem(me + k, p)
        for q in range(q_n):
            ops1.append(pltpu.make_async_remote_copy(
                src_ref=in_ref.at[:, :, pl.ds(t * w_big + q * w, w)],
                dst_ref=sc_in.at[:, pl.ds(me * rows_l, rows_l),
                                 pl.ds(q * w, w)],
                send_sem=send1.at[k, q], recv_sem=recv1.at[k, q],
                device_id=t,
                device_id_type=pltpu.DeviceIdType.LOGICAL))
    for op in ops1:
        op.start()

    ops_out = []
    for q in range(q_n):
        for k in range(p):
            s = lax.rem(me - k + p, p)
            pltpu.make_async_remote_copy(
                src_ref=in_ref.at[:, :, pl.ds(0, w)],
                dst_ref=sc_in.at[:, pl.ds(s * rows_l, rows_l),
                                 pl.ds(q * w, w)],
                send_sem=send1.at[k, q], recv_sem=recv1.at[k, q],
                device_id=me,
                device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()
        xr = sc_in[0, :, pl.ds(q * w, w)]
        xi = sc_in[1, :, pl.ds(q * w, w)]
        yr, yi = _four_step(xr, xi, nx, w, far_ref[:], fai_ref[:],
                            twr_ref[:], twi_ref[:], fbr_ref[:],
                            fbi_ref[:])
        sc_out[0, :, pl.ds(q * w, w)] = yr
        sc_out[1, :, pl.ds(q * w, w)] = yi
        op = pltpu.make_async_copy(
            sc_out.at[:, :, pl.ds(q * w, w)],
            out_ref.at[:, :, pl.ds(q * w, w)],
            loc.at[q])
        op.start()
        ops_out.append(op)

    for op in ops1:
        op.wait_send()
    for op in ops_out:
        op.wait()


def _scatter_kernel(n_shards: int, n_chunks: int, axis_name: str,
                    in_ref, far_ref, fai_ref, twr_ref, twi_ref,
                    fbr_ref, fbi_ref, out_ref, sc_in, sc_out,
                    send2, recv2, loc):
    """Inverse HALF of _xstage_kernel for the x-pencil layout: in
    (2, nx, W) x-pencil -> out (2, rows_l, hpad) y-row shard with the
    length-nx (inverse-scaled) DFT applied. All chunk HBM->VMEM input
    fetches start up front; per chunk wait -> DFT -> P remote scatter
    DMAs, so communication for chunk q overlaps compute for q+1."""
    p = n_shards
    q_n = n_chunks
    me = lax.axis_index(axis_name)
    _, nx, w_big = in_ref.shape
    w = w_big // q_n
    rows_l = nx // p

    ops_in = []
    for q in range(q_n):
        op = pltpu.make_async_copy(
            in_ref.at[:, :, pl.ds(q * w, w)],
            sc_in.at[:, :, pl.ds(q * w, w)],
            loc.at[q])
        op.start()
        ops_in.append(op)

    ops2 = []
    for q in range(q_n):
        ops_in[q].wait()
        xr = sc_in[0, :, pl.ds(q * w, w)]
        xi = sc_in[1, :, pl.ds(q * w, w)]
        yr, yi = _four_step(xr, xi, nx, w, far_ref[:], fai_ref[:],
                            twr_ref[:], twi_ref[:], fbr_ref[:],
                            fbi_ref[:])
        sc_out[0, :, pl.ds(q * w, w)] = yr
        sc_out[1, :, pl.ds(q * w, w)] = yi
        for k in range(p):
            t = lax.rem(me + k, p)
            op = pltpu.make_async_remote_copy(
                src_ref=sc_out.at[:, pl.ds(t * rows_l, rows_l),
                                  pl.ds(q * w, w)],
                dst_ref=out_ref.at[:, :, pl.ds(me * w_big + q * w, w)],
                send_sem=send2.at[k, q], recv_sem=recv2.at[k, q],
                device_id=t,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            op.start()
            ops2.append(op)

    for op in ops2:
        op.wait_send()
    for q in range(q_n):
        for k in range(p):
            s = lax.rem(me - k + p, p)
            pltpu.make_async_remote_copy(
                src_ref=sc_out.at[:, pl.ds(0, rows_l), pl.ds(0, w)],
                dst_ref=out_ref.at[:, :, pl.ds(s * w_big + q * w, w)],
                send_sem=send2.at[k, q], recv_sem=recv2.at[k, q],
                device_id=me,
                device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()


def plan_chunks(hny: int, n_shards: int, n_chunks: int,
                lane_plan: bool):
    """(hpad, chunk_count) for the x-stage pipeline.

    lane_plan=True (the hardware plan): fixed 128-lane chunks — Mosaic
    requires 128-aligned lane widths both for DMA slices of VMEM refs
    and for matmul lane flattening (verified on hardware; kernel
    docstring), so the half axis pads to a multiple of P*128 and
    n_chunks is ignored. Pad cost at P=8, hny=2049: hpad=3072, 1.5x
    x-stage traffic, partially hidden by the overlap. lane_plan=False
    honors n_chunks exactly (fine-grained pipeline-logic testing at
    tiny sizes; interpret mode only)."""
    if not lane_plan:
        gran = n_shards * n_chunks
        return -(-hny // gran) * gran, n_chunks
    lane = 128
    hpad = -(-hny // (n_shards * lane)) * (n_shards * lane)
    return hpad, hpad // (n_shards * lane)


def xstage(spec_rows: jax.Array, axis_name: str, n_shards: int,
           forward: bool, n_chunks: int = 4, interpret: bool = False,
           scale: float = 1.0, lane_plan: Optional[bool] = None
           ) -> jax.Array:
    """shard_map-local fused transpose+DFT+transpose along x.

    spec_rows: local (nx/P, hny) complex64 -> local (nx/P, hny) complex64
    with the length-nx DFT (sign per `forward`, output scaled by `scale`)
    applied along the global x axis. Equivalent to
    dfft.transpose_to_rows(fft(dfft.transpose_to_columns(.), axis=0)).
    """
    rows_l, hny = spec_rows.shape
    nx = rows_l * n_shards
    if lane_plan is None:      # hardware plan on hardware; override for
        lane_plan = not interpret   # interpret tests of the exact
    #                               hardware chunk geometry
    hpad, q_n = plan_chunks(hny, n_shards, n_chunks, lane_plan)
    if hpad != hny:
        spec_rows = jnp.pad(spec_rows, ((0, 0), (0, hpad - hny)))
    planes = jnp.stack([jnp.real(spec_rows), jnp.imag(spec_rows)])
    tables = [jnp.asarray(t) for t in _ka_tables(nx, forward, scale)]
    w_big = hpad // n_shards
    sems = pltpu.SemaphoreType.DMA((n_shards, q_n))
    out = pl.pallas_call(
        functools.partial(_xstage_kernel, n_shards, q_n, axis_name),
        out_shape=jax.ShapeDtypeStruct((2, rows_l, hpad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, nx, w_big), jnp.float32),
                        pltpu.VMEM((2, nx, w_big), jnp.float32),
                        sems, sems, sems, sems],
        # collective_id only with real communication: Mosaic rejects it
        # on a 1-device mesh ("collective_id has to be unspecified ...
        # when not using a custom barrier", verified on hardware)
        compiler_params=(pltpu.CompilerParams(collective_id=0)
                         if n_shards > 1 else pltpu.CompilerParams()),
        interpret=interpret,
    )(planes, *tables)
    return lax.complex(out[0], out[1])[:, :hny]


def _half_call(kernel, n_shards: int, q_n: int, axis_name: str,
               planes: jax.Array, tables, out_shape, w_big: int,
               nx: int, interpret: bool) -> jax.Array:
    sems = pltpu.SemaphoreType.DMA((n_shards, q_n))
    out = pl.pallas_call(
        functools.partial(kernel, n_shards, q_n, axis_name),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, nx, w_big), jnp.float32),
                        pltpu.VMEM((2, nx, w_big), jnp.float32),
                        sems, sems,
                        pltpu.SemaphoreType.DMA((q_n,))],
        compiler_params=(pltpu.CompilerParams(collective_id=0)
                         if n_shards > 1 else pltpu.CompilerParams()),
        interpret=interpret,
    )(planes, *tables)
    return lax.complex(out[0], out[1])


def xstage_gather(spec_rows: jax.Array, axis_name: str, n_shards: int,
                  forward: bool = True, n_chunks: int = 4,
                  interpret: bool = False, scale: float = 1.0,
                  lane_plan: Optional[bool] = None) -> jax.Array:
    """shard_map-local fused transpose+DFT (gather half of `xstage`).

    spec_rows: local (nx/P, hny) complex64 y-row shard -> local
    (nx, hpad/P) complex64 x-pencil with the length-nx DFT applied.
    Equivalent to fft(dfft.transpose_to_columns(.), axis=0) — the
    output stays COLUMN-sharded (parallel/xpencil.py layout), so only
    one transpose's traffic moves per transform."""
    rows_l, hny = spec_rows.shape
    nx = rows_l * n_shards
    if lane_plan is None:
        lane_plan = not interpret
    hpad, q_n = plan_chunks(hny, n_shards, n_chunks, lane_plan)
    if hpad != hny:
        spec_rows = jnp.pad(spec_rows, ((0, 0), (0, hpad - hny)))
    planes = jnp.stack([jnp.real(spec_rows), jnp.imag(spec_rows)])
    tables = [jnp.asarray(t) for t in _ka_tables(nx, forward, scale)]
    w_big = hpad // n_shards
    return _half_call(_gather_kernel, n_shards, q_n, axis_name, planes,
                      tables, (2, nx, w_big), w_big, nx, interpret)


def xstage_scatter(spec_cols: jax.Array, axis_name: str, n_shards: int,
                   hny: int, forward: bool = False,
                   n_chunks: int = 4, interpret: bool = False,
                   scale: float = 1.0,
                   lane_plan: Optional[bool] = None) -> jax.Array:
    """shard_map-local fused DFT+transpose (scatter half of `xstage`).

    spec_cols: local (nx, hpad/P) complex64 x-pencil -> local
    (nx/P, hny) complex64 y-row shard (pad stripped) with the
    length-nx DFT applied. Equivalent to
    dfft.transpose_to_rows(fft(., axis=0))."""
    nx, w_big = spec_cols.shape
    if lane_plan is None:
        lane_plan = not interpret
    hpad, q_n = plan_chunks(hny, n_shards, n_chunks, lane_plan)
    if w_big * n_shards != hpad:
        raise ValueError(
            f"x-pencil width {w_big} inconsistent with chunk plan "
            f"hpad={hpad} over {n_shards} shards")
    planes = jnp.stack([jnp.real(spec_cols), jnp.imag(spec_cols)])
    tables = [jnp.asarray(t) for t in _ka_tables(nx, forward, scale)]
    rows_l = nx // n_shards
    out = _half_call(_scatter_kernel, n_shards, q_n, axis_name, planes,
                     tables, (2, rows_l, hpad), w_big, nx, interpret)
    return out[:, :hny]


def rfft2_local(field: jax.Array, axis_name: str, n_shards: int,
                n_chunks: int = 4, interpret: bool = False) -> jax.Array:
    """Distributed rfft2 with the overlapped x-stage; same contract as
    dfft.rfft2_local (unnormalized, SURVEY.md §5.2)."""
    spec = jnp.fft.rfft(field, axis=1)
    return xstage(spec, axis_name, n_shards, forward=True,
                  n_chunks=n_chunks, interpret=interpret)


def irfft2_local(spec: jax.Array, grid_shape: Optional[Tuple[int, int]],
                 axis_name: str, n_shards: int, n_chunks: int = 4,
                 interpret: bool = False) -> jax.Array:
    """Distributed irfft2 with the overlapped x-stage; same contract as
    dfft.irfft2_local (scaled by 1/(nx*ny))."""
    rows_l, hny = spec.shape
    nx = rows_l * n_shards
    ny = (grid_shape[1] if grid_shape is not None else 2 * (hny - 1))
    rows = xstage(spec, axis_name, n_shards, forward=False,
                  n_chunks=n_chunks, interpret=interpret, scale=1.0 / nx)
    return jnp.fft.irfft(rows, n=ny, axis=1)


def make_fft_pair(axis_name: str, n_shards: int, n_chunks: int = 4,
                  interpret: bool = False):
    """(forward, inverse) with the ops/fft.py signatures — the overlapped
    drop-in for dfft.make_fft_pair."""
    fwd = functools.partial(rfft2_local, axis_name=axis_name,
                            n_shards=n_shards, n_chunks=n_chunks,
                            interpret=interpret)

    def inv(spec, grid_shape=None):
        return irfft2_local(spec, grid_shape, axis_name, n_shards,
                            n_chunks=n_chunks, interpret=interpret)

    return fwd, inv
