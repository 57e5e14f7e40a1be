"""x-pencil spectral layout for the 1-D slab decomposition — HALF the
all_to_all traffic of the row-sharded slab path.

The slab path (parallel/dfft.py) keeps BOTH physical and spectral arrays
row-sharded, so every transform pays two all_to_all transposes: rows ->
columns for the x-stage FFT, then columns -> rows to restore the layout.
But nothing in the model needs the spectrum row-sharded — every spectral
operator is pointwise (ops/spectral.py) and runs identically on
column-sliced coefficient tables (exactly how the 2-D pencil path
already stores its state, parallel/pencil.py). Keeping the spectral
state AS x-pencils therefore deletes the return transpose:

    forward:  rows (nx/P, ny) --rfft(y)--> (nx/P, hpad)
              --all_to_all--> (nx, hpad/P) --fft(x)--> x-pencil state
    inverse:  x-pencil --ifft(x)--> --all_to_all--> (nx/P, hpad)
              --strip pad; irfft(y)--> rows (nx/P, ny)

One transpose per transform instead of two — the distributed step's
collective volume halves outright (the reference being superseded has no
parallelism at all: serial FFTW plans, /root/reference/src/main.cpp:126-135).
Physical-space fields stay row-sharded, so the advection products, the
forcing ingest, and field I/O are unchanged from the slab path.

Relation to the 2-D pencil path (parallel/pencil.py): the x-pencil
SPECTRAL layout is the same; this module runs it on a 1-D mesh where
remote-DMA kernels are usable. Under a 2-axis shard_map, Pallas
dma_start currently supports neither LOGICAL nor MESH device ids in
interpret mode (jax mosaic primitives dma_start_partial_discharge_rule
raises NotImplementedError for >1 named mesh dimension — probed
2026-08-18), so the 2-D pencil keeps XLA collectives and the
overlapped-kernel story lives here on the flattened axis.

Three transform implementations, mirroring the slab fft_impl choices:
  'xla'     — jax.lax.all_to_all transpose (dfft.py machinery)
  'pallas'  — explicit DMA all-to-all (pallas_transpose.py kernels)
  'overlap' — the gather/scatter HALVES of the fused transpose+DFT
              kernel (pallas_overlap.xstage_gather/xstage_scatter):
              the single remaining transpose is chunk-pipelined with
              the x DFT, and the full kernel's return scatter is gone.

The half axis pads to `hpad_for(...)` — a multiple of P for xla/pallas,
or the overlap chunk plan's width (multiple of P*128 on hardware) — and
the coefficient tables pad alongside (pencil.pad_tables), so the pad
columns carry exact zeros forever: the dealias mask is zero there, hence
every tendency vanishes on the pad.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jax.sharding import PartitionSpec as P

from ..ops.spectral import SpectralTables
from . import dfft, pencil


def hpad_for(hny: int, n_shards: int, fft_impl: str,
             interpret: bool, n_chunks: int = 4) -> int:
    """Padded half-axis width of the x-pencil STATE for an impl. The
    overlap kernels chunk in fixed 128-lane slices on hardware
    (pallas_overlap.plan_chunks), so their pad is coarser."""
    if fft_impl == "overlap":
        from . import pallas_overlap
        hpad, _ = pallas_overlap.plan_chunks(hny, n_shards, n_chunks,
                                             lane_plan=not interpret)
        return hpad
    return pencil.padded_half(hny, n_shards)


def table_specs(axis) -> SpectralTables:
    """Column-sharded table specs: full kx (the state holds all nx
    rows), half-axis-sharded ky and 2-D tables."""
    return SpectralTables(kx=P(), ky=P(axis),
                          lap=P(None, axis), inv_lap=P(None, axis),
                          mask=P(None, axis), rlap=P(None, axis))


def state_spec(axis):
    """Spectral x-pencil sharding (nx, hpad/P)."""
    return P(None, axis)


def phys_spec(axis):
    """Physical row sharding (nx/P, ny) — unchanged from the slab."""
    return P(axis, None)


def rfft2_local(field: jax.Array, axis_name: str, n_shards: int,
                fft_impl: str, n_chunks: int,
                interpret: bool) -> jax.Array:
    """shard_map-local x-pencil rfft2: row shard (nx/P, ny) float32 ->
    x-pencil (nx, hpad/P) complex64, unnormalized (SURVEY.md §5.2)."""
    spec = jnp.fft.rfft(field, axis=1)
    if fft_impl == "overlap":
        from . import pallas_overlap
        return pallas_overlap.xstage_gather(
            spec, axis_name, n_shards, forward=True, n_chunks=n_chunks,
            interpret=interpret)
    if fft_impl == "pallas":
        from . import pallas_transpose as pt
        cols = pt.transpose_to_columns(spec, axis_name, n_shards,
                                       interpret=interpret)
    else:
        cols = dfft.transpose_to_columns(spec, axis_name, n_shards)
    return jnp.fft.fft(cols, axis=0)


def irfft2_local(spec_cols: jax.Array,
                 grid_shape: Optional[Tuple[int, int]], axis_name: str,
                 n_shards: int, hny: int, fft_impl: str, n_chunks: int,
                 interpret: bool) -> jax.Array:
    """shard_map-local x-pencil irfft2: (nx, hpad/P) complex64 ->
    row shard (nx/P, ny) float32, scaled 1/(nx*ny)."""
    nx = spec_cols.shape[0]
    ny = (grid_shape[1] if grid_shape is not None else 2 * (hny - 1))
    if fft_impl == "overlap":
        from . import pallas_overlap
        rows = pallas_overlap.xstage_scatter(
            spec_cols, axis_name, n_shards, hny=hny, forward=False,
            n_chunks=n_chunks, interpret=interpret, scale=1.0 / nx)
    elif fft_impl == "pallas":
        from . import pallas_transpose as pt
        cols = jnp.fft.ifft(spec_cols, axis=0)      # normalizes 1/nx
        rows = pt.transpose_to_rows(cols, axis_name, n_shards, hny=hny,
                                    interpret=interpret)
    else:
        cols = jnp.fft.ifft(spec_cols, axis=0)
        rows = dfft.transpose_to_rows(cols, axis_name, n_shards, hny=hny)
    return jnp.fft.irfft(rows, n=ny, axis=1)        # normalizes 1/ny


def make_fft_pair(axis_name: str, n_shards: int, hny: int,
                  fft_impl: str = "xla", n_chunks: int = 4,
                  interpret: bool = False):
    """(forward, inverse) shard_map-local callables with the ops/fft.py
    signatures for the x-pencil layout."""
    fwd = functools.partial(rfft2_local, axis_name=axis_name,
                            n_shards=n_shards, fft_impl=fft_impl,
                            n_chunks=n_chunks, interpret=interpret)

    def inv(spec, grid_shape=None):
        return irfft2_local(spec, grid_shape, axis_name, n_shards,
                            hny=hny, fft_impl=fft_impl,
                            n_chunks=n_chunks, interpret=interpret)

    return fwd, inv
