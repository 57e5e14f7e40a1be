"""Multi-host bootstrap (SURVEY.md §6 "failure detection / elastic
recovery" row: multi-host init via jax.distributed).

The reference is a single process (SURVEY.md §2); multi-host execution is
a new capability. The model path needs nothing special — `make_mesh` /
`make_mesh2d` over `jax.devices()` already sees the GLOBAL device set once
the distributed runtime is up — so all this module does is make that
bring-up explicit, env-driven, and idempotent, and give restarts a clean
re-entry (the checkpoint/resume path in io/checkpoint.py is per-run state;
process topology comes from here).

Environment contract (a subset of the common cluster launchers'):
  XFB_COORDINATOR   host:port of process 0 (also accepts
                    JAX_COORDINATOR_ADDRESS)
  XFB_NUM_PROCESSES total process count   (also JAX_NUM_PROCESSES)
  XFB_PROCESS_ID    this process's rank   (also JAX_PROCESS_ID)
On TPU pods with the standard metadata environment, plain
`jax.distributed.initialize()` auto-discovers everything; set only
XFB_MULTIHOST=1 to request that path.
"""

from __future__ import annotations

import functools as _functools
import os
from typing import Optional


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed if configured; return True when running
    multi-process after the call.

    Priority: explicit args > XFB_*/JAX_* env > TPU-pod auto-discovery
    (XFB_MULTIHOST=1). With none of these present this is a no-op
    returning False — single-process runs never pay for it. Idempotent:
    a second call on an initialized runtime is a no-op."""
    import jax

    # Idempotency must be checked WITHOUT touching the XLA backend:
    # jax.process_count() initializes the backend, after which
    # jax.distributed.initialize() refuses to run ("must be called before
    # any JAX calls") — caught by tests/test_multihost.py's real
    # two-process smoke.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1

    env = os.environ
    coordinator = (coordinator or env.get("XFB_COORDINATOR")
                   or env.get("JAX_COORDINATOR_ADDRESS"))
    nproc = num_processes if num_processes is not None else int(
        env.get("XFB_NUM_PROCESSES", env.get("JAX_NUM_PROCESSES", 0)) or 0)
    pid = process_id if process_id is not None else (
        int(env["XFB_PROCESS_ID"]) if "XFB_PROCESS_ID" in env
        else int(env["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in env
        else None)

    if coordinator and nproc:
        if pid is None:
            raise RuntimeError(
                "multihost: XFB_COORDINATOR/XFB_NUM_PROCESSES are set but "
                "the process rank is missing — set XFB_PROCESS_ID (or "
                "JAX_PROCESS_ID) to this process's rank in [0, "
                f"{nproc}). Outside TPU-metadata environments the rank "
                "cannot be auto-discovered.")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=nproc,
                                   process_id=pid)
        return jax.process_count() > 1
    if env.get("XFB_MULTIHOST"):
        jax.distributed.initialize()  # pod metadata auto-discovery
        return jax.process_count() > 1
    return False


def is_primary() -> bool:
    """True on the process that should own host-side I/O (manifest,
    checkpoints, record files) — rank 0, or any single-process run."""
    import jax

    return jax.process_index() == 0


def gather_to_host(x):
    """Materialize an array on this host as numpy, even when it is a
    global sharded array whose shards live on other processes.

    Single-process (and any fully-addressable array): plain np.asarray,
    zero overhead. Multi-process: an allgather collective — EVERY process
    must call this on the same array in the same order, so callers
    (runner adapters) invoke it unconditionally and gate only the file
    writes on is_primary().

    Large buffers are fetched in row-block chunks (_chunked_fetch): some
    remote-device transports (the axon TPU tunnel in this environment)
    reject single device→host transfers above a size limit with
    UNIMPLEMENTED, which would otherwise make record/checkpoint fetches
    impossible at ≥2048² grids (one 4096² float32 field is 67 MB). The
    chunk size rides XFB_FETCH_CHUNK_MB (0 disables chunking). Scope:
    chunking applies to the fully-addressable (single-process) path; the
    multi-process process_allgather branch transfers whole buffers — the
    tunnel quirk it guards against has only been observed (and is only
    mitigated) single-process."""
    import numpy as np

    if isinstance(x, np.ndarray):
        return x
    if getattr(x, "is_fully_addressable", True):
        if np.issubdtype(np.dtype(getattr(x, "dtype", np.float32)),
                         np.complexfloating):
            # complex64 device->host transfers are UNIMPLEMENTED over
            # the axon tunnel even chunked (measured 2026-08-20 on the
            # 4096^2 SW checkpoint pack); fetch re/im float planes and
            # recombine on host — identical result on every backend
            import jax
            import jax.numpy as jnp
            re = _chunked_fetch(jax.jit(jnp.real)(x))
            im = _chunked_fetch(jax.jit(jnp.imag)(x))
            return (re + 1j * im).astype(np.dtype(x.dtype))
        return _chunked_fetch(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def device_put_spectral(a):
    """jnp.asarray for possibly-complex HOST arrays, spelled as float32
    re/im uploads + an on-device combine: complex64 host->device
    transfers are UNIMPLEMENTED over remote-device transports like the
    axon tunnel (measured 2026-08-20), and the float spelling is
    equivalent everywhere. Checkpoint resume paths route through this."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    a = np.asarray(a)
    if not np.iscomplexobj(a):
        return jnp.asarray(a)
    return jax.jit(jax.lax.complex)(
        jnp.asarray(np.ascontiguousarray(a.real)),
        jnp.asarray(np.ascontiguousarray(a.imag)))


def _fetch_chunk_bytes() -> int:
    # read per call so tests / probe scripts can flip it at runtime
    mb = float(os.environ.get("XFB_FETCH_CHUNK_MB", "8"))
    return int(mb * 1024 * 1024)


def _chunked_fetch(x):
    """np.asarray(x), transferring at most XFB_FETCH_CHUNK_MB per hop.

    Chunks are equal-size dynamic slices along axis 0 taken by ONE jitted
    program (the start index is a traced argument), so an N-chunk fetch
    compiles once per (shape, chunk-rows) signature instead of per chunk;
    the final chunk is aligned to the end of the axis (overlapping rows
    are fetched twice rather than compiling a second ragged-slice
    program). Semantically identical to np.asarray for every input."""
    import numpy as np

    limit = _fetch_chunk_bytes()
    nbytes = getattr(x, "nbytes", 0)
    if limit <= 0 or nbytes <= limit or getattr(x, "ndim", 0) < 1:
        return np.asarray(x)

    n0 = x.shape[0]
    # Axis-0 row blocks only keep transfers under the limit when a row
    # itself fits; batched record fields like (M, 4096, 4096) have 67 MB
    # "rows" and a singleton leading axis bypassed chunking entirely —
    # exactly the oversized transfer this path exists to avoid (round-3
    # ADVICE). Chunk a flattened 1-D view instead: the device reshape is
    # free (row-major contiguous both sides) and the flat fetch re-enters
    # the row-block path with itemsize-granular chunks.
    per_row = nbytes // max(1, n0)
    if getattr(x, "ndim", 0) >= 2 and (n0 <= 1 or per_row > limit):
        import jax.numpy as jnp

        flat = _chunked_fetch(jnp.reshape(x, (-1,)))
        return flat.reshape(x.shape)
    if n0 <= 1:
        return np.asarray(x)

    rows = max(1, min(n0, limit // max(1, per_row)))
    if rows >= n0:
        return np.asarray(x)
    fetch = _chunk_slicer(rows)
    out = np.empty(x.shape, np.dtype(x.dtype))
    i = 0
    while i < n0:
        j = min(i, n0 - rows)          # align the last chunk to the end
        out[j:j + rows] = np.asarray(fetch(x, j))
        i = j + rows
    return out


@_functools.lru_cache(maxsize=None)
def _chunk_slicer(rows: int):
    import jax

    return jax.jit(
        lambda a, i: jax.lax.dynamic_slice_in_dim(a, i, rows, axis=0))
