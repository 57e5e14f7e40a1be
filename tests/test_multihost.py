"""Multi-host bootstrap tests (parallel/multihost.py).

The env-contract validation runs in-process; the real two-process
jax.distributed bring-up (VERDICT r1 item 9) spawns two CPU subprocesses
against a localhost coordinator and checks process_count, the primary-rank
convention, and gather_to_host on a truly non-fully-addressable global
array — the collective the runner's record/checkpoint gathers rely on.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

from xlab_fftbarotropic_tpu.parallel import multihost

REPO = Path(__file__).resolve().parents[1]


def test_initialize_noop_without_config(monkeypatch):
    for var in ("XFB_COORDINATOR", "XFB_NUM_PROCESSES", "XFB_PROCESS_ID",
                "XFB_MULTIHOST", "JAX_COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False


def test_missing_rank_raises_named_error(monkeypatch):
    """ADVICE r1: coordinator+num_processes without a rank must name
    XFB_PROCESS_ID instead of failing opaquely inside jax.distributed."""
    monkeypatch.setenv("XFB_COORDINATOR", "127.0.0.1:1")
    monkeypatch.setenv("XFB_NUM_PROCESSES", "2")
    monkeypatch.delenv("XFB_PROCESS_ID", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="XFB_PROCESS_ID"):
        multihost.initialize()


_WORKER = textwrap.dedent("""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)   # one device per process
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from xlab_fftbarotropic_tpu.parallel import multihost

    assert multihost.initialize() is True
    assert jax.process_count() == 2, jax.process_count()
    rank = jax.process_index()
    assert multihost.is_primary() == (rank == 0)

    # gather a global array whose shards live on both processes
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = jax.devices()
    assert len(devs) == 2, devs
    mesh = Mesh(np.array(devs), ("x",))
    data = np.arange(8, dtype=np.float32)
    arr = jax.make_array_from_callback(
        (8,), NamedSharding(mesh, P("x")), lambda idx: data[idx])
    assert not arr.is_fully_addressable
    out = multihost.gather_to_host(arr)
    assert np.array_equal(out, data), out
    print(f"RANK{rank}_OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    """Spawn 2 CPU processes through the XFB env contract; both must see
    process_count()==2, rank-0-only is_primary, and a working
    gather_to_host collective."""
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(XFB_COORDINATOR=f"127.0.0.1:{port}",
                   XFB_NUM_PROCESSES="2", XFB_PROCESS_ID=str(rank),
                   JAX_PLATFORMS="cpu",
                   PYTHONPATH=str(REPO) + os.pathsep
                   + env.get("PYTHONPATH", ""))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=120)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert f"RANK{rank}_OK" in out


def test_complex_transfer_helpers_roundtrip():
    """gather_to_host fetches COMPLEX arrays as re/im float planes and
    device_put_spectral uploads them the same way (complex64 transfers
    are UNIMPLEMENTED over remote-device transports like the axon
    tunnel, BASELINE.md r5) — the float spelling must be an exact
    roundtrip on every backend, and real arrays must pass through
    untouched."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(7)
    z = (rng.standard_normal((16, 9)) +
         1j * rng.standard_normal((16, 9))).astype(np.complex64)

    dev = multihost.device_put_spectral(z)
    assert dev.dtype == jnp.complex64
    back = multihost.gather_to_host(dev)
    assert back.dtype == np.complex64
    assert np.array_equal(back, z)

    r = rng.standard_normal((8, 8)).astype(np.float32)
    dev_r = multihost.device_put_spectral(r)
    assert dev_r.dtype == jnp.float32
    assert np.array_equal(multihost.gather_to_host(dev_r), r)
