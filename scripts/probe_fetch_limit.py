"""Probe the axon tunnel's device→host transfer limit + throughput.

The tunnel rejects large single fetches with UNIMPLEMENTED (CLAUDE.md);
records/checkpoints at ≥2048² need the chunked fetch in
parallel/multihost.gather_to_host. This probe (ONE process, tunnel
discipline):
  1. warm-up scalar fetch;
  2. tries whole-buffer np.asarray at increasing sizes to find the limit;
  3. measures chunked-fetch throughput of a 4096² float32 field (67 MB)
     at several XFB_FETCH_CHUNK_MB settings, verifying the bytes against
     an on-device checksum.
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from xlab_fftbarotropic_tpu.cli._platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlab_fftbarotropic_tpu.parallel import multihost

    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    print(f"# warm-up fetch {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    key = jax.random.PRNGKey(0)
    big = jax.random.normal(key, (4096, 4096), jnp.float32)
    csum = float(jnp.sum(jnp.abs(big)))  # scalar checksum pin

    # 2. whole-buffer fetch limit (ascending; stop at first failure)
    for mb in (1, 2, 4, 8, 16, 32, 64):
        rows = max(1, int(mb * 1024 * 1024) // (4096 * 4))
        part = big[:rows]
        t0 = time.perf_counter()
        try:
            arr = np.asarray(part)
            dt = time.perf_counter() - t0
            print(json.dumps({"probe": "whole", "mb": mb, "ok": True,
                              "s": round(dt, 2),
                              "mb_per_s": round(arr.nbytes / dt / 1e6, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"probe": "whole", "mb": mb, "ok": False,
                              "err": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)
            break

    # 3. chunked fetch of the full 67 MB field
    for chunk_mb in ("4", "8", "16"):
        os.environ["XFB_FETCH_CHUNK_MB"] = chunk_mb
        t0 = time.perf_counter()
        try:
            host = multihost.gather_to_host(big)
            dt = time.perf_counter() - t0
            sub = np.abs(host, dtype=np.float64).sum()
            print(json.dumps({"probe": "chunked", "chunk_mb": chunk_mb,
                              "ok": True, "s": round(dt, 2),
                              "mb_per_s": round(host.nbytes / dt / 1e6, 1),
                              "checksum_rel": abs(float(sub) - csum)
                              / abs(csum)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": "chunked", "chunk_mb": chunk_mb,
                              "ok": False, "err": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
