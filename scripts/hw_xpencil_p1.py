"""P=1-mesh hardware validation of the x-pencil overlap kernels.

Real multi-chip hardware is unavailable (BASELINE.md), so — exactly like
the slab overlap kernel's validation — the gather/scatter halves
(parallel/pallas_overlap.py) are compiled and RUN on the single real TPU
chip on a 1-device mesh: no remote DMA occurs, but Mosaic compiles the
full kernel (DMA descriptors, semaphore arrays, chunk pipeline, DFT
matmuls) and the 5-step barotropic trajectory must match the
XLA-collective x-pencil path bit-for-bit.

One process, warm-up fetch first, scalars only across the tunnel
(CLAUDE.md tunnel discipline). Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from xlab_fftbarotropic_tpu.config import ModelConfig
    from xlab_fftbarotropic_tpu.ic import makefields
    from xlab_fftbarotropic_tpu.parallel.model import (
        ShardedBarotropicModel, make_mesh)

    t0 = time.perf_counter()
    float(jnp.max(jnp.zeros((8,))))
    print(f"# warm-up fetch {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    cfg = ModelConfig(nx=512, ny=512)
    vort0 = makefields.gaussian(cfg)
    mesh = make_mesh(jax.devices()[:1])
    hny = cfg.ny // 2 + 1
    steps = 5

    outs = {}
    ms = {}
    for impl in ("xla", "overlap"):
        t1 = time.perf_counter()
        m = ShardedBarotropicModel.build(cfg, mesh, fft_impl=impl,
                                         decomp="xpencil")
        z = m.init_state(vort0)
        out = m.segment(z, m.zero_source(), steps)
        csum = float(jnp.max(jnp.abs(out)))           # forces completion
        compile_s = time.perf_counter() - t1
        t2 = time.perf_counter()
        out = m.segment(z, m.zero_source(), steps)
        csum2 = float(jnp.max(jnp.abs(out)))
        ms[impl] = (time.perf_counter() - t2) / steps * 1e3
        assert csum == csum2, "nondeterministic segment"
        outs[impl] = (out, csum, compile_s)

    # hpad differs between impls (lane-plan pad); compare on the real
    # columns, on device — only scalars cross the tunnel
    a = outs["xla"][0][:, :hny]
    b = outs["overlap"][0][:, :hny]
    max_diff = float(jnp.max(jnp.abs(a - b)))
    print(json.dumps({
        "stage": "xpencil_overlap_p1_hardware",
        "nx": cfg.nx, "steps": steps,
        "checksum_xla": outs["xla"][1],
        "checksum_overlap": outs["overlap"][1],
        "max_abs_diff": max_diff,
        "bit_identical": max_diff == 0.0,
        "ms_per_step": {k: round(v, 3) for k, v in ms.items()},
        "compile_s": {k: round(outs[k][2], 1) for k in outs},
    }), flush=True)


if __name__ == "__main__":
    main()
