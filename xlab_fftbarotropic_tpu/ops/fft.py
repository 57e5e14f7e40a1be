"""FFT backend.

TPU-native replacement for the reference's serial FFTW3f plans
(/root/reference/src/main.cpp:126-135). On TPU the 2-D real FFT lowers to
XLA's native FFT HLO; there are no plans to manage, transforms are traced
into the jitted step and fused with neighbouring elementwise work.

Normalization contract (SURVEY.md §5.2): the reference uses unnormalized
FFTW transforms and divides by GRIDS=N*N only after each inverse
(main.cpp:37-41). numpy/JAX's rfft2/irfft2 pair has exactly this convention
(forward unnormalized, inverse scaled by 1/(nx*ny)), so `forward`/`inverse`
here are allclose-bit-compatible with the reference pipeline without any
extra scaling. Unlike FFTW's c2r (which destroys its input, forcing the
reference into memcpy backup/restore dances, main.cpp:272-281), these are
pure functions.

Layout: the physical grid is x-major/y-contiguous (IDX(i,j)=ny*i+j,
configuration.hpp:31); rfft2 over the last axis halves y exactly like
fftwf_plan_dft_r2c_2d(XPTS, YPTS, ...) — spectral shape (nx, ny//2+1).

The distributed (multi-chip) transform lives in parallel/dfft.py; this module
is the single-device fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def forward(field: jax.Array) -> jax.Array:
    """Real (nx, ny) float32 -> half-spectrum (nx, ny//2+1) complex64.

    Unnormalized, matching fftwf_plan_dft_r2c_2d + fftwf_execute
    (main.cpp:126-127, 256).
    """
    return jnp.fft.rfft2(field)


def inverse(spec: jax.Array, grid_shape=None) -> jax.Array:
    """Half-spectrum complex64 -> real float32, scaled by 1/(nx*ny).

    Equivalent to fftwf_execute(c2r plan) followed by
    fftwf_backward_normalize (main.cpp:37-41), as one pure function.
    """
    if grid_shape is None:
        nx, hny = spec.shape[-2], spec.shape[-1]
        grid_shape = (nx, 2 * (hny - 1))
    return jnp.fft.irfft2(spec, s=grid_shape)
