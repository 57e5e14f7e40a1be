"""Differentiable wrappers for the fused Pallas transforms.

The hand-written Pallas kernels (ops/pallas_fft.py) have no autodiff
rules, so adjoint rollouts (adjoint.py) historically fell back to the
XLA FFT path. These wrappers give the three transform entry points
custom VJPs whose BACKWARD passes also run the Pallas kernels, so
`jax.grad` flows through the fused pipeline at Pallas speed in both
directions.

The rules (real-linear maps; derivation pinned numerically against
jax.vjp of the jnp.fft wrappers in tests/test_pallas_diff.py; the conj
on the complex cotangent side is JAX's complex-VJP convention):

* forward (unnormalized rfft2, ops/fft.py contract):
    x_bar = (nx*ny) * irfft2(w ∘ conj(ct)),  w[ky] = 1/2 interior,
                                       1 at the self-conjugate columns
                                       ky in {0, ny/2}
  — the Hermitian-extended inverse applies weight 2 to interior
  columns by construction, so the half-weights exactly cancel it.
* inverse (1/(nx*ny)-normalized irfft2):
    S_bar = conj((c/(nx*ny)) ∘ rfft2(u)), c[ky] = 2 interior, 1 self-conj
* inverse_pair: componentwise inverse rule (two forward transforms).

Gauge note: the half-spectrum representation is redundant on the
self-conjugate columns (their kx-negative rows mirror the positive
ones in a VALID state). The VJPs above are the exact transposes of the
maps as implemented — including the self-conjugate Re-projection — so
composed gradients agree with the XLA path to float32 round-off even
though intermediate cotangents may carry components outside the valid
Hermitian subspace.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import pallas_fft as pf

# The pallas transforms are invoked through their own closed pjits:
# inlining a pallas_call into a function that later gets partial-eval'd
# for transposition (grad through an outer jit of scan+checkpoint)
# re-stages the traced jaxpr, and the transform-table constants created
# inside the trace surface as tracer-valued jaxpr constants that the
# MLIR lowering rejects ("No constant handler for DynamicJaxprTracer",
# JAX 0.9.0). A nested jit keeps those constants internal to a closed
# call. Shapes are static per call site, so the jit cache is exact.
_rfft2 = jax.jit(pf.rfft2)
_irfft2 = jax.jit(pf.irfft2, static_argnums=1)
_inverse_pair = jax.jit(pf.inverse_pair, static_argnums=2)


@functools.lru_cache(maxsize=None)
def _col_weights(ny: int, half: float, selfconj: float):
    """ky-column weight row (1, hny). Cached as NUMPY, never as a jax
    array: a jnp constant materialized under an active trace is a
    TRACER, and caching one across traces poisons later lowerings
    ("No constant handler for DynamicJaxprTracer")."""
    hny = ny // 2 + 1
    import numpy as np
    w = np.full((1, hny), half, np.float32)
    w[0, 0] = selfconj
    w[0, -1] = selfconj
    return w


@jax.custom_vjp
def forward(x: jax.Array) -> jax.Array:
    """Differentiable pallas rfft2 (unnormalized, ops/fft.py contract)."""
    return _rfft2(x)


def _forward_fwd(x):
    # NO residuals: under scan/remat transposition residuals are stacked
    # into (traced) arrays, and python ints in them would poison the
    # static shapes the pallas_call needs. The grid is recovered from
    # the cotangent's own (static) shape — grids are even (power-of-two
    # per the kernel contract), so ny = 2*(hny-1) is unambiguous.
    return _rfft2(x), None


def _forward_bwd(_res, ct):
    nx, hny = ct.shape
    ny = 2 * (hny - 1)
    w = _col_weights(ny, 0.5, 1.0)
    return ((nx * ny) * _irfft2(jnp.conj(ct) * w, (nx, ny)),)


forward.defvjp(_forward_fwd, _forward_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def inverse(spec: jax.Array, grid_shape) -> jax.Array:
    """Differentiable pallas irfft2 (1/(nx*ny) normalization)."""
    return _irfft2(spec, tuple(grid_shape))


def _inverse_fwd(spec, grid_shape):
    return _irfft2(spec, tuple(grid_shape)), None


def _inverse_bwd(grid_shape, _res, ct):
    nx, ny = grid_shape[-2], grid_shape[-1]
    c = _col_weights(ny, 2.0, 1.0)
    return (jnp.conj((c / (nx * ny)) * _rfft2(ct)),)


inverse.defvjp(_inverse_fwd, _inverse_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def inverse_pair(spec_a: jax.Array, spec_b: jax.Array, grid_shape):
    """Differentiable fused pair inverse (2 real c2r in one y-stage)."""
    return _inverse_pair(spec_a, spec_b, tuple(grid_shape))


def _inverse_pair_fwd(spec_a, spec_b, grid_shape):
    return _inverse_pair(spec_a, spec_b, tuple(grid_shape)), None


def _inverse_pair_bwd(grid_shape, _res, cts):
    ua, ub = cts
    nx, ny = grid_shape[-2], grid_shape[-1]
    c = _col_weights(ny, 2.0, 1.0) / (nx * ny)
    return (jnp.conj(c * _rfft2(ua)), jnp.conj(c * _rfft2(ub)))


inverse_pair.defvjp(_inverse_pair_fwd, _inverse_pair_bwd)
