"""Effective eddy diffusivity (Nakamura equivalent-length diagnostic).

Advertised in the reference README (/root/reference/README.md:6) but never
implemented there (SURVEY.md §5.10-7); designed here from Hendricks &
Schubert 2009 (JAS 66, "Transport and mixing in idealized barotropic
hurricane-like vortices"), who apply Nakamura's (1996) tracer-coordinate
formalism to the 2-D barotropic vortex problem.

Formalism: for a tracer q (here: the vorticity itself, the natural tracer of
barotropic flow), define the area coordinate

    A(Q) = area where q >= Q,

the equivalent length

    L_e^2(Q) = d/dA [ integral over {q >= Q} of |grad q|^2 dA ] * (dA/dQ)^2
             = <|grad q|^2>_Q * (dA/dQ)^2   (contour average),

and the effective diffusivity ratio

    kappa_eff / kappa = L_e^2 / L_min^2,

where L_min(A) = 2*sqrt(pi*A) is the minimum possible perimeter of a region
of area A (closed contours around a vortex core; Hendricks & Schubert 2009
§2b). kappa_eff >= kappa always; excess measures filamentary stretching of
tracer contours, i.e. mixing efficiency.

Discretization: sort-free histogram binning on device. Cells are binned by
tracer value into `nbins` monotone levels; cumulative sums over bins give
A(Q) and the integral of |grad q|^2; centered finite differences in Q give
the derivatives. Everything is jittable (static bin count) and runs on the
VPU; gradients come from the spectral operators.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import fft
from ..ops import spectral as sp
from ..ops.spectral import SpectralTables


class EffectiveDiffusivity(NamedTuple):
    levels: jax.Array        # (nbins,) tracer levels Q (bin centers)
    area: jax.Array          # (nbins,) A(Q) = area with q >= Q   [m^2]
    equiv_length2: jax.Array # (nbins,) L_e^2(Q)                  [m^2]
    min_length2: jax.Array   # (nbins,) L_min^2 = 4*pi*A          [m^2]
    kappa_ratio: jax.Array   # (nbins,) kappa_eff / kappa = Le^2/Lmin^2


def effective_diffusivity(t: SpectralTables, q: jax.Array, dx: float,
                          dy: float, nbins: int = 64) -> EffectiveDiffusivity:
    """Nakamura effective-diffusivity profile of tracer field q (nx, ny).

    Returns per-level diagnostics; kappa_ratio is clipped below at 1
    (L_e >= L_min by the isoperimetric inequality; discretization noise can
    dip under it near empty bins).
    """
    q = jnp.asarray(q, jnp.float32)
    cell = dx * dy
    q_hat = fft.forward(q)
    gx = fft.inverse(sp.gradx(t, q_hat), q.shape)
    gy = fft.inverse(sp.grady(t, q_hat), q.shape)
    grad2 = gx * gx + gy * gy

    qmin = jnp.min(q)
    qmax = jnp.max(q)
    span = jnp.maximum(qmax - qmin, 1e-30)
    # bin index per cell; levels are bin centers
    ib = jnp.clip(((q - qmin) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    levels = qmin + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) / nbins * span

    ones = jnp.ones_like(q)
    count = jnp.zeros(nbins, jnp.float32).at[ib.reshape(-1)].add(
        ones.reshape(-1))
    g2sum = jnp.zeros(nbins, jnp.float32).at[ib.reshape(-1)].add(
        grad2.reshape(-1))

    # A(Q): area with q >= Q — reverse cumulative sums (high bins first)
    area = jnp.cumsum(count[::-1])[::-1] * cell
    g2int = jnp.cumsum(g2sum[::-1])[::-1] * cell

    dQ = span / nbins
    # dA/dQ < 0 (area shrinks with level); centered one-bin differences
    dA_dQ = -count * cell / dQ
    dG_dQ = -g2sum * cell / dQ
    # <|grad q|^2>_Q = dG/dA = dG_dQ / dA_dQ
    safe = jnp.abs(dA_dQ) > 0
    mean_grad2 = jnp.where(safe, dG_dQ / jnp.where(safe, dA_dQ, 1.0), 0.0)
    # L_e^2 = <|grad q|^2>_Q * (dA/dQ)^2
    le2 = mean_grad2 * dA_dQ * dA_dQ
    lmin2 = 4.0 * jnp.pi * area
    ratio = jnp.where((le2 > 0) & (lmin2 > 0),
                      jnp.maximum(le2 / jnp.maximum(lmin2, 1e-30), 1.0), 1.0)
    return EffectiveDiffusivity(levels=levels, area=area, equiv_length2=le2,
                                min_length2=lmin2, kappa_ratio=ratio)
