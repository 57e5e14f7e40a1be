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
    kappa_ratio: jax.Array   # (nbins,) max(Le^2/Lmin^2, 1) — clipped
    kappa_ratio_raw: jax.Array  # (nbins,) unclipped Le^2/Lmin^2; values
    #                             below 1 flag under-resolved bins


def effective_diffusivity(t: SpectralTables, q: jax.Array, dx: float,
                          dy: float, nbins: int = 64) -> EffectiveDiffusivity:
    """Nakamura effective-diffusivity profile of tracer field q (nx, ny).

    Returns per-level diagnostics. L_e >= L_min holds exactly in the
    continuum (isoperimetric inequality); discretization noise can dip the
    ratio under 1 near empty bins, so `kappa_ratio` is clipped below at 1
    for downstream consumers while `kappa_ratio_raw` keeps the unclipped
    value — a ratio well below 1 means the bin is under-resolved and the
    profile should not be trusted there (VERDICT r1: clipping alone can
    mask under-resolution).

    Analytic pins (tests/test_postproc.py): a radially symmetric tracer
    has circular contours, so L_e = L_min and the ratio is exactly 1; a
    stripe tracer cos(2*pi*(a*x/lx + b*y/ly)) has straight-line contours
    of total length 2*hypot(a*ly, b*lx), so L_e^2 = 4*(a^2*ly^2 + b^2*lx^2)
    at every interior level.
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

    # A(Q): area with q >= Q — reverse cumulative sums (high bins first).
    # A[i] counts bins i..nbins-1, i.e. A at the LOWER EDGE of bin i;
    # evaluated at the bin-center level Q[i] the half-bin offset is the
    # i-1/i average, consistent with the centered differences below.
    area_edge = jnp.cumsum(count[::-1])[::-1] * cell
    g2int_edge = jnp.cumsum(g2sum[::-1])[::-1] * cell
    shift = lambda a: jnp.concatenate([a[1:], jnp.zeros((1,), a.dtype)])
    area = 0.5 * (area_edge + shift(area_edge))
    g2int = 0.5 * (g2int_edge + shift(g2int_edge))

    dQ = span / nbins
    # CENTERED differences of the cumulative functions at bin centers:
    # dA/dQ|_i = (A_edge[i+1] - A_edge[i]) / dQ is exactly the centered
    # two-point difference of the bin-center A about level Q[i]
    # (A_edge[i] is A half a bin below Q[i], A_edge[i+1] half a bin above)
    dA_dQ = (shift(area_edge) - area_edge) / dQ        # = -count*cell/dQ
    dG_dQ = (shift(g2int_edge) - g2int_edge) / dQ
    # <|grad q|^2>_Q = dG/dA = dG_dQ / dA_dQ
    safe = jnp.abs(dA_dQ) > 0
    mean_grad2 = jnp.where(safe, dG_dQ / jnp.where(safe, dA_dQ, 1.0), 0.0)
    # L_e^2 = <|grad q|^2>_Q * (dA/dQ)^2
    le2 = mean_grad2 * dA_dQ * dA_dQ
    lmin2 = 4.0 * jnp.pi * area
    raw = jnp.where((le2 > 0) & (lmin2 > 0),
                    le2 / jnp.maximum(lmin2, 1e-30), 1.0)
    return EffectiveDiffusivity(levels=levels, area=area, equiv_length2=le2,
                                min_length2=lmin2,
                                kappa_ratio=jnp.maximum(raw, 1.0),
                                kappa_ratio_raw=raw)
