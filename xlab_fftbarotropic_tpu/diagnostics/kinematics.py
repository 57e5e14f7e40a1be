"""Kinematic flow diagnostics: filamentation time and deformation factor.

These two (plus effective eddy diffusivity, see eddy_diffusivity.py) are
advertised in the reference README (/root/reference/README.md:4-7) but are
implemented NOWHERE in the reference code (SURVEY.md §5.10-7) — they are
designed here from the cited literature as new capabilities.

All ingredients are cheap spectral gradients of the streamfunction. With
u = -psi_y, v = +psi_x:

    S1 = u_x - v_y   (stretching deformation)
    S2 = v_x + u_y   (shearing deformation)
    zeta = v_x - u_y (relative vorticity)

* Filamentation time (Rozoff, Schubert, McNoldy & Kossin 2006, JAS 63,
  "Rapid filamentation zones in intense tropical cyclones", eq. 12):

      tau_fil = 2 / sqrt(S1^2 + S2^2 - zeta^2)

  defined only in strain-dominated regions (S1^2+S2^2 > zeta^2); we return
  +inf in vorticity-dominated regions, matching the paper's convention that
  filamentation zones are where tau_fil is finite (and "rapid" where it is
  below ~30 min).

* Deformation factor (Hsu; no public spec exists — the reference author's
  thesis quantity). Defined here as the strain-to-vorticity ratio

      D = sqrt(S1^2 + S2^2) / (|zeta| + eps)

  i.e. D > 1 in strain-dominated (filamenting) regions and D < 1 inside
  vortex cores; D^2 - 1 has the sign of the Okubo-Weiss parameter. The raw
  Okubo-Weiss field OW = S1^2 + S2^2 - zeta^2 is also exposed.

All functions take the spectral vorticity state and return physical fields;
everything fuses into a handful of FFTs under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import fft
from ..ops import spectral as sp
from ..ops.spectral import SpectralTables


class VelocityGradients(NamedTuple):
    u_x: jax.Array
    u_y: jax.Array
    v_x: jax.Array
    v_y: jax.Array


def velocity_gradients(t: SpectralTables, zeta_hat: jax.Array,
                       grid_shape) -> VelocityGradients:
    """u_x, u_y, v_x, v_y from the spectral vorticity via psi = lap^-1 zeta."""
    psi_hat = sp.invert_laplacian(t, zeta_hat)
    u_hat, v_hat = sp.velocities(t, psi_hat)
    return VelocityGradients(
        u_x=fft.inverse(sp.gradx(t, u_hat), grid_shape),
        u_y=fft.inverse(sp.grady(t, u_hat), grid_shape),
        v_x=fft.inverse(sp.gradx(t, v_hat), grid_shape),
        v_y=fft.inverse(sp.grady(t, v_hat), grid_shape),
    )


def strain_vorticity(g: VelocityGradients) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(S1, S2, zeta) from velocity gradients."""
    s1 = g.u_x - g.v_y
    s2 = g.v_x + g.u_y
    zeta = g.v_x - g.u_y
    return s1, s2, zeta


def okubo_weiss(t: SpectralTables, zeta_hat: jax.Array, grid_shape) -> jax.Array:
    """OW = S1^2 + S2^2 - zeta^2 (> 0: strain-dominated)."""
    s1, s2, zeta = strain_vorticity(velocity_gradients(t, zeta_hat, grid_shape))
    return s1 * s1 + s2 * s2 - zeta * zeta


def filamentation_time(t: SpectralTables, zeta_hat: jax.Array,
                       grid_shape) -> jax.Array:
    """Rozoff et al. 2006 eq. 12: tau_fil = 2/sqrt(S^2 - zeta^2) where
    S^2 > zeta^2; +inf elsewhere (vorticity-dominated)."""
    ow = okubo_weiss(t, zeta_hat, grid_shape)
    return jnp.where(ow > 0.0, 2.0 / jnp.sqrt(jnp.where(ow > 0.0, ow, 1.0)),
                     jnp.inf)


def deformation_factor(t: SpectralTables, zeta_hat: jax.Array, grid_shape,
                       eps: float = 1e-12) -> jax.Array:
    """D = sqrt(S1^2+S2^2) / (|zeta| + eps); strain-to-vorticity ratio."""
    s1, s2, zeta = strain_vorticity(velocity_gradients(t, zeta_hat, grid_shape))
    return jnp.sqrt(s1 * s1 + s2 * s2) / (jnp.abs(zeta) + eps)
