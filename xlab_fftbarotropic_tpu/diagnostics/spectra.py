"""Isotropic energy / enstrophy spectra E(k), Z(k).

New diagnostic (no reference counterpart — the reference records only
physical fields): the standard 2-D turbulence analysis companion to the
recorded vorticity, shell-averaging the spectral densities over integer
isotropic wavenumber shells s = round(sqrt(i^2 + j^2)) (index space; the
physical wavenumber of shell s is s * 2*pi/L on the square domain).

Bookkeeping is exact-Parseval by construction:

    sum_s Z(s) = 0.5 * mean(zeta^2)          (enstrophy, StepStats parity)
    sum_s E(s) = 0.5 * mean(u^2 + v^2)       (energy,   StepStats parity)

using the unnormalized-forward state convention (SURVEY.md §5.2:
zeta_hat = rfft2(zeta), so mean(zeta^2) = sum_k w_k |zeta_hat_k|^2 / N^4
with half-spectrum multiplicity w = 2 except the self-represented j=0
and j=ny/2 columns), |u_hat|^2 + |v_hat|^2 = |zeta_hat|^2 / k^2 (mean
mode excluded — it carries no velocity), and enough shells to cover the
spectral corner so no mode is dropped.

Everything is a static gather/segment-sum — jittable, VPU-only.

Nyquist caveat (measured, tests/test_spectra.py): the ENERGY identity
holds exactly only for fields without Nyquist-row content. The
reference's positive-Nyquist gradient convention (SURVEY.md §5.3,
fftwfop.cpp:15-19) makes u_hat, v_hat non-Hermitian on the
self-reflected x-Nyquist row, and the irfft2 behind the physical-space
StepStats energy silently projects that sliver away — so for a field
with Nyquist content the spectral sum here is the faithful quadratic-
form total and exceeds the physical mean by O(|zeta_hat(Nyq)|^2/k^2)
(1.7e-4 relative on a 10-step Kuo2004 field at 64²; 1e-7 once the
Nyquist row/column are zeroed). Enstrophy is unaffected (it never
passes through the gradient convention).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.spectral import SpectralTables


class Spectrum(NamedTuple):
    k: jax.Array        # (nshells,) physical wavenumber of each shell [1/m]
    energy: jax.Array   # (nshells,) E(s): sum = 0.5*mean(u^2+v^2)
    enstrophy: jax.Array  # (nshells,) Z(s): sum = 0.5*mean(zeta^2)


def shell_tables(cfg: ModelConfig) -> Tuple[np.ndarray, np.ndarray, int]:
    """(shell index, half-spectrum multiplicity, n_shells) as numpy
    constants — built once per config, passed into the jitted kernel."""
    nx, ny = cfg.grid_shape
    hny = ny // 2 + 1
    ix = np.minimum(np.arange(nx), nx - np.arange(nx))[:, None]  # |i|
    jy = np.arange(hny)[None, :]
    shell = np.rint(np.hypot(ix, jy)).astype(np.int32)
    w = np.full((nx, hny), 2.0, np.float32)
    w[:, 0] = 1.0
    if ny % 2 == 0:
        w[:, hny - 1] = 1.0
    n_shells = int(shell.max()) + 1
    return np.broadcast_to(shell, (nx, hny)).copy(), w, n_shells


def energy_enstrophy_spectrum(t: SpectralTables, zeta_hat: jax.Array,
                              cfg: ModelConfig) -> Spectrum:
    shell, w, n_shells = shell_tables(cfg)
    nx, ny = cfg.grid_shape
    norm = 1.0 / (float(nx) * ny) ** 2

    @jax.jit
    def compute(zeta_hat, shell, w, rlap):
        dens_z = 0.5 * norm * w * (jnp.real(zeta_hat) ** 2
                                   + jnp.imag(zeta_hat) ** 2)
        # |u|^2+|v|^2 = |zeta_hat|^2 / k^2; rlap = 1/lap with the mean
        # mode passed through (SURVEY.md §5.4) — mask it out explicitly
        dens_e = dens_z * jnp.abs(rlap)
        dens_e = dens_e.at[0, 0].set(0.0)
        flat = shell.reshape(-1)
        e = jax.ops.segment_sum(dens_e.reshape(-1), flat,
                                num_segments=n_shells)
        z = jax.ops.segment_sum(dens_z.reshape(-1), flat,
                                num_segments=n_shells)
        return e, z

    e, z = compute(zeta_hat, jnp.asarray(shell), jnp.asarray(w), t.rlap)
    k = jnp.arange(n_shells, dtype=jnp.float32) * (2.0 * np.pi / cfg.lx)
    return Spectrum(k=k, energy=e, enstrophy=z)
