"""xlab_fftbarotropic_tpu — TPU-native pseudospectral barotropic / shallow-water framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
meteorologytoday/XLab-FFTBarotropic (reference mounted at /root/reference):
spectral 2-D barotropic vorticity dynamics, RK4, dealiasing, pressure
inversion, forcing streams, initial-condition generators, diagnostics, plus
the capabilities the reference only promised (shallow water, convergence
tests, the three README diagnostics) — designed TPU-first with sharded
multi-chip FFTs rather than translated from the serial C++/FFTW code.
"""

from .config import ModelConfig

__version__ = "0.1.0"
__all__ = ["ModelConfig", "adjoint"]


def __getattr__(name):
    # Lazy (PEP 562): the package root must stay jax-free so the CLI
    # entry points can pin the platform (cli/_platform.py) BEFORE the
    # first jax import — `from . import adjoint` here would defeat that.
    if name == "adjoint":
        import importlib
        return importlib.import_module(".adjoint", __name__)
    raise AttributeError(name)
