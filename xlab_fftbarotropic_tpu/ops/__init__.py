from . import fft, spectral
from .spectral import SpectralTables
