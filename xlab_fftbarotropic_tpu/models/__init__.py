from .barotropic import BarotropicModel
from .shallow_water import ShallowWaterModel, SWState
from .tracer import TracerModel, TracerState
from .ensemble import EnsembleModel, perturb_vorticity
