from .barotropic import BarotropicModel
