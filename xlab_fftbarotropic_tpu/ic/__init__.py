from . import makefields
