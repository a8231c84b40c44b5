from . import exact, quant, transforms
