from . import conv, norms, rope, sampling
