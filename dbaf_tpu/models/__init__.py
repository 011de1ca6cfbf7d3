from .net import BasicEncoder, ConvGRU, UpdateModule, DroidNet  # noqa: F401
