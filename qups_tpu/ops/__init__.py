from .interp import interp1, interpd, interpf, wsinterpd, wsinterpd2
from .conv import convd, xcorr, conv_lag0, conv_len

__all__ = [
    "interp1", "interpd", "interpf", "wsinterpd", "wsinterpd2",
    "convd", "xcorr", "conv_lag0", "conv_len",
]
