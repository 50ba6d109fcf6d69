from .waveform import Waveform
from .xdc import (Transducer, TransducerArray, TransducerConvex,
                  TransducerMatrix, TransducerGeneric)
from .seq import Sequence, SequenceRadial, SequenceGeneric
from .scan import (Scan, ScanCartesian, ScanPolar, ScanSpherical, ScanGeneric)
from .scat import Scatterers
from .medium import Medium
from .channel_data import ChannelData

__all__ = [
    "Waveform", "Transducer", "TransducerArray", "TransducerConvex",
    "TransducerMatrix", "TransducerGeneric", "Sequence", "SequenceRadial",
    "SequenceGeneric", "Scan", "ScanCartesian", "ScanPolar", "ScanSpherical",
    "ScanGeneric", "Scatterers", "Medium", "ChannelData",
]
