from .nrt import NRTIndexWriter, index_stream
from .replicator import replicate

__all__ = ["NRTIndexWriter", "index_stream", "replicate"]
