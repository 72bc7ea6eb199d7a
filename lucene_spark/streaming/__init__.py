from .nrt import NRTIndexWriter, index_stream

__all__ = ["NRTIndexWriter", "index_stream"]
