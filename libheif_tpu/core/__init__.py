from .error import HeifError, ErrorCode, SubError
from .fourcc import fourcc, fourcc_to_str
from .bitstream import BitReader, BitWriter, ByteReader, ByteWriter
from .limits import SecurityLimits, MemoryTracker

__all__ = [
    "HeifError", "ErrorCode", "SubError",
    "fourcc", "fourcc_to_str",
    "BitReader", "BitWriter", "ByteReader", "ByteWriter",
    "SecurityLimits", "MemoryTracker",
]
