"""Host I/O: image import/export codecs + streaming reader protocol."""

from .png import read_png, write_png
from .y4m import read_y4m, write_y4m
from .ppm import read_ppm, write_ppm
from .reader import (CallbackReader, FileReader, GrowStatus, MemoryReader,
                     StreamReader)

__all__ = ["read_png", "write_png", "read_y4m", "write_y4m",
           "read_ppm", "write_ppm", "StreamReader", "MemoryReader",
           "FileReader", "CallbackReader", "GrowStatus"]
