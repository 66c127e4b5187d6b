"""Host I/O: image import/export codecs + streaming reader protocol."""

from .png import read_png, write_png
from .y4m import read_y4m, write_y4m
from .ppm import read_ppm, write_ppm
from .reader import (CallbackReader, FileReader, GrowStatus, MemoryReader,
                     StreamReader)
from .jpeg import read_jpeg, write_jpeg, read_jpeg_file, write_jpeg_file
from .tiff import read_tiff, write_tiff, read_tiff_file, write_tiff_file
from .webp import read_webp, write_webp, read_webp_file, write_webp_file

__all__ = ["read_png", "write_png", "read_y4m", "write_y4m",
           "read_ppm", "write_ppm", "read_jpeg", "write_jpeg",
           "read_jpeg_file", "write_jpeg_file", "read_tiff", "write_tiff",
           "read_tiff_file", "write_tiff_file", "read_webp", "write_webp",
           "read_webp_file", "write_webp_file", "StreamReader",
           "MemoryReader", "FileReader", "CallbackReader", "GrowStatus"]
