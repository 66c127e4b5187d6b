from .png import read_png, write_png
from .y4m import read_y4m, write_y4m
from .ppm import read_ppm, write_ppm

__all__ = ["read_png", "write_png", "read_y4m", "write_y4m",
           "read_ppm", "write_ppm"]
