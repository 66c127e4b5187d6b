from .types import ImageTiling, EncodingOptions
from ..context import HeifContext

__all__ = ["HeifContext", "ImageTiling", "EncodingOptions"]
