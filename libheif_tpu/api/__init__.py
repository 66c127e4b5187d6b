from .types import ImageTiling, EncodingOptions

__all__ = ["HeifContext", "ImageTiling", "EncodingOptions"]


def __getattr__(name):
    # Lazy to break the context ↔ api import cycle (context.py imports
    # api.types at module level).
    if name == "HeifContext":
        from ..context import HeifContext
        return HeifContext
    raise AttributeError(name)
