# Register built-in codec cores with the registry on package import.
from . import registry  # noqa: F401

try:
    from . import hevc  # noqa: F401  (registers the HEVC decoder)
except ImportError:
    pass
