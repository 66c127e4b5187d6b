"""Public API value types mirroring the reference C structs.

Definitions live in :mod:`libheif_tpu.option_types` (outside the api
package) so that core modules can use them without importing the api
package — which would create a circular import through
``api/__init__``.
"""

from ..option_types import EncodingOptions, ImageTiling  # noqa: F401
