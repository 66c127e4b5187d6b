"""Public API package — the compatibility surface mirroring the
reference's 29 C headers (ref: libheif/api/libheif/*, SURVEY.md §2.7).

Every function keeps its reference C name (`heif_context_read_from_file`
etc.) so code written against the reference maps 1:1; objects are
Python-native (HeifContext, PixelImage, numpy planes) instead of opaque
pointers, and errors raise HeifError instead of returning heif_error
(see api.error.catching() for C-style capture).

Module ↔ reference header map:
  error          heif_error.h            library       heif_library.h
  context        heif_context.h          image_handle  heif_image_handle.h
  image          heif_image.h            decoding      heif_decoding.h
  encoding       heif_encoding.h         color         heif_color.h
  properties     heif_properties.h       items         heif_items.h
  metadata       heif_metadata.h         brands        heif_brands.h
  regions        heif_regions.h          text          heif_text.h
  tiling         heif_tiling.h           security      heif_security.h
  aux_images     heif_aux_images.h       entity_groups heif_entity_groups.h
  uncompressed   heif_uncompressed.h     experimental  heif_experimental.h
  components     heif_components.h       omaf          heif_omaf.h
  sequences      heif_sequences.h        tai_timestamps heif_tai_timestamps.h
  plugin         heif_plugin.h
"""

from .types import ImageTiling, EncodingOptions

from .error import *            # noqa: F401,F403
from .library import *          # noqa: F401,F403
from .context import *          # noqa: F401,F403
from .image_handle import *     # noqa: F401,F403
from .image import *            # noqa: F401,F403
from .decoding import *         # noqa: F401,F403
from .encoding import *         # noqa: F401,F403
from .color import *            # noqa: F401,F403
from .properties import *       # noqa: F401,F403
from .items import *            # noqa: F401,F403
from .metadata import *        # noqa: F401,F403
from .brands import *           # noqa: F401,F403
from .regions import *          # noqa: F401,F403
from .text import *             # noqa: F401,F403
from .tiling import *           # noqa: F401,F403
from .security import *         # noqa: F401,F403
from .aux_images import *       # noqa: F401,F403
from .entity_groups import *    # noqa: F401,F403
from .uncompressed import *     # noqa: F401,F403
from .experimental import *     # noqa: F401,F403
from .components import *       # noqa: F401,F403
from .omaf import *             # noqa: F401,F403
from .plugin import *           # noqa: F401,F403
from .sequences import *        # noqa: F401,F403
from .tai_timestamps import *   # noqa: F401,F403

from ..context import HeifContext  # noqa: F401  (pythonic entry point)

__all__ = ["HeifContext", "ImageTiling", "EncodingOptions"]
