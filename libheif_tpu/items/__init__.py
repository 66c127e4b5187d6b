from .item import ImageItem, ImageItem_Error, DecodingOptions, alloc_item
from . import unci_item  # noqa: F401 (registers 'unci')
from . import derived    # noqa: F401 (grid/iovl/iden)
from . import mask_item  # noqa: F401 (mski)
from . import codec_items  # noqa: F401 (hvc1/av01/...)
from . import tiled_item  # noqa: F401 (tili)

__all__ = ["ImageItem", "ImageItem_Error", "DecodingOptions", "alloc_item"]
