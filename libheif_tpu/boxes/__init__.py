from .box import (
    Box, FullBox, BoxHeader, Box_other, Box_Error, register_box,
    read_box, read_all_boxes, BOX_REGISTRY,
)
from . import meta  # noqa: F401  (registers standard boxes)
from . import codec_cfg  # noqa: F401
from . import unc  # noqa: F401
from . import seq  # noqa: F401
from . import mini  # noqa: F401
from . import tild  # noqa: F401
from . import j2k  # noqa: F401
from . import omaf  # noqa: F401

__all__ = [
    "Box", "FullBox", "BoxHeader", "Box_other", "Box_Error",
    "register_box", "read_box", "read_all_boxes", "BOX_REGISTRY",
]
