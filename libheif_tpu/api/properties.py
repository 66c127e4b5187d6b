"""Item-property API (ref: api/libheif/heif_properties.h, 41 fns).

Raw/typed property query and creation over the ipco/ipma tables
(ref: heif_properties.h over HeifFile property storage, file.h:168-216).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..boxes.box import Box
from ..boxes.meta import (Box_irot, Box_imir, Box_clap, Box_udes,
                          Box_clli, Box_mdcv, Box_pasp)
from ..core.error import HeifError
from ..core.fraction import Fraction

# property "types" follow the box fourcc, as in the reference
heif_item_property_type_invalid = ""
heif_item_property_type_user_description = "udes"
heif_item_property_type_transform_mirror = "imir"
heif_item_property_type_transform_rotation = "irot"
heif_item_property_type_clean_aperture = "clap"
heif_item_property_type_pixel_aspect_ratio = "pasp"
heif_item_property_type_content_light_level = "clli"
heif_item_property_type_mastering_display = "mdcv"


def _props(ctx, item_id: int) -> List[Box]:
    return ctx.file.get_properties(item_id)


def heif_item_get_properties_of_type(ctx, item_id: int,
                                     prop_type: Optional[str] = None
                                     ) -> List[int]:
    """Returns 1-based property indices (the C API's property ids)."""
    out = []
    for i, p in enumerate(_props(ctx, item_id)):
        if prop_type is None or p.box_type == prop_type:
            out.append(i + 1)
    return out


def heif_item_get_transformation_properties(ctx, item_id: int
                                            ) -> List[int]:
    return [i + 1 for i, p in enumerate(_props(ctx, item_id))
            if p.box_type in ("irot", "imir", "clap")]


def heif_item_get_property_type(ctx, item_id: int,
                                property_id: int) -> str:
    props = _props(ctx, item_id)
    if not 1 <= property_id <= len(props):
        raise HeifError.usage(msg=f"bad property id {property_id}")
    return props[property_id - 1].box_type


def _prop_by_id(ctx, item_id: int, property_id: int) -> Box:
    props = _props(ctx, item_id)
    if not 1 <= property_id <= len(props):
        raise HeifError.usage(msg=f"bad property id {property_id}")
    return props[property_id - 1]


def heif_item_get_property_raw_size(ctx, item_id: int,
                                    property_id: int) -> int:
    return len(heif_item_get_property_raw_data(ctx, item_id, property_id))


def heif_item_get_property_raw_data(ctx, item_id: int,
                                    property_id: int) -> bytes:
    """Payload bytes of the property box, without the box header."""
    from ..core.bitstream import ByteWriter
    p = _prop_by_id(ctx, item_id, property_id)
    w = ByteWriter()
    p.write(w)
    blob = w.data()
    # strip the box header (size32 + type; + 16 more for uuid)
    hdr = 8 if p.box_type != "uuid" else 24
    if len(blob) >= 4 and int.from_bytes(blob[:4], "big") == 1:
        hdr += 8
    return blob[hdr:]


def heif_item_get_property_uuid_type(ctx, item_id: int,
                                     property_id: int) -> Optional[bytes]:
    p = _prop_by_id(ctx, item_id, property_id)
    return getattr(p, "uuid_type", None)


def heif_item_add_raw_property(ctx, item_id: int, fourcc: str,
                               uuid_type: Optional[bytes], data: bytes,
                               is_essential: bool) -> int:
    from ..boxes.box import Box_other
    b = Box_other(fourcc)
    b.payload = bytes(data)
    if uuid_type is not None:
        b.uuid_type = uuid_type
    return ctx.file.add_property(item_id, b, is_essential)


# ------------------------------------------------------- transformations

def heif_item_get_property_transform_rotation_ccw(ctx, item_id: int,
                                                  property_id: int) -> int:
    p = _prop_by_id(ctx, item_id, property_id)
    if not isinstance(p, Box_irot):
        raise HeifError.usage(msg="property is not irot")
    return p.angle


def heif_item_get_property_transform_mirror(ctx, item_id: int,
                                            property_id: int) -> str:
    p = _prop_by_id(ctx, item_id, property_id)
    if not isinstance(p, Box_imir):
        raise HeifError.usage(msg="property is not imir")
    return p.direction


def heif_item_get_property_transform_crop_borders(
        ctx, item_id: int, property_id: int, image_width: int,
        image_height: int) -> Tuple[int, int, int, int]:
    """Returns (left, top, right, bottom) crop amounts (ref:
    heif_properties.h transform_crop_borders)."""
    p = _prop_by_id(ctx, item_id, property_id)
    if not isinstance(p, Box_clap):
        raise HeifError.usage(msg="property is not clap")
    left = p.left(image_width)
    top = p.top(image_height)
    w = p.width_rounded()
    h = p.height_rounded()
    return left, top, image_width - left - w, image_height - top - h


# ------------------------------------------------------ user description

class heif_property_user_description:
    """(ref: heif_property_user_description struct)."""

    def __init__(self, lang="", name="", description="", tags=""):
        self.lang = lang
        self.name = name
        self.description = description
        self.tags = tags


def heif_item_get_property_user_description(ctx, item_id: int,
                                            property_id: int
                                            ) -> heif_property_user_description:
    p = _prop_by_id(ctx, item_id, property_id)
    if not isinstance(p, Box_udes):
        raise HeifError.usage(msg="property is not udes")
    return heif_property_user_description(
        lang=p.lang, name=p.name, description=p.description,
        tags=getattr(p, "tags", ""))


def heif_item_add_property_user_description(ctx, item_id: int,
                                            description) -> int:
    b = Box_udes(lang=description.lang, name=description.name,
                 description=description.description)
    b.tags = getattr(description, "tags", "")
    return ctx.file.add_property(item_id, b, False)


def heif_property_user_description_release(desc) -> None:
    pass


# ------------------------------------------------------ typed additions

def heif_item_add_transform_property_rotation(ctx, item_id: int,
                                              ccw_angle: int) -> int:
    return ctx.file.add_property(item_id, Box_irot(ccw_angle), True)


def heif_item_add_transform_property_mirror(ctx, item_id: int,
                                            axis: str) -> int:
    return ctx.file.add_property(item_id, Box_imir(axis), True)


def heif_item_add_transform_property_crop(ctx, item_id: int,
                                          left: int, top: int,
                                          right: int, bottom: int,
                                          image_width: int,
                                          image_height: int) -> int:
    w = image_width - left - right
    h = image_height - top - bottom
    clap = Box_clap(Fraction(w, 1), Fraction(h, 1),
                    Fraction(2 * left + w - image_width, 2),
                    Fraction(2 * top + h - image_height, 2))
    return ctx.file.add_property(item_id, clap, True)


def heif_item_add_property_content_light_level(ctx, item_id: int,
                                               max_cll: int,
                                               max_pall: int) -> int:
    return ctx.file.add_property(item_id, Box_clli(max_cll, max_pall),
                                 False)


def heif_item_get_property_content_light_level(ctx, item_id: int):
    p = ctx.file.get_property(item_id, Box_clli)
    return p


def heif_item_add_property_mastering_display(ctx, item_id: int,
                                             mdcv: Box_mdcv) -> int:
    return ctx.file.add_property(item_id, mdcv, False)


def heif_item_get_property_mastering_display(ctx, item_id: int):
    return ctx.file.get_property(item_id, Box_mdcv)


def heif_item_add_property_pixel_aspect_ratio(ctx, item_id: int,
                                              h_spacing: int,
                                              v_spacing: int) -> int:
    return ctx.file.add_property(item_id,
                                 Box_pasp(h_spacing, v_spacing), False)


def heif_item_get_property_pixel_aspect_ratio(ctx, item_id: int
                                              ) -> Optional[Tuple[int,
                                                                  int]]:
    p = ctx.file.get_property(item_id, Box_pasp)
    return (p.h_spacing, p.v_spacing) if p else None
