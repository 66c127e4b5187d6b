"""Component-description API (ref: api/libheif/heif_components.h,
39 fns over ImageDescription/ComponentDescription,
image_description.h:131,156).
"""

from __future__ import annotations

from typing import List, Optional

from ..core.error import HeifError
from ..image.image_description import (ImageDescription,
                                       ComponentDescription,
                                       ComponentType, ComponentDatatype)
from .image_handle import heif_image_handle

heif_image_description = ImageDescription
heif_component_description = ComponentDescription
heif_component_type = ComponentType
heif_channel_datatype = ComponentDatatype


# --------------------------------------------------------- construction

def heif_image_description_create() -> ImageDescription:
    return ImageDescription()


def heif_image_description_release(desc) -> None:
    pass


def heif_image_description_add_component(desc: ImageDescription,
                                         component_type: str,
                                         name: str = "",
                                         datatype: str = "unsigned",
                                         bit_depth: int = 8) -> int:
    cid = len(desc.components)
    desc.add(ComponentDescription(component_id=cid,
                                  component_type=component_type,
                                  name=name, datatype=datatype,
                                  bit_depth=bit_depth))
    return cid


def heif_image_description_get_number_of_components(
        desc: ImageDescription) -> int:
    return len(desc.components)


def heif_image_description_get_component(desc: ImageDescription,
                                         idx: int
                                         ) -> ComponentDescription:
    if not 0 <= idx < len(desc.components):
        raise HeifError.usage(msg=f"bad component index {idx}")
    return desc.components[idx]


# ---------------------------------------------------------- accessors

def heif_component_description_get_id(comp) -> int:
    return comp.component_id


def heif_component_description_get_type(comp) -> str:
    return comp.component_type


def heif_component_description_get_name(comp) -> str:
    return comp.name


def heif_component_description_get_datatype(comp) -> str:
    return comp.datatype


def heif_component_description_get_bit_depth(comp) -> int:
    return comp.bit_depth


def heif_component_description_get_channel(comp) -> Optional[str]:
    return comp.channel


# ------------------------------------------------------- image / handle

def heif_image_get_image_description(img) -> ImageDescription:
    """Description of a decoded image's channels (attached by the item
    layer, or derived from the channel list)."""
    desc = getattr(img, "image_description", None)
    if desc is not None:
        return desc
    return ImageDescription.for_image(img)


def heif_image_set_image_description(img, desc: ImageDescription) -> None:
    img.image_description = desc


def heif_image_handle_get_image_description(handle: heif_image_handle
                                            ) -> ImageDescription:
    item = handle.item
    f = getattr(item, "component_descriptions", None)
    if f is not None:
        got = f() if callable(f) else f
        if got:
            return got
    # derive from pixi/item structure
    desc = ImageDescription()
    from ..boxes.meta import Box_pixi
    pixi = handle.ctx.file.get_property(handle.item_id, Box_pixi)
    bits = pixi.bits_per_channel if pixi else []
    names = (["Y", "Cb", "Cr"] if len(bits) == 3 else
             ["monochrome"] if len(bits) == 1 else
             [f"c{i}" for i in range(len(bits))])
    for i, b in enumerate(bits):
        desc.add(ComponentDescription(component_id=i, name=names[i],
                                      component_type=names[i]
                                      if names[i] in ("Y", "Cb", "Cr",
                                                      "monochrome")
                                      else ComponentType.Custom,
                                      bit_depth=b))
    return desc
