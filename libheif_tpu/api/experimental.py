"""Experimental API (ref: api/libheif/heif_experimental.h, 18 fns).

Dynamically-tiled (tili) images and multi-resolution pyramid groups
(ref: heif_experimental.h:120-146 tiled params, :153+ pyramids →
tiled.cc, Box_pymd box.h:1217).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ..boxes.meta import Box_pymd, PymdLayerInfo
from .image_handle import heif_image_handle
from .tiling import heif_context_add_tiled_image  # noqa: F401 re-export


@dataclass
class heif_tiled_image_parameters:
    """(ref: heif_tiled_image_parameters heif_experimental.h:120)."""

    version: int = 1
    image_width: int = 0
    image_height: int = 0
    tile_width: int = 0
    tile_height: int = 0
    compression_format_fourcc: str = "unci"
    offset_field_length: int = 40
    size_field_length: int = 24
    number_of_extra_dimensions: int = 0
    extra_dimensions: List[int] = field(default_factory=list)
    tiles_are_sequential: bool = False


def heif_tiled_image_parameters_alloc() -> heif_tiled_image_parameters:
    return heif_tiled_image_parameters()


def heif_tiled_image_parameters_release(params) -> None:
    pass


@dataclass
class heif_pyramid_layer_info:
    """(ref: heif_pyramid_layer_info heif_experimental.h:155)."""

    layer_image_id: int = 0
    layer_binning: int = 1
    tile_rows_in_layer: int = 0
    tile_columns_in_layer: int = 0


def heif_context_add_pyramid_entity_group(ctx,
                                          layer_item_ids: List[int]
                                          ) -> int:
    """Group multi-resolution layers into a 'pymd' entity group
    (ref: heif_context_add_pyramid_entity_group, context.h:179).
    Layers must be ordered from smallest to largest resolution."""
    f = ctx.file
    if f.grpl is None:
        from ..boxes.meta import Box_grpl
        f.grpl = Box_grpl()
        f.meta.children.append(f.grpl)
    pymd = Box_pymd()
    pymd.group_id = f.next_group_id() if hasattr(f, "next_group_id") \
        else max([getattr(g, "group_id", 0)
                  for g in f.grpl.children] + [max(f.item_ids or [0])]) + 1
    pymd.entity_ids = list(layer_item_ids)
    largest = ctx.get_item(layer_item_ids[-1])
    lw, lh = largest.width_height()
    tiling = None
    try:
        tiling = ctx.get_image_tiling(layer_item_ids[-1])
    except Exception:  # noqa: BLE001  non-tiled layers are allowed
        pass
    pymd.tile_size_x = tiling.tile_width if tiling else lw
    pymd.tile_size_y = tiling.tile_height if tiling else lh
    for iid in layer_item_ids:
        item = ctx.get_item(iid)
        w, h = item.width_height()
        info = PymdLayerInfo()
        info.layer_binning = max(1, lw // max(w, 1))
        try:
            t = ctx.get_image_tiling(iid)
            info.tiles_in_layer_row_minus1 = max(0, t.num_rows - 1)
            info.tiles_in_layer_column_minus1 = max(0, t.num_columns - 1)
        except Exception:  # noqa: BLE001
            info.tiles_in_layer_row_minus1 = 0
            info.tiles_in_layer_column_minus1 = 0
        pymd.layer_infos.append(info)
    f.grpl.children.append(pymd)
    return pymd.group_id


def heif_context_get_pyramid_entity_group_info(ctx, group_id: int
                                               ) -> List[
                                                   heif_pyramid_layer_info]:
    """(ref: heif_context_get_pyramid_entity_group_info)."""
    f = ctx.file
    if f.grpl is None:
        return []
    for g in f.grpl.children:
        if getattr(g, "group_id", None) == group_id and \
                g.box_type == "pymd":
            out = []
            for iid, info in zip(g.entity_ids, g.layer_infos):
                out.append(heif_pyramid_layer_info(
                    layer_image_id=iid,
                    layer_binning=info.layer_binning,
                    tile_rows_in_layer=info.tiles_in_layer_row_minus1 + 1,
                    tile_columns_in_layer=(
                        info.tiles_in_layer_column_minus1 + 1)))
            return out
    return []


def heif_pyramid_layer_info_release(infos) -> None:
    pass
