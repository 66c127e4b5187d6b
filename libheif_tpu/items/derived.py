"""Derived image items: grid, overlay, identity.

Re-designed equivalents of the reference's derived-image logic
(reference: libheif/image-items/grid.{h,cc} — ImageGrid grid.h:31,
ImageItem_Grid grid.h:77, parallel tile decode grid.cc:285-453;
overlay.{h,cc} — ImageOverlay overlay.cc:76; iden.{h,cc} iden.h:31).

TPU note: the reference fans tiles out over a 4-thread std::async pool;
here each tile decode is itself a batched device program and the paste
is a host scatter.  The fully-batched single-program grid path for unci
grids lives in parallel/grid_decode.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Set, Tuple

import numpy as np

from ..core.bitstream import ByteReader, ByteWriter
from ..core.error import HeifError, SubError
from ..image.pixel_image import (
    PixelImage, Channel, Colorspace, Chroma, subsampled_size,
)
from ..color import convert_image
from .item import ImageItem, register_item, DecodingOptions


@dataclass
class ImageGrid:
    """Grid payload (ref: ImageGrid::parse grid.cc:30)."""

    rows: int = 1
    columns: int = 1
    output_width: int = 0
    output_height: int = 0

    @staticmethod
    def parse(data: bytes) -> "ImageGrid":
        if len(data) < 8:
            raise HeifError.invalid_input(SubError.Invalid_grid_data,
                                          "less than 8 bytes of grid data")
        version = data[0]
        if version != 0:
            raise HeifError.unsupported(SubError.Unsupported_data_version,
                                        f"grid version {version}")
        flags = data[1]
        g = ImageGrid(rows=data[2] + 1, columns=data[3] + 1)
        r = ByteReader(data, 4)
        if flags & 1:
            if len(data) < 12:
                raise HeifError.invalid_input(SubError.Invalid_grid_data,
                                              "grid data incomplete")
            g.output_width = r.read32()
            g.output_height = r.read32()
        else:
            g.output_width = r.read16()
            g.output_height = r.read16()
        return g

    def write(self) -> bytes:
        w = ByteWriter()
        long_fields = self.output_width > 0xFFFF or self.output_height > 0xFFFF
        w.write8(0)
        w.write8(1 if long_fields else 0)
        w.write8(self.rows - 1)
        w.write8(self.columns - 1)
        if long_fields:
            w.write32(self.output_width)
            w.write32(self.output_height)
        else:
            w.write16(self.output_width)
            w.write16(self.output_height)
        return w.data()


def _auto_device_grid(n_tiles: int) -> bool:
    """Device-grid heuristic: on a TPU backend the batched wavefront
    decode wins once the tile batch is large enough to fill the chip;
    on CPU backends the threaded host engines win.  Override with
    LIBHEIF_TPU_AUTO_DEVICE_GRID=0/1."""
    import os
    ov = os.environ.get("LIBHEIF_TPU_AUTO_DEVICE_GRID")
    if ov is not None:
        return ov not in ("0", "false", "")
    if n_tiles < 16:
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:   # noqa: BLE001 — no jax, no device
        return False


@register_item("grid")
class ImageItem_Grid(ImageItem):
    """(ref: ImageItem_Grid grid.h:77)."""

    def grid_spec(self) -> ImageGrid:
        return ImageGrid.parse(self.file.get_item_data(self.item_id))

    def tile_item_ids(self) -> List[int]:
        refs = self.file.get_references_from(self.item_id, "dimg")
        if not refs:
            raise HeifError.invalid_input(SubError.Missing_grid_images,
                                          "grid has no dimg references")
        return refs[0].to_item_ids

    def decode_compressed_image(self, options: DecodingOptions,
                                processed_ids: Set[int]) -> PixelImage:
        """(ref: decode_full_grid_image grid.cc:285)."""
        grid = self.grid_spec()
        tile_ids = self.tile_item_ids()
        if len(tile_ids) != grid.rows * grid.columns:
            raise HeifError.invalid_input(
                SubError.Invalid_grid_data,
                f"grid needs {grid.rows * grid.columns} tiles, has "
                f"{len(tile_ids)}")
        self.ctx.limits.check_image_size(grid.output_width, grid.output_height)
        self.ctx.limits.check_tile_count(grid.columns, grid.rows)

        # batched device fast path: all-hvc1 / all-av01 grids
        # reconstruct as ONE device program over the tile batch
        # (parallel/coded_grid.py — the TPU analog of the reference's
        # thread pool, grid.cc:285).  Heuristic: on a TPU backend, big
        # grids go to the device automatically; small grids and CPU
        # backends stay on the host thread pool.
        import os as _os
        want_device = options.prefer_device_grid or _auto_device_grid(
            len(tile_ids))
        if want_device or \
                _os.environ.get("LIBHEIF_TPU_HEVC_ENGINE") == "device":
            from ..parallel.coded_grid import try_batched_hevc_grid
            fast = try_batched_hevc_grid(self, grid, tile_ids, options,
                                         processed_ids)
            if fast is not None:
                return fast
        if want_device or \
                _os.environ.get("LIBHEIF_TPU_AV1_ENGINE") == "device":
            from ..parallel.coded_grid import try_batched_av1_grid
            fast = try_batched_av1_grid(self, grid, tile_ids, options,
                                        processed_ids)
            if fast is not None:
                return fast

        # default host path: decode tiles on a thread pool (the native
        # engines release the GIL, giving real parallelism — the analog
        # of the reference's std::async fan-out, grid.cc:285-453), then
        # compose in grid order
        n_total = len(tile_ids)
        n_threads = options.max_decoding_threads
        if n_threads is None:
            n_threads = getattr(self.ctx, "max_decoding_threads", 4) or 1
        n_threads = max(1, min(n_threads, _os.cpu_count() or 1, n_total))
        # prefetch item objects serially: ctx.get_item lazily builds the
        # item graph and is not thread-safe
        items = []
        for tid in tile_ids:
            try:
                items.append(self.ctx.get_item(tid))
            except HeifError as e:
                if options.strict_decoding:
                    raise
                items.append(e)

        def _decode_one(it):
            if isinstance(it, HeifError):
                return it
            if options.cancel is not None and options.cancel():
                return HeifError(code=12)  # Canceled
            try:
                return it.decode_image(options, processed_ids)
            except HeifError as e:
                return e

        if n_threads > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=n_threads) as ex:
                results = list(ex.map(_decode_one, items))
        else:
            results = [_decode_one(it) for it in items]
        if options.cancel is not None and options.cancel():
            raise HeifError(code=12)

        out: Optional[PixelImage] = None
        tile_w = tile_h = 0
        for idx, tile_img in enumerate(results):
            ty, tx = divmod(idx, grid.columns)
            if isinstance(tile_img, HeifError):
                # non-strict mode: skip missing tiles with a warning
                # (ref: grid.cc:323-348)
                if options.strict_decoding or out is None:
                    raise tile_img
                out.add_warning(tile_img)
                continue
            if out is None:
                tile_w, tile_h = tile_img.width, tile_img.height
                out = PixelImage(grid.output_width, grid.output_height,
                                 tile_img.colorspace, tile_img.chroma,
                                 self.ctx.limits)
                for ch in tile_img.channels():
                    out.add_plane(ch, bit_depth=tile_img.bit_depth(ch))
            out.copy_into(tile_img, tx * tile_w, ty * tile_h)
            if options.on_progress is not None:
                options.on_progress(idx + 1, n_total)
        if out is None:
            raise HeifError.invalid_input(SubError.Missing_grid_images,
                                          "no grid tile could be decoded")
        return out

    def get_tiling(self):
        from ..option_types import ImageTiling
        grid = self.grid_spec()
        tile_ids = self.tile_item_ids()
        tw = th = 0
        if tile_ids:
            t0 = self.ctx.get_item(tile_ids[0])
            sz = t0.ispe_size
            if sz:
                tw, th = sz
        return ImageTiling(num_columns=grid.columns, num_rows=grid.rows,
                           tile_width=tw, tile_height=th,
                           image_width=grid.output_width,
                           image_height=grid.output_height)

    def decode_tile(self, tile_x: int, tile_y: int,
                    options: Optional[DecodingOptions] = None) -> PixelImage:
        """Single referenced tile decode (ref: context.cc:1425
        decode_only_tile path)."""
        grid = self.grid_spec()
        tile_ids = self.tile_item_ids()
        if tile_x >= grid.columns or tile_y >= grid.rows:
            raise HeifError.usage(SubError.Invalid_parameter_value,
                                  "tile coordinates out of range")
        tid = tile_ids[tile_y * grid.columns + tile_x]
        return self.ctx.get_item(tid).decode_image(options)


@dataclass
class ImageOverlay:
    """Overlay payload (ref: ImageOverlay::parse overlay.cc:76)."""

    version: int = 0
    background_rgba: Tuple[int, int, int, int] = (0, 0, 0, 0)  # 16-bit each
    width: int = 0
    height: int = 0
    offsets: List[Tuple[int, int]] = field(default_factory=list)

    @staticmethod
    def parse(num_images: int, data: bytes) -> "ImageOverlay":
        if len(data) < 2 + 4 * 2:
            raise HeifError.invalid_input(SubError.Invalid_overlay_data,
                                          "overlay data incomplete")
        version = data[0]
        if version != 0:
            raise HeifError.unsupported(SubError.Unsupported_data_version,
                                        f"overlay version {version}")
        flags = data[1]
        field_len = 4 if (flags & 1) else 2
        need = 2 + 4 * 2 + 2 * field_len + num_images * 2 * field_len
        if len(data) < need:
            raise HeifError.invalid_input(SubError.Invalid_overlay_data,
                                          "overlay data incomplete")
        r = ByteReader(data, 2)
        bg = tuple(r.read16() for _ in range(4))
        if field_len == 4:
            w, h = r.read32(), r.read32()
        else:
            w, h = r.read16(), r.read16()
        if w == 0 or h == 0:
            raise HeifError.invalid_input(SubError.Invalid_overlay_data,
                                          "overlay with zero size")
        ov = ImageOverlay(version, bg, w, h)
        for _ in range(num_images):
            if field_len == 4:
                ov.offsets.append((r.read32s(), r.read32s()))
            else:
                ov.offsets.append((r.read16s(), r.read16s()))
        return ov

    def write(self) -> bytes:
        long_fields = (self.width > 0xFFFF or self.height > 0xFFFF or
                       any(not (-32768 <= v <= 0x7FFF)
                           for off in self.offsets for v in off))
        w = ByteWriter()
        w.write8(0)
        w.write8(1 if long_fields else 0)
        for c in self.background_rgba:
            w.write16(c)
        if long_fields:
            w.write32(self.width)
            w.write32(self.height)
        else:
            w.write16(self.width)
            w.write16(self.height)
        for x, y in self.offsets:
            if long_fields:
                w.write32s(x)
                w.write32s(y)
            else:
                w.write16s(x)
                w.write16s(y)
        return w.data()


@register_item("iovl")
class ImageItem_Overlay(ImageItem):
    """(ref: ImageItem_Overlay overlay.h:87)."""

    def overlay_spec(self):
        refs = self.file.get_references_from(self.item_id, "dimg")
        if not refs:
            raise HeifError.invalid_input(SubError.Invalid_overlay_data,
                                          "overlay has no dimg references")
        ids = refs[0].to_item_ids
        ov = ImageOverlay.parse(len(ids), self.file.get_item_data(self.item_id))
        return ov, ids

    def decode_compressed_image(self, options: DecodingOptions,
                                processed_ids: Set[int]) -> PixelImage:
        """Overlay composition with background color and alpha blending
        (ref: ImageItem_Overlay::render_overlay, overlay.cc)."""
        import jax.numpy as jnp
        ov, ids = self.overlay_spec()
        self.ctx.limits.check_image_size(ov.width, ov.height)

        # background canvas in RGB(16-bit colors scaled to 8)
        bg = [c >> 8 for c in ov.background_rgba]
        out = PixelImage(ov.width, ov.height, Colorspace.RGB, Chroma.C444,
                         self.ctx.limits)
        canvas = {
            Channel.R: np.full((ov.height, ov.width), bg[0], np.uint8),
            Channel.G: np.full((ov.height, ov.width), bg[1], np.uint8),
            Channel.B: np.full((ov.height, ov.width), bg[2], np.uint8),
        }

        for (dx, dy), tid in zip(ov.offsets, ids):
            img = self.ctx.get_item(tid).decode_image(options, processed_ids)
            img = convert_image(img, Colorspace.RGB, Chroma.C444)
            iw, ih = img.width, img.height
            # clip to canvas (ref: overlay clipping; images may extend
            # outside the canvas)
            x0, y0 = max(dx, 0), max(dy, 0)
            x1, y1 = min(dx + iw, ov.width), min(dy + ih, ov.height)
            if x0 >= x1 or y0 >= y1:
                continue
            sx0, sy0 = x0 - dx, y0 - dy
            alpha = None
            if img.has_channel(Channel.Alpha):
                a = np.asarray(img.plane(Channel.Alpha)).astype(np.float32)
                alpha = (a / ((1 << img.bit_depth(Channel.Alpha)) - 1))[
                    sy0:sy0 + (y1 - y0), sx0:sx0 + (x1 - x0)]
            for ch in (Channel.R, Channel.G, Channel.B):
                src = np.asarray(img.plane(ch))[sy0:sy0 + (y1 - y0),
                                                sx0:sx0 + (x1 - x0)]
                dst = canvas[ch][y0:y1, x0:x1]
                if alpha is None:
                    canvas[ch][y0:y1, x0:x1] = src
                else:
                    blended = src.astype(np.float32) * alpha + \
                        dst.astype(np.float32) * (1 - alpha)
                    canvas[ch][y0:y1, x0:x1] = np.clip(
                        np.round(blended), 0, 255).astype(np.uint8)
        for ch, arr in canvas.items():
            out.set_plane(ch, arr, 8)
        return out


@register_item("iden")
class ImageItem_iden(ImageItem):
    """Identity derivation (ref: iden.{h,cc} iden.h:31): decodes the
    referenced item; own transform properties then apply on top."""

    def decode_compressed_image(self, options: DecodingOptions,
                                processed_ids: Set[int]) -> PixelImage:
        refs = self.file.get_references_from(self.item_id, "dimg")
        if not refs or len(refs[0].to_item_ids) != 1:
            raise HeifError.invalid_input(
                msg="'iden' item must reference exactly one image")
        src = self.ctx.get_item(refs[0].to_item_ids[0])
        # decode referenced image including its own transforms, then this
        # item's transforms apply in decode_image()
        return src.decode_image(options, processed_ids)
