"""HeifContext: the semantic image model over a parsed file.

Re-designed equivalent of the reference's HeifContext (reference:
libheif/context.{h,cc} — HeifContext context.h:65,
interpret_heif_file_images context.cc:584, decode orchestration
context.cc:1425, encode context.cc:1600, write context.cc:382).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .core.error import HeifError, ErrorCode, SubError
from .core.limits import SecurityLimits
from .file import HeifFile
from .boxes.meta import (
    Box_ispe, Box_pixi, Box_auxC, Box_colr, Box_irot, Box_imir, Box_clap,
    Box_udes, Box_infe,
)
from .boxes.unc import Box_uncC, Box_cmpd, Box_cmpC, Box_icef
from .image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from .color import convert_image
from .color.nclx import NclxProfile
from .items import ImageItem, ImageItem_Error, DecodingOptions, alloc_item
from .items.item import ITEM_REGISTRY
from .option_types import EncodingOptions, ImageTiling


class HeifContext:
    """Top-level engine object (mirrors heif_context)."""

    def __init__(self, limits: Optional[SecurityLimits] = None):
        self.limits = limits or SecurityLimits()
        self.file: Optional[HeifFile] = None
        self.items: Dict[int, ImageItem] = {}
        self.primary_id: Optional[int] = None
        self.max_decoding_threads = 4  # ref: context.h:72 (batching hint)
        self._tracks = None
        self._track_writers = []
        self._pending_region_items = []
        self._sequence_timescale = 90000
        self._sequence_repetitions = 1

    # ================================================================ read

    @staticmethod
    def read_from_file(path: str,
                       limits: Optional[SecurityLimits] = None) -> "HeifContext":
        ctx = HeifContext(limits)
        ctx.file = HeifFile.from_file(path, ctx.limits)
        ctx._interpret()
        return ctx

    @staticmethod
    def read_from_bytes(data: bytes,
                        limits: Optional[SecurityLimits] = None) -> "HeifContext":
        ctx = HeifContext(limits)
        ctx.file = HeifFile.from_bytes(data, ctx.limits)
        ctx._interpret()
        return ctx

    @staticmethod
    def read_from_reader(reader,
                         limits: Optional[SecurityLimits] = None
                         ) -> "HeifContext":
        """Progressive open over a streaming reader: structural boxes
        only; item/tile reads request exact byte ranges on demand
        (ref: heif_context_read_from_reader + heif_reader v2,
        heif_context.h:164-231)."""
        ctx = HeifContext(limits)
        ctx.file = HeifFile.from_reader(reader, ctx.limits)
        ctx._interpret()
        return ctx

    # ============================================================ sequences

    @property
    def tracks(self):
        """Sequence tracks (ref: heif_context_number_of_sequence_tracks /
        interpret_heif_file_sequences context.cc:2044)."""
        if self._tracks is None:
            from .sequences import interpret_tracks
            self._tracks = interpret_tracks(self.file) \
                if self.file is not None else []
        return self._tracks

    def get_track(self, track_id: int):
        for t in self.tracks:
            if t.track_id == track_id:
                return t
        return None

    def has_sequence(self) -> bool:
        """(ref: heif_context_has_sequence)."""
        return len(self.tracks) > 0 or bool(self._track_writers)

    def sequence_timescale(self) -> int:
        """mvhd timescale (ref: heif_context_get_sequence_timescale)."""
        moov = self.file.top_level_box("moov") if self.file else None
        mvhd = moov.get_child("mvhd") if moov else None
        if mvhd is not None:
            return mvhd.timescale
        return self._sequence_timescale

    def sequence_duration(self) -> int:
        """mvhd duration in movie units
        (ref: heif_context_get_sequence_duration)."""
        moov = self.file.top_level_box("moov") if self.file else None
        mvhd = moov.get_child("mvhd") if moov else None
        return mvhd.duration if mvhd is not None else 0

    def set_sequence_timescale(self, timescale: int) -> None:
        self._sequence_timescale = timescale

    def set_number_of_sequence_repetitions(self, repetitions: int) -> None:
        """0xFFFFFFFF = repeat indefinitely
        (ref: heif_context_set_number_of_sequence_repetitions)."""
        self._sequence_repetitions = repetitions

    def add_visual_track(self, width: int, height: int, fmt: str = "hevc",
                         timescale: int = 0, options=None,
                         handler: str = "vide", aux_type_urn=None):
        """Start a new visual sequence track
        (ref: heif_context_add_visual_sequence_track)."""
        from .sequences.track import VisualTrackWriter, TrackOptions
        if self.file is None:
            self.new_file()
        if options is None:
            options = TrackOptions(
                timescale=timescale or self._sequence_timescale)
        elif timescale:
            options.timescale = timescale
        tw = VisualTrackWriter(self.file, width, height, fmt,
                               options.timescale,
                               track_id=self._next_track_id(),
                               options=options, handler=handler,
                               aux_type_urn=aux_type_urn)
        self._track_writers.append(tw)
        return tw

    def add_uri_metadata_track(self, uri: str, timescale: int = 0,
                               options=None):
        """(ref: heif_context_add_uri_metadata_sequence_track)."""
        from .sequences.track import MetadataTrackWriter, TrackOptions
        if self.file is None:
            self.new_file()
        if options is None:
            options = TrackOptions(
                timescale=timescale or self._sequence_timescale)
        elif timescale:
            options.timescale = timescale
        tw = MetadataTrackWriter(self.file, uri,
                                 timescale=options.timescale,
                                 track_id=self._next_track_id(),
                                 options=options)
        self._track_writers.append(tw)
        return tw

    def _next_track_id(self) -> int:
        used = {tw.track_id for tw in self._track_writers}
        tid = 1
        while tid in used:
            tid += 1
        return tid

    def _finalize_tracks(self) -> None:
        if not self._track_writers:
            return
        from .boxes.seq import Box_moov, Box_mvhd, Box_edts, Box_elst
        moov = Box_moov()
        mvhd = Box_mvhd()
        mvhd.timescale = self._sequence_timescale or \
            self._track_writers[0].timescale
        track_durations = []
        for tw in self._track_writers:
            dur = sum(tw.sample_durations)
            # movie units = media units * movie_timescale / media_timescale
            track_durations.append(
                dur * mvhd.timescale // max(1, tw.timescale))
        base_duration = max(track_durations, default=0)
        reps = self._sequence_repetitions
        if reps == 0xFFFFFFFF:
            mvhd.duration = 0xFFFFFFFFFFFFFFFF   # indefinite sentinel
        else:
            mvhd.duration = base_duration * max(1, reps)
        mvhd.next_track_id = max((tw.track_id
                                  for tw in self._track_writers),
                                 default=0) + 1
        moov.children.append(mvhd)
        for tw, movie_dur in zip(self._track_writers, track_durations):
            trak = tw.finalize()
            if reps != 1:
                # edit-list repeat (ref: track.cc:912
                # enable_edit_list_repeat_mode)
                edts = Box_edts()
                elst = Box_elst()
                elst.flags |= 1   # repeat mode
                elst.entries = [(sum(tw.sample_durations), 0, 1, 0)]
                edts.children.append(elst)
                trak.children.append(edts)
            moov.children.append(trak)
        self.file.moov = moov

    def _interpret(self) -> None:
        """Build the item graph (ref: interpret_heif_file context.cc:564)."""
        if self.file.mini is not None and self.file.meta is None:
            self._interpret_mini()
            return
        f = self.file
        for item_id in f.item_ids:
            infe = f.get_infe(item_id)
            try:
                item = alloc_item(self, item_id, infe.item_type)
            except HeifError as e:
                item = ImageItem_Error(self, item_id, infe.item_type, e)
            item.is_hidden = infe.hidden
            self.items[item_id] = item

        try:
            self.primary_id = f.primary_item_id
        except HeifError:
            self.primary_id = None
        if self.primary_id in self.items:
            self.items[self.primary_id].is_primary = True

        # --- link aux images via iref (ref: context.cc:800+)
        for item_id, item in self.items.items():
            # thumbnails: 'thmb' ref from thumbnail to master
            for ref in f.get_references_from(item_id, "thmb"):
                item.is_thumbnail = True
                for master_id in ref.to_item_ids:
                    m = self.items.get(master_id)
                    if m is not None:
                        m.thumbnails.append(item)
            # aux images: 'auxl' ref from aux item to master
            for ref in f.get_references_from(item_id, "auxl"):
                item.is_aux = True
                auxC = f.get_property(item_id, Box_auxC)
                for master_id in ref.to_item_ids:
                    m = self.items.get(master_id)
                    if m is None:
                        continue
                    if auxC is not None and auxC.is_alpha():
                        m.alpha_item = item
                        # premultiplied alpha: 'prem' ref master→alpha
                        for pref in f.get_references_from(master_id, "prem"):
                            if item_id in pref.to_item_ids:
                                m.premultiplied_alpha = True
                    elif auxC is not None and auxC.is_depth():
                        m.depth_item = item
                    else:
                        m.aux_items.append(item)
            # metadata: 'cdsc' ref from metadata item to image
            infe = f.get_infe(item_id)
            if infe.item_type in ("Exif", "mime", "uri "):
                for ref in f.get_references_from(item_id, "cdsc"):
                    for target in ref.to_item_ids:
                        m = self.items.get(target)
                        if m is None:
                            continue
                        m.metadata.append({
                            "item_id": item_id,
                            "item_type": infe.item_type,
                            "content_type": infe.content_type,
                            "item_uri_type": infe.item_uri_type,
                        })

    def _interpret_mini(self) -> None:
        """Synthesize the item model from a 'mini' box
        (ref: Box_mini::create_expanded_boxes mini.h:40 — the reference
        expands into real boxes; we create items directly)."""
        from .items.mini_item import make_mini_items
        make_mini_items(self)

    # ---------------------------------------------------------------- query

    def get_item(self, item_id: int) -> ImageItem:
        item = self.items.get(item_id)
        if item is None:
            raise HeifError.usage(SubError.Nonexisting_item_referenced,
                                  f"item {item_id} does not exist")
        return item

    @property
    def primary_item_id(self) -> int:
        if self.primary_id is None:
            raise HeifError(ErrorCode.Invalid_input,
                            SubError.No_or_invalid_primary_item)
        return self.primary_id

    def top_level_image_ids(self) -> List[int]:
        """(ref: heif_context_get_list_of_top_level_image_IDs)."""
        return [i for i, item in self.items.items()
                if item.is_image_item and not item.is_thumbnail
                and not item.is_aux and not item.is_hidden
                and item.item_type not in ("Exif", "mime", "uri ", "rgan",
                                           "txti")]

    def get_image_info(self, item_id: int) -> dict:
        item = self.get_item(item_id)
        w, h = item.width_height()
        return {
            "id": item_id,
            "type": item.item_type,
            "width": w,
            "height": h,
            "has_alpha": item.alpha_item is not None,
            "has_depth": item.depth_item is not None,
            "is_primary": item.is_primary,
            "thumbnails": [t.item_id for t in item.thumbnails],
            "luma_bits_per_pixel": item.luma_bits_per_pixel(),
        }

    # ---------------------------------------------------------------- decode

    def decode_image(self, item_id: Optional[int] = None,
                     colorspace: str = Colorspace.Undefined,
                     chroma: str = Chroma.Undefined,
                     options: Optional[DecodingOptions] = None) -> PixelImage:
        """(ref: HeifContext::decode_image context.cc:1425 +
        convert_to_output_colorspace context.cc:1515)."""
        if item_id is None:
            item_id = self.primary_item_id
        item = self.get_item(item_id)
        img = item.decode_image(options)
        img = self._convert_output(img, colorspace, chroma, options)
        return img

    def decode_tile(self, item_id: int, tile_x: int, tile_y: int,
                    colorspace: str = Colorspace.Undefined,
                    chroma: str = Chroma.Undefined,
                    options: Optional[DecodingOptions] = None) -> PixelImage:
        """(ref: heif_image_handle_decode_image_tile heif_tiling.h:86)."""
        item = self.get_item(item_id)
        img = item.decode_tile(tile_x, tile_y, options)
        return self._convert_output(img, colorspace, chroma, options)

    def _convert_output(self, img, colorspace, chroma, options):
        opts = options or DecodingOptions()
        target_bits = 8 if opts.convert_hdr_to_8bit else 0
        conv = getattr(opts, "color_conversion_options", None)
        flatten = (conv is not None and
                   getattr(conv, "alpha_composition_mode", "none") != "none"
                   and img.has_alpha())
        needs = ((colorspace != Colorspace.Undefined and
                  img.colorspace != colorspace) or
                 (chroma != Chroma.Undefined and img.chroma != chroma) or
                 flatten or
                 (target_bits and any(img.bit_depth(c) != 8
                                      for c in img.channels())))
        if needs:
            if flatten and colorspace == Colorspace.Undefined:
                colorspace = img.colorspace
            if flatten and chroma == Chroma.Undefined:
                chroma = img.chroma
            img = convert_image(img, colorspace, chroma,
                                target_has_alpha=False if flatten else None,
                                target_bits=target_bits,
                                options=conv)
        return img

    def get_image_tiling(self, item_id: int) -> ImageTiling:
        return self.get_item(item_id).get_tiling()

    # -------------------------------------------------------------- metadata

    def get_metadata_blocks(self, item_id: int,
                            type_filter: str = "") -> List[dict]:
        item = self.get_item(item_id)
        out = []
        for md in item.metadata:
            if type_filter and md["item_type"] != type_filter:
                continue
            entry = dict(md)
            if "data" not in entry:  # mini items carry data inline
                entry["data"] = self.file.get_item_data(md["item_id"])
            out.append(entry)
        return out

    def get_exif(self, item_id: int) -> Optional[bytes]:
        """Exif payload with the 4-byte TIFF-offset header stripped
        (ref: heif_metadata.h exif access)."""
        for md in self.get_metadata_blocks(item_id, "Exif"):
            data = md["data"]
            if len(data) >= 4:
                offset = int.from_bytes(data[:4], "big")
                if 4 + offset <= len(data):
                    return data[4 + offset:]
            return data
        return None

    def get_xmp(self, item_id: int) -> Optional[bytes]:
        for md in self.get_metadata_blocks(item_id, "mime"):
            if md.get("content_type") in ("application/rdf+xml",):
                return md["data"]
        return None

    # ================================================================ encode

    def new_file(self, major_brand: str = "mif1") -> None:
        self.file = HeifFile(self.limits)
        self.file.init_for_writing(major_brand, ["mif1", "heic", "miaf"])

    def encode_image(self, img: PixelImage, fmt: str = "unci",
                     options: Optional[EncodingOptions] = None) -> int:
        """Encode an image as a new item; returns the item id
        (ref: HeifContext::encode_image context.cc:1600)."""
        options = options or EncodingOptions()
        if self.file is None:
            self.new_file()

        if fmt == "unci":
            item_id = self._encode_unci(img, options)
        elif fmt == "mski":
            item_id = self._encode_mask(img, options)
        else:
            from .codecs import registry
            enc = registry.get_encoder(fmt)
            if enc is None:
                raise HeifError.unsupported(
                    SubError.Unsupported_codec,
                    f"no encoder available for format {fmt!r}")
            item_id = self._encode_coded(img, enc, fmt, options)

        # alpha channel → separate aux item (ref: context.cc:1669-1708)
        if img.has_channel(Channel.Alpha) and options.save_alpha_channel and \
                fmt != "mski":
            alpha_id = self._encode_alpha_aux(img, fmt, options)
            self.file.add_reference("auxl", alpha_id, [item_id])
            aux_infe = self.file.get_infe(alpha_id)
            aux_infe.hidden = True
            if img.premultiplied_alpha:
                self.file.add_reference("prem", item_id, [alpha_id])

        if self.primary_id is None:
            self.set_primary_item(item_id)
        return item_id

    def _register_encoded_item(self, item_type: str) -> int:
        infe = self.file.add_new_item(item_type)
        item = alloc_item(self, infe.item_id, item_type)
        self.items[infe.item_id] = item
        return infe.item_id

    def _add_common_props(self, item_id: int, img: PixelImage,
                          options: EncodingOptions) -> None:
        self.file.add_property(item_id, Box_ispe(img.width, img.height), False)
        bits = [img.bit_depth(c) for c in img.channels()
                if c != Channel.Alpha]
        if bits:
            self.file.add_property(item_id, Box_pixi(bits), False)
        nclx = options.output_nclx or img.color_profile_nclx
        if nclx is not None:
            self.file.add_property(item_id, nclx.to_colr_box(), False)
        if img.color_profile_icc:
            from .boxes.meta import Box_colr
            b = Box_colr()
            b.colour_type = "prof"
            b.icc_profile = img.color_profile_icc
            self.file.add_property(item_id, b, False)

    def _encode_unci(self, img: PixelImage, options: EncodingOptions) -> int:
        from .codecs.unc import UnciEncoder
        enc = UnciEncoder(options.tile_cols, options.tile_rows,
                          compression=options.compression)
        data, cmpd, uncC, cmpC, icef = enc.encode(img)
        item_id = self._register_encoded_item("unci")
        self.file.append_item_data(item_id, data)
        self._add_common_props(item_id, img, options)
        cpat = self._make_cpat_property(img, cmpd)
        self.file.add_property(item_id, cmpd, False)
        self.file.add_property(item_id, uncC, True)
        if cpat is not None:
            self.file.add_property(item_id, cpat, False)
        if cmpC is not None:
            self.file.add_property(item_id, cmpC, True)
        if icef is not None:
            self.file.add_property(item_id, icef, True)
        return item_id

    def _make_cpat_property(self, img: PixelImage, cmpd):
        """Resolve an image's Bayer pattern into reference cmpd
        components + a cpat box (ref: heif_image_set_bayer_pattern →
        encoder cpat resolution, unc_encoder.cc; plane-less 'bayer
        reference components', heif_image.h:174)."""
        pattern = getattr(img, "bayer_pattern", None)
        if pattern is None or not img.has_channel(Channel.FilterArray):
            return None
        from .boxes.unc import Box_cpat, CmpdComponent
        chan_to_type = {Channel.R: 4, Channel.G: 5, Channel.B: 6,
                        Channel.Y: 1}
        # append one plane-less reference component per distinct channel
        type_to_idx = {}
        for i, comp in enumerate(cmpd.components):
            type_to_idx.setdefault(comp.component_type, i)
        indices = []
        for ch in pattern.channels:
            ctype = chan_to_type.get(ch)
            if ctype is None:
                raise HeifError.usage(
                    msg=f"Bayer pattern cell {ch!r} has no component type")
            if ctype not in type_to_idx:
                type_to_idx[ctype] = len(cmpd.components)
                cmpd.components.append(CmpdComponent(ctype))
            indices.append(type_to_idx[ctype])
        cpat = Box_cpat()
        cpat.pattern_width = pattern.pattern_width
        cpat.pattern_height = pattern.pattern_height
        cpat.components = indices
        cpat.component_gains = list(pattern.gains)
        return cpat

    def _encode_mask(self, img: PixelImage, options: EncodingOptions) -> int:
        from .items.mask_item import Box_mskC
        import numpy as np
        if img.colorspace != Colorspace.Monochrome:
            raise HeifError.unsupported(
                SubError.Unsupported_image_type,
                "mask encoding requires monochrome input")
        plane = np.asarray(img.plane(Channel.Y))
        bpp = img.bit_depth(Channel.Y)
        data = (plane.astype(">u2") if bpp == 16
                else plane.astype(np.uint8)).tobytes()
        item_id = self._register_encoded_item("mski")
        self.file.append_item_data(item_id, data)
        self._add_common_props(item_id, img, options)
        self.file.add_property(item_id, Box_mskC(bpp), True)
        return item_id

    def _encode_coded(self, img, enc, fmt: str, options) -> int:
        data, config_box, extra = enc.encode_single_image(img, options)
        item_type = {"hevc": "hvc1", "av1": "av01", "vvc": "vvc1",
                     "avc": "avc1", "jpeg": "jpeg",
                     "jpeg2000": "j2k1", "htj2k": "j2k1"}.get(fmt, fmt)
        item_id = self._register_encoded_item(item_type)
        self.file.append_item_data(item_id, data)
        self._add_common_props(item_id, img, options)
        if config_box is not None:
            self.file.add_property(item_id, config_box, True)
        for prop, essential in (extra or []):
            self.file.add_property(item_id, prop, essential)
        return item_id

    def _encode_alpha_aux(self, img: PixelImage, fmt: str,
                          options: EncodingOptions) -> int:
        alpha = PixelImage(img.width, img.height, Colorspace.Monochrome,
                           Chroma.Monochrome, self.limits)
        alpha.set_plane(Channel.Y, img.plane(Channel.Alpha),
                        img.bit_depth(Channel.Alpha))
        opts2 = EncodingOptions(**{**options.__dict__,
                                   "save_alpha_channel": False})
        if fmt == "unci":
            alpha_id = self._encode_unci(alpha, opts2)
        else:
            # encode the alpha plane with the same coded codec
            # (ref: context.cc:1669 encode_image recursion)
            from .codecs import registry
            enc = registry.get_encoder(fmt)
            alpha_id = self._encode_coded(alpha, enc, fmt, opts2)
        self.file.add_property(
            alpha_id, Box_auxC("urn:mpeg:mpegB:cicp:systems:auxiliary:alpha"),
            False)
        return alpha_id

    def add_thumbnail(self, master_id: int, thumb_img: PixelImage,
                      fmt: str = "unci",
                      options: Optional[EncodingOptions] = None) -> int:
        """(ref: heif_context_encode_thumbnail / assign_thumbnail)."""
        thumb_id = self.encode_image(thumb_img, fmt, options)
        self.file.add_reference("thmb", thumb_id, [master_id])
        self.get_item(thumb_id).is_thumbnail = True
        self.get_item(master_id).thumbnails.append(self.get_item(thumb_id))
        return thumb_id

    def _link_metadata_item(self, infe, target_id: int) -> None:
        self.file.add_reference("cdsc", infe.item_id, [target_id])
        infe.hidden = True
        target = self.items.get(target_id)
        if target is not None:
            target.metadata.append({
                "item_id": infe.item_id,
                "item_type": infe.item_type,
                "content_type": infe.content_type,
                "item_uri_type": infe.item_uri_type,
            })

    def add_exif(self, item_id: int, exif: bytes) -> int:
        """(ref: heif_context_add_exif_metadata)."""
        infe = self.file.add_new_item("Exif")
        payload = (0).to_bytes(4, "big") + exif
        self.file.append_item_data(infe.item_id, payload)
        self._link_metadata_item(infe, item_id)
        return infe.item_id

    def add_xmp(self, item_id: int, xmp: bytes) -> int:
        infe = self.file.add_new_item("mime")
        infe.content_type = "application/rdf+xml"
        self.file.append_item_data(infe.item_id, xmp)
        self._link_metadata_item(infe, item_id)
        return infe.item_id

    # ---------------------------------------------------------------- regions

    def get_region_items(self, image_id: int):
        """Region annotations attached to an image via 'cdsc'
        (ref: heif_image_handle_get_list_of_region_item_ids)."""
        from .items.region_item import RegionItem
        out = []
        for ref in self.file.get_references_to(image_id, "cdsc"):
            rid = ref.from_item_id
            if self.file.get_infe(rid).item_type == "rgan":
                ri = RegionItem.parse(rid, self.file.get_item_data(rid))
                mask_ids = []
                for mref in self.file.get_references_from(rid, "mask"):
                    mask_ids.extend(mref.to_item_ids)
                for g in ri.regions:
                    if g.kind == "referenced_mask" and mask_ids:
                        g.mask_item_id = mask_ids.pop(0)
                out.append(ri)
        return out

    def add_region_item(self, image_id: int, reference_width: int,
                        reference_height: int):
        """Create an empty rgan item attached to an image; mutate the
        returned RegionItem's .regions, then call write()
        (ref: heif_image_handle_add_region_item)."""
        from .items.region_item import RegionItem
        infe = self.file.add_new_item("rgan")
        infe.hidden = True
        ri = RegionItem(infe.item_id, reference_width, reference_height)
        self.file.add_reference("cdsc", infe.item_id, [image_id])
        self._pending_region_items.append(ri)
        return ri

    # ------------------------------------------------------------------ text

    def get_text_items(self, image_id: int):
        """Text annotations attached via 'cdsc' (ref: text.h:31)."""
        from .items.text_item import TextItem
        out = []
        for ref in self.file.get_references_to(image_id, "cdsc"):
            tid = ref.from_item_id
            if self.file.get_infe(tid).item_type == "txti":
                out.append(TextItem.parse(tid,
                                          self.file.get_item_data(tid)))
        return out

    def add_text_item(self, image_id: int, text: str,
                      content_type: str = "text/plain") -> int:
        from .items.text_item import TextItem
        infe = self.file.add_new_item("txti")
        infe.hidden = True
        infe.content_type = content_type
        self.file.append_item_data(infe.item_id,
                                   TextItem(0, text).serialize())
        self.file.add_reference("cdsc", infe.item_id, [image_id])
        return infe.item_id

    def add_grid_image(self, tile_ids: List[int], output_width: int,
                       output_height: int, rows: int, columns: int) -> int:
        """Assemble already-encoded tiles into a grid item
        (ref: heif_context_add_grid_image heif_tiling.cc:270)."""
        from .items.derived import ImageGrid
        grid = ImageGrid(rows=rows, columns=columns,
                         output_width=output_width,
                         output_height=output_height)
        item_id = self._register_encoded_item("grid")
        # grid payload goes to idat (construction method 1), like the ref
        self.file.append_item_data(item_id, grid.write(), construction_method=1)
        self.file.add_reference("dimg", item_id, list(tile_ids))
        self.file.add_property(item_id,
                               Box_ispe(output_width, output_height), False)
        for tid in tile_ids:
            self.file.get_infe(tid).hidden = True
        return item_id

    def add_overlay_image(self, image_width: int, image_height: int,
                          image_ids: List[int],
                          offsets: Optional[List[Tuple[int, int]]] = None,
                          background_rgba=None) -> int:
        """Assemble already-encoded items into an 'iovl' overlay item
        (ref: heif_context_add_overlay_image heif_encoding.h:359).
        offsets are (x, y) per image; background_rgba is four 16-bit
        components (transparent when None). Returns the iovl item id."""
        from .items.derived import ImageOverlay
        if not image_ids:
            raise HeifError.usage(msg="overlay needs at least one image")
        offs = list(offsets or [(0, 0)] * len(image_ids))
        if len(offs) != len(image_ids):
            raise HeifError.usage(msg="offsets/image_ids length mismatch")
        ov = ImageOverlay()
        ov.width = image_width
        ov.height = image_height
        ov.background_rgba = tuple(background_rgba or (0, 0, 0, 0))
        ov.offsets = [tuple(o) for o in offs]
        item_id = self._register_encoded_item("iovl")
        self.file.append_item_data(item_id, ov.write(),
                                   construction_method=1)
        self.file.add_reference("dimg", item_id, list(image_ids))
        self.file.add_property(item_id,
                               Box_ispe(image_width, image_height), False)
        for tid in image_ids:
            self.file.get_infe(tid).hidden = True
        return item_id

    def add_tiled_image(self, image_width: int, image_height: int,
                        tile_width: int, tile_height: int,
                        fmt: str = "unci",
                        offset_field_length: int = 40,
                        size_field_length: int = 24) -> int:
        """Create an empty 'tili' dynamically-tiled image; append tiles
        with add_image_tile_to_tiled (ref: heif_context_add_tiled_image,
        heif_experimental.h:146 → ImageItem_Tiled::add_new_tiled_item
        tiled.cc:750).  Returns the tili item id."""
        from .items.tiled_item import ImageItem_Tiled
        from .boxes.tild import TiledImageParameters
        if self.file is None:
            self.new_file()
        params = TiledImageParameters(
            image_width=image_width, image_height=image_height,
            tile_width=tile_width, tile_height=tile_height,
            offset_field_length=offset_field_length,
            size_field_length=size_field_length)
        item = ImageItem_Tiled.add_new_tiled_item(self, params, fmt)
        if self.primary_id is None:
            self.set_primary_item(item.item_id)
        return item.item_id

    def add_image_tile_to_tiled(self, tili_id: int, tile_x: int,
                                tile_y: int, img: PixelImage,
                                options: Optional[EncodingOptions] = None
                                ) -> None:
        """Encode one tile into a tili item created by add_tiled_image
        (ref: ImageItem_Tiled::add_image_tile, tiled.cc:833)."""
        item = self.get_item(tili_id)
        item.add_image_tile(tile_x, tile_y, img, options)

    def set_primary_item(self, item_id: int) -> None:
        self.primary_id = item_id
        self.file.set_primary_item(item_id)
        for i, item in self.items.items():
            item.is_primary = (i == item_id)

    def set_write_mini_format(self, enable: bool) -> None:
        """Prefer the compact 'mini' format on write when the content
        is compatible (ref: heif_context_set_write_mini_format,
        heif_context.h:309)."""
        self._write_mini_format = bool(enable)
        if self.file is not None:
            self.file.write_mini_format = bool(enable)

    def write(self) -> bytes:
        if self.file is not None:
            self.file.write_mini_format = getattr(
                self, "_write_mini_format", False)
        self._finalize_tracks()
        self._finalize_region_items()
        self._finalize_brands()
        return self._write_impl()

    def _finalize_brands(self) -> None:
        """Recompute ftyp from content (ref: brands.cc write path)."""
        f = self.file
        if f is None or not f.created_for_writing or f.ftyp is None:
            return      # read-mode file: preserve original brands
        from .brands import compute_brands
        item_types = []
        primary_type = None
        for iid in f.item_ids:
            t = f.get_infe(iid).item_type
            item_types.append(t)
            if self.primary_id == iid:
                primary_type = t
        track_types = [tw.sample_entry_type for tw in self._track_writers
                       if hasattr(tw, "sample_entry_type")]
        major, compat = compute_brands(item_types, primary_type,
                                       track_types)
        # user-requested extras (heif_context_add_compatible_brand /
        # heif_context_set_major_brand)
        for b in getattr(self, "extra_compatible_brands", []):
            if b not in compat:
                compat.append(b)
        forced = getattr(self, "forced_major_brand", None)
        if forced:
            major = forced
        f.ftyp.major_brand = major
        f.ftyp.compatible_brands = compat

    def _finalize_region_items(self) -> None:
        for ri in self._pending_region_items:
            self.file.append_item_data(ri.item_id, ri.serialize())
        self._pending_region_items = []

    def _write_impl(self) -> bytes:
        # per-item pre-write hooks, e.g. tili offset-table patching
        # (ref: ImageItem::process_before_write, tiled.cc:946)
        for item in self.items.values():
            hook = getattr(item, "process_before_write", None)
            if hook is not None:
                hook()
        return self.file.write()

    def write_to_file(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.write())

    # ---------------------------------------------------------------- debug

    def debug_dump_boxes(self) -> str:
        """(ref: heif_context_debug_dump_boxes_to_file heif_context.h:296)."""
        return self.file.dump()
