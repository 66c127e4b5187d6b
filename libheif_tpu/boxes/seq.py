"""Sequence (video track) boxes: moov/trak/stbl family.

Re-designed equivalents of the reference's sequence boxes (reference:
libheif/sequences/seq_boxes.{h,cc} — seq_boxes.h:33-1004).  Filled in
with the sequence/track layer; container-only boxes here so moov trees
parse structurally from day one.
"""

from __future__ import annotations

from typing import List

from ..core.bitstream import ByteReader, ByteWriter
from ..core.limits import SecurityLimits
from .box import Box, FullBox, register_box


@register_box("moov")
class Box_moov(Box):
    """Movie box (container)."""


@register_box("trak")
class Box_trak(Box):
    """Track box (container)."""


@register_box("mdia")
class Box_mdia(Box):
    """Media box (container)."""


@register_box("minf")
class Box_minf(Box):
    """Media information box (container)."""


@register_box("stbl")
class Box_stbl(Box):
    """Sample table box (container)."""


@register_box("edts")
class Box_edts(Box):
    """Edit box (container)."""


@register_box("mvhd")
class Box_mvhd(FullBox):
    """Movie header (ref: seq_boxes.h Box_mvhd)."""

    supported_versions = (0, 1)

    def __init__(self):
        super().__init__()
        self.creation_time = 0
        self.modification_time = 0
        self.timescale = 90000
        self.duration = 0
        self.rate = 0x00010000
        self.volume = 0x0100
        self.matrix = [0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000]
        self.next_track_id = 1

    def parse_payload(self, r: ByteReader, limits: SecurityLimits, depth=0) -> None:
        if self.version == 1:
            self.creation_time = r.read64()
            self.modification_time = r.read64()
            self.timescale = r.read32()
            self.duration = r.read64()
        else:
            self.creation_time = r.read32()
            self.modification_time = r.read32()
            self.timescale = r.read32()
            self.duration = r.read32()
        self.rate = r.read32()
        self.volume = r.read16()
        r.skip(2 + 8)  # reserved
        self.matrix = [r.read32s() for _ in range(9)]
        r.skip(4 * 6)  # pre_defined
        self.next_track_id = r.read32()

    def derive_version(self) -> None:
        big = max(self.creation_time, self.modification_time, self.duration)
        self.version = 1 if big > 0xFFFFFFFF else 0

    def write_payload(self, w: ByteWriter) -> None:
        self.write_full_header(w)
        if self.version == 1:
            w.write64(self.creation_time)
            w.write64(self.modification_time)
            w.write32(self.timescale)
            w.write64(self.duration)
        else:
            w.write32(self.creation_time)
            w.write32(self.modification_time)
            w.write32(self.timescale)
            w.write32(self.duration)
        w.write32(self.rate)
        w.write16(self.volume)
        w.write16(0)
        w.write64(0)
        for m in self.matrix:
            w.write32s(m)
        for _ in range(6):
            w.write32(0)
        w.write32(self.next_track_id)


@register_box("tkhd")
class Box_tkhd(FullBox):
    """Track header (ref: seq_boxes.h Box_tkhd)."""

    supported_versions = (0, 1)

    def __init__(self):
        super().__init__()
        self.flags = 7          # enabled | in_movie | in_preview
        self.creation_time = 0
        self.modification_time = 0
        self.track_id = 1
        self.duration = 0
        self.layer = 0
        self.alternate_group = 0
        self.volume = 0
        self.matrix = [0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000]
        self.width = 0          # 16.16 fixed
        self.height = 0

    def parse_payload(self, r, limits, depth=0):
        if self.version == 1:
            self.creation_time = r.read64()
            self.modification_time = r.read64()
            self.track_id = r.read32()
            r.skip(4)
            self.duration = r.read64()
        else:
            self.creation_time = r.read32()
            self.modification_time = r.read32()
            self.track_id = r.read32()
            r.skip(4)
            self.duration = r.read32()
        r.skip(8)
        self.layer = r.read16()
        self.alternate_group = r.read16()
        self.volume = r.read16()
        r.skip(2)
        self.matrix = [r.read32s() for _ in range(9)]
        self.width = r.read32()
        self.height = r.read32()

    def derive_version(self):
        big = max(self.creation_time, self.modification_time, self.duration)
        self.version = 1 if big > 0xFFFFFFFF else 0

    def write_payload(self, w):
        self.write_full_header(w)
        if self.version == 1:
            w.write64(self.creation_time)
            w.write64(self.modification_time)
            w.write32(self.track_id)
            w.write32(0)
            w.write64(self.duration)
        else:
            w.write32(self.creation_time)
            w.write32(self.modification_time)
            w.write32(self.track_id)
            w.write32(0)
            w.write32(self.duration)
        w.write64(0)
        w.write16(self.layer)
        w.write16(self.alternate_group)
        w.write16(self.volume)
        w.write16(0)
        for m in self.matrix:
            w.write32s(m)
        w.write32(self.width)
        w.write32(self.height)

    def dump_fields(self):
        return [f"track_id={self.track_id}", f"duration={self.duration}",
                f"size={self.width >> 16}x{self.height >> 16}"]


@register_box("mdhd")
class Box_mdhd(FullBox):
    """Media header (ref: seq_boxes.h Box_mdhd)."""

    supported_versions = (0, 1)

    def __init__(self):
        super().__init__()
        self.creation_time = 0
        self.modification_time = 0
        self.timescale = 90000
        self.duration = 0
        self.language = "und"

    def parse_payload(self, r, limits, depth=0):
        if self.version == 1:
            self.creation_time = r.read64()
            self.modification_time = r.read64()
            self.timescale = r.read32()
            self.duration = r.read64()
        else:
            self.creation_time = r.read32()
            self.modification_time = r.read32()
            self.timescale = r.read32()
            self.duration = r.read32()
        lang = r.read16()
        self.language = "".join(chr(((lang >> s) & 0x1F) + 0x60)
                                for s in (10, 5, 0))
        r.skip(2)

    def derive_version(self):
        big = max(self.creation_time, self.modification_time, self.duration)
        self.version = 1 if big > 0xFFFFFFFF else 0

    def write_payload(self, w):
        self.write_full_header(w)
        if self.version == 1:
            w.write64(self.creation_time)
            w.write64(self.modification_time)
            w.write32(self.timescale)
            w.write64(self.duration)
        else:
            w.write32(self.creation_time)
            w.write32(self.modification_time)
            w.write32(self.timescale)
            w.write32(self.duration)
        lang = 0
        for i, ch in enumerate(self.language[:3]):
            lang |= (ord(ch) - 0x60) << (10 - 5 * i)
        w.write16(lang)
        w.write16(0)

    def dump_fields(self):
        return [f"timescale={self.timescale}", f"duration={self.duration}",
                f"language={self.language}"]


@register_box("vmhd")
class Box_vmhd(FullBox):
    """Video media header."""

    def __init__(self):
        super().__init__()
        self.flags = 1
        self.graphics_mode = 0
        self.op_color = (0, 0, 0)

    def parse_payload(self, r, limits, depth=0):
        self.graphics_mode = r.read16()
        self.op_color = tuple(r.read16() for _ in range(3))

    def write_payload(self, w):
        self.write_full_header(w)
        w.write16(self.graphics_mode)
        for c in self.op_color:
            w.write16(c)


@register_box("nmhd")
class Box_nmhd(FullBox):
    """Null media header (metadata tracks)."""

    def parse_payload(self, r, limits, depth=0):
        pass

    def write_payload(self, w):
        self.write_full_header(w)


class VisualSampleEntry(Box):
    """Coded video sample entry (hvc1/av01/...); children carry the
    codec configuration (ref: seq_boxes.h VisualSampleEntry)."""

    def __init__(self, fourcc: str = "hvc1"):
        super().__init__()
        self.box_type = fourcc
        self.data_reference_index = 1
        self.width = 0
        self.height = 0
        self.compressor_name = ""

    def parse_payload(self, r, limits, depth=0):
        r.skip(6)
        self.data_reference_index = r.read16()
        r.skip(2 + 2 + 12)      # pre_defined/reserved
        self.width = r.read16()
        self.height = r.read16()
        r.skip(4 + 4 + 4 + 2)   # resolutions, reserved, frame_count
        name = r.read_bytes(32)
        n = name[0]
        self.compressor_name = name[1:1 + min(n, 31)].decode(
            "utf-8", "replace")
        r.skip(2 + 2)           # depth, pre_defined
        self.read_children(r, limits, depth + 1)

    def write_payload(self, w):
        w.write_bytes(b"\x00" * 6)
        w.write16(self.data_reference_index)
        w.write_bytes(b"\x00" * 16)
        w.write16(self.width)
        w.write16(self.height)
        w.write32(0x00480000)
        w.write32(0x00480000)
        w.write32(0)
        w.write16(1)
        name = self.compressor_name.encode()[:31]
        w.write_bytes(bytes([len(name)]) + name + b"\x00" * (31 - len(name)))
        w.write16(0x0018)
        w.write16s(-1)
        self.write_children(w)

    def dump_fields(self):
        return [f"size={self.width}x{self.height}",
                f"compressor={self.compressor_name!r}"]


for _fourcc in ("hvc1", "hev1", "av01", "avc1", "vvc1", "mjpg", "j2ki"):
    register_box(_fourcc)(type(f"Box_{_fourcc}", (VisualSampleEntry,), {
        "__init__": (lambda fc: lambda self: VisualSampleEntry.__init__(
            self, fc))(_fourcc)}))


@register_box("stsd")
class Box_stsd(FullBox):
    """Sample description (entries are sample-entry boxes)."""

    def parse_payload(self, r, limits, depth=0):
        count = r.read32()
        self.read_children(r, limits, depth + 1)
        if len(self.children) != count:
            pass  # tolerated; dump shows actual children

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.children))
        self.write_children(w)


@register_box("stts")
class Box_stts(FullBox):
    """Decoding time-to-sample (ref: seq_boxes.h Box_stts)."""

    def __init__(self):
        super().__init__()
        self.entries = []        # (sample_count, sample_delta)

    def parse_payload(self, r, limits, depth=0):
        n = r.read32()
        limits.check_block_size(n * 8, "stts entries")
        self.entries = [(r.read32(), r.read32()) for _ in range(n)]

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.entries))
        for c, d in self.entries:
            w.write32(c)
            w.write32(d)

    def total_samples(self) -> int:
        return sum(c for c, _ in self.entries)

    def total_duration(self) -> int:
        return sum(c * d for c, d in self.entries)

    def sample_duration(self, idx: int) -> int:
        for c, d in self.entries:
            if idx < c:
                return d
            idx -= c
        return self.entries[-1][1] if self.entries else 0

    def dump_fields(self):
        return [f"entries={self.entries[:4]}…" if len(self.entries) > 4
                else f"entries={self.entries}"]


@register_box("ctts")
class Box_ctts(FullBox):
    """Composition time offsets."""

    supported_versions = (0, 1)

    def __init__(self):
        super().__init__()
        self.entries = []        # (sample_count, offset)

    def parse_payload(self, r, limits, depth=0):
        n = r.read32()
        limits.check_block_size(n * 8, "ctts entries")
        if self.version == 0:
            self.entries = [(r.read32(), r.read32()) for _ in range(n)]
        else:
            self.entries = [(r.read32(), r.read32s()) for _ in range(n)]

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.entries))
        for c, o in self.entries:
            w.write32(c)
            if self.version == 0:
                w.write32(o)
            else:
                w.write32s(o)


@register_box("stsc")
class Box_stsc(FullBox):
    """Sample-to-chunk (ref: seq_boxes.h Box_stsc)."""

    def __init__(self):
        super().__init__()
        self.entries = []  # (first_chunk, samples_per_chunk, desc_index)

    def parse_payload(self, r, limits, depth=0):
        n = r.read32()
        limits.check_block_size(n * 12, "stsc entries")
        self.entries = [(r.read32(), r.read32(), r.read32())
                        for _ in range(n)]

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.entries))
        for a, b, c in self.entries:
            w.write32(a)
            w.write32(b)
            w.write32(c)


@register_box("stsz")
class Box_stsz(FullBox):
    """Sample sizes."""

    def __init__(self):
        super().__init__()
        self.uniform_size = 0
        self.sizes = []

    def parse_payload(self, r, limits, depth=0):
        self.uniform_size = r.read32()
        n = r.read32()
        if self.uniform_size == 0:
            limits.check_block_size(n * 4, "stsz entries")
            self.sizes = [r.read32() for _ in range(n)]
        else:
            self.sizes = []
            self.sample_count = n

    def sample_size(self, idx: int) -> int:
        if self.uniform_size:
            return self.uniform_size
        return self.sizes[idx]

    def num_samples(self) -> int:
        if self.uniform_size:
            return getattr(self, "sample_count", 0)
        return len(self.sizes)

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(self.uniform_size)
        if self.uniform_size:
            w.write32(getattr(self, "sample_count", 0))
        else:
            w.write32(len(self.sizes))
            for s in self.sizes:
                w.write32(s)


@register_box("stco")
class Box_stco(FullBox):
    """Chunk offsets (32-bit)."""

    def __init__(self):
        super().__init__()
        self.offsets = []

    def parse_payload(self, r, limits, depth=0):
        n = r.read32()
        limits.check_block_size(n * 4, "stco entries")
        self.offsets = [r.read32() for _ in range(n)]

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.offsets))
        for o in self.offsets:
            w.write32(o)


@register_box("co64")
class Box_co64(FullBox):
    """Chunk offsets (64-bit)."""

    def __init__(self):
        super().__init__()
        self.offsets = []

    def parse_payload(self, r, limits, depth=0):
        n = r.read32()
        limits.check_block_size(n * 8, "co64 entries")
        self.offsets = [r.read64() for _ in range(n)]

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.offsets))
        for o in self.offsets:
            w.write64(o)


@register_box("stss")
class Box_stss(FullBox):
    """Sync (key frame) sample numbers (1-based)."""

    def __init__(self):
        super().__init__()
        self.samples = []

    def parse_payload(self, r, limits, depth=0):
        n = r.read32()
        limits.check_block_size(n * 4, "stss entries")
        self.samples = [r.read32() for _ in range(n)]

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.samples))
        for s in self.samples:
            w.write32(s)


@register_box("ccst")
class Box_ccst(FullBox):
    """Coding constraints (ref: seq_boxes.h Box_ccst)."""

    def __init__(self):
        super().__init__()
        self.all_ref_pics_intra = True
        self.intra_pred_used = True
        self.max_ref_per_pic = 0

    def parse_payload(self, r, limits, depth=0):
        v = r.read32()
        self.all_ref_pics_intra = bool(v & 0x80000000)
        self.intra_pred_used = bool(v & 0x40000000)
        self.max_ref_per_pic = (v >> 26) & 0xF

    def write_payload(self, w):
        self.write_full_header(w)
        v = (0x80000000 if self.all_ref_pics_intra else 0) | \
            (0x40000000 if self.intra_pred_used else 0) | \
            (self.max_ref_per_pic << 26)
        w.write32(v)


@register_box("elst")
class Box_elst(FullBox):
    """Edit list."""

    supported_versions = (0, 1)

    def __init__(self):
        super().__init__()
        self.entries = []  # (segment_duration, media_time, rate_int, rate_frac)

    def parse_payload(self, r, limits, depth=0):
        n = r.read32()
        limits.check_block_size(n * 20, "elst entries")
        out = []
        for _ in range(n):
            if self.version == 1:
                dur = r.read64()
                mt = r.read64s() if hasattr(r, "read64s") else r.read64()
            else:
                dur = r.read32()
                mt = r.read32s()
            out.append((dur, mt, r.read16(), r.read16()))
        self.entries = out

    def write_payload(self, w):
        self.write_full_header(w)
        w.write32(len(self.entries))
        for dur, mt, ri, rf in self.entries:
            if self.version == 1:
                w.write64(dur)
                w.write64(mt if mt >= 0 else (1 << 64) + mt)
            else:
                w.write32(dur)
                w.write32s(mt)
            w.write16(ri)
            w.write16(rf)
