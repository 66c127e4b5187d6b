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
