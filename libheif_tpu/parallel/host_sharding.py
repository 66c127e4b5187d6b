"""Multi-host input plane: per-host byte-range fetch of coded tiles.

On a multi-host TPU pod, every host runs the same program but should
only READ the bytes of the tiles its devices will decode.  This module
plans that partition from the container's own offset tables and drives
it end-to-end:

  1. `grid_tile_ranges` / `tili_tile_ranges` recover each tile's
     (offset, size) byte range from the iloc extents of a `grid` item's
     references, or from a `tili` item's offset table (the reference's
     on-demand table reads: libheif/image-items/tiled.h:127
     get_tile_offsets, tiled.cc:436 get_tile_offset_table_range_to_read);
  2. `shard_tiles` splits the tile list into contiguous per-host chunks
     (host axis = mesh axis 0, so a host's tiles land on its devices
     under the standard chunked NamedSharding layout);
  3. `HostShardReader` enforces that a host only touches its own byte
     ranges (reads outside the shard raise — the test double for "the
     bytes were never transferred to this host");
  4. `decode_grid_host_sharded` runs the full pipeline on a virtual
     mesh: per-host fetch -> per-host entropy decode -> one sharded
     device program over all tiles (parallel/coded_grid.py).

Real multi-host deployment swaps step 3's file reads for the storage
fabric (each host range-reads the same object); nothing else changes,
because jax.distributed gives every host the same global mesh and the
per-host data is exactly the shard the NamedSharding expects
(SURVEY.md §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class TileByteRange:
    """One tile's coded bytes inside the container file."""

    tile_index: int
    item_id: int          # 0 for tili tiles (all share the item)
    offset: int
    size: int


def grid_tile_ranges(hf, grid_item_id: int) -> List[TileByteRange]:
    """Byte ranges of a grid's tile items from their iloc entries.

    Only single-extent, file-offset-addressed tiles qualify (the normal
    layout heif-enc produces); anything else returns None entries the
    caller must fetch through the generic path."""
    refs = hf.get_references_from(grid_item_id, "dimg")
    if not refs:
        return []
    out = []
    for i, tid in enumerate(refs[0].to_item_ids):
        ext = _iloc_single_extent(hf, tid)
        if ext is None:
            raise ValueError(f"tile item {tid} is not single-extent")
        out.append(TileByteRange(i, tid, ext[0], ext[1]))
    return out


def _iloc_single_extent(hf, item_id: int):
    it = hf.iloc.find_item(item_id) if hf.iloc else None
    if it is None or len(it.extents) != 1:
        return None
    if it.construction_method != 0 or getattr(it, "mdat_relative", False):
        return None
    ext = it.extents[0]
    return (it.base_offset + ext.offset, ext.length)


def tili_tile_ranges(table, data_start: int = 0) -> List[TileByteRange]:
    """Byte ranges from a tili offset table (items/tiled_item.py
    TileOffsetTable); offsets are absolute file positions already."""
    out = []
    for i in range(table.num_tiles):
        out.append(TileByteRange(i, 0, table.get_offset(i),
                                 table.get_size(i)))
    return out


def shard_tiles(n_tiles: int, n_hosts: int) -> List[List[int]]:
    """Contiguous tile-index chunks, one per host (host = mesh axis 0).
    Chunk sizes match jax's chunked sharding of a length-n_tiles batch
    axis over n_hosts equal groups (host h gets indices
    [h*ceil, (h+1)*ceil) clipped)."""
    per = -(-n_tiles // n_hosts)
    return [list(range(h * per, min((h + 1) * per, n_tiles)))
            for h in range(n_hosts)]


class HostShardReader:
    """Byte-range reader for ONE host's shard; any read outside the
    shard's ranges raises (proving no cross-host bytes are needed)."""

    def __init__(self, path: str, ranges: Sequence[TileByteRange]):
        self.path = path
        self.ranges = {r.tile_index: r for r in ranges}
        self._data: Dict[int, bytes] = {}

    def fetch_all(self) -> Dict[int, bytes]:
        """Range-read every tile of this shard (one seek+read each —
        the storage-fabric access pattern)."""
        with open(self.path, "rb") as f:
            for idx, r in self.ranges.items():
                f.seek(r.offset)
                buf = f.read(r.size)
                if len(buf) != r.size:
                    raise EOFError(f"tile {idx}: short read")
                self._data[idx] = buf
        return dict(self._data)

    def tile_bytes(self, tile_index: int) -> bytes:
        if tile_index not in self.ranges:
            raise KeyError(
                f"tile {tile_index} is not in this host's shard")
        if tile_index not in self._data:
            self.fetch_all()
        return self._data[tile_index]


def decode_grid_host_sharded(path: str, n_hosts: int,
                             mesh=None):
    """End-to-end multi-host demo: each virtual host fetches + entropy
    decodes only its tile chunk; the device program runs once over the
    full batch, sharded over `mesh` (axis 0 = hosts when the mesh is
    sized n_hosts).  Returns the composed (Y, Cb, Cr) planes per tile
    plus the grid spec."""
    from ..file import HeifFile
    from ..boxes.codec_cfg import Box_hvcC
    from .coded_grid import parse_tile, decode_tiles_device

    hf = HeifFile.from_file(path)
    pid = hf.primary_item_id
    if hf.get_item_type(pid) != "grid":
        raise ValueError("primary item is not a grid")
    ranges = grid_tile_ranges(hf, pid)
    shards = shard_tiles(len(ranges), n_hosts)

    # per-host: fetch own byte ranges + entropy decode (in deployment
    # each host executes exactly one of these loop bodies)
    parsed: List[Optional[tuple]] = [None] * len(ranges)
    for h, tile_idxs in enumerate(shards):
        reader = HostShardReader(path, [ranges[i] for i in tile_idxs])
        reader.fetch_all()
        for i in tile_idxs:
            tid = ranges[i].item_id
            cfg = hf.get_property(tid, Box_hvcC)
            parsed[i] = parse_tile(cfg, reader.tile_bytes(i))

    syns = [p[1] for p in parsed]
    raws = [p[2] for p in parsed]
    if any(r is None for r in raws):
        raws = None
    planes = decode_tiles_device(syns, raw_tus=raws, mesh=mesh)
    from ..items.derived import ImageGrid
    grid = ImageGrid.parse(hf.get_item_data(pid))
    return planes, grid, parsed[0][0]
