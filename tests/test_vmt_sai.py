"""WebVMT metadata tracks + SAI data files through heif_enc
(reference: examples/vmt.cc, examples/SAI_datafile.cc wired into
heif_enc.cc --vmt-metadata / --sai-data-file)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_y4m(path, n_frames=3, w=64, h=48):
    rng = np.random.default_rng(3)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
        for _ in range(n_frames):
            f.write(b"FRAME\n")
            f.write(rng.integers(0, 256, (h, w), dtype=np.uint8)
                    .tobytes())
            f.write(np.full((h // 2, w // 2), 110, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 140, np.uint8).tobytes())


VMT = """WEBVMT

NOTE a comment block
skipped entirely

00:00.000 --> 00:01.000
{"sync": {"type": "org.example.text", "data": "hello"}}

00:01.000 --> 00:02.000
{"sync": {"type": "org.example.blob.hex", "data": "deadBEEF"}}

00:02.000 -->
{"sync": {"type": "org.example.b64.base64", "data": "aGV5"}}
"""

SAI = """suid
stai 5, 1000000000, 0, 2
---
urn:example:frame0
123456789, 1, 0, 0
urn:example:frame1
123456790, 1, 0, 0

123456791, 1, 0, 0
"""


def test_vmt_parse_units():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import vmt
    assert vmt.parse_vmt_timestamp("00:01.500") == 1500
    assert vmt.parse_vmt_timestamp("1:02:03.004") == 3723004
    assert vmt.parse_vmt_timestamp("00:01.5") == 0xFFFFFFFE
    assert vmt.hex_to_binary("de ad-BE:EF") == b"\xde\xad\xbe\xef"
    data = vmt.parse_vmt_sync_data(
        '{"sync": {"type": "t.hex", "data": "0102"}}'
        '{"sync": {"type": "t", "data": "xy"}}')
    assert data == b"\x01\x02xy"


def test_sai_datafile_units(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from sai_datafile import SAIDatafile
    p = tmp_path / "sai.txt"
    p.write_text(SAI)
    d = SAIDatafile().load(str(p))
    assert d.active_sais == ["suid", "stai"]
    assert d.tai_clock_info.time_uncertainty == 5
    assert d.tai_clock_info.clock_resolution == 1000000000
    assert d.gimi_content_ids == ["urn:example:frame0",
                                  "urn:example:frame1", None]
    assert d.tai_timestamps[0].tai_timestamp == 123456789
    assert d.tai_timestamps[2].tai_timestamp == 123456791


def test_vmt_sai_end_to_end(tmp_path):
    y4m = tmp_path / "in.y4m"
    _write_y4m(str(y4m))
    vmt_file = tmp_path / "meta.vmt"
    vmt_file.write_text(VMT)
    sai_file = tmp_path / "sai.txt"
    sai_file.write_text(SAI)
    out = tmp_path / "seq.heif"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "heif_enc.py"),
         "-S", str(y4m), "-o", str(out), "--vmt-metadata",
         str(vmt_file), "--sai-data-file", str(sai_file)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    from libheif_tpu.context import HeifContext
    ctx = HeifContext.read_from_file(str(out))
    assert ctx.has_sequence
    tracks = ctx.tracks
    assert len(tracks) == 2
    meta = [t for t in tracks if t.handler == "meta"][0]
    vis = [t for t in tracks if t.handler != "meta"][0]
    # urim uri
    assert meta.uri() == "vmt:metadata"
    # cdsc reference from metadata track to the visual track
    assert vis.track_id in meta.references_of_type("cdsc")
    # sample payloads: hello / deadbeef / base64("hey")
    datas = [meta.sample_data(i) for i in range(meta.num_samples)]
    assert datas[0] == b"hello"
    assert datas[1] == b"\xde\xad\xbe\xef"
    assert datas[2] == b"hey"
    assert meta.sample_duration(0) == 1000
    # SAI on the visual track: gimi ids + TAI timestamps survive
    assert vis.sample_gimi_content_id(0) == "urn:example:frame0"
    assert vis.sample_gimi_content_id(2) is None
    ts = vis.sample_tai_timestamp(2)
    assert ts is not None and ts.tai_timestamp == 123456791
    info = vis.tai_clock_info()
    assert info is not None and info.clock_resolution == 1000000000
