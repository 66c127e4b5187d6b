"""Box model tests (model: reference tests/box_equals.cc + parse tests)."""

import glob
import os

import pytest

from libheif_tpu.core.bitstream import ByteReader, ByteWriter
from libheif_tpu.core.limits import SecurityLimits
from libheif_tpu.boxes import read_box, read_all_boxes, Box_other, Box_Error
from libheif_tpu.boxes.meta import (
    Box_ftyp, Box_ispe, Box_irot, Box_imir, Box_pixi, Box_iloc, Box_infe,
    Box_ipma, Box_iref, Box_colr, IlocItem, IlocExtent, ItemReference,
)
from libheif_tpu.core.error import HeifError


def roundtrip(box):
    data = box.serialize()
    r = ByteReader(data)
    return read_box(r, SecurityLimits(), 0)


class TestBoxRoundtrip:
    def test_ftyp(self):
        b = Box_ftyp("heic", 0, ["mif1", "heic"])
        b2 = roundtrip(b)
        assert isinstance(b2, Box_ftyp)
        assert b2.major_brand == "heic"
        assert b2.compatible_brands == ["mif1", "heic"]
        assert b.serialize() == b2.serialize()

    def test_ispe(self):
        b = Box_ispe(1920, 1080)
        b2 = roundtrip(b)
        assert (b2.width, b2.height) == (1920, 1080)

    def test_irot(self):
        for angle in (0, 90, 180, 270):
            b2 = roundtrip(Box_irot(angle))
            assert b2.angle == angle

    def test_imir(self):
        for d in (Box_imir.MIRROR_VERTICAL, Box_imir.MIRROR_HORIZONTAL):
            assert roundtrip(Box_imir(d)).direction == d

    def test_pixi(self):
        assert roundtrip(Box_pixi([8, 8, 8])).bits_per_channel == [8, 8, 8]

    def test_colr_nclx(self):
        b = Box_colr()
        b.colour_primaries = 9
        b.transfer_characteristics = 16
        b.matrix_coefficients = 9
        b.full_range_flag = False
        b2 = roundtrip(b)
        assert b2.colour_primaries == 9
        assert b2.transfer_characteristics == 16
        assert b2.matrix_coefficients == 9
        assert b2.full_range_flag is False

    def test_iloc_v0(self):
        b = Box_iloc()
        b.items = [IlocItem(item_id=1, extents=[IlocExtent(0, 100, 50)]),
                   IlocItem(item_id=2, extents=[IlocExtent(0, 150, 25),
                                                IlocExtent(0, 175, 10)])]
        b2 = roundtrip(b)
        assert len(b2.items) == 2
        assert b2.items[1].extents[1].offset == 175
        assert b2.items[1].extents[1].length == 10

    def test_iloc_large_item_id(self):
        b = Box_iloc()
        b.items = [IlocItem(item_id=0x12345, extents=[IlocExtent(0, 1, 2)])]
        b2 = roundtrip(b)
        assert b2.version == 2
        assert b2.items[0].item_id == 0x12345

    def test_infe(self):
        b = Box_infe(42, "hvc1", "test")
        b2 = roundtrip(b)
        assert (b2.item_id, b2.item_type, b2.item_name) == (42, "hvc1", "test")

    def test_infe_mime(self):
        b = Box_infe(7, "mime")
        b.content_type = "application/rdf+xml"
        b2 = roundtrip(b)
        assert b2.content_type == "application/rdf+xml"

    def test_ipma(self):
        b = Box_ipma()
        b.add(1, 1, True)
        b.add(1, 2, False)
        b.add(2, 200, True)  # forces 15-bit indices
        b2 = roundtrip(b)
        assert b2.flags & 1
        a = b2.get(1)
        assert [(x.property_index, x.essential) for x in a] == [(1, True), (2, False)]
        assert b2.get(2)[0].property_index == 200

    def test_iref(self):
        b = Box_iref()
        b.add_reference("dimg", 10, [1, 2, 3, 4])
        b.add_reference("thmb", 11, [10])
        b2 = roundtrip(b)
        assert b2.get_references_from(10)[0].to_item_ids == [1, 2, 3, 4]
        assert b2.get_references_to(10, "thmb")[0].from_item_id == 11

    def test_iref_cycle_detection(self):
        b = Box_iref()
        b.add_reference("dimg", 1, [2])
        b.add_reference("dimg", 2, [3])
        b.add_reference("dimg", 3, [1])
        with pytest.raises(HeifError):
            b.check_for_cycles()

    def test_unknown_box_passthrough(self):
        raw = bytes([0, 0, 0, 12]) + b"zzzz" + b"abcd"
        boxes = read_all_boxes(raw)
        assert isinstance(boxes[0], Box_other)
        assert boxes[0].payload == b"abcd"
        assert boxes[0].serialize() == raw

    def test_corrupt_payload_isolated(self):
        # An ispe with truncated payload becomes Box_Error, not an exception
        raw = bytes([0, 0, 0, 14]) + b"ispe" + bytes(6)
        boxes = read_all_boxes(raw)
        assert isinstance(boxes[0], Box_Error)
        # and round-trips its original bytes
        assert boxes[0].serialize() == raw

    def test_box_size_too_small(self):
        raw = bytes([0, 0, 0, 4]) + b"free"
        with pytest.raises(HeifError):
            read_all_boxes(raw)

    def test_box_size_beyond_range(self):
        raw = bytes([0, 0, 1, 0]) + b"free" + bytes(4)
        with pytest.raises(HeifError):
            read_all_boxes(raw)


class TestReferenceFixtureParsing:
    """Every reference fixture must parse into a box tree without raising
    (golden structural coverage of the whole tests/data corpus)."""

    def test_parse_all_fixtures(self, ref_data_dir):
        from libheif_tpu.file import HeifFile
        files = sorted(glob.glob(os.path.join(ref_data_dir, "*.heif")) +
                       glob.glob(os.path.join(ref_data_dir, "*.heic")) +
                       glob.glob(os.path.join(ref_data_dir, "*.avif")))
        assert len(files) > 80
        failures = []
        for path in files:
            try:
                hf = HeifFile.from_file(path)
                if hf.meta is not None:
                    assert hf.item_ids, path
                    # primary item data must be retrievable
                    pid = hf.primary_item_id
                    if hf.get_item_type(pid) not in ("grid", "iovl", "iden"):
                        assert len(hf.get_item_data(pid)) > 0, path
            except Exception as e:  # noqa: BLE001
                failures.append((os.path.basename(path), repr(e)))
        assert not failures, failures

    def test_example_heic_structure(self):
        from libheif_tpu.file import HeifFile
        path = "/root/reference/examples/example.heic"
        if not os.path.exists(path):
            pytest.skip("example.heic not available")
        hf = HeifFile.from_file(path)
        pid = hf.primary_item_id
        assert hf.get_item_type(pid) == "hvc1"
        # primary image has a thumbnail
        refs = hf.get_references_to(pid, "thmb")
        assert refs and refs[0].from_item_id != pid
        # hvcC + ispe properties are present
        from libheif_tpu.boxes.codec_cfg import Box_hvcC
        from libheif_tpu.boxes.meta import Box_ispe
        assert hf.get_property(pid, Box_hvcC) is not None
        ispe = hf.get_property(pid, Box_ispe)
        assert ispe.width == 1280 and ispe.height == 854
