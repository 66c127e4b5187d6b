"""Public API surface tests (ref: libheif/api/libheif/* headers).

Exercises the C-named shim layer end-to-end: read/decode, encode with
encoder-parameter introspection, raw items/properties/metadata, regions,
brands, tiling, entity groups — the surface a reference user ports to
(SURVEY.md §2.7).
"""

import numpy as np
import pytest

from libheif_tpu import api
from libheif_tpu.image.pixel_image import Channel, Colorspace, Chroma

EXAMPLE_HEIC = "/root/reference/examples/example.heic"
UNCI_RGB = "/root/reference/tests/data/uncompressed_comp_RGB.heif"


def _make_image(w=64, h=48, seed=3):
    rng = np.random.default_rng(seed)
    img = api.heif_image_create(w, h, Colorspace.YCbCr, Chroma.C420)
    api.heif_image_add_plane(img, Channel.Y, w, h, 8)
    api.heif_image_add_plane(img, Channel.Cb, w // 2, h // 2, 8)
    api.heif_image_add_plane(img, Channel.Cr, w // 2, h // 2, 8)
    api.heif_image_get_plane(img, Channel.Y)[:] = \
        rng.integers(0, 256, (h, w))
    api.heif_image_get_plane(img, Channel.Cb)[:] = 100
    api.heif_image_get_plane(img, Channel.Cr)[:] = 180
    return img


class TestLibrary:
    def test_version(self):
        assert api.heif_get_version().count(".") == 2
        assert api.heif_get_version_number_major() == 1

    def test_init_deinit(self):
        api.heif_init()
        api.heif_deinit()

    def test_codec_discovery(self):
        assert api.heif_have_decoder_for_format("hevc")
        assert api.heif_have_decoder_for_format("avc")
        assert api.heif_have_encoder_for_format("av1")
        descs = api.heif_get_decoder_descriptors("hevc")
        assert descs and descs[0][0] == "hevc"


class TestContextRead:
    def test_read_decode_primary(self):
        ctx = api.heif_context_alloc()
        api.heif_context_read_from_file(ctx, EXAMPLE_HEIC)
        n = api.heif_context_get_number_of_top_level_images(ctx)
        assert n >= 1
        ids = api.heif_context_get_list_of_top_level_image_IDs(ctx)
        assert len(ids) == n
        assert api.heif_context_is_top_level_image_ID(ctx, ids[0])
        handle = api.heif_context_get_primary_image_handle(ctx)
        assert api.heif_image_handle_is_primary_image(handle)
        assert api.heif_image_handle_get_width(handle) == 1280
        assert api.heif_image_handle_get_height(handle) == 854
        img = api.heif_decode_image(handle, Colorspace.RGB,
                                    Chroma.C444)
        assert api.heif_image_get_width(img) == 1280
        assert api.heif_image_has_channel(img, Channel.R)

    def test_thumbnails(self):
        ctx = api.heif_context_alloc()
        api.heif_context_read_from_file(ctx, EXAMPLE_HEIC)
        handle = api.heif_context_get_primary_image_handle(ctx)
        n = api.heif_image_handle_get_number_of_thumbnails(handle)
        assert n == 1
        tid = api.heif_image_handle_get_list_of_thumbnail_IDs(handle)[0]
        th = api.heif_image_handle_get_thumbnail(handle, tid)
        assert api.heif_image_handle_get_width(th) < 1280

    def test_error_catching(self):
        ctx = api.heif_context_alloc()
        with api.catching() as c:
            api.heif_context_read_from_memory(ctx, b"\x00" * 64)
        assert not c.error.ok
        assert c.error.code != 0

    def test_brands(self):
        data = open(EXAMPLE_HEIC, "rb").read(64)
        assert api.heif_read_main_brand(data) == "mif1"
        assert api.heif_check_filetype(data) == "supported"
        assert api.heif_get_file_mime_type(data) in ("image/heif",
                                                     "image/heic")
        assert api.heif_check_filetype(b"ab") == "insufficient"


class TestEncode:
    def test_encode_with_encoder_params(self, tmp_path):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "hevc")
        assert api.heif_encoder_get_name(enc) == "tpu-hevc"
        params = api.heif_encoder_list_parameters(enc)
        names = [p["name"] for p in params]
        assert "quality" in names and "lossless" in names
        api.heif_encoder_set_lossy_quality(enc, 70)
        assert api.heif_encoder_get_parameter_integer(enc,
                                                      "quality") == 70
        api.heif_encoder_set_parameter(enc, "quality", "60")
        lo, hi = api.heif_encoder_parameter_integer_valid_range(enc,
                                                                "quality")
        assert (lo, hi) == (0, 100)
        img = _make_image()
        handle = api.heif_context_encode_image(ctx, img, enc)
        assert api.heif_image_handle_get_width(handle) == 64
        path = str(tmp_path / "api_enc.heif")
        api.heif_context_write_to_file(ctx, path)
        ctx2 = api.heif_context_alloc()
        api.heif_context_read_from_file(ctx2, path)
        h2 = api.heif_context_get_primary_image_handle(ctx2)
        out = api.heif_decode_image(h2)
        assert out.width == 64 and out.height == 48

    def test_thumbnail_encode(self):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "unci")
        img = _make_image(128, 96)
        handle = api.heif_context_encode_image(ctx, img, enc)
        th = api.heif_context_encode_thumbnail(ctx, img, handle, enc,
                                               bbox_size=32)
        assert th is not None
        assert api.heif_image_handle_get_number_of_thumbnails(handle) == 1

    def test_bad_quality_rejected(self):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "hevc")
        with api.catching() as c:
            api.heif_encoder_set_lossy_quality(enc, 150)
        assert not c.error.ok


class TestItemsAndProperties:
    def test_raw_items(self):
        ctx = api.heif_context_alloc()
        iid = api.heif_context_add_item(ctx, "zzzz", b"payload")
        assert api.heif_item_get_item_type(ctx, iid) == "zzzz"
        assert api.heif_item_get_item_data(ctx, iid) == b"payload"
        mid = api.heif_context_add_mime_item(ctx, "text/plain", b"hi")
        assert api.heif_item_get_mime_item_content_type(
            ctx, mid) == "text/plain"
        api.heif_context_add_item_reference(ctx, "cdsc", mid, iid)
        refs = api.heif_context_get_item_references(ctx, mid)
        assert ("cdsc", [iid]) in refs
        api.heif_item_set_item_name(ctx, iid, "named")
        assert api.heif_item_get_item_name(ctx, iid) == "named"

    def test_properties(self):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "unci")
        img = _make_image()
        handle = api.heif_context_encode_image(ctx, img, enc)
        iid = handle.item_id
        api.heif_item_add_transform_property_rotation(ctx, iid, 90)
        props = api.heif_item_get_transformation_properties(ctx, iid)
        assert len(props) == 1
        ang = api.heif_item_get_property_transform_rotation_ccw(
            ctx, iid, props[0])
        assert ang == 90
        desc = api.heif_property_user_description(
            lang="en", name="test", description="a test image")
        api.heif_item_add_property_user_description(ctx, iid, desc)
        udes_ids = api.heif_item_get_properties_of_type(ctx, iid, "udes")
        assert len(udes_ids) == 1
        got = api.heif_item_get_property_user_description(ctx, iid,
                                                          udes_ids[0])
        assert got.name == "test" and got.lang == "en"
        # raw round-trip
        raw = api.heif_item_get_property_raw_data(ctx, iid, udes_ids[0])
        assert b"test" in raw

    def test_metadata(self):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "unci")
        handle = api.heif_context_encode_image(ctx, _make_image(), enc)
        exif = b"II*\x00\x08\x00\x00\x00"
        api.heif_context_add_exif_metadata(ctx, handle, exif)
        api.heif_context_add_XMP_metadata(ctx, handle, b"<x:xmpmeta/>")
        n = api.heif_image_handle_get_number_of_metadata_blocks(handle)
        assert n == 2
        ids = api.heif_image_handle_get_list_of_metadata_block_IDs(
            handle, "Exif")
        assert len(ids) == 1
        data = api.heif_image_handle_get_metadata(handle, ids[0])
        assert data.endswith(exif)
        assert api.heif_image_handle_get_exif(handle) == exif
        assert api.heif_image_handle_get_xmp(handle) == b"<x:xmpmeta/>"


class TestRegions:
    def test_region_roundtrip(self):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "unci")
        handle = api.heif_context_encode_image(ctx, _make_image(), enc)
        ri = api.heif_image_handle_add_region_item(handle, 640, 480)
        api.heif_region_item_add_region_point(ri, 10, 20)
        api.heif_region_item_add_region_rectangle(ri, 5, 6, 100, 50)
        api.heif_region_item_add_region_polygon(ri, [(0, 0), (10, 0),
                                                     (5, 8)])
        blob = api.heif_context_write(ctx)
        ctx2 = api.heif_context_alloc()
        api.heif_context_read_from_memory(ctx2, blob)
        h2 = api.heif_context_get_primary_image_handle(ctx2)
        assert api.heif_image_handle_get_number_of_region_items(h2) == 1
        rid = api.heif_image_handle_get_list_of_region_item_ids(h2)[0]
        ri2 = api.heif_context_get_region_item(ctx2, rid)
        assert api.heif_region_item_get_reference_size(ri2) == (640, 480)
        regions = api.heif_region_item_get_list_of_regions(ri2)
        assert [api.heif_region_get_type(r) for r in regions] == \
            ["point", "rect", "polygon"]
        assert api.heif_region_get_point(regions[0]) == (10, 20)
        assert api.heif_region_get_rectangle(regions[1]) == (5, 6, 100,
                                                             50)
        # transformed into a 64x48 image from a 640x480 reference
        x, y = api.heif_region_get_point_transformed(regions[0], ri2, h2)
        assert (x, y) == (1, 2)


class TestTilingAndGroups:
    def test_grid_tiling_api(self):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "unci")
        tiles = [api.heif_context_encode_image(ctx, _make_image(32, 32,
                                                                seed=i),
                                               enc) for i in range(4)]
        grid = api.heif_context_add_grid_image(ctx, 64, 64, 2, 2, tiles)
        ctx.set_primary_item(grid.item_id)
        t = api.heif_image_handle_get_image_tiling(grid)
        assert (t.num_columns, t.num_rows) == (2, 2)
        tid = api.heif_image_handle_get_grid_image_tile_id(grid, True,
                                                           1, 0)
        assert tid == tiles[1].item_id
        tile_img = api.heif_image_handle_decode_image_tile(grid,
                                                           tile_x=1,
                                                           tile_y=0)
        assert tile_img.width == 32

    def test_entity_groups(self):
        ctx = api.heif_context_alloc()
        enc = api.heif_context_get_encoder_for_format(ctx, "unci")
        small = api.heif_context_encode_image(ctx, _make_image(16, 16),
                                              enc)
        big = api.heif_context_encode_image(ctx, _make_image(64, 64),
                                            enc)
        gid = api.heif_context_add_pyramid_entity_group(
            ctx, [small.item_id, big.item_id])
        groups = api.heif_context_get_entity_groups(ctx, "pymd")
        assert len(groups) == 1
        assert groups[0].entities == [small.item_id, big.item_id]
        infos = api.heif_context_get_pyramid_entity_group_info(ctx, gid)
        assert len(infos) == 2


class TestComponents:
    def test_image_description(self):
        img = _make_image()
        desc = api.heif_image_get_image_description(img)
        assert api.heif_image_description_get_number_of_components(
            desc) == 3
        c0 = api.heif_image_description_get_component(desc, 0)
        assert api.heif_component_description_get_type(c0) == "Y"
        d2 = api.heif_image_description_create()
        api.heif_image_description_add_component(d2, "depth", "d",
                                                 "unsigned", 16)
        assert d2.components[0].bit_depth == 16


class TestSecurity:
    def test_limits(self):
        ctx = api.heif_context_alloc()
        lim = api.heif_context_get_security_limits(ctx)
        assert lim.max_image_size_pixels > 0
        api.heif_context_set_maximum_image_size_limit(ctx, 1024)
        assert ctx.limits.max_image_size_pixels == 1024 * 1024
        dis = api.heif_get_disabled_security_limits()
        assert dis.max_image_size_pixels in (0, None) or \
            dis.max_image_size_pixels > lim.max_image_size_pixels


def test_tai_item_properties():
    """taic/itai item properties (ref: heif_tai_timestamps.h,
    box.h:1812 Box_taic / :1892 Box_itai)."""
    import libheif_tpu.api as a

    ctx = a.heif_context_alloc()
    enc = a.heif_context_get_encoder_for_format(ctx, "unci")
    handle = a.heif_context_encode_image(ctx, _make_image(), enc, None)
    item_id = a.heif_image_handle_get_item_id(handle) \
        if hasattr(a, "heif_image_handle_get_item_id") else handle.item_id
    clock = a.heif_tai_clock_info_alloc()
    clock.time_uncertainty = 99
    clock.clock_resolution = 1000
    clock.clock_type = a.heif_tai_clock_info_clock_type_can_sync_to_atomic_source
    a.heif_item_set_property_tai_clock_info(ctx, item_id, clock)
    ts = a.heif_tai_timestamp_packet_alloc()
    ts.tai_timestamp = 1_000_000_007
    ts.synchronization_state = True
    a.heif_item_set_property_tai_timestamp(ctx, item_id, ts)

    data = ctx.write()
    ctx2 = a.HeifContext.read_from_bytes(data)
    pid = ctx2.primary_item_id
    clock2 = a.heif_item_get_property_tai_clock_info(ctx2, pid)
    assert clock2 is not None and clock2.time_uncertainty == 99
    assert clock2.clock_resolution == 1000
    ts2 = a.heif_item_get_property_tai_timestamp(ctx2, pid)
    assert ts2 is not None and ts2.tai_timestamp == 1_000_000_007
    assert ts2.synchronization_state


class TestEncoderParameterDescriptors:
    """Typed descriptors with validated ranges/string sets
    (ref: heif_encoding.h:154+; VERDICT r1 weak #8)."""

    def _enc(self):
        from libheif_tpu.api import encoding as E
        return E.heif_context_get_encoder_for_format(None, "unci")

    def test_typed_descriptors(self):
        from libheif_tpu.api import encoding as E
        enc = self._enc()
        params = E.heif_encoder_list_parameters(enc)
        assert all(isinstance(p, E.HeifEncoderParameter) for p in params)
        q = next(p for p in params if p.name == "quality")
        assert q.type == "integer" and q.have_minimum_maximum
        assert (q.minimum, q.maximum) == (0, 100)
        # dict-style compatibility retained
        assert q["name"] == "quality"
        assert q.get("maximum") == 100

    def test_integer_range_enforced(self):
        import pytest
        from libheif_tpu.api import encoding as E
        from libheif_tpu.core.error import HeifError
        enc = self._enc()
        E.heif_encoder_set_parameter_integer(enc, "quality", 80)
        with pytest.raises(HeifError):
            E.heif_encoder_set_parameter_integer(enc, "quality", 101)

    def test_string_set_enforced(self):
        import pytest
        from libheif_tpu.api import encoding as E
        from libheif_tpu.core.error import HeifError
        enc = self._enc()
        names = [p.name for p in E.heif_encoder_list_parameters(enc)]
        if "compression" not in names:
            pytest.skip("no string-set param on this encoder")
        E.heif_encoder_set_parameter_string(enc, "compression", "zlib")
        with pytest.raises(HeifError):
            E.heif_encoder_set_parameter_string(enc, "compression",
                                                "bogus")
