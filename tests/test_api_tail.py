"""Functional coverage for the round-5 API-tail functions (the 46
formerly-MISSING rows in API_AUDIT.md; ref headers cited per call)."""

from __future__ import annotations

import numpy as np
import pytest

from libheif_tpu import api
from libheif_tpu.api import (encoding as E, image as I, image_handle as IH,
                             items as IT, metadata as M, regions as R,
                             tiling as TL, brands as B, library as L,
                             uncompressed as U)
from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                           Colorspace, Chroma)
from libheif_tpu.option_types import EncodingOptions


def _rgb(w, h, seed=0):
    rng = np.random.default_rng(seed)
    img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
    for ch in (Channel.R, Channel.G, Channel.B):
        img.set_plane(ch, rng.integers(0, 256, (h, w)).astype(np.uint8),
                      8)
    return img


def test_orientation_concat_group():
    """All 64 compositions form the dihedral group D4: concat must be
    associative and identity-respecting (ref: heif_encoding.h:278)."""
    for a in range(1, 9):
        assert E.heif_orientation_concat(1, a) == a
        assert E.heif_orientation_concat(a, 1) == a
    for a in range(1, 9):
        for b in range(1, 9):
            for c in range(1, 9):
                ab_c = E.heif_orientation_concat(
                    E.heif_orientation_concat(a, b), c)
                a_bc = E.heif_orientation_concat(
                    a, E.heif_orientation_concat(b, c))
                assert ab_c == a_bc
    assert E.heif_orientation_concat(6, 6) == 3      # 90+90 = 180
    assert E.heif_orientation_concat(2, 3) == 4      # mirrorH ∘ 180


def test_overlay_encode_decode_roundtrip():
    ctx = api.HeifContext()
    t1 = ctx.encode_image(_rgb(32, 32, 1), fmt="unci")
    t2 = ctx.encode_image(_rgb(32, 32, 2), fmt="unci")
    h = E.heif_context_add_overlay_image(
        ctx, 64, 48, [t1, t2], offsets=[(0, 0), (32, 16)],
        background_rgba=(0x8000, 0x4000, 0x2000, 0xFFFF))
    ctx.set_primary_item(h.item_id)
    import tempfile
    import os
    fd, path = tempfile.mkstemp(suffix=".heif")
    os.close(fd)
    try:
        ctx.write_to_file(path)
        ctx2 = api.HeifContext.read_from_file(path)
        img = ctx2.decode_image(ctx2.primary_item_id)
        assert img.width == 64 and img.height == 48
    finally:
        os.unlink(path)


def test_image_extract_and_extend():
    img = _rgb(64, 48, 3)
    sub = I.heif_image_extract_area(img, 8, 4, 16, 12)
    assert sub.width == 16 and sub.height == 12
    assert np.array_equal(np.asarray(sub.plane(Channel.R)),
                          np.asarray(img.plane(Channel.R))[4:16, 8:24])
    I.heif_image_extend_to_size_fill_with_zero(img, 80, 60)
    assert img.width == 80 and img.height == 60
    pl = np.asarray(img.plane(Channel.G))
    assert pl.shape == (60, 80) and (pl[:, 64:] == 0).all()


def test_image_plane2_and_safe_add():
    img = PixelImage(16, 16, Colorspace.Monochrome, Chroma.Monochrome)
    I.heif_image_add_plane_safe(img, Channel.Y, 16, 16, 8)
    p = I.heif_image_get_plane2(img, Channel.Y)
    p[:] = 7
    ro = I.heif_image_get_plane_readonly2(img, Channel.Y)
    assert not ro.flags.writeable and int(ro[0, 0]) == 7
    from libheif_tpu.core.limits import SecurityLimits
    with pytest.raises(Exception):
        I.heif_image_add_plane_safe(
            img, Channel.Alpha, 1 << 20, 1 << 20, 8,
            SecurityLimits(max_image_size_pixels=1 << 16))


def test_handle_pasp_gimi_elng():
    ctx = api.HeifContext()
    iid = ctx.encode_image(_rgb(24, 24, 4), fmt="unci")
    from libheif_tpu.api.image_handle import heif_image_handle
    h = heif_image_handle(ctx, iid)
    assert IH.heif_image_handle_get_pixel_aspect_ratio(h) == (False, 1, 1)
    IH.heif_image_handle_set_pixel_aspect_ratio(h, 4, 3)
    assert IH.heif_image_handle_get_pixel_aspect_ratio(h) == (True, 4, 3)
    assert IH.heif_image_handle_get_gimi_content_id(h) is None
    IH.heif_image_handle_set_gimi_content_id(h, "urn:uuid:42")
    assert IH.heif_image_handle_get_gimi_content_id(h) == "urn:uuid:42"
    assert IT.heif_item_get_property_extended_language(ctx, iid) is None
    IT.heif_item_set_property_extended_language(ctx, iid, "de-DE")
    assert IT.heif_item_get_property_extended_language(ctx, iid) == \
        "de-DE"


def test_xmp2_compressed_roundtrip():
    ctx = api.HeifContext()
    iid = ctx.encode_image(_rgb(16, 16, 5), fmt="unci")
    from libheif_tpu.api.image_handle import heif_image_handle
    h = heif_image_handle(ctx, iid)
    xmp = b"<x:xmpmeta>" + b"payload " * 50 + b"</x:xmpmeta>"
    assert M.heif_metadata_compression_method_supported("deflate")
    M.heif_context_add_XMP_metadata2(ctx, h, xmp, "deflate")
    import tempfile
    import os
    fd, path = tempfile.mkstemp(suffix=".heif")
    os.close(fd)
    try:
        ctx.write_to_file(path)
        ctx2 = api.HeifContext.read_from_file(path)
        metas = ctx2.get_metadata_blocks(ctx2.primary_item_id)
        assert metas, "compressed XMP metadata block missing"
    finally:
        os.unlink(path)


def test_region_inline_mask_image_roundtrip():
    ctx = api.HeifContext()
    iid = ctx.encode_image(_rgb(64, 64, 6), fmt="unci")
    ri = ctx.add_region_item(iid, 64, 64)
    mask = PixelImage(16, 8, Colorspace.Monochrome, Chroma.Monochrome)
    m = np.zeros((8, 16), np.uint8)
    m[2:6, 3:12] = 255
    mask.set_plane(Channel.Y, m, 8)
    reg = R.heif_region_item_add_region_inline_mask(ri, 1, 2, 16, 8,
                                                    mask)
    x, y, w, h, out = R.heif_region_get_mask_image(reg)
    assert (x, y, w, h) == (1, 2, 16, 8)
    assert np.array_equal(np.asarray(out.plane(Channel.Y)), m)


def test_encode_grid():
    ctx = api.HeifContext()
    tiles = [_rgb(32, 32, 10 + i) for i in range(4)]
    h = TL.heif_context_encode_grid(ctx, tiles, rows=2, columns=2,
                                    encoder=None,
                                    input_options=EncodingOptions())
    ctx.set_primary_item(h.item_id)
    img = ctx.decode_image(h.item_id)
    assert img.width == 64 and img.height == 64


def test_misc_tail():
    assert isinstance(
        B.heif_has_compatible_filetype(b"\0" * 16), bool)
    L.heif_string_release("x")
    IT.heif_release_item_references(None)
    o = EncodingOptions(quality=73)
    o2 = E.heif_encoding_options_copy(o)
    assert o2.quality == 73 and o2 is not o
    p = U.heif_unci_image_parameters_alloc()
    p2 = U.heif_unci_image_parameters_copy(p)
    assert p2 is not p
    descs = E.heif_context_get_encoder_descriptors(None)
    assert descs
    d = descs[0]
    assert E.heif_encoder_descriptor_supportes_lossy_compression(d) == \
        E.heif_encoder_descriptor_supports_lossy_compression(d)
    have_min, mn, have_max, mx = \
        E.heif_encoder_parameter_get_valid_integer_range(
            {"name": "quality", "type": "integer", "minimum": 0,
             "maximum": 100})
    assert have_min and have_max and (mn, mx) == (0, 100)
