"""heif-enc CLI feature tests (reference: examples/heif_enc.cc).

Covers the reference CLI's encode surface: tiling methods
(--cut-tiles with grid / tili / unci), tiled input assembly (-T),
pyramid groups, thumbnails, transform/colour properties, sequences,
and parameter introspection (-P / -p)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))


@pytest.fixture(scope="module")
def png_path(tmp_path_factory):
    from libheif_tpu import io as hio
    d = tmp_path_factory.mktemp("enccli")
    yy, xx = np.mgrid[0:96, 0:160]
    arr = np.dstack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) // 2) % 256]).astype(np.uint8)
    p = d / "in.png"
    p.write_bytes(hio.write_png(arr))
    return str(p), arr


def _decode(path):
    from libheif_tpu.api import HeifContext
    ctx = HeifContext.read_from_file(path)
    return ctx, ctx.decode_image(ctx.primary_item_id)


class TestEncCLI:

    def test_cut_tiles_grid(self, png_path, tmp_path):
        import heif_enc
        p, arr = png_path
        out = str(tmp_path / "g.heic")
        assert heif_enc.main([p, "-o", out, "--cut-tiles", "64",
                              "-c", "unci"]) == 0
        ctx, img = _decode(out)
        from libheif_tpu.image.pixel_image import Channel
        assert (img.width, img.height) == (160, 96)
        assert ctx.get_image_info(ctx.primary_item_id)["type"] == "grid"
        assert np.array_equal(np.asarray(img.plane(Channel.R)),
                              arr[:, :, 0])

    def test_cut_tiles_grid_partial_edge(self, png_path, tmp_path):
        """Non-multiple tile size: edge tiles are padded, grid output
        size crops the padding back (ref: grid semantics)."""
        import heif_enc
        p, arr = png_path
        out = str(tmp_path / "gp.heic")
        assert heif_enc.main([p, "-o", out, "--cut-tiles", "100",
                              "-c", "unci"]) == 0
        ctx, img = _decode(out)
        from libheif_tpu.image.pixel_image import Channel
        assert (img.width, img.height) == (160, 96)
        assert np.array_equal(np.asarray(img.plane(Channel.G)),
                              arr[:, :, 1])

    def test_cut_tiles_tili(self, png_path, tmp_path):
        import heif_enc
        p, arr = png_path
        out = str(tmp_path / "t.heic")
        assert heif_enc.main([p, "-o", out, "--cut-tiles", "64",
                              "--tiling-method", "tili",
                              "-c", "unci"]) == 0
        from libheif_tpu.api import HeifContext
        from libheif_tpu.image.pixel_image import Channel
        ctx = HeifContext.read_from_file(out)
        pid = ctx.primary_item_id
        t = ctx.get_image_tiling(pid)
        assert (t.num_rows, t.num_columns) == (2, 3)
        tile = ctx.decode_tile(pid, 1, 1)
        # tiles are full tile_size; only 32 rows are inside the image
        assert np.array_equal(np.asarray(tile.plane(Channel.R))[:32],
                              arr[64:96, 64:128, 0])

    def test_cut_tiles_unci_method(self, png_path, tmp_path):
        import heif_enc
        p, arr = png_path
        out = str(tmp_path / "u.heic")
        assert heif_enc.main([p, "-o", out, "--cut-tiles", "32",
                              "--tiling-method", "unci"]) == 0
        ctx, img = _decode(out)
        from libheif_tpu.image.pixel_image import Channel
        assert np.array_equal(np.asarray(img.plane(Channel.B)),
                              arr[:, :, 2])
        t = ctx.get_image_tiling(ctx.primary_item_id)
        assert (t.num_rows, t.num_columns) == (3, 5)

    def test_tiled_input(self, png_path, tmp_path):
        import heif_enc
        from libheif_tpu import io as hio
        p, arr = png_path
        paths = []
        for ty in range(2):
            for tx in range(2):
                tp = tmp_path / f"tile-{ty}-{tx}.png"
                tp.write_bytes(hio.write_png(
                    arr[ty * 48:(ty + 1) * 48, tx * 80:(tx + 1) * 80]))
                paths.append(str(tp))
        out = str(tmp_path / "tin.heic")
        assert heif_enc.main(paths + ["-T", "-o", out,
                                      "-c", "unci"]) == 0
        ctx, img = _decode(out)
        from libheif_tpu.image.pixel_image import Channel
        assert (img.width, img.height) == (160, 96)
        assert np.array_equal(np.asarray(img.plane(Channel.R)),
                              arr[:, :, 0])

    def test_pyramid_group(self, png_path, tmp_path):
        import heif_enc
        p, _ = png_path
        out = str(tmp_path / "p.heic")
        assert heif_enc.main([p, "-o", out, "--add-pyramid-group",
                              "-c", "unci"]) == 0
        from libheif_tpu.api import HeifContext
        from libheif_tpu.api import experimental as exp
        ctx = HeifContext.read_from_file(out)
        groups = [g for g in ctx.file.grpl.children]
        assert groups
        info = exp.heif_context_get_pyramid_entity_group_info(
            ctx, groups[0].group_id)
        assert len(info) >= 1

    def test_thumbnail_props_and_transforms(self, png_path, tmp_path):
        import heif_enc
        p, _ = png_path
        out = str(tmp_path / "a.heic")
        assert heif_enc.main([p, "-o", out, "-c", "unci", "-t", "32",
                              "--rotate-cw", "90", "--clli", "1000,400",
                              "--pasp", "2,1",
                              "--pitm-description", "test image"]) == 0
        from libheif_tpu.api import HeifContext
        from libheif_tpu.api import properties as prop
        ctx = HeifContext.read_from_file(out)
        pid = ctx.primary_item_id
        img = ctx.decode_image(pid)
        assert (img.width, img.height) == (96, 160)    # rotated
        info = ctx.get_image_info(pid)
        assert len(info["thumbnails"]) == 1
        clli = prop.heif_item_get_property_content_light_level(ctx, pid)
        assert clli.max_content_light_level == 1000
        pasp = prop.heif_item_get_property_pixel_aspect_ratio(ctx, pid)
        assert pasp == (2, 1)
        udes_ids = prop.heif_item_get_properties_of_type(ctx, pid,
                                                         "udes")
        assert udes_ids
        udes = prop.heif_item_get_property_user_description(
            ctx, pid, udes_ids[0])
        assert "test image" in udes.description

    def test_sequence_mode(self, tmp_path):
        import heif_enc
        hdr = b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420jpeg\n"
        body = b""
        for i in range(4):
            y = ((np.mgrid[0:48, 0:64][1] * 4 + i * 16) % 256
                 ).astype(np.uint8)
            u = np.full((24, 32), 90 + i, np.uint8)
            v = np.full((24, 32), 150, np.uint8)
            body += b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
        src = tmp_path / "s.y4m"
        src.write_bytes(hdr + body)
        out = str(tmp_path / "seq.heic")
        assert heif_enc.main([str(src), "-S", "-c", "hevc", "-q", "85",
                              "--fps", "30", "--max-frames", "3",
                              "-o", out]) == 0
        from libheif_tpu.api import HeifContext
        ctx = HeifContext.read_from_file(out)
        assert ctx.has_sequence()
        tr = ctx.tracks[0]
        n = 0
        while True:
            fr = tr.decode_next_image()
            if fr is None:
                break
            n += 1
        assert n == 3

    def test_params_listing_and_set(self, capsys, png_path, tmp_path):
        import heif_enc
        assert heif_enc.main(["-P", "-c", "hevc"]) == 0
        txt = capsys.readouterr().out
        assert "quality" in txt and "lossless" in txt
        p, _ = png_path
        out = str(tmp_path / "q.heic")
        assert heif_enc.main([p, "-o", out, "-c", "hevc",
                              "-p", "quality=80"]) == 0
        assert os.path.getsize(out) > 0

    def test_list_encoders(self, capsys):
        import heif_enc
        assert heif_enc.main(["--list-encoders"]) == 0
        txt = capsys.readouterr().out
        for fmt in ("hevc", "av1", "unci", "jpeg"):
            assert fmt in txt
