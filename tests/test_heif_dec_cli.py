"""heif-dec CLI feature tests (reference: examples/heif_dec.cc)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))


@pytest.fixture(scope="module")
def sample_heif(tmp_path_factory):
    """A grid HEIF with alpha + exif, encoded via the CLI."""
    import heif_enc
    from libheif_tpu import io as hio
    d = tmp_path_factory.mktemp("deccli")
    yy, xx = np.mgrid[0:64, 0:96]
    arr = np.dstack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy)) % 256,
                     np.full((64, 96), 200)]).astype(np.uint8)
    png = d / "in.png"
    png.write_bytes(hio.write_png(arr))
    exif = d / "m.exif"
    exif.write_bytes(b"\0\0\0\0MM\0\x2a" + b"\0" * 16)
    out = d / "s.heic"
    assert heif_enc.main([str(png), "-o", str(out), "-c", "unci",
                          "--cut-tiles", "32",
                          "--exif", str(exif)]) == 0
    return str(out), arr


class TestDecCLI:

    def test_decode_png_roundtrip(self, sample_heif, tmp_path):
        import heif_dec
        from libheif_tpu import io as hio
        src, arr = sample_heif
        out = str(tmp_path / "o.png")
        assert heif_dec.main([src, out, "--quiet"]) == 0
        got, _ = hio.read_png(open(out, "rb").read())
        assert got.shape == (64, 96, 4)
        assert np.array_equal(got[:, :, 0], arr[:, :, 0])
        assert np.array_equal(got[:, :, 3], arr[:, :, 3])

    def test_tiles_output(self, sample_heif, tmp_path):
        import heif_dec
        from libheif_tpu import io as hio
        src, arr = sample_heif
        out = str(tmp_path / "t.png")
        assert heif_dec.main([src, out, "--tiles", "--quiet"]) == 0
        t11 = str(tmp_path / "t-tile-1-1.png")
        assert os.path.exists(t11)
        got, _ = hio.read_png(open(t11, "rb").read())
        assert np.array_equal(got[:, :, 1], arr[32:64, 32:64, 1])

    def test_with_exif(self, sample_heif, tmp_path):
        import heif_dec
        src, _ = sample_heif
        out = str(tmp_path / "e.png")
        assert heif_dec.main([src, out, "--with-exif",
                              "--skip-exif-offset", "--quiet"]) == 0
        exif = open(str(tmp_path / "e.exif"), "rb").read()
        assert exif.startswith(b"MM\0\x2a")    # offset prefix stripped

    def test_with_aux_alpha(self, sample_heif, tmp_path):
        import heif_enc
        import heif_dec
        from libheif_tpu import io as hio
        src, arr = sample_heif
        out = str(tmp_path / "x.png")
        assert heif_dec.main([src, out, "--with-aux", "--quiet"]) == 0
        # grid alpha rides the grid item; aux file may or may not exist
        # depending on linkage — but the plain unci alpha case must:
        png = str(tmp_path / "a_in.png")
        open(png, "wb").write(hio.write_png(arr))
        heic = str(tmp_path / "a.heic")
        assert heif_enc.main([png, "-o", heic, "-c", "unci"]) == 0
        out2 = str(tmp_path / "y.png")
        assert heif_dec.main([heic, out2, "--with-aux", "--quiet"]) == 0
        aux = str(tmp_path / "y-alpha.png")
        assert os.path.exists(aux)
        got, _ = hio.read_png(open(aux, "rb").read())
        assert np.all(got[..., 0] == 200)

    def test_sequence_decode(self, tmp_path):
        import heif_enc
        import heif_dec
        hdr = b"YUV4MPEG2 W32 H16 F25:1 Ip A1:1 C420jpeg\n"
        body = b""
        for i in range(3):
            y = np.full((16, 32), 20 + i * 40, np.uint8)
            u = np.full((8, 16), 128, np.uint8)
            v = np.full((8, 16), 128, np.uint8)
            body += b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
        src = tmp_path / "s.y4m"
        src.write_bytes(hdr + body)
        heic = str(tmp_path / "sq.heic")
        assert heif_enc.main([str(src), "-S", "-c", "hevc", "-q", "90",
                              "-o", heic]) == 0
        out = str(tmp_path / "o.y4m")
        assert heif_dec.main([heic, out, "--sequence", "--quiet"]) == 0
        from libheif_tpu import io as hio
        r = hio.read_y4m(open(out, "rb").read())
        assert len(r["frames"]) == 3

    def test_version_and_list(self, capsys):
        import heif_dec
        assert heif_dec.main(["-v"]) == 0
        assert heif_dec.main(["--list-decoders"]) == 0
        txt = capsys.readouterr().out
        assert "hevc" in txt and "av1" in txt

    def test_no_input_errors(self, capsys):
        import heif_dec
        assert heif_dec.main([]) == 1
