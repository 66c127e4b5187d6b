"""JPEG/JFIF import/export (heifio equivalent).

Re-designed equivalent of the reference's heifio JPEG converters
(reference: heifio/decoder_jpeg.cc, heifio/encoder_jpeg.cc) — but
instead of linking libjpeg, the file codec IS our own JPEG codec core
(codecs/jpeg), which is bit-exact against libjpeg on decode (see
tests/test_jpeg_codec.py).  Standalone .jpg files are the same JFIF
streams a 'jpeg' HEIF item carries, so both paths share one decoder.
"""

from __future__ import annotations

from typing import Optional

from ..core.error import HeifError, SubError


def read_jpeg(data: bytes):
    """JFIF bytes → PixelImage (YCbCr, subsampling preserved)."""
    from ..codecs.jpeg.decoder import JpegDecoder
    return JpegDecoder().decode_single_image(None, data)


def write_jpeg(img, quality: int = 90) -> bytes:
    """PixelImage → JFIF bytes."""
    from ..codecs.jpeg.encoder import JpegEncoder
    from ..option_types import EncodingOptions
    data, _cfg, _props = JpegEncoder().encode_single_image(
        img, EncodingOptions(quality=quality))
    return data


def read_jpeg_file(path: str):
    with open(path, "rb") as f:
        return read_jpeg(f.read())


def write_jpeg_file(img, path: str, quality: int = 90) -> None:
    with open(path, "wb") as f:
        f.write(write_jpeg(img, quality))
