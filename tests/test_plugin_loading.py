"""Dynamic plugin loading (api/library.py heif_load_plugin*).

A plugin is a Python module exposing register() using the same
registry contract as the built-in codec modules (reference:
libheif/init.cc dlopen plugin path + heif_library.h API)."""

import os
import textwrap

import numpy as np
import pytest

from libheif_tpu.api import library as L
from libheif_tpu.codecs import registry
from libheif_tpu.core.error import HeifError

PLUGIN_SRC = textwrap.dedent("""
    from libheif_tpu.codecs.registry import Decoder, register_decoder

    class ToyDecoder(Decoder):
        id = "toy-plugin"
        format = "toyfmt"
        priority = 10

        def decode_single_image(self, config_box, data, declared_size=None,
                                limits=None):
            raise NotImplementedError

    def register():
        register_decoder(ToyDecoder())
""")


def test_load_and_unload(tmp_path):
    p = tmp_path / "toy_plugin.py"
    p.write_text(PLUGIN_SRC)
    assert not registry.have_decoder("toyfmt")
    handle = L.heif_load_plugin(str(p))
    assert registry.have_decoder("toyfmt")
    assert len(handle.decoders) == 1
    assert ("toyfmt", "toy-plugin") in registry.list_decoders()
    L.heif_unload_plugin(handle)
    assert not registry.have_decoder("toyfmt")


def test_load_plugins_directory(tmp_path):
    (tmp_path / "toy_plugin.py").write_text(PLUGIN_SRC)
    (tmp_path / "_private.py").write_text("raise RuntimeError")
    (tmp_path / "broken.py").write_text("this is not python !!")
    handles = L.heif_load_plugins(str(tmp_path))
    try:
        assert len(handles) == 1
        assert registry.have_decoder("toyfmt")
    finally:
        for h in handles:
            L.heif_unload_plugin(h)
    assert not registry.have_decoder("toyfmt")


def test_load_missing_and_invalid(tmp_path):
    with pytest.raises(HeifError):
        L.heif_load_plugin(str(tmp_path / "nope.py"))
    p = tmp_path / "noreg.py"
    p.write_text("x = 1\n")
    with pytest.raises(HeifError):
        L.heif_load_plugin(str(p))


def test_plugin_directories_env(tmp_path, monkeypatch):
    (tmp_path / "toy_plugin.py").write_text(PLUGIN_SRC)
    monkeypatch.setenv("LIBHEIF_TPU_PLUGIN_PATH", str(tmp_path))
    assert L.heif_get_plugin_directories() == [str(tmp_path)]
    paths = L.heif_get_plugin_paths()
    assert paths == [str(tmp_path / "toy_plugin.py")]


def test_plugin_decoder_overrides_builtin(tmp_path):
    """A higher-priority plugin decoder takes over a real format and
    actually serves context decodes; unloading restores the builtin."""
    src = textwrap.dedent("""
        from libheif_tpu.codecs.registry import Decoder, register_decoder
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        import numpy as np

        class FlatJpeg(Decoder):
            id = "flat-jpeg-plugin"
            format = "jpeg"
            priority = 1000

            def decode_single_image(self, config_box, data,
                                    declared_size=None, limits=None):
                img = PixelImage(8, 8, Colorspace.Monochrome,
                                 Chroma.Monochrome)
                img.set_plane(Channel.Y,
                              np.full((8, 8), 42, np.uint8), 8)
                return img

        def register():
            register_decoder(FlatJpeg())
    """)
    p = tmp_path / "override.py"
    p.write_text(src)
    handle = L.heif_load_plugin(str(p))
    try:
        d = registry.get_decoder("jpeg")
        assert d.id == "flat-jpeg-plugin"
        img = d.decode_single_image(None, b"")
        assert int(np.asarray(img.np_plane("Y"))[0, 0]) == 42
    finally:
        L.heif_unload_plugin(handle)
    d = registry.get_decoder("jpeg")
    assert d is not None and d.id != "flat-jpeg-plugin"
