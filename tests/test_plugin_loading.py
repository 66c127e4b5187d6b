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


# ---------------------------------------------------------------- native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CDIR = os.path.join(REPO, "bindings", "c")


@pytest.fixture(scope="module")
def native_plugin_so(tmp_path_factory):
    """Compile the sample C plugin (bindings/c/example_plugin.c) into a
    loadable shared object — the dlopen half of the plugin system
    (ref: init.cc:349, plugins_unix.cc)."""
    import shutil
    import subprocess
    if shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    tmp = tmp_path_factory.mktemp("nativeplug")
    so = tmp / "grayraw_plugin.so"
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-Wall", "-Werror",
         os.path.join(CDIR, "example_plugin.c"), f"-I{CDIR}",
         "-o", str(so)],
        check=True, capture_output=True)
    return str(so)


def test_native_plugin_roundtrip(native_plugin_so):
    """dlopen a compiled .so plugin, run its encoder + decoder through
    the registry, and unload it."""
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    assert not registry.have_decoder("grayraw")
    handle = L.heif_load_plugin(native_plugin_so)
    try:
        assert len(handle.decoders) == 1 and len(handle.encoders) == 1
        assert registry.have_decoder("grayraw")
        assert registry.have_encoder("grayraw")
        assert ("grayraw", "c-grayraw") in registry.list_decoders()

        rng = np.random.default_rng(5)
        src = rng.integers(0, 256, (13, 29), np.uint8)
        img = PixelImage(29, 13, Colorspace.Monochrome,
                         Chroma.Monochrome)
        img.set_plane(Channel.Y, src, 8)

        enc = registry.get_encoder("grayraw")
        data, _cfg, _props = enc.encode_single_image(img)
        assert data[:8] == (29).to_bytes(4, "big") + \
            (13).to_bytes(4, "big")

        dec = registry.get_decoder("grayraw")
        out = dec.decode_single_image(None, data)
        assert np.array_equal(np.asarray(out.plane(Channel.Y)), src)

        # decoder error propagation: truncated payload → HeifError
        with pytest.raises(HeifError):
            dec.decode_single_image(None, data[:10])
    finally:
        L.heif_unload_plugin(handle)
    assert not registry.have_decoder("grayraw")
    assert not registry.have_encoder("grayraw")


def test_native_plugin_security_limits(native_plugin_so):
    """Native-decoded dimensions still pass through security limits."""
    from libheif_tpu.core.limits import SecurityLimits
    handle = L.heif_load_plugin(native_plugin_so)
    try:
        dec = registry.get_decoder("grayraw")
        payload = (200).to_bytes(4, "big") + (200).to_bytes(4, "big") + \
            bytes(200 * 200)
        lim = SecurityLimits(max_image_size_pixels=100)
        with pytest.raises(HeifError):
            dec.decode_single_image(None, payload, limits=lim)
    finally:
        L.heif_unload_plugin(handle)


def test_native_plugin_error_paths(tmp_path):
    """Non-plugin shared objects and missing files map to HeifError."""
    import shutil
    import subprocess
    if shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    # a real .so with no plugin tables
    src = tmp_path / "empty.c"
    src.write_text("int not_a_plugin(void) { return 1; }\n")
    so = tmp_path / "empty.so"
    subprocess.run(["gcc", "-shared", "-fPIC", str(src), "-o", str(so)],
                   check=True, capture_output=True)
    with pytest.raises(HeifError):
        L.heif_load_plugin(str(so))
    # garbage bytes
    bad = tmp_path / "garbage.so"
    bad.write_bytes(b"\x7fELFnot really")
    with pytest.raises(HeifError):
        L.heif_load_plugin(str(bad))


def test_mixed_directory_scan(native_plugin_so, tmp_path, monkeypatch):
    """heif_load_plugins picks up both .py modules and .so natives."""
    import shutil
    (tmp_path / "toy_plugin.py").write_text(PLUGIN_SRC)
    shutil.copy(native_plugin_so, tmp_path / "grayraw_plugin.so")
    handles = L.heif_load_plugins(str(tmp_path))
    try:
        assert len(handles) == 2
        assert registry.have_decoder("toyfmt")
        assert registry.have_decoder("grayraw")
    finally:
        for h in handles:
            L.heif_unload_plugin(h)
    assert not registry.have_decoder("toyfmt")
    assert not registry.have_decoder("grayraw")
    monkeypatch.setenv("LIBHEIF_TPU_PLUGIN_PATH", str(tmp_path))
    assert str(tmp_path / "grayraw_plugin.so") in L.heif_get_plugin_paths()


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


def test_heif_init_autoloads_plugin_directories(tmp_path, monkeypatch):
    """heif_init scans LIBHEIF_TPU_PLUGIN_PATH and loads plugins; the
    matching heif_deinit unloads them (ref: init.cc:108,349)."""
    (tmp_path / "toy_plugin.py").write_text(PLUGIN_SRC)
    monkeypatch.setenv("LIBHEIF_TPU_PLUGIN_PATH", str(tmp_path))
    assert not registry.have_decoder("toyfmt")
    L.heif_init()
    try:
        assert registry.have_decoder("toyfmt")
        # nested init/deinit keeps them loaded
        L.heif_init()
        L.heif_deinit()
        assert registry.have_decoder("toyfmt")
    finally:
        L.heif_deinit()
    assert not registry.have_decoder("toyfmt")
