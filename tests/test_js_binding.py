"""Node.js binding (bindings/js/heif.mjs) end-to-end test.

Skipped when Node is absent (the CI image has no Node); the Python
backend it drives (tools/heif_dec.py --json --rgba-out) is tested
directly either way.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_heif_dec_json_rgba_backend(tmp_path):
    """The machine interface the JS binding depends on."""
    rgba = tmp_path / "out.rgba"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "heif_dec.py"),
         "--json", "--rgba-out", str(rgba),
         "/root/reference/examples/example.heic"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert (meta["width"], meta["height"], meta["channels"]) == \
        (1280, 854, 4)
    assert rgba.stat().st_size == 1280 * 854 * 4


@pytest.mark.skipif(shutil.which("node") is None, reason="no node")
def test_node_decode(tmp_path):
    script = tmp_path / "t.mjs"
    script.write_text(f"""
import {{ HeifDecoder }} from "{REPO}/bindings/js/heif.mjs";
import {{ readFile }} from "node:fs/promises";
const dec = new HeifDecoder({{ repo: "{REPO}" }});
const imgs = await dec.decode(
    await readFile("/root/reference/examples/example.heic"));
const img = imgs[0];
const rgba = await img.display();
console.log(JSON.stringify({{w: img.get_width(), h: img.get_height(),
                             n: rgba.length}}));
""")
    r = subprocess.run(["node", str(script)], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip())
    assert out == {"w": 1280, "h": 854, "n": 1280 * 854 * 4}
