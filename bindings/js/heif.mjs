/**
 * Node.js binding for libheif_tpu — decode-oriented, mirroring the API
 * shape of the upstream emscripten binding (reference:
 * libheif/api/libheif/heif_emscripten.h: HeifDecoder / HeifImage with
 * get_width/get_height/display semantics).
 *
 * The upstream JS binding compiles the C++ core to WASM; here the
 * engine is the Python/JAX package, driven out-of-process through
 * tools/heif_dec.py (structured JSON + raw plane output), so no
 * emscripten toolchain is required.
 *
 * Usage:
 *   import { HeifDecoder } from "./heif.mjs";
 *   const dec = new HeifDecoder({ repo: "/path/to/checkout" });
 *   const images = await dec.decode(await fs.readFile("in.heic"));
 *   const img = images[0];          // { width, height }
 *   const rgba = await img.display();  // Uint8ClampedArray RGBA
 */

import { spawn } from "node:child_process";
import { mkdtemp, readFile, rm, writeFile } from "node:fs/promises";
import { tmpdir } from "node:os";
import { join } from "node:path";

function run(cmd, args, opts = {}) {
  return new Promise((resolve, reject) => {
    const p = spawn(cmd, args, { ...opts, stdio: ["ignore", "pipe", "pipe"] });
    let out = "", err = "";
    p.stdout.on("data", (d) => (out += d));
    p.stderr.on("data", (d) => (err += d));
    p.on("close", (code) =>
      code === 0 ? resolve(out) : reject(new Error(`${cmd} rc=${code}: ${err}`)));
    p.on("error", reject);
  });
}

export class HeifImage {
  constructor(meta, planePath) {
    this.width = meta.width;
    this.height = meta.height;
    this._planePath = planePath;
  }

  get_width() { return this.width; }
  get_height() { return this.height; }

  /** Interleaved RGBA pixels, upstream display() contract. */
  async display() {
    const raw = await readFile(this._planePath);
    return new Uint8ClampedArray(raw.buffer, raw.byteOffset, raw.length);
  }
}

export class HeifDecoder {
  /**
   * @param {{repo?: string, python?: string}} options — repo: path to
   * the libheif_tpu checkout; python: interpreter binary.
   */
  constructor(options = {}) {
    this.repo = options.repo ?? process.env.LIBHEIF_TPU_REPO ?? ".";
    this.python = options.python ?? "python3";
  }

  /**
   * Decode a HEIF/AVIF buffer. Resolves to an array of HeifImage
   * (primary first), matching the upstream decoder result shape.
   * @param {Buffer|Uint8Array} buffer
   */
  async decode(buffer) {
    const dir = await mkdtemp(join(tmpdir(), "heifjs-"));
    try {
      const input = join(dir, "input.heif");
      await writeFile(input, buffer);
      const rgbaPath = join(dir, "out.rgba");
      const out = await run(this.python, [
        join(this.repo, "tools", "heif_dec.py"),
        "--json", "--rgba-out", rgbaPath, input,
      ], { env: { ...process.env, PYTHONPATH: this.repo } });
      const meta = JSON.parse(out.trim().split("\n").pop());
      const img = new HeifImage(meta, rgbaPath);
      // keep the temp dir alive until the plane is read
      const origDisplay = img.display.bind(img);
      img.display = async () => {
        const data = await origDisplay();
        await rm(dir, { recursive: true, force: true });
        return data;
      };
      return [img];
    } catch (e) {
      await rm(dir, { recursive: true, force: true });
      throw e;
    }
  }
}

export default HeifDecoder;
