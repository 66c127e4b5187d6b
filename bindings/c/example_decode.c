/* Minimal consumer of the libheif_tpu C shim — the same flow as the
 * upstream libheif README example (context → primary handle → decode →
 * plane access), plus an encode round-trip.
 *
 * Build & run:
 *   gcc bindings/c/example_decode.c -Lbuild -lheif_shim \
 *       -lpython3.12 -o example_decode
 *   ./example_decode input.heic
 *
 * Prints "<width>x<height> ok" plus a plane checksum, exits non-zero
 * on any API error. Used by tests/test_c_shim.py as the end-to-end
 * binding check.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "heif_shim.h"

static int fail(const char* what, heif_error e) {
  fprintf(stderr, "%s: code=%d sub=%d %s\n", what, (int)e.code,
          e.subcode, e.message ? e.message : "");
  return 1;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s file.heic [module_path] [out.heic]\n",
            argv[0]);
    return 2;
  }
  if (argc > 2) heif_shim_set_module_path(argv[2]);

  printf("version: %s\n", heif_get_version());

  heif_context* ctx = heif_context_alloc();
  if (!ctx) {
    fprintf(stderr, "heif_context_alloc failed (interpreter init?)\n");
    return 1;
  }
  heif_error e = heif_context_read_from_file(ctx, argv[1], NULL);
  if (e.code) return fail("read_from_file", e);

  printf("top-level images: %d\n",
         heif_context_get_number_of_top_level_images(ctx));

  heif_image_handle* handle = NULL;
  e = heif_context_get_primary_image_handle(ctx, &handle);
  if (e.code) return fail("primary_handle", e);
  int w = heif_image_handle_get_width(handle);
  int h = heif_image_handle_get_height(handle);
  printf("%dx%d ok\n", w, h);

  heif_image* img = NULL;
  e = heif_decode_image(handle, &img, heif_colorspace_undefined,
                        heif_chroma_undefined, NULL);
  if (e.code) return fail("decode", e);

  /* checksum whichever of Y / R / interleaved exists */
  enum heif_channel chans[3] = {heif_channel_Y, heif_channel_R,
                                heif_channel_interleaved};
  for (int i = 0; i < 3; i++) {
    if (!heif_image_has_channel(img, chans[i])) continue;
    int stride = 0;
    const uint8_t* p = heif_image_get_plane_readonly(img, chans[i],
                                                     &stride);
    if (!p) {
      fprintf(stderr, "plane pointer NULL\n");
      return 1;
    }
    int pw = heif_image_get_width(img, chans[i]);
    int ph = heif_image_get_height(img, chans[i]);
    uint64_t sum = 0;
    for (int y = 0; y < ph; y++)
      for (int x = 0; x < pw; x++) sum += p[(size_t)y * stride + x];
    printf("channel %d: %dx%d stride %d checksum %llu\n", (int)chans[i],
           pw, ph, stride, (unsigned long long)sum);
    break;
  }

  /* optional encode round-trip */
  if (argc > 3) {
    heif_context* out_ctx = heif_context_alloc();
    e = heif_context_encode_image2(out_ctx, img, "hevc", 60, NULL);
    if (e.code) return fail("encode", e);
    e = heif_context_write_to_file(out_ctx, argv[3]);
    if (e.code) return fail("write", e);
    printf("wrote %s\n", argv[3]);
    heif_context_free(out_ctx);
  }

  heif_image_release(img);
  heif_image_handle_release(handle);
  heif_context_free(ctx);
  printf("done\n");
  return 0;
}
