/* Sample native plugin: the "grayraw" codec.
 *
 * Coded format: 8-byte header (width, height as big-endian u32)
 * followed by width*height literal gray8 samples.  Exists to exercise
 * the dlopen plugin boundary (heif_tpu_plugin.h) the same way the
 * reference's plugins wrap external codecs (reference:
 * libheif/plugins/decoder_libde265.cc:479-521 function table export).
 *
 * Build: gcc -shared -fPIC example_plugin.c -o grayraw_plugin.so
 */

#include <stdlib.h>
#include <string.h>

#include "heif_tpu_plugin.h"

static uint32_t rd32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static void wr32(uint8_t* p, uint32_t v) {
  p[0] = (uint8_t)(v >> 24);
  p[1] = (uint8_t)(v >> 16);
  p[2] = (uint8_t)(v >> 8);
  p[3] = (uint8_t)v;
}

static int grayraw_decode(const uint8_t* data, size_t size,
                          uint8_t** out_plane, int* out_width,
                          int* out_height) {
  if (size < 8) return 1;
  uint32_t w = rd32(data);
  uint32_t h = rd32(data + 4);
  if (w == 0 || h == 0 || w > 1u << 15 || h > 1u << 15) return 2;
  if (size < 8 + (size_t)w * h) return 3;
  uint8_t* plane = (uint8_t*)malloc((size_t)w * h);
  if (!plane) return 4;
  memcpy(plane, data + 8, (size_t)w * h);
  *out_plane = plane;
  *out_width = (int)w;
  *out_height = (int)h;
  return 0;
}

static void grayraw_free_plane(uint8_t* plane) { free(plane); }

static int grayraw_encode(const uint8_t* plane, int width, int height,
                          uint8_t** out_data, size_t* out_size) {
  if (width <= 0 || height <= 0) return 1;
  size_t n = (size_t)width * height;
  uint8_t* buf = (uint8_t*)malloc(8 + n);
  if (!buf) return 2;
  wr32(buf, (uint32_t)width);
  wr32(buf + 4, (uint32_t)height);
  memcpy(buf + 8, plane, n);
  *out_data = buf;
  *out_size = 8 + n;
  return 0;
}

static void grayraw_free_data(uint8_t* data) { free(data); }

static const heif_tpu_decoder_plugin kDecoder = {
    HEIF_TPU_PLUGIN_API_VERSION, "c-grayraw", "grayraw", 150,
    grayraw_decode, grayraw_free_plane,
};

static const heif_tpu_encoder_plugin kEncoder = {
    HEIF_TPU_PLUGIN_API_VERSION, "c-grayraw", "grayraw", 150,
    grayraw_encode, grayraw_free_data,
};

const heif_tpu_decoder_plugin* heif_tpu_get_decoder_plugin(void) {
  return &kDecoder;
}

const heif_tpu_encoder_plugin* heif_tpu_get_encoder_plugin(void) {
  return &kEncoder;
}
