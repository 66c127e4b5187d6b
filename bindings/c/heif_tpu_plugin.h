/* libheif_tpu native plugin ABI.
 *
 * The dlopen plugin boundary of this framework: a shared object
 * exports heif_tpu_get_decoder_plugin() / heif_tpu_get_encoder_plugin()
 * returning static function tables, and heif_load_plugin("…/plugin.so")
 * loads it into the codec registry at runtime — the TPU-native analog
 * of the reference's plugin ABI and directory loader (reference:
 * libheif/api/libheif/heif_plugin.h:85,192 heif_decoder_plugin /
 * heif_encoder_plugin; libheif/init.cc:349 dlopen loading;
 * libheif/plugins_unix.cc).
 *
 * Pixel interchange is a planar gray8 buffer (single component) in
 * ABI v1 — enough for mask/aux codecs and for validating the dlopen
 * boundary end-to-end; richer pixel layouts ride the C shim
 * (heif_shim.h heif_image) rather than this table.
 */

#ifndef LIBHEIF_TPU_PLUGIN_H
#define LIBHEIF_TPU_PLUGIN_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define HEIF_TPU_PLUGIN_API_VERSION 1

typedef struct heif_tpu_decoder_plugin {
  int plugin_api_version;     /* HEIF_TPU_PLUGIN_API_VERSION */
  const char* id;             /* unique decoder id, e.g. "c-grayraw" */
  const char* format;         /* compression format name it decodes */
  int priority;               /* registry priority (builtin cores: 100) */

  /* Decode one coded image to a malloc'd gray8 plane (row-major,
   * width*height bytes). Returns 0 on success, nonzero on error.
   * The library releases the plane through free_plane. */
  int (*decode)(const uint8_t* data, size_t size, uint8_t** out_plane,
                int* out_width, int* out_height);
  void (*free_plane)(uint8_t* plane);
} heif_tpu_decoder_plugin;

typedef struct heif_tpu_encoder_plugin {
  int plugin_api_version;
  const char* id;
  const char* format;
  int priority;

  /* Encode a gray8 plane to a malloc'd byte buffer. Returns 0 on
   * success. The library releases the buffer through free_data. */
  int (*encode)(const uint8_t* plane, int width, int height,
                uint8_t** out_data, size_t* out_size);
  void (*free_data)(uint8_t* data);
} heif_tpu_encoder_plugin;

/* A plugin exports one or both of these. */
const heif_tpu_decoder_plugin* heif_tpu_get_decoder_plugin(void);
const heif_tpu_encoder_plugin* heif_tpu_get_encoder_plugin(void);

#ifdef __cplusplus
}
#endif

#endif /* LIBHEIF_TPU_PLUGIN_H */
