/* libheif_tpu C ABI shim.
 *
 * A drop-in C interface covering the core decode/encode flow of the
 * upstream libheif C API (reference: libheif/api/libheif/heif_context.h,
 * heif_image.h, heif_image_handle.h — names, enum values and the error
 * struct layout mirror the public ABI so C programs written against the
 * basic libheif flow compile against this header unchanged).
 *
 * The implementation (heif_shim.c) embeds a CPython interpreter running
 * the pure-Python/JAX libheif_tpu package; every call is GIL-safe, so
 * the library can be used from multi-threaded C, Go (cgo) or any FFI.
 *
 * Build:
 *   gcc -shared -fPIC bindings/c/heif_shim.c \
 *       $(python3-config --includes) -lpython3.12 \
 *       -o libheif_shim.so
 *
 * Before the first context call, optionally set the package location:
 *   heif_shim_set_module_path("/path/to/libheif_tpu_checkout");
 */

#ifndef LIBHEIF_TPU_SHIM_H
#define LIBHEIF_TPU_SHIM_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct heif_context heif_context;
typedef struct heif_image_handle heif_image_handle;
typedef struct heif_image heif_image;
typedef uint32_t heif_item_id;

/* mirrors upstream heif_error_code (heif_error.h) */
enum heif_error_code {
  heif_error_Ok = 0,
  heif_error_Input_does_not_exist = 1,
  heif_error_Invalid_input = 2,
  heif_error_Unsupported_filetype = 3,
  heif_error_Unsupported_feature = 4,
  heif_error_Usage_error = 5,
  heif_error_Memory_allocation_error = 6,
  heif_error_Decoder_plugin_error = 7,
  heif_error_Encoder_plugin_error = 8,
  heif_error_Encoding_error = 9,
  heif_error_Color_profile_does_not_exist = 10,
  heif_error_Plugin_loading_error = 11,
  heif_error_Canceled = 12,
  heif_error_End_of_sequence = 13
};

typedef struct heif_error {
  enum heif_error_code code;
  int subcode;
  const char* message;   /* static or interned; do not free */
} heif_error;

/* mirrors upstream heif_image.h enum values */
enum heif_colorspace {
  heif_colorspace_undefined = 99,
  heif_colorspace_YCbCr = 0,
  heif_colorspace_RGB = 1,
  heif_colorspace_monochrome = 2
};

enum heif_chroma {
  heif_chroma_undefined = 99,
  heif_chroma_monochrome = 0,
  heif_chroma_420 = 1,
  heif_chroma_422 = 2,
  heif_chroma_444 = 3,
  heif_chroma_interleaved_RGB = 10,
  heif_chroma_interleaved_RGBA = 11
};

enum heif_channel {
  heif_channel_Y = 0,
  heif_channel_Cb = 1,
  heif_channel_Cr = 2,
  heif_channel_R = 3,
  heif_channel_G = 4,
  heif_channel_B = 5,
  heif_channel_Alpha = 6,
  heif_channel_interleaved = 10
};

/* ------------------------------------------------------------------ */
/* shim lifecycle                                                      */

/* Optional: where to find the libheif_tpu package (a directory whose
 * child is `libheif_tpu/`). Must be called before the first context
 * call; otherwise the interpreter default sys.path is used. */
void heif_shim_set_module_path(const char* path);

/* Returns a static version string for the underlying engine. */
const char* heif_get_version(void);

/* ------------------------------------------------------------------ */
/* context                                                             */

heif_context* heif_context_alloc(void);
void heif_context_free(heif_context*);

heif_error heif_context_read_from_file(heif_context*, const char* filename,
                                       const void* unused_options);
heif_error heif_context_read_from_memory_without_copy(
    heif_context*, const void* mem, size_t size,
    const void* unused_options);

int heif_context_get_number_of_top_level_images(heif_context*);
heif_error heif_context_get_primary_image_ID(heif_context*,
                                             heif_item_id* id);
heif_error heif_context_get_primary_image_handle(heif_context*,
                                                 heif_image_handle**);
heif_error heif_context_get_image_handle(heif_context*, heif_item_id,
                                         heif_image_handle**);

heif_error heif_context_write_to_file(heif_context*, const char* filename);

/* Encode `image` with the named codec ("hevc", "av1", "avc", "jpeg",
 * "j2k", "unc"...; NULL = "hevc") at `quality` 0-100 (negative =
 * default), appending the new image to the context as the primary
 * item. Out-handle may be NULL. */
heif_error heif_context_encode_image2(heif_context*, const heif_image*,
                                      const char* codec, int quality,
                                      heif_image_handle** out_handle);

/* ------------------------------------------------------------------ */
/* image handle                                                        */

void heif_image_handle_release(heif_image_handle*);
int heif_image_handle_get_width(const heif_image_handle*);
int heif_image_handle_get_height(const heif_image_handle*);
int heif_image_handle_is_primary_image(const heif_image_handle*);
int heif_image_handle_has_alpha_channel(const heif_image_handle*);

/* decoding_options is accepted for call compatibility and ignored. */
heif_error heif_decode_image(const heif_image_handle* in_handle,
                             heif_image** out_img,
                             enum heif_colorspace colorspace,
                             enum heif_chroma chroma,
                             const void* decoding_options);

/* ------------------------------------------------------------------ */
/* image                                                               */

void heif_image_release(const heif_image*);
enum heif_colorspace heif_image_get_colorspace(const heif_image*);
enum heif_chroma heif_image_get_chroma_format(const heif_image*);
int heif_image_get_width(const heif_image*, enum heif_channel);
int heif_image_get_height(const heif_image*, enum heif_channel);
int heif_image_get_primary_width(const heif_image*);
int heif_image_get_primary_height(const heif_image*);
int heif_image_has_channel(const heif_image*, enum heif_channel);
int heif_image_get_bits_per_pixel_range(const heif_image*,
                                        enum heif_channel);

/* Plane data, valid until heif_image_release. Row pitch in bytes is
 * returned through out_stride. */
const uint8_t* heif_image_get_plane_readonly(const heif_image*,
                                             enum heif_channel,
                                             int* out_stride);

/* Create a fresh image and copy `data` (h rows of `stride` bytes) into
 * the given channel, allocating it. For building encode inputs. */
heif_error heif_image_create(int width, int height,
                             enum heif_colorspace colorspace,
                             enum heif_chroma chroma, heif_image** out);
heif_error heif_image_add_plane(heif_image*, enum heif_channel,
                                int width, int height, int bit_depth);
heif_error heif_image_set_plane_data(heif_image*, enum heif_channel,
                                     const uint8_t* data, int stride);

#ifdef __cplusplus
}
#endif

#endif /* LIBHEIF_TPU_SHIM_H */
