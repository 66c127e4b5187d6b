/* gdk-pixbuf loader for HEIF/AVIF via the libheif_tpu C shim.
 *
 * Counterpart of the reference's loader (reference:
 * gdk-pixbuf/pixbufloader-heif.c: a GdkPixbufModule whose load_buffer
 * decodes through the libheif C API into an interleaved-RGB(A)
 * GdkPixbuf). This version links against bindings/c/libheif_shim.so
 * instead of libheif proper; the call sequence is identical because
 * the shim mirrors the upstream ABI.
 *
 * Build (requires gdk-pixbuf development headers, not present in the
 * CI image — the module is compile-gated there):
 *
 *   gcc -shared -fPIC pixbufloader-heif.c \
 *       $(pkg-config --cflags --libs gdk-pixbuf-2.0) \
 *       -I../c -lheif_shim -lpython3.12 \
 *       -o libpixbufloader-heif.so
 *
 * Install into the gdk-pixbuf loaders directory and register with
 * gdk-pixbuf-query-loaders.
 */

#include <string.h>

#define GDK_PIXBUF_ENABLE_BACKEND
#include <gdk-pixbuf/gdk-pixbuf.h>

#include "heif_shim.h"

G_MODULE_EXPORT void fill_vtable(GdkPixbufModule* module);
G_MODULE_EXPORT void fill_info(GdkPixbufFormat* info);

static void release_pixels(guchar* pixels, gpointer data) {
  (void)pixels;
  heif_image_release((heif_image*)data);
}

static GdkPixbuf* load_buffer(const guchar* buf, gsize size,
                              GError** error) {
  heif_context* ctx = heif_context_alloc();
  if (!ctx) {
    g_set_error(error, GDK_PIXBUF_ERROR, GDK_PIXBUF_ERROR_FAILED,
                "heif: context allocation failed");
    return NULL;
  }
  heif_error err = heif_context_read_from_memory_without_copy(
      ctx, buf, size, NULL);
  if (err.code != heif_error_Ok) goto fail;

  heif_image_handle* handle = NULL;
  err = heif_context_get_primary_image_handle(ctx, &handle);
  if (err.code != heif_error_Ok) goto fail;

  int has_alpha = heif_image_handle_has_alpha_channel(handle);
  heif_image* img = NULL;
  err = heif_decode_image(handle, &img, heif_colorspace_RGB,
                          has_alpha ? heif_chroma_interleaved_RGBA
                                    : heif_chroma_interleaved_RGB,
                          NULL);
  heif_image_handle_release(handle);
  if (err.code != heif_error_Ok) goto fail;

  int stride = 0;
  const guint8* pixels = heif_image_get_plane_readonly(
      img, heif_channel_interleaved, &stride);
  int width = heif_image_get_primary_width(img);
  int height = heif_image_get_primary_height(img);
  if (!pixels || width <= 0 || height <= 0) {
    heif_image_release(img);
    g_set_error(error, GDK_PIXBUF_ERROR, GDK_PIXBUF_ERROR_FAILED,
                "heif: no interleaved plane");
    heif_context_free(ctx);
    return NULL;
  }

  /* the pixbuf borrows the plane; the destroy-notify drops the image */
  GdkPixbuf* pixbuf = gdk_pixbuf_new_from_data(
      (guchar*)pixels, GDK_COLORSPACE_RGB, has_alpha, 8, width, height,
      stride, release_pixels, img);
  heif_context_free(ctx);
  return pixbuf;

fail:
  g_set_error(error, GDK_PIXBUF_ERROR,
              GDK_PIXBUF_ERROR_CORRUPT_IMAGE, "heif: %s",
              err.message ? err.message : "decode failed");
  heif_context_free(ctx);
  return NULL;
}

/* --- incremental-load adapter: buffer everything, decode at stop --- */

typedef struct {
  GByteArray* data;
  GdkPixbufModuleSizeFunc size_func;
  GdkPixbufModulePreparedFunc prepared_func;
  GdkPixbufModuleUpdatedFunc updated_func;
  gpointer user_data;
} HeifLoadState;

static gpointer begin_load(GdkPixbufModuleSizeFunc size_func,
                           GdkPixbufModulePreparedFunc prepared_func,
                           GdkPixbufModuleUpdatedFunc updated_func,
                           gpointer user_data, GError** error) {
  (void)error;
  HeifLoadState* st = g_new0(HeifLoadState, 1);
  st->data = g_byte_array_new();
  st->size_func = size_func;
  st->prepared_func = prepared_func;
  st->updated_func = updated_func;
  st->user_data = user_data;
  return st;
}

static gboolean load_increment(gpointer context, const guchar* buf,
                               guint size, GError** error) {
  (void)error;
  HeifLoadState* st = (HeifLoadState*)context;
  g_byte_array_append(st->data, buf, size);
  return TRUE;
}

static gboolean stop_load(gpointer context, GError** error) {
  HeifLoadState* st = (HeifLoadState*)context;
  GdkPixbuf* pixbuf = load_buffer(st->data->data, st->data->len, error);
  gboolean ok = pixbuf != NULL;
  if (ok) {
    if (st->prepared_func)
      st->prepared_func(pixbuf, NULL, st->user_data);
    if (st->updated_func)
      st->updated_func(pixbuf, 0, 0, gdk_pixbuf_get_width(pixbuf),
                       gdk_pixbuf_get_height(pixbuf), st->user_data);
    g_object_unref(pixbuf);
  }
  g_byte_array_unref(st->data);
  g_free(st);
  return ok;
}

G_MODULE_EXPORT void fill_vtable(GdkPixbufModule* module) {
  module->begin_load = begin_load;
  module->load_increment = load_increment;
  module->stop_load = stop_load;
}

G_MODULE_EXPORT void fill_info(GdkPixbufFormat* info) {
  static GdkPixbufModulePattern signature[] = {
      {"    ftypheic", "xxxx        ", 100},
      {"    ftypheix", "xxxx        ", 100},
      {"    ftypmif1", "xxxx        ", 100},
      {"    ftypavif", "xxxx        ", 100},
      {NULL, NULL, 0},
  };
  static gchar* mime_types[] = {"image/heif", "image/heic",
                                "image/avif", NULL};
  static gchar* extensions[] = {"heif", "heic", "avif", NULL};
  info->name = "heif/avif";
  info->signature = signature;
  info->description = "HEIF/AVIF image (libheif_tpu)";
  info->mime_types = mime_types;
  info->extensions = extensions;
  info->flags = GDK_PIXBUF_FORMAT_THREADSAFE;
  info->license = "MIT";
}
