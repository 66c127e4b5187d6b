/* libheif_tpu C ABI shim implementation.
 *
 * Embeds one CPython interpreter hosting the libheif_tpu package and
 * exposes the core upstream libheif C API flow (see heif_shim.h).
 * Python-object navigation lives in libheif_tpu/bindings_support.py;
 * this file only marshals scalars, strings and plane buffers.
 *
 * Thread model: the interpreter is initialized lazily on the first
 * call; afterwards every entry point takes the GIL with
 * PyGILState_Ensure, so the shim is safe to call from any thread
 * (mirroring upstream libheif's thread-compatible context objects).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#include "heif_shim.h"

/* ------------------------------------------------------------------ */

struct heif_context {
  PyObject* ctx;            /* libheif_tpu.context.HeifContext */
};

struct heif_image_handle {
  PyObject* ctx;            /* borrowed logical ref (we own an incref) */
  heif_item_id id;
  int width, height, primary, alpha;
};

#define SHIM_MAX_PLANES 16

struct heif_image {
  PyObject* img;            /* PixelImage */
  PyObject* plane_arrays[SHIM_MAX_PLANES];  /* kept-alive ndarrays */
  Py_buffer plane_bufs[SHIM_MAX_PLANES];
  int plane_channels[SHIM_MAX_PLANES];
  int n_planes;
};

static char g_module_path[4096];
static PyObject* g_support = NULL;      /* bindings_support module */
static PyThreadState* g_main_tstate = NULL;

static __thread char g_errmsg[512];

void heif_shim_set_module_path(const char* path) {
  if (path) {
    strncpy(g_module_path, path, sizeof(g_module_path) - 1);
    g_module_path[sizeof(g_module_path) - 1] = 0;
  }
}

static heif_error err_ok(void) {
  heif_error e;
  e.code = heif_error_Ok;
  e.subcode = 0;
  e.message = "Success";
  return e;
}

/* Convert a pending Python exception into a heif_error using
 * bindings_support.error_info, clearing it. Call with GIL held. */
static heif_error err_from_py(void) {
  heif_error e;
  e.code = heif_error_Invalid_input;
  e.subcode = 0;
  snprintf(g_errmsg, sizeof(g_errmsg), "unknown error");
  e.message = g_errmsg;
  PyObject *type = NULL, *value = NULL, *tb = NULL;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  if (value && g_support) {
    PyObject* info = PyObject_CallMethod(g_support, "error_info", "O",
                                         value);
    if (info && PyTuple_Check(info) && PyTuple_Size(info) == 3) {
      e.code = (enum heif_error_code)PyLong_AsLong(
          PyTuple_GetItem(info, 0));
      e.subcode = (int)PyLong_AsLong(PyTuple_GetItem(info, 1));
      const char* msg = PyUnicode_AsUTF8(PyTuple_GetItem(info, 2));
      if (msg) {
        snprintf(g_errmsg, sizeof(g_errmsg), "%s", msg);
      }
    }
    Py_XDECREF(info);
    PyErr_Clear();
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  return e;
}

static heif_error err_usage(const char* msg) {
  heif_error e;
  e.code = heif_error_Usage_error;
  e.subcode = 0;
  snprintf(g_errmsg, sizeof(g_errmsg), "%s", msg);
  e.message = g_errmsg;
  return e;
}

/* Initialize the interpreter + import the support module once.
 * Returns 0 on success. Afterwards the GIL is RELEASED; use
 * PyGILState_Ensure in every entry point. */
static int shim_init(void) {
  static int done = 0;
  static int failed = 0;
  if (done) return failed;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_main_tstate = PyEval_SaveThread();
  }
  PyGILState_STATE st = PyGILState_Ensure();
  if (g_module_path[0]) {
    PyObject* sys_path = PySys_GetObject("path");   /* borrowed */
    PyObject* p = PyUnicode_FromString(g_module_path);
    if (sys_path && p) PyList_Insert(sys_path, 0, p);
    Py_XDECREF(p);
  }
  g_support = PyImport_ImportModule("libheif_tpu.bindings_support");
  if (!g_support) {
    PyErr_Print();
    failed = 1;
  }
  done = 1;
  PyGILState_Release(st);
  return failed;
}

const char* heif_get_version(void) {
  static char buf[128] = "libheif_tpu";
  if (shim_init()) return buf;
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* v = PyObject_CallMethod(g_support, "version", NULL);
  if (v) {
    const char* s = PyUnicode_AsUTF8(v);
    if (s) snprintf(buf, sizeof(buf), "%s", s);
    Py_DECREF(v);
  } else {
    PyErr_Clear();
  }
  PyGILState_Release(st);
  return buf;
}

/* ------------------------------------------------------------------ */
/* context                                                             */

heif_context* heif_context_alloc(void) {
  if (shim_init()) return NULL;
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* ctx = PyObject_CallMethod(g_support, "context_new", NULL);
  heif_context* c = NULL;
  if (ctx) {
    c = (heif_context*)calloc(1, sizeof(heif_context));
    c->ctx = ctx;
  } else {
    PyErr_Clear();
  }
  PyGILState_Release(st);
  return c;
}

void heif_context_free(heif_context* c) {
  if (!c) return;
  PyGILState_STATE st = PyGILState_Ensure();
  Py_XDECREF(c->ctx);
  PyGILState_Release(st);
  free(c);
}

static heif_error ctx_replace(heif_context* c, const char* fn,
                              const char* fmt, ...) {
  PyGILState_STATE st = PyGILState_Ensure();
  va_list ap;
  va_start(ap, fmt);
  PyObject* callable = PyObject_GetAttrString(g_support, fn);
  PyObject* args = Py_VaBuildValue(fmt, ap);
  va_end(ap);
  heif_error e = err_ok();
  PyObject* ctx = NULL;
  if (callable && args) ctx = PyObject_CallObject(callable, args);
  if (ctx) {
    Py_XDECREF(c->ctx);
    c->ctx = ctx;
  } else {
    e = err_from_py();
  }
  Py_XDECREF(args);
  Py_XDECREF(callable);
  PyGILState_Release(st);
  return e;
}

heif_error heif_context_read_from_file(heif_context* c,
                                       const char* filename,
                                       const void* unused) {
  (void)unused;
  if (!c || !filename) return err_usage("NULL context or filename");
  if (shim_init()) return err_usage("interpreter init failed");
  return ctx_replace(c, "read_from_file", "(s)", filename);
}

heif_error heif_context_read_from_memory_without_copy(
    heif_context* c, const void* mem, size_t size, const void* unused) {
  (void)unused;
  if (!c || !mem) return err_usage("NULL context or buffer");
  if (shim_init()) return err_usage("interpreter init failed");
  return ctx_replace(c, "read_from_memory", "(y#)", (const char*)mem,
                     (Py_ssize_t)size);
}

int heif_context_get_number_of_top_level_images(heif_context* c) {
  if (!c || !c->ctx) return 0;
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* n = PyObject_CallMethod(g_support, "top_level_count", "O",
                                    c->ctx);
  int r = 0;
  if (n) {
    r = (int)PyLong_AsLong(n);
    Py_DECREF(n);
  } else {
    PyErr_Clear();
  }
  PyGILState_Release(st);
  return r;
}

heif_error heif_context_get_primary_image_ID(heif_context* c,
                                             heif_item_id* id) {
  if (!c || !c->ctx || !id) return err_usage("NULL argument");
  PyGILState_STATE st = PyGILState_Ensure();
  heif_error e = err_ok();
  PyObject* v = PyObject_CallMethod(g_support, "primary_id", "O",
                                    c->ctx);
  if (v) {
    *id = (heif_item_id)PyLong_AsUnsignedLong(v);
    Py_DECREF(v);
  } else {
    e = err_from_py();
  }
  PyGILState_Release(st);
  return e;
}

heif_error heif_context_get_image_handle(heif_context* c,
                                         heif_item_id id,
                                         heif_image_handle** out) {
  if (!c || !c->ctx || !out) return err_usage("NULL argument");
  PyGILState_STATE st = PyGILState_Ensure();
  heif_error e = err_ok();
  PyObject* info = PyObject_CallMethod(g_support, "handle_info", "Ok",
                                       c->ctx, (unsigned long)id);
  if (info && PyTuple_Check(info) && PyTuple_Size(info) == 4) {
    heif_image_handle* h =
        (heif_image_handle*)calloc(1, sizeof(heif_image_handle));
    Py_INCREF(c->ctx);
    h->ctx = c->ctx;
    h->id = id;
    h->width = (int)PyLong_AsLong(PyTuple_GetItem(info, 0));
    h->height = (int)PyLong_AsLong(PyTuple_GetItem(info, 1));
    h->primary = (int)PyLong_AsLong(PyTuple_GetItem(info, 2));
    h->alpha = (int)PyLong_AsLong(PyTuple_GetItem(info, 3));
    *out = h;
  } else {
    e = err_from_py();
  }
  Py_XDECREF(info);
  PyGILState_Release(st);
  return e;
}

heif_error heif_context_get_primary_image_handle(heif_context* c,
                                                 heif_image_handle** out) {
  heif_item_id id;
  heif_error e = heif_context_get_primary_image_ID(c, &id);
  if (e.code != heif_error_Ok) return e;
  return heif_context_get_image_handle(c, id, out);
}

heif_error heif_context_write_to_file(heif_context* c,
                                      const char* filename) {
  if (!c || !c->ctx || !filename) return err_usage("NULL argument");
  PyGILState_STATE st = PyGILState_Ensure();
  heif_error e = err_ok();
  PyObject* r = PyObject_CallMethod(g_support, "write_to_file", "Os",
                                    c->ctx, filename);
  if (!r) e = err_from_py();
  Py_XDECREF(r);
  PyGILState_Release(st);
  return e;
}

/* ------------------------------------------------------------------ */
/* image handle                                                        */

void heif_image_handle_release(heif_image_handle* h) {
  if (!h) return;
  PyGILState_STATE st = PyGILState_Ensure();
  Py_XDECREF(h->ctx);
  PyGILState_Release(st);
  free(h);
}

int heif_image_handle_get_width(const heif_image_handle* h) {
  return h ? h->width : 0;
}
int heif_image_handle_get_height(const heif_image_handle* h) {
  return h ? h->height : 0;
}
int heif_image_handle_is_primary_image(const heif_image_handle* h) {
  return h ? h->primary : 0;
}
int heif_image_handle_has_alpha_channel(const heif_image_handle* h) {
  return h ? h->alpha : 0;
}

/* ------------------------------------------------------------------ */
/* image                                                               */

static heif_image* image_wrap(PyObject* img) {
  heif_image* im = (heif_image*)calloc(1, sizeof(heif_image));
  im->img = img;   /* takes the reference */
  return im;
}

heif_error heif_decode_image(const heif_image_handle* h,
                             heif_image** out_img,
                             enum heif_colorspace colorspace,
                             enum heif_chroma chroma,
                             const void* unused) {
  (void)unused;
  if (!h || !h->ctx || !out_img) return err_usage("NULL argument");
  PyGILState_STATE st = PyGILState_Ensure();
  heif_error e = err_ok();
  PyObject* img = PyObject_CallMethod(g_support, "decode", "Okii",
                                      h->ctx, (unsigned long)h->id,
                                      (int)colorspace, (int)chroma);
  if (img) {
    *out_img = image_wrap(img);
  } else {
    e = err_from_py();
  }
  PyGILState_Release(st);
  return e;
}

void heif_image_release(const heif_image* cim) {
  heif_image* im = (heif_image*)cim;
  if (!im) return;
  PyGILState_STATE st = PyGILState_Ensure();
  for (int i = 0; i < im->n_planes; i++) {
    PyBuffer_Release(&im->plane_bufs[i]);
    Py_XDECREF(im->plane_arrays[i]);
  }
  Py_XDECREF(im->img);
  PyGILState_Release(st);
  free(im);
}

static int image_int2(const heif_image* im, const char* fn, int idx) {
  if (!im || !im->img) return 0;
  PyGILState_STATE st = PyGILState_Ensure();
  int r = 0;
  PyObject* v = PyObject_CallMethod(g_support, fn, "O", im->img);
  if (v && PyTuple_Check(v) && PyTuple_Size(v) > idx) {
    r = (int)PyLong_AsLong(PyTuple_GetItem(v, idx));
  }
  Py_XDECREF(v);
  if (PyErr_Occurred()) PyErr_Clear();
  PyGILState_Release(st);
  return r;
}

enum heif_colorspace heif_image_get_colorspace(const heif_image* im) {
  return (enum heif_colorspace)image_int2(im, "image_info", 0);
}
enum heif_chroma heif_image_get_chroma_format(const heif_image* im) {
  return (enum heif_chroma)image_int2(im, "image_info", 1);
}
int heif_image_get_primary_width(const heif_image* im) {
  return image_int2(im, "image_info", 2);
}
int heif_image_get_primary_height(const heif_image* im) {
  return image_int2(im, "image_info", 3);
}

static int channel_int(const heif_image* im, enum heif_channel ch,
                       int idx) {
  if (!im || !im->img) return 0;
  PyGILState_STATE st = PyGILState_Ensure();
  int r = 0;
  PyObject* v = PyObject_CallMethod(g_support, "channel_size", "Oi",
                                    im->img, (int)ch);
  if (v && PyTuple_Check(v) && PyTuple_Size(v) == 3) {
    r = (int)PyLong_AsLong(PyTuple_GetItem(v, idx));
  }
  Py_XDECREF(v);
  if (PyErr_Occurred()) PyErr_Clear();
  PyGILState_Release(st);
  return r;
}

int heif_image_get_width(const heif_image* im, enum heif_channel ch) {
  return channel_int(im, ch, 0);
}
int heif_image_get_height(const heif_image* im, enum heif_channel ch) {
  return channel_int(im, ch, 1);
}
int heif_image_get_bits_per_pixel_range(const heif_image* im,
                                        enum heif_channel ch) {
  return channel_int(im, ch, 2);
}

int heif_image_has_channel(const heif_image* im, enum heif_channel ch) {
  if (!im || !im->img) return 0;
  PyGILState_STATE st = PyGILState_Ensure();
  int r = 0;
  PyObject* v = PyObject_CallMethod(g_support, "has_channel", "Oi",
                                    im->img, (int)ch);
  if (v) r = (int)PyLong_AsLong(v);
  Py_XDECREF(v);
  if (PyErr_Occurred()) PyErr_Clear();
  PyGILState_Release(st);
  return r;
}

const uint8_t* heif_image_get_plane_readonly(const heif_image* cim,
                                             enum heif_channel ch,
                                             int* out_stride) {
  heif_image* im = (heif_image*)cim;
  if (!im || !im->img) return NULL;
  PyGILState_STATE st = PyGILState_Ensure();
  const uint8_t* data = NULL;
  /* cached? */
  for (int i = 0; i < im->n_planes; i++) {
    if (im->plane_channels[i] == (int)ch) {
      data = (const uint8_t*)im->plane_bufs[i].buf;
      if (out_stride)
        *out_stride = (int)(im->plane_bufs[i].len /
                            (im->plane_bufs[i].shape
                                 ? im->plane_bufs[i].shape[0]
                                 : 1));
      PyGILState_Release(st);
      return data;
    }
  }
  if (im->n_planes >= SHIM_MAX_PLANES) {
    PyGILState_Release(st);
    return NULL;
  }
  PyObject* arr = PyObject_CallMethod(g_support, "plane", "Oi", im->img,
                                      (int)ch);
  if (arr && arr != Py_None) {
    int k = im->n_planes;
    if (PyObject_GetBuffer(arr, &im->plane_bufs[k],
                           PyBUF_ND | PyBUF_C_CONTIGUOUS) == 0) {
      im->plane_arrays[k] = arr;   /* keep alive */
      im->plane_channels[k] = (int)ch;
      im->n_planes++;
      data = (const uint8_t*)im->plane_bufs[k].buf;
      if (out_stride) {
        Py_ssize_t rows = im->plane_bufs[k].shape
                              ? im->plane_bufs[k].shape[0]
                              : 1;
        *out_stride = (int)(rows ? im->plane_bufs[k].len / rows : 0);
      }
    } else {
      Py_DECREF(arr);
    }
  } else {
    Py_XDECREF(arr);
  }
  if (PyErr_Occurred()) PyErr_Clear();
  PyGILState_Release(st);
  return data;
}

heif_error heif_image_create(int width, int height,
                             enum heif_colorspace colorspace,
                             enum heif_chroma chroma, heif_image** out) {
  if (!out) return err_usage("NULL out");
  if (shim_init()) return err_usage("interpreter init failed");
  PyGILState_STATE st = PyGILState_Ensure();
  heif_error e = err_ok();
  PyObject* img = PyObject_CallMethod(g_support, "image_create", "iiii",
                                      width, height, (int)colorspace,
                                      (int)chroma);
  if (img) {
    *out = image_wrap(img);
  } else {
    e = err_from_py();
  }
  PyGILState_Release(st);
  return e;
}

heif_error heif_image_add_plane(heif_image* im, enum heif_channel ch,
                                int width, int height, int bit_depth) {
  /* planes are created on set_plane_data; geometry remembered there */
  (void)im;
  (void)ch;
  (void)width;
  (void)height;
  (void)bit_depth;
  return err_ok();
}

heif_error heif_image_set_plane_data(heif_image* im,
                                     enum heif_channel ch,
                                     const uint8_t* data, int stride) {
  if (!im || !im->img || !data) return err_usage("NULL argument");
  PyGILState_STATE st = PyGILState_Ensure();
  heif_error e = err_ok();
  /* derive geometry from the image + chroma for this channel */
  PyObject* info = PyObject_CallMethod(g_support, "image_info", "O",
                                       im->img);
  if (!info) {
    e = err_from_py();
    PyGILState_Release(st);
    return e;
  }
  int w = (int)PyLong_AsLong(PyTuple_GetItem(info, 2));
  int h = (int)PyLong_AsLong(PyTuple_GetItem(info, 3));
  int chroma = (int)PyLong_AsLong(PyTuple_GetItem(info, 1));
  Py_DECREF(info);
  if ((int)ch == 1 || (int)ch == 2) {       /* Cb/Cr subsampling */
    if (chroma == 1) {                       /* 4:2:0 */
      w = (w + 1) / 2;
      h = (h + 1) / 2;
    } else if (chroma == 2) {                /* 4:2:2 */
      w = (w + 1) / 2;
    }
  }
  PyObject* r = PyObject_CallMethod(
      g_support, "image_set_plane", "Oiy#iiii", im->img, (int)ch,
      (const char*)data, (Py_ssize_t)((Py_ssize_t)stride * h), w, h,
      stride, 8);
  if (!r) e = err_from_py();
  Py_XDECREF(r);
  PyGILState_Release(st);
  return e;
}

/* ------------------------------------------------------------------ */
/* encode                                                              */

heif_error heif_context_encode_image2(heif_context* c,
                                      const heif_image* im,
                                      const char* codec, int quality,
                                      heif_image_handle** out_handle) {
  if (!c || !c->ctx || !im || !im->img) return err_usage("NULL argument");
  PyGILState_STATE st = PyGILState_Ensure();
  heif_error e = err_ok();
  PyObject* v = PyObject_CallMethod(g_support, "encode", "OOsi", c->ctx,
                                    im->img, codec ? codec : "hevc",
                                    quality);
  if (!v) {
    e = err_from_py();
    PyGILState_Release(st);
    return e;
  }
  heif_item_id id = (heif_item_id)PyLong_AsUnsignedLong(v);
  Py_DECREF(v);
  PyGILState_Release(st);
  if (out_handle) return heif_context_get_image_handle(c, id, out_handle);
  return e;
}

#include "heif_shim_api.inc"
