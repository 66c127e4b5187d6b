/* libheif_tpu C++ RAII wrapper.
 *
 * Mirrors the upstream heif_cxx.h convenience layer (reference:
 * libheif/api/libheif/heif_cxx.h, 1490 LoC): the same class names and
 * method surface — heif::Error, heif::Context, heif::ImageHandle,
 * heif::Image, heif::Encoder, heif::EncoderDescriptor,
 * heif::EncoderParameter — implemented over this repo's C ABI shim
 * (heif_shim.h / heif_shim_ext.h) instead of the C++ core.
 *
 * Ownership follows the upstream design: every wrapper holds a
 * std::shared_ptr whose deleter releases the underlying C object, so
 * copies are cheap and lifetimes compose.  Errors surface as thrown
 * heif::Error (matching upstream's exception-based API).
 *
 * Header-only; C++14.  Build a consumer:
 *   g++ -std=c++14 consumer.cpp -I bindings/c libheif_shim.so \
 *       $(python3-config --embed --ldflags)
 */

#ifndef LIBHEIF_TPU_CXX_HPP
#define LIBHEIF_TPU_CXX_HPP

#include <cstring>
#include <memory>
#include <stdexcept>
#include <string>
#include <utility>
#include <vector>

#include "heif_shim.h"
#include "heif_shim_ext.h"

namespace heif {

class Error : public std::exception {
 public:
  Error() : m_code(heif_error_Ok), m_subcode(0), m_message("Success") {}

  explicit Error(const heif_error& err)
      : m_code(err.code),
        m_subcode(err.subcode),
        m_message(err.message ? err.message : "") {}

  Error(heif_error_code code, int subcode, std::string msg)
      : m_code(code), m_subcode(subcode), m_message(std::move(msg)) {}

  heif_error_code get_code() const { return m_code; }
  int get_subcode() const { return m_subcode; }
  const std::string& get_message() const { return m_message; }
  const char* what() const noexcept override { return m_message.c_str(); }

  explicit operator bool() const { return m_code != heif_error_Ok; }

  /* throw when the C call failed (internal helper, used by every
   * wrapper method) */
  static void check(const heif_error& err) {
    if (err.code != heif_error_Ok) throw Error(err);
  }

 private:
  heif_error_code m_code;
  int m_subcode;
  std::string m_message;
};

class Image {
 public:
  Image() = default;

  Image(int width, int height, heif_colorspace colorspace,
        heif_chroma chroma) {
    create(width, height, colorspace, chroma);
  }

  void create(int width, int height, heif_colorspace colorspace,
              heif_chroma chroma) {
    heif_image* img = nullptr;
    Error::check(heif_image_create(width, height, colorspace, chroma,
                                   &img));
    m_image.reset(img, [](heif_image* p) {
      if (p) heif_image_release(p);
    });
  }

  heif_colorspace get_colorspace() const {
    return heif_image_get_colorspace(m_image.get());
  }
  heif_chroma get_chroma_format() const {
    return heif_image_get_chroma_format(m_image.get());
  }
  int get_width(heif_channel channel) const {
    return heif_image_get_width(m_image.get(), channel);
  }
  int get_height(heif_channel channel) const {
    return heif_image_get_height(m_image.get(), channel);
  }
  int get_primary_width() const {
    return heif_image_get_primary_width(m_image.get());
  }
  int get_primary_height() const {
    return heif_image_get_primary_height(m_image.get());
  }
  bool has_channel(heif_channel channel) const {
    return heif_image_has_channel(m_image.get(), channel) != 0;
  }
  int get_bits_per_pixel_range(heif_channel channel) const {
    return heif_image_get_bits_per_pixel_range(m_image.get(), channel);
  }

  void add_plane(heif_channel channel, int width, int height,
                 int bit_depth) {
    Error::check(heif_image_add_plane(m_image.get(), channel, width,
                                      height, bit_depth));
  }

  void set_plane_data(heif_channel channel, const uint8_t* data,
                      int stride) {
    Error::check(heif_image_set_plane_data(m_image.get(), channel, data,
                                           stride));
  }

  const uint8_t* get_plane(heif_channel channel, int* out_stride) const {
    return heif_image_get_plane_readonly(m_image.get(), channel,
                                         out_stride);
  }

  const heif_image* get_raw_image() const { return m_image.get(); }

  /* adopt ownership of a C-level image (internal) */
  static Image wrap(heif_image* img) {
    Image out;
    out.m_image.reset(img, [](heif_image* p) {
      if (p) heif_image_release(p);
    });
    return out;
  }

 private:
  std::shared_ptr<heif_image> m_image;
};

class ImageHandle {
 public:
  ImageHandle() = default;

  explicit ImageHandle(heif_image_handle* handle) {
    m_handle.reset(handle, [](heif_image_handle* p) {
      if (p) heif_image_handle_release(p);
    });
  }

  bool empty() const { return !m_handle; }

  int get_width() const {
    return heif_image_handle_get_width(m_handle.get());
  }
  int get_height() const {
    return heif_image_handle_get_height(m_handle.get());
  }
  bool is_primary_image() const {
    return heif_image_handle_is_primary_image(m_handle.get()) != 0;
  }
  bool has_alpha_channel() const {
    return heif_image_handle_has_alpha_channel(m_handle.get()) != 0;
  }

  std::vector<heif_item_id> get_list_of_thumbnail_IDs() const {
    int n = heif_image_handle_get_number_of_thumbnails(m_handle.get());
    std::vector<heif_item_id> ids(n > 0 ? n : 0);
    if (n > 0) {
      n = heif_image_handle_get_list_of_thumbnail_IDs(m_handle.get(),
                                                      ids.data(), n);
      ids.resize(n > 0 ? n : 0);
    }
    return ids;
  }

  ImageHandle get_thumbnail(heif_item_id id) const {
    heif_image_handle* out = nullptr;
    Error::check(
        heif_image_handle_get_thumbnail(m_handle.get(), id, &out));
    return ImageHandle(out);
  }

  std::vector<heif_item_id> get_list_of_metadata_block_IDs(
      const char* type_filter = nullptr) const {
    std::vector<heif_item_id> ids(64);
    int n = heif_image_handle_get_list_of_metadata_block_IDs(
        m_handle.get(), type_filter, ids.data(),
        static_cast<int>(ids.size()));
    ids.resize(n > 0 ? n : 0);
    return ids;
  }

  std::string get_metadata_type(heif_item_id id) const {
    const char* s =
        heif_image_handle_get_metadata_type(m_handle.get(), id);
    return s ? s : "";
  }

  std::string get_metadata_content_type(heif_item_id id) const {
    const char* s =
        heif_image_handle_get_metadata_content_type(m_handle.get(), id);
    return s ? s : "";
  }

  std::vector<uint8_t> get_metadata(heif_item_id id) const {
    size_t size = heif_image_handle_get_metadata_size(m_handle.get(), id);
    std::vector<uint8_t> out(size);
    if (size) {
      Error::check(heif_image_handle_get_metadata(m_handle.get(), id,
                                                  out.data()));
    }
    return out;
  }

  Image decode_image(heif_colorspace colorspace, heif_chroma chroma) {
    heif_image* img = nullptr;
    Error::check(heif_decode_image(m_handle.get(), &img, colorspace,
                                   chroma, nullptr));
    return Image::wrap(img);
  }

  const heif_image_handle* get_raw_image_handle() const {
    return m_handle.get();
  }

 private:
  std::shared_ptr<heif_image_handle> m_handle;
};

class EncoderParameter {
 public:
  explicit EncoderParameter(const heif_encoder_parameter* param)
      : m_param(param) {}

  std::string get_name() const {
    const char* s = heif_encoder_parameter_get_name(m_param);
    return s ? s : "";
  }
  int get_type() const { return heif_encoder_parameter_get_type(m_param); }

 private:
  const heif_encoder_parameter* m_param;
};

class Encoder {
 public:
  explicit Encoder(heif_encoder* enc) {
    m_encoder.reset(enc, [](heif_encoder* p) {
      if (p) heif_encoder_release(p);
    });
  }

  std::string get_name() const {
    const char* s = heif_encoder_get_name(m_encoder.get());
    return s ? s : "";
  }

  void set_lossy_quality(int quality) {
    Error::check(heif_encoder_set_lossy_quality(m_encoder.get(), quality));
  }
  void set_lossless(bool enable) {
    Error::check(heif_encoder_set_lossless(m_encoder.get(), enable));
  }

  void set_integer_parameter(const std::string& name, int value) {
    Error::check(heif_encoder_set_parameter_integer(m_encoder.get(),
                                                    name.c_str(), value));
  }
  int get_integer_parameter(const std::string& name) const {
    int v = 0;
    Error::check(heif_encoder_get_parameter_integer(m_encoder.get(),
                                                    name.c_str(), &v));
    return v;
  }
  void set_boolean_parameter(const std::string& name, bool value) {
    Error::check(heif_encoder_set_parameter_boolean(m_encoder.get(),
                                                    name.c_str(), value));
  }
  void set_string_parameter(const std::string& name,
                            const std::string& value) {
    Error::check(heif_encoder_set_parameter_string(
        m_encoder.get(), name.c_str(), value.c_str()));
  }
  void set_parameter(const std::string& name, const std::string& value) {
    Error::check(heif_encoder_set_parameter(m_encoder.get(), name.c_str(),
                                            value.c_str()));
  }
  std::string get_parameter(const std::string& name) const {
    char buf[256] = {0};
    Error::check(heif_encoder_get_parameter(m_encoder.get(), name.c_str(),
                                            buf, sizeof(buf)));
    return buf;
  }

  std::vector<EncoderParameter> list_parameters() const {
    std::vector<EncoderParameter> out;
    const heif_encoder_parameter* const* params =
        heif_encoder_list_parameters(m_encoder.get());
    for (; params && *params; ++params) {
      out.emplace_back(*params);
    }
    return out;
  }

  heif_encoder* get_raw_encoder() const { return m_encoder.get(); }

 private:
  std::shared_ptr<heif_encoder> m_encoder;
};

class EncoderDescriptor {
 public:
  static std::vector<EncoderDescriptor> get_encoder_descriptors(
      heif_compression_format format, const char* name_filter) {
    const heif_encoder_descriptor* descriptors[32];
    int n = heif_get_encoder_descriptors(format, name_filter, descriptors,
                                         32);
    std::vector<EncoderDescriptor> out;
    for (int i = 0; i < n; i++) {
      out.emplace_back(EncoderDescriptor(descriptors[i]));
    }
    return out;
  }

  std::string get_name() const {
    const char* s = heif_encoder_descriptor_get_name(m_descriptor);
    return s ? s : "";
  }
  std::string get_id_name() const {
    const char* s = heif_encoder_descriptor_get_id_name(m_descriptor);
    return s ? s : "";
  }
  heif_compression_format get_compression_format() const {
    return heif_encoder_descriptor_get_compression_format(m_descriptor);
  }
  bool supports_lossy_compression() const {
    return heif_encoder_descriptor_supports_lossy_compression(
               m_descriptor) != 0;
  }
  bool supports_lossless_compression() const {
    return heif_encoder_descriptor_supports_lossless_compression(
               m_descriptor) != 0;
  }

  const heif_encoder_descriptor* get_raw_descriptor() const {
    return m_descriptor;
  }

 private:
  explicit EncoderDescriptor(const heif_encoder_descriptor* desc)
      : m_descriptor(desc) {}

  const heif_encoder_descriptor* m_descriptor;
};

class Context {
 public:
  Context() {
    m_context.reset(heif_context_alloc(), [](heif_context* p) {
      if (p) heif_context_free(p);
    });
  }

  void read_from_file(const std::string& filename) {
    Error::check(heif_context_read_from_file(m_context.get(),
                                             filename.c_str(), nullptr));
  }

  void read_from_memory_without_copy(const void* mem, size_t size) {
    Error::check(heif_context_read_from_memory_without_copy(
        m_context.get(), mem, size, nullptr));
  }

  int get_number_of_top_level_images() const {
    return heif_context_get_number_of_top_level_images(m_context.get());
  }

  std::vector<heif_item_id> get_list_of_top_level_image_IDs() const {
    int n = get_number_of_top_level_images();
    std::vector<heif_item_id> ids(n > 0 ? n : 0);
    if (n > 0) {
      n = heif_context_get_list_of_top_level_image_IDs(m_context.get(),
                                                       ids.data(), n);
      ids.resize(n > 0 ? n : 0);
    }
    return ids;
  }

  bool is_top_level_image_ID(heif_item_id id) const {
    return heif_context_is_top_level_image_ID(m_context.get(), id) != 0;
  }

  heif_item_id get_primary_image_ID() const {
    heif_item_id id = 0;
    Error::check(heif_context_get_primary_image_ID(m_context.get(), &id));
    return id;
  }

  ImageHandle get_primary_image_handle() const {
    heif_image_handle* handle = nullptr;
    Error::check(
        heif_context_get_primary_image_handle(m_context.get(), &handle));
    return ImageHandle(handle);
  }

  ImageHandle get_image_handle(heif_item_id id) const {
    heif_image_handle* handle = nullptr;
    Error::check(
        heif_context_get_image_handle(m_context.get(), id, &handle));
    return ImageHandle(handle);
  }

  Encoder get_encoder_for_format(heif_compression_format format) {
    heif_encoder* enc = nullptr;
    Error::check(heif_context_get_encoder_for_format(m_context.get(),
                                                     format, &enc));
    return Encoder(enc);
  }

  ImageHandle encode_image(const Image& img, Encoder& encoder) {
    heif_image_handle* handle = nullptr;
    Error::check(heif_context_encode_image(m_context.get(),
                                           img.get_raw_image(),
                                           encoder.get_raw_encoder(),
                                           nullptr, &handle));
    return ImageHandle(handle);
  }

  ImageHandle encode_thumbnail(const Image& img,
                               const ImageHandle& master,
                               Encoder& encoder, int bbox_size) {
    heif_image_handle* handle = nullptr;
    Error::check(heif_context_encode_thumbnail(
        m_context.get(), img.get_raw_image(),
        master.get_raw_image_handle(), encoder.get_raw_encoder(), nullptr,
        bbox_size, &handle));
    return ImageHandle(handle);
  }

  void assign_thumbnail(const ImageHandle& master,
                        const ImageHandle& thumbnail) {
    Error::check(heif_context_assign_thumbnail(
        m_context.get(), master.get_raw_image_handle(),
        thumbnail.get_raw_image_handle()));
  }

  void set_primary_image(const ImageHandle& handle) {
    Error::check(heif_context_set_primary_image(
        m_context.get(),
        const_cast<heif_image_handle*>(handle.get_raw_image_handle())));
  }

  void add_exif_metadata(const ImageHandle& master, const void* data,
                         int size) {
    Error::check(heif_context_add_exif_metadata(
        m_context.get(), master.get_raw_image_handle(), data, size));
  }

  void add_XMP_metadata(const ImageHandle& master, const void* data,
                        int size) {
    Error::check(heif_context_add_XMP_metadata(
        m_context.get(), master.get_raw_image_handle(), data, size));
  }

  void write_to_file(const std::string& filename) const {
    Error::check(
        heif_context_write_to_file(m_context.get(), filename.c_str()));
  }

  void set_maximum_image_size_limit(int max_dim) {
    heif_context_set_maximum_image_size_limit(m_context.get(), max_dim);
  }

  heif_context* get_raw_context() const { return m_context.get(); }

 private:
  std::shared_ptr<heif_context> m_context;
};

}  // namespace heif

#endif /* LIBHEIF_TPU_CXX_HPP */
