/* C++ smoke consumer for the heif::* RAII wrapper (heif_cxx.hpp).
 *
 * Usage: example_cxx <input.heic> <module_path> [out.heic]
 *
 * Exercises the class surface end-to-end: Context read, primary
 * handle, decode to planes, encoder descriptors + parameter
 * introspection, lossy encode, metadata attach, write, reload.
 * Mirrors the upstream cxx_wrapper test's flow (reference:
 * tests/cxx_wrapper.cc over libheif/api/libheif/heif_cxx.h).
 */

#include <cstdio>
#include <cstring>
#include <vector>

#include "heif_cxx.hpp"

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <input.heic> <module_path> [out.heic]\n",
            argv[0]);
    return 2;
  }
  heif_shim_set_module_path(argv[2]);

  try {
    heif::Context ctx;
    ctx.read_from_file(argv[1]);

    int n = ctx.get_number_of_top_level_images();
    std::vector<heif_item_id> ids = ctx.get_list_of_top_level_image_IDs();
    printf("top-level images: %d (list %zu)\n", n, ids.size());
    if ((int)ids.size() != n) return 1;

    heif::ImageHandle handle = ctx.get_primary_image_handle();
    printf("primary %dx%d alpha=%d\n", handle.get_width(),
           handle.get_height(), handle.has_alpha_channel() ? 1 : 0);
    if (!handle.is_primary_image()) return 1;

    for (heif_item_id tid : handle.get_list_of_thumbnail_IDs()) {
      heif::ImageHandle th = handle.get_thumbnail(tid);
      printf("thumbnail %u: %dx%d\n", tid, th.get_width(),
             th.get_height());
    }

    heif::Image img = handle.decode_image(heif_colorspace_RGB,
                                          heif_chroma_interleaved_RGB);
    int stride = 0;
    const uint8_t* plane =
        img.get_plane(heif_channel_interleaved, &stride);
    if (!plane) return 1;
    unsigned long sum = 0;
    for (int x = 0; x < img.get_primary_width() * 3; x++)
      sum += plane[x];
    printf("decoded %dx%d stride %d checksum %lu\n",
           img.get_primary_width(), img.get_primary_height(), stride,
           sum);

    // encoder registry via descriptors
    std::vector<heif::EncoderDescriptor> descs =
        heif::EncoderDescriptor::get_encoder_descriptors(
            heif_compression_HEVC, nullptr);
    printf("hevc encoders: %zu\n", descs.size());
    if (descs.empty()) return 1;
    printf("  %s (%s) lossy=%d lossless=%d\n",
           descs[0].get_name().c_str(), descs[0].get_id_name().c_str(),
           descs[0].supports_lossy_compression() ? 1 : 0,
           descs[0].supports_lossless_compression() ? 1 : 0);

    heif::Encoder enc = ctx.get_encoder_for_format(heif_compression_HEVC);
    enc.set_lossy_quality(55);
    std::vector<heif::EncoderParameter> params = enc.list_parameters();
    printf("encoder '%s' parameters: %zu\n", enc.get_name().c_str(),
           params.size());
    for (size_t i = 0; i < params.size() && i < 3; i++)
      printf("  param %s type %d\n", params[i].get_name().c_str(),
             params[i].get_type());

    if (argc > 3) {
      heif::Context out_ctx;
      heif::ImageHandle encoded = out_ctx.encode_image(img, enc);
      printf("encoded item %dx%d\n", encoded.get_width(),
             encoded.get_height());
      static const uint8_t exif[] = {0, 0, 'M', 'M', 0, 42, 0, 0, 0, 8,
                                     0, 0};
      out_ctx.add_exif_metadata(encoded, exif, sizeof(exif));
      out_ctx.write_to_file(argv[3]);
      printf("wrote %s\n", argv[3]);

      heif::Context back;
      back.read_from_file(argv[3]);
      heif::ImageHandle h2 = back.get_primary_image_handle();
      std::vector<heif_item_id> mids =
          h2.get_list_of_metadata_block_IDs("Exif");
      printf("reloaded %dx%d exif blocks %zu\n", h2.get_width(),
             h2.get_height(), mids.size());
      if (mids.size() != 1) return 1;
      std::vector<uint8_t> m = h2.get_metadata(mids[0]);
      // stored Exif payload = 4-byte offset header + TIFF data
      if (m.size() < sizeof(exif)) return 1;
    }

    // error path: missing file throws heif::Error
    try {
      heif::Context bad;
      bad.read_from_file("/nonexistent/file.heic");
      return 1;  // must not get here
    } catch (const heif::Error& e) {
      printf("expected error: code %d (%s)\n", (int)e.get_code(),
             e.get_message().c_str());
    }

    printf("cxx done\n");
    return 0;
  } catch (const heif::Error& err) {
    fprintf(stderr, "heif::Error: %s\n", err.what());
    return 1;
  }
}
