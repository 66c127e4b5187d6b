/* Exercises the widened C ABI surface end-to-end: version/brand
 * probing, item + metadata enumeration, thumbnails, color profiles,
 * security limits, encoder registry + parameters, region creation and
 * readback, grid assembly and write/reload.
 *
 * Usage: example_api_surface <input.heic> <module_path> <out.heif>
 * Prints "API-SURFACE-OK" on success.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "heif_shim.h"
#include "heif_shim_ext.h"

#define CHECK(cond, msg)                         \
  do {                                           \
    if (!(cond)) {                               \
      fprintf(stderr, "FAIL: %s\n", msg);        \
      return 1;                                  \
    }                                            \
  } while (0)

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s <input.heic> <module_path> <out.heif>\n",
            argv[0]);
    return 2;
  }
  heif_shim_set_module_path(argv[2]);

  /* version + library */
  CHECK(heif_get_version_number_major() >= 1, "version major");
  CHECK(heif_init(NULL).code == heif_error_Ok, "heif_init");

  /* brand probing on the raw file bytes */
  FILE* f = fopen(argv[1], "rb");
  CHECK(f, "open input");
  uint8_t head[256];
  size_t n = fread(head, 1, sizeof(head), f);
  fclose(f);
  CHECK(n > 16, "read input head");
  heif_brand2 mb = heif_main_brand(head, (int)n);
  char fcc[5] = {0};
  heif_brand_to_fourcc(mb, fcc);
  printf("main brand: %s\n", fcc);
  CHECK(mb != 0, "main brand");
  CHECK(heif_check_filetype(head, (int)n) == heif_filetype_yes_supported,
        "check_filetype");
  const char* mime = heif_get_file_mime_type(head, (int)n);
  printf("mime: %s\n", mime);
  CHECK(strstr(mime, "hei") || strstr(mime, "avif"), "mime type");

  /* context + items */
  heif_context* ctx = heif_context_alloc();
  CHECK(ctx, "context alloc");
  CHECK(heif_context_read_from_file(ctx, argv[1], NULL).code ==
            heif_error_Ok,
        "read_from_file");
  int n_items = heif_context_get_number_of_items(ctx);
  printf("items: %d\n", n_items);
  CHECK(n_items > 0, "item count");
  heif_item_id ids[64];
  int n_ids = heif_context_get_list_of_item_IDs(ctx, ids, 64);
  CHECK(n_ids == n_items, "item id list");
  uint32_t ty = heif_item_get_item_type(ctx, ids[0]);
  char tfcc[5] = {0};
  heif_brand_to_fourcc(ty, tfcc);
  printf("item[0] type: %s\n", tfcc);
  CHECK(ty != 0, "item type");

  /* primary handle + geometry + thumbnails */
  heif_image_handle* h = NULL;
  CHECK(heif_context_get_primary_image_handle(ctx, &h).code ==
            heif_error_Ok,
        "primary handle");
  printf("primary: %dx%d item %u\n", heif_image_handle_get_width(h),
         heif_image_handle_get_height(h),
         heif_image_handle_get_item_id(h));
  CHECK(heif_image_handle_get_ispe_width(h) > 0, "ispe width");
  CHECK(heif_image_handle_get_luma_bits_per_pixel(h) == 8, "luma bits");
  int n_thumb = heif_image_handle_get_number_of_thumbnails(h);
  printf("thumbnails: %d\n", n_thumb);
  if (n_thumb > 0) {
    heif_item_id tids[8];
    int nt = heif_image_handle_get_list_of_thumbnail_IDs(h, tids, 8);
    CHECK(nt == n_thumb, "thumbnail id list");
    heif_image_handle* th = NULL;
    CHECK(heif_image_handle_get_thumbnail(h, tids[0], &th).code ==
              heif_error_Ok,
          "thumbnail handle");
    CHECK(heif_image_handle_get_width(th) > 0, "thumbnail width");
    heif_image_handle_release(th);
  }

  /* metadata blocks (count only; may be zero) */
  int n_meta = heif_image_handle_get_number_of_metadata_blocks(h, NULL);
  printf("metadata blocks: %d\n", n_meta);
  if (n_meta > 0) {
    heif_item_id mids[16];
    heif_image_handle_get_list_of_metadata_block_IDs(h, NULL, mids, 16);
    size_t msz = heif_image_handle_get_metadata_size(h, mids[0]);
    const char* mty = heif_image_handle_get_metadata_type(h, mids[0]);
    printf("meta[0]: type=%s size=%zu\n", mty ? mty : "?", msz);
    heif_string_release(mty);
  }

  /* security limits roundtrip */
  heif_security_limits lim;
  CHECK(heif_context_get_security_limits(ctx, &lim).code ==
            heif_error_Ok,
        "get security limits");
  lim.max_items = 5000;
  CHECK(heif_context_set_security_limits(ctx, &lim).code ==
            heif_error_Ok,
        "set security limits");
  heif_security_limits lim2;
  heif_context_get_security_limits(ctx, &lim2);
  CHECK(lim2.max_items == 5000, "limits roundtrip");
  CHECK(heif_get_global_security_limits()->max_items > 0,
        "global limits");

  /* decode the primary image + color info */
  heif_image* img = NULL;
  CHECK(heif_decode_image(h, &img, heif_colorspace_YCbCr,
                          heif_chroma_420, NULL)
                .code == heif_error_Ok,
        "decode");
  CHECK(heif_image_get_bits_per_pixel(img, heif_channel_Y) == 8,
        "bpp");
  uint32_t ah, av;
  heif_image_get_pixel_aspect_ratio(img, &ah, &av);
  CHECK(ah >= 1 && av >= 1, "pasp");

  /* scale + extract area */
  heif_image* small = NULL;
  CHECK(heif_image_scale_image(img, &small, 64, 64, NULL).code ==
            heif_error_Ok,
        "scale");
  CHECK(heif_image_get_primary_width(small) == 64, "scaled width");
  heif_image* area = NULL;
  CHECK(heif_image_extract_area(img, 8, 8, 32, 32, NULL, &area).code ==
            heif_error_Ok,
        "extract area");
  CHECK(heif_image_get_primary_width(area) == 32, "area width");
  heif_image_release(area);

  /* encoder registry */
  CHECK(heif_have_encoder_for_format(heif_compression_HEVC),
        "have hevc encoder");
  CHECK(heif_have_decoder_for_format(heif_compression_AV1),
        "have av1 decoder");
  const heif_encoder_descriptor* descs[16];
  int nd = heif_get_encoder_descriptors(heif_compression_HEVC, NULL,
                                        descs, 16);
  CHECK(nd > 0, "encoder descriptors");
  const char* ename = heif_encoder_descriptor_get_name(descs[0]);
  printf("hevc encoder: %s\n", ename ? ename : "?");
  heif_string_release(ename);
  CHECK(heif_encoder_descriptor_supports_lossy_compression(descs[0]),
        "lossy support");

  /* build a fresh context: encode, region, thumbnail-assign, write */
  heif_context* wctx = heif_context_alloc();
  heif_encoder* enc = NULL;
  CHECK(heif_context_get_encoder_for_format(wctx,
                                            heif_compression_HEVC, &enc)
                .code == heif_error_Ok,
        "get encoder");
  const char* en2 = heif_encoder_get_name(enc);
  heif_string_release(en2);
  CHECK(heif_encoder_set_lossy_quality(enc, 70).code == heif_error_Ok,
        "set quality");
  const heif_encoder_parameter* const* params =
      heif_encoder_list_parameters(enc);
  CHECK(params && params[0], "encoder params");
  const char* pname = heif_encoder_parameter_get_name(params[0]);
  printf("param[0]: %s type %d\n", pname ? pname : "?",
         heif_encoder_parameter_get_type(params[0]));
  heif_string_release(pname);

  heif_image_handle* out_h = NULL;
  CHECK(heif_context_encode_image(wctx, small, enc, NULL, &out_h).code ==
            heif_error_Ok,
        "encode image");
  CHECK(heif_context_set_primary_image(wctx, out_h).code ==
            heif_error_Ok,
        "set primary");

  /* region item on the encoded image */
  heif_region_item* ri = NULL;
  CHECK(heif_image_handle_add_region_item(out_h, 64, 64, &ri).code ==
            heif_error_Ok,
        "add region item");
  heif_region* reg = NULL;
  CHECK(heif_region_item_add_region_rectangle(ri, 4, 4, 16, 16, &reg)
                .code == heif_error_Ok,
        "add rectangle region");
  heif_region_release(reg);

  /* exif metadata */
  static const uint8_t exif[] = {0, 0, 0, 0, 'M', 'M', 0, 42,
                                 0, 0, 0, 8, 0, 0};
  CHECK(heif_context_add_exif_metadata(wctx, out_h, exif,
                                       (int)sizeof(exif))
                .code == heif_error_Ok,
        "add exif");

  CHECK(heif_context_write_to_file(wctx, argv[3]).code == heif_error_Ok,
        "write");

  /* reload and verify the region + metadata survive */
  heif_context* rctx = heif_context_alloc();
  CHECK(heif_context_read_from_file(rctx, argv[3], NULL).code ==
            heif_error_Ok,
        "reload");
  heif_image_handle* rh = NULL;
  CHECK(heif_context_get_primary_image_handle(rctx, &rh).code ==
            heif_error_Ok,
        "reload primary");
  CHECK(heif_image_handle_get_number_of_region_items(rh) == 1,
        "reloaded region items");
  heif_item_id rids[4];
  heif_image_handle_get_list_of_region_item_ids(rh, rids, 4);
  heif_region_item* rri = NULL;
  CHECK(heif_context_get_region_item(rctx, rids[0], &rri).code ==
            heif_error_Ok,
        "reload region item");
  uint32_t rw, rhh;
  heif_region_item_get_reference_size(rri, &rw, &rhh);
  CHECK(rw == 64 && rhh == 64, "region reference size");
  CHECK(heif_region_item_get_number_of_regions(rri) == 1,
        "region count");
  heif_region* regs[4];
  CHECK(heif_region_item_get_list_of_regions(rri, regs, 4) == 1,
        "region list");
  CHECK(heif_region_get_type(regs[0]) == 1, "region type rectangle");
  int32_t rx, ry;
  uint32_t rw2, rh2;
  CHECK(heif_region_get_rectangle(regs[0], &rx, &ry, &rw2, &rh2).code ==
            heif_error_Ok,
        "region rectangle");
  CHECK(rx == 4 && ry == 4 && rw2 == 16 && rh2 == 16,
        "rectangle values");
  heif_region_release(regs[0]);
  heif_region_item_release(rri);
  CHECK(heif_image_handle_get_number_of_metadata_blocks(rh, "Exif") ==
            1,
        "reloaded exif block");

  /* sequences: none in this file */
  CHECK(heif_context_has_sequence(rctx) == 0, "no sequence");
  CHECK(heif_context_number_of_sequence_tracks(rctx) == 0, "no tracks");

  heif_image_handle_release(rh);
  heif_context_free(rctx);
  heif_region_item_release(ri);
  heif_image_handle_release(out_h);
  heif_encoder_release(enc);
  heif_context_free(wctx);
  heif_image_release(small);
  heif_image_release(img);
  heif_image_handle_release(h);
  heif_context_free(ctx);
  printf("API-SURFACE-OK\n");
  return 0;
}
