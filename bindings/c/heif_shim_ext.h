/* libheif_tpu C ABI shim — extended API surface.
 *
 * Widens heif_shim.h toward the full upstream libheif C API: items,
 * metadata, properties, color profiles, regions, text items, tiling,
 * entity groups, sequences/tracks, security limits, encoder/decoder
 * descriptors and image operations (reference:
 * libheif/api/libheif/heif_items.h, heif_metadata.h, heif_properties.h,
 * heif_color.h, heif_regions.h, heif_text.h, heif_tiling.h,
 * heif_entity_groups.h, heif_sequences.h, heif_security.h,
 * heif_encoding.h, heif_decoding.h, heif_brands.h, heif_library.h).
 *
 * Marshaling convention: every function routes by name into the
 * libheif_tpu.api package (whose functions mirror these signatures);
 * strings returned as `char*` are heap copies — release them with
 * heif_string_release(). Fixed-size out-structs mirror the upstream
 * ABI layout field-for-field where the reference exposes a struct.
 */

#ifndef LIBHEIF_TPU_SHIM_EXT_H
#define LIBHEIF_TPU_SHIM_EXT_H

#include "heif_shim.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef uint32_t heif_brand2;
typedef uint32_t heif_property_id;

/* opaque boxes over Python api objects */
typedef struct heif_region_item heif_region_item;
typedef struct heif_region heif_region;
typedef struct heif_text_item heif_text_item;
typedef struct heif_track heif_track;
typedef struct heif_raw_sequence_sample heif_raw_sequence_sample;
typedef struct heif_encoder heif_encoder;
typedef struct heif_encoder_descriptor heif_encoder_descriptor;
typedef struct heif_decoder_descriptor heif_decoder_descriptor;
typedef struct heif_encoder_parameter heif_encoder_parameter;
typedef struct heif_nclx_color_profile heif_nclx_color_profile;

/* ------------------------------------------------------------------ */
/* library / version                                                   */

uint32_t heif_get_version_number(void);
int heif_get_version_number_major(void);
int heif_get_version_number_minor(void);
int heif_get_version_number_maintenance(void);
heif_error heif_init(const void* init_params);
void heif_deinit(void);
void heif_string_release(const char* s);

/* ------------------------------------------------------------------ */
/* brands / filetype probing (heif_brands.h)                           */

enum heif_filetype_result {
  heif_filetype_no = 0,
  heif_filetype_yes_supported = 1,
  heif_filetype_yes_unsupported = 2,
  heif_filetype_maybe = 3
};

heif_brand2 heif_main_brand(const uint8_t* data, int len);
heif_brand2 heif_read_main_brand(const uint8_t* data, int len);
uint32_t heif_read_minor_version_brand(const uint8_t* data, int len);
heif_brand2 heif_fourcc_to_brand(const char* fourcc);
void heif_brand_to_fourcc(heif_brand2 brand, char* out_fourcc);
int heif_has_compatible_brand(const uint8_t* data, int len,
                              const char* brand_fourcc);
heif_error heif_list_compatible_brands(const uint8_t* data, int len,
                                       heif_brand2** out_brands,
                                       int* out_size);
void heif_free_list_of_compatible_brands(heif_brand2* brands);
enum heif_filetype_result heif_check_filetype(const uint8_t* data,
                                              int len);
int heif_check_jpeg_filetype(const uint8_t* data, int len);
const char* heif_get_file_mime_type(const uint8_t* data, int len);

/* ------------------------------------------------------------------ */
/* context extras                                                      */

int heif_context_get_number_of_items(const heif_context*);
int heif_context_get_list_of_item_IDs(const heif_context*,
                                      heif_item_id* ids, int count);
int heif_context_get_list_of_top_level_image_IDs(const heif_context*,
                                                 heif_item_id* ids,
                                                 int count);
int heif_context_is_top_level_image_ID(const heif_context*, heif_item_id);
heif_error heif_context_set_primary_image(heif_context*,
                                          heif_image_handle*);
void heif_context_set_major_brand(heif_context*, heif_brand2 brand);
void heif_context_add_compatible_brand(heif_context*, heif_brand2 brand);
void heif_context_set_maximum_image_size_limit(heif_context*,
                                               int maximum_width);
void heif_context_set_max_decoding_threads(heif_context*, int n);
int heif_context_get_max_decoding_threads(const heif_context*);
heif_error heif_context_set_write_mini_format(heif_context*, int enable);
void heif_context_debug_dump_boxes_to_file(heif_context*, int fd);

/* ------------------------------------------------------------------ */
/* security limits (heif_security.h)                                   */

typedef struct heif_security_limits {
  uint8_t version;
  uint64_t max_image_size_pixels;
  uint64_t max_number_of_tiles;
  uint32_t max_bayer_pattern_pixels;
  uint32_t max_items;
  uint32_t max_color_profile_size;
  uint64_t max_memory_block_size;
  uint32_t max_components;
  uint32_t max_iloc_extents_per_item;
  uint32_t max_size_entity_group;
  uint32_t max_children_per_box;
  uint64_t max_total_memory;
  uint32_t max_sample_description_box_entries;
  uint32_t max_sample_group_description_box_entries;
} heif_security_limits;

const heif_security_limits* heif_get_global_security_limits(void);
const heif_security_limits* heif_get_disabled_security_limits(void);
heif_error heif_context_get_security_limits(const heif_context*,
                                            heif_security_limits* out);
heif_error heif_context_set_security_limits(
    heif_context*, const heif_security_limits* limits);

/* ------------------------------------------------------------------ */
/* image handle extras                                                 */

heif_item_id heif_image_handle_get_item_id(const heif_image_handle*);
int heif_image_handle_get_ispe_width(const heif_image_handle*);
int heif_image_handle_get_ispe_height(const heif_image_handle*);
int heif_image_handle_get_luma_bits_per_pixel(const heif_image_handle*);
int heif_image_handle_get_chroma_bits_per_pixel(const heif_image_handle*);
int heif_image_handle_is_premultiplied_alpha(const heif_image_handle*);
heif_error heif_image_handle_get_preferred_decoding_colorspace(
    const heif_image_handle*, enum heif_colorspace* out_colorspace,
    enum heif_chroma* out_chroma);

int heif_image_handle_get_number_of_thumbnails(const heif_image_handle*);
int heif_image_handle_get_list_of_thumbnail_IDs(const heif_image_handle*,
                                                heif_item_id* ids,
                                                int count);
heif_error heif_image_handle_get_thumbnail(const heif_image_handle*,
                                           heif_item_id thumbnail_id,
                                           heif_image_handle** out);

int heif_image_handle_get_number_of_auxiliary_images(
    const heif_image_handle*, int aux_filter);
int heif_image_handle_get_list_of_auxiliary_image_IDs(
    const heif_image_handle*, int aux_filter, heif_item_id* ids,
    int count);
heif_error heif_image_handle_get_auxiliary_image_handle(
    const heif_image_handle*, heif_item_id aux_id,
    heif_image_handle** out);
heif_error heif_image_handle_get_auxiliary_type(const heif_image_handle*,
                                                const char** out_type);
void heif_image_handle_release_auxiliary_type(const heif_image_handle*,
                                              const char** aux_type);

int heif_image_handle_has_depth_image(const heif_image_handle*);
int heif_image_handle_get_number_of_depth_images(const heif_image_handle*);
int heif_image_handle_get_list_of_depth_image_IDs(const heif_image_handle*,
                                                  heif_item_id* ids,
                                                  int count);
heif_error heif_image_handle_get_depth_image_handle(
    const heif_image_handle*, heif_item_id depth_id,
    heif_image_handle** out);

/* metadata blocks (heif_metadata.h) */
int heif_image_handle_get_number_of_metadata_blocks(
    const heif_image_handle*, const char* type_filter);
int heif_image_handle_get_list_of_metadata_block_IDs(
    const heif_image_handle*, const char* type_filter,
    heif_item_id* ids, int count);
const char* heif_image_handle_get_metadata_type(const heif_image_handle*,
                                                heif_item_id metadata_id);
const char* heif_image_handle_get_metadata_content_type(
    const heif_image_handle*, heif_item_id metadata_id);
const char* heif_image_handle_get_metadata_item_uri_type(
    const heif_image_handle*, heif_item_id metadata_id);
size_t heif_image_handle_get_metadata_size(const heif_image_handle*,
                                           heif_item_id metadata_id);
heif_error heif_image_handle_get_metadata(const heif_image_handle*,
                                          heif_item_id metadata_id,
                                          void* out_data);

heif_error heif_context_add_exif_metadata(heif_context*,
                                          const heif_image_handle*,
                                          const void* data, int size);
heif_error heif_context_add_XMP_metadata(heif_context*,
                                         const heif_image_handle*,
                                         const void* data, int size);
heif_error heif_context_add_generic_metadata(heif_context*,
                                             const heif_image_handle*,
                                             const void* data, int size,
                                             const char* item_type,
                                             const char* content_type);
heif_error heif_context_add_generic_uri_metadata(
    heif_context*, const heif_image_handle*, const void* data, int size,
    const char* item_uri_type, heif_item_id* out_item_id);

/* ------------------------------------------------------------------ */
/* items (heif_items.h)                                                */

uint32_t heif_item_get_item_type(const heif_context*, heif_item_id);
int heif_item_is_item_hidden(const heif_context*, heif_item_id);
const char* heif_item_get_mime_item_content_type(const heif_context*,
                                                 heif_item_id);
const char* heif_item_get_mime_item_content_encoding(const heif_context*,
                                                     heif_item_id);
const char* heif_item_get_uri_item_uri_type(const heif_context*,
                                            heif_item_id);
const char* heif_item_get_item_name(const heif_context*, heif_item_id);
heif_error heif_item_set_item_name(heif_context*, heif_item_id,
                                   const char* name);
heif_error heif_item_get_item_data(const heif_context*, heif_item_id,
                                   int* out_compression_format,
                                   uint8_t** out_data, size_t* out_size);
void heif_release_item_data(const heif_context*, uint8_t** item_data);

heif_error heif_context_add_item(heif_context*, const char* item_type,
                                 const void* data, int size,
                                 heif_item_id* out_item_id);
heif_error heif_context_add_mime_item(heif_context*,
                                      const char* content_type,
                                      const void* data, int size,
                                      heif_item_id* out_item_id);
heif_error heif_context_add_precompressed_mime_item(
    heif_context*, const char* content_type,
    const char* content_encoding, const void* data, int size,
    heif_item_id* out_item_id);
heif_error heif_context_add_uri_item(heif_context*, const char* item_uri_type,
                                     const void* data, int size,
                                     heif_item_id* out_item_id);
heif_error heif_context_add_item_reference(heif_context*,
                                           const char* reference_type,
                                           heif_item_id from_item,
                                           heif_item_id to_item);
heif_error heif_context_add_item_references(heif_context*,
                                            const char* reference_type,
                                            heif_item_id from_item,
                                            const heif_item_id* to_items,
                                            int count);
int heif_context_get_item_references(const heif_context*,
                                     heif_item_id from_item,
                                     int reference_idx,
                                     uint32_t* out_reference_type,
                                     heif_item_id* out_ids, int count);

/* ------------------------------------------------------------------ */
/* properties (heif_properties.h)                                      */

int heif_item_get_properties_of_type(const heif_context*, heif_item_id,
                                     const char* type_fourcc,
                                     heif_property_id* out_props,
                                     int count);
int heif_item_get_transformation_properties(const heif_context*,
                                            heif_item_id,
                                            heif_property_id* out_props,
                                            int count);
uint32_t heif_item_get_property_type(const heif_context*, heif_item_id,
                                     heif_property_id);
size_t heif_item_get_property_raw_size(const heif_context*, heif_item_id,
                                       heif_property_id);
heif_error heif_item_get_property_raw_data(const heif_context*,
                                           heif_item_id, heif_property_id,
                                           uint8_t* out_data);
heif_error heif_item_add_raw_property(heif_context*, heif_item_id,
                                      const char* fourcc,
                                      const uint8_t* uuid_type,
                                      const uint8_t* data, size_t size,
                                      int is_essential,
                                      heif_property_id* out_id);
int heif_item_get_property_transform_rotation_ccw(const heif_context*,
                                                  heif_item_id,
                                                  heif_property_id);
int heif_item_get_property_transform_mirror(const heif_context*,
                                            heif_item_id,
                                            heif_property_id);
heif_error heif_item_get_property_transform_crop_borders(
    const heif_context*, heif_item_id, heif_property_id,
    int image_width, int image_height, int* left, int* top, int* right,
    int* bottom);
heif_error heif_item_get_property_user_description(const heif_context*,
                                                   heif_item_id,
                                                   heif_property_id,
                                                   char** out_lang,
                                                   char** out_name,
                                                   char** out_description,
                                                   char** out_tags);
heif_error heif_item_add_property_user_description(
    heif_context*, heif_item_id, const char* lang, const char* name,
    const char* description, const char* tags, heif_property_id* out_id);

/* ------------------------------------------------------------------ */
/* color profiles (heif_color.h)                                       */

struct heif_nclx_color_profile {
  uint8_t version;
  int color_primaries;
  int transfer_characteristics;
  int matrix_coefficients;
  uint8_t full_range_flag;
};

typedef struct heif_content_light_level {
  uint16_t max_content_light_level;
  uint16_t max_pic_average_light_level;
} heif_content_light_level;

typedef struct heif_mastering_display_colour_volume {
  uint16_t display_primaries_x[3];
  uint16_t display_primaries_y[3];
  uint16_t white_point_x;
  uint16_t white_point_y;
  uint32_t max_display_mastering_luminance;
  uint32_t min_display_mastering_luminance;
} heif_mastering_display_colour_volume;

uint32_t heif_image_handle_get_color_profile_type(const heif_image_handle*);
size_t heif_image_handle_get_raw_color_profile_size(
    const heif_image_handle*);
heif_error heif_image_handle_get_raw_color_profile(
    const heif_image_handle*, void* out_data);
heif_error heif_image_handle_get_nclx_color_profile(
    const heif_image_handle*, heif_nclx_color_profile** out);

heif_nclx_color_profile* heif_nclx_color_profile_alloc(void);
void heif_nclx_color_profile_free(heif_nclx_color_profile*);
heif_error heif_nclx_color_profile_set_color_primaries(
    heif_nclx_color_profile*, uint16_t cp);
heif_error heif_nclx_color_profile_set_transfer_characteristics(
    heif_nclx_color_profile*, uint16_t tc);
heif_error heif_nclx_color_profile_set_matrix_coefficients(
    heif_nclx_color_profile*, uint16_t mc);

uint32_t heif_image_get_color_profile_type(const heif_image*);
size_t heif_image_get_raw_color_profile_size(const heif_image*);
heif_error heif_image_get_raw_color_profile(const heif_image*,
                                            void* out_data);
heif_error heif_image_get_nclx_color_profile(const heif_image*,
                                             heif_nclx_color_profile** out);
heif_error heif_image_set_raw_color_profile(heif_image*,
                                            const char* profile_type_4cc,
                                            const void* data,
                                            size_t size);
heif_error heif_image_set_nclx_color_profile(
    heif_image*, const heif_nclx_color_profile*);
void heif_image_remove_color_profile(heif_image*);

int heif_image_handle_has_content_light_level(const heif_image_handle*);
void heif_image_handle_get_content_light_level(
    const heif_image_handle*, heif_content_light_level* out);
int heif_image_handle_has_mastering_display_colour_volume(
    const heif_image_handle*);
heif_error heif_image_handle_get_mastering_display_colour_volume(
    const heif_image_handle*, heif_mastering_display_colour_volume* out);
int heif_image_has_content_light_level(const heif_image*);
void heif_image_get_content_light_level(const heif_image*,
                                        heif_content_light_level* out);
void heif_image_set_content_light_level(heif_image*,
                                        const heif_content_light_level*);

/* ------------------------------------------------------------------ */
/* image operations                                                    */

int heif_image_get_bits_per_pixel(const heif_image*, enum heif_channel);
heif_error heif_image_crop(heif_image*, int left, int right, int top,
                           int bottom);
heif_error heif_image_scale_image(const heif_image*, heif_image** out,
                                  int width, int height,
                                  const void* unused_options);
heif_error heif_image_extend_padding_to_size(heif_image*, int min_width,
                                             int min_height);
heif_error heif_image_extend_to_size_fill_with_zero(heif_image*,
                                                    uint32_t width,
                                                    uint32_t height);
heif_error heif_image_extract_area(const heif_image*, uint32_t x0,
                                   uint32_t y0, uint32_t w, uint32_t h,
                                   const void* unused_limits,
                                   heif_image** out);
int heif_image_is_premultiplied_alpha(const heif_image*);
void heif_image_set_premultiplied_alpha(heif_image*, int flag);
heif_error heif_image_get_pixel_aspect_ratio(const heif_image*,
                                             uint32_t* aspect_h,
                                             uint32_t* aspect_v);
void heif_image_set_pixel_aspect_ratio(heif_image*, uint32_t aspect_h,
                                       uint32_t aspect_v);
int heif_image_has_chroma_location(const heif_image*);
int heif_image_get_chroma_location(const heif_image*);
void heif_image_set_chroma_location(heif_image*, int loc);
uint64_t heif_image_get_duration(const heif_image*);
void heif_image_set_duration(heif_image*, uint64_t duration);
heif_error heif_image_add_plane_safe(heif_image*, enum heif_channel,
                                     int width, int height,
                                     int bit_depth,
                                     const void* unused_limits);
uint8_t* heif_image_get_plane(heif_image*, enum heif_channel,
                              int* out_stride);

/* ------------------------------------------------------------------ */
/* regions (heif_regions.h)                                            */

int heif_image_handle_get_number_of_region_items(const heif_image_handle*);
int heif_image_handle_get_list_of_region_item_ids(
    const heif_image_handle*, heif_item_id* ids, int count);
heif_error heif_context_get_region_item(const heif_context*,
                                        heif_item_id,
                                        heif_region_item** out);
heif_item_id heif_region_item_get_id(heif_region_item*);
void heif_region_item_release(heif_region_item*);
void heif_region_item_get_reference_size(heif_region_item*,
                                         uint32_t* out_width,
                                         uint32_t* out_height);
int heif_region_item_get_number_of_regions(const heif_region_item*);
int heif_region_item_get_list_of_regions(const heif_region_item*,
                                         heif_region** out_regions,
                                         int count);
void heif_region_release(const heif_region*);
void heif_region_release_many(const heif_region* const* regions, int n);
int heif_region_get_type(const heif_region*);
heif_error heif_region_get_point(const heif_region*, int32_t* x,
                                 int32_t* y);
heif_error heif_region_get_rectangle(const heif_region*, int32_t* x,
                                     int32_t* y, uint32_t* w,
                                     uint32_t* h);
heif_error heif_region_get_ellipse(const heif_region*, int32_t* x,
                                   int32_t* y, uint32_t* rx,
                                   uint32_t* ry);
int heif_region_get_polygon_num_points(const heif_region*);
heif_error heif_region_get_polygon_points(const heif_region*,
                                          int32_t* out_pts);
int heif_region_get_polyline_num_points(const heif_region*);
heif_error heif_region_get_polyline_points(const heif_region*,
                                           int32_t* out_pts);
heif_error heif_region_get_point_transformed(const heif_region*,
                                             const heif_region_item*,
                                             const heif_image_handle*,
                                             double* x, double* y);
heif_error heif_region_get_rectangle_transformed(
    const heif_region*, const heif_region_item*,
    const heif_image_handle*, double* x, double* y, double* w,
    double* h);
heif_error heif_region_get_ellipse_transformed(
    const heif_region*, const heif_region_item*,
    const heif_image_handle*, double* x, double* y, double* rx,
    double* ry);
heif_error heif_region_get_polygon_points_transformed(
    const heif_region*, const heif_region_item*,
    const heif_image_handle*, double* out_pts);
heif_error heif_region_get_polyline_points_transformed(
    const heif_region*, const heif_region_item*,
    const heif_image_handle*, double* out_pts);
heif_error heif_region_get_referenced_mask_ID(const heif_region*,
                                              int32_t* x, int32_t* y,
                                              uint32_t* w, uint32_t* h,
                                              heif_item_id* out_id);
size_t heif_region_get_inline_mask_data_len(const heif_region*);
heif_error heif_region_get_inline_mask_data(const heif_region*,
                                            uint8_t* out_data);
heif_error heif_image_handle_add_region_item(heif_image_handle*,
                                             uint32_t reference_width,
                                             uint32_t reference_height,
                                             heif_region_item** out);
heif_error heif_region_item_add_region_point(heif_region_item*,
                                             int32_t x, int32_t y,
                                             heif_region** out_region);
heif_error heif_region_item_add_region_rectangle(heif_region_item*,
                                                 int32_t x, int32_t y,
                                                 uint32_t w, uint32_t h,
                                                 heif_region** out_region);
heif_error heif_region_item_add_region_ellipse(heif_region_item*,
                                               int32_t cx, int32_t cy,
                                               uint32_t rx, uint32_t ry,
                                               heif_region** out_region);
heif_error heif_region_item_add_region_polygon(heif_region_item*,
                                               const int32_t* pts,
                                               int nPoints,
                                               heif_region** out_region);
heif_error heif_region_item_add_region_polyline(heif_region_item*,
                                                const int32_t* pts,
                                                int nPoints,
                                                heif_region** out_region);
heif_error heif_region_item_add_region_referenced_mask(
    heif_region_item*, int32_t x, int32_t y, uint32_t w, uint32_t h,
    heif_item_id mask_item_id, heif_region** out_region);
heif_error heif_region_item_add_region_inline_mask_data(
    heif_region_item*, int32_t x, int32_t y, uint32_t w, uint32_t h,
    const uint8_t* mask_data, size_t mask_data_len,
    heif_region** out_region);

/* ------------------------------------------------------------------ */
/* text items (heif_text.h)                                            */

int heif_image_handle_get_number_of_text_items(const heif_image_handle*);
int heif_image_handle_get_list_of_text_item_ids(const heif_image_handle*,
                                                heif_item_id* ids,
                                                int count);
heif_error heif_context_get_text_item(const heif_context*, heif_item_id,
                                      heif_text_item** out);
heif_item_id heif_text_item_get_id(heif_text_item*);
const char* heif_text_item_get_content(heif_text_item*);
void heif_text_item_release(heif_text_item*);
heif_error heif_image_handle_add_text_item(heif_image_handle*,
                                           const char* content_type,
                                           const char* text,
                                           heif_text_item** out);

/* ------------------------------------------------------------------ */
/* tiling (heif_tiling.h)                                              */

typedef struct heif_image_tiling {
  int version;
  uint32_t num_columns;
  uint32_t num_rows;
  uint32_t tile_width;
  uint32_t tile_height;
  uint32_t image_width;
  uint32_t image_height;
  uint32_t top_offset;
  uint32_t left_offset;
  uint8_t number_of_extra_dimensions;
  uint32_t extra_dimension_size[8];
} heif_image_tiling;

heif_error heif_image_handle_get_image_tiling(const heif_image_handle*,
                                              int process_image_transformations,
                                              heif_image_tiling* out);
heif_error heif_image_handle_get_grid_image_tile_id(
    const heif_image_handle*, int process_image_transformations,
    uint32_t tile_x, uint32_t tile_y, heif_item_id* out_id);
heif_error heif_image_handle_decode_image_tile(
    const heif_image_handle*, heif_image** out_img,
    enum heif_colorspace colorspace, enum heif_chroma chroma,
    const void* unused_options, uint32_t tile_x, uint32_t tile_y);
heif_error heif_context_add_grid_image(heif_context*,
                                       uint32_t image_width,
                                       uint32_t image_height,
                                       uint32_t columns, uint32_t rows,
                                       const heif_item_id* tile_ids,
                                       heif_image_handle** out);
heif_error heif_context_add_image_tile(heif_context*,
                                       heif_image_handle* tiled_image,
                                       uint32_t tile_x, uint32_t tile_y,
                                       const heif_image* image,
                                       const char* codec);

/* ------------------------------------------------------------------ */
/* entity groups / pyramid                                             */

typedef struct heif_entity_group {
  uint32_t entity_group_id;
  uint32_t entity_group_type;
  heif_item_id* entities;
  uint32_t num_entities;
} heif_entity_group;

heif_entity_group* heif_context_get_entity_groups(const heif_context*,
                                                  uint32_t type_filter,
                                                  uint32_t item_filter,
                                                  int* out_num_groups);
void heif_entity_groups_release(heif_entity_group* groups, int n);

/* ------------------------------------------------------------------ */
/* encoder / decoder registry (heif_encoding.h, heif_decoding.h)       */

enum heif_compression_format {
  heif_compression_undefined = 0,
  heif_compression_HEVC = 1,
  heif_compression_AVC = 2,
  heif_compression_JPEG = 3,
  heif_compression_AV1 = 4,
  heif_compression_VVC = 5,
  heif_compression_EVC = 6,
  heif_compression_JPEG2000 = 7,
  heif_compression_uncompressed = 8,
  heif_compression_mask = 9,
  heif_compression_HTJ2K = 10
};

int heif_have_decoder_for_format(enum heif_compression_format);
int heif_have_encoder_for_format(enum heif_compression_format);
int heif_get_decoder_descriptors(enum heif_compression_format,
                                 const heif_decoder_descriptor** out,
                                 int count);
int heif_get_encoder_descriptors(enum heif_compression_format,
                                 const char* name_filter,
                                 const heif_encoder_descriptor** out,
                                 int count);
const char* heif_decoder_descriptor_get_name(
    const heif_decoder_descriptor*);
const char* heif_decoder_descriptor_get_id_name(
    const heif_decoder_descriptor*);
const char* heif_encoder_descriptor_get_name(
    const heif_encoder_descriptor*);
const char* heif_encoder_descriptor_get_id_name(
    const heif_encoder_descriptor*);
enum heif_compression_format
heif_encoder_descriptor_get_compression_format(
    const heif_encoder_descriptor*);
int heif_encoder_descriptor_supports_lossy_compression(
    const heif_encoder_descriptor*);
int heif_encoder_descriptor_supports_lossless_compression(
    const heif_encoder_descriptor*);
/* historical upstream typo aliases */
int heif_encoder_descriptor_supportes_lossy_compression(
    const heif_encoder_descriptor*);
int heif_encoder_descriptor_supportes_lossless_compression(
    const heif_encoder_descriptor*);

heif_error heif_context_get_encoder_for_format(
    heif_context*, enum heif_compression_format, heif_encoder** out);
heif_error heif_context_get_encoder(heif_context*,
                                    const heif_encoder_descriptor*,
                                    heif_encoder** out);
void heif_encoder_release(heif_encoder*);
const char* heif_encoder_get_name(const heif_encoder*);
heif_error heif_encoder_set_lossy_quality(heif_encoder*, int quality);
heif_error heif_encoder_set_lossless(heif_encoder*, int enable);
heif_error heif_encoder_set_logging_level(heif_encoder*, int level);
const heif_encoder_parameter* const* heif_encoder_list_parameters(
    heif_encoder*);
const char* heif_encoder_parameter_get_name(
    const heif_encoder_parameter*);
int heif_encoder_parameter_get_type(const heif_encoder_parameter*);
heif_error heif_encoder_set_parameter_integer(heif_encoder*,
                                              const char* name,
                                              int value);
heif_error heif_encoder_get_parameter_integer(heif_encoder*,
                                              const char* name,
                                              int* out_value);
heif_error heif_encoder_set_parameter_boolean(heif_encoder*,
                                              const char* name,
                                              int value);
heif_error heif_encoder_get_parameter_boolean(heif_encoder*,
                                              const char* name,
                                              int* out_value);
heif_error heif_encoder_set_parameter_string(heif_encoder*,
                                             const char* name,
                                             const char* value);
heif_error heif_encoder_get_parameter_string(heif_encoder*,
                                             const char* name, char* out,
                                             int out_size);
heif_error heif_encoder_set_parameter(heif_encoder*, const char* name,
                                      const char* value);
heif_error heif_encoder_get_parameter(heif_encoder*, const char* name,
                                      char* out, int out_size);
int heif_encoder_has_default(heif_encoder*, const char* name);
heif_error heif_encoder_parameter_integer_valid_range(
    heif_encoder*, const char* name, int* have_minimum_maximum,
    int* minimum, int* maximum);

heif_error heif_context_encode_image(heif_context*, const heif_image*,
                                     heif_encoder*,
                                     const void* unused_options,
                                     heif_image_handle** out);
heif_error heif_context_encode_thumbnail(heif_context*,
                                         const heif_image*,
                                         const heif_image_handle* master,
                                         heif_encoder*,
                                         const void* unused_options,
                                         int bbox_size,
                                         heif_image_handle** out);
heif_error heif_context_assign_thumbnail(heif_context*,
                                         const heif_image_handle* master,
                                         const heif_image_handle* thumb);

/* options structs: accepted for call compatibility */
typedef struct heif_decoding_options {
  uint8_t version;
  uint8_t ignore_transformations;
  uint8_t convert_hdr_to_8bit;
  uint8_t strict_decoding;
  const char* decoder_id;
} heif_decoding_options;

typedef struct heif_encoding_options {
  uint8_t version;
  uint8_t save_alpha_channel;
  uint8_t macOS_compatibility_workaround;
  uint8_t save_two_colr_boxes;
  uint8_t macOS_compatibility_workaround_no_nclx_profile;
  int image_orientation;
} heif_encoding_options;

heif_decoding_options* heif_decoding_options_alloc(void);
heif_decoding_options* heif_decoding_options_copy(
    const heif_decoding_options*);
void heif_decoding_options_free(heif_decoding_options*);
heif_encoding_options* heif_encoding_options_alloc(void);
heif_encoding_options* heif_encoding_options_copy(
    const heif_encoding_options*);
void heif_encoding_options_free(heif_encoding_options*);

/* ------------------------------------------------------------------ */
/* sequences / tracks (heif_sequences.h)                               */

typedef struct heif_track_options heif_track_options;
typedef struct heif_sequence_encoding_options
    heif_sequence_encoding_options;

int heif_context_has_sequence(const heif_context*);
uint32_t heif_context_get_sequence_timescale(const heif_context*);
uint64_t heif_context_get_sequence_duration(const heif_context*);
int heif_context_number_of_sequence_tracks(const heif_context*);
int heif_context_get_track_ids(const heif_context*, uint32_t* out_ids,
                               int count);
heif_track* heif_context_get_track(const heif_context*,
                                   uint32_t track_id);
void heif_track_release(heif_track*);
uint32_t heif_track_get_id(const heif_track*);
uint32_t heif_track_get_track_handler_type(const heif_track*);
uint32_t heif_track_get_timescale(const heif_track*);
int heif_track_get_number_of_repetitions(const heif_track*);
heif_error heif_track_get_image_resolution(const heif_track*,
                                           uint16_t* out_width,
                                           uint16_t* out_height);
int heif_track_has_alpha_channel(const heif_track*);
uint32_t heif_track_get_sample_entry_type_of_first_cluster(
    const heif_track*);
heif_error heif_track_get_urim_sample_entry_uri_of_first_cluster(
    const heif_track*, const char** out_uri);
heif_error heif_track_decode_next_image(heif_track*, heif_image** out,
                                        enum heif_colorspace,
                                        enum heif_chroma,
                                        const void* unused_options);

void heif_context_set_sequence_timescale(heif_context*,
                                         uint32_t timescale);
void heif_context_set_number_of_sequence_repetitions(heif_context*,
                                                     uint32_t reps);
heif_error heif_context_add_visual_sequence_track(
    heif_context*, uint16_t width, uint16_t height, int handler_4cc,
    const heif_track_options*, const void* unused_seq_options,
    heif_track** out);
heif_error heif_context_add_uri_metadata_sequence_track(
    heif_context*, const char* uri, const heif_track_options*,
    heif_track** out);
heif_error heif_track_encode_sequence_image(heif_track*,
                                            const heif_image*,
                                            heif_encoder*,
                                            const void* unused_options);
void heif_track_encode_end_of_sequence(heif_track*);

heif_track_options* heif_track_options_alloc(void);
void heif_track_options_release(heif_track_options*);
void heif_track_options_set_timescale(heif_track_options*,
                                      uint32_t timescale);
void heif_track_options_set_interleaved_sample_aux_infos(
    heif_track_options*, int flag);
heif_error heif_track_options_enable_sample_tai_timestamps(
    heif_track_options*, const void* tai_clock_info, int flag);
void heif_track_options_enable_sample_gimi_content_ids(
    heif_track_options*, int flag);
void heif_track_options_set_gimi_track_id(heif_track_options*,
                                          const char* content_id);
/* extension: inter coding structure for visual tracks
 * ("intra" | "ipp" | "ldb" | "ibp" | "bpyr") */
heif_error heif_track_options_set_gop_structure(heif_track_options*,
                                                const char* gop);

heif_sequence_encoding_options* heif_sequence_encoding_options_alloc(void);
heif_sequence_encoding_options* heif_sequence_encoding_options_copy(
    const heif_sequence_encoding_options*);
void heif_sequence_encoding_options_release(
    heif_sequence_encoding_options*);

heif_raw_sequence_sample* heif_raw_sequence_sample_alloc(void);
void heif_raw_sequence_sample_release(heif_raw_sequence_sample*);
heif_error heif_track_get_next_raw_sequence_sample(
    heif_track*, heif_raw_sequence_sample** out);
const uint8_t* heif_raw_sequence_sample_get_data(
    const heif_raw_sequence_sample*, size_t* out_size);
size_t heif_raw_sequence_sample_get_data_size(
    const heif_raw_sequence_sample*);
uint32_t heif_raw_sequence_sample_get_duration(
    const heif_raw_sequence_sample*);
heif_error heif_raw_sequence_sample_set_data(heif_raw_sequence_sample*,
                                             const uint8_t* data,
                                             size_t size);
void heif_raw_sequence_sample_set_duration(heif_raw_sequence_sample*,
                                           uint32_t duration);
heif_error heif_track_add_raw_sequence_sample(
    heif_track*, const heif_raw_sequence_sample*);

heif_error heif_track_add_reference_to_track(heif_track*,
                                             uint32_t reference_type,
                                             const heif_track* to_track);
int heif_track_get_number_of_track_reference_types(const heif_track*);
int heif_track_get_track_reference_types(const heif_track*,
                                         uint32_t* out_types, int count);
int heif_track_get_number_of_track_reference_of_type(const heif_track*,
                                                     uint32_t type);
int heif_track_get_references_from_track(const heif_track*,
                                         uint32_t type,
                                         uint32_t* out_ids, int count);

#ifdef __cplusplus
}
#endif

#endif /* LIBHEIF_TPU_SHIM_EXT_H */
