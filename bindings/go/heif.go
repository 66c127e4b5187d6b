// Package heif provides Go bindings for libheif_tpu through the C ABI
// shim (bindings/c/heif_shim.{h,c}), mirroring the API shape of the
// upstream libheif Go binding (reference: go/heif/heif.go — context /
// handle / image wrappers with finalizer-managed lifetimes).
//
// Build the shim first:
//
//	gcc -shared -fPIC bindings/c/heif_shim.c \
//	    $(python3-config --includes) -lpython3.12 -o libheif_shim.so
//
// then point cgo at it:
//
//	CGO_CFLAGS="-I/path/to/bindings/c" \
//	CGO_LDFLAGS="-L/path/to -lheif_shim -lpython3.12" go build
//
// Call heif.SetModulePath("/path/to/libheif_tpu_checkout") before the
// first decode if the package is not on the embedded interpreter's
// default sys.path.
package heif

/*
#cgo LDFLAGS: -lheif_shim
#include <stdlib.h>
#include "heif_shim.h"
#include "heif_shim_ext.h"
*/
import "C"

import (
	"errors"
	"fmt"
	"image"
	"image/color"
	"io"
	"runtime"
	"unsafe"
)

// Colorspace mirrors heif_colorspace.
type Colorspace C.enum_heif_colorspace

const (
	ColorspaceUndefined  = Colorspace(99)
	ColorspaceYCbCr      = Colorspace(0)
	ColorspaceRGB        = Colorspace(1)
	ColorspaceMonochrome = Colorspace(2)
)

// Chroma mirrors heif_chroma.
type Chroma C.enum_heif_chroma

const (
	ChromaUndefined       = Chroma(99)
	ChromaMonochrome      = Chroma(0)
	Chroma420             = Chroma(1)
	Chroma422             = Chroma(2)
	Chroma444             = Chroma(3)
	ChromaInterleavedRGB  = Chroma(10)
	ChromaInterleavedRGBA = Chroma(11)
)

// Channel mirrors heif_channel.
type Channel C.enum_heif_channel

const (
	ChannelY           = Channel(0)
	ChannelCb          = Channel(1)
	ChannelCr          = Channel(2)
	ChannelR           = Channel(3)
	ChannelG           = Channel(4)
	ChannelB           = Channel(5)
	ChannelAlpha       = Channel(6)
	ChannelInterleaved = Channel(10)
)

// SetModulePath tells the embedded interpreter where the libheif_tpu
// package lives. Must be called before the first Context use.
func SetModulePath(path string) {
	cs := C.CString(path)
	defer C.free(unsafe.Pointer(cs))
	C.heif_shim_set_module_path(cs)
}

// Version returns the underlying engine version string.
func Version() string {
	return C.GoString(C.heif_get_version())
}

func convertError(e C.heif_error) error {
	if e.code == 0 {
		return nil
	}
	return fmt.Errorf("heif: code=%d subcode=%d: %s", int(e.code),
		int(e.subcode), C.GoString(e.message))
}

// Context wraps heif_context.
type Context struct {
	ctx *C.heif_context
}

// NewContext allocates an empty context.
func NewContext() (*Context, error) {
	ctx := C.heif_context_alloc()
	if ctx == nil {
		return nil, errors.New("heif: context allocation failed")
	}
	c := &Context{ctx: ctx}
	runtime.SetFinalizer(c, func(c *Context) {
		C.heif_context_free(c.ctx)
	})
	return c, nil
}

// ReadFromFile loads a HEIF/AVIF file into the context.
func (c *Context) ReadFromFile(filename string) error {
	cs := C.CString(filename)
	defer C.free(unsafe.Pointer(cs))
	return convertError(C.heif_context_read_from_file(c.ctx, cs, nil))
}

// ReadFromMemory parses an in-memory HEIF/AVIF byte stream.
func (c *Context) ReadFromMemory(data []byte) error {
	if len(data) == 0 {
		return errors.New("heif: empty buffer")
	}
	return convertError(C.heif_context_read_from_memory_without_copy(
		c.ctx, unsafe.Pointer(&data[0]), C.size_t(len(data)), nil))
}

// GetNumberOfTopLevelImages reports the top-level image count.
func (c *Context) GetNumberOfTopLevelImages() int {
	return int(C.heif_context_get_number_of_top_level_images(c.ctx))
}

// GetPrimaryImageHandle returns the primary image's handle.
func (c *Context) GetPrimaryImageHandle() (*ImageHandle, error) {
	var h *C.heif_image_handle
	err := convertError(
		C.heif_context_get_primary_image_handle(c.ctx, &h))
	if err != nil {
		return nil, err
	}
	handle := &ImageHandle{handle: h}
	runtime.SetFinalizer(handle, func(h *ImageHandle) {
		C.heif_image_handle_release(h.handle)
	})
	return handle, nil
}

// WriteToFile serializes the context to a HEIF file.
func (c *Context) WriteToFile(filename string) error {
	cs := C.CString(filename)
	defer C.free(unsafe.Pointer(cs))
	return convertError(C.heif_context_write_to_file(c.ctx, cs))
}

// EncodeImage appends img to the context with the named codec
// ("hevc", "av1", "avc", "jpeg", "j2k", "unc") at quality 0-100.
func (c *Context) EncodeImage(img *Image, codec string,
	quality int) error {
	cs := C.CString(codec)
	defer C.free(unsafe.Pointer(cs))
	return convertError(C.heif_context_encode_image2(
		c.ctx, img.image, cs, C.int(quality), nil))
}

// ImageHandle wraps heif_image_handle.
type ImageHandle struct {
	handle *C.heif_image_handle
}

// GetWidth returns the image width in pixels.
func (h *ImageHandle) GetWidth() int {
	return int(C.heif_image_handle_get_width(h.handle))
}

// GetHeight returns the image height in pixels.
func (h *ImageHandle) GetHeight() int {
	return int(C.heif_image_handle_get_height(h.handle))
}

// IsPrimaryImage reports whether this is the file's primary image.
func (h *ImageHandle) IsPrimaryImage() bool {
	return C.heif_image_handle_is_primary_image(h.handle) != 0
}

// HasAlphaChannel reports whether the image carries alpha.
func (h *ImageHandle) HasAlphaChannel() bool {
	return C.heif_image_handle_has_alpha_channel(h.handle) != 0
}

// DecodeImage decodes the handle into pixel planes, optionally
// converting to the requested colorspace/chroma.
func (h *ImageHandle) DecodeImage(colorspace Colorspace,
	chroma Chroma) (*Image, error) {
	var img *C.heif_image
	err := convertError(C.heif_decode_image(
		h.handle, &img, C.enum_heif_colorspace(colorspace),
		C.enum_heif_chroma(chroma), nil))
	if err != nil {
		return nil, err
	}
	im := &Image{image: img}
	runtime.SetFinalizer(im, func(im *Image) {
		C.heif_image_release(im.image)
	})
	return im, nil
}

// Image wraps heif_image.
type Image struct {
	image *C.heif_image
}

// GetColorspace returns the image colorspace.
func (im *Image) GetColorspace() Colorspace {
	return Colorspace(C.heif_image_get_colorspace(im.image))
}

// GetChromaFormat returns the image chroma format.
func (im *Image) GetChromaFormat() Chroma {
	return Chroma(C.heif_image_get_chroma_format(im.image))
}

// HasChannel reports whether the channel exists.
func (im *Image) HasChannel(ch Channel) bool {
	return C.heif_image_has_channel(im.image,
		C.enum_heif_channel(ch)) != 0
}

// GetPlane returns a copy of one channel's samples plus the row
// stride in bytes.
func (im *Image) GetPlane(ch Channel) ([]byte, int, error) {
	var stride C.int
	p := C.heif_image_get_plane_readonly(im.image,
		C.enum_heif_channel(ch), &stride)
	if p == nil {
		return nil, 0, errors.New("heif: plane not available")
	}
	h := int(C.heif_image_get_height(im.image,
		C.enum_heif_channel(ch)))
	n := h * int(stride)
	return C.GoBytes(unsafe.Pointer(p), C.int(n)), int(stride), nil
}

// ------------------------------------------------------------------
// compression formats & encoders (ref: go/heif/heif.go Compression /
// Encoder over heif_encoder + descriptors)

// Compression mirrors heif_compression_format.
type Compression C.enum_heif_compression_format

const (
	CompressionUndefined    = Compression(0)
	CompressionHEVC         = Compression(1)
	CompressionAVC          = Compression(2)
	CompressionJPEG         = Compression(3)
	CompressionAV1          = Compression(4)
	CompressionVVC          = Compression(5)
	CompressionJPEG2000     = Compression(7)
	CompressionUncompressed = Compression(8)
	CompressionMask         = Compression(9)
	CompressionHTJ2K        = Compression(10)
)

// LosslessMode mirrors the reference binding's enum.
type LosslessMode int

const (
	LosslessModeDisabled LosslessMode = iota
	LosslessModeEnabled
)

// Encoder wraps heif_encoder.
type Encoder struct {
	encoder *C.heif_encoder
	id      string
	name    string
}

// ID returns the encoder's registry id.
func (e *Encoder) ID() string { return e.id }

// Name returns the encoder's human-readable name.
func (e *Encoder) Name() string { return e.name }

// SetQuality sets the lossy quality (0-100).
func (e *Encoder) SetQuality(q int) error {
	return convertError(
		C.heif_encoder_set_lossy_quality(e.encoder, C.int(q)))
}

// SetLossless toggles lossless coding.
func (e *Encoder) SetLossless(l LosslessMode) error {
	v := C.int(0)
	if l == LosslessModeEnabled {
		v = 1
	}
	return convertError(C.heif_encoder_set_lossless(e.encoder, v))
}

// SetLoggingLevel forwards the encoder logging level.
func (e *Encoder) SetLoggingLevel(l int) error {
	return convertError(
		C.heif_encoder_set_logging_level(e.encoder, C.int(l)))
}

// SetParameter sets a named encoder parameter from its string form.
func (e *Encoder) SetParameter(name, value string) error {
	cn := C.CString(name)
	defer C.free(unsafe.Pointer(cn))
	cv := C.CString(value)
	defer C.free(unsafe.Pointer(cv))
	return convertError(C.heif_encoder_set_parameter(e.encoder, cn, cv))
}

// NewEncoder returns the highest-priority encoder for a format.
func (c *Context) NewEncoder(compression Compression) (*Encoder, error) {
	var enc *C.heif_encoder
	err := convertError(C.heif_context_get_encoder_for_format(
		c.ctx, C.enum_heif_compression_format(compression), &enc))
	if err != nil {
		return nil, err
	}
	e := &Encoder{
		encoder: enc,
		name:    C.GoString(C.heif_encoder_get_name(enc)),
	}
	e.id = e.name
	runtime.SetFinalizer(e, func(e *Encoder) {
		C.heif_encoder_release(e.encoder)
	})
	return e, nil
}

// EncodeImageWithEncoder appends img through a configured encoder and
// returns the new item's handle.
func (c *Context) EncodeImageWithEncoder(img *Image,
	enc *Encoder) (*ImageHandle, error) {
	var h *C.heif_image_handle
	err := convertError(C.heif_context_encode_image(
		c.ctx, img.image, enc.encoder, nil, &h))
	if err != nil {
		return nil, err
	}
	return wrapHandle(h), nil
}

// ------------------------------------------------------------------
// context extras (ref: go/heif/heif.go ID helpers)

func wrapHandle(h *C.heif_image_handle) *ImageHandle {
	handle := &ImageHandle{handle: h}
	runtime.SetFinalizer(handle, func(h *ImageHandle) {
		C.heif_image_handle_release(h.handle)
	})
	return handle
}

// GetPrimaryImageID returns the primary item id.
func (c *Context) GetPrimaryImageID() (int, error) {
	var id C.heif_item_id
	err := convertError(C.heif_context_get_primary_image_ID(c.ctx, &id))
	if err != nil {
		return 0, err
	}
	return int(id), nil
}

// IsTopLevelImageID reports whether the id is a top-level image.
func (c *Context) IsTopLevelImageID(id int) bool {
	return C.heif_context_is_top_level_image_ID(c.ctx,
		C.heif_item_id(id)) != 0
}

// GetListOfTopLevelImageIDs lists every top-level image id.
func (c *Context) GetListOfTopLevelImageIDs() []int {
	n := c.GetNumberOfTopLevelImages()
	if n <= 0 {
		return nil
	}
	ids := make([]C.heif_item_id, n)
	got := int(C.heif_context_get_list_of_top_level_image_IDs(
		c.ctx, &ids[0], C.int(n)))
	out := make([]int, 0, got)
	for i := 0; i < got; i++ {
		out = append(out, int(ids[i]))
	}
	return out
}

// GetImageHandle returns the handle for one top-level image id.
func (c *Context) GetImageHandle(id int) (*ImageHandle, error) {
	var h *C.heif_image_handle
	err := convertError(C.heif_context_get_image_handle(
		c.ctx, C.heif_item_id(id), &h))
	if err != nil {
		return nil, err
	}
	return wrapHandle(h), nil
}

// ------------------------------------------------------------------
// handle extras: thumbnails / depth / aux / metadata
// (ref: go/heif/heif.go GetNumberOfThumbnails.. GetDepthImageHandle)

// GetNumberOfThumbnails reports the thumbnail count.
func (h *ImageHandle) GetNumberOfThumbnails() int {
	return int(C.heif_image_handle_get_number_of_thumbnails(h.handle))
}

// GetListOfThumbnailIDs lists thumbnail item ids.
func (h *ImageHandle) GetListOfThumbnailIDs() []int {
	n := h.GetNumberOfThumbnails()
	if n <= 0 {
		return nil
	}
	ids := make([]C.heif_item_id, n)
	got := int(C.heif_image_handle_get_list_of_thumbnail_IDs(
		h.handle, &ids[0], C.int(n)))
	out := make([]int, 0, got)
	for i := 0; i < got; i++ {
		out = append(out, int(ids[i]))
	}
	return out
}

// GetThumbnail returns one thumbnail's handle.
func (h *ImageHandle) GetThumbnail(id int) (*ImageHandle, error) {
	var th *C.heif_image_handle
	err := convertError(C.heif_image_handle_get_thumbnail(
		h.handle, C.heif_item_id(id), &th))
	if err != nil {
		return nil, err
	}
	return wrapHandle(th), nil
}

// HasDepthImage reports whether a depth aux image exists.
func (h *ImageHandle) HasDepthImage() bool {
	return C.heif_image_handle_has_depth_image(h.handle) != 0
}

// GetNumberOfDepthImages reports the depth image count.
func (h *ImageHandle) GetNumberOfDepthImages() int {
	return int(C.heif_image_handle_get_number_of_depth_images(h.handle))
}

// GetListOfDepthImageIDs lists depth image ids.
func (h *ImageHandle) GetListOfDepthImageIDs() []int {
	n := h.GetNumberOfDepthImages()
	if n <= 0 {
		return nil
	}
	ids := make([]C.heif_item_id, n)
	got := int(C.heif_image_handle_get_list_of_depth_image_IDs(
		h.handle, &ids[0], C.int(n)))
	out := make([]int, 0, got)
	for i := 0; i < got; i++ {
		out = append(out, int(ids[i]))
	}
	return out
}

// GetDepthImageHandle returns one depth image's handle.
func (h *ImageHandle) GetDepthImageHandle(id int) (*ImageHandle, error) {
	var dh *C.heif_image_handle
	err := convertError(C.heif_image_handle_get_depth_image_handle(
		h.handle, C.heif_item_id(id), &dh))
	if err != nil {
		return nil, err
	}
	return wrapHandle(dh), nil
}

// GetMetadataBlockIDs lists metadata item ids, optionally filtered by
// type ("Exif", "mime", ...).
func (h *ImageHandle) GetMetadataBlockIDs(typeFilter string) []int {
	var cf *C.char
	if typeFilter != "" {
		cf = C.CString(typeFilter)
		defer C.free(unsafe.Pointer(cf))
	}
	ids := make([]C.heif_item_id, 64)
	got := int(C.heif_image_handle_get_list_of_metadata_block_IDs(
		h.handle, cf, &ids[0], C.int(len(ids))))
	out := make([]int, 0, got)
	for i := 0; i < got; i++ {
		out = append(out, int(ids[i]))
	}
	return out
}

// GetMetadata returns one metadata block's payload.
func (h *ImageHandle) GetMetadata(id int) ([]byte, error) {
	size := C.heif_image_handle_get_metadata_size(h.handle,
		C.heif_item_id(id))
	if size == 0 {
		return nil, nil
	}
	buf := make([]byte, int(size))
	err := convertError(C.heif_image_handle_get_metadata(
		h.handle, C.heif_item_id(id), unsafe.Pointer(&buf[0])))
	if err != nil {
		return nil, err
	}
	return buf, nil
}

// ------------------------------------------------------------------
// image creation & plane writing (ref: go/heif/heif.go NewImage /
// NewPlane / ImageAccess.setData)

// NewImage creates an empty image for encoding.
func NewImage(width, height int, colorspace Colorspace,
	chroma Chroma) (*Image, error) {
	var img *C.heif_image
	err := convertError(C.heif_image_create(
		C.int(width), C.int(height),
		C.enum_heif_colorspace(colorspace),
		C.enum_heif_chroma(chroma), &img))
	if err != nil {
		return nil, err
	}
	im := &Image{image: img}
	runtime.SetFinalizer(im, func(im *Image) {
		C.heif_image_release(im.image)
	})
	return im, nil
}

// GetWidth returns one channel's width.
func (im *Image) GetWidth(ch Channel) int {
	return int(C.heif_image_get_width(im.image,
		C.enum_heif_channel(ch)))
}

// GetHeight returns one channel's height.
func (im *Image) GetHeight(ch Channel) int {
	return int(C.heif_image_get_height(im.image,
		C.enum_heif_channel(ch)))
}

// GetBitsPerPixel returns the storage bits per pixel of a channel.
func (im *Image) GetBitsPerPixel(ch Channel) int {
	return int(C.heif_image_get_bits_per_pixel(im.image,
		C.enum_heif_channel(ch)))
}

// GetBitsPerPixelRange returns the value range bits of a channel.
func (im *Image) GetBitsPerPixelRange(ch Channel) int {
	return int(C.heif_image_get_bits_per_pixel_range(im.image,
		C.enum_heif_channel(ch)))
}

// ScaleImage resamples to a new size.
func (im *Image) ScaleImage(width, height int) (*Image, error) {
	var out *C.heif_image
	err := convertError(C.heif_image_scale_image(
		im.image, &out, C.int(width), C.int(height), nil))
	if err != nil {
		return nil, err
	}
	scaled := &Image{image: out}
	runtime.SetFinalizer(scaled, func(im *Image) {
		C.heif_image_release(im.image)
	})
	return scaled, nil
}

// ImageAccess drives plane writing for encode inputs.
type ImageAccess struct {
	Plane   []byte // Go-side buffer, committed by setData
	Stride  int
	channel Channel
	image   *Image
	height  int
}

// NewPlane allocates a channel and returns its write accessor.
func (im *Image) NewPlane(ch Channel, width, height,
	depth int) (*ImageAccess, error) {
	err := convertError(C.heif_image_add_plane(
		im.image, C.enum_heif_channel(ch), C.int(width),
		C.int(height), C.int(depth)))
	if err != nil {
		return nil, err
	}
	bytesPP := 1
	if depth > 8 {
		bytesPP = 2
	}
	if ch == ChannelInterleaved {
		if im.GetChromaFormat() == ChromaInterleavedRGBA {
			bytesPP *= 4
		} else {
			bytesPP *= 3
		}
	}
	stride := width * bytesPP
	return &ImageAccess{
		Plane:   make([]byte, stride*height),
		Stride:  stride,
		channel: ch,
		image:   im,
		height:  height,
	}, nil
}

// setData copies rows into the plane (reference ImageAccess contract).
func (i *ImageAccess) setData(data []byte, stride int) error {
	for y := 0; y < i.height; y++ {
		copy(i.Plane[y*i.Stride:y*i.Stride+i.Stride],
			data[y*stride:y*stride+i.Stride])
	}
	return i.Commit()
}

// SetData copies rows into the plane and commits it.
func (i *ImageAccess) SetData(data []byte, stride int) error {
	return i.setData(data, stride)
}

// Commit pushes the Go-side buffer into the underlying image plane.
func (i *ImageAccess) Commit() error {
	return convertError(C.heif_image_set_plane_data(
		i.image.image, C.enum_heif_channel(i.channel),
		(*C.uint8_t)(unsafe.Pointer(&i.Plane[0])), C.int(i.Stride)))
}

// ------------------------------------------------------------------
// Go standard-library image interop (ref: go/heif/heif.go GetImage /
// imageFromRGBA / imageFromGray / imageFromYCbCr / EncodeFromImage /
// image.RegisterFormat wiring)

// GetImage converts a decoded Image to a Go image.Image.  The image
// must have been decoded as interleaved RGB/RGBA, monochrome, or
// YCbCr 4:2:0.
func (im *Image) GetImage() (image.Image, error) {
	cs := im.GetColorspace()
	switch cs {
	case ColorspaceRGB:
		w := im.GetWidth(ChannelInterleaved)
		h := im.GetHeight(ChannelInterleaved)
		data, stride, err := im.GetPlane(ChannelInterleaved)
		if err != nil {
			return nil, err
		}
		rgba := image.NewRGBA(image.Rect(0, 0, w, h))
		if im.GetChromaFormat() == ChromaInterleavedRGBA {
			for y := 0; y < h; y++ {
				copy(rgba.Pix[y*rgba.Stride:y*rgba.Stride+4*w],
					data[y*stride:y*stride+4*w])
			}
		} else {
			for y := 0; y < h; y++ {
				src := data[y*stride:]
				dst := rgba.Pix[y*rgba.Stride:]
				for x := 0; x < w; x++ {
					dst[4*x+0] = src[3*x+0]
					dst[4*x+1] = src[3*x+1]
					dst[4*x+2] = src[3*x+2]
					dst[4*x+3] = 255
				}
			}
		}
		return rgba, nil
	case ColorspaceMonochrome:
		w := im.GetWidth(ChannelY)
		h := im.GetHeight(ChannelY)
		data, stride, err := im.GetPlane(ChannelY)
		if err != nil {
			return nil, err
		}
		gray := image.NewGray(image.Rect(0, 0, w, h))
		for y := 0; y < h; y++ {
			copy(gray.Pix[y*gray.Stride:y*gray.Stride+w],
				data[y*stride:y*stride+w])
		}
		return gray, nil
	case ColorspaceYCbCr:
		w := im.GetWidth(ChannelY)
		h := im.GetHeight(ChannelY)
		yd, ys, err := im.GetPlane(ChannelY)
		if err != nil {
			return nil, err
		}
		cbd, cbs, err := im.GetPlane(ChannelCb)
		if err != nil {
			return nil, err
		}
		crd, crs, err := im.GetPlane(ChannelCr)
		if err != nil {
			return nil, err
		}
		ratio := image.YCbCrSubsampleRatio420
		switch im.GetChromaFormat() {
		case Chroma422:
			ratio = image.YCbCrSubsampleRatio422
		case Chroma444:
			ratio = image.YCbCrSubsampleRatio444
		}
		ycc := image.NewYCbCr(image.Rect(0, 0, w, h), ratio)
		for y := 0; y < h; y++ {
			copy(ycc.Y[y*ycc.YStride:y*ycc.YStride+w],
				yd[y*ys:y*ys+w])
		}
		ch := im.GetHeight(ChannelCb)
		cw := im.GetWidth(ChannelCb)
		for y := 0; y < ch; y++ {
			copy(ycc.Cb[y*ycc.CStride:y*ycc.CStride+cw],
				cbd[y*cbs:y*cbs+cw])
			copy(ycc.Cr[y*ycc.CStride:y*ycc.CStride+cw],
				crd[y*crs:y*crs+cw])
		}
		return ycc, nil
	}
	return nil, fmt.Errorf("heif: unsupported colorspace %d", int(cs))
}

func imageFromRGBA(i *image.RGBA) (*Image, error) {
	w := i.Bounds().Dx()
	h := i.Bounds().Dy()
	out, err := NewImage(w, h, ColorspaceRGB, ChromaInterleavedRGBA)
	if err != nil {
		return nil, err
	}
	acc, err := out.NewPlane(ChannelInterleaved, w, h, 8)
	if err != nil {
		return nil, err
	}
	if err := acc.SetData(i.Pix, i.Stride); err != nil {
		return nil, err
	}
	return out, nil
}

func imageFromGray(i *image.Gray) (*Image, error) {
	w := i.Bounds().Dx()
	h := i.Bounds().Dy()
	out, err := NewImage(w, h, ColorspaceMonochrome, ChromaMonochrome)
	if err != nil {
		return nil, err
	}
	acc, err := out.NewPlane(ChannelY, w, h, 8)
	if err != nil {
		return nil, err
	}
	if err := acc.SetData(i.Pix, i.Stride); err != nil {
		return nil, err
	}
	return out, nil
}

func imageFromYCbCr(i *image.YCbCr) (*Image, error) {
	w := i.Bounds().Dx()
	h := i.Bounds().Dy()
	chroma := Chroma420
	switch i.SubsampleRatio {
	case image.YCbCrSubsampleRatio422:
		chroma = Chroma422
	case image.YCbCrSubsampleRatio444:
		chroma = Chroma444
	}
	out, err := NewImage(w, h, ColorspaceYCbCr, chroma)
	if err != nil {
		return nil, err
	}
	acc, err := out.NewPlane(ChannelY, w, h, 8)
	if err != nil {
		return nil, err
	}
	if err := acc.SetData(i.Y, i.YStride); err != nil {
		return nil, err
	}
	cw := w
	ch := h
	if chroma == Chroma420 {
		cw = (w + 1) / 2
		ch = (h + 1) / 2
	} else if chroma == Chroma422 {
		cw = (w + 1) / 2
	}
	accCb, err := out.NewPlane(ChannelCb, cw, ch, 8)
	if err != nil {
		return nil, err
	}
	if err := accCb.SetData(i.Cb, i.CStride); err != nil {
		return nil, err
	}
	accCr, err := out.NewPlane(ChannelCr, cw, ch, 8)
	if err != nil {
		return nil, err
	}
	if err := accCr.SetData(i.Cr, i.CStride); err != nil {
		return nil, err
	}
	return out, nil
}

// FromImage converts a Go image.Image into a heif Image for encoding.
func FromImage(img image.Image) (*Image, error) {
	switch i := img.(type) {
	case *image.RGBA:
		return imageFromRGBA(i)
	case *image.Gray:
		return imageFromGray(i)
	case *image.YCbCr:
		return imageFromYCbCr(i)
	}
	// generic fallback through RGBA
	b := img.Bounds()
	rgba := image.NewRGBA(b)
	for y := b.Min.Y; y < b.Max.Y; y++ {
		for x := b.Min.X; x < b.Max.X; x++ {
			rgba.Set(x-b.Min.X, y-b.Min.Y,
				color.RGBAModel.Convert(img.At(x, y)))
		}
	}
	return imageFromRGBA(rgba)
}

// EncodeFromImage encodes a Go image into a fresh context
// (ref: go/heif/heif.go EncodeFromImage).
func EncodeFromImage(img image.Image, compression Compression,
	quality int, lossless LosslessMode) (*Context, error) {
	ctx, err := NewContext()
	if err != nil {
		return nil, err
	}
	him, err := FromImage(img)
	if err != nil {
		return nil, err
	}
	enc, err := ctx.NewEncoder(compression)
	if err != nil {
		return nil, err
	}
	if err := enc.SetQuality(quality); err != nil {
		return nil, err
	}
	if err := enc.SetLossless(lossless); err != nil {
		return nil, err
	}
	if _, err := ctx.EncodeImageWithEncoder(him, enc); err != nil {
		return nil, err
	}
	return ctx, nil
}

// ------------------------------------------------------------------
// image.RegisterFormat wiring (ref: go/heif/heif.go init/decodeImage)

func decodePrimaryImageFromReader(r io.Reader) (*ImageHandle, error) {
	data, err := io.ReadAll(r)
	if err != nil {
		return nil, err
	}
	ctx, err := NewContext()
	if err != nil {
		return nil, err
	}
	if err := ctx.ReadFromMemory(data); err != nil {
		return nil, err
	}
	return ctx.GetPrimaryImageHandle()
}

func decodeImage(r io.Reader) (image.Image, error) {
	handle, err := decodePrimaryImageFromReader(r)
	if err != nil {
		return nil, err
	}
	img, err := handle.DecodeImage(ColorspaceRGB, ChromaInterleavedRGB)
	if err != nil {
		return nil, err
	}
	return img.GetImage()
}

func decodeConfig(r io.Reader) (image.Config, error) {
	handle, err := decodePrimaryImageFromReader(r)
	if err != nil {
		return image.Config{}, err
	}
	return image.Config{
		ColorModel: color.YCbCrModel,
		Width:      handle.GetWidth(),
		Height:     handle.GetHeight(),
	}, nil
}

func init() {
	// register with the stdlib image decoder for the common brands
	image.RegisterFormat("heif", "????ftypheic", decodeImage,
		decodeConfig)
	image.RegisterFormat("heif", "????ftypheim", decodeImage,
		decodeConfig)
	image.RegisterFormat("heif", "????ftypheis", decodeImage,
		decodeConfig)
	image.RegisterFormat("heif", "????ftypheix", decodeImage,
		decodeConfig)
	image.RegisterFormat("heif", "????ftypmif1", decodeImage,
		decodeConfig)
	image.RegisterFormat("heif", "????ftypmif2", decodeImage,
		decodeConfig)
	image.RegisterFormat("avif", "????ftypavif", decodeImage,
		decodeConfig)
}
