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
*/
import "C"

import (
	"errors"
	"fmt"
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
