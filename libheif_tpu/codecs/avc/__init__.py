"""AVC (H.264) codec core — TPU-native replacement for the coding the
reference delegates to openh264/x264 (reference: libheif/plugins/
decoder_openh264.cc, encoder_x264.cc).

Layering mirrors the HEVC core (SURVEY.md §7): host-side NAL demux,
SPS/PPS/slice-header parse and CABAC entropy coding; vectorized numpy
reconstruction (intra prediction, integer transforms, deblocking) as
the bit-exact reference path for the batched tile pipeline above.
"""

from .decoder import AvcDecoder, register as _register_dec
from .encoder import AvcEncoder, register as _register_enc

_register_dec()
_register_enc()
