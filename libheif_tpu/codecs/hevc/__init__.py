"""HEVC (H.265) codec core — TPU-native replacement for the decode the
reference delegates to libde265 (reference: libheif/plugins/
decoder_libde265.cc).

Layering (SURVEY.md §7 hard part (a)):
- host: NAL demux, SPS/PPS/slice header parse, CABAC entropy decode →
  flat syntax arrays (modes, coefficients, QPs);
- device (numpy/jnp): dequant, inverse transforms (batched by size
  class), intra prediction + reconstruction, deblocking, SAO.
"""

from .decoder import HevcDecoder, register as _register_dec
from .encoder import HevcEncoder, register as _register_enc

_register_dec()
_register_enc()
