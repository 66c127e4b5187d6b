"""VVC (H.266) codec core — TPU-native replacement for the decode/
encode the reference delegates to vvdec/vvenc/uvg266 plugins
(reference: libheif/plugins/decoder_vvdec.cc, encoder_vvenc.cc,
encoder_uvg266.cc; bridge libheif/codecs/vvc_dec.{h,cc}).

Intra-only toolset over QT partitioning; see tables.py for the exact
scope and the oracle-less conformance story (no VVC reference decoder
exists in this build environment, so streams are validated by
encoder↔decoder bit-exact round-trip).
"""

from .decoder import VvcDecoder, register as _register_dec
from .encoder import VvcEncoder, register as _register_enc

_register_dec()
_register_enc()
