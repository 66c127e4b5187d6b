"""AV1 codec core — TPU-native replacement for the decode/encode the
reference delegates to dav1d/aom (reference: libheif/plugins/
decoder_dav1d.cc, decoder_aom.cc, encoder_aom.cc).

Layering (SURVEY.md §7):
- host: OBU parse, MSAC entropy decode → flat syntax (tile.py);
- device-portable recon: intra prediction + inverse transforms
  (recon.py; numpy reference, Pallas batching on top).

Default CDF tables are extracted from the system libaom by
tools/extract_av1_cdfs.py and shipped as default_cdfs.npz.
"""

from .decoder import Av1Decoder, register as _register_dec
from .encoder import Av1Encoder, register_enc as _register_enc

_register_dec()
_register_enc()
