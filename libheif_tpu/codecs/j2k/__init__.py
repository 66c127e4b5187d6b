"""JPEG 2000 (ISO/IEC 15444-1) codec core.

The reference (strukturag/libheif) obtains J2K decode/encode from
OpenJPEG/OpenJPH plugins (plugins/decoder_openjpeg.cc,
encoder_openjpeg.cc); here the codestream engine is native:
tier-2 packet parsing, EBCOT tier-1 MQ block coding on host, and the
wavelet/color math (5/3 + 9/7 lifting, RCT/ICT) as vectorized array
ops suitable for the TPU pixel plane.
"""

from .decoder import J2KDecoder, decode_codestream
from .encoder import J2KEncoder, encode_codestream
from .codec import J2KDecoder_Registry, J2KEncoder_Registry, _register

_register()
