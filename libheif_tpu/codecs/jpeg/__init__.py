"""TPU-native JPEG codec core (ITU-T T.81 baseline/extended sequential).

Replaces the reference's libjpeg plugin pair
(plugins/decoder_libjpeg.cc, plugins/encoder_libjpeg.cc).
"""

from . import decoder  # noqa: F401  (registers JpegDecoder)
from . import encoder  # noqa: F401  (registers JpegEncoder)

from .decoder import decode_jpeg, JpegDecoder  # noqa: F401
from .encoder import encode_jpeg, JpegEncoder  # noqa: F401
