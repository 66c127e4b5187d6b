"""libheif_tpu — a TPU-native HEIF/AVIF codec engine.

A from-scratch re-design of the capabilities of libheif (reference:
strukturag/libheif v1.23.1) for TPU hardware:

- The *container plane* (ISOBMFF box parsing/writing, item graph, iloc
  plumbing, security limits, public API) runs on host, mirroring the
  layering of the reference (see SURVEY.md §1).
- The *pixel plane* (ISO/IEC 23001-17 uncompressed codec, color-space
  conversion, grid/overlay composition, HEVC/AV1 codec cores) runs as
  batched jnp/Pallas programs under jit/pjit, sharded over TPU meshes.

Public API entry points live in :mod:`libheif_tpu.api` and mirror the
reference C API surface (``heif_context_read_from_file`` →
``HeifContext.read_from_file`` etc.).
"""

__version__ = "0.1.0"

from .core.error import HeifError, ErrorCode, SubError  # noqa: F401
from .core.limits import SecurityLimits  # noqa: F401
