"""bitmagic_tpu — a TPU-native succinct bit-vector / set-algebra framework.

Brand-new JAX/XLA/Pallas implementation of the capability set of the reference
C++ library (tlk00/BitMagic, see SURVEY.md): block-structured compressed
bit-vectors with full set algebra, rank/select, a multi-vector aggregator,
bit-sliced succinct vectors of ints/floats/strings searchable in compressed
form, entropy-coded serialization, and mesh-sharded multi-chip scaling.
"""

import jax as _jax

# 48-bit addressing end-to-end requires int64 indices (SURVEY.md §7 hard part
# 6; the reference's 32/64 dual build is the cautionary tale).
_jax.config.update("jax_enable_x64", True)

from . import constants  # noqa: E402
from .config import config, simd_version  # noqa: E402
from .core.bitvector import BitVector  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "BitVector",
    "config",
    "constants",
    "simd_version",
    "__version__",
]
