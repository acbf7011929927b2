"""Runtime configuration of the framework.

The reference selects a SIMD backend at compile time (`src/bmsimd.h:24-64`);
here there is exactly one device backend (XLA/Pallas on TPU) and the only
runtime choices are (a) whether hot ops go through hand-written Pallas kernels
or plain XLA programs, and (b) interpret-mode for CPU-hosted tests.
"""

from __future__ import annotations

import dataclasses
import os

import jax


@dataclasses.dataclass
class Config:
    # Use Pallas kernels for the hot block ops (TPU).  On CPU hosts the jnp
    # (pure XLA) path is the default; Pallas falls back to interpret mode.
    use_pallas: bool | None = None       # None = auto (TPU yes, CPU no)
    pallas_interpret: bool | None = None  # None = auto (non-TPU -> interpret)
    # Default new-block strategy (reference set_new_blocks_strat, src/bm.h:1912)
    strategy: int = 0                    # BM_BIT
    # GAP level length table (reference src/bmconst.h:396-431)
    gap_levels: tuple = (128, 256, 512, 1280)

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        if os.environ.get("BITMAGIC_TPU_FORCE_PALLAS"):
            return True
        return jax.default_backend() == "tpu"

    def interpret_mode(self) -> bool:
        if self.pallas_interpret is not None:
            return self.pallas_interpret
        return jax.default_backend() != "tpu"


config = Config()


def simd_version() -> str:
    """Backend report, analog of ``bm::simd_version()`` (src/bmsimd.h:75-92)."""
    backend = jax.default_backend()
    mode = "pallas" if config.pallas_enabled() else "xla"
    return f"{backend}:{mode}"
