"""Bit-sliced sparse vector + compressed-form search (reference
samples/svsample02/06)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
if _os.environ.get("BMTPU_PLATFORM"):        # e.g. BMTPU_PLATFORM=cpu
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["BMTPU_PLATFORM"])
import numpy as np
import bitmagic_tpu as bm
from bitmagic_tpu.sv import SparseVector, scanner

rng = np.random.default_rng(2)
vals = rng.integers(0, 10_000, 5_000_000).astype(np.uint32)
sv = SparseVector.from_array(vals)
sv.optimize()
print("stat:", sv.calc_stat())

eq = scanner.find_eq(sv, 777)            # search WITHOUT decompressing
print("find_eq(777):", eq.count())
rng_hits = scanner.find_range(sv, 100, 120)
print("find_range[100,120]:", rng_hits.count())
counts = scanner.pipeline_find_eq(sv, range(10), counts_only=True)
print("pipeline counts:", counts)
