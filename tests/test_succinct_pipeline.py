"""Succinct-aware pipelines (round-2 VERDICT item 6).

GAP-resident operands must NOT be densified wholesale by the pipeline
paths: the scanner pipeline and the aggregator's fused counts/results
narrow to survivor blocks in the symbolic domain and expand only those,
host-side.  The full device arena is never built for succinct operands,
and results match the per-request paths bit-for-bit.
"""
import numpy as np
import pytest

import bitmagic_tpu as bm
from bitmagic_tpu import constants as C
from bitmagic_tpu.agg import arena as arena_mod
from bitmagic_tpu.agg.aggregator import AggOptions, Aggregator
from bitmagic_tpu.sv.sparse_vector import SparseVector
from bitmagic_tpu.sv.scanner import scanner

N = 3_000_000


@pytest.fixture(scope="module")
def sparse_sv():
    rng = np.random.default_rng(5)
    vals = np.zeros(N, np.uint32)
    idx = np.sort(rng.choice(N, 8000, replace=False))
    vals[idx] = rng.integers(1, 4096, idx.size)
    # cluster one value into a single block so narrowing has a skip target
    vals[70_000:70_016] = 77777
    sv = SparseVector.from_array(vals)
    sv.optimize()                    # planes go GAP-resident
    assert any(p is not None and p._gaps is not None and p._gaps.n_blocks
               for p in sv.planes)
    return sv, vals


def test_scanner_pipeline_succinct_no_arena(sparse_sv, monkeypatch):
    sv, vals = sparse_sv

    def no_dense(self):
        raise AssertionError("succinct pipeline built the full arena")
    monkeypatch.setattr(arena_mod.OperandArena, "pool",
                        property(no_dense))
    prep = scanner.prepare_pipeline(sv)
    assert prep.succinct and prep.ok
    qs = [int(vals[70_000]), 5, 7, 99999]
    got = prep.counts(qs)
    want = [int((vals == q).sum()) for q in qs]
    assert got == want
    surv, total = prep.last_narrowing
    assert 0 < surv <= total


def test_scanner_pipeline_narrows(sparse_sv):
    sv, vals = sparse_sv
    prep = scanner.prepare_pipeline(sv)
    # 77777 lives in exactly one block: its AND group is present in only
    # one block, so a single-query batch must narrow hard
    got = prep.counts([77777])
    assert got == [16]
    surv, total = prep.last_narrowing
    assert surv < total and surv <= 4


def test_aggregator_counts_succinct(monkeypatch):
    rng = np.random.default_rng(9)
    vs = []
    for _ in range(4):
        ids = np.unique(rng.integers(0, N, 4000))
        v = bm.BitVector.from_indices(ids, N, strategy=C.BM_GAP)
        assert v._gaps is not None
        vs.append(v)
    agg = Aggregator()
    reqs = [((vs[0], vs[1]), (vs[2],)), ((vs[1], vs[3]), ()),
            ((vs[0],), (vs[1], vs[3]))]
    want = [agg.combine_and_sub(a, s).count() for a, s in reqs]

    def no_dense(self):
        raise AssertionError("succinct pipeline built the full arena")
    monkeypatch.setattr(arena_mod.OperandArena, "pool",
                        property(no_dense))
    out = agg.pipeline(reqs, AggOptions(compute_counts=True,
                                        make_results=False))
    assert [o["count"] for o in out] == want


def test_aggregator_results_succinct():
    rng = np.random.default_rng(13)
    vs = []
    for _ in range(3):
        ids = np.unique(rng.integers(0, N, 3000))
        vs.append(bm.BitVector.from_indices(ids, N, strategy=C.BM_GAP))
    agg = Aggregator()
    reqs = [((vs[0], vs[1]), ()), ((vs[1],), (vs[2],)),
            ((vs[0], vs[2]), (vs[1],))]
    want = [agg.combine_and_sub(a, s) for a, s in reqs]
    out = agg.pipeline(reqs, AggOptions(compute_counts=True,
                                        make_results=True))
    for o, w in zip(out, want):
        assert o["bv"].equal(w)
        assert o["count"] == w.count()
