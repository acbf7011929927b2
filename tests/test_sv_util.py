"""SV utility resolvers (src/bmsparsevec_util.h).

bvps_addr_resolver coverage lives in test_containers.py; this file covers
the sparse-vector-backed sv_addr_resolver added in round 2.
"""
def test_sv_addr_resolver():
    """sv_addr_resolver parity (src/bmsparsevec_util.h:169): addresses are
    assigned in arrival order and stay stable under later smaller-id sets
    (unlike the rank-based bvps resolver)."""
    from bitmagic_tpu.sv import SVAddressResolver
    r = SVAddressResolver()
    r.set(1000).set(10).set(500_000).set(10)      # re-set is a no-op
    assert r.count() == 3
    assert r.resolve(1000) == 1                   # arrival order, 1-based
    assert r.resolve(10) == 2
    assert r.resolve(500_000) == 3
    assert r.resolve(999) == 0
    # later smaller id does NOT shift earlier addresses
    r.set(5)
    assert r.resolve(5) == 4
    assert r.resolve(1000) == 1
    import numpy as np
    np.testing.assert_array_equal(
        r.resolve_batch([5, 10, 999, 1000, 500_000]), [4, 2, 0, 1, 3])
    r.optimize()
    assert r.resolve(10) == 2
    assert r.get_bvector().count() == 4
