"""Generate reference-format BLOB fixtures for the standalone decoder tests.

Runs the REFERENCE's own serializer (via serial/native/refbridge.cpp, which
compiles against the reference headers) over a matrix of distributions x
compression levels x options (bookmarks, GAP strategy, XOR filter), and
stores the BLOBs + ground-truth inputs under tests/fixtures/refblobs/.

The fixtures are committed, so tests/test_refcodec.py validates the
clean-room decoder (serial/refcodec.py) WITHOUT needing the reference tree.

Usage: JAX_PLATFORMS=cpu python tools/make_refblob_fixtures.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from bitmagic_tpu.serial import refcodec, refformat  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "refblobs")
SIZE = 40_000_000


def distributions(rng):
    d = {}
    d["tiny"] = np.asarray([5, 100, 70_000], np.int64)
    d["sparse"] = np.unique(rng.integers(0, SIZE, 4000))
    d["midsparse"] = np.unique(rng.integers(0, SIZE // 4, 100_000))
    d["dense"] = np.unique(rng.integers(0, 600_000, 450_000))
    starts = rng.integers(0, SIZE - 5000, 120)
    d["clustered"] = np.unique(np.concatenate(
        [np.arange(s, s + rng.integers(1, 4000)) for s in starts]))
    d["runs"] = np.concatenate([np.arange(1_000_000, 1_900_000),
                                np.arange(30_000_000, 30_000_200)])
    d["edges"] = np.asarray([0, 1, 65535, 65536, 131071, 131072,
                             SIZE - 2, SIZE - 1], np.int64)
    # very sparse over a wide space -> sblock_bienc candidates at level 5/6
    d["verysparse"] = np.unique(rng.integers(0, SIZE, 600))
    # alternating short runs -> GAP blocks
    base = np.arange(0, 3_000_000, 97)
    d["gappy"] = np.unique(np.concatenate([base, base + 1, base + 2]))
    # near-full blocks -> inverted array codes
    full = np.arange(4_000_000, 4_400_000)
    holes = rng.integers(4_000_000, 4_400_000, 300)
    d["nearfull"] = np.setdiff1d(full, holes)
    return {k: v.astype(np.int64) for k, v in d.items()}


def main():
    if not refformat.available():
        raise SystemExit("reference bridge unavailable — cannot generate")
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260816)
    dists = distributions(rng)
    np.savez_compressed(os.path.join(OUT, "inputs.npz"), **dists)

    # keep the committed corpus small: raw/low levels only for small inputs
    SMALL = {"tiny", "sparse", "edges", "verysparse"}
    manifest = []
    seen_codes = set()
    for name, ids in dists.items():
        for level in range(7):
            if level <= 2 and name not in SMALL:
                continue
            for tag, kw in [("", {}), ("_bm", {"bookmarks": 64}),
                            ("_gap", {"use_gap": True})]:
                if tag and level not in (3, 6):
                    continue  # options matrix only at two levels
                blob = refformat.serialize_reference_blob_ex(
                    ids, SIZE, level=level, **kw)
                fn = f"{name}_L{level}{tag}.bin"
                with open(os.path.join(OUT, fn), "wb") as f:
                    f.write(blob)
                # sanity: decode now and track code coverage
                de = refcodec.RefDeserializer()
                got = de.deserialize(blob).indices()
                assert np.array_equal(got, ids), (fn, "DECODE MISMATCH")
                seen_codes.update(de.code_stat)
                manifest.append({"file": fn, "dist": name, "level": level,
                                 "options": tag.strip("_"),
                                 "codes": sorted(de.code_stat)})

    from bitmagic_tpu import BitVector

    # XOR-filter fixture 1: target is a perturbed copy of ref (row 0) ->
    # ref_eq + masked/unmasked xor_ref codes
    ref_ids = dists["midsparse"]
    flip = rng.choice(ref_ids, 500, replace=False)
    extra = np.unique(rng.integers(0, SIZE, 500))
    t_ids = np.union1d(np.setdiff1d(ref_ids, flip), extra)
    blob = refformat.serialize_reference_blob_xor(t_ids, ref_ids, SIZE)
    with open(os.path.join(OUT, "xor_target.bin"), "wb") as f:
        f.write(blob)
    np.savez_compressed(os.path.join(OUT, "xor_inputs.npz"),
                        target=t_ids, ref=ref_ids)
    de = refcodec.RefDeserializer(
        ref_vectors=[(0, BitVector.from_indices(ref_ids, SIZE))])
    got = de.deserialize(blob).indices()
    assert np.array_equal(got, t_ids), "XOR DECODE MISMATCH"
    seen_codes.update(de.code_stat)
    manifest.append({"file": "xor_target.bin", "dist": "xor", "level": 6,
                     "options": "xor", "codes": sorted(de.code_stat)})

    # XOR-filter fixture 2: target blends two refs per half-block -> chains
    r1 = np.unique(rng.integers(0, SIZE // 8, 80_000))
    r2 = np.unique(rng.integers(0, SIZE // 8, 80_000))
    lo = r1[(r1 % 65536) < 32768]
    hi = r2[(r2 % 65536) >= 32768]
    t2 = np.union1d(np.union1d(lo, hi), np.unique(rng.integers(0, SIZE, 50)))
    blob2 = refformat.serialize_reference_blob_xor(t2, r1, SIZE, ids_ref2=r2)
    with open(os.path.join(OUT, "xor_chain.bin"), "wb") as f:
        f.write(blob2)
    np.savez_compressed(os.path.join(OUT, "xor_chain_inputs.npz"),
                        target=t2, ref=r1, ref2=r2)
    de = refcodec.RefDeserializer(
        ref_vectors=[(0, BitVector.from_indices(r1, SIZE)),
                     (2, BitVector.from_indices(r2, SIZE))])
    got = de.deserialize(blob2).indices()
    assert np.array_equal(got, t2), "XOR CHAIN DECODE MISMATCH"
    seen_codes.update(de.code_stat)
    manifest.append({"file": "xor_chain.bin", "dist": "xor_chain",
                     "level": 6, "options": "xor",
                     "codes": sorted(de.code_stat)})

    # sparse-vector / RSC BLOB fixtures (reference sparse_vector_serializer)
    nsv = 250_000
    sv_vals = rng.integers(0, 1 << 22, nsv).astype(np.uint32)
    sv_nn = rng.random(nsv) > 0.35
    sv_nn[-1] = True     # avoid trailing-NULL size ambiguity in fixtures
    np.savez_compressed(os.path.join(OUT, "sv_inputs.npz"),
                        vals=sv_vals, notnull=sv_nn)
    from bitmagic_tpu.serial import ref_sv
    for name, use_xor in (("sv_plain.bin", False), ("sv_xor.bin", True)):
        blob = refformat.serialize_reference_sv(sv_vals, sv_nn, use_xor)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(blob)
        sv = ref_sv.deserialize_sv_blob(blob, np.uint32)
        sidx = np.flatnonzero(sv_nn).astype(np.int64)
        assert np.array_equal(
            np.asarray(sv.gather(sidx), np.uint32), sv_vals[sidx]), name
        manifest.append({"file": name, "dist": "sv", "level": 6,
                         "options": "xor" if use_xor else "", "codes": []})
    blob = refformat.serialize_reference_rsc(sv_vals, sv_nn)
    with open(os.path.join(OUT, "rsc.bin"), "wb") as f:
        f.write(blob)
    rsc = ref_sv.deserialize_rsc_blob(blob, np.uint32)
    sidx = np.flatnonzero(sv_nn).astype(np.int64)
    assert np.array_equal(
        np.asarray(rsc.gather(sidx), np.uint32), sv_vals[sidx])
    manifest.append({"file": "rsc.bin", "dist": "rsc", "level": 6,
                     "options": "", "codes": []})

    # string sparse-vector fixtures (with and without remap)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    strs = [words[rng.integers(0, len(words))] + str(rng.integers(0, 5000))
            if rng.random() > 0.25 else None for _ in range(60_000)]
    np.savez_compressed(
        os.path.join(OUT, "str_inputs.npz"),
        strings=np.asarray([s or "" for s in strs], dtype=object),
        allow_pickle=True)
    for name, remap in (("strsv_plain.bin", False), ("strsv_remap.bin",
                                                     True)):
        blob = refformat.serialize_reference_str(strs, use_remap=remap)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(blob)
        got = [g or None for g in
               ref_sv.deserialize_str_blob(blob).to_list()]
        assert got == [s or None for s in strs], name
        manifest.append({"file": name, "dist": "strsv", "level": 6,
                         "options": "remap" if remap else "", "codes": []})

    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump({"size": SIZE, "blobs": manifest,
                   "codes_covered": sorted(seen_codes)}, f, indent=1)
    print(f"{len(manifest)} fixtures; block codes covered:",
          sorted(seen_codes))


if __name__ == "__main__":
    main()
