"""Property-based checks for the vectorized numpy kernels (winnowing,
simhash) against naive per-doc Python references — the differential
oracle covers the synthetic corpus; these cover adversarial shapes
(short docs, whitespace-only, repeated chars, unicode)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from n2khab_mhq_data_spark.llmdata.dedup import HASH_PRIME, _char_hash

K, W = 5, 4
MOD = 1_000_003


def _winnow_reference(text: str) -> set[int]:
    """Literal Schleimer-et-al reference: per-step fold, explicit windows,
    oracle padding semantics (chars past the end hash as code 0)."""
    cp = [ord(c) for c in text]
    if len(cp) < K:
        cp = cp + [0] * (K - len(cp))
    m = len(cp) - (K - 1)
    hs = []
    for i in range(m):
        h = 7
        for j in range(K):
            h = (h * 31 + cp[i + j]) % MOD
        hs.append(h)
    if len(hs) >= W:
        mins = [min(hs[p : p + W]) for p in range(len(hs) - W + 1)]
    else:
        mins = [min(hs)]
    return set(mins)


def _simhash_reference(text: str, bits: int = 16) -> int:
    toks = set(re.split(r"\s+", text.strip()))
    sums = [0] * bits
    for tok in toks:
        h = _char_hash(tok)
        for j in range(bits):
            sums[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(bits) if sums[j] > 0)


texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0,
    max_size=120,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(texts, min_size=1, max_size=12))
def test_winnow_kernel_matches_reference(spark, docs):
    from n2khab_mhq_data_spark.llmdata.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=K, w=W).collect():
        got.setdefault(r.doc, set()).add(r.fingerprint)
    for i, t in enumerate(docs):
        assert got.get(i, set()) == _winnow_reference(t), (i, t)


@settings(max_examples=8, deadline=None)
@given(st.lists(texts, min_size=1, max_size=12))
def test_simhash_kernel_matches_reference(spark, docs):
    from n2khab_mhq_data_spark.llmdata.dedup import simhash

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc: r.simhash for r in simhash(df, "text", "doc_id", 16).collect()}
    for i, t in enumerate(docs):
        assert got[i] == _simhash_reference(t), (i, t)


def test_char_hash_stays_in_prime_field():
    for tok in ("", "a", "zz" * 50, "Ā˿"):
        assert 0 <= _char_hash(tok) < HASH_PRIME


# --- geometry IO round-trips (no Spark session: pure parsers) -----------

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
).map(lambda x: round(x, 6))


@st.composite
def _ring(draw, min_pts=3, max_pts=8):
    pts = draw(
        st.lists(st.tuples(coord, coord), min_size=min_pts, max_size=max_pts)
    )
    return pts + [pts[0]]  # closed


@given(st.lists(_ring(), min_size=1, max_size=3))
@settings(max_examples=60, deadline=None)
def test_wkb_gpb_wkt_round_trip(rings):
    """Random polygons encoded as WKB inside a GPB blob must decode to WKT
    that re-parses to the same vertices."""
    import struct

    from n2khab_mhq_data_spark.spatial.geopackage import gpb_to_wkt
    from n2khab_mhq_data_spark.spatial.wkt import parse_wkt_polygon

    wkb = struct.pack("<BI", 1, 3) + struct.pack("<I", len(rings))
    for r in rings:
        wkb += struct.pack("<I", len(r))
        for x, y in r:
            wkb += struct.pack("<2d", x, y)
    blob = b"GP" + bytes([0, 0b1]) + struct.pack("<i", 31370) + wkb
    wkt = gpb_to_wkt(blob)
    (parsed,) = parse_wkt_polygon(wkt)
    assert len(parsed) == len(rings)
    for got, want in zip(parsed, rings):
        assert len(got) == len(want)
        for (gx, gy), (wx, wy) in zip(got, want):
            # %.10g formatting keeps 10 significant digits; inputs are
            # rounded to 6 decimals at <= 1e6 magnitude, so round-trip is
            # exact up to that quantization
            assert abs(gx - wx) < 1e-3 and abs(gy - wy) < 1e-3


@given(st.lists(_ring(), min_size=1, max_size=2))
@settings(max_examples=40, deadline=None)
def test_shapefile_record_round_trip(rings):
    """write_shapefile -> raw record parse preserves every ring vertex."""
    import os
    import struct
    import tempfile

    from n2khab_mhq_data_spark.spatial.shapefile import (
        _parse_record,
        read_shx_offsets,
        write_shapefile,
    )
    from n2khab_mhq_data_spark.spatial.wkt import parse_wkt_polygon

    with tempfile.TemporaryDirectory() as d:
        shp = os.path.join(d, "t.shp")
        write_shapefile(shp, [(5, rings)])
        (off, ln) = read_shx_offsets(os.path.join(d, "t.shx"))[0]
        with open(shp, "rb") as fh:
            fh.seek(off + 8)
            wkt = _parse_record(fh.read(ln))
    # orientation grouping may split multiple CW rings into a
    # MULTIPOLYGON; every ring and vertex must survive either way
    parsed_rings = [r for poly in parse_wkt_polygon(wkt) for r in poly]
    assert sorted(len(r) for r in parsed_rings) == sorted(
        len(r) for r in rings
    )


@given(
    st.binary(min_size=0, max_size=3000),
    st.sampled_from([(0xF, 8, 32), (0x3F, 16, 128), (0x1F, 4, 24)]),
)
@settings(max_examples=150, deadline=None)
def test_cdc_chunk_invariants(raw, params):
    """CDC kernel invariants over arbitrary bytes: exact tiling, the
    [min_len, max_len] clamp on every non-final chunk, max_len on the
    final one, determinism, and digest correctness."""
    import hashlib

    from n2khab_mhq_data_spark.llmdata.multimodal import cdc_chunk_one

    mask, mn, mx = params
    chunks = cdc_chunk_one(raw, mask, mn, mx)
    if not raw:
        assert chunks == []
        return
    assert chunks[0][0] == 0
    pos = 0
    for off, ln, dig in chunks:
        assert off == pos
        assert dig == hashlib.md5(raw[off : off + ln]).hexdigest()
        pos = off + ln
    assert pos == len(raw)
    assert all(ln <= mx for _, ln, _ in chunks)
    assert all(ln >= mn for _, ln, _ in chunks[:-1])
    assert chunks == cdc_chunk_one(raw, mask, mn, mx)


# --- record linkage invariants ------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


keys = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=102),
    min_size=0,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(st.lists(keys, min_size=2, max_size=10, unique=True))
def test_sorted_neighborhood_invariants(spark, ks):
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    rows = [(i, k, i % 3) for i, k in enumerate(ks)]
    df = spark.createDataFrame(rows, "id int, key string, blk int")
    blocks = [F.col("blk"), F.lit(99)]  # pass 2: everything one block
    out = sorted_neighborhood_pairs(
        df, "id", "key", blocks, window=3, max_dist=2
    ).collect()
    by_id = dict((i, k) for i, k, _ in rows)
    seen = set()
    for r in out:
        assert r.id1 < r.id2
        assert (r.key1, r.key2) == (by_id[r.id1], by_id[r.id2])
        assert r.lev_dist == _lev(r.key1, r.key2) <= 2
        assert (r.id1, r.id2) not in seen  # distinct output
        seen.add((r.id1, r.id2))
    # completeness within the single-block pass: adjacent-in-sorted-order
    # keys with lev <= 2 MUST be found (window=3 covers distance 1 and 2)
    by_key = sorted((k, i) for i, k, _ in rows)
    for (k1, i1), (k2, i2) in zip(by_key, by_key[1:]):
        if _lev(k1, k2) <= 2:
            assert (min(i1, i2), max(i1, i2)) in seen, (k1, k2)


def _simhash_reference_wide(text: str, bits: int, mod: int, mix: int) -> int:
    toks = set(re.split(r"\s+", text.strip()))
    sums = [0] * bits
    for tok in toks:
        h = 7
        for ch in tok:
            h = (h * 31 + ord(ch)) % mod
        h = (h * mix) % mod
        for j in range(bits):
            sums[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(bits) if sums[j] > 0)


@settings(max_examples=8, deadline=None)
@given(st.lists(texts, min_size=1, max_size=12))
def test_simhash_kernel_wide_params_match_reference(spark, docs):
    """Production 56-bit parameters (WIDE_PRIME modulus + modular-
    multiply post-mix): the vectorized kernel must match a naive
    big-int Python reference bit-for-bit — the mix product exceeds
    int64 in exact arithmetic, so this also pins that the kernel's
    numpy path stays on the (pre-mixed) reduced values."""
    from n2khab_mhq_data_spark.llmdata.dedup import (
        WIDE_MIX,
        WIDE_PRIME,
        simhash,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc: r.simhash
        for r in simhash(
            df, "text", "doc_id", bits=56, mod=WIDE_PRIME, mix=WIDE_MIX
        ).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == _simhash_reference_wide(
            t, 56, WIDE_PRIME, WIDE_MIX
        ), (i, t)
