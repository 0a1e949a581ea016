"""Value-level differentials that are INDEPENDENT Python references,
not DuckDB re-expressions. Since r8 every registered query has a DuckDB
oracle — ``ann_pca_compress`` (the last rows-only row) now applies the
pinned production basis (``llmdata/pca_pinned.py``), whose projection is
SQL; the non-SQL eigh lives in the offline fit, which THIS file checks
by live refit. ``text_bpe_merges`` / ``text_bpe_encode`` (unrolled-CTE)
and ``multimodal_cdc_dedup`` (low-bit mask + recursive-CTE clamp walk)
gained DuckDB oracles in r6; all differentials here stay as
belt-and-braces.

The driver can only count their rows, so each gets an INDEPENDENT pure-
Python reference here — different algorithmic shape from the Spark path
(Counter-based word counts vs the word_frequency shuffle; the classic
scalar Gear recurrence ``h = 2h + g`` vs the vectorized 64-term shift-sum;
a fresh merge-application loop) — compared value-for-value over the FULL
query output at sf0.01, the same scale the driver samples at."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow.parquet as pq

SF001 = "/root/testdata/sf0.01"

_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java default (ASCII) \s


def _docs():
    t = pq.read_table(SF001 + "/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _words(text: str) -> list[str]:
    # mirror F.split(F.trim(text), r"\s+") + length>0 filter: trim strips
    # ASCII spaces only; Java's \s is the ASCII class
    return [w for w in _WS.split(text.strip(" ")) if w]


def _ref_bpe_train(docs, num_merges: int, max_vocab: int):
    wc: Counter[str] = Counter()
    for _, text in docs:
        wc.update(_words(text))
    capped = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    vocab = {w: (tuple(w), c) for w, (c) in capped}
    merges = []
    for rank in range(num_merges):
        pc: Counter[tuple[str, str]] = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, a, b, n))
        vocab = {
            w: (_ref_apply_merge(syms, a, b), c)
            for w, (syms, c) in vocab.items()
        }
    return merges


def _ref_apply_merge(syms: tuple[str, ...], a: str, b: str):
    out: list[str] = []
    i = 0
    while i < len(syms):
        if syms[i] == a and i + 1 < len(syms) and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def test_bpe_merges_differential_sf001(spark):
    from n2khab_mhq_data_spark.plans.llm import text_bpe_merges

    want = _ref_bpe_train(_docs(), num_merges=8, max_vocab=10000)
    got = sorted(
        (r.rank, r.left, r.right, r.n)
        for r in text_bpe_merges(spark, SF001).collect()
    )
    assert got == want


def test_bpe_encode_differential_sf001(spark):
    from n2khab_mhq_data_spark.plans.llm import text_bpe_encode

    docs = _docs()
    merges = _ref_bpe_train(docs, num_merges=8, max_vocab=10000)
    want = {}
    for doc_id, text in docs:
        ws = _words(text)
        n_tok = 0
        for w in ws:
            syms: tuple[str, ...] = tuple(w)
            for _, a, b, _n in merges:
                syms = _ref_apply_merge(syms, a, b)
            n_tok += len(syms)
        want[doc_id] = (len(ws), sum(len(w) for w in ws), n_tok)
    got = {
        r.doc_id: (r.n_words, r.n_symbols_raw, r.n_tokens_bpe)
        for r in text_bpe_encode(spark, SF001).collect()
    }
    assert got == want
    assert len(got) == 500


def _ref_gear_candidates(raw: bytes, mask: int) -> list[int]:
    # classic scalar Gear recurrence: h <- (2h + G[b]) mod 2^64 — keeps
    # exactly the last 64 bytes' contributions, the same window the
    # vectorized shift-sum in llmdata/multimodal.py builds explicitly
    from n2khab_mhq_data_spark.llmdata.multimodal import _gear

    g = [_gear(b) for b in range(256)]
    h = 0
    out = []
    for i, byte in enumerate(raw):
        h = ((h << 1) + g[byte]) & 0xFFFFFFFFFFFFFFFF
        if (h & mask) == 0:
            out.append(i)
    return out


def _ref_cdc_chunks(raw: bytes, mask: int, min_len: int, max_len: int):
    n = len(raw)
    if n == 0:
        return []
    cand = _ref_gear_candidates(raw, mask)
    chunks = []
    start = 0
    while start < n:
        cut = None
        for c in cand:
            end = c + 1
            if end < start + min_len:
                continue
            if end > start + max_len:
                break
            if end < n:
                cut = end
                break
        if cut is None:
            cut = min(start + max_len, n) if n - start > max_len else n
        chunks.append((start, cut - start))
        start = cut
    return [
        (off, ln, hashlib.md5(raw[off:off + ln]).hexdigest())
        for off, ln in chunks
    ]


def test_cdc_dedup_differential_sf001(spark):
    """Full-output differential for multimodal_cdc_dedup: the reference
    chunks every payload with an independently written scalar kernel,
    then aggregates chunk reuse in pure Python."""
    from n2khab_mhq_data_spark.plans.llm import multimodal_cdc_dedup

    refs: Counter[tuple[str, int]] = Counter()
    docs_per: dict[tuple[str, int], set] = {}
    for doc_id, text in _docs():
        raw = text.encode("utf-8")
        for _off, ln, dig in _ref_cdc_chunks(raw, 0x1F, 8, 256):
            key = (dig, ln)
            refs[key] += 1
            docs_per.setdefault(key, set()).add(doc_id)
    want = {
        k: (n, len(docs_per[k])) for k, n in refs.items() if n >= 2
    }
    got = {
        (r.chunk_md5, r.n_bytes): (r.n_refs, r.n_docs)
        for r in multimodal_cdc_dedup(spark, SF001).collect()
    }
    assert got == want
    assert want  # the corpus genuinely contains reused chunks


def test_bpe_merges_strict_differential_sf001(spark):
    """The strict (corpus-exact, fails-on-truncation) variant must emit
    the same merge table as the reference trainer with the exactness
    flag set on every row — and, since the sf0.01 vocabulary is far
    under the cap, must NOT raise."""
    from n2khab_mhq_data_spark.plans.llm import text_bpe_merges_strict

    want = _ref_bpe_train(_docs(), num_merges=8, max_vocab=10000)
    rows = text_bpe_merges_strict(spark, SF001).collect()
    got = sorted((r.rank, r.left, r.right, r.n) for r in rows)
    assert got == want
    assert all(r.corpus_exact for r in rows)


def test_pca_compress_differential_sf001(spark):
    """Full-output numpy differential for ann_pca_compress at sf0.01:
    an independent single-machine PCA (np.cov + eigh over the raw
    table, no partials) must reproduce every row of the pinned-basis
    query (the frozen basis was trained on THIS corpus, so a live
    refit agrees to ~1e-8 — far under the 1e-4 gate), the frozen
    ``pca_pinned`` artifact must match a live distributed ``pca_fit``,
    and the fit must satisfy the variance invariants."""
    import numpy as np

    import __spark_entry__ as entrymod
    from n2khab_mhq_data_spark.llmdata.pca_pinned import PCA_MU, PCA_W
    from n2khab_mhq_data_spark.llmdata.similarity import pca_fit

    t = pq.read_table(SF001 + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mu = V.mean(axis=0)
    cov = np.cov(V, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals)[:8]
    W = evecs[:, order].T.copy()
    for row in W:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    C = V - mu
    P = C @ W.T
    R = P @ W
    err = ((C - R) ** 2).sum(axis=1)
    ref = {
        i: (p1, p2, e)
        for i, p1, p2, e in zip(ids, P[:, 0], P[:, 1], err)
    }

    got = entrymod.queries()["ann_pca_compress"](spark, SF001).collect()
    assert len(got) == len(ref)
    for r in got:
        p1, p2, e = ref[r["vec_id"]]
        assert abs(r["pc1"] - p1) < 1e-4, r["vec_id"]
        assert abs(r["pc2"] - p2) < 1e-4, r["vec_id"]
        assert abs(r["recon_err"] - e) < 1e-4, r["vec_id"]

    # fit invariants: orthonormal rows, descending explained variance,
    # PCA reconstruction beats dropping to the SAME k at random
    mu2, W2, evr = pca_fit(
        spark.read.parquet(SF001 + "/embeddings.parquet")
    )
    G = np.asarray(W2) @ np.asarray(W2).T
    assert np.allclose(G, np.eye(8), atol=1e-9)
    assert all(a >= b for a, b in zip(evr, evr[1:]))
    assert 0 < sum(evr) <= 1 + 1e-9
    # the frozen production basis is still THE fit of this corpus: a
    # drifted pin (stale regeneration, wrong sf) fails here, so the
    # oracle-checked projection can never silently apply a wrong model
    assert np.allclose(np.asarray(PCA_MU), np.asarray(mu2), atol=1e-6)
    assert np.allclose(np.asarray(PCA_W), np.asarray(W2), atol=1e-6)


def test_pca_project_matches_pinned_sql(spark):
    """The Arrow/BLAS batch apply path (``pca_project``, the production
    projector for corpora where the closure-matrix pass beats 70 KB of
    codegen SQL) and the unrolled-SQL path of the registered query must
    agree on the pinned basis — an independent-implementation
    differential (numpy matmul vs whole-stage-codegen arithmetic)."""
    import numpy as np

    import __spark_entry__ as entrymod
    from n2khab_mhq_data_spark.catalog import load
    from n2khab_mhq_data_spark.llmdata.pca_pinned import PCA_MU, PCA_W
    from n2khab_mhq_data_spark.llmdata.similarity import pca_project

    emb = load(spark, SF001, "embeddings")
    arrow = {
        r["id"]: (r["pc1"], r["pc2"], r["recon_err"])
        for r in pca_project(emb, PCA_MU, PCA_W).collect()
    }
    sql = entrymod.queries()["ann_pca_compress"](spark, SF001).collect()
    assert len(sql) == len(arrow)
    for r in sql:
        p1, p2, e = arrow[r["vec_id"]]
        assert abs(r["pc1"] - p1) < 1e-6
        assert abs(r["pc2"] - p2) < 1e-6
        assert abs(r["recon_err"] - e) < 1e-6
