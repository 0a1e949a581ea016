"""Text-analysis building blocks: tokenization, shingling, language ID,
quality scoring, fingerprinting. Pure Column expressions (JVM-side,
whole-stage codegen) except ``winnow_fingerprints``, whose rolling-hash
kernel is a vectorized-numpy ``mapInPandas`` (see its docstring for the
measured Column-shape comparisons)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.catalog import local_dim

# tiny per-language stopword lexicon for the n-gram/stopword language-ID
# heuristic; deliberately small and versioned (a dimension, not a model)
LANG_LEXICON: list[tuple[str, str]] = [
    ("en", "the"), ("en", "and"), ("en", "of"), ("en", "is"), ("en", "a"),
    ("fr", "le"), ("fr", "la"), ("fr", "et"), ("fr", "les"), ("fr", "de"),
    ("es", "el"), ("es", "y"), ("es", "los"), ("es", "que"), ("es", "de"),
    ("de", "der"), ("de", "und"), ("de", "die"), ("de", "das"), ("de", "ist"),
]


def lexicon_dim(spark: SparkSession) -> DataFrame:
    return local_dim(spark, LANG_LEXICON, "lang string, token string")


def tokens(text: Column) -> Column:
    """Whitespace tokens (the reference's str_split analog)."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array column. Stays inside one
    projection — no explode until the consumer decides to.

    Built from k aligned ``slice``s zipped together rather than a
    ``transform`` over an index sequence: an index-lambda re-inlines the
    tokenizing ``split`` into every ``element_at`` call, re-running the
    regex split O(k·n_tokens) times per row (measured ~7 s for 5k docs at
    sf0.1). The slice/zip_with form evaluates the split only k+1 times per
    row regardless of document length."""
    w = tokens(text)
    n = F.size(w)
    m = F.greatest(n - (k - 1), F.lit(0))  # shingle count when n >= k
    parts = [F.slice(w, j + 1, m) for j in range(k)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.concat_ws(" ", w))
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9 ]", "")
    t = F.regexp_replace(t, r" +", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (deterministic,
    engine-portable; the rolling-hash winnowing variant lives in dedup)."""
    return F.md5(normalize_text(text))


def winnow_fingerprints(
    df: "DataFrame", text_col: str, id_col: str, k: int = 5, w: int = 4
) -> "DataFrame":
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash every
    k-char gram (polynomial (acc*31 + code) mod p — integer-only,
    engine-portable), slide a w-window over the hash sequence, keep each
    window's minimum — the guaranteed-coverage subset of rolling hashes
    used for plagiarism/near-dup detection.

    Spark shape: a vectorized numpy kernel over ``mapInPandas`` — NO
    SHUFFLE: a document never leaves its input partition, so the operator
    is embarrassingly parallel at 100 TB. This is the deliberate
    pandas-UDF exception to the pure-Column rule in this module: a per-doc
    rolling hash + sliding-window min is k+w dependent array passes, and
    every pure-Column shape measured worse at sf0.1 — naive
    transform-of-transforms 9.5s (O(k·n) lambda re-inlining), explode +
    lead/window ~3s (chars-as-rows plus two window shuffles), aligned
    slice/zip_with arrays ~38s cold (CollapseProject re-inlines the
    per-char ascii() producer into every slice and the generated code is
    too large to JIT). The numpy form is <0.5s and O(n) per doc.
    Semantics match the oracle's per-step fold exactly: mod is a ring
    homomorphism for + and *, and 7*31^k + sum(code*31^j) < 2^63, so
    applying the residue once per gram is equal. Docs shorter than k chars
    hash one gram padded with code-0 chars (the oracle's
    ascii(substr-past-end) = 0). Returns distinct (doc, fingerprint)
    rows."""
    # the single-residue proof above holds only while the un-reduced
    # fold stays under 2^63; with full-unicode code points (up to
    # 0x10FFFF — the kernel reads raw UTF-32 code units) the int64 fold
    # silently wraps (numpy) from k = 10, diverging from the per-step
    # oracle fold; fail loudly instead of corrupting near-dup detection
    if k > 9:
        raise ValueError(
            f"winnow_fingerprints: k={k} can overflow the int64 single-"
            "residue fold on non-ASCII text (max supported k is 9); "
            "apply the residue per step if larger grams are ever needed"
        )
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("doc", df.schema[id_col].dataType, True),
            StructField("fingerprint", LongType(), True),
        ]
    )
    src = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("t"))
    mod = 1_000_003

    def _winnow(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, fps = [], []
            for doc, text in zip(pdf["doc"].values, pdf["t"].values):
                if text is None:
                    continue
                # utf-32-le frombuffer = vectorized per-char code points
                cp = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if cp.size < k:
                    cp = np.pad(cp, (0, k - cp.size))
                m = cp.size - (k - 1)
                h = np.full(m, 7, dtype=np.int64)
                for j in range(k):
                    h = h * 31 + cp[j : j + m]
                hm = h % mod
                if hm.size >= w:
                    mins = sliding_window_view(hm, w).min(axis=1)
                else:
                    mins = hm.min(keepdims=True)
                u = np.unique(mins)
                ids.append(np.full(u.size, doc))
                fps.append(u)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc": np.concatenate(ids),
                        "fingerprint": np.concatenate(fps),
                    }
                )

    return src.mapInPandas(_winnow, schema=out_schema)


def quality_metrics(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals
    (classic pre-training heuristic filters)."""
    n_chars = F.length(text)
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.!?,;:]", ""))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "is"))
    )
    # NULL-divisor guard: one empty-string document would otherwise
    # abort the whole job under ANSI (DIVIDE_BY_ZERO) — empty docs get
    # NULL ratios, which downstream threshold comparisons treat as
    # not-passing (same as DuckDB's nullif spelling in the oracles)
    n_chars_dz = F.when(n_chars > 0, n_chars.cast("double"))
    # true mean token length: sum of token lengths / token count. The
    # old (n_chars - n_tokens + 1) / n_tokens form assumed exactly one
    # separator space, overstating the mean for padded or double-spaced
    # text (' a ' scored 3.0 instead of 1.0)
    mean_token_len = (
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).cast("double")
        / n_tokens
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": n_punct.cast("double") / n_chars_dz,
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "mean_token_len": mean_token_len,
    }


def char_entropy(text: Column) -> dict[str, Column]:
    """Shannon entropy of the per-document character distribution (bits)
    plus distinct-char count — the classic cheap compressibility proxy:
    boilerplate / keyboard-mash / repeated-pad documents score low, real
    prose lands around 4-4.5 bits for English.

        H = -sum_c  (n_c / n) * log2(n_c / n)

    Scale: ZERO shuffle — everything is a per-row Column expression
    (split -> distinct -> counted via higher-order functions), so the
    signal is computed inside the corpus scan exactly like the other
    quality heuristics. Per-row cost is O(distinct_chars * n_chars),
    fine for documents (distinct is alphabet-sized). The fold adds terms
    in ascending-char order so an oracle can reproduce the exact FP sum.
    Empty text yields H = 0.0, n_distinct = 0 (fold over empty array)."""
    chars = F.filter(F.split(text, ""), lambda c: c != F.lit(""))
    n = F.size(chars)
    alphabet = F.array_sort(F.array_distinct(chars))
    counts = F.transform(
        alphabet,
        lambda c: F.size(F.filter(chars, lambda x: x == c)),
    )
    h = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, cnt: acc
        - (cnt.cast("double") / n) * F.log2(cnt.cast("double") / n),
    )
    return {
        "n_chars": n.cast("long"),
        "n_distinct_chars": F.size(alphabet).cast("long"),
        "entropy_bits": h,
    }


def word_bigrams(toks: Column) -> Column:
    """Adjacent-word bigrams of a token array, as ``"w1 w2"`` strings.

    Built from two aligned ``slice``s zipped together, NOT a transform
    over an index sequence — an index lambda re-inlines the tokenizing
    ``split`` into every ``element_at``, re-running the regex
    O(n_tokens) times per row (the word_shingles finding). One shared
    helper so the measured-safe shape lives in one place (previously
    copy-pasted at four sites)."""
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def word_bigram_pairs(toks: Column) -> Column:
    """Adjacent-word bigrams as ``struct<w1, w2>`` (for consumers that
    need the parts separately); same aligned-slice construction as
    :func:`word_bigrams`."""
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def repetition_metrics(text: Column) -> dict[str, Column]:
    """Repetition-based quality signals (the Gopher/C4 rule family):
    duplicate-word fraction and duplicate-bigram fraction per document —
    high values mark boilerplate/spam for the quality gate. Pure JVM
    array expressions (split + array_distinct + transform over an index
    sequence): no UDF, no shuffle, runs inside the scan projection."""
    toks = tokens(text)
    n = F.size(toks)
    dup_word = F.when(
        n > 0,
        (n - F.size(F.array_distinct(toks))).cast("double") / n,
    ).otherwise(F.lit(0.0))
    grams = word_bigrams(toks)
    n_g = F.size(grams)
    dup_gram = F.when(
        n >= 2,
        (n_g - F.size(F.array_distinct(grams))).cast("double") / n_g,
    ).otherwise(F.lit(0.0))
    return {
        "n_words": n.cast("long"),
        "dup_word_frac": dup_word,
        "dup_bigram_frac": dup_gram,
    }


def bigram_lm_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    rounded: bool = True,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram LM
    fit on the corpus itself (Jelinek-Mercer smoothing, public NLP
    standard): p(w2|w1) = lam * c(w1 w2)/c(w1·) + (1-lam) * c(·w2)/N,
    counts taken over the corpus bigram stream. The classic
    fluency/quality signal a pre-training filter thresholds on (the
    bigram upgrade of ``unigram_logprob``).

    Shuffle accounting: the bigram stream is one explode; all three
    count attachments are WINDOWS over it (partitionBy (w1,w2), (w1),
    (w2) — three hash shuffles of the stream, no count-table joins, no
    broadcast of an unbounded vocabulary); the corpus total N is the
    1-row broadcast. Final per-doc mean is one aggregation on the doc
    key."""
    from pyspark.sql.window import Window as W

    ws = tokens(F.col(text_col))
    pairs = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(word_bigram_pairs(ws)).alias("bg"),
    ).select("doc", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = F.count("*").over(W.partitionBy("w1", "w2"))
    c1 = F.count("*").over(W.partitionBy("w1"))
    c2 = F.count("*").over(W.partitionBy("w2"))
    scored = pairs.select(
        "doc", c12.alias("c12"), c1.alias("c1"), c2.alias("c2")
    )
    total = scored.agg(F.count("*").cast("double").alias("n_bigrams"))
    logp = F.log(
        lam * F.col("c12") / F.col("c1")
        + (1 - lam) * F.col("c2") / F.col("n_bigrams")
    )
    agg = (
        scored.crossJoin(F.broadcast(total))
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            F.avg(logp).alias("m"),
        )
    )
    # every doc appears in the output: a doc with < 2 tokens yields no
    # bigrams, and a plain explode would silently DROP it — bypassing
    # any downstream fluency gate built on this table. Unscored docs
    # carry n_scored = 0 and a NULL mean, which threshold comparisons
    # treat as not-passing (fail closed).
    out = (
        docs.select(F.col(id_col).alias("doc"))
        .join(agg, "doc", "left_outer")
        .select(
            "doc",
            F.coalesce(F.col("n_scored"), F.lit(0)).cast("long")
            .alias("n_scored"),
            "m",
        )
    )
    m = F.col("m")
    # rounded=False hands the RAW double to composing plans (e.g. the
    # adaptive percentile gate): thresholds must compare the values both
    # engines actually computed, with rounding only at the final output
    score = F.round(m + F.signum(m) * 1e-9, 6) if rounded else m
    return out.select(
        F.col("doc").alias(id_col),
        "n_scored",
        score.alias("mean_logprob"),
    )


def hashed_linear_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 512,
    bias: float = 0.0,
) -> DataFrame:
    """Fasttext-style linear quality-classifier scoring: feature-hash the
    token stream into ``dim`` buckets, mean-pool the per-bucket weights,
    squash through a sigmoid, threshold at 0.5 — the standard shape of
    model-based quality filters (CCNet / fasttext LID, Llama-style
    wiki-ref classifiers) at the scoring stage.

    The weight vector here is a deterministic stand-in
    (``w_j = ((j * 2654435761 + 12345) mod 2001 - 1000) / 1000``); in
    production the trained weights arrive as a broadcast array or a
    ``dim``-row dimension — the plumbing being exercised (hashing,
    pooling, thresholding) is identical and that is what must scale.

    Scale design: ZERO shuffle — the whole score is one projection of
    nested higher-order functions (aggregate over the token array, char
    polynomial hash per token), entirely inside whole-stage codegen; at
    100 TB this is a map-only pass like P1-P6. The char hash is the
    portable (acc*31 + ascii) mod 1000003 polynomial shared with the
    winnowing fingerprints, so a DuckDB oracle can replay it exactly.
    """
    toks = tokens(F.col(text_col))

    def tok_bucket(t: Column) -> Column:
        return (
            F.aggregate(
                F.split(t, ""),
                F.lit(7).cast("long"),
                lambda acc, c: (acc * F.lit(31) + F.coalesce(F.ascii(c), F.lit(0)))
                % F.lit(1000003),
            )
            % dim
        )

    def tok_weight(t: Column) -> Column:
        return (
            (tok_bucket(t) * F.lit(2654435761) + F.lit(12345)) % F.lit(2001)
            - F.lit(1000)
        ).cast("double") / F.lit(1000.0)

    mean_w = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + tok_weight(t)
    ) / F.size(toks)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-(mean_w + F.lit(bias))))
    from n2khab_mhq_data_spark.functions.scalars import eps_round

    return docs.select(
        F.col(id_col),
        eps_round(prob, 6).alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


def word_frequency(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus word-frequency table ``(w, wc)`` — ONE shuffle on the word
    (map-side combinable count). This is the standard scale reduction
    for tokenizer training: the corpus may be 100 TB but its distinct
    word vocabulary is bounded (Heaps' law), so everything downstream
    (pair counts, BPE merges) runs on the aggregated table, never the
    raw text again."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


def bpe_pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent character-pair counts over the word-frequency table
    ``(w, wc)`` — iteration 0 of byte-pair-encoding training, weighted
    by word frequency. Pure Column expressions (transform over a
    sequence of substrings): JVM-side, no UDF; one shuffle on the pair
    key."""
    return (
        wf.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "wc",
        )
        .groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("n"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 5,
    max_vocab: int = 10000,
    strict_vocab: bool = False,
) -> list[tuple[int, str, str, int]]:
    """Greedy BPE merge training: ``num_merges`` rounds of
    (rank, left_symbol, right_symbol, pair_count), most-frequent pair
    first, ties broken lexicographically (deterministic).

    Scale split: the CLUSTER does the one expensive pass — word counts
    over the full corpus (``word_frequency``) capped to the
    ``max_vocab`` most frequent words (deterministic count-desc/word-asc
    top-k, a TakeOrderedAndProject) — and the DRIVER runs the
    inherently sequential merge loop over that bounded table, exactly
    how production tokenizer trainers (HF tokenizers, sentencepiece)
    structure it. The collect is bounded by ``max_vocab`` rows, the
    same contract as the k-means K*dim partials in
    llmdata/similarity.py.

    Truncation is SURFACED, never silent (ADVICE r3): when the corpus
    vocabulary exceeds ``max_vocab`` the merge counts (and potentially
    the merge ORDER) are computed over the capped table only — a
    warning names the cap so callers can distinguish exact from
    approximate merge tables, and ``strict_vocab=True`` turns it into
    an error for callers that require corpus-exact BPE. Detection costs
    nothing: the top-k collect fetches ``max_vocab + 1`` rows and
    checks whether the extra row exists."""
    wf = (
        word_frequency(df, text_col)
        .orderBy(F.col("wc").desc(), F.col("w"))
        .limit(max_vocab + 1)
        .collect()
    )
    if len(wf) > max_vocab:
        msg = (
            f"bpe_train: corpus vocabulary exceeds max_vocab={max_vocab};"
            " merge counts/order are computed over the capped top"
            f" {max_vocab} words and may diverge from corpus-exact BPE"
        )
        if strict_vocab:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
        wf = wf[:max_vocab]
    vocab: list[tuple[list[str], int]] = [
        (list(r["w"]), int(r["wc"])) for r in wf
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, wc in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wc
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        merged = a + b
        new_vocab: list[tuple[list[str], int]] = []
        for syms, wc in vocab:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, wc))
        vocab = new_vocab
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[int, str, str, int]],
) -> DataFrame:
    """Apply a trained BPE merge list to the corpus: per-doc token count
    before (chars) and after merges — ``(id, n_words, n_symbols_raw,
    n_tokens_bpe)``. The merge table is tiny (num_merges rows) and ships
    to every task as a plain closure (an implicit broadcast); encoding
    is an Arrow-batched ``mapInPandas`` pass — one scan, no shuffle,
    embarrassingly parallel per document. The inner loop applies merges
    in rank order exactly like the trainer, so
    encode(train_corpus) reproduces the trainer's final symbol counts.
    """
    ordered = [(a, b) for _, a, b, _ in sorted(merges)]

    def encode_word(w: str) -> int:
        syms = list(w)
        for a, b in ordered:
            out: list[str] = []
            i = 0
            merged = a + b
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    from collections.abc import Iterator

    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_words, n_raw, n_bpe = [], [], []
            for t in pdf[text_col]:
                ws = [w for w in (t or "").strip().split() if w]
                n_words.append(len(ws))
                n_raw.append(sum(len(w) for w in ws))
                n_bpe.append(sum(encode_word(w) for w in ws))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": n_words,
                    "n_symbols_raw": n_raw,
                    "n_tokens_bpe": n_bpe,
                }
            )

    # id type PROPAGATES from the input (the unicode_normalize_corpus /
    # winnow_fingerprints convention) — a hardcoded long broke string ids
    idt = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        op,
        f"{id_col} {idt}, n_words long, n_symbols_raw long,"
        " n_tokens_bpe long",
    )


# versioned banned-term lexicon for the C4-style blocklist gate — a
# DIMENSION (reviewable, versionable), not a hard-coded regex
BANNED_LEXICON: list[tuple[str]] = [("slow",), ("stale",), ("broken",)]


def banned_lexicon_gate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_ratio: float = 0.05,
) -> DataFrame:
    """C4-style blocklist gate: per-doc banned-token count/ratio against
    the broadcast ``BANNED_LEXICON`` dimension, plus the keep verdict
    (ratio <= ``max_ratio``). One explode + broadcast LEFT join +
    groupBy — the text_langid plan shape; docs with zero hits keep a
    0 count via the left join, so the gate emits one row per doc."""
    spark = df.sparkSession
    banned = local_dim(spark, BANNED_LEXICON, "btok string").withColumn(
        "hit", F.lit(1)
    )
    # explode_outer: a NULL/empty text still yields its one gate row
    # (n_tokens 0) — a plain explode would silently DROP the doc from
    # the verdict, letting it bypass the gate entirely
    tok = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    per_doc = (
        tok.join(F.broadcast(banned), tok["tok"] == banned["btok"], "left")
        .groupBy(id_col)
        .agg(
            F.count("tok").cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_banned"),
        )
    )
    # guard the zero-token doc (NULL/empty text): ANSI division by zero
    # would abort the job; semantically nothing banned -> keep
    ratio = F.when(
        F.col("n_tokens") > 0,
        F.col("n_banned").cast("double") / F.col("n_tokens"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_banned",
        F.round(ratio + F.lit(1e-9), 6).alias("banned_ratio"),
        F.coalesce(ratio <= max_ratio, F.lit(True)).alias("keep"),
    )


def unicode_normalize_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
    lower: bool = True,
) -> DataFrame:
    """Unicode normalization — the canonical first step of any text
    dedup pipeline (un-normalized text makes byte-identical near-dups
    hash apart: e.g. e + COMBINING ACUTE vs the precomposed é). Spark
    has no unicode-normalize builtin, so this is one Arrow-batched
    ``mapInPandas`` pass over ``unicodedata.normalize`` (stdlib — C
    implementation, linear per char): no shuffle, narrow output
    (id, normalized text, changed flag + length delta for
    observability). Lowercasing is applied AFTER normalization,
    matching the usual canonicalization order.

    The changed/delta columns let a curation pipeline measure how much
    of the corpus was non-canonical — a data-quality signal in its own
    right."""
    from collections.abc import Iterator
    from unicodedata import normalize as _norm

    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_txt = []
            for t in pdf[text_col]:
                # NULL text must pass through as NULL: normalize(form,
                # None) raises TypeError and kills the task (the
                # sibling mapInPandas ops guard this the same way)
                if t is None:
                    out_txt.append(None)
                    continue
                n = _norm(form, t)
                if lower:
                    n = n.lower()
                out_txt.append(n)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "text_norm": out_txt,
                    "changed": [
                        None if t is None else n != t
                        for n, t in zip(out_txt, pdf[text_col])
                    ],
                    "len_delta": [
                        None if t is None else len(n) - len(t)
                        for n, t in zip(out_txt, pdf[text_col])
                    ],
                }
            )

    idt = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        op,
        f"{id_col} {idt}, text_norm string, changed boolean,"
        " len_delta int",
    )


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 5,
    stride: int = 3,
) -> DataFrame:
    """Overlapping sentence-window chunking — the retrieval-corpus prep
    op (RAG indexing slices documents into ``size``-sentence windows
    every ``stride`` sentences so a hit near a window edge still has
    context). Pure Column expressions: one ``split`` on the sentence
    boundary, a ``sequence`` of window starts, ``slice`` +
    ``array_join`` per window, one ``posexplode`` — JVM-side, no
    shuffle, rows fan out inside the scan stage. Output grain is
    (doc, chunk_idx) with the chunk text and its sentence count; a
    downstream embedding pass consumes it as-is.

    Sentence boundary is the deterministic ``'. '`` split (both engines
    RE2-safe; no lookbehind), so the oracle reproduces chunking
    exactly."""
    s = F.split(F.col(text_col), r"\. ")
    n = F.size(s)
    starts = F.sequence(F.lit(1), n, F.lit(stride))
    win = F.transform(
        starts,
        lambda i: F.struct(
            F.array_join(F.slice(s, i, size), ". ").alias("chunk_text"),
            F.least(F.lit(size), n - i + 1)
            .cast("int")
            .alias("n_sentences"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(win).alias("chunk_idx", "c")
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_sentences").alias("n_sentences"),
    )
