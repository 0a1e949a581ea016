"""Text-analysis building blocks: tokenization, shingling, language ID,
quality scoring, fingerprinting. Pure Column expressions (JVM-side,
whole-stage codegen) — no Python in the hot path."""

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

    Spark shape: char codes explode to (doc, pos, code) rows ONCE; the
    k-gram hash is assembled from window ``lead``s over the SAME doc
    partition the winnow minimum then reuses — one shuffle total, all
    whole-stage codegen, no nested higher-order-function recompute (a
    naive transform-of-transforms measured 9.5s at sf0.1; this runs ~3s).
    The mod is applied once at the end: mod is a ring homomorphism for
    + and *, and 7*31^k + sum(code*31^j) < 2^63, so the residue equals the
    oracle's per-step fold. Returns distinct (doc, fingerprint) rows."""
    from pyspark.sql.window import Window as _W

    text = F.col(text_col)
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text), F.lit(1))),
        lambda i: F.ascii(text.substr(i, F.lit(1))),
    )
    g = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(codes).alias("pos", "c"),
    )
    order = _W.partitionBy("doc").orderBy("pos")
    h = F.lit(7).cast("long")
    for j in range(k):
        nxt = F.col("c") if j == 0 else F.lead("c", j).over(order)
        h = h * 31 + nxt
    g = g.withColumn("h", h % 1_000_003)  # null when fewer than k chars remain
    frame = order.rowsBetween(0, w - 1)
    whole = _W.partitionBy("doc")
    return (
        g.filter(F.col("h").isNotNull())
        .withColumn("fp", F.min("h").over(frame))
        .withColumn("m", F.max("pos").over(whole))
        # a window must be full (w grams) except when the doc has fewer
        # than w grams, where the single whole-doc window stands
        .filter((F.col("pos") <= F.col("m") - (w - 1)) | (F.col("pos") == 0))
        .select("doc", F.col("fp").alias("fingerprint"))
        .distinct()
    )


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
    mean_token_len = (n_chars - n_tokens + 1).cast("double") / n_tokens
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": n_punct.cast("double") / n_chars,
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "mean_token_len": mean_token_len,
    }
