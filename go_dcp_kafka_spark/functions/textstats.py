"""Text-analysis operators for training-data pipelines: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

All pure Column expressions — JVM-side, whole-stage codegen, no Python in
the hot path — and each has an exact DuckDB-SQL twin used as the
correctness oracle (see __spark_entry__.py).

At 100 TB these run as a single scan + projection over the documents table:
no shuffle, no UDF serialization, filters push down beneath them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_dcp_kafka_spark.functions.hashing import h31

#: whitespace tokens
WS_TOKEN_RE = r"[^\s]+"
#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")


def token_count_ws(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(WS_TOKEN_RE), 0))


def token_count_bpe(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def stopword_ratio(text: Column) -> Column:
    words = F.regexp_extract_all(F.lower(text), F.lit(WS_TOKEN_RE), 0)
    n_stop = F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in _STOPWORDS])))
    # intersect is set-based: count occurrences instead for a true ratio
    n_stop_occ = F.size(F.filter(words, lambda w: w.isin(list(_STOPWORDS))))
    _ = n_stop
    return F.when(F.size(words) > 0, n_stop_occ / F.size(words)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    words = F.regexp_extract_all(text, F.lit(WS_TOKEN_RE), 0)
    return F.when(
        F.size(words) > 0,
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double") / F.size(words),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: long enough, not punctuation
    soup, has function words, sane word lengths. Deterministic arithmetic —
    rounded to 6 dp so engine/oracle float formatting agrees."""
    len_score = F.least(F.length(text) / F.lit(400.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(text) * 4.0, F.lit(0.0))
    wl = mean_word_len(text)
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score * 0.3 + stop_score * 0.3 + punct_pen * 0.2 + wl_score * 0.2), 6)


def lang_id(text: Column) -> Column:
    """N-gram/function-word language heuristic: classify as 'en' when
    English function words dominate, else 'other'. (The synthetic corpus is
    English-ish filler; the operator shape — vectorized feature extraction +
    threshold — is what scales to a real fastText-style classifier as a
    pandas UDF.)"""
    return F.when(stopword_ratio(text) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def doc_fingerprint(text: Column, shingle_words: int = 8) -> Column:
    """Winnowing-style fingerprint: minimum 31-bit hash over word 8-gram
    shingles (falls back to whole-text hash for short docs). Equal
    fingerprints => near-identical prefixes/content blocks."""
    words = F.regexp_extract_all(F.lower(text), F.lit(WS_TOKEN_RE), 0)
    n = F.size(words)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (shingle_words - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, shingle_words)),
    )
    return F.array_min(F.transform(shingles, h31))


def text_profile(docs: DataFrame, text_col: str = "text", shingle_words: int = 8) -> DataFrame:
    """One-scan profile of a documents table (the composite operator).

    r7: computed by the Arrow-batched native kernel
    (np_exact.text_profile_np), pinned bit-equal to the JVM staged-
    projection twin below by tests/test_np_exact.py — the regex/ratio/
    fingerprint chain ran partly through interpreted higher-order
    functions and the md5 fingerprint dominated. Still one scan, no
    shuffle; only (doc_id, text) crosses the Python boundary."""
    from go_dcp_kafka_spark.functions.np_exact import text_profile_np

    return text_profile_np(docs, text_col, shingle_words)


def text_profile_jvm(docs: DataFrame, text_col: str = "text", shingle_words: int = 8) -> DataFrame:
    """Pure-JVM twin of :func:`text_profile` — the reference implementation
    the kernel is pinned against.

    Built as STAGED projections so each ingredient (the tokenized words
    array, each ratio) is computed exactly once: naively composing the
    standalone functions above inlines regexp_extract_all ~20x per row into
    one giant expression tree, which blows past the whole-stage-codegen
    method budget and falls back to interpreted evaluation (~30x slower).
    Catalyst collapses the staged projects into a single codegen'd stage —
    still one scan, no shuffle."""
    t = F.col(text_col)
    s1 = docs.select(
        "doc_id",
        t.alias("_t"),
        F.regexp_extract_all(F.lower(t), F.lit(WS_TOKEN_RE), 0).alias("_w"),
    )
    nw = F.size("_w")
    n_stop = F.size(F.filter("_w", lambda w: w.isin(list(_STOPWORDS))))
    s2 = s1.select(
        "doc_id",
        "_t",
        "_w",
        nw.alias("n_tokens_ws"),
        F.size(F.regexp_extract_all("_t", F.lit(BPE_TOKEN_RE), 0)).alias("n_tokens_bpe"),
        F.when(nw > 0, n_stop / nw).otherwise(F.lit(0.0)).alias("_stop"),
        F.when(
            F.length("_t") > 0,
            F.size(F.regexp_extract_all("_t", F.lit(r"[^\w\s]"), 0)) / F.length("_t"),
        )
        .otherwise(F.lit(0.0))
        .alias("_punct"),
        F.when(
            nw > 0,
            F.aggregate("_w", F.lit(0), lambda acc, w: acc + F.length(w)).cast("double") / nw,
        )
        .otherwise(F.lit(0.0))
        .alias("_wl"),
    )
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_w") - (shingle_words - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice("_w", i, shingle_words)),
    )
    quality = (
        F.least(F.length("_t") / F.lit(400.0), F.lit(1.0)) * 0.3
        + F.least(F.col("_stop") * 5.0, F.lit(1.0)) * 0.3
        + F.greatest(F.lit(1.0) - F.col("_punct") * 4.0, F.lit(0.0)) * 0.2
        + F.when((F.col("_wl") >= 3.0) & (F.col("_wl") <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5)) * 0.2
    )
    return s2.select(
        "doc_id",
        "n_tokens_ws",
        "n_tokens_bpe",
        F.round("_stop", 6).alias("stopword_ratio"),
        F.round("_punct", 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
        F.when(F.col("_stop") >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
        F.array_min(F.transform(shingles, h31)).alias("fingerprint"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text", gram_words: int = 2) -> DataFrame:
    """Gopher-style repetition metrics per doc: the fraction of duplicate
    word n-grams and the fraction claimed by the single most frequent one —
    the standard filters for loopy/boilerplate text in pretraining corpora
    (Rae et al. 2021, 'Scaling Language Models', repetition heuristics).

    r7: computed by the Arrow-batched native kernel
    (np_exact.repetition_stats_np), pinned bit-equal to the JVM twin below
    (the sorted-array run-length fold ran interpreted). Still zero
    shuffles.
    """
    from go_dcp_kafka_spark.functions.np_exact import repetition_stats_np

    return repetition_stats_np(docs, text_col, gram_words)


def repetition_stats_jvm(docs: DataFrame, text_col: str = "text", gram_words: int = 2) -> DataFrame:
    """Pure-JVM twin of :func:`repetition_stats` — the reference
    implementation the kernel is pinned against.

    Scale shape: ZERO shuffles. The n-gram array never explodes into rows —
    duplicate fraction comes from ``array_distinct`` and the top-gram count
    from a run-length fold over the SORTED array (``array_sort`` +
    ``F.aggregate``), all inside one JVM projection. Per row O(n log n),
    corpus-wide a pure scan; the DuckDB oracle computes the same values the
    relational way (explode + groupBy) to keep the twin independent.
    """
    from go_dcp_kafka_spark.functions.dedup_text import _word_shingles

    sh = _word_shingles(text_col, gram_words)
    s1 = docs.select("doc_id", F.array_sort(sh).alias("_g"))
    total = F.size("_g").cast("long")
    distinct = F.size(F.array_distinct("_g")).cast("long")
    # longest run of equal adjacent elements == max multiplicity (sorted)
    run_best = F.aggregate(
        "_g",
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    ).cast("long")
    # a doc shorter than gram_words has zero n-grams: both fractions are
    # DEFINED as 0.0 (not null — a 0/0 null silently passes any downstream
    # "frac < threshold" quality filter; ADVICE r3), and the doc stays in
    # the output. Oracle SQL mirrors both choices.
    return s1.select(
        "doc_id",
        total.alias("n_grams"),
        F.when(total == 0, F.lit(0.0))
        .otherwise(F.round((total - distinct) / total.cast("double"), 6))
        .alias("dup_gram_frac"),
        F.when(total == 0, F.lit(0.0))
        .otherwise(F.round(run_best / total.cast("double"), 6))
        .alias("top_gram_frac"),
    )
