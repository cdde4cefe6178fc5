"""Corpus-level operators for training-data pipelines: vocabulary building,
deterministic dataset splits, and benchmark decontamination.

Each is Spark-first and scale-shaped:

- vocab:          explode distinct tokens per doc -> ONE groupBy shuffle with
                  map-side combine -> TakeOrderedAndProject (no global sort)
- split_assign:   pure projection (hash mod buckets) — reproducible
                  train/val/test membership with NO sampling state, stable
                  under corpus growth (a doc's split never changes)
- contamination:  benchmark n-gram set is SMALL -> broadcast hash join
                  against the exploded corpus shingles; the corpus is never
                  shuffled, the benchmark never collected per-row
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dcp_kafka_spark.functions.dedup_text import _word_shingles
from go_dcp_kafka_spark.functions.hashing import md5_hash60
from go_dcp_kafka_spark.functions.textstats import WS_TOKEN_RE


def vocab_topk(docs: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Top-k tokens by DOCUMENT frequency (each doc votes once per distinct
    token — the vocabulary/BPE-seed statistic, robust to one doc repeating a
    word 10^6 times). One shuffle (partial counts map-side), then a
    driver-side top-k merge. Ties break lexicographically for determinism."""
    words = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WS_TOKEN_RE), 0)
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.col("word"))
        .limit(k)
    )


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: split = f(md5(salt#id)).
    A pure projection — no sampling state, no shuffle; membership is
    reproducible across runs/clusters and STABLE under corpus growth (new
    docs never move old docs between splits, unlike fraction-based
    `randomSplit`). ``salt`` versions the split so a pipeline can cut a
    fresh one without touching the old."""
    h = F.pmod(md5_hash60(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))), F.lit(100))
    split = (
        F.when(h < train_pct, F.lit("train"))
        .when(h < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(F.col(id_col), split.alias("split"))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    shingle_words: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 1 ``shingle_words``-
    gram with ANY benchmark doc (the n-gram-overlap test training pipelines
    run before a release). Returns (doc_id, n_hits = distinct contaminated
    shingles) for contaminated non-benchmark docs.

    Scale shape: the benchmark side is small by definition -> its distinct
    shingle hashes broadcast; the corpus explodes shingles ONCE and
    broadcast-joins — the corpus is never shuffled by the join (only the
    final per-doc count aggregates, map-side combined)."""
    bench_sh = (
        benchmark.select(
            F.explode(F.array_distinct(_word_shingles(text_col, shingle_words))).alias("sh")
        )
        .select(md5_hash60(F.col("sh")).alias("sh_h"))
        .distinct()
    )
    bench_ids = benchmark.select(F.col(id_col)).distinct()
    corpus_sh = (
        docs.join(F.broadcast(bench_ids), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(_word_shingles(text_col, shingle_words))).alias("sh"),
        )
        .select(id_col, md5_hash60(F.col("sh")).alias("sh_h"))
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
