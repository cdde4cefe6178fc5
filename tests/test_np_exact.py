"""Pin: the Arrow-batched native kernels are BIT-EQUAL to their JVM
expression twins — the contract that lets the hot projections run in
native code without touching any oracle-checked value."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dcp_kafka_spark.functions.dedup_text import (
    minhash_signatures,
    minhash_signatures_jvm,
)


@pytest.fixture(scope="module")
def spark():
    from go_dcp_kafka_spark.session import get_spark

    s = get_spark("test-np-exact", master="local[4]", shuffle_partitions=4)
    yield s


ADVERSARIAL = [
    (1, "plain ascii words repeated words words"),
    (2, ""),                      # empty text -> single "" shingle
    (3, None),                    # null text -> same single "" shingle
    (4, "one two"),               # below shingle width -> whole-text shingle
    (5, "UPPER Case MiXeD"),
    (6, "nb space is not java whitespace"),  # \xa0: Python-\s-only ws
    (7, "tabs\tand\nnewlines\x0bvt\x0cff\rcr split"),
    (8, "punct,.;!? 123 42x *** __ []"),
    (9, "a " * 300),              # long repetitive doc
]


def _cmp(a_df, b_df):
    a = {r["doc_id"]: tuple(r[c] for c in a_df.columns if c != "doc_id") for r in a_df.collect()}
    b = {r["doc_id"]: tuple(r[c] for c in b_df.columns if c != "doc_id") for r in b_df.collect()}
    assert a == b


@pytest.mark.parametrize("num_hashes,shingle_words", [(4, 3), (16, 3), (16, 8)])
def test_minhash_kernel_equals_jvm_adversarial(spark, num_hashes, shingle_words):
    docs = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    _cmp(
        minhash_signatures(docs, "text", num_hashes, shingle_words),
        minhash_signatures_jvm(docs, "text", num_hashes, shingle_words),
    )


def test_minhash_kernel_equals_jvm_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    _cmp(
        minhash_signatures(docs, "text", 16, 3),
        minhash_signatures_jvm(docs, "text", 16, 3),
    )


def test_minhash_kernel_string_doc_ids(spark):
    docs = spark.createDataFrame(
        [("a#1", "some text here for shingling"), ("b#2", "other text entirely")],
        "doc_id string, text string",
    )
    out = minhash_signatures(docs, "text", 4, 3)
    ref = minhash_signatures_jvm(docs, "text", 4, 3)
    assert out.schema == ref.schema
    _cmp(out, ref)


def test_minhash_kernel_is_shuffle_free(spark):
    docs = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    plan = minhash_signatures(docs, "text", 4, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_text_profile_kernel_equals_jvm(spark):
    from go_dcp_kafka_spark.functions.textstats import text_profile, text_profile_jvm

    adv = [(i + 10_000_000, t) for i, t in ADVERSARIAL]
    docs = spark.createDataFrame(adv, "doc_id long, text string").unionByName(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select("doc_id", "text")
    )
    _cmp(text_profile(docs), text_profile_jvm(docs))
    assert [(f.name, f.dataType) for f in text_profile(docs).schema.fields] == [
        (f.name, f.dataType) for f in text_profile_jvm(docs).schema.fields
    ]


def test_repetition_kernel_equals_jvm(spark):
    from go_dcp_kafka_spark.functions.textstats import (
        repetition_stats,
        repetition_stats_jvm,
    )

    adv = [(i + 10_000_000, t) for i, t in ADVERSARIAL]
    docs = spark.createDataFrame(adv, "doc_id long, text string").unionByName(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select("doc_id", "text")
    )
    _cmp(repetition_stats(docs), repetition_stats_jvm(docs))
    assert [(f.name, f.dataType) for f in repetition_stats(docs).schema.fields] == [
        (f.name, f.dataType) for f in repetition_stats_jvm(docs).schema.fields
    ]


def test_simhash_kernel_equals_jvm(spark):
    from go_dcp_kafka_spark.functions.dedup_text import simhash, simhash_jvm

    adv = [(i + 10_000_000, t) for i, t in ADVERSARIAL]
    docs = spark.createDataFrame(adv, "doc_id long, text string").unionByName(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select("doc_id", "text")
    )
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_jvm(docs).collect()}
    assert a == b
    # empty/null text absent, like the JVM explode
    assert 10_000_002 not in a and 10_000_003 not in a


def test_shingle_hash_kernel_equals_jvm(spark):
    from go_dcp_kafka_spark.functions.dedup_text import _word_shingles
    from go_dcp_kafka_spark.functions.hashing import md5_hash60
    from go_dcp_kafka_spark.functions.np_exact import shingle_hashes_np

    docs = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string").unionByName(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select("doc_id", "text")
    )
    jvm = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_word_shingles("text", 8))).alias("sh"),
    ).select("doc_id", md5_hash60(F.col("sh")).alias("sh_h"))
    a = {(r["doc_id"], r["sh_h"]) for r in shingle_hashes_np(docs, "text", 8).collect()}
    b = {(r["doc_id"], r["sh_h"]) for r in jvm.collect()}
    assert a == b


@pytest.mark.parametrize("k", [4, 16])
def test_ivf_assign_kernel_equals_jvm(spark, k):
    from go_dcp_kafka_spark.functions.np_exact import with_ivf_cell_np
    from go_dcp_kafka_spark.functions.similarity import with_ivf_cell

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    a = {r["vec_id"]: r["cell"] for r in with_ivf_cell_np(emb, cents).collect()}
    b = {r["vec_id"]: r["cell"] for r in with_ivf_cell(emb, cents).collect()}
    assert a == b


def test_ivf_assign_kernel_zero_norm_vector(spark):
    from go_dcp_kafka_spark.functions.np_exact import with_ivf_cell_np
    from go_dcp_kafka_spark.functions.similarity import with_ivf_cell

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [-1.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, ce array<double>"
    )
    a = {r["vec_id"]: r["cell"] for r in with_ivf_cell_np(emb, cents).collect()}
    b = {r["vec_id"]: r["cell"] for r in with_ivf_cell(emb, cents).collect()}
    assert a == b and a[1] is None


def test_cosine_pair_kernel_equals_jvm(spark):
    from go_dcp_kafka_spark.functions.dedup_text import (
        embedding_near_duplicates,
        embedding_near_duplicates_jvm,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    for thr in (0.2, 0.95):
        a = {
            (r["a_id"], r["b_id"], r["cosine"])
            for r in embedding_near_duplicates(emb, threshold=thr).collect()
        }
        b = {
            (r["a_id"], r["b_id"], r["cosine"])
            for r in embedding_near_duplicates_jvm(emb, threshold=thr).collect()
        }
        assert a == b
