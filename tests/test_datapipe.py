"""Training-data pipeline operators over the driver testdata tables."""

import pytest
from pyspark.sql import functions as F

from go_dcp_kafka_spark.functions.dedup_text import (
    embedding_near_duplicates,
    exact_duplicates,
    jaccard_verify_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    simhash,
)
from go_dcp_kafka_spark.functions.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)
from go_dcp_kafka_spark.functions.similarity import ann_lsh_topk, cosine_topk
from go_dcp_kafka_spark.functions.textstats import text_profile

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_text_profile(docs):
    prof = text_profile(docs).toPandas()
    assert len(prof) == docs.count()
    assert (prof["n_tokens_ws"] >= 0).all()
    assert prof["quality"].between(0, 1).all()
    assert set(prof["lang_pred"]) <= {"en", "other"}
    assert prof["fingerprint"].notna().all()


def test_minhash_pipeline(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=16)
    pdf = sigs.toPandas()
    assert len(pdf) == docs.count()
    # identical texts must share full signatures
    pairs = minhash_near_duplicates(docs, num_hashes=16, bands=4)
    verified = jaccard_verify_pairs(docs, pairs, threshold=0.9).toPandas()
    # exact duplicate texts (generator emits some) must survive verification
    dups = exact_duplicates(docs).toPandas()
    if len(dups) > 0:
        assert len(verified) > 0


def test_minhash_no_shuffle_for_signatures(docs):
    plan = minhash_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"signature computation must be a pure projection:\n{plan[:2000]}"


def test_simhash_close_for_identical(spark, docs):
    sh = simhash(docs).join(docs.select("doc_id", "text"), "doc_id")
    pdf = sh.toPandas()
    by_text = pdf.groupby("text")["simhash"].nunique()
    assert (by_text == 1).all(), "identical text => identical simhash"


def test_cosine_topk_and_ann(spark, embs):
    qvec = embs.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    exact = cosine_topk(embs, qvec, k=10).toPandas()
    assert exact.iloc[0]["vec_id"] == 0 and abs(exact.iloc[0]["cosine"] - 1.0) < 1e-5
    approx = ann_lsh_topk(embs, qvec, k=10).toPandas()
    # the query's own vector is always in its own bucket
    assert 0 in set(approx["vec_id"])
    # ANN results are a subset of the bucket, all real cosines
    assert approx["cosine"].between(-1.001, 1.001).all()


def test_ivf_recall_invariants(spark, embs):
    """IVF recall grows with nprobe, and probing every cell degenerates to
    the exact brute-force scan (the recall/cost knob a deployment tunes)."""
    from go_dcp_kafka_spark.functions.similarity import ivf_topk

    qvec = embs.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    exact = {r["vec_id"] for r in cosine_topk(embs, qvec, k=10).collect()}
    got1 = {r["vec_id"] for r in ivf_topk(embs, qvec, k=10, n_centroids=16, nprobe=1).collect()}
    got4 = {r["vec_id"] for r in ivf_topk(embs, qvec, k=10, n_centroids=16, nprobe=4).collect()}
    got_all = {r["vec_id"] for r in ivf_topk(embs, qvec, k=10, n_centroids=16, nprobe=16).collect()}
    assert got_all == exact, "nprobe=K must equal the exact scan"
    assert len(got4 & exact) >= len(got1 & exact), "recall must not drop as nprobe grows"
    assert 0 in got1, "the query's own vector lives in its own cell"


def test_embedding_near_duplicates(spark, embs):
    nd = embedding_near_duplicates(embs, threshold=0.8).toPandas()
    assert (nd["a_id"] < nd["b_id"]).all()


def test_auto_lsh_scale_params():
    from go_dcp_kafka_spark.functions.dedup_text import auto_lsh_params, auto_sign_dims

    # sign width grows with corpus size so buckets stay bounded
    assert auto_sign_dims(1_000) == 8
    assert auto_sign_dims(10**10) >= 20
    # expected population at the derived width stays near the target
    n = 10**10
    assert n / 2 ** auto_sign_dims(n) <= 4096
    b, r = auto_lsh_params(10**9)
    assert b >= 2 and r > auto_lsh_params(10**3)[1]


def test_band_bucket_cap(spark, docs):
    """A pathological wide bucket (here: forced via constant text) must be
    excluded from the candidate join by cap_band_buckets."""
    from go_dcp_kafka_spark.functions.dedup_text import cap_band_buckets, minhash_band_buckets

    same = docs.limit(80).withColumn("text", F.lit("identical boilerplate text"))
    bk = minhash_band_buckets(minhash_signatures(same, num_hashes=16), bands=4, rows_per_band=4)
    capped = cap_band_buckets(bk, max_bucket_width=64)
    assert capped.count() == 0  # all 80 docs share every band bucket -> dropped
    # and no candidate pairs escape
    pairs = minhash_near_duplicates(same, num_hashes=16, bands=4, max_bucket_width=64)
    assert pairs.count() == 0
    # with the cap lifted the same corpus floods quadratically
    flood = minhash_near_duplicates(same, num_hashes=16, bands=4, max_bucket_width=None)
    assert flood.count() == 80 * 79 // 2


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media, use_fake=True).toPandas()
    assert len(feats) == 30
    assert feats["feature"].map(len).eq(8).all()
    frames = sample_frames(media, use_fake=True).toPandas()
    assert len(frames) > 0 and (frames["frame_idx"] >= 0).all()
    # real decode path is explicitly stubbed
    with pytest.raises(Exception) as ei:
        extract_features(media, use_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_duplicate_clusters_label_propagation(spark):
    """Connected components via min-label propagation: chains need multiple
    rounds (propagation distance > 1), components get min-id labels, and
    every doc in a pair appears exactly once."""
    from go_dcp_kafka_spark.functions.dedup_text import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (23, 22), (21, 22), (20, 21)], ["a_id", "b_id"]
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_corpus_ops_shapes_and_invariants(spark):
    """Corpus operators: split assignment is a stable pure projection,
    vocab top-k avoids a global sort, contamination broadcasts the
    benchmark side and never shuffles the corpus for the join."""
    from pyspark.sql import functions as F

    from go_dcp_kafka_spark.functions.corpus import (
        contamination_check,
        split_assign,
        vocab_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    # split: deterministic + stable (two runs identical), all splits present
    a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    assert a == b and set(a.values()) == {"train", "val", "test"}
    # roughly 80/10/10 (wide tolerance at sf0.001's 50 docs)
    n = len(a)
    assert sum(1 for s in a.values() if s == "train") / n > 0.5
    # a different salt produces a different (but stable) split
    c = {r["doc_id"]: r["split"] for r in split_assign(docs, salt="v2").collect()}
    assert c != a

    plan = vocab_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    bench = docs.filter(F.col("doc_id") < 5)
    cont = contamination_check(docs, bench, shingle_words=3)
    plan = cont._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # exchanges are bounded and none carries corpus volume: 1 for each
    # benchmark-side distinct (K docs) + 1 for the final per-doc count.
    # The corpus itself flows scan -> anti-join (broadcast) -> explode ->
    # broadcast probe with no shuffle before the count.
    assert plan.count("Exchange hashpartitioning") <= 3
    # benchmark docs themselves are excluded from the report
    assert cont.filter(F.col("doc_id") < 5).count() == 0


def test_pii_mask_semantics(spark):
    """Each pattern class masks; counts reflect masked spans; clean text
    passes through untouched; the whole op is a no-shuffle projection."""
    from go_dcp_kafka_spark.functions.corpus import pii_mask

    rows = [
        (0, "reach me at bob.smith+x@corp.example.org thanks"),
        (1, "ssn 123-45-6789 phone 555-123-4567 and 555.987.6543"),
        (2, "server at 192.168.1.254 port 8080"),
        (3, "no pii here, just 2048 tokens and v1.2 notes"),
    ]
    out = {
        r["doc_id"]: r
        for r in pii_mask(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0]["masked"] == "reach me at [EMAIL] thanks" and out[0]["n_pii"] == 1
    assert out[1]["masked"] == "ssn [SSN] phone [PHONE] and [PHONE]"
    assert out[1]["n_pii"] == 3
    assert out[2]["masked"] == "server at [IP] port 8080" and out[2]["n_pii"] == 1
    assert out[3]["masked"] == rows[3][1] and out[3]["n_pii"] == 0
    # pure projection: no exchange in the plan
    plan = (
        pii_mask(spark.createDataFrame(rows, ["doc_id", "text"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_prefix_sum(spark):
    """Offsets are the exclusive prefix sum in doc_id order — contiguous,
    gapless, window math exact — and the data-scale side never collapses to
    a single-partition window (the RangePartitioning carries the order)."""
    from go_dcp_kafka_spark.functions.corpus import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = (
        pack_sequences(docs, window_tokens=64, num_parts=8)
        .orderBy("doc_id")
        .collect()
    )
    off = 0
    for r in out:
        assert r["global_off"] == off, (r, off)
        assert r["window_id"] == off // 64
        assert r["offset_in_window"] == off % 64
        off += r["n_tokens"]
    # plan shape: the data-scale window is PARTITIONED (parallel, hashed by
    # _pid); the only single-partition exchange is the P-row bases frame.
    # (The range exchange itself is materialized by localCheckpoint, so it
    # does not appear in this downstream plan string.)
    plan = (
        pack_sequences(docs, window_tokens=64, num_parts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "hashpartitioning(_pid" in plan
    assert plan.count("singlepartition") <= 2


def test_sessionize_gap_semantics(spark):
    """Session boundaries open strictly on gap > threshold, per key;
    stats aggregate per (key, session)."""
    import datetime as dt

    from go_dcp_kafka_spark.operators.sessionize import session_stats, sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events in one session, then a 2h gap -> new session
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=10)),
        (3, 1, t0 + dt.timedelta(minutes=20)),
        (4, 1, t0 + dt.timedelta(hours=2, minutes=21)),
        # user 2: single event
        (5, 2, t0),
        # user 3: gap EXACTLY at threshold stays in-session (strict >)
        (6, 3, t0),
        (7, 3, t0 + dt.timedelta(seconds=1800)),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0, 6: 0, 7: 0}
    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(ev, gap_seconds=1800).collect()
    }
    assert stats[(1, 0)] == (3, 1200) and stats[(1, 1)] == (1, 0)
    assert stats[(2, 0)] == (1, 0)
    assert stats[(3, 0)] == (2, 1800)


def test_repetition_stats_semantics(spark):
    """Duplicate-gram and top-gram fractions with exact values on known
    inputs; the op is a single shuffle-free projection."""
    from go_dcp_kafka_spark.functions.textstats import repetition_stats

    rows = [
        (0, "a b a b a b"),   # bigrams: [a b, b a, a b, b a, a b]
        (1, "x y z w"),       # all distinct
        (2, "q"),             # short-doc fallback: one 1-word gram
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0]["n_grams"] == 5
    assert out[0]["dup_gram_frac"] == 0.6 and out[0]["top_gram_frac"] == 0.6
    assert out[1]["dup_gram_frac"] == 0.0 and out[1]["top_gram_frac"] == 0.333333
    assert out[2]["n_grams"] == 1 and out[2]["top_gram_frac"] == 1.0
    plan = (
        repetition_stats(spark.createDataFrame(rows, ["doc_id", "text"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_repetition_stats_short_docs_agree_with_oracle(spark, tmp_path):
    """Short/empty docs must neither vanish from the oracle nor go null in
    the engine (ADVICE r3): run BOTH twins over a corpus that includes
    empty, whitespace-only, and single-word docs and compare every value."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as e
    from go_dcp_kafka_spark.functions.textstats import repetition_stats

    rows = [(0, ""), (1, "   "), (2, "a b a b"), (3, "q"), (4, "x y z")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (
        repetition_stats(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.execute(e.oracle_sql()["doc_repetition"]).df().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(exp) == 5, "a twin dropped short docs"
    assert not got.isna().any().any() and not exp.isna().any().any()
    for c in ["n_grams", "dup_gram_frac", "top_gram_frac"]:
        assert (got[c].astype(float).round(6) == exp[c].astype(float).round(6)).all(), c


def test_duplicate_clusters_warns_when_unconverged(spark):
    """A component whose diameter exceeds max_iter must WARN instead of
    silently returning split labels (ADVICE r3)."""
    import warnings

    from go_dcp_kafka_spark.functions.dedup_text import duplicate_clusters

    chain = [(i, i + 1) for i in range(8)]  # diameter 8
    pairs = spark.createDataFrame(chain, ["a_id", "b_id"])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        duplicate_clusters(pairs, max_iter=2).collect()
    assert any("did not converge" in str(w.message) for w in rec)
    # and with enough rounds: no warning, one cluster
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert not any("did not converge" in str(w.message) for w in rec2)
    assert set(got.values()) == {0}


def test_kmeans_trained_ivf_recall_and_objective(spark, tmp_path):
    """k-means training must (a) keep K centroids and partition the corpus,
    (b) not worsen the mean best-cosine objective vs the untrained init,
    and (c) give a materialized trained index whose nprobe=2 search recalls
    most of the exact top-10 (recall-vs-exact assertion, r3 verdict 5)."""
    from pyspark.sql import functions as F

    from go_dcp_kafka_spark.functions.similarity import (
        cosine_topk,
        ivf_topk_materialized,
        kmeans_train,
        materialize_ivf,
        with_ivf_cell,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    init = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("long").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ce"),
    )
    trained = kmeans_train(emb, k=8, n_iter=2)
    assert trained.count() == 8

    def objective(cents):
        from go_dcp_kafka_spark.functions.similarity import cosine_expr

        a = with_ivf_cell(emb.select("vec_id", "embedding"), cents)
        joined = a.join(cents.select(F.col("cid").alias("cell"), "ce"), "cell")
        return joined.agg(F.avg(cosine_expr("embedding", "ce"))).collect()[0][0]

    assigned = with_ivf_cell(emb.select("vec_id", "embedding"), trained)
    assert assigned.count() == n  # every vector lands in exactly one cell
    assert objective(trained) >= objective(init) - 1e-9

    path = str(tmp_path / "ivf_km")
    materialize_ivf(emb, trained, path)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
    approx = {
        r["vec_id"] for r in ivf_topk_materialized(spark, path, qv, k=10, nprobe=2).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"trained-IVF nprobe=2 recall {recall} < 0.5"


def test_assemble_conversations_order_and_nulls(spark):
    """Turns assemble in turn_idx order regardless of input order; null
    text renders as an empty segment; one row per conversation."""
    from go_dcp_kafka_spark.functions.transcripts import assemble_conversations

    rows = [
        ("c1", 2, "assistant", "hi there"),
        ("c1", 1, "user", "hello"),
        ("c1", 3, "user", None),
        ("c2", 1, "user", "solo"),
    ]
    got = {
        r["conv_id"]: r
        for r in assemble_conversations(
            spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
        ).collect()
    }
    assert got["c1"]["n_turns"] == 3
    assert got["c1"]["doc_text"] == "user: hello\nassistant: hi there\nuser: "
    assert got["c2"]["doc_text"] == "user: solo"


def test_sft_pairs_adjacency(spark):
    """Only user turns IMMEDIATELY followed by an assistant turn pair up;
    tool interruptions and trailing user turns drop."""
    from go_dcp_kafka_spark.functions.transcripts import sft_pairs

    rows = [
        ("c1", 1, "user", "q1"),
        ("c1", 2, "assistant", "a1"),
        ("c1", 3, "user", "q2"),
        ("c1", 4, "tool", "t"),       # interrupts: q2 has no pair
        ("c1", 5, "assistant", "a2"),
        ("c1", 6, "user", "dangling"),
        ("c2", 1, "user", "only q"),
        ("c2", 2, "assistant", "only a"),
    ]
    got = sorted(
        (r["conv_id"], r["prompt_turn"], r["response_turn"], r["prompt_text"], r["response_text"])
        for r in sft_pairs(
            spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
        ).collect()
    )
    assert got == [("c1", 1, 2, "q1", "a1"), ("c2", 1, 2, "only q", "only a")]


def test_sft_pairs_plan_is_single_key_exchange(spark):
    """The window must partition by conv_id: exactly one hash exchange, no
    global sort."""
    from go_dcp_kafka_spark.functions.transcripts import sft_pairs

    rows = [("c1", 1, "user", "q"), ("c1", 2, "assistant", "a")]
    df = sft_pairs(spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_dedup_segments_semantics(spark):
    """First global occurrence of a segment wins; later docs lose repeated
    boilerplate but keep their unique content; fully-duplicated docs come
    back empty."""
    from go_dcp_kafka_spark.functions.corpus import dedup_segments

    boiler = "subscribe to our newsletter now for more updates"  # exactly 8 words -> 1 segment
    rows = [
        (1, boiler + " unique alpha content here"),
        (2, boiler + " totally different beta text"),
        (3, boiler),
        (4, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_segments(
            spark.createDataFrame(rows, ["doc_id", "text"]), seg_words=8
        ).collect()
    }
    assert out[1]["n_kept"] == out[1]["n_segments"]  # first doc keeps everything
    assert "subscribe" in out[1]["clean_text"] and "alpha" in out[1]["clean_text"]
    # docs 2/3 lose the 8-word boilerplate segment (kept only in doc 1)
    assert "subscribe to our newsletter now for more updates" not in out[2]["clean_text"]
    assert "beta" in out[2]["clean_text"]
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""
    assert out[4]["n_segments"] == 0 and out[4]["clean_text"] == ""


def test_update_ivf_tracks_cdc_changes(spark, tmp_path):
    """Changelog-driven ANN maintenance (r4 verdict item 6): feeding
    SnapshotTable.read_changes into update_ivf must produce an index
    identical to a full materialize_ivf rebuild over the updated corpus,
    while touching only the affected cells' files."""
    import os
    import random

    from go_dcp_kafka_spark.functions.similarity import (
        ivf_topk_materialized,
        kmeans_train,
        materialize_ivf,
        update_ivf,
    )
    from go_dcp_kafka_spark.table.snapshot import SnapshotTable

    rng = random.Random(7)
    vecs = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)]) for i in range(300)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    t = SnapshotTable(spark, str(tmp_path / "emb"), ("vec_id",), num_buckets=8)
    t.overwrite(emb, epoch_id="b0")
    v1 = t.version()

    cents = kmeans_train(emb, k=6, n_iter=1)
    idx = str(tmp_path / "ivf")
    materialize_ivf(t.read(), cents, idx)
    pre_files = {
        d: sorted(os.listdir(os.path.join(idx, "corpus", d)))
        for d in os.listdir(os.path.join(idx, "corpus"))
        if d.startswith("cell=")
    }

    # CDC epoch: inserts (one of them ZERO-NORM -> null IVF cell, the r5
    # review crash case), one update, one delete
    ups = spark.createDataFrame(
        [(300, [0.9] * 8), (301, [0.0] * 8), (5, [-0.9] * 8)],
        "vec_id long, embedding array<double>",
    )
    t.merge_mor(ups, spark.createDataFrame([(17,)], "vec_id long"), epoch_id="e1", n_updates=4)

    res = update_ivf(spark, idx, t.read_changes(v1))
    assert res["affected_cells"], res

    # equivalence vs a full rebuild with the same centroids
    rebuilt = str(tmp_path / "ivf_full")
    materialize_ivf(t.read(), cents, rebuilt)
    inc = {(r["vec_id"], r["cell"]) for r in spark.read.parquet(os.path.join(idx, "corpus")).collect()}
    full = {(r["vec_id"], r["cell"]) for r in spark.read.parquet(os.path.join(rebuilt, "corpus")).collect()}
    assert inc == full and (300 in {i for i, _ in inc}) and (17 not in {i for i, _ in inc})

    # untouched cells' files are bit-identical (names unchanged)
    post_files = {
        d: sorted(os.listdir(os.path.join(idx, "corpus", d)))
        for d in os.listdir(os.path.join(idx, "corpus"))
        if d.startswith("cell=")
    }
    untouched = [d for d in pre_files if int(d.split("=")[1]) not in res["affected_cells"]]
    assert untouched, "test should leave some cells untouched"
    for d in untouched:
        assert post_files[d] == pre_files[d], f"{d} was rewritten"

    # searches over the incrementally-updated index match the rebuilt one
    q = [0.9] * 8
    a = [tuple(r) for r in ivf_topk_materialized(spark, idx, q, k=5, nprobe=2).collect()]
    b = [tuple(r) for r in ivf_topk_materialized(spark, rebuilt, q, k=5, nprobe=2).collect()]
    assert a == b and a[0][0] == 300  # the inserted vector is findable


def test_maintain_ivf_drift_retrain(spark, tmp_path):
    """r5 verdict item 6 — the ANN lifecycle closes (train -> maintain ->
    RETRAIN): update_ivf re-assigns changed vectors to FIXED centroids, so
    an epoch landing a NEW embedding region degrades the quantizer — the
    drifted cell's spread signal (refreshed by the update from exactly the
    rows it rewrites) crosses the threshold, maintain_ivf retrains
    kmeans + re-materializes, and nprobe=1 recall for a query in the new
    region recovers to exact. Below the threshold nothing fires and the
    quantizer files are untouched."""
    import os

    from go_dcp_kafka_spark.functions.similarity import (
        cosine_topk,
        ivf_topk_materialized,
        kmeans_train,
        maintain_ivf,
        materialize_ivf,
        update_ivf,
    )

    def vecs():
        rows = []
        for i in range(20):  # ids interleave clusters so kmeans seeds spread
            rows.append((i * 3 + 0, [1.0, 0.0, 0.001 * i, 0.0]))      # A
            rows.append((i * 3 + 1, [0.0, 1.0, 0.0, 0.001 * i]))      # B
            rows.append((i * 3 + 2, [0.0, 0.001 * i, 0.0, 1.0]))      # D
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    emb = vecs()
    trained = kmeans_train(emb, k=3, n_iter=3)
    path = str(tmp_path / "ivf")
    materialize_ivf(emb, trained, path)
    cent_files = sorted(os.listdir(os.path.join(path, "centroids")))
    cent_mtime = os.path.getmtime(os.path.join(path, "centroids"))

    # 1) small epoch, below threshold: no retrain, quantizer untouched
    small = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.05, 0.0], "update")],
        "vec_id long, embedding array<double>, _change string",
    )
    res = maintain_ivf(spark, path, small, retrain_threshold=0.2)
    assert res["retrained"] is False and res["drift_max"] < 0.2
    assert sorted(os.listdir(os.path.join(path, "centroids"))) == cent_files
    assert os.path.getmtime(os.path.join(path, "centroids")) == cent_mtime

    # the drifting epoch: 10 inserts in a NEW region C ~ [0.1, 0, 1, 0] —
    # they assign to A's old centroid (tiny positive x), blowing up cell
    # A's spread. Query q ~ [0, 0.1, 1, 0] truly matches the C vectors, but
    # its nearest OLD centroid is B's: nprobe=1 recall collapses until the
    # quantizer retrains.
    drift_rows = [
        (1000 + j, [0.1, 0.0, 1.0, 0.0008 * j], "insert") for j in range(10)
    ]
    drift = spark.createDataFrame(
        drift_rows, "vec_id long, embedding array<double>, _change string"
    )
    q = [0.0, 0.1, 1.0, 0.0]

    # 2) control copy maintained WITHOUT the knob: recall is demonstrably
    # broken after the drift epoch
    path2 = str(tmp_path / "ivf_nokob")
    materialize_ivf(vecs(), trained, path2)
    update_ivf(spark, path2, drift)
    all_vecs = vecs().unionByName(
        drift.select("vec_id", "embedding")
    ).join(small.select("vec_id"), "vec_id", "left_anti").unionByName(
        small.select("vec_id", "embedding")
    )
    truth = [r["vec_id"] for r in cosine_topk(vecs().unionByName(
        drift.select("vec_id", "embedding")), q, k=5).collect()]
    assert all(i >= 1000 for i in truth), "true neighbors must be the new region"
    pre = [r["vec_id"] for r in ivf_topk_materialized(spark, path2, q, k=5, nprobe=1).collect()]
    assert not set(pre) & set(truth), f"drifted quantizer should miss: {pre}"

    # 3) the knob fires on the same epoch: retrain + recall recovers exactly
    res = maintain_ivf(spark, path, drift, retrain_threshold=0.2)
    assert res["retrained"] is True and res["drift_max"] > 0.2
    post = [r["vec_id"] for r in ivf_topk_materialized(spark, path, q, k=5, nprobe=1).collect()]
    truth_with_small = [r["vec_id"] for r in cosine_topk(all_vecs, q, k=5).collect()]
    assert post == truth_with_small, (post, truth_with_small)

    # 4) retrain_every knob: unconditional schedule fires regardless of drift
    path3 = str(tmp_path / "ivf_every")
    materialize_ivf(vecs(), trained, path3)
    r1 = maintain_ivf(spark, path3, small, retrain_every=2)
    r2 = maintain_ivf(
        spark, path3,
        spark.createDataFrame([(3, [1.0, 0.0, 0.06, 0.0], "update")],
                              "vec_id long, embedding array<double>, _change string"),
        retrain_every=2,
    )
    assert r1["retrained"] is False and r2["retrained"] is True
