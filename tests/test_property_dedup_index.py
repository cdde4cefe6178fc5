"""Property-based equivalence for the maintained MinHash index: for ANY
sequence of CDC epochs (inserts, updates — including text-identical
rewrites — deletes, re-inserts of deleted ids, duplicate texts across
docs, empty epochs), folding them through ``update_minhash`` equals a
full ``materialize_minhash`` rebuild over the final corpus, every epoch
takes the exact (before-image) location path, and partitions the epoch
cannot touch are never rewritten.

The structured tests (test_dedup_index) cover designed scenarios;
hypothesis covers adversarial interleavings they wouldn't produce."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_dcp_kafka_spark.functions.dedup_index import (
    materialize_minhash,
    update_minhash,
)

_CHANGES_SCHEMA = "doc_id long, text string, _change string, _before struct<text:string>"
_VOCAB = [f"w{i}" for i in range(12)]


@st.composite
def epoch_sequences(draw):
    """2-5 epochs over a 8-doc id space; texts drawn from a tiny vocab so
    duplicate texts / identical rewrites / shared band keys are common."""
    n_epochs = draw(st.integers(2, 5))
    epochs = []
    for _ in range(n_epochs):
        n_ups = draw(st.integers(0, 4))
        # changes-feed contract: ONE row per key per epoch (read_changes is
        # a snapshot diff) — dedupe drawn upserts last-wins, like the IVM
        # property test honors merge's key-unique contract
        ups_by_key = {}
        for _ in range(n_ups):
            k = draw(st.integers(0, 7))
            words = draw(st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=8))
            ups_by_key[k] = " ".join(words)
        ups = sorted(ups_by_key.items())
        up_keys = {k for k, _ in ups}
        dels = [
            d
            for d in (draw(st.integers(0, 7)) for _ in range(draw(st.integers(0, 2))))
            if d not in up_keys
        ]
        epochs.append((ups, dels))
    return epochs


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(epochs=epoch_sequences())
def test_update_minhash_equals_rebuild_for_any_epoch_sequence(
    spark, tmp_path_factory, epochs
):
    tmp = tmp_path_factory.mktemp("mhprop")
    corpus = {i: f"base text w{i} w{(i + 1) % 12} w{(i + 2) % 12}" for i in range(6)}

    def corpus_df():
        return spark.createDataFrame(
            [(k, t) for k, t in sorted(corpus.items())], "doc_id long, text string"
        )

    idx = str(tmp / "mh")
    materialize_minhash(corpus_df(), idx, num_parts=8)

    for ups, dels in epochs:
        rows = []
        for k, text in ups:
            old = corpus.get(k)
            rows.append(
                (k, text, "update" if old is not None else "insert",
                 {"text": old} if old is not None else None)
            )
            corpus[k] = text
        for d in dels:
            old = corpus.pop(d, None)
            if old is None:
                continue  # read_changes never emits a delete of an absent key
            rows.append((d, None, "delete", {"text": old}))
        changes = spark.createDataFrame(rows, _CHANGES_SCHEMA)
        pre = {
            d: sorted(os.listdir(os.path.join(idx, "index", d)))
            for d in os.listdir(os.path.join(idx, "index"))
            if d.startswith("part=")
        }
        res = update_minhash(spark, idx, changes)
        assert res["exact_old_location"] is True
        post_dirs = {
            d for d in os.listdir(os.path.join(idx, "index")) if d.startswith("part=")
        }
        for d, files in pre.items():
            p = int(d.split("=")[1])
            if p not in res["affected_parts"]:
                assert d in post_dirs and sorted(
                    os.listdir(os.path.join(idx, "index", d))
                ) == files, f"untouched {d} was rewritten"

    rebuilt = str(tmp / "mh_full")
    if corpus:
        materialize_minhash(corpus_df(), rebuilt, num_parts=8)
        want = {
            tuple(r)
            for r in spark.read.parquet(os.path.join(rebuilt, "index")).collect()
        }
    else:
        want = set()
    got = (
        {tuple(r) for r in spark.read.parquet(os.path.join(idx, "index")).collect()}
        if any(d.startswith("part=") for d in os.listdir(os.path.join(idx, "index")))
        else set()
    )
    assert got == want
