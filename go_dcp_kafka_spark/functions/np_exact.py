"""Arrow-batched native kernels that are BIT-EQUAL to their JVM expression
twins (guide §4.2: let Spark do distribution and shuffles, hand whole
batches to native code inside ``mapInPandas``).

Why these exist: the md5-based MinHash signing pipeline is the single
hottest projection in the repo (16 permutations over ~200 shingles per
document), and Spark's higher-order functions (``transform``/``aggregate``)
are evaluated INTERPRETED, not whole-stage-codegen'd — the r7 profile
measured ~4 ms/doc for the JVM expression chain vs ~0.15 ms/doc here. The
kernel computes the exact same oracle-portable values:

- tokens: Java ``[^\\s]+`` over ``lower(text)`` — Java's ``\\s`` is the
  ASCII class ``[ \\t\\n\\x0b\\f\\r]`` (no UNICODE_CHARACTER_CLASS), so the
  Python regex spells the class out explicitly rather than using Python's
  Unicode-aware ``\\s``;
- shingles: ``concat_ws(' ', slice(words, i, k))`` for the n-k+1 windows,
  whole-text fallback below k words, ``""`` for empty/null text (the JVM
  ``when/otherwise`` chain produces the single empty shingle there);
- h31: first 15 hex chars of md5 → int64 → mod (2^31-1) — pure integer
  md5 arithmetic, no floating point anywhere, so bit-equality with the JVM
  needs no rounding-mode reasoning;
- signature: min over the distinct-shingle set of ``(a*h + b) mod p`` per
  permutation (min over a multiset equals min over its set — distinctness
  is harmless and saves md5 calls).

``tests/test_np_exact.py`` pins kernel ≡ JVM on the real corpus plus
adversarial texts (empty, null, unicode whitespace, short docs).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np

from go_dcp_kafka_spark.functions.hashing import MINHASH_PRIME, perm_params

#: Java-regex-equivalent tokenizer: [^\s]+ with Java's ASCII-only \s.
_JAVA_NONSPACE = re.compile(r"[^ \t\n\x0b\f\r]+")


def _shingle_set(text, k: int) -> set[str]:
    """The distinct word-k-gram set of one document — exact twin of
    ``array_distinct(_word_shingles(text, k))`` (dedup_text)."""
    words = _JAVA_NONSPACE.findall(text.lower()) if text is not None else []
    n = len(words)
    if n >= k:
        return {" ".join(words[i : i + k]) for i in range(n - k + 1)}
    return {" ".join(words)}


def _h31_array(shingles: list[str]) -> np.ndarray:
    """h31 per shingle: int64 of md5 hex[:15] mod (2^31-1)."""
    p = MINHASH_PRIME
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % p for s in shingles),
        dtype=np.int64,
        count=len(shingles),
    )


def minhash_signatures_np(
    docs,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_words: int = 3,
):
    """Drop-in replacement for the JVM ``minhash_signatures`` projection:
    (doc_id, mh_0..mh_{k-1}) via an Arrow-batched kernel. Only the two
    needed columns cross the Python boundary (guide §4.1); distribution,
    partitioning and everything downstream (banding, joins) stay JVM-side.
    """
    import pandas as pd

    perms = perm_params(num_hashes)
    a = np.array([x for x, _ in perms], dtype=np.int64)[:, None]
    b = np.array([y for _, y in perms], dtype=np.int64)[:, None]
    p = MINHASH_PRIME
    k = shingle_words
    id_type = docs.schema["doc_id"].dataType.simpleString()
    schema = ", ".join(
        [f"doc_id {id_type}"] + [f"mh_{i} long" for i in range(num_hashes)]
    )
    mh_cols = [f"mh_{i}" for i in range(num_hashes)]

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.empty((len(pdf), num_hashes), dtype=np.int64)
            for j, text in enumerate(pdf[text_col].tolist()):
                h = _h31_array(sorted(_shingle_set(text, k)))
                # (K, S) permuted hashes -> min per permutation; 31-bit a,b
                # and 31-bit h keep products < 2^62 (no int64 overflow)
                out[j] = ((a * h[None, :] + b) % p).min(axis=1)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, **{c: out[:, i] for i, c in enumerate(mh_cols)}}
            )

    return docs.select("doc_id", text_col).mapInPandas(kern, schema)


def simhash_np(docs, text_col: str = "text", bits: int = 16):
    """Shuffle-free SimHash kernel: the JVM path exploded every word
    OCCURRENCE (N×tokens rows) through a groupBy bit-vote shuffle; the
    vote is per-document arithmetic, so the kernel folds it inside the
    scan — (doc_id, simhash) out, zero exchanges. Pure integer md5 math
    (h31 per occurrence, +1/−1 per bit, bit set iff votes > 0) — bit-equal
    by construction, pinned by tests/test_np_exact.py."""
    import pandas as pd

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for j, text in enumerate(pdf[text_col].tolist()):
                words = _JAVA_NONSPACE.findall(text.lower()) if text is not None else []
                if not words:
                    # JVM: explode of an empty/null words array emits no
                    # rows, so the doc is ABSENT from the aggregate output
                    out[j] = -1
                    continue
                h = _h31_array(words)
                sim = 0
                for i in range(bits):
                    votes = (2 * ((h >> i) & 1) - 1).sum()
                    if votes > 0:
                        sim += 1 << i
                out[j] = sim
            res = pd.DataFrame({"doc_id": pdf["doc_id"].values, "simhash": out})
            yield res[res["simhash"] >= 0]

    return docs.select("doc_id", text_col).mapInPandas(kern, "doc_id long, simhash long")


#: Java-\w twin for punct counting: [^\w\s] with ASCII \w and \s.
_JAVA_PUNCT = re.compile(r"[^a-zA-Z0-9_ \t\n\x0b\f\r]")
#: BPE-ish pre-tokenizer twin (textstats.BPE_TOKEN_RE with ASCII \s).
_JAVA_BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]")
_STOPSET = frozenset(("the", "a", "an", "of", "to", "and", "in", "is", "on", "for"))


def text_profile_np(docs, text_col: str = "text", shingle_words: int = 8):
    """Arrow-batched twin of ``textstats.text_profile`` — the composite
    one-scan document profile. Every value reproduces the JVM expression
    chain exactly (pinned by tests/test_np_exact.py): ASCII-class
    tokenization, double-precision ratios with the same operation order,
    the quality composite's left-associated weighted sum, exact 6-dp
    HALF_UP rounding, and the JVM's null-text quirks (null token counts,
    least()-skips-null giving len_score=1.0, null fingerprint)."""
    import pandas as pd

    def profile_one(text):
        if text is None:
            # JVM null-propagation path: size(null)=null counts, ratios'
            # when() guards fall through to 0.0, least(null, 1.0) -> 1.0,
            # and greatest(null-7, 1) -> 1 makes the fingerprint h31("")
            # (concat_ws of a null slice), NOT null
            q = (1.0 * 0.3 + 0.0 * 0.3) + 1.0 * 0.2 + 0.5 * 0.2
            fp = int(hashlib.md5(b"").hexdigest()[:15], 16) % MINHASH_PRIME
            return (None, None, 0.0, 0.0, q, "other", fp)
        words = _JAVA_NONSPACE.findall(text.lower())
        nw = len(words)
        n_bpe = len(_JAVA_BPE.findall(text))
        n_stop = sum(1 for w in words if w in _STOPSET)
        stop = (n_stop / nw) if nw > 0 else 0.0
        n_punct = len(_JAVA_PUNCT.findall(text))
        punct = (n_punct / len(text)) if len(text) > 0 else 0.0
        wl = (float(sum(len(w) for w in words)) / nw) if nw > 0 else 0.0
        len_score = min(len(text) / 400.0, 1.0)
        stop_score = min(stop * 5.0, 1.0)
        punct_pen = max(1.0 - punct * 4.0, 0.0)
        wl_score = 1.0 if (3.0 <= wl <= 10.0) else 0.5
        quality = (len_score * 0.3 + stop_score * 0.3) + punct_pen * 0.2 + wl_score * 0.2
        if nw >= shingle_words:
            shingles = (
                " ".join(words[i : i + shingle_words])
                for i in range(nw - shingle_words + 1)
            )
        else:
            shingles = (" ".join(words),)
        p = MINHASH_PRIME
        fp = min(
            int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % p for s in shingles
        )
        return (nw, n_bpe, stop, punct, quality, "en" if stop >= 0.08 else "other", fp)

    id_t = docs.schema["doc_id"].dataType.simpleString()
    schema = (
        f"doc_id {id_t}, n_tokens_ws int, n_tokens_bpe int, stopword_ratio double, "
        "punct_ratio double, quality double, lang_pred string, fingerprint long"
    )

    def kern(batches) -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = [profile_one(t) for t in pdf[text_col].tolist()]
            out = pd.DataFrame(
                rows,
                columns=[
                    "n_tokens_ws", "n_tokens_bpe", "stopword_ratio",
                    "punct_ratio", "quality", "lang_pred", "fingerprint",
                ],
            )
            out["stopword_ratio"] = round6_half_up(out["stopword_ratio"].to_numpy(dtype=np.float64))
            out["punct_ratio"] = round6_half_up(out["punct_ratio"].to_numpy(dtype=np.float64))
            out["quality"] = round6_half_up(out["quality"].to_numpy(dtype=np.float64))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["n_tokens_ws"] = out["n_tokens_ws"].astype("Int32")
            out["n_tokens_bpe"] = out["n_tokens_bpe"].astype("Int32")
            out["fingerprint"] = out["fingerprint"].astype("Int64")
            yield out

    return docs.select("doc_id", text_col).mapInPandas(kern, schema)


def repetition_stats_np(docs, text_col: str = "text", gram_words: int = 2):
    """Arrow-batched twin of ``textstats.repetition_stats`` (Gopher-style
    duplicate/top n-gram fractions). Integer counts + one double division
    each, rounded with the exact 6-dp HALF_UP twin; the JVM's empty/null
    fallback (a single ``""``/whole-text gram) is reproduced. Pinned by
    tests/test_np_exact.py."""
    import pandas as pd
    from collections import Counter

    def one(text):
        words = _JAVA_NONSPACE.findall(text.lower()) if text is not None else []
        n = len(words)
        if n >= gram_words:
            grams = [" ".join(words[i : i + gram_words]) for i in range(n - gram_words + 1)]
        else:
            grams = [" ".join(words)]
        total = len(grams)
        counts = Counter(grams)
        return (total, (total - len(counts)) / total, max(counts.values()) / total)

    id_t = docs.schema["doc_id"].dataType.simpleString()
    schema = f"doc_id {id_t}, n_grams long, dup_gram_frac double, top_gram_frac double"

    def kern(batches) -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = [one(t) for t in pdf[text_col].tolist()]
            out = pd.DataFrame(rows, columns=["n_grams", "dup_gram_frac", "top_gram_frac"])
            out["dup_gram_frac"] = round6_half_up(out["dup_gram_frac"].to_numpy(dtype=np.float64))
            out["top_gram_frac"] = round6_half_up(out["top_gram_frac"].to_numpy(dtype=np.float64))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return docs.select("doc_id", text_col).mapInPandas(kern, schema)


def shingle_hashes_np(docs, text_col: str, shingle_words: int, id_col: str = "doc_id"):
    """Flat-map kernel: one (id, sh_h) row per DISTINCT word-k-gram of each
    doc, sh_h = md5_hash60 of the shingle — the exact rows
    ``explode(array_distinct(_word_shingles)) → md5_hash60`` produces (the
    contamination check's corpus side). Pure integer md5; pinned by
    tests/test_np_exact.py."""
    import pandas as pd

    id_t = docs.schema[id_col].dataType.simpleString()

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for did, text in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                for s in _shingle_set(text, shingle_words):
                    ids.append(did)
                    hs.append(int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16))
            yield pd.DataFrame({id_col: ids, "sh_h": np.array(hs, dtype=np.int64)})

    return docs.select(id_col, text_col).mapInPandas(kern, f"{id_col} {id_t}, sh_h long")


# --------------------------------------------------------------------------
# Exact float twins: Spark's F.round(double, 6) and the sequential
# F.aggregate dot/norm folds, reproduced bit-for-bit in numpy.
# --------------------------------------------------------------------------

def round6_half_up(x: np.ndarray) -> np.ndarray:
    """Bit-exact twin of Spark's ``F.round(col, 6)`` on DoubleType, which
    is ``BigDecimal.valueOf(d).setScale(6, HALF_UP)`` — i.e. HALF_UP (away
    from zero) applied to the SHORTEST-DECIMAL string of the double, not to
    its binary expansion. Fast path: binary away-from-zero rounding, which
    agrees everywhere except within float error of an exact ``…5e-7``
    boundary; those few elements are redone through ``Decimal(repr(x))``,
    Python's repr being the same shortest-round-trip decimal."""
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    scaled = ax * 1e6
    out = np.sign(x) * (np.floor(scaled + 0.5) / 1e6)
    frac = scaled - np.floor(scaled)
    near = np.abs(frac - 0.5) < 1e-6
    nz = np.nonzero(near & np.isfinite(x))[0]
    if nz.size:
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        flat = out.copy()
        for i in nz:
            flat[i] = float(Decimal(repr(float(x[i]))).quantize(q, rounding=ROUND_HALF_UP))
        out = flat
    return out


def seq_dot(a2: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """Row-wise dot with STRICT left-to-right accumulation — the exact twin
    of ``dot_expr``'s ``F.aggregate`` fold (acc starts at 0.0, adds one
    product at a time). ``np.cumsum`` is sequential-prefix by definition,
    so its last column is the same left fold; a BLAS ``@`` would sum in a
    different order and diverge in the last ulp."""
    return np.cumsum(a2 * b2, axis=1)[:, -1]


def seq_norm(a2: np.ndarray) -> np.ndarray:
    """Row-wise ``norm_expr`` twin: sqrt of the sequential sum of squares."""
    return np.sqrt(np.cumsum(a2 * a2, axis=1)[:, -1])


def _vec_matrix(series) -> np.ndarray:
    """(n, d) float64 matrix from a pandas column of float32 vectors —
    per-element cast to double exactly like the fold's ``cast('double')``."""
    return np.stack([np.asarray(v, dtype=np.float32) for v in series]).astype(np.float64)


def with_ivf_cell_np(
    df,
    centroids,
    vec_col: str = "embedding",
    c_id: str = "cid",
    c_vec: str = "ce",
):
    """Arrow-batched twin of ``similarity.with_ivf_cell``: append the
    argmax-cosine ``cell`` column. The K-row centroid table is collected
    driver-side (the trained model is driver-scale by design — the JVM twin
    broadcasts the same rows) and shipped in the task closure; per batch
    the kernel computes every cosine with the sequential-fold dot/norm and
    the exact 6-dp HALF_UP rounding, then takes the first strict maximum in
    ascending-cid order — the JVM fold's tie rule. Zero-norm vectors (and
    all-null cosines) get a null cell, exactly like ``try_divide``'s null
    falling through the fold. Pinned ≡ JVM by tests/test_np_exact.py."""
    import pandas as pd

    rows = sorted(
        ((int(r[c_id]), [float(x) for x in r[c_vec]]) for r in centroids.collect()),
        key=lambda t: t[0],
    )
    cids = np.array([t[0] for t in rows], dtype=np.int64)
    C = np.array([t[1] for t in rows], dtype=np.float64)  # (K, d)
    cn = seq_norm(C)  # centroid norms, same fold as norm_expr
    in_cols = df.columns
    schema_in = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = schema_in + ", cell bigint"

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pdf.assign(cell=pd.Series(dtype="Int64"))
                continue
            V = _vec_matrix(pdf[vec_col])  # (n, d)
            vn = seq_norm(V)
            best_cos = np.full(len(pdf), -2.0)
            best_cid = np.full(len(pdf), -1, dtype=np.int64)
            for j in range(len(cids)):
                denom = vn * cn[j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = seq_dot(V, C[j][None, :]) / denom
                cos = round6_half_up(cos)
                valid = (denom != 0.0) & np.isfinite(cos)
                take = valid & (cos > best_cos)
                best_cos = np.where(take, cos, best_cos)
                best_cid = np.where(take, cids[j], best_cid)
            cell = pd.array(best_cid, dtype="Int64")
            cell[best_cid == -1] = pd.NA
            out = pdf.copy()
            out["cell"] = cell
            yield out

    return df.mapInPandas(kern, schema)


def cosine_bucket_pairs_np(
    e,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "v",
    bucket_col: str = "bucket",
):
    """Within-bucket all-pairs cosine ≥ threshold — the grouped-kernel twin
    of the bucket self-join + per-pair ``cosine_expr`` in
    ``embedding_near_duplicates``. ``applyInPandas`` ships each bucket's
    VECTORS once (one shuffle of n rows) instead of shuffling two join
    sides and materializing every candidate pair row; pairs are enumerated
    in the kernel and scored with the sequential-fold dot/norm + exact 6-dp
    rounding, so the (a_id, b_id, cosine) set is bit-identical to the JVM
    join (pinned by tests/test_np_exact.py). Skew shape is unchanged: a
    bucket lands in one task here exactly as one join partition there."""
    import pandas as pd

    id_t = e.schema[id_col].dataType.simpleString()

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
                {"a_id": pdf[id_col].dtype, "b_id": pdf[id_col].dtype, "cosine": "float64"}
            )
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].values
        V = _vec_matrix(pdf[vec_col])
        nv = seq_norm(V)
        ai, bi = np.triu_indices(n, k=1)  # a < b after the id sort
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = seq_dot(V[ai], V[bi]) / (nv[ai] * nv[bi])
        cos = round6_half_up(cos)
        keep = cos >= threshold
        return pd.DataFrame(
            {"a_id": ids[ai[keep]], "b_id": ids[bi[keep]], "cosine": cos[keep]}
        )

    return e.groupBy(bucket_col).applyInPandas(
        kern, f"a_id {id_t}, b_id {id_t}, cosine double"
    )
