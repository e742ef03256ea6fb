"""Invariant tests for the hash-based LLM ops that have no SQL oracle
(MinHash-LSH, SimHash, RP-LSH ANN) plus multimodal plumbing."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from hadoop_fcfs_spark.llm.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from hadoop_fcfs_spark.llm.multimodal import attach_media_meta, decode_images, sample_frames
from hadoop_fcfs_spark.llm.similarity import cosine_topk, rp_lsh_topk
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _make_near_dups(spark):
    """Corpus with planted exact and near duplicates."""
    base = _docs(spark).limit(20).select("doc_id", "text")
    exact = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    # near-dup: append two words -> high but <1 jaccard
    near = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz yy")).alias("text"),
    )
    return base.unionByName(exact).unionByName(near)


def test_exact_dedup_removes_planted_dups(spark):
    corpus = _make_near_dups(spark)
    kept = exact_dedup(corpus, "doc_id", "text")
    # 3 exact dups removed, near-dups kept
    assert kept.count() == corpus.count() - 3
    # representative is the min doc_id
    assert kept.filter(F.col("doc_id").isin([10_000, 10_001, 10_002])).count() == 0


def test_minhash_identical_docs_identical_signatures(spark):
    corpus = _make_near_dups(spark)
    sig = minhash_signatures(corpus, "doc_id", "text")
    s = {r["doc"]: tuple(r["sig"]) for r in sig.collect()}
    for d in range(3):
        assert s[d] == s[d + 10_000], "exact dup must have identical minhash signature"


def test_minhash_lsh_finds_planted_near_dups(spark):
    corpus = _make_near_dups(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.5).collect()}
    for d in range(3):
        assert (d, d + 10_000) in pairs and pairs[(d, d + 10_000)] == 1.0
        assert (d, d + 20_000) in pairs, "near-dup pair missed by LSH"
    # LSH candidates are a subset of exact-jaccard pairs at same threshold
    exact = {(r["doc_a"], r["doc_b"]) for r in
             ngram_jaccard_pairs(corpus, "doc_id", "text", threshold=0.5).collect()}
    assert set(pairs) <= exact


def test_simhash_exact_dup_zero_hamming(spark):
    corpus = _make_near_dups(spark)
    sig = {r["doc"]: (r["sig_hi"], r["sig_lo"]) for r in
           simhash_signatures(corpus, "doc_id", "text").collect()}
    for d in range(3):
        assert sig[d] == sig[d + 10_000]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash_pairs(corpus, "doc_id", "text", max_hamming=0).collect()}
    for d in range(3):
        assert pairs.get((d, d + 10_000)) == 0


def test_rp_lsh_topk_finds_planted_duplicates(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    # plant an exact copy of each query vector under a new id: identical
    # vectors land in the same bucket for ANY hyperplane set, so LSH
    # must retrieve them at rank 1 with cosine 1.0
    copies = queries.select((F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label")
    corpus = emb.unionByName(copies)
    approx = {(r["query_id"], r["vec_id"]): (r["cos"], r["rank"]) for r in
              rp_lsh_topk(corpus, queries, k=3, num_planes=8).collect()}
    for q in range(5):
        cos, rank = approx[(q, q + 9000)]
        assert rank == 1 and cos == 1.0
    # scores inside buckets are exact: spot-check against brute force
    exact = {(r["query_id"], r["vec_id"]): r["cos"] for r in
             cosine_topk(corpus, queries, k=50).collect()}
    for key, (cos, _) in approx.items():
        assert key in exact and exact[key] == cos


def test_rp_lsh_planted_gate_fixture_assumption():
    """r14 ADVICE: the constant planted oracles of ann_rp_lsh_topk and
    ann_rp_lsh_recall_curve assume NO organic corpus vector has
    @4-rounded cosine 1.0 with any query (vec_id < 10) — such a vector
    would beat the 1e6+ planted copies on the ascending-id tiebreak
    and break the 30/30 constant. Assert it against the LIVE fixture
    (the SF the oracle gates run at) so a fixture regeneration fails
    HERE with a named invariant, not as a mysterious hash mismatch."""
    import numpy as np
    import pyarrow.parquet as pq

    from tests.conftest import SF_ORACLE

    tbl = pq.read_table(f"{SF_ORACLE}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    qmask = ids < 10
    cos = (vecs[qmask] @ vecs.T) / np.outer(norms[qmask], norms)
    # mask each query's self-pair; everything else is organic corpus
    for qi, qid in enumerate(ids[qmask]):
        cos[qi, ids == qid] = -2.0
    worst = np.round(cos, 4).max()
    assert worst < 1.0, (
        f"organic vector @4-rounds to cos {worst} with a query - the "
        "planted-copy constant oracle invariant no longer holds"
    )


def test_multimodal_plumbing(spark):
    blobs = spark.range(8).select(
        F.col("id").alias("media_id"),
        F.concat(
            F.lit(b"\x89PNG"), F.encode(F.repeat(F.concat(F.lit("x"), F.col("id").cast("string")), 700), "utf-8")
        ).alias("payload"),
    )
    meta = attach_media_meta(blobs)
    rows = meta.select("media_id", "media_meta.*").collect()
    assert all(r["format"] == "png" for r in rows)
    assert all(r["size_bytes"] > 1000 for r in rows)

    decoded = decode_images(blobs).collect()
    assert len(decoded) == 8
    assert all(16 <= r["width"] < 80 and 16 <= r["height"] < 80 for r in decoded)
    # deterministic across runs
    again = decode_images(blobs).collect()
    assert sorted(map(tuple, decoded)) == sorted(map(tuple, again))

    frames = sample_frames(blobs, every_n_bytes=512)
    per_doc = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 2 for r in per_doc)  # >1KB blobs, 512B windows


def test_wav_decode_and_resample_real_codec(spark):
    """decode_wav / resample_wav run a REAL codec (stdlib wave/audioop):
    decode recovers the exact header fields and RMS of generated PCM;
    resample halves the rate, preserves duration within interpolation
    error, and the output is itself a decodable WAV; garbage blobs yield
    NULL rows instead of failing the batch."""
    import io
    import struct
    import wave

    from hadoop_fcfs_spark.llm.multimodal import decode_wav, resample_wav

    def make_wav(rate, amp, n):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            # constant-amplitude square wave: RMS == amp exactly
            w.writeframes(struct.pack(f"<{n}h", *([amp, -amp] * (n // 2))))
        return buf.getvalue()

    rows = [
        (0, make_wav(16000, 1000, 16000)),  # 1 s @ 16 kHz
        (1, make_wav(8000, 500, 4000)),     # 0.5 s @ 8 kHz
        (2, b"not audio at all"),
    ]
    blobs = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_wav(blobs).collect()}
    assert got[0]["sample_rate"] == 16000 and got[0]["n_frames"] == 16000
    assert abs(got[0]["duration_s"] - 1.0) < 1e-9
    assert abs(got[0]["rms"] - 1000) <= 1
    assert got[1]["sample_rate"] == 8000 and abs(got[1]["duration_s"] - 0.5) < 1e-9
    assert abs(got[1]["rms"] - 500) <= 1
    assert got[2]["sample_rate"] is None and got[2]["rms"] is None

    res = resample_wav(blobs, 8000)
    rdec = {r["media_id"]: r for r in decode_wav(res).collect()}
    assert rdec[0]["sample_rate"] == 8000
    assert abs(rdec[0]["duration_s"] - 1.0) < 0.01  # duration preserved
    assert rdec[2]["sample_rate"] is None  # garbage passthrough as NULL
    import pytest

    with pytest.raises(ValueError):
        resample_wav(blobs, 0)


def test_multimodal_resize_and_audio_features(spark):
    """Resize = binary→binary transform (payload replaced, meta
    re-derivable); audio features = blob → array<float> vector that the
    similarity tier consumes unchanged."""
    from hadoop_fcfs_spark.llm.multimodal import extract_audio_features, resize_images
    from hadoop_fcfs_spark.llm.similarity import cosine_topk

    blobs = spark.range(6).select(
        F.col("id").alias("media_id"),
        F.concat(
            F.lit(b"RIFF"),
            F.encode(F.repeat(F.concat(F.lit("s"), F.col("id").cast("string")), 500), "utf-8"),
        ).alias("payload"),
    )
    resized = resize_images(blobs, 32, 24)
    rows = resized.collect()
    assert all(r["width"] == 32 and r["height"] == 24 for r in rows)
    # payload replaced and re-sniffable via attach_media_meta
    meta = attach_media_meta(resized).select("media_meta.size_bytes").collect()
    assert all(r["size_bytes"] == 32 * 24 // 8 for r in meta)

    feats = extract_audio_features(blobs)
    fr = feats.collect()
    assert all(len(r["features"]) == 8 for r in fr)
    assert all(r["duration_s"] > 0 for r in fr)
    # determinism + composes with the ANN tier: features are a valid
    # embedding column for cosine top-k
    emb = feats.select(F.col("media_id").alias("vec_id"), F.col("features").alias("embedding"))
    queries = emb.limit(2)
    top = cosine_topk(emb, queries, k=2)
    assert top.count() == 4  # 2 queries × top-2 (self excluded? k nearest others)


def test_near_dedup_removes_planted_and_keeps_rest(spark):
    from hadoop_fcfs_spark.llm.dedup import near_dedup

    corpus = _make_near_dups(spark)
    kept = near_dedup(corpus, "doc_id", "text", threshold=0.8)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # all planted exact dups (10000-10002) and near dups (20000-20002) gone
    assert not ids & {10_000, 10_001, 10_002, 20_000, 20_001, 20_002}
    # min-id representatives kept
    assert {0, 1, 2} <= ids
    # invariant: no two kept docs form a near-dup pair (the testdata has
    # organic near-dups of its own, e.g. docs 8/12 at J≈0.97 — they must
    # be deduped too, so don't assert a fixed survivor count)
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.8)
    both_kept = pairs.filter(F.col("doc_a").isin(ids) & F.col("doc_b").isin(ids))
    assert both_kept.count() == 0


def test_ivf_topk_finds_planted_duplicates(spark):
    from hadoop_fcfs_spark.llm.similarity import ivf_topk, kmeans_centroids

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    copies = queries.select((F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label")
    corpus = emb.unionByName(copies)
    # identical vector -> same cell assignment -> retrieved at rank 1
    got = {(r["query_id"], r["vec_id"]): (r["cos"], r["rank"]) for r in
           ivf_topk(corpus, queries, k=3, n_centroids=8, n_probe=2).collect()}
    for q in range(5):
        cos, rank = got[(q, q + 9000)]
        assert rank == 1 and cos == 1.0
    # centroids are deterministic across calls
    c1 = kmeans_centroids(emb, k=4, iterations=2)
    c2 = kmeans_centroids(emb, k=4, iterations=2)
    assert c1 == c2


def test_corpus_pipeline_invariants(spark):
    from hadoop_fcfs_spark.queries_llm import corpus_pipeline

    out = corpus_pipeline(spark, SF_SMOKE).collect()
    assert len(out) > 0
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)), "pipeline output must be id-unique"
    assert all(r["ws_tokens"] > 0 and r["n_chars"] > 0 for r in out)
    # survivors are a subset of the input corpus
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(ids) <= n_docs


def test_embedding_near_dup_finds_planted_copies(spark):
    from hadoop_fcfs_spark.llm.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label"
    )
    pairs = {(r["vec_a"], r["vec_b"]): r["cos"] for r in
             embedding_near_dup_pairs(emb.unionByName(copies), threshold=0.999).collect()}
    for q in range(5):
        assert pairs.get((q, q + 9000)) == 1.0


def test_format_histogram_blob(spark):
    from hadoop_fcfs_spark.agg.histogram import format_histogram, value_histogram

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 3)], "k string, v int"
    )
    hist = value_histogram(df, "k", "v")
    blobs = {r["k"]: r["histogram_report"] for r in format_histogram(hist, "k").collect()}
    # key a: values {1:2, 2:1} -> n=2, min=1, median=1.5, max=2, avg=1.5, std=0.5
    assert blobs["a"] == "2\t1\t1.5\t2\t1.5\t0.5"
    assert blobs["b"] == "1\t1\t1.0\t1\t1.0\t0.0"


def test_connected_components_chain(spark):
    from hadoop_fcfs_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    comp = {r["doc"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_pointer_doubling_long_chain(spark):
    """A 60-edge chain (diameter 60) must converge within 7 rounds:
    pointer doubling gives the 2^rounds bound (128 ≥ 61); plain min-label
    propagation would need 60 rounds and silently return split labels."""
    from hadoop_fcfs_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # exhaustion warning would fail the test
        comp = {
            r["doc"]: r["component"]
            for r in connected_components(pairs, max_iter=7).collect()
        }
    assert comp == {i: 0 for i in range(61)}


def test_connected_components_warns_on_exhaustion(spark):
    from hadoop_fcfs_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.warns(RuntimeWarning, match="not converged"):
        connected_components(pairs, max_iter=2).collect()


def test_near_dedup_clustered_keeps_one_per_chain(spark):
    from hadoop_fcfs_spark.llm.dedup import near_dedup_clustered

    base = _docs(spark).limit(10).select("doc_id", "text")
    # chain: doc0 ~ copy0 ~ copy0' (transitively connected via identical text)
    c1 = base.filter(F.col("doc_id") == 0).select(F.lit(500).alias("doc_id"), "text")
    c2 = base.filter(F.col("doc_id") == 0).select(
        F.lit(600).alias("doc_id"), F.concat(F.col("text"), F.lit(" zz")).alias("text")
    )
    corpus = base.unionByName(c1).unionByName(c2)
    kept = {r["doc_id"] for r in
            near_dedup_clustered(corpus, "doc_id", "text", threshold=0.8).collect()}
    assert 0 in kept and 500 not in kept and 600 not in kept


def test_winnowing_guarantee_and_selectivity(spark):
    """Winnowing's defining property: documents sharing a contiguous run
    of >= k + w - 1 words share at least one fingerprint; documents with
    disjoint vocabulary share none; identical docs have identical sets;
    and winnowing keeps far fewer fingerprints than k-grams."""
    from hadoop_fcfs_spark.llm.textan import winnow_fingerprints

    k, w = 5, 4
    shared = " ".join(f"common{i}" for i in range(k + w - 1))  # exactly the guarantee length
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, shared + " zeta " + " ".join(f"x{i}" for i in range(20))),
            (3, " ".join(f"y{i}" for i in range(40))),  # disjoint vocab
            (4, "alpha beta " + shared + " gamma delta"),  # copy of 1
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, "doc_id", "text", k, w)
    sets = {r["doc"]: set() for r in fp.select("doc").distinct().collect()}
    for r in fp.collect():
        sets[r["doc"]].add(r["fp"])
    assert sets[1] & sets[2], "guaranteed shared fingerprint missing"
    assert not (sets[1] & sets[3]), "disjoint docs must not collide"
    assert sets[1] == sets[4], "identical docs must fingerprint identically"
    # selectivity: fingerprints ≪ k-gram count for a long doc
    n_words = 40
    assert len(sets[3]) < (n_words - k + 1) / 2


def test_pack_sequences_matches_naive_prefix_sum(spark):
    """Two-level chunked prefix sum == single global window (tiny chunk
    width forces multiple chunks so the offset path is exercised)."""
    from pyspark.sql import Window
    from hadoop_fcfs_spark.llm.packing import pack_sequences

    df = spark.createDataFrame(
        [(i * 3, 100 + (i * 37) % 50) for i in range(40)], "doc_id long, tks long"
    )
    packed = {r["doc_id"]: r["seq_id"]
              for r in pack_sequences(df, "doc_id", "tks", budget=500, chunk=7).collect()}
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: r["seq"]
        for r in df.withColumn("p", F.coalesce(F.sum("tks").over(w), F.lit(0)))
        .selectExpr("doc_id", "CAST(p DIV 500 AS BIGINT) AS seq")
        .collect()
    }
    assert packed == naive
    assert max(packed.values()) > 0  # multiple sequences actually produced


def test_pack_sequences_input_guards(spark):
    """budget<1 and non-numeric id must raise, not emit NULL seq_ids /
    collapse every row into one single-task chunk."""
    import pytest

    from hadoop_fcfs_spark.llm.packing import pack_sequences

    df = spark.createDataFrame([(1, 10)], "doc_id long, tks long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "tks", budget=0)
    with pytest.raises(ValueError, match="chunk"):
        pack_sequences(df, "doc_id", "tks", budget=10, chunk=0)
    sdf = spark.createDataFrame([("a", 10)], "doc_id string, tks long")
    with pytest.raises(TypeError, match="integral"):
        pack_sequences(sdf, "doc_id", "tks")


def test_scrub_pii_redacts_and_counts(spark):
    from hadoop_fcfs_spark.llm.textan import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-1.org twice a.b+c@ex-1.org ip 10.0.0.1 tel +49-172-99887")],
        "doc_id long, text string",
    )
    r = scrub_pii(df, "doc_id", "text").collect()[0]
    assert r["n_email"] == 2 and r["n_ip"] == 1 and r["n_phone"] == 1
    assert r["clean_text"] == "mail <EMAIL> twice <EMAIL> ip <IP> tel <PHONE>"


def test_repetition_signals_degenerate_doc(spark):
    from hadoop_fcfs_spark.llm.textan import repetition_signals

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"), (2, "all words here are different tokens"), (3, "hi")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(df, "doc_id", "text").collect()}
    assert out[1]["top_bigram_e6"] == 1_000_000  # one bigram covers everything
    assert out[1]["dup_trigram_e6"] == 666_666   # 3 trigrams, 1 distinct → floor(2/3 e6)
    assert out[2]["top_bigram_e6"] == 200_000    # 5 bigrams, all distinct
    assert out[2]["dup_trigram_e6"] == 0
    assert out[3]["n_bigrams"] == 0 and out[3]["top_bigram_e6"] == 0


def test_contamination_overlap_planted_copy(spark):
    from hadoop_fcfs_spark.llm.textan import contamination_overlap

    words = " ".join(f"w{i}" for i in range(20))  # 20 words → 8 distinct 13-grams
    corpus = spark.createDataFrame(
        [(1, words), (2, words + " tail"), (3, "short unrelated text")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(1, words)], "doc_id long, text string")
    out = {(r["bench_id"], r["doc_id"]): r["shared_ngrams"]
           for r in contamination_overlap(corpus, bench, "doc_id", "text").collect()}
    assert out == {(1, 2): 8}  # full overlap with the copy; self-pair excluded


def test_chunk_documents_windows_and_overlap(spark):
    from hadoop_fcfs_spark.llm.textan import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=2)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"]) for r in out.collect()}
    # doc1: starts 1,3,5,7,9 → windows of 4, last (w8 w9) has 2 ≤ overlap → dropped
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w2 w3 w4 w5", 4)
    assert rows[(1, 3)] == ("w6 w7 w8 w9", 4)
    assert (1, 4) not in rows
    # short doc: single chunk; empty doc: no chunks
    assert rows[(2, 0)] == ("a b", 2)
    assert not any(d == 3 for d, _ in rows)
    # every token of doc1 is covered by some chunk
    covered = set()
    for (d, _), (txt, _n) in rows.items():
        if d == 1:
            covered |= set(txt.split())
    assert covered == {f"w{i}" for i in range(10)}


def test_char_entropy_known_values(spark):
    from hadoop_fcfs_spark.llm.textan import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_chars"], r["entropy_e6"]) for r in
           char_entropy(df, "doc_id", "text").collect()}
    assert out[1] == (4, 0)          # uniform single char → H=0
    assert out[2] == (4, 1_000_000)  # two chars 50/50 → H=1 bit
    assert out[3] == (4, 2_000_000)  # four distinct → H=2 bits


def test_gram_rows_irregular_whitespace(spark):
    """Shingles are defined over the CLEAN token sequence: consecutive /
    leading / tab-newline whitespace must not create empty tokens or
    whitespace-polluted grams (oracle-parity-critical: the SQL side
    filters empty tokens the same way)."""
    from hadoop_fcfs_spark.llm.dedup import _gram_rows

    df = spark.createDataFrame(
        [(1, "  a  b\tc\nd "), (2, "a b c d")], "doc_id long, text string"
    )
    grams = {(r["doc"], r["gram"]) for r in _gram_rows(df, "doc_id", "text", 3).collect()}
    expected = {(d, g) for d in (1, 2) for g in ("a b c", "b c d")}
    assert grams == expected


def test_bigram_lm_scores_hand_case(spark):
    """Tiny corpus where the smoothed bigram model is hand-computable:
    C(a,b)=3, C(b,a)=1, C1(a)=3, C1(b)=1, V=2, k=0.5."""
    import math

    from hadoop_fcfs_spark.llm.textan import bigram_lm_scores

    df = spark.createDataFrame([(1, "a b a b"), (2, "a b"), (3, "solo")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_e6"]) for r in bigram_lm_scores(df, "doc_id", "text").collect()}
    p_ab = (3 + 0.5) / (3 + 0.5 * 2)   # p(b|a)
    p_ba = (1 + 0.5) / (1 + 0.5 * 2)   # p(a|b)
    d1 = math.floor((2 * -math.log2(p_ab) + -math.log2(p_ba)) / 3 * 1_000_000)
    d2 = math.floor(-math.log2(p_ab) * 1_000_000)
    assert got == {1: (3, d1), 2: (1, d2)}  # doc 3 (single token) omitted


def test_duplicate_spans_planted_hand_case(spark):
    """Two docs sharing a 10-token run + one doc with an internal repeat;
    hand-computed maximal spans."""
    from hadoop_fcfs_spark.llm.spans import duplicate_span_stats, duplicate_spans

    shared = "q w e r t y u i o p"  # 10 tokens, alien to the filler vocab
    rows = [
        (1, "f1 f2 f3 " + shared + " f4 f5 f6"),       # span at tokens 3..12
        (2, shared + " g1 g2 g3 g4 g5 g6 g7 g8"),       # span at tokens 0..9
        (3, "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10"),          # clean
        # internal repeat: same 8-token run twice in ONE doc, separated
        (4, "a1 a2 a3 a4 a5 a6 a7 a8 z1 z2 z3 z4 a1 a2 a3 a4 a5 a6 a7 a8"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(df, "doc_id", "text", w=8, min_count=2).collect()
    )
    # 10-token shared run => 3 overlapping 8-windows merging to one span;
    # doc 4's two copies are separate islands (the windows crossing the
    # z-region are unique, and gap 12 > w-1)
    assert spans == [
        (1, 3, 12, 3),
        (2, 0, 9, 3),
        (4, 0, 7, 1),
        (4, 12, 19, 1),
    ]

    stats = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["max_span_len"])
        for r in duplicate_span_stats(df, "doc_id", "text", w=8, min_count=2).collect()
    }
    assert stats[1] == (1, 10, 10)
    assert stats[4] == (2, 16, 8)


def test_duplicate_spans_short_doc_and_touching_runs(spark):
    from hadoop_fcfs_spark.llm.spans import duplicate_spans, window_fingerprints

    # doc shorter than w yields no windows (sequence() guard)
    tiny = spark.createDataFrame([(1, "a b c"), (2, "a b c")], ["doc_id", "text"])
    assert window_fingerprints(tiny, "doc_id", "text", w=8).count() == 0
    # w=1 duplicated single tokens: doc "x y x" vs "x" -> x duplicated at 0,2
    # and the two occurrences in doc 1 do NOT merge (gap 2 > w-1=0)
    df = spark.createDataFrame([(1, "x y x"), (2, "x")], ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, "doc_id", "text", w=1, min_count=2).collect()
    )
    assert got == [(1, 0, 0), (1, 2, 2), (2, 0, 0)]


def test_duplicate_spans_rejects_bad_width(spark):
    from hadoop_fcfs_spark.llm.spans import duplicate_spans

    with pytest.raises(ValueError):
        duplicate_spans(_docs(spark), "doc_id", "text", w=0)


def test_semdedup_drops_planted_copies(spark):
    """Exact copies of a vector land in the same cell (identical => same
    argmin) and all but the lowest id are dropped; unrelated vectors
    survive. Uses the learned k-means path (no fixed quantizer)."""
    from hadoop_fcfs_spark.llm.similarity import semdedup

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(40)
    copies = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(copies)
    kept = {r["vec_id"] for r in semdedup(corpus, threshold=0.99, n_centroids=4).collect()}
    assert {0, 1, 2} <= kept
    assert kept.isdisjoint({1_000_000, 1_000_001, 1_000_002})
    # everything not involved in a planted duplicate survived
    assert len(kept) >= 37


def test_remove_boilerplate_units_planted(spark):
    """A shared 16-token banner across 3 docs is dropped everywhere;
    unique tails survive; a pure-boilerplate doc returns ''."""
    from hadoop_fcfs_spark.llm.spans import remove_boilerplate_units

    banner = " ".join(f"b{i}" for i in range(16))
    rows = [
        (1, banner + " u1 u2 u3"),
        (2, banner + " v1 v2 v3 v4"),
        (3, banner),                      # pure boilerplate
        (4, "w1 w2 w3 w4 w5"),            # untouched
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in remove_boilerplate_units(df, "doc_id", "text", unit_tokens=16).collect()
    }
    assert out[1] == ("u1 u2 u3", 1, 1)
    assert out[2] == ("v1 v2 v3 v4", 1, 1)
    assert out[3] == ("", 0, 1)
    assert out[4] == ("w1 w2 w3 w4 w5", 1, 0)


def test_incremental_exact_dedup_planted(spark):
    from hadoop_fcfs_spark.llm.dedup import incremental_exact_dedup

    ref = _docs(spark).filter(F.col("doc_id") < 10).select("doc_id", "text")
    # batch: one copy of a reference doc, one internal dup pair, one fresh
    batch = spark.createDataFrame(
        [(100, "totally fresh content one"),
         (101, "batch dup payload"),
         (102, "batch dup payload")],
        ["doc_id", "text"],
    ).unionByName(
        ref.filter(F.col("doc_id") == 3).select((F.col("doc_id") + 200).alias("doc_id"), "text")
    )
    kept = {r["doc_id"] for r in incremental_exact_dedup(batch, ref, "doc_id", "text").collect()}
    assert kept == {100, 101}  # ref copy (203) gone, internal dup keeps min id


def test_token_budget_mix_invariants(spark):
    from hadoop_fcfs_spark.ops.sampling import token_budget_mix

    docs = _docs(spark).select("doc_id", "source", "text")
    kept = token_budget_mix(docs, "source", "doc_id", "text", {}, default_budget=500)
    ntok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")))
    stats = {
        r["source"]: r["tok"]
        for r in kept.withColumn("__n", ntok).groupBy("source").agg(F.sum("__n").alias("tok")).collect()
    }
    # expected kept mass ~budget; uniform row sampling gives wide variance
    # at 25 docs/source — bound loosely, the oracle gate pins exact values
    assert stats and all(0 < v < 1500 for v in stats.values())
    # determinism: same membership on re-run
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids1 == ids2
    # a budget >= total keeps every row of that source
    all_kept = token_budget_mix(docs, "source", "doc_id", "text", {"src0": 10**9}, 500)
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert all_kept.filter(F.col("source") == "src0").count() == n_src0
    with pytest.raises(ValueError):
        token_budget_mix(docs, "source", "doc_id", "text", {"src0": -1})


def test_containment_pairs_hand_case(spark):
    """Quote-inclusion: doc 2 is a verbatim prefix of doc 1 -> containment
    (2 in 1) == 1.0 while Jaccard stays low; the reverse orientation
    (1 in 2) is far below 1; unrelated docs don't pair; threshold guard."""
    from hadoop_fcfs_spark.llm.dedup import containment_pairs, ngram_jaccard_pairs

    long_text = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(10))
    rows = [(1, long_text), (2, quote), (3, "totally different words entirely here now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_small"], r["doc_big"]): r["containment"]
        for r in containment_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert got == {(2, 1): 1.0}
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.25  # symmetric metric misses the inclusion
    import pytest

    with pytest.raises(ValueError):
        containment_pairs(df, "doc_id", "text", threshold=0.0)


def test_bm25_length_norm_and_idf(spark):
    """BM25 hand-properties: (a) same tf, shorter doc -> higher score
    (length normalization, the thing tf_idf lacks); (b) rarer term ->
    higher score at equal tf and length; (c) saturation: doubling tf
    less than doubles the score (k1 damping)."""
    from hadoop_fcfs_spark.llm.textan import bm25_scores

    rows = [
        (1, "cat dog"),                  # short doc, one 'cat'
        (2, "cat dog dog dog dog dog"),  # long doc, one 'cat'
        (3, "rare dog"),                 # 'rare' appears once in corpus
        (4, "cat cat dog"),              # tf=2 for cat
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {
        (r["doc_id"], r["term"]): r["bm25_e6"]
        for r in bm25_scores(df, "doc_id", "text").collect()
    }
    assert s[(1, "cat")] > s[(2, "cat")]          # length norm
    assert s[(3, "rare")] > s[(1, "cat")]         # idf: rare > common, same dl & tf
    assert s[(4, "cat")] < 2 * s[(1, "cat")] * 1.2  # saturation (loose: dl differs)
    assert all(v >= 0 for v in s.values())        # non-negative idf variant


def test_duplicate_safe_split_no_straddle(spark):
    """Planted exact copies must land on the same split side (the leak an
    id-hash split permits); distinct texts still split deterministically."""
    from hadoop_fcfs_spark.ops.sampling import duplicate_safe_split

    docs = _docs(spark).select("doc_id", "text")
    copies = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    corpus = docs.unionByName(copies)
    out = duplicate_safe_split(corpus, "doc_id", "text", 0.5)
    # no digest straddles: every text value maps to exactly one split
    straddlers = (
        out.groupBy("text")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
    )
    assert straddlers.count() == 0
    # determinism across runs
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted((r["doc_id"], r["split"]) for r in out.collect())
    assert a == b
    # both sides populated at 50% on 25+ distinct texts
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides == {"train", "holdout"}
    with pytest.raises(ValueError):
        duplicate_safe_split(docs, "doc_id", "text", 1.5)


def test_token_budget_mix_weighted_pps(spark):
    """PPS keep-key: per-doc threshold scales with token count, so among
    docs sharing a sample key region the long ones are preferentially
    kept, expected kept mass == budget, and certainty-inclusion (p>=1)
    keeps every doc whose scaled threshold clears 2^32."""
    from hadoop_fcfs_spark.ops.sampling import (
        _U32,
        _sample_key,
        token_budget_mix,
        token_budget_mix_weighted,
    )

    docs = _docs(spark).select("doc_id", "source", "text")
    kept = token_budget_mix_weighted(docs, "source", "doc_id", "text", {}, default_budget=500)
    ntok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")))
    # determinism + schema passthrough (join moves the key first)
    assert set(kept.columns) == set(docs.columns)
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids1 == ids2 and ids1
    # length bias: kept docs' mean token count >= corpus mean (PPS keeps
    # mass carriers; the uniform variant has no such guarantee)
    mean_all = docs.select(F.avg(ntok)).first()[0]
    mean_kept = kept.select(F.avg(ntok)).first()[0]
    assert mean_kept >= mean_all * 0.9  # loose at 25 docs/source
    # expectation check, exact: E[kept tokens] = sum_i p_i * ntok_i with
    # p_i = min(1, thr_i / 2^32) -- replay the thresholds in pandas
    import math

    pdf = docs.withColumn("__n", ntok).withColumn("__k", _sample_key("doc_id")).toPandas()
    exp_mass = 0.0
    for src, grp in pdf.groupby("source"):
        total, tot2 = int(grp["__n"].sum()), int((grp["__n"] ** 2).sum())
        for _, row in grp.iterrows():
            thr = _U32 if 500 >= total else math.floor(500.0 * row["__n"] * float(_U32) / tot2)
            exp_mass += min(1.0, thr / _U32) * row["__n"]
    n_sources = pdf["source"].nunique()
    budget_total = 500 * n_sources
    # capped p_i can only LOWER the expectation; uncapped it's exact
    assert exp_mass <= budget_total + 1e-6
    # budget >= total keeps everything
    all_kept = token_budget_mix_weighted(docs, "source", "doc_id", "text", {"src0": 10**9}, 500)
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert all_kept.filter(F.col("source") == "src0").count() == n_src0
    with pytest.raises(ValueError):
        token_budget_mix_weighted(docs, "source", "doc_id", "text", {"src0": -1})


def test_image_ahash_near_dup_planted(spark):
    """Identical blobs pair at hamming 0; distinct blobs don't pair at
    the tight threshold; determinism across runs; guard on radius."""
    from hadoop_fcfs_spark.llm.multimodal import image_ahash, image_near_dup_pairs

    blobs = spark.range(12).select(
        F.col("id").alias("media_id"),
        F.concat(
            F.lit(b"\x89PNG"),
            F.encode(F.repeat(F.concat(F.lit("px"), F.col("id").cast("string")), 400), "utf-8"),
        ).alias("payload"),
    )
    copies = blobs.filter(F.col("media_id") < 3).select(
        (F.col("media_id") + 100).alias("media_id"), "payload"
    )
    corpus = blobs.unionByName(copies)

    h1 = {r["media_id"]: r["ahash"] for r in image_ahash(corpus).collect()}
    h2 = {r["media_id"]: r["ahash"] for r in image_ahash(corpus).collect()}
    assert h1 == h2  # deterministic
    for i in range(3):
        assert h1[i] == h1[i + 100]

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup_pairs(corpus, max_hamming=0).collect()}
    for i in range(3):
        assert pairs.get((i, i + 100)) == 0

    with pytest.raises(ValueError):
        image_near_dup_pairs(corpus, max_hamming=7)


def test_token_distribution_divergence_properties(spark):
    """Identical slices diverge ~0; a shifted vocabulary diverges
    strictly more; JS is symmetric and bounded by 1 bit."""
    from hadoop_fcfs_spark.llm.textan import token_distribution_divergence

    a = spark.createDataFrame([(1, "x y z x y"), (2, "x z z")], ["doc_id", "text"])
    same = token_distribution_divergence(a, a).first()
    assert same["kl_ab_e6"] == 0 and same["js_e6"] == 0

    b = spark.createDataFrame([(3, "p q r p q"), (4, "p r r")], ["doc_id", "text"])
    diff = token_distribution_divergence(a, b).first()
    rev = token_distribution_divergence(b, a).first()
    assert diff["js_e6"] > 0
    assert diff["js_e6"] == rev["js_e6"]          # JS symmetric
    assert diff["js_e6"] <= 1_000_000             # <= 1 bit
    assert diff["kl_ab_e6"] == rev["kl_ba_e6"]    # KL mirrors under swap


def test_audio_fingerprint_near_dup_real_codec(spark):
    """Energy-contour fingerprints from REAL WAV decode: identical
    recordings pair at hamming 0; an amplitude-scaled copy keeps the
    SAME fingerprint (contour is scale-invariant); a different rhythm
    doesn't pair; garbage yields NULL and is excluded."""
    import io
    import struct
    import wave

    from pyspark.sql import functions as F

    from hadoop_fcfs_spark.llm.multimodal import audio_fingerprint, audio_near_dup_pairs

    def tone_pattern(amps, rate=8000, per=256):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            samples = []
            for a in amps:
                samples += [a, -a] * (per // 2)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    loud_soft = [100, 2000] * 32          # alternating energy contour
    scaled = [a * 4 for a in loud_soft]   # same contour, 4x louder
    other = [2000, 100] * 32              # inverted rhythm
    rows = [
        (0, tone_pattern(loud_soft)),
        (1, tone_pattern(loud_soft)),     # exact copy
        (2, tone_pattern(scaled)),        # amplitude-scaled copy
        (3, tone_pattern(other)),
        (4, b"garbage"),
    ]
    blobs = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(blobs).collect()}
    assert fps[0] == fps[1] == fps[2]     # copy AND scaled copy identical
    assert fps[3] != fps[0]
    assert fps[4] is None
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup_pairs(blobs, max_hamming=0).collect()
    }
    assert pairs == {(0, 1): 0, (0, 2): 0, (1, 2): 0}
    # determinism
    again = {r["media_id"]: r["afp"] for r in audio_fingerprint(blobs).collect()}
    assert again == fps


def test_pq_encode_and_adc_hand_case(spark):
    """PQ invariants: a vector equal to codebook centroid c in every
    subspace encodes to [c]*m and has ADC distance 0 from an identical
    query; a different vector gets a nonzero distance; ties in the
    argmin break to the lowest centroid index; determinism."""
    from hadoop_fcfs_spark.llm.similarity import pq_adc_topk, pq_encode

    # dim 8, m=2 subspaces of dsub=4, ksub=3 centroids
    codebooks = [
        [[0.0, 0, 0, 0], [1.0, 1, 1, 1], [2.0, 2, 2, 2]],
        [[0.0, 0, 0, 0], [5.0, 5, 5, 5], [9.0, 9, 9, 9]],
    ]
    rows = [
        (0, [1.0, 1.0, 1.0, 1.0, 5.0, 5.0, 5.0, 5.0]),   # == centroid 1 / centroid 1
        (1, [2.0, 2.0, 2.0, 2.0, 0.0, 0.0, 0.0, 0.0]),   # == centroid 2 / centroid 0
        (2, [1.5, 1.5, 1.5, 1.5, 0.0, 0.0, 0.0, 0.0]),   # equidistant cb0[1]/cb0[2] -> tie to 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, codebooks).collect()}
    assert codes[0] == [1, 1] and codes[1] == [2, 0]
    assert codes[2][0] == 1  # tie breaks low
    # ADC: query identical to vec 0 -> dist 0, rank 1
    q = df.filter(F.col("vec_id") == 0)
    got = {
        (r["query_id"], r["vec_id"]): (r["dist_e6"], r["rank"])
        for r in pq_adc_topk(pq_encode(df, codebooks), q, codebooks, k=3).collect()
    }
    assert got[(0, 0)] == (0, 1)
    assert got[(0, 1)][0] > 0
    again = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, codebooks).collect()}
    assert again == codes


def test_ivf_pq_consistent_with_full_adc(spark):
    """IVFADC scans a probed SUBSET of full ADC: every returned pair's
    distance must equal the full scan's distance for that pair, and the
    probed top-k distance can only be >= the unrestricted top-k at the
    same rank (a subset can miss, never beat). With n_probe ==
    n_centroids the results are identical."""
    from pyspark.sql import functions as F

    from hadoop_fcfs_spark.llm.similarity import ivf_pq_topk, pq_adc_topk, pq_encode
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    cb_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    codebooks = [
        [[float(x) for x in r["embedding"][j * 16 : (j + 1) * 16]] for r in cb_rows]
        for j in range(4)
    ]
    queries = emb.filter(F.col("vec_id") < 3)
    full = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["dist_e6"])
        for r in pq_adc_topk(pq_encode(emb, codebooks), queries, codebooks, k=3).collect()
    }
    full_dists = {
        (r["query_id"], r["vec_id"]): r["dist_e6"]
        for r in pq_adc_topk(pq_encode(emb, codebooks), queries, codebooks, k=10**9).collect()
    }
    probed = ivf_pq_topk(emb, queries, codebooks, k=3, n_probe=2, centroids=cents).collect()
    for r in probed:
        assert full_dists[(r["query_id"], r["vec_id"])] == r["dist_e6"]
        assert r["dist_e6"] >= full[(r["query_id"], r["rank"])][1]
    # all cells probed == unrestricted scan
    all_probed = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["dist_e6"])
        for r in ivf_pq_topk(
            emb, queries, codebooks, k=3, n_probe=len(cents), centroids=cents
        ).collect()
    }
    assert all_probed == full


def test_kn_bigram_counts_hand_computed(spark):
    from hadoop_fcfs_spark.llm.textan import kn_bigram_counts

    # corpus: "a b", "a b", "a c", "c b" ->
    # bigrams: (a,b)x2 (a,c)x1 (c,b)x1; B=3 types
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "c b")],
        "doc_id long, text string",
    )
    out = {(r["w1"], r["w2"]): r for r in kn_bigram_counts(df, "doc_id", "text").collect()}
    ab = out[("a", "b")]
    assert (ab["c12"], ab["c1"], ab["left_types"], ab["right_types"]) == (2, 3, 2, 2)
    # p_kn(b|a) = (2-0.75)/3 + 0.75*2/3 * 2/3
    assert abs(ab["p_kn"] - ((2 - 0.75) / 3 + 0.75 * 2 / 3 * 2 / 3)) < 1e-12
    ac = out[("a", "c")]
    assert (ac["c12"], ac["right_types"]) == (1, 1)


def test_negative_pairs_deterministic_and_self_free(spark):
    from hadoop_fcfs_spark.ops.sampling import negative_pairs

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    p1 = sorted(map(tuple, negative_pairs(df, "id", k=2, n_buckets=16).collect()))
    p2 = sorted(map(tuple, negative_pairs(df, "id", k=2, n_buckets=16).collect()))
    assert p1 == p2  # replayable
    assert all(a != n for a, _, n in p1)  # self-free
    # every anchor draws at most k and at least k-1 partners
    from collections import Counter

    per_anchor = Counter(a for a, _, _ in p1)
    assert set(per_anchor.values()) <= {1, 2}
    assert len(per_anchor) == 100


def test_jaccard_prefix_pairs_matches_bruteforce(spark):
    from hadoop_fcfs_spark.llm.dedup import jaccard_prefix_pairs, ngram_jaccard_pairs

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # near-dup
        (4, "completely different words in this one entirely unrelated text"),
        (5, "another unrelated document with its own vocabulary of tokens"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 4)
        for r in jaccard_prefix_pairs(df, "doc_id", "text", n=3, threshold=0.4).collect()
    }
    # ngram_jaccard_pairs pre-rounds to 4 decimals — compare at that grain
    brute = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3).collect()
        if r["jaccard"] >= 0.4
    }
    assert got == brute and (1, 2) in got and got[(1, 2)] == 1.0


def test_gram_matrix_hand_computed(spark):
    from hadoop_fcfs_spark.llm.similarity import gram_matrix

    df = spark.createDataFrame([([1.0, 2.0],), ([3.0, 4.0],)], "v array<double>")
    out = {(r["i"], r["j"]): r["dot"] for r in gram_matrix(df, "v").collect()}
    assert out == {(1, 1): 10.0, (1, 2): 14.0, (2, 2): 20.0}
    q = {(r["i"], r["j"]): r["dot"] for r in gram_matrix(df, "v", quantize=10).collect()}
    assert q == {(1, 1): 10 * 10 + 30 * 30, (1, 2): 10 * 20 + 30 * 40, (2, 2): 20 * 20 + 40 * 40}


def test_dsir_log_weights_separates_target_vocab(spark):
    from hadoop_fcfs_spark.llm.dsir import dsir_log_weights

    import pyspark.sql.functions as F

    # target (is_t) docs speak vocab A; raw background speaks vocab B.
    # Probe docs 100 (pure A) and 101 (pure B) are NOT in the target set:
    # DSIR must rank 100 >> 101, with the signs matching the vocab.
    a = "alpha beta gamma delta"
    b = "uno dos tres cuatro"
    rows = (
        [(i, a, True) for i in range(100)]
        + [(i + 200, b, False) for i in range(100)]
        + [(1000, a, False), (1001, b, False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(df, "doc_id", "text", F.col("is_t")).collect()
    }
    assert got[1000] > 0 > got[1001]
    # weight is a pure function of the feature bag: identical text,
    # identical weight
    assert got[1000] == got[0]


def test_learn_bpe_merges_matches_python_reference(spark):
    from collections import Counter

    from hadoop_fcfs_spark.llm.bpe import END, learn_bpe_merges

    corpus = ["low lower lowest low low", "new newer newest new", "low newer"]

    # pure-Python Sennrich-style reference
    vocab = Counter()
    for line in corpus:
        for w in line.split():
            vocab[tuple(list(w) + [END])] += 1
    ref_merges = []
    for _ in range(6):
        pc = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        # argmax: count desc, then lexical — mirror the engine's tiebreak
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        ref_merges.append((a, b, n))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab

    df = spark.createDataFrame([(l,) for l in corpus], "text string")
    got_merges, got_vocab = learn_bpe_merges(df, "text", 6)
    assert got_merges == ref_merges
    got_syms = {
        r["word"]: tuple(r["symbols"]) for r in got_vocab.collect()
    }
    ref_syms = {"".join(s).replace(END, ""): s for s in vocab}
    assert got_syms == ref_syms


def test_learn_wordpiece_vocab_matches_python_reference(spark):
    """r14: the WordPiece merge loop (likelihood-ratio argmax +
    ##-stripping in-array rewrite) vs an independent pure-Python
    trainer with the same integer score_e12 and (score, count,
    lexical) tiebreak — merges AND final symbol arrays equal."""
    from collections import Counter

    from hadoop_fcfs_spark.llm.bpe import CONT, learn_wordpiece_vocab

    corpus = ["hug hug hug pug pun bun hugs", "hug pug pun hugs hugs"]

    vocab = Counter()
    for line in corpus:
        for w in line.split():
            vocab[tuple([w[0]] + [CONT + c for c in w[1:]])] += 1
    ref_merges = []
    for _ in range(6):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for syms, c in vocab.items():
            for s in syms:
                sc[s] += c
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        scored = {
            (a, b): (10**12 * n) // (sc[a] * sc[b])
            for (a, b), n in pc.items()
        }
        best = min(
            scored.items(), key=lambda kv: (-kv[1], -pc[kv[0]], kv[0])
        )
        (a, b), s12 = best
        ref_merges.append((a, b, s12, pc[(a, b)]))
        merged = a + (b[len(CONT):] if b.startswith(CONT) else b)
        new_vocab: Counter = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab

    df = spark.createDataFrame([(l,) for l in corpus], "text string")
    got_merges, got_vocab = learn_wordpiece_vocab(df, "text", 6)
    assert got_merges == ref_merges
    got_syms = {r["word"]: tuple(r["symbols"]) for r in got_vocab.collect()}
    ref_syms = {
        "".join(s).replace(CONT, ""): s for s in vocab
    }
    assert got_syms == ref_syms


def test_wordpiece_encode_longest_match_contract(spark):
    """r14: BERT greedy longest-match-first semantics — longest vocab
    prefix wins at every step, non-initial lookups carry '##',
    unmatchable remainder or over-length words give ONE whole-word
    [UNK] (not per-char fallback), NULL text encodes to [], and a
    fully-matched word's pieces concatenate back to it (round-trip)."""
    from hadoop_fcfs_spark.llm.bpe import wordpiece_encode

    vocab = {"un", "##aff", "##able", "##ff", "##a", "a", "hug", "##s",
             "h", "##u", "##g"}
    df = spark.createDataFrame(
        [(1, "unaffable hugs a"), (2, "unknown"), (3, None),
         (4, "x" * 101)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in wordpiece_encode(
            df, "text", vocab, id_col="doc_id"
        ).collect()
    }
    # longest-match: 'unaffable' -> un + ##aff + ##able (not ##a/##ff)
    assert got[1] == ["un", "##aff", "##able", "hug", "##s", "a"]
    assert got[2] == ["[UNK]"]  # 'k','n','o','w' not in vocab: whole-word
    assert got[3] == []
    assert got[4] == ["[UNK]"]  # max_word_chars=100 exceeded
    # round-trip on the matched word
    assert "".join(t[2:] if t.startswith("##") else t
                   for t in got[1][:3]) == "unaffable"


def _brute_best_segmentation(word, table):
    """Independent oracle for the Viterbi DP: enumerate EVERY
    segmentation of ``word`` over ``table`` pieces and pick the max by
    (score, fewer pieces, lexicographically smallest sequence)."""
    def rec(rest):
        if not rest:
            return [()]
        segs = []
        for l in range(1, len(rest) + 1):
            if rest[:l] in table:
                segs.extend((rest[:l],) + t for t in rec(rest[l:]))
        return segs

    segs = rec(word)
    if not segs:
        return None
    return list(
        min(
            segs,
            key=lambda s: (
                -sum(table[p] for p in s),
                len(s),
                s,
            ),
        )
    )


def test_unigram_lm_em_matches_python_replay(spark):
    """r14: the hard-EM unigram-LM trainer vs a full pure-Python
    replay — seed census, floor-micro-nat log-probs, brute-force-
    optimal segmentations (independent of the engine's DP), usage
    recount, unused-piece drop with the relative char floor, and the
    vocab_size prune — final (piece, logp_e6, usage) table equal."""
    import math
    from collections import Counter

    from hadoop_fcfs_spark.llm.bpe import unigram_lm_em

    corpus = ["low low low lower newest newest", "new newest lowest low"]
    max_len, min_count, iters = 3, 2, 2

    words = Counter(w for line in corpus for w in line.split())
    counts: Counter = Counter()
    types_per: dict = {}
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                counts[w[i : i + l]] += c
    counts = Counter(
        {p: c for p, c in counts.items() if len(p) == 1 or c >= min_count}
    )
    total = sum(counts.values())
    logp = {
        p: math.floor(math.log(c / total) * 1_000_000)
        for p, c in counts.items()
    }
    usage = dict(counts)
    for _ in range(iters):
        usage = {}
        for w, c in words.items():
            seg = _brute_best_segmentation(w, logp)
            if seg is None:
                continue
            for piece in seg:
                usage[piece] = usage.get(piece, 0) + c
        for p in list(logp):
            if p not in usage and len(p) > 1:
                del logp[p]
        tot_used = sum(usage.values())
        new_logp = {
            p: math.floor(math.log(usage[p] / tot_used) * 1_000_000)
            for p in logp
            if p in usage
        }
        floor = (min(new_logp.values()) if new_logp else 0) - 1_000_000
        for p in logp:
            if p not in usage:
                new_logp[p] = floor
        logp = new_logp
    ref = sorted(
        ((p, logp[p], usage.get(p, 0)) for p in logp),
        key=lambda t: (-t[2], t[0]),
    )

    df = spark.createDataFrame([(l,) for l in corpus], "text string")
    got = unigram_lm_em(
        df, "text", max_len=max_len, min_count=min_count,
        n_iterations=iters,
    )
    assert got == ref


def test_unigram_lm_em_startup_is_one_corpus_scan(spark):
    """r15 (r14 verdict #2 / ADVICE #2): trainer startup reads the
    corpus exactly ONCE — the seed census derives from the waypointed
    word-TYPE table (shared _seed_from_vocab body, not a re-derivation
    from the raw corpus) and the waypointed seed serves both the
    max_pieces guard count and the collect; the refuse-early contract
    (count before collect) is unchanged. Pinned behaviorally with a
    side-effect UDF text source: the r14 shape evaluated each corpus
    row ~3x (types waypoint fill + the seed census's own corpus
    re-scan for count, then again for collect); now exactly once,
    including through a full EM iteration (the E-step reads the types
    cache). Output equivalence is covered by the replay test above,
    which runs the refactored trainer against the independent
    pure-Python reference."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    from hadoop_fcfs_spark.caching import release_waypoints
    from hadoop_fcfs_spark.llm.bpe import unigram_lm_em

    acc = spark.sparkContext.accumulator(0)

    def tracked(t):
        acc.add(1)
        return t

    utext = F.udf(tracked, StringType())
    corpus = ["low low low lower newest newest", "new newest lowest low"]
    df = spark.createDataFrame(
        [(l,) for l in corpus], "raw string"
    ).withColumn("text", utext("raw"))
    model = unigram_lm_em(df, "text", max_len=3, min_count=2,
                          n_iterations=1)
    assert model, "trainer must produce a model on this corpus"
    assert acc.value == len(corpus), (
        f"corpus scanned {acc.value / len(corpus):.1f}x at startup; "
        "must be exactly once"
    )
    release_waypoints()


def test_unigram_viterbi_encode_roundtrip_and_unk(spark):
    """r14: unigram inference — encoded pieces concatenate back to
    every coverable word (round-trip), a word with an unseeded char
    encodes to ONE [UNK], NULL text to [], and encode(train corpus)
    reproduces the trainer's own argmax segmentations (shared Viterbi
    kernel)."""
    from hadoop_fcfs_spark.llm.bpe import (
        unigram_lm_em,
        unigram_viterbi_encode,
    )

    corpus = ["low low low lower newest newest", "new newest lowest low"]
    df = spark.createDataFrame([(l,) for l in corpus], "text string")
    model = unigram_lm_em(df, "text", max_len=3, min_count=2,
                          n_iterations=2)
    enc = spark.createDataFrame(
        [(1, "lowest newest"), (2, "löw"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in unigram_viterbi_encode(
            enc, "text", model, id_col="doc_id"
        ).collect()
    }
    assert "".join(got[1]) == "lowestnewest"
    assert got[2] == ["[UNK]"]  # 'ö' never seeded
    assert got[3] == []
    # trainer-consistency: re-encoding the train corpus segments every
    # word with pieces whose usage the trainer counted (> 0)
    table = {p: u for p, _, u in model}
    retrain = unigram_viterbi_encode(df, "text", model).collect()
    for row in retrain:
        for tok in row["tokens"]:
            assert table.get(tok, 0) > 0, tok

    # vocab_size prune keeps all single chars + top multi-char pieces
    pruned = unigram_lm_em(
        df, "text", max_len=3, min_count=2, n_iterations=1,
        vocab_size=10,
    )
    n_chars = sum(1 for p, _, _ in pruned if len(p) == 1)
    assert len(pruned) <= max(10, n_chars)
    assert {p for p, _, _ in pruned if len(p) == 1} == set(
        "".join(corpus).replace(" ", "")
    )

    # max_pieces guard raises up front, before any collect of a big table
    with pytest.raises(ValueError, match="max_pieces"):
        unigram_lm_em(df, "text", max_len=3, min_count=1, max_pieces=3)


def test_rrf_fusion_semantics_and_knn_planted_labels(spark):
    from hadoop_fcfs_spark.llm.similarity import knn_classify
    from hadoop_fcfs_spark.ops.ranking import reciprocal_rank_fusion

    # RRF: item 1 is rank 1 in both lists; item 2 only in list A; item 3
    # only in list B. Hand-compute the fused scores.
    a = spark.createDataFrame([(1, 1), (2, 2)], "id int, rank int")
    b = spark.createDataFrame([(1, 1), (3, 2)], "id int, rank int")
    got = {
        r["id"]: (r["in_lists"], r["rrf"])
        for r in reciprocal_rank_fusion([a, b], "id", k=60).collect()
    }
    assert got[1] == (2, 1 / 61 + 1 / 61)
    assert got[2] == (1, 1 / 62)
    assert got[3] == (1, 1 / 62)

    # kNN: two well-separated clusters + one mislabeled point — its
    # neighbors out-vote its own label
    import random

    rng = random.Random(3)
    rows = []
    for i in range(20):
        rows.append((i, [1.0 + rng.random() * 0.01, 0.0, 0.0], 0))
    for i in range(20, 40):
        rows.append((i, [0.0, 1.0 + rng.random() * 0.01, 0.0], 1))
    rows.append((99, [1.0, 0.001, 0.0], 1))  # sits in cluster 0, labeled 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    pred = {
        r["query_id"]: (r["true_label"], r["pred_label"])
        for r in knn_classify(emb, emb, k=5).collect()
    }
    assert pred[99] == (1, 0)          # flagged as label noise
    assert pred[0] == (0, 0) and pred[25] == (1, 1)


def test_char_class_profile_hand_counts(spark):
    from hadoop_fcfs_spark.llm.textan import char_class_profile

    df = spark.createDataFrame(
        [(1, "ab 12 中文!"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in char_class_profile(df, "doc_id", "text").collect()}
    assert got[1]["n_latin"] == 2 and got[1]["n_digit"] == 2
    assert got[1]["n_cjk"] == 2 and got[1]["n_space"] == 2
    assert got[1]["n_other"] == 1  # the '!'
    assert got[1]["n_chars_total"] == 9
    assert got[2]["n_chars_total"] == 0 and got[2]["n_other"] == 0


def test_tfidf_cosine_pairs_identical_docs_and_pruning(spark):
    from hadoop_fcfs_spark.llm.textan import tfidf_cosine_pairs

    # docs 1 and 2 identical -> cosine exactly 1.0 (1e6 quantized);
    # 'the' appears in all 4 docs -> pruned (df > N/2), so doc 3 shares
    # nothing with 1/2 after pruning and produces NO pair with 4
    rows = [
        (1, "the alpha beta gamma"),
        (2, "the alpha beta gamma"),
        (3, "the zeta"),
        (4, "the omega"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["shared_terms"], r["cos_e6"])
        for r in tfidf_cosine_pairs(df, "doc_id", "text").collect()
    }
    # identical docs: dot == n2 exactly, but sqrt(n2)*sqrt(n2) may land
    # one ulp above n2, so the floor-micro cosine is 999999 or 1000000
    # (deterministically the SAME value in both engines — the gate
    # hash-compares it)
    assert set(got) == {(1, 2)}
    shared, cos = got[(1, 2)]
    assert shared == 3 and cos in (999_999, 1_000_000)


def test_kcenter_greedy_picks_spread_points(spark):
    from hadoop_fcfs_spark.llm.similarity import kcenter_greedy

    # a tight cluster at origin (ids 0-9), one far point on x (id 50),
    # one far point on y (id 51): greedy must pick both far points
    # right after the seed
    rows = [(i, [0.001 * i, 0.0]) for i in range(10)]
    rows += [(50, [10.0, 0.0]), (51, [0.0, 8.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    chosen = kcenter_greedy(df, k=3)
    assert [c[0] for c in chosen] == [1, 2, 3]
    assert chosen[0][1] == 0          # deterministic seed: min id
    assert {chosen[1][1], chosen[2][1]} == {50, 51}
    assert chosen[1][1] == 50         # x-point is farther -> picked first
    assert chosen[1][2] == 10000 * 10000  # exact integer distance
    # replay determinism
    assert kcenter_greedy(df, k=3) == chosen


def test_jaccard_prefix_pairs_exact_integer_thresholds(spark):
    from hadoop_fcfs_spark.llm.dedup import jaccard_prefix_pairs

    # Adversarial case for binary-float threshold math: t=0.1, |a|=30,
    # |b|=3, all 3 of b's words shared, J = 3/30 = 0.1 exactly (>= t).
    # The shared words have df=2 so they rank LAST in a's rarest-first
    # prefix order (positions 28-30). float 0.1*30 = 3.0000000000000004
    # -> ceil 4 over-pruned both a's prefix (27 vs 28) and the length
    # filter (ceil(t*30)=4 > 3), silently dropping this true pair; the
    # exact-rational bounds keep it.
    a_words = " ".join(f"w{i:02d}" for i in range(27)) + " s1 s2 s3"
    df = spark.createDataFrame(
        [(1, a_words), (2, "s1 s2 s3")], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(
            df, "doc_id", "text", n=1, threshold=0.1
        ).collect()
    }
    assert got == {(1, 2): 0.1}


def test_kcenter_greedy_k_exceeding_corpus(spark):
    from hadoop_fcfs_spark.llm.similarity import kcenter_greedy

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    chosen = kcenter_greedy(df, k=10)
    assert [c[0] for c in chosen] == [1, 2, 3]  # complete cover, no crash
    assert {c[1] for c in chosen} == {0, 1, 2}

    import pytest as _pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty corpus"):
        kcenter_greedy(empty, k=1)


def test_mutual_topk_pairs_kills_hub_matches(spark):
    from hadoop_fcfs_spark.llm.similarity import cosine_topk, mutual_topk_pairs

    # 1 and 2 are near-identical (mutual); 3's top-1 is 1 but 1's
    # top-1 is 2 — the hub match (3->1) must NOT survive reciprocity
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.01]),
        (3, [0.7, 0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["doc_a"], r["doc_b"])
        for r in mutual_topk_pairs(cosine_topk(df, df, k=1)).collect()
    ]
    assert got == [(1, 2)]


def test_greedy_max_coverage_hand_case(spark):
    from hadoop_fcfs_spark.llm.dsir import greedy_max_coverage

    # doc 10 covers {a,b,c}; doc 20 covers {c,d}; doc 30 covers {a,b}
    # greedy: pick 10 (gain 3), then 20 (gain 1: only d is new — 30's
    # residual gain is 0 so it is never picked); k=5 stops early at 2
    rows = [(10, g) for g in "abc"] + [(20, g) for g in "cd"] + [(30, g) for g in "ab"]
    df = spark.createDataFrame(rows, "doc long, item string")
    got = greedy_max_coverage(df, k=5)
    assert got == [(1, 10, 3), (2, 20, 1)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        greedy_max_coverage(df, k=0)


def test_bpe_encode_reproduces_trainer_vocab(spark):
    from hadoop_fcfs_spark.llm.bpe import bpe_encode, learn_bpe_merges

    texts = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new wider wide"),
        (3, "low new wide wider lowest"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges, vocab = learn_bpe_merges(df, "text", n_merges=8)
    assert len(merges) == 8

    # the trainer's final symbol arrays ARE the encode of each word
    # type — encoding the corpus must reproduce them word-for-word
    expect = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
    pairs = [(l, r) for l, r, _ in merges]
    enc = bpe_encode(df, "text", pairs, id_col="doc_id")
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"]) for r in enc.collect()}
    for doc_id, text, *_ in [(a, b) for a, b, in texts]:
        flat = [s for w in text.split() for s in expect[w]]
        assert got[doc_id][0] == flat and got[doc_id][1] == len(flat)

    # zero merges = plain char + </w> split
    got0 = bpe_encode(df.limit(1), "text", [], id_col="doc_id").collect()[0]
    assert got0["tokens"][:4] == ["l", "o", "w", "</w>"]


def test_temperature_mix_upsamples_small_groups(spark):
    from hadoop_fcfs_spark.ops.sampling import temperature_mix

    # 400 'big' rows vs 25 'small': alpha=0.5 must give the small group
    # a HIGHER per-row keep probability, and p caps at 1.0
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, "id long, g string")
    kept = temperature_mix(df, "g", "id", budget_num=1, budget_den=2)
    counts = {r["g"]: r["n"] for r in kept.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # expected p: s = 20 + 5 = 25; B = 212.5; p_big = 212.5*20/25/400 = 0.425
    # p_small = 212.5*5/25/25 = 1.7 -> capped at 1.0: ALL small rows kept
    assert counts["small"] == 25
    assert 0.3 * 400 < counts["big"] < 0.55 * 400
    # deterministic replay
    k2 = temperature_mix(df, "g", "id", budget_num=1, budget_den=2)
    assert sorted(r["id"] for r in kept.collect()) == sorted(r["id"] for r in k2.collect())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mix(df, "g", "id", budget_num=0, budget_den=5)


def test_jaccard_prefix_pairs_random_corpus_all_thresholds(spark):
    """Seeded-random brute-force equality across thresholds where t·n
    hits exact integers (the binary-float ceil trap) and where it
    doesn't — completeness + exactness of the rational-arithmetic
    bounds in one sweep."""
    import random

    from hadoop_fcfs_spark.llm.dedup import jaccard_prefix_pairs, ngram_jaccard_pairs

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(30):
        k = rng.randint(3, 20)
        docs.append((i, " ".join(rng.sample(vocab, k))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    brute_all = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=1).collect()
    }
    for t in (0.1, 0.25, 0.2, 0.5, 0.75):
        got = {
            (r["doc_a"], r["doc_b"]): round(r["jaccard"], 4)
            for r in jaccard_prefix_pairs(
                df, "doc_id", "text", n=1, threshold=t
            ).collect()
        }
        # membership must match the brute-force filter at >= t (both
        # sides pre-rounded @4 by their operators; vocab of 40 makes
        # every jaccard a coarse rational, far from the 1e-4 grid)
        assert set(got) == {p for p, v in brute_all.items() if v >= t}, t


def test_jaccard_prefix_pairs_long_decimal_threshold_no_overflow(spark):
    from hadoop_fcfs_spark.llm.dedup import jaccard_prefix_pairs

    # threshold=1/3: str() gives 16 decimal digits; without
    # limit_denominator the rational bounds carry q=1e16 and
    # p*(za+zb) overflows BIGINT for documents with thousands of
    # shingles (ANSI Spark ARITHMETIC_OVERFLOW). limit_denominator
    # snaps the float artifact back to exactly 1/3 AND keeps the
    # integer bounds tiny.
    shared = " ".join(f"s{i}" for i in range(750))
    a = shared + " " + " ".join(f"a{i}" for i in range(750))
    b = shared + " " + " ".join(f"b{i}" for i in range(750))
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(
            df, "doc_id", "text", n=1, threshold=1 / 3
        ).collect()
    }
    # J = 750/2250 = 1/3 exactly — the >= boundary must be INCLUDED
    assert set(got) == {(1, 2)} and abs(got[(1, 2)] - 1 / 3) < 1e-12


def test_bpe_encode_null_and_unicode_whitespace(spark):
    from hadoop_fcfs_spark.llm.bpe import bpe_encode, learn_bpe_merges

    # NBSP inside 'a\xa0b': Java \s+ (trainer) does NOT split it — the
    # encoder must treat it as ONE word type exactly like the trainer;
    # Python str.split() would have split it and broken the round-trip
    df = spark.createDataFrame(
        [(1, "a\xa0b a\xa0b cd"), (2, None)], "doc_id long, text string"
    )
    merges, vocab = learn_bpe_merges(df, "text", n_merges=3)
    expect = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
    assert "a\xa0b" in expect  # the trainer saw one NBSP-joined type
    enc = bpe_encode(df, "text", [(l, r) for l, r, _ in merges], id_col="doc_id")
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"]) for r in enc.collect()}
    flat1 = [s for w in ["a\xa0b", "a\xa0b", "cd"] for s in expect[w]]
    assert got[1] == (flat1, len(flat1))
    assert got[2] == ([], 0)  # NULL text -> empty, never the word 'None'


def test_ngram_novelty_hand_corpus(spark):
    from hadoop_fcfs_spark.llm.textan import ngram_novelty

    # doc 0: 4 tokens -> grams {a b c, b c d} (both first here)
    # doc 5: repeats doc 0's text -> 2 grams, 0 novel
    # doc 9: one shared gram (a b c), one new (c d e... actually b c e)
    # doc 3: too short (2 tokens) -> excluded from the curve
    rows = [
        (0, "a b c d"),
        (3, "x y"),
        (5, "a b c d"),
        (9, "a b c e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in
           ngram_novelty(df, "doc_id", "text", n=3, buckets=10).collect()}
    # buckets: doc*10 div 10 = doc id itself
    assert 3 not in out
    assert out[0]["n_grams"] == 2 and out[0]["n_novel"] == 2
    assert out[0]["novelty_e6"] == 1_000_000
    assert out[5]["n_grams"] == 2 and out[5]["n_novel"] == 0
    assert out[9]["n_grams"] == 2 and out[9]["n_novel"] == 1
    assert out[9]["novelty_e6"] == 500_000


def test_knn_ndcg_hand_values(spark, tmp_path):
    """NDCG@10 literal-table arithmetic on a constructed 2-D embedding
    set with forced distinct cosines: for query 0, relevant hits at
    ranks 1 and 3 give DCG = D1+D3 and R=2 gives IDCG = CUM[2]."""
    import pyspark.sql.functions as F

    from hadoop_fcfs_spark.queries_llm import _NDCG_CUM, _NDCG_D, knn_ndcg_labels

    rows = [
        (0, [1.0, 0.0], 1),     # query
        (1, [1.0, 0.1], 1),     # cos ~.995  rank 1, relevant
        (2, [1.0, 0.3], 0),     # cos ~.958  rank 2, not
        (3, [0.0, 1.0], 1),     # cos 0      rank 3, relevant
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    out = {r["query_id"]: r for r in knn_ndcg_labels(spark, sf).collect()}
    q0 = out[0]
    assert q0["n_rel_top10"] == 2 and q0["r_total"] == 2
    want = (_NDCG_D[0] + _NDCG_D[2]) * 1_000_000 // _NDCG_CUM[1]
    assert q0["ndcg_micro"] == want
    # query 2's label-0 class has no other member: r_total = 0 -> the
    # query drops from the report (no relevant docs, NDCG undefined)
    assert 2 not in out and {0, 1, 3} <= set(out)
    # perfect retrieval: query 1 ranks its two same-label vectors 1-2?
    # v0 cos(v1,v0)~.995 rank1 rel, v2 cos~.985 rank2 not... just assert
    # every reported ndcg is a valid micro value
    assert all(0 <= r["ndcg_micro"] <= 1_000_000 for r in out.values())


def test_knn_map_hand_values(spark, tmp_path):
    """AP@10 lcm-2520 arithmetic on the ndcg fixture: query 0 has
    relevant hits at ranks 1 and 3 (hits@1=1, hits@3=2), so
    ap_num = 2520*1 + (2520//3)*2 = 4200 over denom 2520*min(2,10),
    i.e. AP = (1 + 2/3)/2 = 5/6."""
    from hadoop_fcfs_spark.queries_llm import knn_map_labels

    rows = [
        (0, [1.0, 0.0], 1),     # query
        (1, [1.0, 0.1], 1),     # rank 1, relevant
        (2, [1.0, 0.3], 0),     # rank 2, not
        (3, [0.0, 1.0], 1),     # rank 3, relevant
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    out = {r["query_id"]: r for r in knn_map_labels(spark, sf).collect()}
    q0 = out[0]
    assert q0["n_rel_top10"] == 2 and q0["r_total"] == 2
    assert q0["ap_micro"] == 4200 * 1_000_000 // 5040 == 833_333
    # zero-relevant query drops (ndcg convention); perfect single-hit
    # retrieval (query 3: only relevant doc at rank 1 of R=2... just
    # bound-check every reported value
    assert 2 not in out and {0, 1, 3} <= set(out)
    assert all(0 <= r["ap_micro"] <= 1_000_000 for r in out.values())


def _make_bmp(pixels):
    """Minimal 24-bit uncompressed BMP writer (rows top-to-bottom in;
    stored bottom-up per the format). pixels: list of rows of (r,g,b)."""
    h = len(pixels)
    w = len(pixels[0])
    stride = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for row in reversed(pixels):  # bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))  # BGR
        line += b"\x00" * (stride - len(line))
        body += line
    off = 14 + 40
    size = off + len(body)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(hdr + body)


def test_bmp_decode_is_real(spark):
    """BMP payloads decode FOR REAL (pure numpy): exact dimensions and
    luma from known pixels, fake=False works for BMP and still raises
    for compressed formats."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import (
        attach_media_meta,
        decode_images,
        image_ahash,
    )

    white = [(255, 255, 255)] * 4
    black = [(0, 0, 0)] * 4
    half = [
        [(0, 0, 0), (0, 0, 0), (255, 255, 255), (255, 255, 255)],
        [(0, 0, 0), (0, 0, 0), (255, 255, 255), (255, 255, 255)],
    ]
    rows = [
        (1, _make_bmp([white, white])),          # 4x2 all-white
        (2, _make_bmp(half)),                    # half black / half white
        (3, _make_bmp([black, black, black])),   # 4x3 all-black
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = {r["media_id"]: r["media_meta"]["format"]
            for r in attach_media_meta(df).collect()}
    assert meta == {1: "bmp", 2: "bmp", 3: "bmp"}

    out = {r["media_id"]: r for r in decode_images(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (4, 2)
    assert out[1]["mean_luma"] == 1.0
    assert out[2]["mean_luma"] == 0.5
    assert (out[3]["width"], out[3]["height"], out[3]["mean_luma"]) == (4, 3, 0.0)

    # malformed JPEG keeps the strict boundary under fake=False (JPEG
    # decodes for real since r9 — see test_jpeg_decode_is_real)
    jpeg = spark.createDataFrame(
        [(9, b"\xff\xd8\xff\xe0xxxx")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="truncated JPEG|malformed JPEG"):
        decode_images(jpeg, fake=False).collect()

    # REAL aHash: a noise-perturbed copy collides, an inverted image differs
    import random

    rng = random.Random(3)
    grad = [
        [(16 * c, 16 * c, 16 * c) for c in range(16)] for _ in range(16)
    ]
    noisy = [
        [tuple(min(255, max(0, v + rng.randint(-2, 2))) for v in px) for px in row]
        for row in grad
    ]
    inv = [[tuple(255 - v for v in px) for px in row] for row in grad]
    hdf = spark.createDataFrame(
        [(1, _make_bmp(grad)), (2, _make_bmp(noisy)), (3, _make_bmp(inv))],
        "media_id long, payload binary",
    )
    hashes = {r["media_id"]: r["ahash"]
              for r in image_ahash(hdf, fake=False).collect()}
    assert hashes[1] == hashes[2], "near-identical BMPs must collide"
    assert hashes[1] != hashes[3], "inverted image must differ"


def test_bmp_resize_real_roundtrip(spark):
    """BMP resize is real: nearest-neighbor downsample of a known
    quadrant image re-encodes as a valid BMP whose decoded pixels are
    the expected quadrant colors."""
    from hadoop_fcfs_spark.llm.multimodal import decode_images, resize_images

    # 8x8: top-left black, top-right white, bottom-left white, bottom-right black
    def quad(r, c):
        return (255, 255, 255) if (r < 4) != (c < 4) else (0, 0, 0)

    img = [[quad(r, c) for c in range(8)] for r in range(8)]
    df = spark.createDataFrame(
        [(1, _make_bmp(img))], "media_id long, payload binary"
    )
    small = resize_images(df, 2, 2, fake=False)
    out = small.collect()[0]
    assert (out["width"], out["height"]) == (2, 2)
    # decode the resized payload: mean luma of the 2x2 quadrant image = 0.5
    dec = decode_images(small, fake=False).collect()[0]
    assert (dec["width"], dec["height"]) == (2, 2)
    assert dec["mean_luma"] == 0.5


def test_y4m_frame_sampling_is_real(spark):
    """Y4M video frames extract FOR REAL: frame count matches the
    container, identical frames share a digest, a changed frame
    differs, and compressed containers still raise under fake=False."""
    import hashlib

    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import attach_media_meta, sample_frames

    w, h = 4, 2
    ysize, csize = w * h, (w * h) // 2
    ya = bytes([10] * ysize)
    yb = bytes([200] * ysize)
    chroma = bytes([128] * csize)
    y4m = (
        b"YUV4MPEG2 W4 H2 F25:1 Ip A0:0 C420jpeg\n"
        + b"FRAME\n" + ya + chroma
        + b"FRAME\n" + ya + chroma
        + b"FRAME\n" + yb + chroma
    )
    df = spark.createDataFrame([(1, y4m)], "media_id long, payload binary")
    assert (
        attach_media_meta(df).collect()[0]["media_meta"]["format"] == "y4m"
    )
    rows = sorted(
        (r["frame_idx"], r["frame_digest"])
        for r in sample_frames(df, fake=False).collect()
    )
    assert len(rows) == 3
    assert rows[0][1] == rows[1][1] == hashlib.md5(ya).hexdigest()
    assert rows[2][1] == hashlib.md5(yb).hexdigest()

    webm = spark.createDataFrame(
        [(2, b"\x1a\x45\xdf\xa3rest")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        sample_frames(webm, fake=False).collect()


def _make_png(pixels, filters=None, color_type=2, split_idat=False):
    """Hand-rolled PNG writer independent of the engine's encoder:
    per-scanline filter TYPES are chosen by the caller and the filter
    arithmetic (Sub/Up/Average/Paeth deltas) is computed here with the
    spec formulas, so decoding exercises real unfiltering — not a
    round-trip through the code under test. pixels: rows of (r,g,b)
    tuples (color_type=2) or ints (color_type=0)."""
    import zlib

    h = len(pixels)
    w = len(pixels[0])
    ch = 3 if color_type == 2 else 1
    bpp = ch
    filters = filters or [0] * h
    flat = []
    for row in pixels:
        line = []
        for px in row:
            line.extend(px if isinstance(px, tuple) else (px,))
        flat.append(line)
    raw = bytearray()
    prior = [0] * (w * ch)
    for y, f in enumerate(filters):
        cur = flat[y]
        raw.append(f)
        for x in range(w * ch):
            a = cur[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if f == 0:
                enc = cur[x]
            elif f == 1:
                enc = (cur[x] - a) & 0xFF
            elif f == 2:
                enc = (cur[x] - b) & 0xFF
            elif f == 3:
                enc = (cur[x] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (cur[x] - pr) & 0xFF
            else:
                raise ValueError(f)
            raw.append(enc)
        prior = cur

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    comp = zlib.compress(bytes(raw))
    if split_idat:
        mid = len(comp) // 2
        idat = chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
    else:
        idat = chunk(b"IDAT", comp)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + idat
        + chunk(b"IEND", b"")
    )


def test_png_decode_is_real(spark):
    """PNG decodes FOR REAL (stdlib zlib + numpy): known pixels come
    back exactly through EVERY scanline filter type (0-4), IDAT may be
    split across chunks, grayscale works, and unsupported variants /
    malformed JPEG keep the strict boundary under fake=False."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import (
        attach_media_meta,
        decode_images,
    )

    white = [(255, 255, 255)] * 4
    black = [(0, 0, 0)] * 4
    half = [
        [(0, 0, 0), (0, 0, 0), (255, 255, 255), (255, 255, 255)],
        [(0, 0, 0), (0, 0, 0), (255, 255, 255), (255, 255, 255)],
    ]
    # a 5-row gradient so every filter type sees non-trivial deltas
    grad = [
        [(10 * r + 5 * c, 20 * r, 3 * c) for c in range(6)] for r in range(5)
    ]
    rows = [
        (1, _make_png([white, white])),                       # 4x2 white
        (2, _make_png(half, filters=[2, 4], split_idat=True)),  # Up+Paeth
        (3, _make_png([black] * 3, filters=[1, 3, 4])),       # Sub/Avg/Paeth
        (4, _make_png(grad, filters=[0, 1, 2, 3, 4])),        # all five
        (5, _make_png([[0, 128, 255], [255, 128, 0]], color_type=0)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = {r["media_id"]: r["media_meta"]["format"]
            for r in attach_media_meta(df).collect()}
    assert set(meta.values()) == {"png"}

    out = {r["media_id"]: r for r in decode_images(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["mean_luma"]) == (4, 2, 1.0)
    assert out[2]["mean_luma"] == 0.5
    assert (out[3]["width"], out[3]["height"], out[3]["mean_luma"]) == (4, 3, 0.0)
    # gradient luma: exact mean of (r+g+b)/3 over the 5x6 grid
    exp = sum(
        (10 * r + 5 * c + 20 * r + 3 * c) / 3.0
        for r in range(5) for c in range(6)
    ) / 30.0 / 255.0
    assert abs(out[4]["mean_luma"] - (exp * 1e6 // 1 / 1e6)) < 1e-9
    assert (out[5]["width"], out[5]["height"], out[5]["mean_luma"]) == (
        3, 2, (127.66666666666667 / 255.0 * 1e6) // 1 / 1e6,
    )

    jpeg = spark.createDataFrame(
        [(9, b"\xff\xd8\xff\xe0rest-of-jpeg")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="truncated JPEG|malformed JPEG"):
        decode_images(jpeg, fake=False).collect()


def test_png_ahash_and_resize_real(spark):
    """The PNG path shares the decoded-pixel aHash: a noise-perturbed
    copy collides, an inversion differs, and a BMP and PNG of the SAME
    image hash identically (the hash is over pixels, not containers).
    Resize re-encodes a valid truecolor PNG whose decoded quadrants
    match."""
    import random

    from hadoop_fcfs_spark.llm.multimodal import (
        decode_images,
        image_ahash,
        resize_images,
    )

    rng = random.Random(7)
    grad = [[(16 * c, 16 * c, 16 * c) for c in range(16)] for _ in range(16)]
    noisy = [
        [tuple(min(255, max(0, v + rng.randint(-2, 2))) for v in px) for px in row]
        for row in grad
    ]
    inv = [[tuple(255 - v for v in px) for px in row] for row in grad]
    hdf = spark.createDataFrame(
        [
            (1, _make_png(grad, filters=[1, 2, 3, 4] * 4)),
            (2, _make_png(noisy)),
            (3, _make_png(inv)),
            (4, _make_bmp(grad)),
        ],
        "media_id long, payload binary",
    )
    hashes = {r["media_id"]: r["ahash"]
              for r in image_ahash(hdf, fake=False).collect()}
    assert hashes[1] == hashes[2], "near-identical PNGs must collide"
    assert hashes[1] != hashes[3], "inverted image must differ"
    assert hashes[1] == hashes[4], "same pixels, BMP vs PNG: same hash"

    def quad(r, c):
        return (255, 255, 255) if (r < 4) != (c < 4) else (0, 0, 0)

    img = [[quad(r, c) for c in range(8)] for r in range(8)]
    df = spark.createDataFrame(
        [(1, _make_png(img, filters=[4] * 8))], "media_id long, payload binary"
    )
    small = resize_images(df, 2, 2, fake=False)
    out = small.collect()[0]
    assert bytes(out["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
    dec = decode_images(small, fake=False).collect()[0]
    assert (dec["width"], dec["height"], dec["mean_luma"]) == (2, 2, 0.5)


def test_fake_mode_is_total_on_png_prefixed_garbage(spark):
    """fake=True stays TOTAL for the PNG path too: signature-prefixed
    garbage and unsupported variants (16-bit, interlaced) take the
    deterministic fake path; fake=False raises."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import decode_images, image_ahash

    sig = b"\x89PNG\r\n\x1a\n"
    good = _make_png([[(1, 2, 3)]])
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1  # IHDR interlace byte → Adam7
    rows = [
        (1, sig + b"garbage after the signature"),
        (2, bytes(interlaced)),
        (3, good[:20]),  # truncated mid-IHDR
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    assert len(decode_images(df, fake=True).collect()) == 3
    assert len(image_ahash(df, fake=True).collect()) == 3
    with _pytest.raises(Exception, match="PNG|unsupported|malformed"):
        decode_images(df, fake=False).collect()


def test_fake_mode_is_total_on_bm_prefixed_garbage(spark):
    """fake=True must be TOTAL (r6 advice): an arbitrary blob that
    happens to start with 'BM' (or an unsupported BMP variant) takes
    the deterministic fake path instead of crashing the executor task;
    fake=False keeps raising on the same payloads."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import (
        decode_images,
        image_ahash,
        resize_images,
    )

    rows = [
        (1, b"BMnot really a bitmap at all, just prefixed"),  # garbage
        (2, _make_bmp([[(9, 9, 9)] * 4]) [:40]),              # truncated BMP
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    assert len(decode_images(df, fake=True).collect()) == 2
    assert len(image_ahash(df, fake=True).collect()) == 2
    assert len(resize_images(df, 4, 4, fake=True).collect()) == 2

    for op in (
        lambda d: decode_images(d, fake=False),
        lambda d: image_ahash(d, fake=False),
        lambda d: resize_images(d, 4, 4, fake=False),
    ):
        with _pytest.raises(Exception, match="BMP|truncated|unsupported"):
            op(df).collect()


def test_y4m_malformed_errors_are_explicit(spark):
    """Malformed Y4M payloads raise the explicit malformed/truncated
    message (r6 advice), never a bare str.index 'substring not found'
    — including trailing bytes with no newline after a valid frame."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import sample_frames

    w, h = 4, 2
    ysize, csize = w * h, (w * h) // 2
    frame = b"FRAME\n" + bytes([10] * ysize) + bytes([128] * csize)
    good_hdr = b"YUV4MPEG2 W4 H2 F25:1 Ip A0:0 C420jpeg\n"
    cases = [
        b"YUV4MPEG2 W4 H2 no newline at all",       # unterminated header
        good_hdr + frame + b"FRAMEXX-no-newline",    # marker, no newline
        good_hdr + frame + b"trailing garbage",      # no FRAME marker
    ]
    for i, payload in enumerate(cases):
        df = spark.createDataFrame(
            [(i, payload)], "media_id long, payload binary"
        )
        for fk in (True, False):
            with _pytest.raises(Exception, match="malformed Y4M|unterminated"):
                sample_frames(df, fake=fk).collect()


def test_mingram_blocking_quality_planted_miss(spark):
    """Constructed corpus where min-shingle blocking provably hits one
    true pair and misses another: docs 1/2 share their minimum 3-gram
    ('a b c'), docs 3/4 are J=0.6 near-dups whose minimum grams differ
    ('w v t' vs 'w v u') — PC = 1/2, RR = 1 - 1/6."""
    from hadoop_fcfs_spark.llm.dedup import mingram_blocking_quality

    docs = [
        (1, "a b c d e f"),
        (2, "a b c d e g"),
        (3, "z y x w v u"),
        (4, "z y x w v t"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = mingram_blocking_quality(df, "doc_id", "text", n=3, threshold=0.5).collect()[0]
    assert out["n_docs"] == 4
    assert out["n_truth"] == 2      # (1,2) and (3,4), both J = 3/5
    assert out["n_cand"] == 1       # only (1,2) share a min-gram
    assert out["n_hit"] == 1
    assert out["pc_micro"] == 500_000
    assert out["rr_micro"] == 833_333  # floor((6-1)/6 * 1e6)


def test_mmr_rerank_hand_values(spark, tmp_path):
    """2-D construction: query along x; candidates at decreasing cos
    but the two most relevant are near-duplicates of each other - MMR
    must pick the top one, then SKIP its twin in favor of the
    orthogonal-ish third vector; a pure-relevance top-2 would take the
    twin."""
    import pytest

    from hadoop_fcfs_spark.llm.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0]),        # query
        (1, [0.94, 0.342]),     # +20 deg, rel ~.94
        (2, [0.94, 0.342]),     # exact twin of 1 (higher id loses tie)
        (3, [0.94, -0.342]),    # -20 deg: same rel, sim to 1 = cos40
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(f"{sf}/embeddings.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = mmr_rerank(emb, query_id=0, k=3, n_candidates=3).collect()
    order = [r["pos"] for r in out]
    picks = [r["vec_id"] for r in out]
    assert order == [1, 2, 3]
    assert picks[0] == 1          # equal rel, lowest id wins
    assert picks[1] == 3          # the exact twin is penalized away
    assert picks[2] == 2
    assert out[0]["maxsim"] is None
    # the other-side pick's penalty is cos(40 deg), not the twin's 1.0
    assert 0.70 < out[1]["maxsim"] < 0.80
    # the twin's maxsim at selection time is its sim to vec 1 (= 1.0)
    assert out[2]["maxsim"] == 1.0

    with pytest.raises(ValueError):
        mmr_rerank(emb, query_id=0, k=5, n_candidates=3)


def test_zipf_slope_hand_values(spark):
    """Perfect power law f = 64 / r over ranks 1,2,4,8 (ties avoided):
    ln f = ln 64 - 1 * ln r exactly, so the quantized OLS recovers
    s = 1 to within the 1e-6 quantization; a flat curve (all freqs
    equal) has zero u-variance after rank ln only... not zero - slope
    0 -> exponent 0; an UPWARD curve yields NULL."""
    from hadoop_fcfs_spark.llm.textan import zipf_slope

    rows = [("a", 64), ("b", 32), ("c", 16), ("d", 8),
            ("e", 4), ("f", 2), ("g", 1)]
    # ranks 1..7; f = 64 * r^-1 only at powers of two - use exact
    # geometric freqs paired with geometric ranks via padding tokens?
    # simpler: freqs 2^(7-r) give ln f = 7ln2 - r*ln2, which is linear
    # in r, NOT ln r. Instead pick f_i = 840 // r_i exactly for ranks
    # 1..4 with distinct freqs: (840, 420, 280, 210) -> s = 1.
    rows = [("a", 840), ("b", 420), ("c", 280), ("d", 210)]
    df = spark.createDataFrame(rows, "w string, n int")
    r = zipf_slope(df, "w", "n").collect()[0]
    assert r["vocab_size"] == 4 and r["n_tokens"] == 1750
    assert abs(r["zipf_exponent_e6"] - 1_000_000) <= 5  # quantization

    # upward-sloping (frequency RISES with rank is impossible by
    # construction - ranks sort by freq desc - so synthesize flat):
    flat = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "w string, n int"
    )
    r = zipf_slope(flat, "w", "n").collect()[0]
    assert r["zipf_exponent_e6"] == 0


def test_heaps_vocab_growth_brute_force(spark):
    """Literal replica: docs in id order, checkpoints at k*D//10, vocab
    = distinct tokens seen in the first r docs, tokens = their total
    count. Includes a zero-token doc (must advance the doc axis)."""
    docs = [
        (1, "a b a"), (2, ""), (3, "b c"), (4, "c d d"), (5, "e"),
    ]
    from hadoop_fcfs_spark.llm.textan import heaps_vocab_growth

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["decile"]: r
        for r in heaps_vocab_growth(df, "doc_id", "text", deciles=10).collect()
    }
    d = len(docs)
    toks = {i: [w for w in s.split() if w] for i, s in docs}
    ids = sorted(toks)
    for k in range(1, 11):
        r = k * d // 10
        if r < 1:
            assert k not in out
            continue
        seen = [w for i in ids[:r] for w in toks[i]]
        assert out[k]["n_docs"] == r
        assert out[k]["n_tokens"] == len(seen)
        assert out[k]["vocab_size"] == len(set(seen))
    # the full-corpus checkpoint always exists
    assert out[10]["n_docs"] == d
    import pytest

    with pytest.raises(ValueError):
        heaps_vocab_growth(df, "doc_id", "text", deciles=0)


def test_good_turing_hand_values(spark):
    """Count-of-counts on a fixed tf table: N1=3 singletons, N2=2
    doubletons, N3=1, N4=1 -> exact p0 and r* ratios; NULL r* where
    N_r = 0."""
    from hadoop_fcfs_spark.llm.textan import good_turing_mass

    counts = [1, 1, 1, 2, 2, 3, 4, 9]
    tf = spark.createDataFrame(
        [(f"w{i}", c) for i, c in enumerate(counts)], "w string, n long"
    )
    r = good_turing_mass(tf, "w", "n", max_r=3).collect()[0]
    n = sum(counts)
    assert r["n_tokens"] == n and r["vocab_size"] == len(counts)
    assert (r["n1"], r["n2"], r["n3"], r["n4"]) == (3, 2, 1, 1)
    assert r["p0_unseen_e6"] == 3 * 1_000_000 // n
    assert r["rstar1_e6"] == 2 * 2 * 1_000_000 // 3
    assert r["rstar2_e6"] == 3 * 1 * 1_000_000 // 2
    assert r["rstar3_e6"] == 4 * 1 * 1_000_000 // 1
    # N_r = 0 -> NULL r*
    tf2 = spark.createDataFrame([("w", 5)], "w string, n long")
    r2 = good_turing_mass(tf2, "w", "n", max_r=3).collect()[0]
    assert r2["rstar1_e6"] is None and r2["p0_unseen_e6"] == 0


def test_gif_decode_is_real():
    """GIF decodes FOR REAL (pure-Python LZW): a HAND-PACKED bitstream
    (built without the encoder: codes (4,1,1,2)@3 bits then (2,5)@4
    bits, LSB-first -> bytes 4c 24 05) comes back as the exact pixels,
    pinning the width-bump position independently of _encode_gif."""
    import numpy as np

    from hadoop_fcfs_spark.llm.multimodal import _decode_gif

    palette = bytes(
        [0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255]  # K R G B
    )
    blob = (
        b"GIF87a"
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x81, 0, 0])          # GCT present, 4 entries
        + palette
        + b"\x2c" + b"\x00" * 4
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + b"\x00"
        + bytes([2])                   # LZW min code size
        + bytes([3]) + b"\x4c\x24\x05" + b"\x00"
        + b"\x3b"
    )
    px = _decode_gif(blob)
    want = np.array(
        [[[255, 0, 0], [255, 0, 0]], [[0, 255, 0], [0, 255, 0]]],
        dtype=np.uint8,
    )
    assert px.shape == (2, 2, 3)
    assert (px == want).all()


def test_gif_roundtrip_random_images():
    """encode->decode round-trips exactly for random palette images
    across palette sizes and dimensions that push the LZW code width
    through multiple bumps (and past a table reset on the big one)."""
    import random

    import numpy as np

    from hadoop_fcfs_spark.llm.multimodal import _decode_gif, _encode_gif

    rng = random.Random(11)
    cases = [
        (4, 3, 5), (4, 17, 9), (8, 16, 16), (16, 23, 7),
        (256, 40, 40),   # deep dictionary growth
        (4, 200, 120),   # 24k pixels on a 4-color palette: many bumps
    ]
    for n, w, h in cases:
        pal = np.array(
            [[rng.randrange(256) for _ in range(3)] for _ in range(n)],
            dtype=np.uint8,
        )
        idx = np.array(
            [[rng.randrange(n) for _ in range(w)] for _ in range(h)],
            dtype=np.int32,
        )
        blob = _encode_gif(idx, pal)
        px = _decode_gif(blob)
        assert px.shape == (h, w, 3), (n, w, h)
        assert (px == pal[idx]).all(), (n, w, h)
    # runs compress well and exercise long dictionary entries
    idx = np.zeros((64, 64), dtype=np.int32)
    idx[::2] = 1
    pal = np.array([[0, 0, 0], [255, 255, 255], [1, 2, 3], [4, 5, 6]],
                   dtype=np.uint8)
    blob = _encode_gif(idx, pal)
    assert (_decode_gif(blob) == pal[idx]).all()
    assert len(blob) < idx.size  # actually compressed


def test_gif_interlace_extensions_and_boundary(spark):
    """Interlaced images de-interlace (rows permuted per the 4-pass
    scheme must come back in order); extension blocks are skipped and
    an animated GIF decodes its FIRST frame; fake-mode totality holds
    for GIF-garbage and fake=False keeps the strict boundary."""
    import numpy as np
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif,
        _encode_gif,
        decode_images,
    )

    # build a plain GIF, then hand-rewrite it as interlaced: set the
    # interlace bit and store rows in pass order
    h, w = 13, 5
    pal = np.array([[i, i, i] for i in (0, 85, 170, 255)], dtype=np.uint8)
    idx = np.arange(h * w, dtype=np.int32).reshape(h, w) % 4
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    blob = _encode_gif(idx[order], pal)
    pos = 13 + 12                      # header + 4-entry GCT
    assert blob[pos] == 0x2C
    inter = bytearray(blob)
    inter[pos + 9] |= 0x40            # interlace flag
    px = _decode_gif(bytes(inter))
    assert (px == pal[idx]).all(), "interlaced rows must come back ordered"

    # extension block before the image + a second frame: first wins
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, then terminator
    base = _encode_gif(idx, pal)
    frame = base[13 + 12 : -1]         # image descriptor..data, no trailer
    animated = base[: 13 + 12] + ext + frame + frame + b"\x3b"
    assert (_decode_gif(animated) == pal[idx]).all()

    # fake-mode totality: GIF magic + garbage falls through, strict raises
    garbage = spark.createDataFrame(
        [(1, b"GIF87a\x00\x00")], "media_id long, payload binary"
    )
    rows = decode_images(garbage, fake=True).collect()
    assert len(rows) == 1              # deterministic fake, no crash
    with _pytest.raises(Exception, match="ValueError|truncated|not a GIF|malformed"):
        decode_images(garbage, fake=False).collect()

    # real decode through the Arrow path end-to-end
    real = spark.createDataFrame(
        [(7, bytes(_encode_gif(idx, pal)))], "media_id long, payload binary"
    )
    r = decode_images(real, fake=False).collect()[0]
    assert (r["width"], r["height"]) == (w, h)
    want = float(pal[idx].astype("float64").mean()) / 255.0
    assert abs(r["mean_luma"] - want) < 2e-6


def test_gif_resize_real_in_palette_space(spark):
    """GIF resize is real and in-kind: nearest-neighbor on the INDEX
    grid, same palette, output re-decodes as a GIF with the expected
    quadrant colors; media_meta sniffs the output as gif."""
    import numpy as np

    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif,
        _encode_gif,
        attach_media_meta,
        resize_images,
    )

    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]],
        dtype=np.uint8,
    )
    # 4 solid quadrants of a 16x16 image
    idx = np.zeros((16, 16), dtype=np.int32)
    idx[:8, 8:] = 1
    idx[8:, :8] = 2
    idx[8:, 8:] = 3
    df = spark.createDataFrame(
        [(1, bytes(_encode_gif(idx, pal)))], "media_id long, payload binary"
    )
    out = resize_images(df, 4, 4, fake=False).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    small = _decode_gif(bytes(out["payload"]))
    want = pal[np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])]
    assert (small == want).all()
    meta = attach_media_meta(
        spark.createDataFrame(
            [(1, bytes(out["payload"]))], "media_id long, payload binary"
        )
    ).collect()[0]["media_meta"]
    assert meta["format"] == "gif"


def test_gif_animation_compositor_vs_python_replica():
    """Full animated decode (r9): random multi-frame animations
    (frame rects, disposal 1/2/3, transparency) written by
    _encode_gif_anim must composite EXACTLY like a literal numpy
    replay of the GIF89a disposal rules."""
    import random

    import numpy as np

    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif_frames,
        _encode_gif_anim,
    )

    rng = random.Random(23)
    for trial in range(4):
        W, H = rng.randint(8, 20), rng.randint(8, 20)
        n = rng.choice([4, 8, 16])
        pal = np.array(
            [[rng.randrange(256) for _ in range(3)] for _ in range(n)],
            dtype=np.uint8,
        )
        bg = rng.randrange(n)
        frames, delays, disposals, transparents = [], [], [], []
        for _ in range(rng.randint(2, 5)):
            w = rng.randint(1, W)
            h = rng.randint(1, H)
            left = rng.randint(0, W - w)
            top = rng.randint(0, H - h)
            idx = np.array(
                [[rng.randrange(n) for _ in range(w)] for _ in range(h)],
                dtype=np.int32,
            )
            frames.append((idx, left, top))
            delays.append(rng.randrange(500))
            disposals.append(rng.choice([0, 1, 2, 3]))
            transparents.append(
                rng.randrange(n) if rng.random() < 0.5 else None
            )
        blob = _encode_gif_anim(
            frames, pal, (W, H), delays, disposals, transparents,
            background=bg,
        )
        got = _decode_gif_frames(blob)
        assert len(got) == len(frames), trial

        # literal replay of the disposal rules
        canvas = np.zeros((H, W, 3), np.uint8)
        canvas[:] = pal[bg]
        for i, ((idx, left, top), disp, trans) in enumerate(
            zip(frames, disposals, transparents)
        ):
            prev = canvas.copy() if disp == 3 else None
            h, w = idx.shape
            for r in range(h):
                for c in range(w):
                    if trans is None or idx[r, c] != trans:
                        canvas[top + r, left + c] = pal[idx[r, c]]
            frame, delay = got[i]
            assert delay == delays[i], (trial, i)
            assert (frame == canvas).all(), (trial, i, disp, trans)
            if disp == 2:
                canvas[top : top + h, left : left + w] = pal[bg]
            elif disp == 3:
                canvas = prev


def test_gif_frame_audit_header_walk(spark):
    """gif_frame_audit (r10, pytest-locked — binary container walk has
    no SQL oracle): the header-only walk must agree with the FULL
    compositor on frame count and every delay; NETSCAPE loop counts
    are read; the logical-screen dims come from the header not the
    frames; non-GIF and truncated blobs quarantine to NULL rows under
    fake=True and raise under fake=False."""
    import numpy as np
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif_frames,
        _encode_gif,
        _encode_gif_anim,
        _gif_structure,
        gif_frame_audit,
    )

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f1 = (np.full((3, 5), 1, np.int32), 0, 0)
    f2 = (np.full((2, 2), 2, np.int32), 3, 1)
    f3 = (np.full((1, 6), 3, np.int32), 0, 4)
    anim = _encode_gif_anim(
        [f1, f2, f3], pal, (6, 5),
        delays_cs=[10, 0, 25], disposals=[1, 2, 0],
    )
    # splice a NETSCAPE2.0 loop extension (loop=7) before the frames:
    # header 13 bytes + 4-entry GCT (12 bytes) = offset 25
    netscape = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x07\x00\x00"
    looped = anim[:25] + netscape + anim[25:]

    s = _gif_structure(looped)
    assert (s["width"], s["height"]) == (6, 5)
    assert s["n_frames"] == 3 and s["delays"] == [10, 0, 25]
    assert s["loop_count"] == 7
    assert _gif_structure(anim)["loop_count"] is None
    # header walk vs the full compositor: frame count + every delay
    frames = _decode_gif_frames(looped)
    assert len(frames) == s["n_frames"]
    assert [d for _, d in frames] == s["delays"]

    single = _encode_gif(np.zeros((2, 3), np.uint8), pal)
    df = spark.createDataFrame(
        [(1, bytearray(looped)), (2, bytearray(single)),
         (3, bytearray(b"RIFF" + b"x" * 40)),
         (4, bytearray(looped[:30]))],  # truncated mid-extension
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in gif_frame_audit(df).collect()}
    assert rows[1]["n_frames"] == 3 and rows[1]["total_delay_cs"] == 35
    assert rows[1]["min_delay_cs"] == 0 and rows[1]["max_delay_cs"] == 25
    assert rows[1]["loop_count"] == 7
    assert (rows[1]["width"], rows[1]["height"]) == (6, 5)
    assert rows[2]["n_frames"] == 1 and rows[2]["total_delay_cs"] == 0
    assert rows[2]["loop_count"] is None
    assert rows[3]["n_frames"] is None  # non-GIF quarantined
    assert rows[4]["n_frames"] is None  # truncated quarantined
    with _pytest.raises(Exception, match="not a GIF|truncated"):
        gif_frame_audit(df, fake=False).collect()

    # hostile-blob contract (the image-tier fuzz discipline): the walk
    # must return a dict or raise ValueError — never IndexError etc.,
    # because fake=True quarantine catches ValueError only
    import random

    rng = random.Random(42)
    for _ in range(1500):
        b = bytearray(looped)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 8))
            ) + b[i:]
        try:
            _gif_structure(bytes(b))
        except ValueError:
            pass


def _webp_chunk(fourcc: bytes, payload: bytes) -> bytes:
    return fourcc + len(payload).to_bytes(4, "little") + payload + (
        b"\x00" if len(payload) & 1 else b""
    )


def _webp_container(*chunks: bytes) -> bytes:
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_webp_audit_header_walk(spark):
    """webp_audit (r10, pytest-locked — binary container walk): hand
    fixtures for all three variants. Lossy VP8 dims come from the
    14-bit keyframe fields, lossless VP8L from the 28-bit packed
    header (alpha bit honored), extended VP8X from the 24-bit canvas
    with ANIM loop count and per-ANMF 24-bit durations summed.
    Non-WebP (incl. plain RIFF/WAV) and truncated chunks quarantine
    under fake=True, raise under fake=False."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _webp_structure, webp_audit

    lossy = _webp_container(_webp_chunk(
        b"VP8 ",
        b"\x30\x00\x00" + b"\x9d\x01\x2a"
        + (160).to_bytes(2, "little") + (90).to_bytes(2, "little")
        + b"\x00" * 8,
    ))
    s = _webp_structure(lossy)
    assert s == {"variant": "lossy", "width": 160, "height": 90,
                 "n_frames": 1, "total_duration_ms": 0,
                 "loop_count": None, "has_alpha": False}

    bits = (33 - 1) | ((17 - 1) << 14) | (1 << 28)
    lossless = _webp_container(_webp_chunk(
        b"VP8L", b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 5
    ))
    s = _webp_structure(lossless)
    assert (s["variant"], s["width"], s["height"], s["has_alpha"]) == (
        "lossless", 33, 17, True,
    )

    def anmf(dur_ms: int) -> bytes:
        return _webp_chunk(
            b"ANMF",
            b"\x00" * 12 + dur_ms.to_bytes(3, "little") + b"\x00"
            + b"\x00" * 6,
        )

    anim = _webp_container(
        _webp_chunk(
            b"VP8X",
            bytes([0x12]) + b"\x00" * 3
            + (320 - 1).to_bytes(3, "little") + (240 - 1).to_bytes(3, "little"),
        ),
        _webp_chunk(b"ANIM", b"\x00" * 4 + (3).to_bytes(2, "little")),
        anmf(100), anmf(250),
    )
    s = _webp_structure(anim)
    assert s == {"variant": "extended", "width": 320, "height": 240,
                 "n_frames": 2, "total_duration_ms": 350,
                 "loop_count": 3, "has_alpha": True}

    df = spark.createDataFrame(
        [(1, bytearray(anim)), (2, bytearray(lossy)),
         (3, bytearray(b"RIFF" + b"\x08\x00\x00\x00" + b"WAVEfmt ")),
         (4, bytearray(anim[:20]))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in webp_audit(df).collect()}
    assert rows[1]["n_frames"] == 2 and rows[1]["total_duration_ms"] == 350
    assert rows[2]["variant"] == "lossy" and rows[2]["width"] == 160
    assert rows[3]["variant"] is None  # WAV is not WebP
    assert rows[4]["variant"] is None  # truncated chunk
    with _pytest.raises(Exception, match="not a WebP|truncated"):
        webp_audit(df, fake=False).collect()

    # contract fuzz: dict or ValueError, never IndexError
    import random

    rng = random.Random(7)
    for _ in range(1200):
        b = bytearray(anim)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 8))
            ) + b[i:]
        try:
            _webp_structure(bytes(b))
        except ValueError:
            pass


def _box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def test_mp4_audit_box_walk(spark):
    """mp4_audit (r10, pytest-locked): hand-built ISO-BMFF box trees —
    ftyp brand, mvhd v0 AND v1 timescale/duration, per-trak tkhd
    16.16 dims + hdlr vide/soun classification, mdat payload skipped;
    64-bit largesize honored; truncated/overrunning boxes and non-BMFF
    quarantine under fake=True, raise under fake=False."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _mp4_structure, mp4_audit

    def tkhd(w, h):
        return _box(
            b"tkhd",
            b"\x00" + b"\x00" * 3 + b"\x00" * 72
            + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
        )

    def hdlr(kind):
        return _box(b"hdlr", b"\x00" * 4 + b"\x00" * 4 + kind + b"\x00" * 12)

    def mvhd_v0(timescale, duration):
        return _box(
            b"mvhd",
            b"\x00" + b"\x00" * 3 + b"\x00" * 8
            + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
            + b"\x00" * 80,
        )

    def mvhd_v1(timescale, duration):
        return _box(
            b"mvhd",
            b"\x01" + b"\x00" * 3 + b"\x00" * 16
            + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
            + b"\x00" * 80,
        )

    vtrak = _box(b"trak", tkhd(640, 360) + _box(b"mdia", hdlr(b"vide")))
    atrak = _box(b"trak", tkhd(0, 0) + _box(b"mdia", hdlr(b"soun")))
    mp4 = (
        _box(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"mp41")
        + _box(b"moov", mvhd_v0(1000, 5500) + vtrak + atrak)
        + _box(b"mdat", b"\xde\xad\xbe\xef" * 16)
    )
    s = _mp4_structure(mp4)
    assert s == {"brand": "isom", "timescale": 1000, "duration_ms": 5500,
                 "n_tracks": 2, "has_video": True, "has_audio": True,
                 "width": 640, "height": 360}

    v1 = (_box(b"ftyp", b"mp42" + b"\x00" * 8)
          + _box(b"moov", mvhd_v1(90_000, 90_000 * 7 + 45_000) + atrak))
    s = _mp4_structure(v1)
    assert (s["brand"], s["timescale"], s["duration_ms"]) == (
        "mp42", 90_000, 7500,
    )
    assert s["n_tracks"] == 1 and s["has_audio"] and not s["has_video"]
    assert s["width"] is None  # zero-dim tkhd never sets presentation size

    # 64-bit largesize box wrapping the same moov content
    inner = mvhd_v0(600, 1200)
    large = (b"\x00\x00\x00\x01" + b"moov"
             + (16 + len(inner)).to_bytes(8, "big") + inner)
    s = _mp4_structure(_box(b"ftyp", b"isom" + b"\x00" * 8) + large)
    assert s["duration_ms"] == 2000

    df = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(v1)),
         (3, bytearray(b"RIFF" + b"\x00" * 20)),
         (4, bytearray(mp4[:30]))],  # truncated inside ftyp/moov
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in mp4_audit(df).collect()}
    assert rows[1]["duration_ms"] == 5500 and rows[1]["has_video"]
    assert (rows[1]["width"], rows[1]["height"]) == (640, 360)
    assert rows[2]["brand"] == "mp42" and rows[2]["duration_ms"] == 7500
    assert rows[3]["brand"] is None
    assert rows[4]["brand"] is None
    with _pytest.raises(Exception, match="ISO-BMFF|truncated|overruns"):
        mp4_audit(df, fake=False).collect()

    # contract fuzz: dict or ValueError, never IndexError/overflow
    import random

    rng = random.Random(13)
    for _ in range(1500):
        b = bytearray(mp4)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _mp4_structure(bytes(b))
        except ValueError:
            pass


def test_mp4_undersized_boxes_quarantine():
    """r11 ADVICE fix: mvhd/hdlr field reads are bounded by the box's
    OWN declared extent (pos+size), not the parent range — an
    undersized mvhd or hdlr followed by a sibling box must raise
    (→ NULL quarantine row under fake=True), never silently read the
    sibling's bytes as timescale/duration/handler."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _mp4_structure

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
    # v0 mvhd declaring an 8-byte body (needs 20): the 'free' sibling's
    # payload sits exactly where the old parent-range check would have
    # let timescale/duration be read from
    short_mvhd = _box(b"mvhd", b"\x00" * 8)
    sibling = _box(b"free", b"\x11" * 64)
    with _pytest.raises(ValueError, match="truncated mvhd"):
        _mp4_structure(ftyp + _box(b"moov", short_mvhd + sibling))
    # v1 mvhd declaring a 20-byte body (needs 32)
    short_v1 = _box(b"mvhd", b"\x01" + b"\x00" * 19)
    with _pytest.raises(ValueError, match="truncated mvhd v1"):
        _mp4_structure(ftyp + _box(b"moov", short_v1 + sibling))
    # hdlr declaring an 8-byte body (handler type needs 12)
    short_hdlr = _box(b"hdlr", b"\x00" * 8)
    trak = _box(b"trak", _box(b"mdia", short_hdlr + _box(b"free", b"vide")))
    with _pytest.raises(ValueError, match="truncated hdlr"):
        _mp4_structure(ftyp + _box(b"moov", trak))


def test_media_meta_ftyp_refines_only_unknown(spark):
    """r11 ADVICE fix: the ISO-BMFF sniff ('ftyp' at offset 4) only
    refines blobs NO leading magic claimed — a RIFF/WAV whose 4-byte
    size field happens to spell 'ftyp' stays 'wav' (mirroring how the
    WebP rule only refines RIFF)."""
    from hadoop_fcfs_spark.llm.multimodal import attach_media_meta

    riff_ftyp = b"RIFF" + b"ftyp" + b"WAVE" + b"\x00" * 24
    real_mp4 = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 24
    webp = b"RIFF" + b"\x20\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x00" * 16
    df = spark.createDataFrame(
        [(1, bytearray(riff_ftyp)), (2, bytearray(real_mp4)),
         (3, bytearray(webp))],
        "media_id long, payload binary",
    )
    fmts = {r["media_id"]: r["media_meta"]["format"]
            for r in attach_media_meta(df).collect()}
    assert fmts == {1: "wav", 2: "mp4", 3: "webp"}


def test_pure_decodable_mirrors_pure_decoder_envelope():
    """r11 ADVICE fix: the Pillow fast path is gated on
    _pure_decodable so decode outputs never depend on whether Pillow
    is installed — variants the pure decoders reject (16-bit or
    interlaced or palette PNG, arithmetic JPEG, non-24bpp BMP) must
    probe False (fake/raise path either way); the supported envelope
    must probe True. The probe is pure Python, so the envelope is
    testable without Pillow."""
    import numpy as np

    from hadoop_fcfs_spark.llm.jpeg import encode_jpeg, encode_jpeg_progressive
    from hadoop_fcfs_spark.llm.multimodal import (
        _encode_png,
        _pure_decodable,
    )

    def png_hdr(bitd, color, interlace):
        ihdr = ((1).to_bytes(4, "big") + (1).to_bytes(4, "big")
                + bytes([bitd, color, 0, 0, interlace]))
        return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big")
                + b"IHDR" + ihdr + b"\x00" * 4)

    assert _pure_decodable(png_hdr(8, 2, 0))
    assert _pure_decodable(png_hdr(8, 0, 0))
    assert not _pure_decodable(png_hdr(16, 2, 0))  # 16-bit
    assert not _pure_decodable(png_hdr(8, 2, 1))   # interlaced
    assert not _pure_decodable(png_hdr(8, 3, 0))   # palette
    rgb = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert _pure_decodable(_encode_png(rgb))       # real encoder output

    def bmp_hdr(bpp, comp):
        return (b"BM" + b"\x00" * 12 + (40).to_bytes(4, "little")
                + (1).to_bytes(4, "little") + (1).to_bytes(4, "little")
                + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
                + comp.to_bytes(4, "little") + b"\x00" * 20)

    assert _pure_decodable(bmp_hdr(24, 0))
    assert not _pure_decodable(bmp_hdr(8, 0))      # palettized
    assert not _pure_decodable(bmp_hdr(24, 1))     # RLE-compressed

    assert _pure_decodable(b"GIF89a" + b"\x00" * 16)
    assert _pure_decodable(b"GIF87a" + b"\x00" * 16)

    # real encoder outputs: baseline AND progressive Huffman accepted
    assert _pure_decodable(encode_jpeg(rgb, quality=90))
    assert _pure_decodable(encode_jpeg_progressive(rgb, quality=90))

    def sof_jpeg(marker, prec=8, ncomp=3):
        seg = bytes([prec]) + (1).to_bytes(2, "big") + (1).to_bytes(2, "big") \
            + bytes([ncomp]) + b"\x01\x11\x00" * ncomp
        ln = 2 + len(seg)
        return (b"\xff\xd8" + b"\xff" + bytes([marker])
                + ln.to_bytes(2, "big") + seg)

    assert _pure_decodable(sof_jpeg(0xC0))
    assert _pure_decodable(sof_jpeg(0xC2))
    assert not _pure_decodable(sof_jpeg(0xC9))         # arithmetic
    assert not _pure_decodable(sof_jpeg(0xC3))         # lossless
    assert not _pure_decodable(sof_jpeg(0xC0, prec=12))
    assert not _pure_decodable(sof_jpeg(0xC0, ncomp=4))  # CMYK

    assert not _pure_decodable(b"")
    assert not _pure_decodable(b"\x00" * 64)
    assert not _pure_decodable(b"\xff\xd8\xff")  # JPEG with no SOF


def test_mp3_audit_frame_walk(spark):
    """mp3_audit (r11, pytest-locked): hand-built MPEG audio frame
    chains — exact frame counting/duration via declared frame lengths
    (payloads hopped), ID3v2 skip (syncsafe size), ID3v1 tail, VBR
    classification from the bitrate-index spread, MPEG1/2.5 + layer
    matrix; free-format, truncation, mid-stream parameter changes and
    lost sync quarantine under fake=True, raise under fake=False."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _mp3_structure, mp3_audit

    V1L3 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    V2L3 = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

    def frame(br_idx, vcode=3, lcode=1, sr_idx=0, pad=0, mono=True):
        rates = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
                 0: (11025, 12000, 8000)}
        sr = rates[vcode][sr_idx]
        kbps = (V1L3 if vcode == 3 else V2L3)[br_idx - 1]
        spf = 1152 if vcode == 3 else 576
        flen = spf // 8 * kbps * 1000 // sr + pad
        h = bytes([
            0xFF, 0xE0 | (vcode << 3) | (lcode << 1) | 1,
            (br_idx << 4) | (sr_idx << 2) | (pad << 1),
            (3 if mono else 0) << 6,
        ])
        return h + b"\x00" * (flen - 4)

    # CBR MPEG1 Layer III, 128 kbps, 44.1 kHz mono, 10 frames
    cbr = b"".join(frame(9) for _ in range(10))
    s = _mp3_structure(cbr)
    assert (s["version"], s["layer"], s["sample_rate"], s["channels"]) == (
        "MPEG1", 3, 44100, 1)
    assert s["n_frames"] == 10 and not s["vbr"]
    assert s["duration_ms"] == 10 * 1152 * 1000 // 44100
    flen = 144 * 128_000 // 44100
    assert s["bitrate_kbps"] == flen * 10 * 8 * 44100 // (10 * 1152) // 1000

    # ID3v2 prefix (syncsafe size) + ID3v1 tail both skipped
    tagged = (b"ID3\x03\x00\x00" + bytes([0, 0, 0x02, 0x05])
              + b"\x00" * ((2 << 7) + 5) + cbr + b"TAG" + b"\x00" * 125)
    assert _mp3_structure(tagged)["n_frames"] == 10

    # VBR: mixed bitrate indices; padding bit honored in frame length
    vbr = frame(9) + frame(12, pad=1) + frame(5) + frame(9)
    s = _mp3_structure(vbr)
    assert s["vbr"] and s["n_frames"] == 4

    # Xing/Info VBR-header frame (r12 ADVICE fix): the LAME tag rides
    # in the first frame after the Layer III side info (MPEG1 mono =
    # 17 bytes) — it is metadata, so it must not count toward
    # n_frames/duration nor contribute its bitrate index to the
    # CBR/VBR spread.
    info = bytearray(frame(5))  # 64 kbps — a DIFFERENT index than cbr's
    info[4 + 17 : 4 + 21] = b"Info"
    s = _mp3_structure(bytes(info) + cbr)
    assert s["n_frames"] == 10 and not s["vbr"]  # still CBR, 10 frames
    assert s["duration_ms"] == 10 * 1152 * 1000 // 44100
    xing = bytearray(frame(9))
    xing[4 + 17 : 4 + 21] = b"Xing"
    s = _mp3_structure(bytes(xing) + vbr)
    assert s["n_frames"] == 4 and s["vbr"]
    with _pytest.raises(ValueError, match="no MPEG frames"):
        _mp3_structure(bytes(xing))  # a tag frame alone is not audio
    # probe bounds (r12 review fix): a TINY first frame (26 bytes —
    # MPEG2 8 kbps) must not have its VBRI probe read into the second
    # frame's payload; bytes spelling 'VBRI' at blob offset 36 (10
    # bytes into frame 2) must NOT demote frame 1 to a tag frame
    tiny2 = bytearray(frame(1, vcode=2))
    assert len(frame(1, vcode=2)) == 26  # probe window 36:40 > flen
    tiny2[10:14] = b"VBRI"
    s = _mp3_structure(frame(1, vcode=2) + bytes(tiny2))
    assert s["n_frames"] == 2  # both are audio frames

    # MPEG2.5 Layer III: 576 samples per frame at 11025 Hz, stereo
    low = b"".join(frame(3, vcode=0, mono=False) for _ in range(8))
    s = _mp3_structure(low)
    assert (s["version"], s["sample_rate"], s["channels"]) == (
        "MPEG2.5", 11025, 2)
    assert s["duration_ms"] == 8 * 576 * 1000 // 11025

    # quarantine contracts
    with _pytest.raises(ValueError, match="overruns"):
        _mp3_structure(cbr[:-10])  # truncated final frame
    with _pytest.raises(ValueError, match="free-format"):
        _mp3_structure(bytes([0xFF, 0xFB, 0x00, 0xC0]) + b"\x00" * 400)
    with _pytest.raises(ValueError, match="sync"):
        _mp3_structure(b"\x00\x01" + cbr)
    with _pytest.raises(ValueError, match="parameters change"):
        _mp3_structure(frame(9) + frame(9, sr_idx=1))
    with _pytest.raises(ValueError, match="reserved"):
        _mp3_structure(bytes([0xFF, 0xE9, 0x90, 0xC0]) + b"\x00" * 100)

    df = spark.createDataFrame(
        [(1, bytearray(cbr)), (2, bytearray(tagged)), (3, bytearray(vbr)),
         (4, bytearray(b"RIFF" + b"\x00" * 40)), (5, bytearray(cbr[:-10]))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in mp3_audit(df).collect()}
    assert rows[1]["n_frames"] == 10 and rows[1]["bitrate_kbps"] is not None
    assert rows[2]["n_frames"] == 10
    assert rows[3]["vbr"] is True
    assert rows[4]["version"] is None and rows[5]["version"] is None
    with _pytest.raises(Exception, match="MPEG|sync|overruns"):
        mp3_audit(df, fake=False).collect()

    # contract fuzz: dict or ValueError, never IndexError/KeyError
    import random

    rng = random.Random(17)
    base = tagged
    for _ in range(1500):
        b = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _mp3_structure(bytes(b))
        except ValueError:
            pass


def test_ogg_audit_page_walk(spark):
    """ogg_audit (r11, pytest-locked): hand-built Ogg streams — page
    hop via lacing tables, Vorbis/Opus BOS ID parsing (rate/channels/
    pre-skip), duration from the last granule (Opus on the 48 kHz
    clock minus pre-skip), EOS flag; bad capture/version, truncation,
    granule regression and multiplexed streams quarantine under
    fake=True, raise under fake=False."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _ogg_structure, ogg_audit

    def page(body, granule, serial=7, htype=0, seq=0):
        # single-packet page: lacing = 255*k + remainder
        lac = b"\xff" * (len(body) // 255) + bytes([len(body) % 255])
        return (b"OggS\x00" + bytes([htype])
                + granule.to_bytes(8, "little", signed=True)
                + serial.to_bytes(4, "little")
                + seq.to_bytes(4, "little") + b"\x00" * 4
                + bytes([len(lac)]) + lac + body)

    vorbis_id = (b"\x01vorbis" + b"\x00" * 4      # version
                 + bytes([2])                      # channels
                 + (44100).to_bytes(4, "little") + b"\x00" * 14)
    vorbis = (page(vorbis_id, 0, htype=2)
              + page(b"\x05" * 300, 44100)
              + page(b"\x05" * 300, 88200, htype=4))
    s = _ogg_structure(vorbis)
    assert (s["codec"], s["channels"], s["sample_rate"]) == ("vorbis", 2, 44100)
    assert s["n_pages"] == 3 and s["eos"]
    assert s["duration_ms"] == 2000

    opus_id = (b"OpusHead" + bytes([1, 1])         # version, channels
               + (312).to_bytes(2, "little")       # pre-skip
               + (48000).to_bytes(4, "little") + b"\x00" * 3)
    opus = (page(opus_id, 0, htype=2)
            + page(b"\x09" * 100, 48000 + 312, htype=4))
    s = _ogg_structure(opus)
    assert (s["codec"], s["channels"], s["sample_rate"]) == ("opus", 1, 48000)
    assert s["duration_ms"] == 1000  # pre-skip excluded

    # unknown BOS codec: pages counted, duration NULL (no granule clock)
    unk = page(b"weird-codec-id!!", 0, htype=2) + page(b"\x01" * 50, 999, htype=4)
    s = _ogg_structure(unk)
    assert s["codec"] == "unknown" and s["duration_ms"] is None
    assert s["n_pages"] == 2

    with _pytest.raises(ValueError, match="capture"):
        _ogg_structure(b"NotO" + vorbis[4:])
    with _pytest.raises(ValueError, match="version"):
        _ogg_structure(b"OggS\x01" + vorbis[5:])
    with _pytest.raises(ValueError, match="overruns|truncated"):
        _ogg_structure(vorbis[:-20])
    with _pytest.raises(ValueError, match="regressed"):
        _ogg_structure(page(vorbis_id, 0, htype=2)
                       + page(b"a" * 10, 500) + page(b"a" * 10, 400))
    with _pytest.raises(ValueError, match="multiplexed"):
        _ogg_structure(page(vorbis_id, 0, htype=2)
                       + page(opus_id, 0, serial=9, htype=2))
    # r12 ADVICE fix: the serial pins from the FIRST page even when it
    # lacks BOS (clipped chain), so interleaved serials still trip the
    # multiplexed check instead of being silently mixed into one
    # page/granule accounting.
    with _pytest.raises(ValueError, match="multiplexed"):
        _ogg_structure(page(b"a" * 10, 100, serial=7)
                       + page(b"b" * 10, 200, serial=9))
    s = _ogg_structure(page(b"a" * 10, 100) + page(b"b" * 10, 200, htype=4))
    assert s["codec"] is None and s["n_pages"] == 2  # headerless chain ok

    df = spark.createDataFrame(
        [(1, bytearray(vorbis)), (2, bytearray(opus)),
         (3, bytearray(b"\x00" * 40))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in ogg_audit(df).collect()}
    assert rows[1]["codec"] == "vorbis" and rows[1]["duration_ms"] == 2000
    assert rows[2]["codec"] == "opus" and rows[2]["duration_ms"] == 1000
    assert rows[3]["codec"] is None
    with _pytest.raises(Exception, match="Ogg|capture"):
        ogg_audit(df, fake=False).collect()

    # the meta sniffer now classifies ogg by its leading magic
    from hadoop_fcfs_spark.llm.multimodal import attach_media_meta

    fmts = {r["media_id"]: r["media_meta"]["format"]
            for r in attach_media_meta(df).collect()}
    assert fmts[1] == "ogg" and fmts[2] == "ogg" and fmts[3] == "unknown"

    # contract fuzz: dict or ValueError
    import random

    rng = random.Random(23)
    for _ in range(1500):
        b = bytearray(vorbis)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _ogg_structure(bytes(b))
        except ValueError:
            pass


def test_flac_audit_streaminfo(spark):
    """flac_audit (r11, pytest-locked): hand-built FLAC metadata chains
    — STREAMINFO packed-field extraction (20-bit rate, 3-bit channels,
    5-bit bps, 36-bit total samples), block hop via 24-bit lengths,
    last-flag stop before frame data, seektable detection,
    unknown-length (total=0) NULL duration; bad magic / non-STREAMINFO
    first block / type 127 / overrun / zero rate quarantine."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _flac_structure, flac_audit

    def streaminfo(rate, channels, bps, total, last=False):
        packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
        body = (b"\x10\x00\x10\x00" + b"\x00" * 6
                + packed.to_bytes(8, "big") + b"\x00" * 16)
        assert len(body) == 34
        return bytes([(0x80 if last else 0) | 0]) + (34).to_bytes(3, "big") + body

    def block(btype, body, last=False):
        return bytes([(0x80 if last else 0) | btype]) + len(body).to_bytes(3, "big") + body

    flac = (b"fLaC" + streaminfo(44100, 2, 16, 44100 * 3)
            + block(3, b"\x00" * 18)          # seektable
            + block(4, b"vorbis-comment", last=True)
            + b"\xff\xf8" + b"\x00" * 64)      # frame data, never read
    s = _flac_structure(flac)
    assert (s["sample_rate"], s["channels"], s["bits_per_sample"]) == (44100, 2, 16)
    assert s["duration_ms"] == 3000 and s["n_meta_blocks"] == 3
    assert s["has_seektable"]

    # unknown total samples -> NULL duration; 8-channel 24-bit
    s = _flac_structure(b"fLaC" + streaminfo(96000, 8, 24, 0, last=True))
    assert s["duration_ms"] is None and s["channels"] == 8
    assert s["bits_per_sample"] == 24 and s["sample_rate"] == 96000

    with _pytest.raises(ValueError, match="not a FLAC"):
        _flac_structure(b"fLaX" + b"\x00" * 40)
    with _pytest.raises(ValueError, match="STREAMINFO"):
        _flac_structure(b"fLaC" + block(4, b"x" * 34, last=True))
    with _pytest.raises(ValueError, match="type 127"):
        _flac_structure(b"fLaC" + bytes([127]) + (34).to_bytes(3, "big") + b"\x00" * 34)
    with _pytest.raises(ValueError, match="overruns"):
        _flac_structure(flac[:20])
    with _pytest.raises(ValueError, match="rate 0"):
        _flac_structure(b"fLaC" + streaminfo(0, 2, 16, 100, last=True))

    df = spark.createDataFrame(
        [(1, bytearray(flac)), (2, bytearray(b"ID3" + b"\x00" * 40))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in flac_audit(df).collect()}
    assert rows[1]["duration_ms"] == 3000 and rows[2]["sample_rate"] is None
    with _pytest.raises(Exception, match="FLAC"):
        flac_audit(df, fake=False).collect()

    from hadoop_fcfs_spark.llm.multimodal import attach_media_meta

    fmts = {r["media_id"]: r["media_meta"]["format"]
            for r in attach_media_meta(df).collect()}
    assert fmts == {1: "flac", 2: "mp3"}

    import random

    rng = random.Random(29)
    for _ in range(1500):
        b = bytearray(flac)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _flac_structure(bytes(b))
        except ValueError:
            pass


def test_archive_audit_gzip_zip_zstd(spark):
    """archive_audit (r11, pytest-locked): gzip members via stdlib
    gzip (REAL fixtures — header-flag walk incl. FNAME/FEXTRA, trailer
    ISIZE), zip central directories via stdlib zipfile (entry counts,
    stored/deflated split, declared sizes — payloads never read), zstd
    frame headers (hand-built per RFC 8878: FCS field sizes,
    single-segment, window descriptor, dict id, skippable-frame hop),
    and the expansion_e3 zip-bomb screen; quarantine contracts for
    torn EOCDs, reserved bits, ZIP64 and multi-disk markers."""
    import gzip as _gzip
    import io
    import zipfile

    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import (
        _gzip_structure,
        _zip_structure,
        _zstd_structure,
        archive_audit,
    )

    # --- gzip: real stdlib fixture with a filename ---
    buf = io.BytesIO()
    with _gzip.GzipFile("corpus.txt", "wb", fileobj=buf, mtime=1_700_000_000) as g:
        g.write(b"hello gzip world " * 1000)
    gz = buf.getvalue()
    s = _gzip_structure(gz)
    assert s["fname"] == "corpus.txt" and s["mtime"] == 1_700_000_000
    assert s["isize"] == 17_000 and s["compressed_size"] == len(gz)
    with _pytest.raises(ValueError, match="not a gzip"):
        _gzip_structure(b"\x1f\x8c" + gz[2:])
    with _pytest.raises(ValueError, match="reserved"):
        _gzip_structure(gz[:3] + b"\xe0" + gz[4:])

    # --- zip: real stdlib fixture, stored + deflated entries ---
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("a.txt", b"A" * 5000, compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("b.bin", b"B" * 300, compress_type=zipfile.ZIP_STORED)
        z.writestr("c.txt", b"C" * 7000, compress_type=zipfile.ZIP_DEFLATED)
    zp = zbuf.getvalue()
    s = _zip_structure(zp)
    assert s["n_entries"] == 3 and s["n_stored"] == 1 and s["n_deflated"] == 2
    assert s["total_uncompressed"] == 12_300
    assert 0 < s["total_compressed"] < 12_300
    assert not s["has_encrypted"]
    with _pytest.raises(ValueError, match="no ZIP end-of-central"):
        _zip_structure(zp[: len(zp) // 2])
    # doctor the EOCD's total-entries field to the ZIP64 sentinel
    eocd = zp.rfind(b"PK\x05\x06")
    doctored = zp[: eocd + 10] + b"\xff\xff" + zp[eocd + 12 :]
    with _pytest.raises(ValueError, match="not supported"):
        _zip_structure(doctored)

    # r12 ADVICE fix: a stored member or the archive COMMENT can
    # contain the EOCD magic — the backward scan must reject the false
    # (later) occurrence and accept the record whose comment_len equals
    # the distance to the end of the blob.
    zbuf2 = io.BytesIO()
    with zipfile.ZipFile(zbuf2, "w") as z:
        z.writestr("d.bin", b"D" * 10 + b"PK\x05\x06" + b"\x00" * 30,
                   compress_type=zipfile.ZIP_STORED)
        z.comment = b"decoy magic PK\x05\x06 inside the comment"
    zp2 = zbuf2.getvalue()
    assert zp2.count(b"PK\x05\x06") == 3  # payload + real EOCD + comment
    s = _zip_structure(zp2)
    assert s["n_entries"] == 1 and s["n_stored"] == 1
    assert s["comment_len"] == len(b"decoy magic PK\x05\x06 inside the comment")
    # a magic-stuffed hostile tail quarantines after a BOUNDED candidate
    # scan (64 attempts) instead of going quadratic in the 64 KiB window
    with _pytest.raises(ValueError, match="no ZIP end-of-central"):
        _zip_structure(b"PK\x05\x06" * 20000)

    # --- zstd: hand frames per RFC 8878 ---
    # FCS code 1 (2-byte field, value+256), window descriptor, checksum
    zst = (b"\x28\xb5\x2f\xfd"
           + bytes([0x40 | 0x04]) + bytes([0x08])  # fhd, window wd=8
           + (1744).to_bytes(2, "little")          # content 1744+256=2000
           + b"\x00" * 32)
    s = _zstd_structure(zst)
    assert s["content_size"] == 2000 and s["has_checksum"]
    assert s["window_size"] == (1 << 11) and s["dict_id"] is None
    # single-segment + 1-byte FCS + a leading skippable frame
    skip = (0x184D2A50).to_bytes(4, "little") + (6).to_bytes(4, "little") + b"x" * 6
    zst2 = skip + b"\x28\xb5\x2f\xfd" + bytes([0x20]) + bytes([42]) + b"\x00" * 8
    s = _zstd_structure(zst2)
    assert s["n_skippable"] == 1 and s["content_size"] == 42
    assert s["window_size"] == 42  # single-segment: window = content
    with _pytest.raises(ValueError, match="reserved"):
        _zstd_structure(b"\x28\xb5\x2f\xfd" + bytes([0x08]) + b"\x00" * 8)
    with _pytest.raises(ValueError, match="truncated"):
        _zstd_structure(zst[:5])

    # --- the Spark audit + zip-bomb screen ---
    df = spark.createDataFrame(
        [(1, bytearray(gz)), (2, bytearray(zp)), (3, bytearray(zst)),
         (4, bytearray(b"\x00" * 64))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in archive_audit(df).collect()}
    assert rows[1]["format"] == "gzip" and rows[1]["uncompressed_size"] == 17_000
    assert rows[1]["expansion_e3"] == 17_000 * 1000 // len(gz)
    assert rows[2]["format"] == "zip" and rows[2]["n_entries"] == 3
    assert rows[3]["format"] == "zstd" and rows[3]["uncompressed_size"] == 2000
    assert rows[4]["format"] is None
    with _pytest.raises(Exception, match="ZIP|gzip|zstd"):
        archive_audit(df, fake=False).collect()

    # the meta sniffer catalogues the archive magics too
    from hadoop_fcfs_spark.llm.multimodal import attach_media_meta

    fmts = {r["media_id"]: r["media_meta"]["format"]
            for r in attach_media_meta(df).collect()}
    assert fmts == {1: "gzip", 2: "zip", 3: "zstd", 4: "unknown"}

    # mutation fuzz across all three walkers: dict or ValueError
    import random

    rng = random.Random(31)
    for base in (gz, zp, zst2):
        for _ in range(700):
            b = bytearray(base)
            op = rng.randrange(3)
            if op == 0:
                for _ in range(rng.randint(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            elif op == 1:
                b = b[: rng.randrange(len(b))]
            else:
                i = rng.randrange(len(b))
                b = b[:i] + bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 12))
                ) + b[i:]
            for fn in (_gzip_structure, _zip_structure, _zstd_structure):
                try:
                    fn(bytes(b))
                except ValueError:
                    pass


def test_warc_audit_record_chain(spark):
    """warc_audit (r11, pytest-locked): hand-built WARC/1.0 chains —
    record hop via Content-Length (bodies never read), type counts,
    truncation flag, version capture; bad version lines, missing
    Content-Length, torn terminators and overruns quarantine."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _warc_structure, warc_audit

    def rec(rtype, body, extra=()):
        hdrs = [b"WARC/1.0",
                b"WARC-Type: " + rtype,
                b"WARC-Record-ID: <urn:uuid:1>",
                b"WARC-Date: 2026-08-16T00:00:00Z",
                *extra,
                b"Content-Length: " + str(len(body)).encode()]
        return b"\r\n".join(hdrs) + b"\r\n\r\n" + body + b"\r\n\r\n"

    warc = (rec(b"warcinfo", b"software: test\r\n")
            + rec(b"request", b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
            + rec(b"response", b"HTTP/1.1 200 OK\r\n\r\n" + b"<html>" * 500)
            + rec(b"response", b"HTTP/1.1 200 OK\r\n\r\n" + b"B" * 100,
                  extra=(b"WARC-Truncated: length",))
            + rec(b"metadata", b"fetchTimeMs: 12\r\n"))
    s = _warc_structure(warc)
    assert s["n_records"] == 5 and s["n_responses"] == 2
    assert s["n_requests"] == 1 and s["n_warcinfo"] == 1
    assert s["n_metadata"] == 1 and s["has_truncated"]
    assert s["warc_version"] == "1.0"
    assert s["total_content_bytes"] == (
        len(b"software: test\r\n")
        + len(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        + len(b"HTTP/1.1 200 OK\r\n\r\n") + 3000
        + len(b"HTTP/1.1 200 OK\r\n\r\n") + 100
        + len(b"fetchTimeMs: 12\r\n")
    )

    with _pytest.raises(ValueError, match="version line"):
        _warc_structure(b"WARX/1.0\r\n" + warc[10:])
    with _pytest.raises(ValueError, match="overruns|terminator|unterminated"):
        _warc_structure(warc[:-6])
    no_len = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    with _pytest.raises(ValueError, match="Content-Length"):
        _warc_structure(no_len)

    df = spark.createDataFrame(
        [(1, bytearray(warc)), (2, bytearray(b"PK\x03\x04" + b"\x00" * 40))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in warc_audit(df).collect()}
    assert rows[1]["n_records"] == 5 and rows[2]["n_records"] is None
    with _pytest.raises(Exception, match="WARC"):
        warc_audit(df, fake=False).collect()

    # the 100 TB pipeline shape: a CommonCrawl-style .warc.gz member
    # inflates to exactly this walk's input (gzip_audit -> warc_audit)
    import gzip as _gzip
    import io

    from hadoop_fcfs_spark.llm.multimodal import _gzip_structure

    buf = io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb") as g:
        g.write(warc)
    gz = buf.getvalue()
    assert _gzip_structure(gz)["isize"] == len(warc)
    assert _warc_structure(_gzip.decompress(gz))["n_records"] == 5

    import random

    rng = random.Random(37)
    for _ in range(1500):
        b = bytearray(warc)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _warc_structure(bytes(b))
        except ValueError:
            pass


def test_pdf_audit_head_tail(spark):
    """pdf_audit (r11, pytest-locked): hand-built classic-xref and
    xref-STREAM PDFs — version from the (possibly offset) header,
    startxref + /Size from the tail or the startxref target,
    linearized/encrypted flags; missing header/%%EOF/startxref
    quarantine (a torn download is the signal)."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _pdf_structure, pdf_audit

    body = (b"%PDF-1.7\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Count 3 >> endobj\n"
            + b"3 0 obj << /Length 20 >> stream\n" + b"Q" * 20
            + b"\nendstream endobj\n")
    classic = (body + b"xref\n0 4\n" + b"0000000000 65535 f \n" * 4
               + b"trailer << /Size 4 /Root 1 0 R >>\n"
               b"startxref\n" + str(len(body)).encode() + b"\n%%EOF\n")
    s = _pdf_structure(classic)
    assert s["version"] == "1.7" and s["n_objects"] == 4
    assert s["startxref"] == len(body)
    assert not s["linearized"] and not s["encrypted"]

    # xref STREAM form: /Size lives at the startxref target, not the tail
    xobj = b"4 0 obj << /Type /XRef /Size 5 /W [1 2 1] >> stream\nXX\nendstream endobj\n"
    xstream = (body + xobj
               + b"startxref\n" + str(len(body)).encode() + b"\n%%EOF\n")
    s = _pdf_structure(xstream)
    assert s["n_objects"] == 5 and s["startxref"] == len(body)

    # junk-prefixed header (within 1024), linearized + encrypted flags
    lin = (b"\xef\xbb\xbfJUNK" + b"%PDF-1.4\n"
           b"1 0 obj << /Linearized 1 >> endobj\n" + b"x" * 50
           + b"trailer << /Size 9 /Encrypt 7 0 R >>\nstartxref\n12\n%%EOF")
    s = _pdf_structure(lin)
    assert s["version"] == "1.4" and s["linearized"] and s["encrypted"]
    assert s["n_objects"] == 9

    with _pytest.raises(ValueError, match="no %PDF"):
        _pdf_structure(b"HELLO" * 300)
    with _pytest.raises(ValueError, match="%%EOF"):
        _pdf_structure(classic.replace(b"%%EOF", b"%%EOX"))
    with _pytest.raises(ValueError, match="startxref"):
        _pdf_structure(classic.replace(b"startxref", b"startxrex"))
    with _pytest.raises(ValueError, match="beyond"):
        _pdf_structure(classic.replace(
            b"startxref\n" + str(len(body)).encode(),
            b"startxref\n99999999"))

    df = spark.createDataFrame(
        [(1, bytearray(classic)), (2, bytearray(xstream)),
         (3, bytearray(b"torn %PDF-1.5 download"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in pdf_audit(df).collect()}
    assert rows[1]["n_objects"] == 4 and rows[2]["n_objects"] == 5
    assert rows[3]["version"] is None  # no %%EOF -> quarantined
    with _pytest.raises(Exception, match="PDF|EOF|startxref"):
        pdf_audit(df, fake=False).collect()

    import random

    rng = random.Random(41)
    for _ in range(1500):
        b = bytearray(classic)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _pdf_structure(bytes(b))
        except ValueError:
            pass


def test_tar_audit_header_chain(spark):
    """tar_audit (r11, pytest-locked): REAL stdlib tarfile fixtures
    (ustar + pax, files/dirs/symlinks) — entry hop via octal sizes,
    POSIX checksum verification, type counts, trailer completeness;
    doctored checksums/sizes and overruns quarantine."""
    import io
    import tarfile

    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _tar_structure, tar_audit

    def make_tar(fmt):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as t:
            for name, size in (("a.txt", 5000), ("b/c.bin", 300)):
                ti = tarfile.TarInfo(name)
                ti.size = size
                t.addfile(ti, io.BytesIO(b"Q" * size))
            d = tarfile.TarInfo("b")
            d.type = tarfile.DIRTYPE
            t.addfile(d)
            ln = tarfile.TarInfo("link")
            ln.type = tarfile.SYMTYPE
            ln.linkname = "a.txt"
            t.addfile(ln)
        return buf.getvalue()

    ustar = make_tar(tarfile.USTAR_FORMAT)
    s = _tar_structure(ustar)
    assert s["n_files"] == 2 and s["n_dirs"] == 1 and s["n_links"] == 1
    assert s["n_meta"] == 0 and s["total_file_bytes"] == 5300
    assert s["is_ustar"] and s["complete_trailer"]

    pax = make_tar(tarfile.PAX_FORMAT)
    s = _tar_structure(pax)
    assert s["n_files"] == 2 and s["total_file_bytes"] == 5300

    # truncated tail (strip ALL trailing zero blocks — tarfile pads to
    # the 10240 blocking factor): entries still counted, trailer
    # incomplete
    end = len(ustar)
    while end >= 512 and ustar[end - 512 : end] == b"\x00" * 512:
        end -= 512
    s = _tar_structure(ustar[:end])
    assert s["n_files"] == 2 and not s["complete_trailer"]

    bad_sum = bytearray(ustar)
    bad_sum[0] ^= 0xFF
    with _pytest.raises(ValueError, match="checksum"):
        _tar_structure(bytes(bad_sum))
    bad_size = bytearray(ustar)
    bad_size[124:130] = b"zzzzzz"
    with _pytest.raises(ValueError, match="checksum|size"):
        _tar_structure(bytes(bad_size))
    with _pytest.raises(ValueError, match="no tar entries"):
        _tar_structure(b"\x00" * 1024)

    df = spark.createDataFrame(
        [(1, bytearray(ustar)), (2, bytearray(pax)),
         (3, bytearray(b"not a tar" * 60))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in tar_audit(df).collect()}
    assert rows[1]["n_entries"] == 4 and rows[2]["n_files"] == 2
    assert rows[3]["n_entries"] is None
    with _pytest.raises(Exception, match="tar"):
        tar_audit(df, fake=False).collect()

    import random

    rng = random.Random(43)
    for _ in range(1500):
        b = bytearray(ustar)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _tar_structure(bytes(b))
        except ValueError:
            pass


def _ebml(eid: bytes, payload: bytes) -> bytes:
    n = len(payload)
    size = bytes([0x80 | n]) if n < 127 else bytes([0x40 | (n >> 8), n & 0xFF])
    return eid + size + payload


def test_mkv_audit_ebml_walk(spark):
    """mkv_audit (r10, pytest-locked): hand-built EBML trees — DocType,
    TimecodeScale + float64 Duration → duration_ms, TrackEntry
    TrackType video/audio classification, PixelWidth/Height; an
    UNKNOWN-SIZE Segment (live-stream form, size vint all-ones)
    extends to the blob end; Cluster payloads skipped; non-EBML and
    overrunning elements quarantine under fake=True."""
    import struct

    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _mkv_structure, mkv_audit

    header = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"webm"))
    info = _ebml(
        b"\x15\x49\xa9\x66",
        _ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
        + _ebml(b"\x44\x89", struct.pack(">d", 12345.0)),
    )
    vtrack = _ebml(
        b"\xae",
        _ebml(b"\x83", b"\x01")
        + _ebml(b"\xe0",
                _ebml(b"\xb0", (1280).to_bytes(2, "big"))
                + _ebml(b"\xba", (720).to_bytes(2, "big"))),
    )
    atrack = _ebml(b"\xae", _ebml(b"\x83", b"\x02"))
    tracks = _ebml(b"\x16\x54\xae\x6b", vtrack + atrack)
    cluster = _ebml(b"\x1f\x43\xb6\x75", b"\xde\xad" * 20)  # skipped
    seg_body = info + tracks + cluster
    mkv = header + _ebml(b"\x18\x53\x80\x67", seg_body)
    s = _mkv_structure(mkv)
    assert s == {"doctype": "webm", "timescale_ns": 1_000_000,
                 "duration_ms": 12345, "n_tracks": 2, "has_video": True,
                 "has_audio": True, "width": 1280, "height": 720}

    # unknown-size Segment (live stream): size vint 0xFF = all value
    # bits set at length 1 -> extends to end of blob
    live = header + b"\x18\x53\x80\x67" + b"\xff" + seg_body
    assert _mkv_structure(live)["duration_ms"] == 12345

    # hostile Duration floats (inf/nan/negative) must be ValueError,
    # not OverflowError leaking past the quarantine (fuzz-found)
    for hostile in (float("inf"), float("nan"), -5.0):
        bad_info = _ebml(
            b"\x15\x49\xa9\x66", _ebml(b"\x44\x89", struct.pack(">d", hostile))
        )
        bad = header + _ebml(b"\x18\x53\x80\x67", bad_info + tracks)
        with _pytest.raises(ValueError, match="implausible"):
            _mkv_structure(bad)

    df = spark.createDataFrame(
        [(1, bytearray(mkv)), (2, bytearray(live)),
         (3, bytearray(b"\x00\x00garbage")), (4, bytearray(mkv[:15]))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in mkv_audit(df).collect()}
    assert rows[1]["duration_ms"] == 12345 and rows[1]["has_video"]
    assert (rows[1]["width"], rows[1]["height"]) == (1280, 720)
    assert rows[2]["n_tracks"] == 2
    assert rows[3]["doctype"] is None
    assert rows[4]["doctype"] is None  # truncated mid-header
    with _pytest.raises(Exception, match="EBML"):
        mkv_audit(df, fake=False).collect()

    # contract fuzz
    import random

    rng = random.Random(17)
    for _ in range(1500):
        b = bytearray(mkv)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 12))
            ) + b[i:]
        try:
            _mkv_structure(bytes(b))
        except ValueError:
            pass


def _tiff_ifd(bo: str, entries: list[tuple[int, int]], next_off: int) -> bytes:
    out = len(entries).to_bytes(2, bo)
    for tag, val in entries:
        # SHORT(3), count 1, value left-justified in the 4-byte field
        out += tag.to_bytes(2, bo) + (3).to_bytes(2, bo)
        out += (1).to_bytes(4, bo) + val.to_bytes(2, bo) + b"\x00\x00"
    return out + next_off.to_bytes(4, bo)


def test_tiff_audit_ifd_walk(spark):
    """tiff_audit (r10, pytest-locked): II and MM fixtures (inline
    SHORT values are LEFT-justified in the value field — the
    endianness trap the MM case pins), multi-page IFD chains counted,
    a CYCLIC next-IFD chain raises instead of spinning, and non-TIFF
    quarantines under fake=True / raises under fake=False."""
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _tiff_structure, tiff_audit

    ii = (b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
          + _tiff_ifd("little", [(256, 640), (257, 480), (259, 1)], 0))
    s = _tiff_structure(ii)
    assert s == {"byte_order": "II", "width": 640, "height": 480,
                 "n_pages": 1, "compression": 1}

    ifd1 = _tiff_ifd("big", [(256, 64), (257, 32), (259, 5)], 0)
    ifd0_len = 2 + 3 * 12 + 4
    mm = (b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big")
          + _tiff_ifd("big", [(256, 800), (257, 600), (259, 1)],
                      8 + ifd0_len)
          + ifd1)
    s = _tiff_structure(mm)
    assert s == {"byte_order": "MM", "width": 800, "height": 600,
                 "n_pages": 2, "compression": 1}  # dims from FIRST IFD

    cyclic = (b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
              + _tiff_ifd("little", [(256, 1)], 8))  # next IFD -> itself
    with _pytest.raises(ValueError, match="cyclic"):
        _tiff_structure(cyclic)

    df = spark.createDataFrame(
        [(1, bytearray(ii)), (2, bytearray(mm)),
         (3, bytearray(b"BM" + b"\x00" * 30)), (4, bytearray(cyclic))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in tiff_audit(df).collect()}
    assert (rows[1]["width"], rows[1]["n_pages"]) == (640, 1)
    assert (rows[2]["byte_order"], rows[2]["n_pages"]) == ("MM", 2)
    assert rows[3]["byte_order"] is None
    assert rows[4]["byte_order"] is None  # cyclic chain quarantined
    with _pytest.raises(Exception, match="TIFF"):
        tiff_audit(df, fake=False).collect()

    # contract fuzz
    import random

    rng = random.Random(11)
    for _ in range(1200):
        b = bytearray(mm)
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[: rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 8))
            ) + b[i:]
        try:
            _tiff_structure(bytes(b))
        except ValueError:
            pass


def test_media_meta_sniffs_webp_and_tiff(spark):
    """attach_media_meta: 'WEBP' at offset 8 refines the RIFF family to
    'webp' while plain RIFF stays 'wav' (the oracled pseudo-decode
    gates depend on that), and the II*/MM* magics sniff 'tiff'."""
    from hadoop_fcfs_spark.llm.multimodal import attach_media_meta

    webp = _webp_container(_webp_chunk(b"VP8L", b"\x2f" + b"\x00" * 4))
    tiff = b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
    df = spark.createDataFrame(
        [(1, bytearray(webp)), (2, bytearray(b"RIFF1234WAVEfmt ")),
         (3, bytearray(tiff)), (4, bytearray(b"MM\x00*" + b"\x00" * 8))],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: r["media_meta"]["format"]
        for r in attach_media_meta(df).collect()
    }
    assert got == {1: "webp", 2: "wav", 3: "tiff", 4: "tiff"}
    # ISO-BMFF: 'ftyp' at offset 4
    mp4 = (20).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 8
    df2 = spark.createDataFrame(
        [(9, bytearray(mp4))], "media_id long, payload binary"
    )
    assert attach_media_meta(df2).collect()[0]["media_meta"]["format"] == "mp4"


def test_gif_animation_disposal_hand_chain():
    """Hand 3-frame chain pinning each disposal mode: frame 1 paints a
    2x2 patch (restore-background wipes it), frame 2 paints with
    restore-previous (its paint vanishes after display), frame 3's
    transparent pixels leave the restored canvas visible."""
    import numpy as np

    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif_frames,
        _encode_gif_anim,
    )

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f1 = (np.full((2, 2), 1, np.int32), 0, 0)   # red patch at origin
    f2 = (np.full((2, 2), 2, np.int32), 2, 2)   # green patch at (2,2)
    f3 = (np.array([[3, 0], [0, 3]], np.int32), 0, 0)  # blue diag, 0 transparent
    blob = _encode_gif_anim(
        [f1, f2, f3], pal, (4, 4),
        delays_cs=[10, 20, 30],
        disposals=[2, 3, 0],
        transparents=[None, None, 0],
        background=0,
    )
    frames = _decode_gif_frames(blob)
    assert [d for _, d in frames] == [10, 20, 30]
    c1, c2, c3 = (f for f, _ in frames)
    assert (c1[0:2, 0:2] == [255, 0, 0]).all()          # red visible
    assert (c2[0:2, 0:2] == [0, 0, 0]).all()            # wiped to background
    assert (c2[2:4, 2:4] == [0, 255, 0]).all()          # green visible
    assert (c3[2:4, 2:4] == [0, 0, 0]).all()            # previous restored
    assert (c3[0, 0] == [0, 0, 255]).all()              # blue paints
    assert (c3[0, 1] == [0, 0, 0]).all()                # transparent: bg shows
    # validation: frame exceeding the screen, mismatched metadata
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _encode_gif_anim([(np.zeros((5, 5), np.int32), 0, 0)], pal, (4, 4))
    with _pytest.raises(ValueError):
        _encode_gif_anim([f1], pal, (4, 4), delays_cs=[1, 2])


def test_sample_frames_extracts_real_gif_frames(spark):
    """sample_frames (r9): animated GIFs yield one row per COMPOSED
    frame with the md5 of the canvas RGB bytes — checked against a
    direct _decode_gif_frames pass; malformed GIFs fall to the
    byte-window stub under fake=True and raise under fake=False."""
    import hashlib

    import numpy as np

    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif_frames,
        _encode_gif_anim,
        sample_frames,
    )

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    frames = [
        (np.full((3, 3), 1, np.int32), 0, 0),
        (np.full((2, 2), 2, np.int32), 1, 1),
        (np.full((1, 4), 3, np.int32), 0, 3),
    ]
    blob = _encode_gif_anim(frames, pal, (4, 4), delays_cs=[5, 5, 5])
    expected = [
        hashlib.md5(f.tobytes()).hexdigest()
        for f, _ in _decode_gif_frames(blob)
    ]
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"GIF89a" + b"\x00" * 4))],
        "media_id long, payload binary",
    )
    out = sample_frames(df, fake=True).collect()
    got = sorted(
        (r["media_id"], r["frame_idx"], r["frame_digest"]) for r in out
    )
    real = [(m, i, d) for m, i, d in got if m == 1]
    assert [d for _, _, d in real] == expected
    assert any(m == 2 for m, _, _ in got)  # stub path still total
    with pytest.raises(Exception):
        sample_frames(
            df.filter(F.col("media_id") == 2), fake=False
        ).collect()


def test_jpeg_decode_hand_packed_bitstream():
    """ENCODER-INDEPENDENT JPEG pin: a single-MCU grayscale file built
    byte-by-byte BY HAND (flat quant table of 4s, one-code Huffman
    tables, DC category 3 value +4, immediate EOB) must decode to a
    constant 8x8 block: DC coefficient 4 * qt 4 = 16, IDCT of a
    DC-only block = 16/8 = 2.0 everywhere, +128 level shift -> 130.
    Bitstream: DC code '0' + magnitude '100', AC EOB '0' -> 01000
    padded with 1s = 0x47."""
    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg

    def seg(m, p):
        return bytes((0xFF, m)) + (len(p) + 2).to_bytes(2, "big") + p

    qt = bytes([4] * 64)
    dht_dc = bytes((0x00,)) + bytes((1,) + (0,) * 15) + bytes((3,))
    dht_ac = bytes((0x10,)) + bytes((1,) + (0,) * 15) + bytes((0x00,))
    sof = (
        bytes((8,)) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes((1, 1, 0x11, 0))
    )
    sos = bytes((1, 1, 0x00)) + b"\x00\x3f\x00"
    blob = (
        b"\xff\xd8" + seg(0xDB, b"\x00" + qt) + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac) + seg(0xC0, sof) + seg(0xDA, sos)
        + bytes([0b01000111]) + b"\xff\xd9"
    )
    img = decode_jpeg(blob)
    assert img.shape == (8, 8, 3)
    assert (img == 130).all()


def test_jpeg_roundtrip_444_420_gray_restart():
    """Round-trips through the in-repo encoder: constant colors come
    back exactly (quantization cannot move a constant block), a smooth
    gradient at q=95 stays within a small bound in 4:4:4 AND through
    the restart-marker resync path, 4:2:0 recovers 16x16-constant
    blocks exactly (the chroma box average is the block value), and
    grayscale decodes via the 1-component path."""
    import numpy as np

    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rgb = np.full((16, 24, 3), (90, 160, 40), np.uint8)
    for sub in (False, True):
        dec = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=sub))
        assert dec.shape == (16, 24, 3)
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2

    yy, xx = np.mgrid[0:21, 0:37]
    grad = np.stack(
        [(yy * 3 + 20) % 256, (xx * 2 + 50) % 256, ((yy + xx) * 2) % 256], -1
    ).astype(np.uint8)
    for ri in (0, 2):
        dec = decode_jpeg(encode_jpeg(grad, quality=95, restart_interval=ri))
        assert dec.shape == grad.shape
        assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 12

    g = (yy * 7 % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (21, 37, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()  # gray replicated
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 14

    blocks = np.kron(
        np.arange(4).reshape(2, 2) * 60 + 30, np.ones((16, 16))
    ).astype(np.uint8)
    rgb420 = np.stack([blocks, 255 - blocks, blocks // 2], -1)
    dec = decode_jpeg(encode_jpeg(rgb420, quality=95, subsample=True))
    assert np.abs(dec.astype(int) - rgb420.astype(int)).max() <= 2


def test_pillow_gate_absent_and_magic_guard():
    """The Pillow fast-path plumbing that runs REGARDLESS of whether
    Pillow is installed: non-raster magics must return None from
    _pillow_rgb (oracled gates feed RIFF/unknown blobs through the
    deterministic pseudo-decode — the fast path must never intercept
    them), and when Pillow is absent every call returns None so the
    pure codecs govern."""
    from hadoop_fcfs_spark.llm.multimodal import _pillow, _pillow_rgb

    assert _pillow_rgb(b"RIFF" + b"px0" * 100) is None
    assert _pillow_rgb(b"\x00\x01garbage") is None
    if _pillow() is None:
        assert _pillow_rgb(b"BM" + b"\x00" * 60) is None


def test_pillow_fast_path_matches_pure_codecs():
    """Production fast path vs the pure-Python oracle (VERDICT r9 #5):
    when Pillow is installed, _pillow_rgb must decode the lossless
    containers (BMP, truecolor PNG, palette GIF) PIXEL-EQUAL to the
    pure decoders, and JPEG within a small per-pixel delta (different
    IDCT implementations). Skipped while the container lacks Pillow —
    the day the env grows it, this test is the contract."""
    import numpy as np
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg, encode_jpeg
    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif,
        _decode_png,
        _encode_gif,
        _encode_png,
        _pillow,
        _pillow_rgb,
        _png_luma,
    )

    if _pillow() is None:
        _pytest.skip("Pillow not installed — pure codecs are the only path")

    yy, xx = np.mgrid[0:17, 0:23]
    rgb = np.stack(
        [(yy * 9 + 3) % 256, (xx * 7 + 50) % 256, ((yy + xx) * 5) % 256], -1
    ).astype(np.uint8)

    png = _encode_png(rgb)
    assert (_pillow_rgb(png) == _decode_png(png)[:, :, :3]).all()

    bmp = _make_bmp([[tuple(int(c) for c in rgb[y, x])
                      for x in range(rgb.shape[1])]
                     for y in range(rgb.shape[0])])
    from hadoop_fcfs_spark.llm.multimodal import _decode_bmp

    assert np.allclose(_png_luma(_pillow_rgb(bmp)), _decode_bmp(bmp))

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    idx = ((yy + xx) % 4).astype(np.uint8)
    gif = _encode_gif(idx, pal)
    assert np.allclose(_png_luma(_pillow_rgb(gif)), _decode_gif(gif))

    jblob = encode_jpeg(rgb, quality=95)
    fast, pure = _pillow_rgb(jblob), decode_jpeg(jblob)
    assert fast.shape == pure.shape
    assert np.abs(fast.astype(int) - pure.astype(int)).max() <= 4


def test_jpeg_fill_bytes_between_segments_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code between header segments — spec-valid padded files must decode
    identically to the unpadded stream (the post-SOS resync path
    already skipped them; the header loop must too)."""
    import numpy as np

    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rgb = np.full((16, 24, 3), (90, 160, 40), np.uint8)
    blob = encode_jpeg(rgb, quality=95)
    # insert fill bytes after SOI (before the first header segment) and
    # again just before the SOS marker
    sos = blob.index(b"\xff\xda")
    padded = (
        blob[:2] + b"\xff" * 3 + blob[2:sos] + b"\xff" * 2 + blob[sos:]
    )
    assert (decode_jpeg(padded) == decode_jpeg(blob)).all()
    # fill bytes running to EOF are still truncation, not a hang
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated|fill"):
        decode_jpeg(blob[:2] + b"\xff" * 6)


def test_jpeg_strict_boundaries():
    """Honest error surface: non-JPEG, truncated streams, and the
    arithmetic-coded / lossless processes raise ValueError with a
    tellable message; a progressive SOF with no scan data is
    truncated, not 'unsupported' (progressive decodes for real)."""
    import numpy as np
    import pytest as _pytest

    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg, encode_jpeg

    def seg(m, p):
        return bytes((0xFF, m)) + (len(p) + 2).to_bytes(2, "big") + p

    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    good = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    with _pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(good[:40])
    sof = (
        bytes((8,)) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes((1, 1, 0x11, 0))
    )
    for marker in (0xC9, 0xC3):  # arithmetic sequential / lossless
        with _pytest.raises(ValueError, match="arithmetic|lossless"):
            decode_jpeg(b"\xff\xd8" + seg(marker, sof))
    with _pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8" + seg(0xC2, sof))  # progressive, no scan


def test_jpeg_decode_is_real(spark):
    """decode_images / image_ahash / resize_images run the REAL JPEG
    path under fake=False: real dimensions and luma from the decoded
    pixels, the aHash of the SAME picture collides across BMP and JPEG
    containers (the hash is over pixels), and resize re-encodes a
    valid baseline JPEG that decodes at the target size."""
    import numpy as np

    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg, encode_jpeg
    from hadoop_fcfs_spark.llm.multimodal import (
        attach_media_meta,
        decode_images,
        image_ahash,
        resize_images,
    )

    grad = np.stack(
        [np.tile(np.arange(16) * 16, (16, 1))] * 3, axis=-1
    ).astype(np.uint8)
    jblob = encode_jpeg(grad, quality=95)
    bblob = _make_bmp(
        [[tuple(int(v) for v in grad[y, x]) for x in range(16)]
         for y in range(16)]
    )
    df = spark.createDataFrame(
        [(1, bytearray(jblob)), (2, bytearray(bblob))],
        "media_id long, payload binary",
    )
    meta = {r["media_id"]: r["media_meta"]["format"]
            for r in attach_media_meta(df).collect()}
    assert meta == {1: "jpeg", 2: "bmp"}

    out = {r["media_id"]: r for r in decode_images(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (16, 16)
    # lossy but tight at q=95: decoded mean within 1/255 of the source
    assert abs(out[1]["mean_luma"] - out[2]["mean_luma"]) < 1.5 / 255

    hashes = {r["media_id"]: r["ahash"]
              for r in image_ahash(df, fake=False).collect()}
    assert hashes[1] == hashes[2], "same picture must hash alike across formats"

    rez = resize_images(df, target_w=8, target_h=8, fake=False).collect()
    jout = next(bytes(r["payload"]) for r in rez if r["media_id"] == 1)
    dec = decode_jpeg(jout)
    assert dec.shape == (8, 8, 3)
    # nearest-neighbor of a horizontal gradient keeps monotone columns
    assert (np.diff(dec[:, :, 0].astype(int), axis=1) >= -12).all()


def test_audio_features_real_spectral(spark):
    """extract_audio_features (r9): WAV payloads get REAL log-spaced
    band energies from an rFFT power spectrum — a pure low tone
    concentrates its energy in a LOWER band than a pure high tone, two
    different tones produce different vectors, the same tone is
    deterministic, duration comes from the header exactly, and
    compressed/garbage audio keeps the digest path under fake=True and
    raises under fake=False."""
    import io
    import math
    import struct
    import wave

    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import extract_audio_features

    def tone_wav(freq, rate=8000, n=8000, amp=12000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            samples = [
                int(amp * math.sin(2 * math.pi * freq * i / rate))
                for i in range(n)
            ]
            w.writeframes(struct.pack(f"<{n}h", *samples))
        return buf.getvalue()

    rows = [
        (0, tone_wav(50)),      # low tone
        (1, tone_wav(3000)),    # high tone (near Nyquist 4000)
        (2, b"ID3\x03mp3-ish garbage payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}

    assert abs(got[0]["duration_s"] - 1.0) < 1e-9
    lo, hi = got[0]["features"], got[1]["features"]
    assert len(lo) == len(hi) == 8
    # the dominant band moves up with frequency
    assert lo.index(max(lo)) < hi.index(max(hi))
    assert lo != hi
    # deterministic across runs
    again = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert again[0]["features"] == lo
    # garbage: digest pseudo-features under fake=True, raise under fake=False
    assert len(got[2]["features"]) == 8
    bad = df.filter(F.col("media_id") == 2)
    with _pytest.raises(Exception, match="codec|librosa|NotImplemented"):
        extract_audio_features(bad, fake=False).collect()


def test_jpeg_progressive_equals_baseline_bit_exact():
    """THE progressive oracle: spectral-selection progressive encoding
    produces IDENTICAL quantized coefficients to baseline, so
    decode(encode_jpeg_progressive(X)) must equal
    decode(encode_jpeg(X)) bit-for-bit — across gray / 4:4:4 / 4:2:0,
    quality tiers, an all-empty-AC image (the pure EOBRUN path), and
    non-multiple-of-8 sizes. Any error in scan accumulation, EOBn
    decode, non-interleaved block geometry or the flat Huffman table
    breaks exactness immediately."""
    import numpy as np

    from hadoop_fcfs_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], -1
    ).astype(np.uint8)
    cases = [
        (rng.integers(0, 256, (21, 37), np.uint8), False),
        (rng.integers(0, 256, (16, 24, 3), np.uint8), False),
        (rng.integers(0, 256, (19, 33, 3), np.uint8), True),
        (np.full((8, 8, 3), 128, np.uint8), False),  # EOBRUN-only scans
        (smooth, True),
    ]
    for img, sub in cases:
        for q in (50, 90, 100):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsample=sub)
            )
            assert np.array_equal(base, prog)


def test_jpeg_progressive_successive_approximation_hand_packed():
    """ENCODER-INDEPENDENT successive-approximation pin: a 4-scan
    progressive file built byte-by-byte BY HAND — DC first at Al=1
    (diff +3 -> coef 6), DC refinement bit 1 (-> 7), AC first at Al=1
    (zigzag-1 coefficient +1 -> 2), AC refinement (correction bit
    lifts it to 3 AND a newly-nonzero -1 lands at zigzag-2, then an
    EOB run covers the band tail). Expected pixels computed with an
    independent cosine-sum IDCT, not the codec's matrix."""
    import math

    import numpy as np

    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg

    def seg(m, p):
        return bytes((0xFF, m)) + (len(p) + 2).to_bytes(2, "big") + p

    qt = bytes([1] * 64)
    dht_dc = bytes((0x00,)) + bytes((1,) + (0,) * 15) + bytes((2,))
    dht_ac = bytes((0x10,)) + bytes((1, 1) + (0,) * 14) + bytes((0x01, 0x00))
    sof2 = (
        bytes((8,)) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes((1, 1, 0x11, 0))
    )
    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qt)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xC2, sof2)
        # scan A: DC first, Al=1: code '0' (cat 2) + bits '11' -> pred 3, stored 6
        + seg(0xDA, bytes((1, 1, 0x00)) + bytes((0, 0, 0x01)))
        + bytes((0b01111111,))
        # scan B: DC refine (Ah=1, Al=0): bit '1' -> 6|1 = 7 (0xFF needs stuffing)
        + seg(0xDA, bytes((1, 1, 0x00)) + bytes((0, 0, 0x10)))
        + b"\xff\x00"
        # scan C: AC first Al=1: '0'(rs 0x01) '1'(+1 -> stored 2) '10'(EOB)
        + seg(0xDA, bytes((1, 1, 0x00)) + bytes((1, 63, 0x01)))
        + bytes((0b01101111,))
        # scan D: AC refine Al=0: '0'(rs 0x01) '0'(sign -> -1) '1'(correction
        # on zigzag-1: 2 -> 3) place -1 at zigzag-2, '10'(EOB run drains tail)
        + seg(0xDA, bytes((1, 1, 0x00)) + bytes((1, 63, 0x10)))
        + bytes((0b00110111,))
        + b"\xff\xd9"
    )
    img = decode_jpeg(blob)

    F = np.zeros((8, 8))
    F[0, 0], F[0, 1], F[1, 0] = 7.0, 3.0, -1.0  # zigzag 0,1,2 -> natural

    def c(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    exp = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += (
                        c(u) * c(v) / 4.0 * F[v, u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            exp[y, x] = s + 128.0
    expected = np.clip(np.round(exp), 0, 255).astype(np.uint8)
    assert img.shape == (8, 8, 3)
    assert (img[:, :, 0] == expected).all()
    assert (img[:, :, 1] == expected).all()


def test_jpeg_progressive_restart_markers_hand_packed():
    """Restart resync inside a progressive scan (hand-packed): a 16x8
    grayscale frame = 2 blocks, DRI=1, one DC-first scan whose two
    MCUs are split by an RST0 marker — the decoder must byte-align,
    consume the marker, and RESET the DC predictor, so the identical
    per-MCU bits '0'+'11' give BOTH blocks DC 3 (not 3 then 6)."""
    import numpy as np

    from hadoop_fcfs_spark.llm.jpeg import decode_jpeg

    def seg(m, p):
        return bytes((0xFF, m)) + (len(p) + 2).to_bytes(2, "big") + p

    qt = bytes([1] * 64)
    dht_dc = bytes((0x00,)) + bytes((1,) + (0,) * 15) + bytes((2,))
    dht_ac = bytes((0x10,)) + bytes((1,) + (0,) * 15) + bytes((0x00,))
    sof2 = (
        bytes((8,)) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes((1, 1, 0x11, 0))
    )
    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qt)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDD, (1).to_bytes(2, "big"))  # DRI = 1 MCU
        + seg(0xC2, sof2)
        + seg(0xDA, bytes((1, 1, 0x00)) + bytes((0, 0, 0x00)))
        + bytes((0b01111111,))       # MCU0: cat-2 code '0' + '11' -> DC 3
        + b"\xff\xd0"                # RST0: predictor resets
        + bytes((0b01111111,))       # MCU1: same bits -> DC 3 again
        # AC scan (DRI still active -> RST0 between its two blocks too,
        # with its own restart numbering starting back at 0)
        + seg(0xDA, bytes((1, 1, 0x00)) + bytes((1, 63, 0x00)))
        + bytes((0b01111111,))       # block 0: EOB0 ('0') + pad
        + b"\xff\xd0"
        + bytes((0b01111111,))       # block 1: EOB0 ('0') + pad
        + b"\xff\xd9"
    )
    img = decode_jpeg(blob)
    assert img.shape == (8, 16, 3)
    # DC 3 -> 3/8 + 128 = 128.375 -> 128 everywhere, both blocks equal
    assert (img == 128).all()


def test_image_decoder_fuzz_and_bomb_contract():
    """The 100-TB hostile-blob contract, pinned two ways. (1) FUZZ:
    random byte mutations + truncations of valid JPEG (baseline, 4:2:0,
    progressive) / PNG / GIF / animated-GIF / BMP fixtures either
    decode or raise ValueError — NEVER IndexError/struct.error/etc.,
    because _try_luma's fake=True totality (and therefore executor-task
    survival) catches ValueError only. (2) BOMBS: a ~100-byte blob
    whose header claims 40000x40000 fails the _MAX_PIXELS guard BEFORE
    allocating — JPEG coefficient arrays, PNG's bounded
    decompressobj inflate, and the GIF canvas each stay at ~zero bytes
    instead of multi-GB (a real 6.4 GB allocation pre-fix)."""
    import tracemalloc

    import numpy as np

    from hadoop_fcfs_spark.llm import jpeg
    from hadoop_fcfs_spark.llm.multimodal import (
        _decode_gif,
        _decode_gif_frames,
        _decode_png,
        _encode_gif,
        _encode_gif_anim,
        _encode_png,
    )

    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, (12, 18, 3), dtype=np.uint8)
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    fixtures = [
        (jpeg.encode_jpeg(img, 85), jpeg.decode_jpeg),
        (jpeg.encode_jpeg(img, 85, subsample=True), jpeg.decode_jpeg),
        (jpeg.encode_jpeg_progressive(img, 85), jpeg.decode_jpeg),
        (_encode_png(img), _decode_png),
        (_encode_gif(rng.integers(0, 4, (10, 14)), pal), _decode_gif),
        (
            _encode_gif_anim(
                [(np.ones((4, 4), int), 0, 0), (np.ones((2, 2), int), 1, 1)],
                pal, (4, 4),
            ),
            _decode_gif_frames,
        ),
    ]
    for blob, dec in fixtures:
        for _ in range(250):
            b = bytearray(blob)
            for _ in range(int(rng.integers(1, 8))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            if rng.random() < 0.3:
                b = bytes(b[: int(rng.integers(1, len(b)))])
            try:
                dec(bytes(b))
            except ValueError:
                pass  # the ONLY acceptable failure type

    def seg(m, p):
        return bytes((0xFF, m)) + (len(p) + 2).to_bytes(2, "big") + p

    big = (40000).to_bytes(2, "big")
    bigl = (40000).to_bytes(2, "little")
    sof = bytes((8,)) + big + big + bytes((1, 1, 0x11, 0))
    bombs = [
        (
            b"\xff\xd8" + seg(0xDB, b"\x00" + bytes([1] * 64))
            + seg(0xC0, sof),
            jpeg.decode_jpeg,
        ),
        (
            b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + (40000).to_bytes(4, "big") + (40000).to_bytes(4, "big")
            + bytes((8, 2, 0, 0, 0)) + b"\x00" * 4
            + (10).to_bytes(4, "big") + b"IDAT" + b"\x00" * 14,
            _decode_png,
        ),
        (
            b"GIF89a" + bigl + bigl + bytes((0x80, 0, 0)) + b"\x00" * 6
            + b"\x2c" + b"\x00" * 4 + bigl + bigl + b"\x00\x02\x00\x3b",
            _decode_gif,
        ),
    ]
    for blob, dec in bombs:
        tracemalloc.start()
        with pytest.raises(ValueError, match="cap|exceed"):
            dec(blob)
        peak = tracemalloc.get_traced_memory()[1]
        tracemalloc.stop()
        assert peak < 50_000_000, f"bomb allocated {peak} bytes"


def test_wav_ops_quarantine_hostile_blobs(spark):
    """Hostile-WAV contract: 300 random mutations/truncations of a
    valid WAV ride through ALL FOUR audio ops in one job each — every
    blob either decodes or lands in the documented quarantine (NULL
    fields / digest pseudo-path), and the job NEVER dies. Pre-fix,
    ~14% of mutations leaked RuntimeError (wave module internals) or
    audioop.error (odd frame bytes, bad sample width) through the
    narrow `except (wave.Error, EOFError, ValueError)` and killed the
    executor task."""
    import io
    import struct
    import wave

    import numpy as np

    from hadoop_fcfs_spark.llm.multimodal import (
        audio_fingerprint,
        decode_wav,
        extract_audio_features,
        resample_wav,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<400h", *([500, -500] * 200)))
    base = buf.getvalue()

    rng = np.random.default_rng(5)
    rows = []
    for i in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        if rng.random() < 0.3:
            b = b[: int(rng.integers(1, len(b)))]
        rows.append((i, bytes(b)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    assert decode_wav(df).count() == 300
    assert resample_wav(df, 4000).count() == 300
    assert audio_fingerprint(df).count() == 300
    assert extract_audio_features(df).count() == 300  # fake=True total


def test_lz76_complexity_definition_replay():
    """lz76_complexity (r12, pytest-locked per the non-SQL-expressible
    rule): the Kaspar-Schuster O(n^2) scan vs an INDEPENDENT
    definition-based brute force (longest self-reproducible extension
    via explicit substring search) on exhaustive small binaries and
    random small-alphabet sequences, plus the canonical anchors:
    constant -> 2, alternating -> 3, the K&S paper vector -> 6."""
    import itertools
    import random

    from hadoop_fcfs_spark.llm.textan import lz76_complexity

    def brute(seq):
        s = list(seq)
        n = len(s)
        c = i = 0
        while i < n:
            L = 0
            while i + L < n and any(
                s[j : j + L + 1] == s[i : i + L + 1] for j in range(i)
            ):
                L += 1
            i += L + 1
            c += 1
        return c

    assert lz76_complexity([]) == 0
    assert lz76_complexity(["x"]) == 1
    for k in range(2, 40):
        assert lz76_complexity(["x"] * k) == 2
    assert lz76_complexity(list("ababab")) == 3
    assert lz76_complexity(list("1001111011000010")) == 6  # K&S 1987
    # exhaustive over all binary strings up to length 10
    for n in range(1, 11):
        for bits in itertools.product("01", repeat=n):
            assert lz76_complexity(bits) == brute(bits), bits
    # random small-alphabet token sequences
    rng = random.Random(31)
    for _ in range(300):
        seq = [rng.choice("abcd") for _ in range(rng.randint(1, 60))]
        assert lz76_complexity(seq) == brute(seq), seq
    # complexity is bounded by the trivial parse and hits it on
    # all-distinct input
    distinct = [f"t{i}" for i in range(25)]
    assert lz76_complexity(distinct) == 25


def test_doc_lz_complexity_spark_plumbing(spark):
    """doc_lz_complexity: the mapInPandas wrapper reproduces the pure
    function per document (whitespace tokens), empty docs yield
    (0, 0, NULL), and template-like text reads lower-ratio than
    all-distinct text."""
    from hadoop_fcfs_spark.llm.textan import (
        doc_lz_complexity,
        lz76_complexity,
    )

    docs = [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "to be or not to be or not to be or not"),
        (4, ""),
        (5, "  "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in doc_lz_complexity(df, "doc_id", "text").collect()}
    for did, text in docs:
        toks = text.split()
        r = rows[did]
        assert r["n_tokens"] == len(toks)
        assert r["lz_phrases"] == lz76_complexity(toks)
        if toks:
            assert r["lz_ratio_e6"] == r["lz_phrases"] * 1_000_000 // len(toks)
        else:
            assert r["lz_ratio_e6"] is None
    assert rows[1]["lz_ratio_e6"] < rows[2]["lz_ratio_e6"]
    assert rows[3]["lz_ratio_e6"] < rows[2]["lz_ratio_e6"]
    # max_tokens cap (r12 review fix): an oversized doc quarantines as
    # (n_tokens, NULL, NULL) instead of stalling an executor on the
    # O(len^2) parse
    big = spark.createDataFrame(
        [(9, "w " * 50)], "doc_id long, text string"
    )
    [r] = doc_lz_complexity(big, "doc_id", "text", max_tokens=10).collect()
    assert r["n_tokens"] == 50
    assert r["lz_phrases"] is None and r["lz_ratio_e6"] is None


def test_mp3_crc_protected_tag_frame_excluded():
    """r13 ADVICE fix: when the frame header's protection bit signals
    a CRC (h1 & 1 == 0), a 16-bit CRC sits between the header and the
    Layer III side info, so the Xing/Info tag lives at 4+2+side — a
    CRC-protected LAME Info frame must still be excluded from
    n_frames/duration/the CBR-VBR spread."""
    from hadoop_fcfs_spark.llm.multimodal import _mp3_structure

    V1L3 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

    def frame(br_idx, protected=False):
        kbps = V1L3[br_idx - 1]
        flen = 144 * kbps * 1000 // 44100
        h = bytes([
            0xFF, 0xE0 | (3 << 3) | (1 << 1) | (0 if protected else 1),
            (br_idx << 4) | (0 << 2) | (0 << 1),
            3 << 6,
        ])
        return h + b"\x00" * (flen - 4)

    cbr = b"".join(frame(9) for _ in range(10))

    # CRC-protected Info frame at a DIFFERENT bitrate index: the tag
    # sits at 4 + 2(CRC) + 17(side, MPEG1 mono)
    info = bytearray(frame(5, protected=True))
    info[4 + 2 + 17 : 4 + 2 + 21] = b"Info"
    s = _mp3_structure(bytes(info) + cbr)
    assert s["n_frames"] == 10 and not s["vbr"]
    assert s["duration_ms"] == 10 * 1152 * 1000 // 44100

    # the same bytes WITHOUT the protection bit put 'Info' mid-payload,
    # not at the tag offset — the frame is audio and the stream is VBR
    notag = bytearray(frame(5))
    notag[4 + 2 + 17 : 4 + 2 + 21] = b"Info"
    s = _mp3_structure(bytes(notag) + cbr)
    assert s["n_frames"] == 11 and s["vbr"]

    # a CRC-protected PLAIN audio frame still counts normally
    s = _mp3_structure(frame(9, protected=True) + cbr)
    assert s["n_frames"] == 11 and not s["vbr"]


def test_zip_trailing_bytes_after_eocd_fallback():
    """r13 ADVICE fix: ZIPs with trailing bytes after the EOCD
    (appended signatures, SFX padding) have no exact comment_len
    match; the walk must fall back to the last structurally-plausible
    candidate instead of quarantining, while hostile candidates whose
    comment or directory overruns stay rejected."""
    import io
    import zipfile

    import pytest as _pytest

    from hadoop_fcfs_spark.llm.multimodal import _zip_structure

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", b"alpha" * 40)
        z.writestr("b.bin", b"\x00" * 100)
    clean = buf.getvalue()
    assert _zip_structure(clean)["n_entries"] == 2

    # trailing signature bytes after the EOCD: previously parsed via
    # rfind, must keep parsing via the structural fallback
    signed = clean + b"SIGNATURE-BLOCK" * 3
    s = _zip_structure(signed)
    assert s["n_entries"] == 2
    assert s["total_uncompressed"] == 5 * 40 + 100

    # a stored member containing a fake EOCD magic + trailing bytes:
    # the fallback must still pick the REAL record (directory-offset
    # plausibility kills the decoy, which points nowhere sane)
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w", zipfile.ZIP_STORED) as z:
        z.writestr("decoy", b"PK\x05\x06" + b"\xff" * 18)
        z.writestr("c.txt", b"gamma")
    s = _zip_structure(buf2.getvalue() + b"tail-bytes")
    assert s["n_entries"] == 2

    # garbage alone still quarantines
    with _pytest.raises(ValueError, match="end-of-central-directory"):
        _zip_structure(b"no zip here" * 10)

    # r14 ADVICE fix: a structurally-PLAUSIBLE fake EOCD planted in the
    # trailing bytes (comment fits, directory span lands before the
    # record) sits closer to the end than the real record — it must
    # lose because its cd_off does not point at a PK\x01\x02 central
    # directory entry; the scan keeps going and finds the real EOCD
    fake = (
        b"PK\x05\x06"
        + (0).to_bytes(2, "little")   # disk
        + (0).to_bytes(2, "little")   # cd_disk
        + (1).to_bytes(2, "little")   # n_here
        + (1).to_bytes(2, "little")   # n_total
        + (46).to_bytes(4, "little")  # cd_size
        + (10).to_bytes(4, "little")  # cd_off -> deflate payload, no sig
        + (5).to_bytes(2, "little")   # comment_len (inexact on purpose)
    )
    decoyed = clean + fake + b"padpadpad"  # fake is plausible, sits last
    s = _zip_structure(decoyed)
    assert s["n_entries"] == 2, "decoy EOCD in trailing bytes won the scan"

    # an EMPTY archive with trailing bytes: fallback accepts cd_size=0
    # only when cd_off points at the record itself (real empty zip)
    ebuf = io.BytesIO()
    with zipfile.ZipFile(ebuf, "w"):
        pass
    s = _zip_structure(ebuf.getvalue() + b"sig")
    assert s["n_entries"] == 0


def test_doc_lz_complexity_preserves_id_dtype(spark):
    """r13 ADVICE fix: doc_lz_complexity derives the id field's type
    from the input schema — string and int doc ids round-trip instead
    of silently Arrow-casting to long (or failing)."""
    from hadoop_fcfs_spark.llm.textan import doc_lz_complexity

    sdf = spark.createDataFrame(
        [("doc-a", "x y x y x y"), ("doc-b", "")],
        "doc string, text string",
    )
    out = doc_lz_complexity(sdf, "doc", "text")
    assert dict(out.dtypes)["doc"] == "string"
    rows = {r["doc"]: r for r in out.collect()}
    assert rows["doc-a"]["n_tokens"] == 6
    assert rows["doc-b"] == ("doc-b", 0, 0, None)

    idf = spark.createDataFrame([(7, "a b a b")], "doc int, text string")
    out = doc_lz_complexity(idf, "doc", "text")
    assert dict(out.dtypes)["doc"] == "int"
    assert out.collect()[0]["doc"] == 7


def test_host_cap_documents_policy_semantics(spark):
    """r15: host_cap_documents (the CommonCrawl/RefinedWeb host-cap
    policy) vs a pure-Python replay — quality preference keeps the
    LONGEST docs, ties and the no-preference case fall back to the
    md5 sample-key order with id tiebreak (replayed with hashlib,
    independent of the engine), under-cap hosts keep everything, and
    the audit columns carry PRE-cap totals; cap < 1 raises."""
    import hashlib

    import pytest

    from hadoop_fcfs_spark.llm.dedup import host_cap_documents

    def skey(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    rows = (
        [("big.example", i, 100 + (i % 3)) for i in range(10, 17)]  # 7 docs
        + [("tie.example", i, 50) for i in range(20, 25)]           # 5 docs, all tied
        + [("small.example", 30, 10)]                               # 1 doc
    )
    df = spark.createDataFrame(rows, "host string, doc_id long, n_chars long")
    got = {
        r["doc_id"]: (r["host"], r["host_total"], r["host_kept"])
        for r in host_cap_documents(
            df, "host", "doc_id", 3, prefer_col="n_chars"
        ).collect()
    }
    big = sorted(
        (i for h, i, _ in rows if h == "big.example"),
        key=lambda i: (-(100 + (i % 3)), skey(i), i),
    )[:3]
    tie = sorted(
        (i for h, i, _ in rows if h == "tie.example"),
        key=lambda i: (skey(i), i),
    )[:3]
    want = (
        {i: ("big.example", 7, 3) for i in big}
        | {i: ("tie.example", 5, 3) for i in tie}
        | {30: ("small.example", 1, 1)}
    )
    assert got == want
    # no-preference case: pure hash order (per_group_sample's order,
    # but with the audit columns the policy adds)
    nopref = {
        r["doc_id"]
        for r in host_cap_documents(df, "host", "doc_id", 3).collect()
        if r["host"] == "big.example"
    }
    assert nopref == set(
        sorted((i for h, i, _ in rows if h == "big.example"),
               key=lambda i: (skey(i), i))[:3]
    )
    with pytest.raises(ValueError, match="cap must be >= 1"):
        host_cap_documents(df, "host", "doc_id", 0)


def test_canonical_url_rules_python_replay(spark):
    """r15: canonical_url vs a pure-Python replay (re/str only, no
    engine) over a battery hitting EVERY rule branch: fragment,
    scheme strip (any scheme), www strip (case-insensitive, once),
    host lower-casing (path case KEPT), default-port strip (:80/:443
    only — :8080 kept), trailing-slash strip, empty/tracking param
    drop (utm_* prefix + the named set, key case-insensitive), param
    byte-sort, no-scheme / no-path / query-only / empty-string edges."""
    from hadoop_fcfs_spark.llm.dedup import canonical_url
    from tests.conftest import _canon_url_py as canon_py

    urls = [
        "https://WWW.News-Site.com/articles/item?id=7&utm_source=feed#top",
        "http://news-site.com:80/articles/item/?id=7",
        "https://news-site.com/articles/item?utm_campaign=x&id=7&fbclid=ZZZ",
        "HTTPS://WwW.EXAMPLE.COM/A/B",      # host lowers, path case kept
        "ftp://www.example.com/f/",          # non-http scheme strips too
        "example.com",                       # no scheme, no path
        "https://example.com?x=1",           # query, no path
        "https://example.com:8080/z",        # non-default port KEPT
        "https://example.com:443/z",         # default port stripped
        "https://example.com/a?x=1&x=0",     # dup keys byte-sort
        "https://example.com/a?b=2&a=1&gclid=G&",  # sort + drop + empty
        "https://example.com/a?UTM_Source=1&Ref=r",  # key case-insensitive
        "https://example.com/#",             # empty fragment
        "https://www.www.example.com/",      # www strips ONCE
        "https://example.com/p//",           # run of trailing slashes
        "",                                  # empty string
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"]
        for r in df.select(canonical_url("url").alias("c"), "url")
        .orderBy("url")
        .collect()
    ]
    want = [canon_py(u) for u in sorted(urls)]
    assert got == want
    # the three news variants above collapse to ONE key
    assert len({canon_py(u) for u in urls[:3]}) == 1


def test_url_dedup_documents_policy_semantics(spark):
    """r15: url_dedup_documents — one survivor per canonical key
    (longer doc preferred; ties fall to the md5 sample-key + id order,
    replayed with hashlib), url_dupes counts ALL rows that mapped to
    the key (the re-crawl audit), singletons pass through with
    url_dupes=1, and the echoed columns keep their input types."""
    import hashlib

    from hadoop_fcfs_spark.llm.dedup import url_dedup_documents

    def skey(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    rows = [
        (1, 90, "https://WWW.Site.com/a?utm_source=x"),   # \
        (2, 99, "http://site.com:80/a/"),                 #  same key, 2 wins (99)
        (3, 90, "https://site.com/a#frag"),               # /
        (4, 50, "https://other.org/p?b=2&a=1"),           # \ tied pair -> hash order
        (5, 50, "https://other.org/p?a=1&b=2&fbclid=F"),  # /
        (6, 10, "https://lone.net/q"),                    # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long, url string")
    out = url_dedup_documents(df, "url", "doc_id", prefer_col="n_chars")
    got = {
        r["canonical_url"]: (r["doc_id"], r["url_dupes"]) for r in out.collect()
    }
    tie_winner = min((4, 5), key=lambda i: (skey(i), i))
    assert got == {
        "site.com/a": (2, 3),
        "other.org/p?a=1&b=2": (tie_winner, 2),
        "lone.net/q": (6, 1),
    }
    dt = dict(out.dtypes)
    assert dt["doc_id"] == "bigint" and dt["url_dupes"] == "bigint"
    assert dt["canonical_url"] == "string"


def test_canonical_url_three_engine_fuzz(spark, duck):
    """r15: three-engine randomized battery over ~400 adversarial URLs
    — the Spark canonical_url expression, the DuckDB oracle replay
    (built from the SAME _url_canon_sql template the gate's oracle
    uses), and the pure-Python reference must agree byte-for-byte on
    every input. Inputs: (a) decorated well-formed URLs (random
    scheme/www/host-case/port/trailing-slash/fragment/tracking-param/
    param-order soup over random host+path+params), (b) structural
    garbage from a hostile alphabet (unbalanced #?&=:// runs, spaces,
    empty string), (c) re-fed canonical OUTPUTS of (a)+(b) — the key
    space the dedup actually shuffles on. ASCII only by contract: IDN
    hosts are punycode ASCII (RFC 3490); non-ASCII case folding is
    engine/locale-dependent and out of scope. Locks the byte-identical
    DuckDB-twin claim (split_part out-of-range -> '', RE2/Java (?i),
    binary-collation sort) far beyond the 16-URL hand battery."""
    import random

    import pandas as pd

    from hadoop_fcfs_spark.llm.dedup import canonical_url
    from hadoop_fcfs_spark.queries_llm import _url_canon_sql
    from tests.conftest import _canon_url_py

    rng = random.Random(20260816)
    schemes = ["", "https://", "http://", "HTTPS://", "ftp://", "a+b-c.9://"]
    hostparts = ["Example", "NEWS-site", "x", "a.b", "WWW", "www"]
    ports = ["", ":80", ":443", ":8080", ":080", ":443x", ":80:80"]
    pathseg = ["A", "b", "UTM_page", "p%20q", ":80", "www.x"]
    keys = ["id", "a", "B", "utm_source", "UTM_X", "utm", "ref", "Ref",
            "FBCLID", "gclid", "mc_eid", "x", ""]
    vals = ["", "1", "A&B", "a=b", "https://x.com", "%2F", "#t"]

    # r16 (r15 verdict advisory #1): userinfo components — kept as-is
    # inside the authority and lower-cased with it (the documented
    # non-rule), so user@host and host stay distinct keys.
    userinfos = ["", "", "", "alice@", "Alice@", "a:PW@", "@"]

    def rand_url():
        host = ".".join(rng.choice(hostparts) for _ in range(rng.randint(1, 3)))
        www = rng.choice(["", "www.", "WWW.", "www.www."])
        path = "".join("/" + rng.choice(pathseg) for _ in range(rng.randint(0, 3)))
        path += "/" * rng.randint(0, 2)
        params = "&".join(
            rng.choice(keys) + rng.choice(["", "=" + rng.choice(vals)])
            for _ in range(rng.randint(0, 4))
        )
        q = ("?" + params) if (params or rng.random() < 0.2) else ""
        frag = rng.choice(["", "#", "#top", "#a?b=c#d"])
        return (
            rng.choice(schemes) + rng.choice(userinfos) + www + host
            + rng.choice(ports) + path + q + frag
        )

    garbage_alpha = "aZ9.:/?#&=%+-_~ "

    def rand_garbage():
        return "".join(rng.choice(garbage_alpha) for _ in range(rng.randint(0, 24)))

    urls = [rand_url() for _ in range(160)] + [rand_garbage() for _ in range(90)]
    urls += [_canon_url_py(u) for u in urls[:120]]  # re-fed canonical keys
    urls.append("")
    # hand-pinned userinfo pairs: user@host never merges with host, and
    # a case-varied userinfo lower-cases with the authority (documented)
    urls += [
        "https://alice@news-site.com/x",
        "https://news-site.com/x",
        "http://ALICE@News-Site.com/x",
        "ftp://a:pw@example.com:80/y",
    ]
    want = [_canon_url_py(u) for u in urls]

    df = spark.createDataFrame(list(enumerate(urls)), "i long, url string")
    got_spark = [
        r["c"]
        for r in df.select("i", canonical_url("url").alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert got_spark == want

    duck.register("fuzz_urls", pd.DataFrame({"i": range(len(urls)), "url": urls}))
    try:
        got_duck = [
            r[1]
            for r in duck.execute(
                _url_canon_sql("SELECT i, url FROM fuzz_urls", "i") + " ORDER BY i"
            ).fetchall()
        ]
    finally:
        duck.unregister("fuzz_urls")
    assert got_duck == want


def test_corpus_pipeline_v8_ledger_telescopes(spark):
    """r15: the v8 acquisition ledger is internally consistent — the
    stages telescope (rows_in of each stage == rows_kept of the
    previous; url stage's rows_in == the planted crawl size == the
    documents row count), every stage keeps and drops at least one row
    at the driver SF (all policy branches exercise), and kept+dropped
    == in."""
    from tests.conftest import SF_ORACLE
    from hadoop_fcfs_spark.registry import all_queries
    from hadoop_fcfs_spark.tables import t

    rows = {
        r["stage"]: (r["rows_in"], r["rows_kept"], r["rows_dropped"])
        for r in all_queries()["corpus_pipeline_v8"]
        .spark_fn(spark, SF_ORACLE)
        .collect()
    }
    from hadoop_fcfs_spark.caching import release_waypoints

    release_waypoints()
    assert set(rows) == {"url_dedup", "host_cap", "exact_dedup"}
    n_docs = t(spark, SF_ORACLE, "documents").count()
    assert rows["url_dedup"][0] == n_docs
    assert rows["host_cap"][0] == rows["url_dedup"][1]
    assert rows["exact_dedup"][0] == rows["host_cap"][1]
    for stage, (n_in, kept, dropped) in rows.items():
        assert kept >= 1 and dropped >= 1, (stage, rows)
        assert n_in == kept + dropped, (stage, rows)


def test_acquisition_ledger_empty_crawl_all_zero(spark):
    """r15: the v8 ledger on an EMPTY crawl (an empty shard at scale)
    telescopes to three all-zero rows — never NULL: sum(url_dupes)
    over zero rows is NULL and must coalesce to 0 so downstream
    ledger consumers (rate = dropped/in guards, unions across shards)
    don't poison on the empty partition."""
    from hadoop_fcfs_spark.caching import release_waypoints
    from hadoop_fcfs_spark.queries_llm import _acquisition_ledger

    empty = spark.createDataFrame(
        [], "doc_id long, n_chars long, url string, ckey string"
    )
    rows = {
        r["stage"]: (r["rows_in"], r["rows_kept"], r["rows_dropped"])
        for r in _acquisition_ledger(empty).collect()
    }
    release_waypoints()
    assert rows == {
        "url_dedup": (0, 0, 0),
        "host_cap": (0, 0, 0),
        "exact_dedup": (0, 0, 0),
    }


def test_hashed_ngram_features_inrow_rle_matches_python_replay(spark):
    """The r17 in-row bucket-count fold (sort + run-length encode of the
    per-doc bucket array, llm/dsir._ngram_bucket_rows) must reproduce
    EXACTLY the rows the old explode->groupBy shape produced: per-(doc,
    bucket) integer counts over whitespace unigrams + adjacent bigrams,
    md5-uniform bucketing, token-less docs absent. Replayed brute-force
    in Python (hashlib md5 idiom) over edge shapes: single token (no
    bigram), repeated token (bucket runs longer than 1), multi-run
    docs, whitespace-only doc (must vanish), carry col preserved."""
    import hashlib
    from collections import Counter

    import pyspark.sql.functions as F

    from hadoop_fcfs_spark.llm.dsir import hashed_ngram_features

    def bucket(g: str, b: int = 64) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % b

    rows = [
        (1, "solo", True),
        (2, "rep rep rep rep", False),
        (3, "alpha beta gamma alpha beta", True),
        (4, "   ", False),  # whitespace-only: zero tokens, no output rows
        (5, "x y", True),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tag boolean")
    got = {
        (r["doc_id"], r["bucket"]): (r["cnt"], r["tag"])
        for r in hashed_ngram_features(
            df, "doc_id", "text", num_buckets=64, carry_cols=("tag",)
        ).collect()
    }
    want = {}
    for doc_id, text, tag in rows:
        toks = [w for w in text.split() if w]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for bkt, cnt in Counter(bucket(g) for g in grams).items():
            want[(doc_id, bkt)] = (cnt, tag)
    assert got == want
    assert not any(d == 4 for d, _ in got)
