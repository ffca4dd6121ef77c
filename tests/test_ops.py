"""Curation ops: dedup, similarity, text stats — hand-computed cases."""

import math

from pyspark.sql import functions as F

from chug_spark.ops.dedup import (
    exact_dedup_groups,
    exact_dedup_keep_first,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from chug_spark.ops.similarity import ann_topk_lsh, cosine_pairs_threshold
from chug_spark.ops.textstats import lang_id, quality_score, token_count


def _docs(spark, texts, langs=None):
    rows = [
        (i, t, (langs[i] if langs else "en"), "src", len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup(spark):
    docs = _docs(spark, ["a b c", "A  b   C", "unique text", "a b c"])
    groups = exact_dedup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 3 and groups[0]["representative"] == 0
    kept = sorted(r["doc_id"] for r in exact_dedup_keep_first(docs).collect())
    assert kept == [0, 2]


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "completely different words describing some unrelated topic entirely here now"
    docs = _docs(spark, [base, near, other])
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def _py_simhash64(text):
    """Independent pure-Python 64-bit simhash oracle (same md5-bit contract)."""
    import hashlib

    words = text.split(" ")
    bits = []
    for i in range(64):
        hexpos, bit = i // 4, i % 4
        n_set = sum(
            (int(hashlib.md5(w.encode()).hexdigest()[hexpos], 16) >> bit) & 1
            for w in words
        )
        bits.append("1" if 2 * n_set > len(words) else "0")
    return "".join(bits)


def test_simhash_similar_docs_close(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "zq xw vv kk jj pp mm nn bb cc dd ee ff gg"
    sigs = {r["doc_id"]: r["simhash"] for r in
            simhash_signatures(_docs(spark, [base, near, other])).collect()}
    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))
    assert len(sigs[0]) == 64
    assert sigs[0] == _py_simhash64(base)
    assert sigs[2] == _py_simhash64(other)
    assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])


def test_simhash_hamming_pairs_banded(spark):
    from chug_spark.ops.dedup import simhash_hamming_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "zq xw vv kk jj pp mm nn bb cc dd ee ff gg"
    docs = _docs(spark, [base, near, base, other])
    rows = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_hamming_pairs(docs, max_distance=8, bands=16).collect()}
    assert rows[(0, 2)] == 0          # identical docs → distance 0
    assert (0, 1) in rows             # near-dup within banded reach
    assert (0, 3) not in rows and (1, 3) not in rows


def test_lsh_bucket_caps_bound_join_size(spark):
    """Adversarial corpus: many docs sharing one hot shingle must NOT create
    a quadratic join — the df/bucket caps drop the degenerate key entirely."""
    from chug_spark.ops.dedup import minhash_candidate_pairs, word_shingles

    hot = "common boiler plate"
    texts = [f"{hot} unique{i} tail{i} words{i}" for i in range(50)]
    docs = _docs(spark, texts)

    # every doc shares the 'common boiler plate' shingle → uncapped would
    # yield ≥ C(50,2)=1225 intersection rows for that shingle alone
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.0,
                                max_shingle_df=16).count()
    assert pairs == 0  # hot shingle dropped; nothing else shared

    # same corpus, uncapped (max_shingle_df=0 → no cap) DOES pair everything
    pairs_uncapped = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.0,
                                         max_shingle_df=0).count()
    assert pairs_uncapped == 50 * 49 // 2

    # minhash: identical docs form one giant bucket per band → capped out
    same = _docs(spark, ["x y z w v u"] * 40)
    assert minhash_candidate_pairs(same, max_bucket_size=16).count() == 0
    assert minhash_candidate_pairs(same, max_bucket_size=64).count() == 40 * 39 // 2


def test_ngram_jaccard_exact_value(spark):
    # doc0: shingles {a b c, b c d}; doc1: {a b c, b c e} → inter=1, union=3
    docs = _docs(spark, ["a b c d", "a b c e"])
    rows = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.0).collect()
    assert len(rows) == 1
    assert abs(rows[0]["jaccard"] - 1 / 3) < 1e-12


def test_cosine_threshold_values(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {(r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in cosine_pairs_threshold(emb, n_queries=1, threshold=-1.0).collect()}
    assert rows[(0, 1)] == 1.0
    assert rows[(0, 2)] == 0.0
    assert abs(rows[(0, 3)] - round(1 / math.sqrt(2), 4)) < 1e-9


def test_ann_topk_contains_exact_duplicate(spark):
    import random

    rng = random.Random(3)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(1, 50)]
    # vec 0 duplicates vec 7 → same bucket, cosine 1.0, must be its top hit
    dup = [(0, vecs[6][1])]
    emb = spark.createDataFrame(dup + vecs, "vec_id long, embedding array<float>")
    rows = [r for r in ann_topk_lsh(emb, n_queries=1, k=3, n_planes=3).collect()]
    top = min(rows, key=lambda r: r["rank"])
    assert top["neighbor_id"] == 7 and top["cosine"] == 1.0


def test_token_count_and_quality(spark):
    docs = _docs(spark, ["the cat the cat", "aa bb cc dd"])
    tc = {r["doc_id"]: r for r in token_count(docs).collect()}
    assert tc[0]["n_tokens"] == 4 and tc[0]["n_distinct"] == 2
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[0]["distinct_ratio_bp"] == 5000        # 2/4
    assert q[0]["stopword_ratio_bp"] == 5000        # 'the' ×2 / 4
    assert q[1]["stopword_ratio_bp"] == 0


def test_lang_id_heuristic(spark):
    docs = _docs(
        spark,
        [
            "the cat is in the house and it is happy",
            "el gato que vive en la casa y es feliz",
            "zzz qqq www",  # no stopwords → 'und'
        ],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got[0] == "en" and got[1] == "es" and got[2] == "und"


def test_ivf_topk_finds_exact_duplicate(spark):
    import random

    from chug_spark.ops.similarity import ivf_topk

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(1, 120)]
    dup = [(0, vecs[39][1])]  # vec 0 == vec 40 → same centroid list, cosine 1.0
    emb = spark.createDataFrame(dup + vecs, "vec_id long, embedding array<float>")
    rows = ivf_topk(emb, n_queries=1, k=3, probes=2).collect()
    top = min(rows, key=lambda r: r["rank"])
    assert top["neighbor_id"] == 40 and top["cosine"] == 1.0
    # candidates only come from probed lists → never more than k rows/query
    assert len(rows) <= 3


def test_bpe_token_count_values(spark):
    from chug_spark.ops.textstats import bpe_token_count

    docs = _docs(spark, ["hello, world42!", "abcdefgh"])
    got = {r["doc_id"]: r for r in bpe_token_count(docs).collect()}
    # tokens: hello , world 42 !  → 5; pieces: 2+1+2+1+1 = 7
    assert got[0]["n_regex_tokens"] == 5 and got[0]["n_pieces"] == 7
    # one 8-char token → 2 pieces
    assert got[1]["n_regex_tokens"] == 1 and got[1]["n_pieces"] == 2


def test_connected_components_chain_and_keep_representative(spark):
    from chug_spark.ops.dedup import connected_components, dedup_keep_representative

    # chain 1-2-3-4 (diameter > 1 → propagation must iterate), pair (10,11),
    # and an isolated doc 99 that appears in no pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    cc = {r["doc_id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in (1, 2, 3, 4, 10, 11, 99)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = sorted(r["doc_id"] for r in dedup_keep_representative(docs, pairs).collect())
    assert kept == [1, 10, 99]  # one per cluster + untouched isolate


def test_repetition_stats_values(spark):
    from chug_spark.ops.textstats import repetition_stats

    docs = _docs(spark, ["a b a b a", "x y z w", "solo"])
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc0 2-grams: "a b","b a","a b","b a" → 4 total, 2 distinct, top=2
    assert got[0]["n_grams"] == 4 and got[0]["n_distinct_grams"] == 2
    assert got[0]["top_gram_count"] == 2
    assert got[0]["dup_gram_bp"] == 5000 and got[0]["top_gram_bp"] == 5000
    # doc1: all distinct
    assert got[1]["dup_gram_bp"] == 0 and got[1]["top_gram_bp"] == 3333
    # single-word doc yields no grams at all
    assert 2 not in got


def test_gopher_quality_filter_rules(spark):
    from chug_spark.ops.textstats import gopher_quality_filter

    docs = _docs(spark, [
        "the cat sat on the mat today here now",   # passes everything
        "a b",                                     # too few words
        "the ##### !!!! @@@@ %%%% ^^^^ &&&&",      # symbol-heavy
        "zz qq ww ee rr tt yy uu",                 # no stopwords
    ])
    got = {r["doc_id"]: r for r in gopher_quality_filter(docs).collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["pass_words"] is False
    assert got[2]["keep"] is False and got[2]["pass_symbol"] is False
    assert got[3]["keep"] is False and got[3]["pass_stopwords"] is False


def test_pii_scrub_redacts_and_counts(spark):
    from chug_spark.ops.textstats import pii_scrub

    docs = _docs(spark, [
        "reach me at jane.doe+spam@mail.example.org or 10.0.0.1 or +44 20 7946 0958",
        "no pii here at all",
    ])
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_phones"]) == (1, 1, 1)
    assert got[0]["redacted"] == "reach me at <EMAIL> or <IP> or <PHONE>"
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (0, 0, 0)
    assert got[1]["redacted"] == "no pii here at all"


def test_curate_corpus_funnel(spark):
    from chug_spark.ops.pipeline import curate_corpus

    base = "the cat and the dog sat on the mat in the house today"
    docs = _docs(spark, [
        base,                                   # 0: representative
        base.replace("today", "tomorrow"),      # 1: near-dup of 0 → dropped
        base,                                   # 2: exact dup of 0 → dropped
        "the sun is bright and the sky is blue over the hills now",  # 3: kept
        "zz",                                   # 4: fails quality gate
    ])
    kept = sorted(r["doc_id"] for r in curate_corpus(docs).collect())
    assert kept == [0, 3]


def test_minhash_verified_matches_full_jaccard_on_candidates(spark):
    from chug_spark.ops.dedup import minhash_jaccard_verified

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "completely different words describing some unrelated topic entirely here"
    docs = _docs(spark, [base, near, other])
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in minhash_jaccard_verified(docs, threshold=0.0).collect()}
    assert (0, 1) in got
    assert (0, 2) not in got  # never an LSH candidate
    # verified jaccard == the full exploded-join jaccard for the same pair
    full = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=0).collect()}
    assert got[(0, 1)] == full[(0, 1)]


def test_simhash_pairs_rejects_incomplete_banding(spark):
    """Pigeonhole completeness requires max_distance < bands — a silent
    recall hole otherwise (round-2 advice)."""
    import pytest

    from chug_spark.ops.dedup import simhash_hamming_pairs

    docs = _docs(spark, ["a b c", "a b d"])
    with pytest.raises(ValueError, match="max_distance < bands"):
        simhash_hamming_pairs(docs, max_distance=16, bands=4)


def test_ivf_centroid_count_bounded(spark):
    """The centroid set is a FIXED-size hash sample: K never grows with the
    corpus (round-2 advice: a mod-based sample made assignment O(N^2/m))."""
    from chug_spark.ops.similarity import ivf_centroids

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(500)],
        "vec_id long, embedding array<float>",
    )
    assert ivf_centroids(emb, n_centroids=16).count() == 16
    # deterministic: same input -> same centroid ids
    a = sorted(r["centroid_id"] for r in ivf_centroids(emb, 16).collect())
    b = sorted(r["centroid_id"] for r in ivf_centroids(emb, 16).collect())
    assert a == b


def test_semantic_dedup_drops_near_duplicate_embeddings(spark):
    from chug_spark.ops.similarity import semantic_dedup_keep, semantic_pairs

    import random
    rng = random.Random(5)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = [x + 0.001 for x in base]           # cosine ~1 with base
    ortho = [0.0] * 16
    ortho[0] = 1.0
    vecs = [(0, base), (1, near), (2, ortho)] + [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(3, 40)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             semantic_pairs(emb, threshold=0.95, n_planes=2).collect()}
    assert (0, 1) in pairs
    kept = {r["vec_id"] for r in
            semantic_dedup_keep(emb, threshold=0.95, n_planes=2).collect()}
    assert 0 in kept and 1 not in kept and 2 in kept
    # no all-pairs plan
    plan = semantic_pairs(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_connected_components_star_matches_propagation(spark):
    """Star variant returns identical (doc_id, cluster) labels on a random
    graph, and converges in O(log n) rounds where propagation needs
    O(diameter): a 40-node path exhausts propagation's budget at max_iter=10
    but the star variant finishes well within it."""
    import random

    from chug_spark.ops.dedup import connected_components, connected_components_star

    rng = random.Random(17)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    lab = {r["doc_id"]: r["cluster"] for r in connected_components(pairs).collect()}
    star = {r["doc_id"]: r["cluster"] for r in connected_components_star(pairs).collect()}
    assert lab == star

    path = spark.createDataFrame([(i, i + 1) for i in range(39)], ["doc_a", "doc_b"])
    star_labels = {
        r["doc_id"]: r["cluster"]
        for r in connected_components_star(path, max_iter=10).collect()
    }
    assert star_labels == {i: 0 for i in range(40)}
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=10)

    # self-pair-only nodes are singleton clusters in BOTH variants (a doc
    # whose only pair rows are doc_a == doc_b must not vanish from star)
    mixed = spark.createDataFrame(
        [(1, 2), (3, 3), (2, 2)], ["doc_a", "doc_b"]
    )
    lab2 = {r["doc_id"]: r["cluster"] for r in connected_components(mixed).collect()}
    star2 = {r["doc_id"]: r["cluster"]
             for r in connected_components_star(mixed).collect()}
    assert lab2 == star2 == {1: 1, 2: 1, 3: 3}


def test_boilerplate_block_dedup_drops_hot_blocks(spark):
    """A 16-word block repeated across >max_block_df docs is removed from
    every doc; unique content survives in order; an all-boilerplate doc
    comes back empty (never silently vanishes)."""
    from chug_spark.ops.textstats import boilerplate_block_dedup

    boiler = " ".join(f"b{i}" for i in range(16))
    rows = []
    for d in range(8):
        unique = " ".join(f"u{d}_{i}" for i in range(16))
        rows.append((d, boiler + " " + unique))      # boiler block 0, unique block 1
    rows.append((8, boiler))                         # all-boilerplate doc
    rows.append((9, "short tail"))                   # sub-block doc
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in boilerplate_block_dedup(docs, block_words=16, max_block_df=5).collect()
    }
    for d in range(8):
        unique = " ".join(f"u{d}_{i}" for i in range(16))
        assert out[d] == (unique, 1, 1)
    assert out[8] == ("", 0, 1)
    assert out[9] == ("short tail", 1, 0)


def test_kmeans_centroids_deterministic_and_improves_recall(spark):
    """Trained IVF centroids must be (a) bit-identical across input
    partitionings (exact integer-scaled decimal sums - float mean order
    nondeterminism is the thing this guards), (b) exactly K rows even with
    empty clusters, and (c) at least as good as the hash-sample centroids
    on the labeled embeddings table (mean recall@k of ivf_topk)."""
    from pyspark.sql import functions as F

    from chug_spark.ops.similarity import (
        ivf_topk,
        kmeans_centroids,
        knn_topk_exact,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def key(df):
        return {
            r["centroid_id"]: tuple(r["c_emb"])
            for r in df.collect()
        }

    a = key(kmeans_centroids(emb.repartition(2), n_centroids=8, iters=2))
    b = key(kmeans_centroids(emb.repartition(13), n_centroids=8, iters=2))
    assert a == b and len(a) == 8

    cents = kmeans_centroids(emb, n_centroids=8, iters=2)

    def mean_recall(centroids):
        exact = knn_topk_exact(emb, n_queries=5, k=5).select(
            "query_id", "neighbor_id"
        )
        approx = ivf_topk(
            emb, n_queries=5, k=5, probes=2, n_centroids=8, centroids=centroids
        ).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
        return hits / exact.count()

    assert mean_recall(cents) >= mean_recall(None) - 1e-9


def test_audio_features_deterministic_and_physical(spark):
    """Audio features: (a) hand-computed physics on a pure sine (dominant
    frequency within one FFT bin, ZCR ~ 2f/rate, exact duration), (b)
    schedule independence across partitionings."""
    import numpy as np

    from chug_spark.ops.audio import (
        SAMPLE_RATE,
        audio_features_row,
        extract_audio_features,
    )

    n = SAMPLE_RATE  # 1s
    t = np.arange(n) / SAMPLE_RATE
    wave = 0.5 * np.sin(2 * np.pi * 440 * t)
    row = audio_features_row("x", wave, SAMPLE_RATE)
    assert row["duration_ms"] == 1000
    assert abs(row["dom_freq_hz"] - 440) <= 1
    assert abs(row["zcr_bp"] - int(2 * 440 / SAMPLE_RATE * 10_000)) <= 10
    assert row["peak_bp"] in (4999, 5000)  # floor(peak*1e4), peak ~ 0.5
    assert abs(row["rms_bp"] - int(0.5 / np.sqrt(2) * 10_000)) <= 2

    refs = spark.createDataFrame(
        [(str(i), f"audio:ref{i}") for i in range(40)], ["doc_id", "media_ref"]
    )

    def key(df):
        return {
            r["media_ref"]: (r["n_samples"], r["rms_bp"], r["zcr_bp"],
                             r["dom_freq_hz"])
            for r in df.collect()
        }

    a = key(extract_audio_features(refs.repartition(3)))
    b = key(extract_audio_features(refs.repartition(7)))
    assert a == b and len(a) == 40 and all(v[0] > 0 for v in a.values())


def test_exact_substring_spans_planted_duplicates(spark):
    """A 12-word passage planted in two docs is reported as ONE merged span
    per doc covering exactly the repeated region; a doc with no repeats
    reports nothing; within-doc repetition also counts."""
    from chug_spark.ops.dedup import exact_substring_spans

    passage = " ".join(f"p{i}" for i in range(12))
    u = lambda d, n: " ".join(f"u{d}_{i}" for i in range(n))
    rows = [
        (1, u(1, 5) + " " + passage + " " + u("1b", 5)),   # passage at words 5..16
        (2, passage + " " + u(2, 10)),                     # passage at words 0..11
        (3, u(3, 25)),                                     # unique -> no spans
        (4, passage + " " + u(4, 3) + " " + passage),      # within-doc repeat too
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {}
    for r in exact_substring_spans(docs, window_words=10).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_windows"])
        )
    # windows are 10 words; a 12-word repeated passage yields 3 overlapping
    # repeated windows merging to one span of exactly the passage extent
    assert out[1] == [(5, 16, 3)]
    assert out[2] == [(0, 11, 3)]
    assert 3 not in out
    # doc 4: both copies repeat (each window occurs >= 2 times)
    assert out[4] == [(0, 11, 3), (15, 26, 3)]


def test_exact_substring_dedup_cut_keeps_canonical(spark):
    """All-but-one: the canonical (first) occurrence keeps its text, every
    other copy is cut; unique text is untouched."""
    from chug_spark.ops.dedup import exact_substring_dedup_cut

    passage = " ".join(f"p{i}" for i in range(12))
    u = lambda d, n: " ".join(f"u{d}_{i}" for i in range(n))
    rows = [
        (1, passage + " " + u(1, 6)),              # canonical copy (min doc/start)
        (2, u(2, 4) + " " + passage),              # cut
        (3, u(3, 15)),                             # unique, untouched
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["clean_text"], r["n_words_cut"])
        for r in exact_substring_dedup_cut(docs, window_words=10).collect()
    }
    assert out[1] == (passage + " " + u(1, 6), 0)
    assert out[2] == (u(2, 4), 12)
    assert out[3] == (u(3, 15), 0)


def test_decontaminate_flags_shared_ngrams(spark):
    from chug_spark.ops.decontam import decontaminate

    shared = "one two three four five"
    docs = _docs(
        spark,
        [
            f"intro words then {shared} closing words here",  # train: contaminated
            "totally different text with no overlap at all whatsoever",  # train: clean
            f"the eval question is {shared} exactly",  # eval
        ],
    )
    out = decontaminate(
        docs.filter(F.col("doc_id") < 2), docs.filter(F.col("doc_id") == 2), n=5
    ).collect()
    assert [r["doc_id"] for r in out] == [0]
    r = out[0]
    # doc 0 has 11 words -> 7 distinct 5-grams; exactly 1 is shared
    assert r["n_hits"] == 1 and r["n_grams"] == 7 and r["hit_bp"] == 10000 // 7


def test_bloom_decontaminate_equals_exact(spark):
    """The Bloom-prefiltered path must be VALUE-identical to the exact
    operator (no false negatives by construction, false positives removed
    by the confirm join) — checked across a corpus with planted overlaps,
    repeats inside docs, and clean docs, at a deliberately high fpp so
    false positives actually occur and must be scrubbed."""
    from chug_spark.ops.decontam import bloom_decontaminate, decontaminate

    shared = "alpha beta gamma delta epsilon"
    texts = []
    for i in range(30):
        if i % 3 == 0:
            texts.append(f"doc {i} contains {shared} plus filler words {i} here")
        else:
            texts.append(f"clean document number {i} with its own unique words w{i} x{i} y{i} z{i}")
    texts.append(f"the held out eval row says {shared} verbatim")
    docs = _docs(spark, texts)
    train = docs.filter(F.col("doc_id") < 30)
    evald = docs.filter(F.col("doc_id") == 30)
    exact = decontaminate(train, evald, n=5)
    bloom = bloom_decontaminate(train, evald, n=5, fpp=0.5)
    assert bloom.exceptAll(exact).count() == 0
    assert exact.exceptAll(bloom).count() == 0
    assert exact.count() == 10


def test_bloom_decontaminate_plan_has_no_gram_distinct_shuffle(spark):
    """The corpus-side gram stream must reach the Bloom filter map-side:
    in-row array_distinct, no global DISTINCT over (doc_id, gram)."""
    from chug_spark.ops.decontam import doc_gram_arrays

    docs = _docs(spark, ["some words for a tiny plan test here ok"] * 3)
    plan = (
        doc_gram_arrays(docs, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-only gram generation + dedup


def test_url_filter_blocklist_and_keywords(spark):
    """Subdomain semantics (anything under a blocked domain dies, most
    specific match reported), keyword order, non-URL rows survive."""
    from chug_spark.ops.urlfilter import url_filter

    rows = [
        (0, "https://news.example.com/a"),          # exact domain block
        (1, "https://Cdn.Sub.news.example.com:443/x"),  # subdomain + case + port
        (2, "https://other.org/fine/article"),      # clean
        (3, "https://clean.net/casino-night"),      # keyword
        (4, "https://sub.news.example.com/xxx/casino"),  # both: domain wins reporting, both recorded
        (5, "not a url at all"),                    # host='' -> keep
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    block = spark.createDataFrame(
        [("news.example.com",), ("SUB.news.example.com",)], "domain string"
    )
    # mixed-case keywords must match too (compared against the lowercased URL)
    out = {r["doc_id"]: r for r in
           url_filter(docs, block, keywords=["Casino", "XXX"]).collect()}
    assert out[0]["blocked_domain"] == "news.example.com" and not out[0]["keep"]
    assert out[1]["host"] == "cdn.sub.news.example.com"
    # most specific match: the longer blocklist entry
    assert out[1]["blocked_domain"] == "sub.news.example.com"
    assert out[2]["keep"] and out[2]["blocked_domain"] is None
    assert out[3]["keyword_hit"] == "casino" and not out[3]["keep"]
    assert out[4]["blocked_domain"] == "sub.news.example.com"
    assert out[4]["keyword_hit"] == "casino"  # list order, not URL position
    assert out[5]["keep"] and out[5]["host"] == ""


def test_pack_sequences_matches_python_prefix_sum(spark):
    import hashlib

    from chug_spark.ops.packing import pack_sequences

    texts = [f"{'w ' * (i % 7 + 1)}end" for i in range(40)] + ["", "   "]
    docs = _docs(spark, texts)
    out = {r["doc_id"]: r for r in pack_sequences(docs, window=8).collect()}

    # independent oracle: md5-ordered exclusive prefix sum
    toks = {
        i: len(" ".join(t.lower().split()).split(" "))
        for i, t in enumerate(texts)
        if t.strip()
    }
    order = sorted(toks, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    start, expect = 0, {}
    for i in order:
        expect[i] = (toks[i], start, start // 8, (start + toks[i] - 1) // 8)
        start += toks[i]
    assert set(out) == set(expect)  # empty docs dropped
    for i, (n_tok, st, fp, lp) in expect.items():
        r = out[i]
        assert (r["n_tok"], r["start_tok"], r["first_pack"], r["last_pack"]) == (
            n_tok, st, fp, lp,
        )
        assert r["n_packs"] == lp - fp + 1
    # the stream is contiguous: total tokens == final cursor
    assert sum(r["n_tok"] for r in out.values()) == start


def test_snapshot_dedup_flags_new_batch(spark):
    from chug_spark.ops.dedup import snapshot_dedup

    old = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog again today",
            "unique old corpus content with several distinctive words here",
        ],
    )
    base = "the quick brown fox jumps over the lazy dog again today"
    new = spark.createDataFrame(
        [
            (10, base, "en", "src", 1),  # exact dup of old doc 0
            (11, base.replace("today", "tomorrow"), "en", "src", 1),  # near dup
            (12, "entirely novel text with no shared shingles anywhere", "en", "src", 1),
            (13, "x y", "en", "src", 1),  # too short for shingles
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in snapshot_dedup(new, old).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert (out[10]["exact_dup"], out[10]["near_dup"], out[10]["keep"]) == (1, 1, 0)
    assert (out[11]["exact_dup"], out[11]["near_dup"], out[11]["keep"]) == (0, 1, 0)
    assert (out[12]["exact_dup"], out[12]["near_dup"], out[12]["keep"]) == (0, 0, 1)
    assert (out[13]["exact_dup"], out[13]["near_dup"], out[13]["keep"]) == (0, 0, 1)


def test_snapshot_minhash_attribution(spark):
    from chug_spark.ops.dedup import snapshot_minhash_attrib

    old = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog again today",
            "unique old corpus content with several distinctive words here",
        ],
    )
    base = "the quick brown fox jumps over the lazy dog again today"
    new = spark.createDataFrame(
        [
            (10, base),  # exact dup of old doc 0 -> 8/8 bands, attributed
            (11, base + " extra tail words appended"),  # near dup of doc 0
            (12, "entirely novel text with no shared shingles anywhere"),
            (13, "x y"),  # too short for shingles -> keep
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in snapshot_minhash_attrib(old, new, confirm_bands=2).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    assert (out[10]["band_matches"], out[10]["matched_old"], out[10]["keep"]) \
        == (8, 0, False)
    assert out[11]["band_matches"] >= 2 and out[11]["matched_old"] == 0
    assert not out[11]["keep"]
    assert out[12]["matched_old"] is None and out[12]["keep"]
    assert (out[13]["band_matches"], out[13]["keep"]) == (0, True)


def test_snapshot_minhash_tie_breaks_to_smallest_old_id(spark):
    from chug_spark.ops.dedup import snapshot_minhash_attrib

    txt = "the quick brown fox jumps over the lazy dog again today"
    # two identical old docs: the new dup agrees with BOTH on all bands;
    # attribution must pick the smaller doc_id deterministically
    old = _docs(spark, [txt, txt])
    new = spark.createDataFrame([(10, txt)], "doc_id long, text string")
    r = snapshot_minhash_attrib(old, new).collect()[0]
    assert (r["band_matches"], r["matched_old"], r["keep"]) == (8, 0, False)


def test_temperature_mix_targets(spark):
    from chug_spark.sources.mixing import temperature_mix

    # 900 docs in 'big', 100 in 'small': tau=0.5 gives small sqrt(100)/(
    # sqrt(900)+sqrt(100)) = 25% of the budget vs 10% proportional
    rows = [(i, "t", "en", "big" if i < 900 else "small", 1) for i in range(1000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = temperature_mix(docs, total=200, tau=0.5).collect()
    targets = {r["grp"]: r["target"] for r in out}
    assert targets["big"] + targets["small"] == 200  # largest-remainder exact
    assert targets["small"] == 50  # 200 * 0.25
    # tau=1 is proportional
    t1 = {r["grp"]: r["target"] for r in temperature_mix(docs, 200, tau=1.0).collect()}
    assert t1 == {"big": 180, "small": 20}
    # keep rule is per-doc deterministic and partition-invariant
    a = sorted(map(tuple, temperature_mix(docs, 200, tau=0.5).collect()))
    b = sorted(map(tuple, temperature_mix(docs.repartition(7), 200, tau=0.5).collect()))
    assert a == b
    # expected kept per domain tracks the target (Bernoulli, not exact-k)
    kept_small = sum(1 for r in out if r["grp"] == "small" and r["keep"])
    assert 25 <= kept_small <= 75


def test_split_grouped_never_straddles_a_group(spark):
    from chug_spark.ops.dataflow import split_assign_grouped

    rows = [(i, f"text {i}", "en", f"site{i % 7}", 1) for i in range(140)]
    rows.append((999, "null site doc", "en", None, 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = split_assign_grouped(docs, val_frac=0.3, test_frac=0.3).collect()
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    # every group (incl. the NULL group) maps to exactly one split
    assert all(len(s) == 1 for s in by_grp.values())
    # with 8 groups and 30/30/40 cuts, at least two splits are populated
    assert len({next(iter(s)) for s in by_grp.values()}) >= 2


def test_split_assign_deterministic_and_exclusive(spark):
    import hashlib

    from chug_spark.ops.dataflow import split_assign

    docs = _docs(spark, [f"doc number {i} text" for i in range(200)])
    out = {r["doc_id"]: r["split"] for r in
           split_assign(docs, val_frac=0.1, test_frac=0.1).collect()}
    assert set(out) == set(range(200))
    # independent oracle: same md5 draw, integer thresholds
    vc = int(0.1 * 2**32)
    for i, s in out.items():
        draw = int(hashlib.md5(f"split|{i}".encode()).hexdigest()[:8], 16)
        expect = "val" if draw < vc else ("test" if draw < 2 * vc else "train")
        assert s == expect
    # reshuffling the input never moves a doc between splits
    out2 = {r["doc_id"]: r["split"] for r in
            split_assign(docs.repartition(13), val_frac=0.1, test_frac=0.1).collect()}
    assert out2 == out


def test_host_template_strip_relative_threshold(spark):
    """Template = per-host RELATIVE line frequency: the big host's nav
    (4/5 pages = 80%) strips; the same line on 1/5 pages survives; a host
    below min_host_docs is exempt entirely; in-page repeats count once
    toward df but every occurrence is stripped."""
    from chug_spark.ops.textstats import host_template_strip

    nav = "home | products | about"
    rows = [
        # big host: 5 pages, nav on 4 (80% >= 50%), quote on 1 (20%)
        (1, "big", f"{nav}\nbody one"),
        (2, "big", f"{nav}\nbody two\n{nav}"),  # in-page repeat
        (3, "big", f"{nav}\nbody three"),
        (4, "big", f"{nav}\nbody four"),
        (5, "big", "famous quote\nbody five"),
        # tiny host: 2 pages (< min_host_docs=3) sharing a line — exempt
        (6, "tiny", "shared footer\nbody six"),
        (7, "tiny", "shared footer\nbody seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r.doc_id: r
        for r in host_template_strip(
            docs, min_host_docs=3, max_ratio_bp=5000
        ).collect()
    }
    assert out[1].clean_text == "body one" and out[1].n_dropped == 1
    # BOTH in-page occurrences of the template line are removed
    assert out[2].clean_text == "body two" and out[2].n_dropped == 2
    assert out[5].clean_text == "famous quote body five"
    assert out[5].n_dropped == 0
    assert out[6].clean_text == "shared footer body six"
    assert out[7].n_dropped == 0
