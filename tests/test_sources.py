"""expand_urls / manifest / shard sampling (reference common/urls.py:48-88,
wds/shardlists.py:10-119)."""

import os

import pytest

from chug_spark.sources.manifest import (
    braceexpand,
    expand_urls,
    resampled_shards,
    shard_manifest,
    shuffled_shards,
)


def test_braceexpand_numeric_range_width():
    assert braceexpand("s-{0000..0002}.tar") == ["s-0000.tar", "s-0001.tar", "s-0002.tar"]
    assert braceexpand("x{1..3}y") == ["x1y", "x2y", "x3y"]


def test_braceexpand_commas_and_cross_product():
    assert braceexpand("{a,b}/{0..1}.tar") == ["a/0.tar", "a/1.tar", "b/0.tar", "b/1.tar"]
    assert braceexpand("plain.tar") == ["plain.tar"]


def test_expand_urls_multi_source_weights():
    urls, weights = expand_urls("a-{00..01}.tar::b-{00..02}.tar", "2::1")
    assert urls == ["a-00.tar", "a-01.tar", "b-00.tar", "b-01.tar", "b-02.tar"]
    assert weights == [2.0, 2.0, 1.0, 1.0, 1.0]


def test_expand_urls_no_weights_and_scalar_weight():
    urls, w = expand_urls("a-{00..01}.tar")
    assert urls == ["a-00.tar", "a-01.tar"] and w is None
    urls, w = expand_urls(["x.tar", "y.tar"], 0.5)
    assert w == [0.5, 0.5]


def test_env_substitution(monkeypatch):
    monkeypatch.setenv("WDS_ROOT", "/data")
    urls, _ = expand_urls("${ROOT}/s-{0..1}.tar")
    assert urls == ["/data/s-0.tar", "/data/s-1.tar"]
    monkeypatch.setenv("CHUG_DS", "ds1")
    urls, _ = expand_urls("${DS}/x.tar")
    assert urls == ["ds1/x.tar"]
    with pytest.raises(KeyError):
        expand_urls("${MISSING_VAR_XYZ}/x.tar")


def test_shuffled_shards_deterministic_permutation(spark):
    m = shard_manifest(spark, "s-{000..019}.tar")
    a = [r["shard_url"] for r in shuffled_shards(m, seed=1, interval=0).collect()]
    b = [r["shard_url"] for r in shuffled_shards(m, seed=1, interval=0).collect()]
    c = [r["shard_url"] for r in shuffled_shards(m, seed=1, interval=1).collect()]
    assert a == b                      # same seed+interval → same order
    assert sorted(a) == sorted(c)      # permutation
    assert a != c                      # different interval → different order


def test_shuffled_shards_sub_intervals_partition(spark):
    m = shard_manifest(spark, "s-{000..019}.tar")
    parts = [
        {r["shard_url"] for r in
         shuffled_shards(m, seed=3, interval=i, num_sub_intervals=4).collect()}
        for i in range(4)
    ]
    union = set().union(*parts)
    assert union == {f"s-{i:03d}.tar" for i in range(20)}
    assert sum(len(p) for p in parts) == 20  # disjoint stripes cover once


def test_resampled_shards_weighted(spark):
    m = shard_manifest(spark, "a.tar::b.tar", "9::1")
    out = resampled_shards(m, nshards=300, seed=0).collect()
    assert len(out) == 300
    counts = {}
    for r in out:
        counts[r["shard_url"]] = counts.get(r["shard_url"], 0) + 1
    # with replacement, heavily weighted towards a.tar (9:1)
    assert counts.get("a.tar", 0) > 220
    assert counts.get("b.tar", 0) > 5
    # deterministic
    again = resampled_shards(m, nshards=300, seed=0).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# S9: pluggable source registry — the same extraction plan over any scan
# ---------------------------------------------------------------------------


def _registry_corpus(n=25):
    from chug_spark.synth import make_doc

    return [make_doc(i, seed=91) for i in range(n)]


def test_registry_same_plan_over_three_sources(spark, tmp_path):
    """Identical extraction output from parquet://, jsonl://, and mem://
    sources — the reference's wds-vs-HF loader interchangeability
    (README.md:84, hfds/loader.py:32-189) as a scan-level invariant."""
    import json as _json

    from chug_spark.config import ExtractJobCfg
    from chug_spark.extract import extract_docread, flatten_spans
    from chug_spark.schema import DOCUMENTS_SCHEMA
    from chug_spark.sources.documents import read_documents
    from chug_spark.sources.registry import register_mem_dataset

    rows = _registry_corpus()
    pq = str(tmp_path / "docs_pq")
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA).write.parquet(pq)
    jl = str(tmp_path / "docs_jsonl")
    os.makedirs(jl)
    with open(os.path.join(jl, "part0.jsonl"), "w") as f:
        for doc_id, spans in rows:
            f.write(_json.dumps({"doc_id": doc_id, "spans": spans}) + "\n")
    register_mem_dataset("fixture91", rows)

    cfg = ExtractJobCfg(render_dpi=12)
    outs = []
    for spec in (f"parquet://{pq}", f"jsonl://{jl}/*.jsonl", "mem://fixture91"):
        docs = read_documents(spark, spec)
        spans_out, _ = extract_docread(spark, docs, cfg)
        outs.append({
            (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
            for r in flatten_spans(spans_out).collect()
        })
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0


def test_registry_unknown_scheme_and_custom_registration(spark):
    from chug_spark.sources.registry import read_source, register_source

    with pytest.raises(ValueError, match="unknown source scheme"):
        read_source(spark, "bogus://x")

    @register_source("rangegen")
    def _range_source(spark_, locator):
        from pyspark.sql import functions as F

        return spark_.range(int(locator)).select(
            F.col("id").cast("string").alias("doc_id"),
            F.array().cast(
                "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
            ).alias("spans"),
        )

    assert read_source(spark, "rangegen://7").count() == 7


# ---------------------------------------------------------------------------
# §2.7: weighted multi-source mixing
# ---------------------------------------------------------------------------


def test_split_source_specs_parses_reference_grammar():
    from chug_spark.sources.mixing import split_source_specs

    specs, total = split_source_specs(
        "a-{0..1}.tar::b.tar", sampling_weights="2::1", num_samples="100::50"
    )
    assert [s.url for s in specs] == ["a-{0..1}.tar", "b.tar"]
    assert [s.sampling_weight for s in specs] == [2.0, 1.0]
    assert [s.num_samples for s in specs] == [100, 50] and total == 150

    specs, total = split_source_specs("x.tar", num_samples=500)
    assert specs[0].num_samples is None and total == 500


def test_weighted_union_deterministic_and_proportional(spark):
    from pyspark.sql import functions as F

    from chug_spark.functions import rand_below_col
    from chug_spark.determinism import doc_rand_below
    from chug_spark.sources.mixing import weighted_union

    base = spark.range(4000).select(F.col("id").cast("string").alias("doc_id"))
    sources = [("heavy", base, 1.0), ("light", base, 0.25)]
    out = weighted_union(sources, seed=5)
    counts = out.groupBy().count().collect()[0]["count"]

    # heavy passes in full; light keeps ~25%
    n_light = counts - 4000
    assert 800 < n_light < 1200

    # schedule independence: different partitioning, same kept set
    kept1 = {r["doc_id"] for r in out.collect()}
    out2 = weighted_union([("heavy", base.repartition(13), 1.0),
                           ("light", base.repartition(3), 0.25)], seed=5)
    assert {r["doc_id"] for r in out2.collect()} == kept1

    # Column rule ≡ Python oracle rule
    got = {r["doc_id"]: r["v"] for r in base.limit(50).select(
        "doc_id", rand_below_col(F.col("doc_id"), 5, 1_000_000, tag="mix:light").alias("v")
    ).collect()}
    for d, v in got.items():
        assert v == doc_rand_below(d, 5, 1_000_000, tag="mix:light")


def test_cap_num_samples_exact_and_deterministic(spark):
    from pyspark.sql import functions as F

    from chug_spark.sources.mixing import cap_num_samples

    base = spark.range(1000).select(F.col("id").cast("string").alias("doc_id"))
    a = {r["doc_id"] for r in cap_num_samples(base, 100, seed=1, name="s").collect()}
    assert len(a) == 100
    # deterministic under different partitioning
    b = {r["doc_id"] for r in
         cap_num_samples(base.repartition(17), 100, seed=1, name="s").collect()}
    assert a == b
    # different seed → different sample
    c = {r["doc_id"] for r in cap_num_samples(base, 100, seed=2, name="s").collect()}
    assert a != c
