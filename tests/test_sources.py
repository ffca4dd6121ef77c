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
