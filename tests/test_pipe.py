"""pipe: shard sources — command-per-shard ingest with tar expansion
(reference README.md:145 'pipe:curl ...' via wds url_opener/gopen).
Local `cat` commands stand in for curl: same stream contract, no network."""

import pytest

from chug_spark.sources.pipe import pipe_members, read_pipe_samples
from chug_spark.sources.registry import read_source
from chug_spark.sources.tar import write_tar_shards


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe_tars")
    samples = [
        (f"k{i}", [(f"k{i}.json", b'{"k": %d}' % i), (f"k{i}.txt", f"word{i}".encode())])
        for i in range(6)
    ]
    write_tar_shards(samples[:3], str(d), n_shards=1)
    import os
    os.rename(d / "shard-00000.tar", d / "shard-0.tar")
    write_tar_shards(samples[3:], str(d), n_shards=1)
    os.rename(d / "shard-00000.tar", d / "shard-1.tar")
    return str(d)


def test_pipe_members_brace_expansion(spark, shard_dir):
    m = pipe_members(spark, f"cat {shard_dir}/shard-{{0..1}}.tar").collect()
    assert sorted(r.fname for r in m) == sorted(
        [f"k{i}.json" for i in range(6)] + [f"k{i}.txt" for i in range(6)]
    )
    assert len({r.shard for r in m}) == 2
    assert all(r.error is None for r in m)


def test_pipe_samples_grouping(spark, shard_dir):
    samples, errors = read_pipe_samples(spark, f"cat {shard_dir}/shard-{{0..1}}.tar")
    rows = samples.collect()
    assert errors.count() == 0
    assert sorted(r.doc_id for r in rows) == [f"k{i}" for i in range(6)]
    by_key = {r.doc_id: r for r in rows}
    assert [s.kind for s in by_key["k2"].spans] == ["anno", "text"]
    assert by_key["k2"].spans[1].text == "word2"


def test_pipe_failed_shard_raise_vs_continue(spark, shard_dir):
    spec = f"cat {shard_dir}/shard-0.tar::false"
    with pytest.raises(Exception):
        pipe_members(spark, spec, handler="raise").collect()
    samples, errors = read_pipe_samples(spark, spec, handler="continue")
    assert samples.count() == 3  # good shard's samples survive
    errs = errors.collect()
    assert len(errs) == 1 and errs[0].shard == "false"


def test_pipe_registry_dispatch(spark, shard_dir):
    df = read_source(spark, f"pipe:cat {shard_dir}/shard-0.tar")
    assert df.columns == ["doc_id", "spans"]
    assert df.count() == 3
