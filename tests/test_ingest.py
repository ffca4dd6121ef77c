"""wds-style member grouping → span documents (group_by_keys semantics,
reference src/chug/wds/tariterators.py:28-59) + dataflow ops."""

from chug_spark.extract import flatten_spans
from chug_spark.ops.dataflow import det_shuffle
from chug_spark.sources.ingest import dataset_size, group_members


def _members(spark, rows):
    return spark.createDataFrame(rows, "fname string, payload_ref string")


def test_group_members_basic(spark):
    rows = [
        ("a/d1.json", '{"pages": []}'),
        ("a/d1.txt", "hello"),
        ("a/d1.pdf", "ref:p1"),
        ("a/d2.TXT", "only text"),       # lcase suffix (tariterators.py:47-48)
        ("noext", "dropped"),            # no extension → skipped (:44-45)
    ]
    out = {r["doc_id"]: r["spans"] for r in group_members(_members(spark, rows)).collect()}
    assert set(out) == {"a/d1", "a/d2"}
    spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out["a/d1"]]
    # sorted by fname: .json < .pdf < .txt
    assert spans == [
        ("anno", '{"pages": []}', None, 0),
        ("media", None, "ref:p1", 1),
        ("text", "hello", None, 2),
    ]
    assert [(s["kind"], s["text"]) for s in out["a/d2"]] == [("text", "only text")]


def test_group_members_multi_ext_and_duplicates(spark):
    rows = [
        ("b/x.tar.json", "anno-like"),      # last ext wins classification
        ("b/x.1.txt", "t1"),
        ("b/x.2.txt", "t2"),                # duplicate suffix kept as span
    ]
    out = group_members(_members(spark, rows)).collect()
    # base_plus_ext splits off ALL extensions: 'b/x' is the shared base
    assert len(out) == 1 and out[0]["doc_id"] == "b/x"
    kinds = [s["kind"] for s in out[0]["spans"]]
    assert kinds == ["text", "text", "anno"]  # sorted by fname: x.1.txt, x.2.txt, x.tar.json


def test_group_members_feeds_extraction(spark):
    """Ingest → extraction end-to-end (the wds path: tar members → samples →
    decode)."""
    import json

    from chug_spark.config import ExtractJobCfg
    from chug_spark.extract import extract_docread

    anno = json.dumps({"pages": [{"text": ["l1", "l2"]}]})
    rows = [
        ("s/doc.json", anno),
        ("s/doc.png", "page:0"),
    ]
    docs = group_members(_members(spark, rows))
    spans_out, errors = extract_docread(spark, docs, ExtractJobCfg(render_dpi=12))
    got = flatten_spans(spans_out).collect()
    assert [(r["kind"], r["text"], r["media_ref"]) for r in
            sorted(got, key=lambda r: r["offset"])] == [
        ("text", "l1\nl2", None),
        ("media", None, "page:0"),
    ]
    assert errors.count() == 0


def test_dataset_size(spark):
    docs = group_members(_members(spark, [("a/d1.txt", "x"), ("a/d2.txt", "y")]))
    n, _parts = dataset_size(docs)
    assert n == 2


def test_dataset_size_df(spark):
    from chug_spark.sources.ingest import dataset_size_df

    df = spark.range(1100).selectExpr("cast(id as string) as doc_id")
    row = dataset_size_df(df, shard_size=512).collect()[0]
    assert (row["num_samples"], row["num_shards"]) == (1100, 3)


def test_det_shuffle_deterministic(spark):
    df = spark.range(100).selectExpr("cast(id as string) as doc_id", "id as v")
    a = [r["doc_id"] for r in det_shuffle(df, seed=5, num_partitions=4).collect()]
    b = [r["doc_id"] for r in det_shuffle(df.repartition(7), seed=5, num_partitions=4).collect()]
    c = [r["doc_id"] for r in det_shuffle(df, seed=6, num_partitions=4).collect()]
    assert a == b                      # schedule-independent order
    assert sorted(a) == sorted(c) and a != c  # different seed → different order

    # parallelism-independence (the contract the docstring claims): the
    # realized global order must not change with the partition count —
    # the range exchange guarantees it, a murmur-hash repartition wouldn't
    d = [r["doc_id"] for r in det_shuffle(df, seed=5, num_partitions=9).collect()]
    e = [r["doc_id"] for r in det_shuffle(df, seed=5, num_partitions=1).collect()]
    assert a == d == e


def test_det_shuffle_md5_engine_matches_plan(spark):
    """The md5 hash engine (the portable-oracle path) is a valid permutation
    and det_shuffle_plan reports exactly the stripe/order det_shuffle uses."""
    from chug_spark.ops.dataflow import det_shuffle_plan

    df = spark.range(200).selectExpr("cast(id as string) as doc_id")
    shuffled = [r["doc_id"] for r in
                det_shuffle(df, seed=3, interval=2, num_partitions=4,
                            engine="md5").collect()]
    assert sorted(shuffled) == sorted(r["doc_id"] for r in df.collect())

    plan = det_shuffle_plan(df, seed=3, interval=2, num_stripes=4,
                            engine="md5").collect()
    by_stripe: dict[int, list] = {}
    for r in plan:
        by_stripe.setdefault(r["stripe"], []).append(r)
    assert set(by_stripe) <= set(range(4))
    for rows in by_stripe.values():
        rows.sort(key=lambda r: r["pos_in_stripe"])
        # dense 0..n-1 ranks, ordered by the shuffle draw
        assert [r["pos_in_stripe"] for r in rows] == list(range(len(rows)))
        keys = [r["shuffle_key"] for r in rows]
        assert keys == sorted(keys)
        assert all(r["shuffle_key"] % 4 == r["stripe"] for r in rows)


def test_json_source_same_plan_fragment(spark, tmp_path):
    """Alternate connector: the identical extraction plan over a JSON-lines
    scan of the span schema equals the parquet path (the reference's
    'processing pipelines remain webdataset based' invariant across sources,
    README.md:84)."""
    import json as _json

    from chug_spark.config import ExtractJobCfg
    from chug_spark.extract import extract_docread
    from chug_spark.schema import DOCUMENTS_SCHEMA
    from chug_spark.sources.documents import read_documents
    from chug_spark.synth import make_doc

    rows = [make_doc(i, seed=71) for i in range(20)]
    pq = str(tmp_path / "docs_pq")
    jl = str(tmp_path / "docs.jsonl")
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    df.write.parquet(pq)
    with open(jl, "w") as f:
        for doc_id, spans in rows:
            f.write(_json.dumps({"doc_id": doc_id, "spans": spans}) + "\n")

    cfg = ExtractJobCfg(render_dpi=12)

    def run(src):
        out, _ = extract_docread(spark, read_documents(spark, src), cfg)
        return {(r["doc_id"], tuple(map(tuple, r["spans"]))) for r in out.collect()}

    assert run(pq) == run(jl)
