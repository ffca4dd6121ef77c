"""extract_docread_flat ≡ flatten_spans(extract_docread(...)) — the flat
assembly path (flagship) must be value-identical to the nested contract on
the adversarial corpus for every page-sampling policy."""

import pytest

from chug_spark.config import ExtractJobCfg
from chug_spark.extract import extract_docread, extract_docread_flat, flatten_spans
from chug_spark.synth import generate_docs


@pytest.mark.parametrize("policy", ["all_valid", "first", "last", "all", "random"])
def test_flat_equals_nested(spark, policy):
    docs = generate_docs(spark, n_docs=120, seed=13)
    cfg = ExtractJobCfg(page_sampling=policy, render_dpi=24)
    nested = flatten_spans(extract_docread(spark, docs, cfg)[0])
    flat = extract_docread_flat(spark, docs, cfg)[0]
    assert nested.exceptAll(flat).count() == 0
    assert flat.exceptAll(nested).count() == 0


def test_flat_errors_match_nested(spark):
    docs = generate_docs(spark, n_docs=120, seed=13)
    cfg = ExtractJobCfg(page_sampling="all_valid", render_dpi=24)
    ne = extract_docread(spark, docs, cfg)[1]
    fe = extract_docread_flat(spark, docs, cfg)[1]
    assert sorted(map(tuple, ne.collect())) == sorted(map(tuple, fe.collect()))


@pytest.mark.parametrize("shape", ["mixed_corpus", "pure_passthrough"])
def test_branch_modes_equivalent(spark, shape):
    """cfg.branch='auto' (LIMIT-1 probes) must produce the same rows as the
    explicitly declared shape AND as the always-both 'mixed' plan — on a
    mixed corpus and on a pure-passthrough corpus (where 'auto' skips the
    whole payload subtree)."""
    from chug_spark.synth import spans_from_documents

    if shape == "mixed_corpus":
        docs = generate_docs(spark, n_docs=60, seed=21)
        declared = "mixed"
    else:
        docs = spans_from_documents(spark, "/root/testdata/sf0.001")
        declared = "passthrough"

    outs = {}
    for branch in ("auto", declared, "mixed"):
        cfg = ExtractJobCfg(page_sampling="all_valid", render_dpi=16, branch=branch)
        outs[branch] = extract_docread_flat(spark, docs, cfg)[0]
    for other in (declared, "mixed"):
        assert outs["auto"].exceptAll(outs[other]).count() == 0
        assert outs[other].exceptAll(outs["auto"]).count() == 0


def test_branch_declared_wrong_shape_is_explicit(spark):
    """Declaring 'payload' on a passthrough-only corpus yields no rows (the
    declared branch filters everything) — a knowable, documented contract
    rather than silent wrong answers: the probe mode exists for unknown
    shapes."""
    from chug_spark.synth import spans_from_documents

    docs = spans_from_documents(spark, "/root/testdata/sf0.001")
    cfg = ExtractJobCfg(page_sampling="all_valid", branch="payload")
    flat, errors = extract_docread_flat(spark, docs, cfg)
    assert flat.count() == 0


@pytest.mark.parametrize("policy", ["all_valid", "first", "last", "all", "random"])
def test_policy_sql_equals_udf(spark, policy):
    """The pure-Catalyst policy spec (cfg.policy_engine='sql') produces the
    exact (indices, error) struct of the pandas-UDF reference on the
    adversarial corpus — every flag shape (valid/invalid/missing pages,
    corrupt anno, no media, wraparound duplicates, retry exhaustion)
    across all 5 policies.  Compared at the `sel` column directly (the
    decode stage downstream is engine-independent)."""
    from pyspark.sql import functions as F

    from chug_spark.extract import _policy_sql, _policy_udf, _prepare

    docs = generate_docs(spark, n_docs=150, seed=31)
    cfg = ExtractJobCfg(page_sampling=policy, render_dpi=16)
    df = _prepare(docs.filter(F.size("spans") > 0), cfg)
    args = (
        F.col("doc_id"), F.col("flags"),
        F.col("anno_txt").isNotNull(), F.col("n_media") > 0,
    )
    sql_col = _policy_sql(policy, cfg.seed)(*args)
    udf_col = _policy_udf(policy, cfg.seed)(*args)
    rows = df.select(
        "doc_id", sql_col.alias("s"), udf_col.alias("u")
    ).collect()
    assert len(rows) == 150
    for r in rows:
        s, u = r["s"], r["u"]
        assert (s["error"], s["indices"]) == (u["error"], u["indices"]), (
            r["doc_id"], s, u
        )
