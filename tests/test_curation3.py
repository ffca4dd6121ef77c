"""Round-5 curation ops: corpus-wide keep-first line dedup (RefinedWeb
exact-line contract) and per-domain token-budget selection."""

import pytest
from pyspark.sql import functions as F

from chug_spark.ops.dedup import line_dedup_keep_first
from chug_spark.ops.packing import domain_budget_select

SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _docs(spark):
    # 4-word lines (line_words=4 in tests): doc 0 and doc 2 share a line,
    # doc 1 repeats its own first line, doc 3 is unique, doc 4 empty,
    # doc 5 NULL.
    rows = [
        (0, "alpha beta gamma delta unique zero tail words", "en", "s0", 40),
        (1, "repeat me twice ok repeat me twice ok", "en", "s0", 38),
        (2, "alpha beta gamma delta other two tail here", "en", "s1", 40),
        (3, "totally fresh content line never seen before now", "en", "s1", 48),
        (4, "", "en", "s1", 0),
        (5, None, "en", None, 0),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_line_dedup_keep_first_semantics(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in line_dedup_keep_first(_docs(spark), line_words=4).collect()
    }
    # empty/NULL docs carry no lines -> absent
    assert set(got) == {0, 1, 2, 3}
    # doc 0 keeps both its lines (first occurrence of the shared line)
    assert got[0]["clean_text"] == "alpha beta gamma delta unique zero tail words"
    assert (got[0]["n_kept"], got[0]["n_dropped"]) == (2, 0)
    # doc 1's in-document repeat is dropped (keep-first is global, so the
    # second identical 4-word line inside the same doc goes too)
    assert got[1]["clean_text"] == "repeat me twice ok"
    assert (got[1]["n_kept"], got[1]["n_dropped"]) == (1, 1)
    # doc 2 loses the line doc 0 claimed, keeps its own tail
    assert got[2]["clean_text"] == "other two tail here"
    assert (got[2]["n_kept"], got[2]["n_dropped"]) == (1, 1)
    assert got[3]["n_dropped"] == 0


def test_line_dedup_partition_invariance(spark):
    docs = _docs(spark)
    a = sorted(
        tuple(r) for r in line_dedup_keep_first(docs, line_words=4).collect()
    )
    b = sorted(
        tuple(r)
        for r in line_dedup_keep_first(docs.repartition(7), line_words=4).collect()
    )
    assert a == b


def test_line_dedup_winner_is_agg_not_window(spark):
    """Scale contract: the keep-first winner must come from a partial-agg
    min(struct), not a row_number window — a window would sort every
    occurrence of a hot boilerplate line inside one partition key."""
    plan = (
        line_dedup_keep_first(_docs(spark), line_words=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_min" in plan or "min(" in plan


def test_domain_budget_matches_per_group_window(spark):
    """The two-level prefix sum must equal the naive per-domain window
    cumsum (quality desc, doc_id) on every kept row."""
    from pyspark.sql import Window

    from chug_spark.ops.dedup import normalize_text
    from chug_spark.ops.textstats import quality_score

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 17}" for j in range(6 + i % 7)),
         "en", f"s{i % 3}", 30)
        for i in range(40)
    ] + [(99, None, "en", "s0", 0), (98, "", "en", None, 0)]
    docs = spark.createDataFrame(rows, SCHEMA)
    budget = 60
    got = {
        r["doc_id"]: (r["source"], r["cum_tok"])
        for r in domain_budget_select(docs, budget).collect()
    }

    scoreable = docs.filter(F.col("text").isNotNull())
    norm = normalize_text(F.col("text"))
    toks = scoreable.select(
        F.col("doc_id").alias("doc_id"),
        F.coalesce("source", F.lit("")).alias("source"),
        F.when(norm == "", 0)
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_tok"),
    )
    ref_base = quality_score(scoreable).select("doc_id", "quality_bp").join(
        toks, "doc_id"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_bp"), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref = {
        r["doc_id"]: (r["source"], r["cum_tok"])
        for r in ref_base.withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") <= budget)
        .collect()
    }
    assert got == ref
    assert len(got) > 0
    # NULL-text doc is unscoreable and must never appear
    assert 99 not in got
    # empty-text doc is scoreable (0 tokens) and lands in the '' group
    assert got[98][0] == ""


def test_domain_budget_caps_each_domain(spark):
    rows = [
        (i, " ".join(f"x{j}" for j in range(10)), "en", f"s{i % 2}", 20)
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    out = domain_budget_select(docs, 35).groupBy("source").agg(
        F.sum("n_tok").alias("tok"), F.count("*").alias("n")
    )
    for r in out.collect():
        assert r["tok"] <= 35
        assert r["n"] == 3  # 10-token docs: exactly 3 fit in 35 per domain


def test_lang_segments_islands(spark):
    from chug_spark.ops.textstats import lang_segments

    rows = [
        (1, 0, "the and of x"),
        (1, 1, "the of y"),          # en run continues
        (1, 2, "le et un z"),        # fr
        (1, 3, "qq zz"),             # und
        (1, 4, "the is a w"),        # back to en -> NEW segment
        (2, 0, "der und zu"),        # second doc independent
    ]
    df = spark.createDataFrame(rows, "doc_id long, k int, text string")
    out = [
        (r.doc_id, r.seg, r.lang, r.start_k, r.end_k, r.n_blocks)
        for r in lang_segments(df).orderBy("doc_id", "seg").collect()
    ]
    assert out == [
        (1, 0, "en", 0, 1, 2),
        (1, 1, "fr", 2, 2, 1),
        (1, 2, "und", 3, 3, 1),
        (1, 3, "en", 4, 4, 1),
        (2, 0, "de", 0, 0, 1),
    ]
