"""Supplementary benchmark harness (NOT part of the frozen driver contract).

Mirrors bench.py's query construction 1:1 but adds what the optimization
guide §1 asks for:

- noop-sink isolation (``df.write.format("noop")``) so a query's cost is
  the computation, not the sink or count-side column pruning;
- ``--plans TAG`` dumps ``.explain("formatted")`` for every selected query
  to ``plans/r06/<name>_<TAG>.txt``;
- per-query job descriptions so the UI/event log is readable;
- ``--runs N`` min-of-N (same hypervisor-noise methodology as bench.py).

Usage:
  python bench_extra.py [--plans TAG] [--runs N] [--sink noop|count] [query ...]

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "1500"))
RENDER_DPI = int(os.environ.get("SPARK_GRAFT_RENDER_DPI", "96"))


def build_spark():
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("chug_spark_bench_extra")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS) * 2, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
    )
    # A/B overrides, e.g. SPARK_EXTRA_CONF="spark.chug.spread.maxBytes=0"
    for kv in os.environ.get("SPARK_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            b = b.config(k.strip(), v.strip())
    return b.getOrCreate()


def plan_str(df, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(em)


def build_queries(spark, tmp: str):
    """name -> zero-arg callable returning a DataFrame (or, for driver-side
    results, a callable returning None-with-side-effect).  Construction is
    bench.py's, verbatim."""
    from pyspark.sql import functions as F

    from chug_spark.config import ExtractJobCfg
    from chug_spark.extract import extract_docread, extract_docread_flat
    from chug_spark.ops.dedup import (
        exact_substring_dedup_cut,
        line_dedup_keep_first,
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
        simhash_hamming_pairs,
    )
    from chug_spark.ops.events import asof_attach_last_mark, sessionize
    from chug_spark.ops.similarity import cosine_pairs_threshold, semantic_pairs
    from chug_spark.ops.textstats import quality_score
    from chug_spark.synth import generate_docs, spans_from_documents

    docs_pq = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb_pq = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    events_pq = spark.read.parquet(f"{SF_DIR}/events.parquet")

    span_tbl = tmp + "/spans/documents"
    spans_from_documents(spark, SF_DIR).repartition(int(CPUS)).write.mode(
        "overwrite"
    ).parquet(span_tbl)
    span_docs = spark.read.parquet(span_tbl)
    pt_cfg = ExtractJobCfg(page_sampling="all_valid")

    synth_tbl = tmp + "/synth/documents"
    generate_docs(spark, n_docs=SYNTH_DOCS, seed=99).repartition(
        int(CPUS) * 2
    ).write.mode("overwrite").parquet(synth_tbl)
    synth = spark.read.parquet(synth_tbl)
    pl_cfg = ExtractJobCfg(
        page_sampling="all_valid", render_dpi=RENDER_DPI, branch="mixed"
    )

    from chug_spark.entry_ext import q_caption_mine, q_warc_extract
    from chug_spark.ops.bpe import bpe_train_fast
    from chug_spark.ops.classifier import train_quality_classifier
    from chug_spark.ops.dsir import dsir_topk
    from chug_spark.ops.entry import (
        q_bm25_topk,
        q_decontaminate,
        q_dom_extract,
        q_host_template,
        q_html_spans,
        q_layout_order,
        q_media_dhash,
        q_seq_pack,
        q_snapshot_dedup,
        q_web_pipeline2,
    )
    from chug_spark.ops.packing import budget_select, domain_budget_select
    from chug_spark.sources.tar import build_fixture_corpus, read_tar_samples
    from chug_spark.sources.warc import build_warc_fixture

    corpus = build_fixture_corpus(spark, SF_DIR)
    build_warc_fixture(spark, SF_DIR, n_shards=32)
    en = F.when(F.col("lang") == "en", 1).otherwise(0)

    return {
        "spans_derive_write": lambda: spans_from_documents(spark, SF_DIR)
        .repartition(int(CPUS)),
        "docread_all_valid": lambda: extract_docread_flat(spark, span_docs, pt_cfg)[0],
        "extract_payload_decode": lambda: extract_docread(spark, synth, pl_cfg)[0],
        "minhash_pairs": lambda: minhash_candidate_pairs(docs_pq),
        "simhash_pairs": lambda: simhash_hamming_pairs(docs_pq, max_distance=3),
        "ngram_jaccard": lambda: ngram_jaccard_pairs(docs_pq, threshold=0.12),
        "cosine_threshold": lambda: cosine_pairs_threshold(emb_pq),
        "quality_score": lambda: quality_score(docs_pq),
        "sessionize": lambda: sessionize(events_pq),
        "asof_join": lambda: asof_attach_last_mark(events_pq),
        "semantic_pairs": lambda: semantic_pairs(emb_pq),
        "substring_cut": lambda: exact_substring_dedup_cut(docs_pq, window_words=10),
        "decontaminate": lambda: q_decontaminate(spark, SF_DIR),
        "seq_pack": lambda: q_seq_pack(spark, SF_DIR),
        "snapshot_dedup": lambda: q_snapshot_dedup(spark, SF_DIR),
        "budget_select": lambda: budget_select(docs_pq, token_budget=120_000),
        "tar_ingest": lambda: read_tar_samples(spark, corpus + "/*.tar"),
        "warc_extract": lambda: q_warc_extract(spark, SF_DIR),
        "media_dhash": lambda: q_media_dhash(spark, SF_DIR),
        "html_spans": lambda: q_html_spans(spark, SF_DIR),
        "dom_extract": lambda: q_dom_extract(spark, SF_DIR),
        "bpe_vocab_1k": lambda: bpe_train_fast(docs_pq, num_merges=1000),
        "bm25_topk": lambda: q_bm25_topk(spark, SF_DIR),
        "quality_train": lambda: train_quality_classifier(docs_pq, en),
        "dsir_sample": lambda: dsir_topk(docs_pq, en, k=100, sampled=True),
        "line_dedup": lambda: line_dedup_keep_first(docs_pq, line_words=8),
        "domain_budget": lambda: domain_budget_select(docs_pq, 500),
        "host_template": lambda: q_host_template(spark, SF_DIR),
        "caption_mine": lambda: q_caption_mine(spark, SF_DIR),
        "layout_order": lambda: q_layout_order(spark, SF_DIR),
        "web_pipeline2": lambda: q_web_pipeline2(spark, SF_DIR),
    }


def main() -> int:
    import shutil
    import tempfile

    args = sys.argv[1:]
    runs, tag, sink = 2, None, "noop"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            tag = args[i + 1]; i += 2
        elif args[i] == "--sink":
            sink = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    tmp = tempfile.mkdtemp(prefix="bench_extra_")
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        qs = build_queries(spark, tmp)
        sel = names or list(qs)
        timings = {}
        here = os.path.dirname(os.path.abspath(__file__))
        for name in sel:
            fn = qs[name]
            if tag:
                res = fn()
                if hasattr(res, "write"):
                    os.makedirs(f"{here}/plans/r06", exist_ok=True)
                    with open(f"{here}/plans/r06/{name}_{tag}.txt", "w") as fh:
                        fh.write(plan_str(res))
                    print(f"plan: {name} -> plans/r06/{name}_{tag}.txt")
                continue
            best = None
            for _ in range(runs):
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.monotonic()
                res = fn()
                if hasattr(res, "write"):
                    if sink == "noop":
                        res.write.format("noop").mode("overwrite").save()
                    else:
                        res.count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            print(json.dumps({name: timings[name]}), flush=True)
        if timings:
            print(json.dumps({"total": round(sum(timings.values()), 3),
                              "queries": timings, "sink": sink, "runs": runs}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
