"""spark-submit entrypoint: batch doc-read extraction job.

Ship with::

    zip -r engine.zip chug_spark
    spark-submit --py-files engine.zip chug_spark/job.py \
        --input <documents parquet|table> --output <dir> \
        [--page-sampling all_valid] [--seed 0] [--render-dpi 144] \
        [--buckets 8] [--run-id run0] [--synth-docs N]

Writes flat span rows + errors + the checkpointed lineage table under
--output; idempotent re-runs resume unfinished buckets (north rule).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None, help="documents parquet path or table")
    p.add_argument("--synth-docs", type=int, default=0,
                   help="generate a synthetic corpus of N docs instead of --input")
    p.add_argument("--synth-seed", type=int, default=7)
    p.add_argument("--derive-from", default=None,
                   help="derive span corpus from a flat documents.parquet dir")
    p.add_argument("--output", required=True)
    p.add_argument("--page-sampling", default="all_valid")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render-dpi", type=int, default=144)
    p.add_argument("--max-pages-per-task", type=int, default=8)
    p.add_argument("--branch", default="auto",
                   choices=["auto", "mixed", "passthrough", "payload"],
                   help="corpus shape: declare it for known tables (no probe "
                        "jobs); 'auto' resolves with two LIMIT-1 probes")
    p.add_argument("--buckets", type=int, default=8)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="single-pass run without the bucketed checkpoint loop")
    p.add_argument("--checkpoint-single-pass", action="store_true",
                   help="checkpointed run, but all unfinished buckets in ONE "
                        "extraction (dynamic-partition writes) instead of the "
                        "serial per-bucket barrier chain")
    p.add_argument("--stream", action="store_true",
                   help="incremental mode: drain --input (a parquet dir of "
                        "document files) via Structured Streaming "
                        "Trigger.AvailableNow; re-runs process only new files")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the untimed JIT/worker warmup pass")
    p.add_argument("--layout-boxes", default=None,
                   help="layout mode: read a (doc_id[, page], boxes) parquet "
                        "of positioned word boxes and write reading-order "
                        "spans (recursive XY-cut) instead of running the "
                        "extract job; multi-page stitching engages when a "
                        "'page' column is present")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("chug_spark_extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.layout_boxes:
        from chug_spark.ops.layout import reading_order, reading_order_pages

        boxes = spark.read.parquet(args.layout_boxes)
        t0 = time.monotonic()
        ordered = (
            reading_order_pages(boxes)
            if "page" in boxes.columns
            else reading_order(boxes)
        )
        ordered.write.mode("overwrite").parquet(args.output + "/reading_order")
        wall = time.monotonic() - t0
        n_docs = (
            spark.read.parquet(args.output + "/reading_order")
            .select("doc_id").distinct().count()
        )
        print(json.dumps({
            "wall_sec": round(wall, 3),
            "docs_out": n_docs,
            "docs_per_sec": round(n_docs / wall, 2) if wall > 0 else None,
        }))
        return 0

    from chug_spark.checkpoint import write_with_checkpoint
    from chug_spark.config import ExtractJobCfg
    from chug_spark.extract import extract_docread, flatten_spans
    from chug_spark.sources.documents import read_documents
    from chug_spark.synth import generate_docs, spans_from_documents

    if args.synth_docs:
        docs = generate_docs(spark, n_docs=args.synth_docs, seed=args.synth_seed)
    elif args.derive_from:
        docs = spans_from_documents(spark, args.derive_from)
    elif args.input:
        docs = read_documents(spark, args.input)
    else:
        p.error("one of --input / --derive-from / --synth-docs required")

    cfg = ExtractJobCfg(
        page_sampling=args.page_sampling,
        seed=args.seed,
        render_dpi=args.render_dpi,
        max_pages_per_task=args.max_pages_per_task,
        run_id=args.run_id,
        branch=args.branch,
    )

    if not args.no_warmup:
        # absorb one-time JVM JIT/codegen + Python-worker spin-up before the
        # timed section (long-lived executors have these warm in production)
        warm_cfg = ExtractJobCfg(
            page_sampling=args.page_sampling, seed=args.seed + 1,
            render_dpi=12, max_pages_per_task=args.max_pages_per_task,
            branch=args.branch,
        )
        spans_w, _ = extract_docread(spark, docs.limit(64), warm_cfg)
        flatten_spans(spans_w).count()

    t0 = time.monotonic()
    if args.stream:
        if not args.input:
            p.error("--stream requires --input (a parquet directory)")
        from chug_spark.streaming.stream import run_stream_extract

        run_stream_extract(spark, args.input, args.output, cfg)
    elif args.no_checkpoint:
        spans_out, errors = extract_docread(spark, docs, cfg)
        flat = flatten_spans(spans_out)
        flat.write.mode("overwrite").parquet(args.output + "/spans")
        errors.write.mode("overwrite").parquet(args.output + "/errors")
    else:
        write_with_checkpoint(spark, docs, cfg, args.output, n_buckets=args.buckets,
                              single_pass=args.checkpoint_single_pass)
    wall = time.monotonic() - t0

    n_docs = spark.read.parquet(args.output + "/spans").select("doc_id").distinct().count()
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "docs_out": n_docs,
        "docs_per_sec": round(n_docs / wall, 2) if wall > 0 else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
