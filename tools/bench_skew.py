"""Skew-stress leg (VERDICT r5 item 4): prove the salted chunking flattens
a pathological page-count tail in the payload-decode pipeline.

Three timed legs over materialized synthetic corpora (noop sink, min-of-N):

- uniform:   1500 docs, 1..12 pages each (no heavy tail)
- skew_cap:  same corpus plus two 2000-page monsters, default
             max_pages_per_task chunk cap (the salted-chunking machinery)
- skew_flat: identical skewed corpus with the cap effectively disabled
             (max_pages_per_task=10**6) — one task renders a monster's
             every page serially, the straggler the cap exists to kill

Pass criterion: wall(skew_cap) scales with the page budget
(≈ uniform * pages_skew / pages_uniform), while wall(skew_flat) is
dominated by the serial monster regardless of cores.

Usage: SPARK_GRAFT_CPUS=32 python tools/bench_skew.py [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_extra  # noqa: E402  (session builder shared with the harness)


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = bench_extra.build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from chug_spark.config import ExtractJobCfg
    from chug_spark.extract import extract_docread
    from chug_spark.synth import generate_docs

    tmp = tempfile.mkdtemp(prefix="bench_skew_")
    out: dict = {"metric": "skew_stress", "runs": runs}
    try:
        uni = generate_docs(
            spark, n_docs=1500, seed=11, heavy_tail_every=0, payload_every=1,
        )
        skw = generate_docs(
            spark, n_docs=1500, seed=11, heavy_tail_every=701,
            heavy_tail_pages=20000, payload_every=1,
        )
        tables = {}
        for name, df in (("uniform", uni), ("skew", skw)):
            path = f"{tmp}/{name}/documents"
            df.repartition(64).write.mode("overwrite").parquet(path)
            tables[name] = spark.read.parquet(path)

        def timed(name, table, cfg):
            best = None
            for _ in range(runs):
                # the decode subtree persist()s; without clearing, the next
                # run's identical plan would reuse the cached decode via the
                # CacheManager and time nothing (bench.py's methodology)
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"bench_skew:{name}")
                t0 = time.monotonic()
                spans, _err = extract_docread(spark, table, cfg)
                spans.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            out[f"rows_{name}"] = extract_docread(spark, table, cfg)[0].count()

        cap = ExtractJobCfg(page_sampling="all_valid", render_dpi=96,
                            branch="mixed")
        flat = ExtractJobCfg(page_sampling="all_valid", render_dpi=96,
                             branch="mixed", max_pages_per_task=10**6)
        # untimed warmup: Python decode workers + codegen (bench.py's
        # methodology — the first extract run pays ~10 s of one-time cost)
        w, _ = extract_docread(spark, tables["uniform"], cap)
        w.count()
        timed("uniform_s", tables["uniform"], cap)
        timed("skew_cap_s", tables["skew"], cap)
        timed("skew_flat_s", tables["skew"], flat)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
