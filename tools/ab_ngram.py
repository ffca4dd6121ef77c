"""A/B harness: ngram_jaccard candidate-pair strategies at sf0.1.

Variants (identical result sets — only the physical strategy differs):
  A  window-cap + self-join            (round-2 shipped plan)
  B  groupBy-df + anti-join + self-join
  C  groupBy collect_list + in-array pair expansion (no self-join)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chug_spark.ops.dedup import word_shingles

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CAP = 64
THRESHOLD = 0.12


def base_exploded(docs):
    sh = word_shingles(F.col("text"), 3)
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), sh.alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = base.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = base.select("doc_id", F.explode("sh").alias("shingle"))
    return sizes, exploded


def finish(inter, sizes):
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
    )


def variant_a(docs):
    sizes, exploded = base_exploded(docs)
    w = Window.partitionBy("shingle")
    capped = (
        exploded.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= CAP).drop("_bn")
    )
    inter = (
        capped.alias("a").join(capped.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return finish(inter, sizes)


def variant_b(docs):
    sizes, exploded = base_exploded(docs)
    hot = (
        exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > CAP).select("shingle")
    )
    capped = exploded.join(hot, "shingle", "left_anti")
    inter = (
        capped.alias("a").join(capped.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return finish(inter, sizes)


def variant_c(docs):
    sizes, exploded = base_exploded(docs)
    buckets = (
        exploded.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= CAP))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    inter = (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return finish(inter, sizes)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm scan

    results = {}
    for name, fn in [("A_window", variant_a), ("B_anti", variant_b), ("C_arraypairs", variant_c), ("D_cap_then_pairs", variant_d)]:
        spark.catalog.clearCache()
        # warmup pass on a slice for codegen
        fn(docs.limit(200)).count()
        t0 = time.monotonic()
        n = fn(docs).count()
        dt = time.monotonic() - t0
        results[name] = (round(dt, 2), n)
        print(f"{name}: {dt:.2f}s rows={n}", flush=True)
    print(results)
    spark.stop()




def variant_d(docs):
    """window-cap (streaming, memory-safe on hot keys) THEN array-pair
    expansion over the <=CAP buckets — no self-join, groupBy reuses the
    window's hash partitioning on shingle."""
    sizes, exploded = base_exploded(docs)
    w = Window.partitionBy("shingle")
    capped = (
        exploded.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= CAP).drop("_bn")
    )
    buckets = (
        capped.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    inter = (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return finish(inter, sizes)
if __name__ == "__main__":
    main()
