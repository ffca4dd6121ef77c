"""A/B: minhash/simhash candidate pairs — capped self-join vs bucket_pairs."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from chug_spark.ops.dedup import (
    SIMHASH_BITS,
    bucket_pairs,
    cap_buckets,
    minhash_signatures,
    simhash_signatures,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CAP = 64


def minhash_join(docs):
    sigs = cap_buckets(minhash_signatures(docs), ["band", "sig"], CAP)
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, on=["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_bp(docs):
    return bucket_pairs(minhash_signatures(docs), ["band", "sig"], CAP).distinct()


def _sim_exploded(docs):
    band_len = SIMHASH_BITS // 4
    sigs = simhash_signatures(docs)
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda b: F.col("simhash").substr(b * band_len + 1, F.lit(band_len)),
    )
    return sigs.select("doc_id", "simhash", F.posexplode(band_keys).alias("band", "key"))


def _sim_finish(cand):
    hamming = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
            lambda i: F.col("sig_a").substr(i, F.lit(1))
            != F.col("sig_b").substr(i, F.lit(1)),
        )
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_join(docs):
    e = cap_buckets(_sim_exploded(docs), ["band", "key"], CAP)
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(b, on=["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return _sim_finish(cand)


def simhash_bp(docs):
    cand = (
        bucket_pairs(_sim_exploded(docs), ["band", "key"], CAP, payload=["simhash"])
        .withColumnRenamed("simhash_a", "sig_a")
        .withColumnRenamed("simhash_b", "sig_b")
        .distinct()
    )
    return _sim_finish(cand)


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
    docs.count()

    for name, fn in [
        ("minhash_join", minhash_join),
        ("minhash_bp", minhash_bp),
        ("simhash_join", simhash_join),
        ("simhash_bp", simhash_bp),
    ]:
        spark.catalog.clearCache()
        fn(docs.limit(200)).count()  # codegen warmup
        t0 = time.monotonic()
        n = fn(docs).count()
        print(f"{name}: {time.monotonic() - t0:.2f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
