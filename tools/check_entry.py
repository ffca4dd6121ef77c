"""Local replica of the driver's correctness gate: run each queries() entry
on Spark at a given SF and compare against oracle_sql() in DuckDB —
row count, (sorted) column names, and an order-insensitive value hash.

Usage: python tools/check_entry.py [--paranoid] [sf_dir] [query ...]

--paranoid replays the sweep under an adversarial session environment —
non-UTC session timezone, parquet NTZ inference disabled — and pushes every
result through the driver's pandas canonicalization path (toPandas +
sort_values over all columns).  Any query whose values depend on session
config, or whose columns the pandas hasher cannot factorize (list cells),
fails HERE instead of in the driver (r3 lesson: sessionize/embed_quantize
were local-green, driver-red).
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

_args = [a for a in sys.argv[1:] if a != "--paranoid"]
PARANOID = "--paranoid" in sys.argv[1:]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if PARANOID:
        # Hostile-driver replica: results must be invariant to all of these.
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
        print("PARANOID session: TZ=America/New_York, inferTimestampNTZ=off")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            pdf = None
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            if PARANOID:
                # Driver canonicalizer replica: toPandas + lexsort over all
                # columns.  Raises TypeError on unhashable cells (lists) —
                # exactly the r3 embed_quantize driver crash.
                pdf = sdf.toPandas()
                pdf.sort_values(by=list(pdf.columns), inplace=True, kind="mergesort")
        except Exception as exn:
            print(f"FAIL {name}: spark error {type(exn).__name__}: {exn}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (rows-only, no oracle)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = rel.columns
            # Deliberate second DuckDB execution: fetchall's Python-native
            # row reprs are the proven value-hash source (Decimal/list/None
            # fidelity), while the dtype gate needs the PANDAS view of the
            # same result — the one the driver hashes.  Oracle queries are
            # milliseconds at sf0.01; the expensive side was Spark (below).
            ddf = con.sql(oracles[name]).df()
        except Exception as exn:
            print(f"FAIL {name}: duckdb error {type(exn).__name__}: {exn}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        # Dtype gate (r4 lesson): the driver's value hash is dtype-sensitive —
        # DuckDB HUGEINT sums land in pandas as float64 while Spark emits
        # int64, hashing differently even when every value matches.  Compare
        # the pandas dtype of each shared column; any mismatch is a failure
        # here so it can be CAST away in the oracle before the driver sees it.
        try:
            # Reuse the paranoid canonicalizer's full toPandas — a second
            # Spark execution here would re-run the whole pipeline (for
            # UDF-heavy rows like media_train_nougat that roughly doubled
            # the sweep's wall).  Non-paranoid mode pays a LIMITed run.
            spdf = pdf if pdf is not None else sdf.limit(1000).toPandas()
            for c in sorted(set(scols) & set(dcols)):
                st, dt = spdf[c].dtype, ddf[c].dtype
                # Width differences (int32 vs int64) hash identically in the
                # driver (chunking was driver-green r4 with int32-vs-int64);
                # only a *kind* flip (int vs float — the HUGEINT→float64 trap,
                # bool vs int, datetime vs object) changes the value repr.
                if st.kind != dt.kind:
                    problems.append(f"dtype[{c}] spark={st} duck={dt}")
        except Exception as exn:  # pragma: no cover - diagnostics only
            problems.append(f"dtype-probe error {type(exn).__name__}: {exn}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            sh = value_hash([tuple(r) for r in srows], scols)
            dh = value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"value-hash spark={sh} duck={dh}")
                sset = {tuple(norm_cell(v) for v in r) for r in
                        ([r[i] for i in sorted(range(len(scols)), key=lambda i: scols[i])] for r in srows)}
                dset = {tuple(norm_cell(v) for v in r) for r in
                        ([r[i] for i in sorted(range(len(dcols)), key=lambda i: dcols[i])] for r in drows)}
                for x in list(sset - dset)[:3]:
                    print(f"   spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"   duck-only : {x}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: rows={len(srows)} hash match")
    print("entry() smoke:", end=" ")
    try:
        edf = entry_mod.entry(spark)
        print(f"rows={edf.count()} schema={[f.name for f in edf.schema.fields]}")
    except Exception as exn:
        print(f"FAIL {type(exn).__name__}: {exn}")
        failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
