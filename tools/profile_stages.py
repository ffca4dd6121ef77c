"""Per-stage profiler (guide §7.1 without a live UI): run one bench query
with the UI enabled and print stages sorted by executor task time, with
shuffle read/write bytes — attributes a query's wall time to operators.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_stages.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_EXTRA_CONF", "")
os.environ["SPARK_EXTRA_CONF"] += ",spark.ui.enabled=true"

import bench_extra  # noqa: E402


def main():
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = bench_extra.build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="prof_")
    try:
        qs = bench_extra.build_queries(spark, tmp)
        fn = qs[name]
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId

        def stages():
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            ) as r:
                return json.load(r)

        before = {s["stageId"] for s in stages()}
        t0 = time.monotonic()
        for _ in range(runs):
            res = fn()
            if hasattr(res, "write"):
                res.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        time.sleep(1)
        new = [s for s in stages() if s["stageId"] not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"query={name} wall={wall:.2f}s runs={runs}")
        for s in new[:14]:
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"exec={s.get('executorRunTime', 0)/1000:>7.1f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:>7.1f}s "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:>7.1f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:>7.1f}MB  "
                f"{(s.get('description') or s['name'])[:70]}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
