"""Per-query profiling harness for the optimization rounds (guide §1).

For each named catalog query:
* saves ``df.explain("formatted")`` to ``plans/r10/<name>_<tag>.txt``;
* runs the query through the noop sink ``repeats`` times (clearCache
  between runs, the bench methodology) and prints per-run wall times;
* pulls per-stage metrics (executor run time, shuffle read/write bytes,
  input bytes, task count) from the Spark UI REST API for the jobs the
  query ran, so the expensive stage is identifiable without guessing.

Usage:
    python scripts/profile_query.py [--tag before] [--sf DIR] name [name...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

UI_PORT = 4050


def get_profiling_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("potoos_profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def stage_report(app_id: str, first_job: int) -> list[str]:
    """Top stages by executor run time among jobs >= first_job."""
    jobs = [j for j in _rest(f"applications/{app_id}/jobs") if j["jobId"] >= first_job]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    rows = []
    for sid in stage_ids:
        try:
            for att in _rest(f"applications/{app_id}/stages/{sid}"):
                rows.append(att)
        except Exception:
            pass
    rows.sort(key=lambda s: -s.get("executorCpuTime", 0))
    out = []
    for s in rows[:14]:
        out.append(
            f"  stage {s['stageId']}: cpu={s.get('executorCpuTime', 0) / 1e9:7.2f}s "
            f"run={s['executorRunTime'] / 1e3:7.2f}s "
            f"tasks={s['numCompleteTasks']:4d} "
            f"in={s.get('inputBytes', 0) / 1e6:8.1f}MB "
            f"sh_r={s.get('shuffleReadBytes', 0) / 1e6:8.1f}MB "
            f"sh_w={s.get('shuffleWriteBytes', 0) / 1e6:8.1f}MB  "
            f"{(s.get('name') or '')[:70]}"
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-stages", action="store_true")
    ap.add_argument("--plans-dir", default="r11")
    args = ap.parse_args()

    from potoos_spark.catalog import CATALOG

    spark = get_profiling_session()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId
    spark.read.parquet(f"{args.sf}/lineitem.parquet").limit(1).count()

    plans_dir = os.path.join(os.path.dirname(__file__), "..", "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        fn = CATALOG[name].fn
        spark.catalog.clearCache()
        df = fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())

        times = []
        first_job = 0
        for r in range(args.repeats):
            spark.catalog.clearCache()
            first_job = (
                max(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [-1])
            ) + 1
            spark.sparkContext.setJobDescription(f"{name} run{r + 1}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(f"== {name}: " + " ".join(f"{t:.3f}s" for t in times), flush=True)
        if not args.no_stages:
            try:
                for line in stage_report(app_id, first_job):
                    print(line, flush=True)
            except Exception as exc:
                print(f"  (stage report failed: {exc})", flush=True)


if __name__ == "__main__":
    main()
