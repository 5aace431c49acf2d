"""Interleaved A/B of operators.dedup.eager_fill per headline query
(OFF,ON,OFF,ON… in one session — same JIT warmth, load-noise spread
across both modes). Prints min-per-mode; used to decide which call
sites keep the eager cache materialization."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from potoos_spark.operators import dedup as D  # noqa: E402
from potoos_spark.catalog import CATALOG  # noqa: E402
from potoos_spark.session import get_session  # noqa: E402

real_eager = D.eager_fill


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_session("ab_eager")
    sf = "/root/testdata/sf0.1"
    spark.read.parquet(f"{sf}/lineitem.parquet").limit(1).count()

    def run(name):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        res = {"off": [], "on": []}
        try:
            for _ in range(reps):
                for mode in ("off", "on"):
                    D.eager_fill = (
                        (lambda df: df) if mode == "off" else real_eager
                    )
                    res[mode].append(run(name))
            print(
                f"AB {name}: off={min(res['off']):.3f} on={min(res['on']):.3f} "
                f"raw_off={['%.2f' % t for t in res['off']]} "
                f"raw_on={['%.2f' % t for t in res['on']]}",
                flush=True,
            )
        except Exception as exc:
            print(f"AB {name}: ERROR {exc}", flush=True)


if __name__ == "__main__":
    main()
