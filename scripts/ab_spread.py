"""Interleaved A/B of catalog/common.spread_input per headline query
(OFF,ON,OFF,ON in one session — same JIT warmth, load-noise spread
across both modes). Prints min-per-mode; used to decide which entries
keep the scan-spread exchange."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from potoos_spark.catalog import common as C  # noqa: E402
import potoos_spark.catalog.pipeline as P  # noqa: E402
from potoos_spark.catalog import CATALOG  # noqa: E402
from potoos_spark.session import get_session  # noqa: E402

real_spread = C.spread_input


def main() -> None:
    names = sys.argv[1:]
    spark = get_session("ab_spread")
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
            for _ in range(2):
                for mode in ("off", "on"):
                    P.spread_input = (
                        (lambda df, key=None: df) if mode == "off" else real_spread
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
