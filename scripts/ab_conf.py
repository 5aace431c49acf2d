"""Interleaved A/B of runtime-settable session confs per headline query
(OFF,ON,OFF,ON… in one session). Usage:

    python scripts/ab_conf.py <reps> "k1=v1,k2=v2" name [name...]

OFF = session defaults, ON = the given conf pairs. Prints min-per-mode.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from potoos_spark.catalog import CATALOG  # noqa: E402
from potoos_spark.session import get_session  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1])
    pairs = [kv.split("=", 1) for kv in sys.argv[2].split(",")]
    names = sys.argv[3:]
    spark = get_session("ab_conf")
    sf = "/root/testdata/sf0.1"
    spark.read.parquet(f"{sf}/lineitem.parquet").limit(1).count()
    defaults = {k: spark.conf.get(k, None) for k, _ in pairs}

    def set_mode(on: bool) -> None:
        for k, v in pairs:
            if on:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

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
                    set_mode(mode == "on")
                    res[mode].append(run(name))
            set_mode(False)
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
