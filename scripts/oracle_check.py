"""Targeted oracle check: the driver_gate_sim comparison (pandas-
mediated, dtype-strict) over an explicit list of entry names instead
of the predicted driver window — the re-verification tool for the
optimization rounds (every touched entry must MATCH before a change
is kept).

Usage: python scripts/oracle_check.py <sf_dir> name [name...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from potoos_spark.session import get_session  # noqa: E402
from tests.oracle_harness import duckdb_connection  # noqa: E402

from driver_gate_sim import _frame_key  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from potoos_spark.catalog import CATALOG

    spark = get_session("oracle_check")
    con = duckdb_connection(sf_dir)
    n_match = 0
    failures: dict[str, str] = {}
    for i, name in enumerate(names):
        spec = CATALOG[name]
        t0 = time.perf_counter()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            if spec.sql is None:
                status, ok = f"ROWS-ONLY ({len(sdf)} rows)", True
            else:
                ddf = con.sql(spec.sql).df()
                sc, sk, sr = _frame_key(sdf)
                dc, dk, dr = _frame_key(ddf)
                if sc != dc:
                    status, ok = f"SCHEMA {sc} vs {dc}", False
                elif len(sr) != len(dr):
                    status, ok = f"ROWS {len(sr)} vs {len(dr)}", False
                elif sk != dk:
                    status, ok = f"DTYPE-KIND {sk} vs {dk}", False
                elif sr != dr:
                    bad = next(
                        j for j, (a, b) in enumerate(zip(sr, dr)) if a != b
                    )
                    status, ok = f"VALUES row {bad}: {sr[bad]} vs {dr[bad]}", False
                else:
                    status, ok = f"MATCH ({len(sr)} rows)", True
        except Exception:
            status, ok = "ERROR", False
            failures[name] = traceback.format_exc(limit=3)
        dt = time.perf_counter() - t0
        if ok:
            n_match += 1
        else:
            failures.setdefault(name, status)
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)

    print(f"\n{n_match}/{len(names)} MATCH")
    if failures:
        print("FAILURES:")
        for k, v in failures.items():
            print(f"  {k}: {v}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
