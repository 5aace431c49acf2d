"""Cross-engine output-dtype audit for every catalog oracle.

Motivation (round 4): the driver's r3 CORRECTNESS sample failed
`ts_heartbeat_sla` and `q_scalar_json` on hash while rows/schema/values
matched bit-exact through the repo's own fetchall()-based harness.
Root cause hypothesis, verified in-sandbox: DuckDB's SUM over integer
types returns HUGEINT (int128), which pandas materializes as *float64*
(e.g. 6 -> 6.0), while the Spark side returns int64.  A pandas-mediated
value hash then diverges even though the values are numerically equal.
`fetchall()` hides this (HUGEINT -> Python int), which is why the local
harness said MATCH.

This script runs every catalog entry at sf0.001 on BOTH engines and
compares the *pandas dtype kind* per final output column (int vs float
vs object vs bool), plus flags any DuckDB HUGEINT/DECIMAL in the final
projection.  Any mismatch is a latent driver hash failure.

Usage: python scripts/dtype_audit.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from potoos_spark.catalog import CATALOG
from tests.oracle_harness import duckdb_connection


def kind(dtype) -> str:
    k = dtype.kind  # i,u,f,O,b,M,m
    return {"i": "int", "u": "int", "f": "float", "O": "obj", "b": "bool"}.get(k, k)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dtype-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb_connection(sf_dir)
    bad, widths, errs = {}, {}, {}
    names = [n for n in CATALOG if CATALOG[n].sql is not None]
    if only:
        names = [n for n in names if n in only]
    for i, name in enumerate(names):
        spec = CATALOG[name]
        try:
            rel = con.sql(spec.sql)
            ddf = rel.df()
            d_kinds = {c.lower(): kind(ddf[c].dtype) for c in ddf.columns}
            d_sqltypes = {
                c.lower(): str(t) for c, t in zip(rel.columns, rel.types)
            }
            sdf = spec.fn(spark, sf_dir).toPandas()
            s_kinds = {c.lower(): kind(sdf[c].dtype) for c in sdf.columns}
        except Exception:
            errs[name] = traceback.format_exc(limit=3)
            print(f"[{i + 1}/{len(names)}] {name}: ERROR", flush=True)
            continue
        d_full = {c.lower(): str(ddf[c].dtype) for c in ddf.columns}
        s_full = {c.lower(): str(sdf[c].dtype) for c in sdf.columns}
        diffs, width_diffs = {}, {}
        for c in sorted(set(d_kinds) | set(s_kinds)):
            dk, sk = d_kinds.get(c), s_kinds.get(c)
            # all-NULL columns come back as object/float depending on
            # engine; only flag when both sides have a concrete kind
            if dk != sk:
                diffs[c] = {"duckdb": dk, "spark": sk,
                            "duck_sql_type": d_sqltypes.get(c)}
            elif d_full.get(c) != s_full.get(c):
                # same kind, different width (int32 vs int64 etc.) —
                # recorded for calibration against driver-green entries
                width_diffs[c] = {"duckdb": d_full.get(c),
                                  "spark": s_full.get(c)}
        hugeints = {
            c: t for c, t in d_sqltypes.items()
            if "HUGEINT" in t.upper() or "INT128" in t.upper()
        }
        if diffs or hugeints:
            bad[name] = {"kind_diffs": diffs, "duck_hugeint_cols": hugeints}
            print(f"[{i + 1}/{len(names)}] {name}: MISMATCH {diffs or hugeints}",
                  flush=True)
        elif width_diffs:
            widths[name] = width_diffs
            print(f"[{i + 1}/{len(names)}] {name}: width {width_diffs}",
                  flush=True)
        else:
            print(f"[{i + 1}/{len(names)}] {name}: ok", flush=True)
    out = {"mismatches": bad, "width_diffs": widths, "errors": errs,
           "n_checked": len(names)}
    if only:
        # subset runs report to stdout ONLY — ADVICE r7: a per-entry
        # run once overwrote the committed full-catalog report,
        # silently shrinking its coverage from 300 entries to 1
        print(json.dumps(out, indent=2))
        print(f"\n{len(bad)} mismatching entries, {len(errs)} errors "
              f"/ {len(names)} checked (subset run: report file untouched)")
        return 0
    with open("scripts/dtype_audit_report.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"\n{len(bad)} mismatching entries, {len(errs)} errors "
          f"/ {len(names)} checked -> scripts/dtype_audit_report.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
