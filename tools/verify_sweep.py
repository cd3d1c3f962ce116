"""Full driver-contract simulation (the /verify recipe, scripted).

Runs ``__spark_entry__.entry`` as a smoke check, then EVERY registry
query at sf0.01 on a vanilla non-UTC SparkSession, diffing each against
its DuckDB oracle (row count, column names, dtype-normalized values) —
exactly what the grading driver does, but over the whole registry
instead of its 50-query window.

Usage: python tools/verify_sweep.py [--only name1,name2] [--first N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def _normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--first", type=int, default=None, help="check only the first N registered")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")  # non-UTC probe

    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"entry ok: {len(rows)} rows", flush=True)

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    names = list(qs)
    if args.first:
        names = names[: args.first]
    if args.only:
        names = [n for n in args.only.split(",") if n]

    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failed = []
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            s = qs[name](spark, SF_DIR).toPandas().rename(columns=str.lower)
            if name not in oracles:
                print(f"[{i + 1}/{len(names)}] {name}: rows-only ({len(s)} rows)", flush=True)
                continue
            d = con.execute(oracles[name]).fetchdf().rename(columns=str.lower)
            if len(s) != len(d):
                raise AssertionError(f"rows {len(s)} != {len(d)}")
            if sorted(s.columns) != sorted(d.columns):
                raise AssertionError(f"cols {sorted(s.columns)} != {sorted(d.columns)}")
            sn, dn = _normalize(s), _normalize(d)
            for c in sn.columns:
                bad = [
                    (j, a, b)
                    for j, (a, b) in enumerate(zip(sn[c], dn[c]))
                    if not _eq(a, b)
                ]
                if bad:
                    raise AssertionError(f"col {c}: first mismatches {bad[:3]}")
            print(
                f"[{i + 1}/{len(names)}] {name}: OK ({len(s)} rows, {time.monotonic() - t0:.2f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 - report and continue
            failed.append(name)
            print(f"[{i + 1}/{len(names)}] {name}: FAIL — {exc}", flush=True)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
