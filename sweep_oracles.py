#!/usr/bin/env python
"""Driver-style oracle sweep at any scale factor.

Mirrors the driver's CORRECTNESS gate (row count + stringified value hash,
columns sorted by name) over every ``__spark_entry__.queries()`` entry —
but runnable at sf0.1, where scale-sensitive oracle bugs surface that the
driver's sf0.01 gate cannot see (e.g. DuckDB window order under parallel
scans).

Sweeps the FULL registry (queries.ALL_QUERIES: every individual operator
query plus the compound suites) by default — the driver-facing registry
(``--registry driver``) is the consolidated subset ``__spark_entry__``
exposes.

Usage: python sweep_oracles.py [--sf-dir /root/testdata/sf0.1]
                               [--only name1,name2] [--cpus 16]
                               [--registry all|driver]
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _norm(df):
    cols = sorted(df.columns)
    return df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)


def _vhash(df) -> str:
    return hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--registry", choices=("all", "driver"), default="all")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import os

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # one JVM hosts all ~66 queries back-to-back: without real driver
        # heap the accumulated state (persisted frames, streaming memory
        # sinks) OOMs the sweep mid-run at sf0.1
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g")
        )
        .getOrCreate()
    )
    import __spark_entry__ as E  # noqa: F401 — sets sys.path for the package

    from marie_icr_spark import queries as Q

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    if args.registry == "driver":
        qs, oracles = Q.QUERIES, Q.ORACLES
    else:
        qs, oracles = Q.ALL_QUERIES, Q.ALL_ORACLES
    names = sorted(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = _norm(qs[name](spark, args.sf_dir).toPandas())
            odf = _norm(con.execute(oracles[name]).fetchdf())
            ok = len(sdf) == len(odf) and _vhash(sdf) == _vhash(odf)
            status = "ok" if ok else "MISMATCH"
            if not ok:
                failures.append(name)
            print(f"{name:28s} {status:8s} rows={len(sdf)}/{len(odf)} "
                  f"{time.time() - t0:5.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"{name:28s} ERROR    {str(e)[:120]}", flush=True)
        finally:
            # queries share one session: drop what each leaves behind
            # (persisted frames, streaming memory-sink tables) so the sweep
            # measures the queries, not their accumulation
            try:
                spark.catalog.clearCache()
                for tbl in spark.catalog.listTables():
                    if tbl.isTemporary:
                        spark.catalog.dropTempView(tbl.name)
            except Exception:  # noqa: BLE001 — cleanup is best-effort
                pass
    print(f"\n{len(names) - len(failures)}/{len(names)} green at {args.sf_dir}")
    if failures:
        print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
