#!/usr/bin/env python
"""spark-submit entrypoint: manifest-catalog administration.

    python jobs/catalog_admin.py status  --table <dir>
    python jobs/catalog_admin.py compact --table <dir> [--buckets 0,1,2]
    python jobs/catalog_admin.py vacuum  --table <dir> \
        [--keep-versions N] [--min-age-seconds S]

The operational face of plans/manifest.py: ``status`` reports the CURRENT
version, per-key totals, live run dirs, and the stats certification;
``compact`` collapses epoch/run fragmentation into one bucketed run dir
(atomically; partial bucket ranges via ``--buckets``); ``vacuum`` reclaims
orphaned run dirs and superseded manifests. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["status", "compact", "vacuum"])
    ap.add_argument("--table", required=True, help="catalog table dir")
    ap.add_argument(
        "--buckets", default=None,
        help="comma-separated bucket ids (compact: partial range)",
    )
    ap.add_argument(
        "--keep-versions", type=int, default=0,
        help="vacuum: retain the last N manifest versions before CURRENT "
        "(time-travel window)",
    )
    ap.add_argument(
        "--min-age-seconds", type=float, default=0.0,
        help="vacuum: only reclaim files older than this (grace period "
        "for in-flight writers / slow readers)",
    )
    args = ap.parse_args(argv)

    from marie_icr_spark.plans import manifest as M

    if args.action == "vacuum":
        removed = M.vacuum(
            args.table,
            keep_versions=args.keep_versions,
            min_age_seconds=args.min_age_seconds,
        )
        print(json.dumps({"action": "vacuum", "removed": len(removed),
                          "paths": removed}))
        return 0

    owns_session = spark is None
    if owns_session:
        from marie_icr_spark.session import build_session

        spark = build_session(app_name="catalog-admin")
    try:
        if args.action == "compact":
            buckets = (
                [int(b) for b in args.buckets.split(",")]
                if args.buckets
                else None
            )
            m = M.compact(spark, args.table, buckets=buckets)
        else:
            m = M.load_manifest(args.table)
        live_runs = sorted(
            {e["run_id"] for e in m["buckets"].values()
             if e["run_id"] is not None}
        )
        print(json.dumps({
            "action": args.action,
            "version": m["version"],
            "keys": len(m["buckets"]),
            "epoch_keys": sum(1 for k in m["buckets"] if "/" in k),
            "rows": sum(e["turn_count"] for e in m["buckets"].values()),
            "live_runs": len(live_runs),
            "stats": m.get("stats"),
        }))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
