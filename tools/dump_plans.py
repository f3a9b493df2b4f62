#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries (guide §7.2 evidence).

Usage:
  python tools/dump_plans.py --out plans/r06 --suffix _after [--only a,b]
  python tools/dump_plans.py --bench --out plans/r06 --suffix _after

--bench dumps the four bench.py query plans (over the cached bench input)
instead of the driver-registry queries (over sf0.01 testdata).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from marie_icr_spark.session import build_session

    spark = build_session(
        app_name="dump-plans", master="local[4]", shuffle_partitions=32
    )
    os.makedirs(args.out, exist_ok=True)

    def dump(name: str, df) -> None:
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")

    if args.bench:
        from pyspark.sql import functions as F

        from bench import materialize_transcripts
        from marie_icr_spark.operators.assembly import assemble_conversations
        from marie_icr_spark.operators.extraction import extract_turns

        path = materialize_transcripts(spark, "/root/testdata/sf0.1", 120)
        transcripts = spark.read.parquet(path)
        frames = {
            "bench_extract_turns": extract_turns(transcripts).agg(
                F.sum("span_count"), F.count(F.lit(1))
            ),
            "bench_assemble_conversations": assemble_conversations(
                extract_turns(transcripts)
            ).agg(F.sum("turn_count"), F.max(F.length("conversation_text"))),
            "bench_kind_counts": extract_turns(
                transcripts, columns=("payload_kind", "span_count")
            )
            .groupBy("payload_kind")
            .agg(F.sum("span_count")),
            "bench_extract_with_structs": extract_turns(
                transcripts, with_structs=True
            ).agg(F.sum(F.size("words")), F.sum(F.size("lines"))),
        }
        for name, df in frames.items():
            dump(name, df)
    else:
        import __spark_entry__ as E

        only = set(args.only.split(",")) if args.only else None
        for name, fn in E.queries().items():
            if only and name not in only:
                continue
            try:
                dump(name, fn(spark, args.sf_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"SKIP {name}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
