#!/usr/bin/env python
"""Planted-skew benchmark for ``salt_repartition`` (SURVEY §4 skew story).

Plants one conversation holding ~50% of all turns, clusters the input by
conv_id (the realistic worst case: upstream data arrives
conversation-partitioned), and measures:

  A. extraction WITHOUT salting — one task owns the hot conversation and
     becomes the straggler (wall ≈ hot-share of total core-time);
  B. extraction WITH salt_repartition — one extra shuffle redistributes
     the hot conversation over salt buckets, wall ≈ even split;
  C. the unsalt/reassembly cost — assemble_conversations after salting vs
     after clustered input (reassembly re-groups by conv_id either way,
     so salting's only residual cost is B's shuffle).

Prints one JSON line; paste the numbers into BENCH.md.

Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (default 32),
BENCH_REPLICATE (default 120).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("BENCH_REPLICATE", "120"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from bench import materialize_transcripts
    from marie_icr_spark.operators.assembly import assemble_conversations
    from marie_icr_spark.operators.extraction import (
        extract_turns,
        salt_repartition,
    )
    from marie_icr_spark.session import build_session

    spark = build_session(
        app_name="skew-bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    try:
        path = materialize_transcripts(spark, sf_dir, replicate)
        base = spark.read.parquet(path)

        # plant the skew: ~50% of turns fold into ONE conversation, then
        # cluster by conv_id (hash partitioning) so the hot conversation
        # lands in a single input partition
        planted = base.withColumn(
            "conv_id",
            F.when(
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2)) == 0,
                F.lit("conv-hot"),
            ).otherwise(F.col("conv_id")),
        )
        clustered = planted.repartition(cpus * 2, "conv_id").persist()
        n = clustered.count()  # materialize once; timings exclude planting
        hot = clustered.filter(F.col("conv_id") == "conv-hot").count()

        def timed(fn, reps=2):
            best = None
            for _ in range(reps):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            return round(best, 3)

        agg = lambda df: df.agg(
            F.sum("span_count"), F.count(F.lit(1))
        ).collect()

        extract_unsalted = timed(lambda: agg(extract_turns(clustered)))
        extract_salted = timed(
            lambda: agg(
                extract_turns(
                    salt_repartition(clustered, cpus * 2, salt_buckets=64)
                )
            )
        )
        asm = lambda df: assemble_conversations(df).agg(
            F.sum("turn_count"), F.max(F.length("conversation_text"))
        ).collect()
        assemble_unsalted = timed(lambda: asm(extract_turns(clustered)))
        assemble_salted = timed(
            lambda: asm(
                extract_turns(
                    salt_repartition(clustered, cpus * 2, salt_buckets=64)
                )
            )
        )
        clustered.unpersist()
        print(
            json.dumps(
                {
                    "metric": "planted_skew_salt_repartition",
                    "sf": os.path.basename(os.path.normpath(sf_dir)),
                    "turns": n,
                    "hot_share": round(hot / n, 4),
                    "cpus": cpus,
                    "extract_unsalted_s": extract_unsalted,
                    "extract_salted_s": extract_salted,
                    "extract_speedup": round(
                        extract_unsalted / extract_salted, 2
                    ),
                    "assemble_unsalted_s": assemble_unsalted,
                    "assemble_salted_s": assemble_salted,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
