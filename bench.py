#!/usr/bin/env python
"""Benchmark harness: extraction throughput on the transcript table.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "turns": ..., "turns_per_sec": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_REPLICATE      doc→turn fan-out factor (default 120 → ~600k turns
                       at sf0.1)

The transcript input is synthesized deterministically from documents.parquet
(invertible payload construction; marie_icr_spark.sources.transcripts) and
cached as parquet under .cache/ so repeated runs measure the engine, not the
generator.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf"


def materialize_transcripts(spark, sf_dir: str, replicate: int) -> str:
    from marie_icr_spark.sources.transcripts import transcripts_from_docs

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".cache",
        f"transcripts_{_sf_name(sf_dir)}_r{replicate}",
    )
    marker = os.path.join(cache, "_SUCCESS")
    if not os.path.exists(marker):
        # 256 splits: fine-grained tasks load-balance the 4× cost spread
        # between payload kinds even at 32+ cores (no straggler waves);
        # partitions=256 repartitions BEFORE payload construction so the
        # generator itself runs wide, not just the write
        (
            transcripts_from_docs(spark, sf_dir, replicate=replicate,
                                  partitions=256)
            .write.mode("overwrite")
            .parquet(cache)
        )
    return cache


def run_bench(spark, sf_dir: str, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from marie_icr_spark.operators.assembly import assemble_conversations
    from marie_icr_spark.operators.extraction import extract_turns

    path = materialize_transcripts(spark, sf_dir, replicate)
    transcripts = spark.read.parquet(path)
    n_turns = transcripts.count()

    # warmup: one full untimed pass spins up every python worker / Arrow
    # serializer (limit() would only warm a single task)
    extract_turns(transcripts).agg(F.count(F.lit(1))).collect()

    timings: dict[str, float] = {}

    def timed(name, fn, reps: int = 3):
        # best-of-N: single-shot timings on a shared sandbox swing 2x
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # q1: the north-star path — per-turn extraction, forced via aggregation
    timed(
        "extract_turns",
        lambda: extract_turns(transcripts)
        .agg(F.sum("span_count"), F.count(F.lit(1)))
        .collect(),
    )
    # q2: extraction + salted two-phase conversation reassembly
    timed(
        "assemble_conversations",
        lambda: assemble_conversations(extract_turns(transcripts))
        .agg(F.sum("turn_count"), F.max(F.length("conversation_text")))
        .collect(),
    )
    # q3: payload-kind aggregate (hash agg over extraction); the explicit
    # output projection keeps the corpus-sized extracted_text column from
    # ever crossing the Arrow boundary (Catalyst can't prune through
    # mapInArrow on its own)
    timed(
        "kind_counts",
        lambda: extract_turns(
            transcripts, columns=("payload_kind", "span_count")
        )
        .groupBy("payload_kind")
        .agg(F.sum("span_count"))
        .collect(),
    )
    # q4: full-fidelity extraction incl. word/line structs (layout turns)
    timed(
        "extract_with_structs",
        lambda: extract_turns(transcripts, with_structs=True)
        .agg(F.sum(F.size("words")), F.sum(F.size("lines")))
        .collect(),
    )

    total = round(sum(timings.values()), 3)
    return {
        "metric": "transcript_extraction_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_name(sf_dir),
        "turns": n_turns,
        "turns_per_sec": round(n_turns / timings["extract_turns"], 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    replicate = int(os.environ.get("BENCH_REPLICATE", "120"))

    from marie_icr_spark.session import build_session

    spark = build_session(
        app_name="marie-icr-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    try:
        result = run_bench(spark, sf_dir, replicate)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
