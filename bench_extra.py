#!/usr/bin/env python
"""Extra isolation benchmarks (guide §1.4) — NOT the frozen driver bench.

Decomposes the extract_turns pipeline cost into: parquet scan, Arrow
boundary crossing (mapInArrow passthrough), pure-Python extraction, and
aggregate, each timed with the noop sink so the computation is what is
measured. Usage mirrors bench.py env vars.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import pyarrow as pa


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, timings, reps=3):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    timings[name] = round(best, 3)
    print(f"  {name}: {best:.3f}s", file=sys.stderr)


def passthrough_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    # crosses the boundary both ways but does no Python work beyond len()
    for rb in batches:
        yield pa.RecordBatch.from_arrays(
            [pa.array([rb.num_rows], pa.int64())], names=["n"]
        )


def tolist_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    # boundary + to_pylist conversion cost, no extraction
    for rb in batches:
        texts = rb.column(0).to_pylist()
        yield pa.RecordBatch.from_arrays(
            [pa.array([sum(len(t or "") for t in texts)], pa.int64())], names=["n"]
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    replicate = int(os.environ.get("BENCH_REPLICATE", "120"))

    from marie_icr_spark.session import build_session
    from marie_icr_spark.operators.extraction import extract_turns
    from marie_icr_spark.operators.assembly import assemble_conversations
    from bench import materialize_transcripts
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = build_session(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    path = materialize_transcripts(spark, sf_dir, replicate)
    transcripts = spark.read.parquet(path)

    # warmup python workers
    extract_turns(transcripts).agg(F.count(F.lit(1))).collect()

    timings: dict[str, float] = {}
    t = timed

    text_only = transcripts.select("text")
    t(spark, "scan_text_noop", lambda: noop(text_only), timings)
    t(spark, "scan_all_noop", lambda: noop(transcripts), timings)

    schema_n = T.StructType([T.StructField("n", T.LongType())])
    t(
        spark,
        "boundary_passthrough",
        lambda: noop(text_only.mapInArrow(passthrough_batches, schema=schema_n)),
        timings,
    )
    t(
        spark,
        "boundary_tolist",
        lambda: noop(text_only.mapInArrow(tolist_batches, schema=schema_n)),
        timings,
    )
    t(
        spark,
        "extract_noop",
        lambda: noop(extract_turns(transcripts)),
        timings,
    )
    t(
        spark,
        "extract_kindspan_noop",
        lambda: noop(
            extract_turns(transcripts, columns=("payload_kind", "span_count"))
        ),
        timings,
    )
    t(
        spark,
        "extract_structs_noop",
        lambda: noop(extract_turns(transcripts, with_structs=True)),
        timings,
    )
    t(
        spark,
        "extract_agg (bench q1)",
        lambda: extract_turns(transcripts)
        .agg(F.sum("span_count"), F.count(F.lit(1)))
        .collect(),
        timings,
    )
    t(
        spark,
        "assemble_noop",
        lambda: noop(assemble_conversations(extract_turns(transcripts))),
        timings,
    )
    spark.stop()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
