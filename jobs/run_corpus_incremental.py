#!/usr/bin/env python
"""CDC-driven incremental corpus curation job (spark-submit entry).

    python jobs/run_corpus_incremental.py \
        --input /data/transcripts \
        --results-dir /tables/extraction --from-version 12 \
        --stage-dir /tables/corpus_stage \
        --output /tables/corpus [--n-buckets 64] [--checkpoint-dir /ckpt]

Reads the affected-conversation set from the extraction catalog's
manifest diff (``read_incremental`` between ``--from-version`` and
CURRENT), re-runs the expensive per-conversation curation stages only
for those conversations, merges them into the stage catalog at
``--stage-dir``, re-finalizes (dedup → components → sampling), and
commits the final corpus to ``--output`` — all through the atomic
manifest catalog, so readers never see a partial update. Prints one
JSON summary line.

First run (empty stage dir): pass ``--bootstrap`` to build the stage
from scratch over the full input instead of merging a delta.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--results-dir", default=None,
                    help="extraction catalog (CDC source)")
    ap.add_argument("--from-version", type=int, default=None,
                    help="manifest version the corpus last consumed")
    ap.add_argument("--stage-dir", required=True,
                    help="pre-dedup stage catalog dir")
    ap.add_argument("--output", required=True,
                    help="final corpus catalog dir")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--mode", default="sparse")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--bootstrap", action="store_true",
                    help="build the stage from scratch (first run)")
    args = ap.parse_args(argv)

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import SparkSession

    from marie_icr_spark.plans import corpus as C
    from marie_icr_spark.plans import incremental as INC
    from marie_icr_spark.plans.manifest import commit_table

    owns = spark is None
    if owns:
        spark = SparkSession.builder.getOrCreate()
    handles: list = []
    try:
        t = spark.read.parquet(args.input)
        if args.bootstrap:
            INC.commit_stage(
                C.stage_convs(t, mode=args.mode),
                args.stage_dir,
                n_buckets=args.n_buckets,
            )
            from marie_icr_spark.plans.manifest import read_results

            stage = read_results(spark, args.stage_dir).select(
                *INC.STAGE_COLS
            )
            corpus = C.finalize_corpus(
                stage,
                rates=dict(C.SAMPLE_RATES),
                persist_handles=handles,
                checkpoint_dir=args.checkpoint_dir,
            )
            n_affected = None
        else:
            if args.results_dir is None or args.from_version is None:
                ap.error("--results-dir and --from-version are required "
                         "unless --bootstrap")
            affected = INC.affected_convs_from_cdc(
                spark, args.results_dir, args.from_version
            )
            n_affected = affected.count()
            corpus = INC.curate_incremental(
                spark, t, affected, args.stage_dir,
                rates=dict(C.SAMPLE_RATES),
                mode=args.mode,
                n_buckets=args.n_buckets,
                persist_handles=handles,
                checkpoint_dir=args.checkpoint_dir,
            )
        manifest = commit_table(
            corpus,
            args.output,
            key_col="conv_id",
            n_buckets=args.n_buckets,
            # same certification as jobs/run_corpus_pipeline.py so both
            # CLIs can write the same corpus catalog
            hash_cols=INC.CORPUS_HASH_COLS,
            sum_col="n_tokens",
        )
        total = sum(
            e["turn_count"] for e in manifest["buckets"].values()
        )
        print(json.dumps({
            "action": "bootstrap" if args.bootstrap else "incremental",
            "affected_convs": n_affected,
            "corpus_rows": total,
            "corpus_version": manifest["version"],
            "stage_version": INC.stage_version(args.stage_dir),
        }))
        return 0
    finally:
        for h in handles:
            h.unpersist()
        if owns:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
