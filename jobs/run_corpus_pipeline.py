#!/usr/bin/env python
"""spark-submit entrypoint: transcripts → curated training corpus.

    spark-submit --py-files marie_icr_spark.zip jobs/run_corpus_pipeline.py \\
        --input  <transcripts table/path> \\
        --output <corpus catalog dir> \\
        [--min-quality 0.5] [--jaccard-threshold 0.5 | --no-near-dup] \\
        [--rate en=0.6 --rate und=1.0] [--default-rate 0.3] \\
        [--n-buckets 64]

Chains the certified pipeline (plans/corpus.py): extract → assemble →
quality gate → language ID → exact dedup → near-dup survivors →
stratified sample, then commits the corpus through the atomic
manifest-swap catalog (plans.manifest.commit_table) — one CURRENT rename
makes the whole snapshot visible; readers use plans.manifest.read_results.
Prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_rate(kv: str) -> tuple[str, float]:
    k, _, v = kv.partition("=")
    if not _ or not k:
        raise argparse.ArgumentTypeError(f"--rate wants lang=frac, got {kv!r}")
    return k, float(v)


def main(argv: list[str] | None = None, spark=None) -> int:
    from marie_icr_spark.plans import corpus as C

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript parquet path")
    ap.add_argument("--output", required=True, help="corpus catalog dir")
    ap.add_argument("--min-quality", type=float, default=C.MIN_QUALITY)
    ap.add_argument(
        "--jaccard-threshold", type=float, default=C.JACCARD_THRESHOLD
    )
    ap.add_argument(
        "--no-near-dup", action="store_true",
        help="skip the near-dup survivor stage",
    )
    ap.add_argument(
        "--rate", action="append", type=_parse_rate, default=None,
        metavar="LANG=FRAC",
        help="per-language sample rate (repeatable); default: the pinned "
             f"{C.SAMPLE_RATES}",
    )
    ap.add_argument("--default-rate", type=float, default=C.SAMPLE_DEFAULT_RATE)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--mode", default="sparse", help="PSM mode for layout turns")
    ap.add_argument(
        "--checkpoint-dir",
        default=None,
        help="reliable checkpoint dir for the connected-component rounds "
        "(pass a durable path on a real cluster; default = executor-local)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from marie_icr_spark.plans import incremental
    from marie_icr_spark.plans.manifest import commit_table

    owns_session = spark is None
    if owns_session:
        from marie_icr_spark.session import build_session

        spark = build_session(app_name="corpus-pipeline")
    try:
        transcripts = spark.read.parquet(args.input)
        handles: list = []
        corpus = C.build_corpus(
            transcripts,
            min_quality=args.min_quality,
            jaccard_threshold=(
                None if args.no_near_dup else args.jaccard_threshold
            ),
            rates=dict(args.rate) if args.rate else dict(C.SAMPLE_RATES),
            default_rate=args.default_rate,
            mode=args.mode,
            persist_handles=handles,
            checkpoint_dir=args.checkpoint_dir,
        )
        manifest = commit_table(
            corpus,
            args.output,
            key_col="conv_id",
            n_buckets=args.n_buckets,
            hash_cols=incremental.CORPUS_HASH_COLS,
            sum_col="n_tokens",
        )
        for h in handles:  # the commit materialized everything
            h.unpersist()
        summary = {
            "conversations": sum(
                e["turn_count"] for e in manifest["buckets"].values()
            ),
            "tokens": sum(
                e["span_count"] for e in manifest["buckets"].values()
            ),
            "buckets": len(manifest["buckets"]),
            "manifest_version": manifest["version"],
            "output": args.output,
        }
        print(json.dumps(summary))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
