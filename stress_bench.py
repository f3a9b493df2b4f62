#!/usr/bin/env python
"""Scale-stress evidence for the heavy dedup/CC/corpus family.

The driver bench certifies the headline extraction queries; this bench
answers the remaining "would it survive 100×?" question for the most
shuffle-heavy operators (jaccard_pairs, dedup_groups, dedup_survivors,
corpus_pipeline) by running them at several input multiples of the sf0.1
corpus and recording wall-time + output cardinality.

Two replica modes for the dedup family:

* ``disjoint`` — replica r prefixes every token with a replica tag, so the
  shingle space is disjoint across replicas: the inverted index simply
  gains R independent slices and total work should scale ~linearly in R.
  This certifies the posting-list cost model (cost bounded by sum of
  per-shingle DF², never all-pairs).
* ``clique`` — exact replicas: every base document becomes an R-clique of
  exact duplicates, multiplying every shingle's DF by R and growing the
  matched-pair count ~R² per near-dup group. This is the planted
  worst-case (mass-duplicated web corpus); the MAX_SHINGLE_DF=512 /
  MAX_BUCKET_SIZE=256 caps must keep runtime from going quadratic.

corpus_pipeline scales through ``transcripts_from_docs(replicate=R)`` —
the same fan-out the driver bench uses.

Usage:
  python stress_bench.py [--scales 1,2,5] [--ops jaccard,groups,survivors,corpus]
                         [--mode disjoint|clique] [--sf-dir DIR] [--record]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F


def scaled_corpus(spark, sf_dir: str, r: int, mode: str):
    from marie_icr_spark import queries_ext as X
    from marie_icr_spark.functions.columns import ws_tokens

    base = X._corpus(spark, sf_dir)
    if r == 1:
        return base
    rep = base.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(r - 1))))
    did = (F.col("doc_id") + F.col("r") * F.lit(100_000_000)).alias("doc_id")
    if mode == "clique":
        return rep.select(did, "text")
    tag = F.concat(F.lit("zq"), F.col("r").cast("string"), F.lit("y"))
    txt = F.array_join(
        F.transform(ws_tokens(F.col("text")), lambda t: F.concat(tag, t)),
        " ",
    )
    return rep.select(did, txt.alias("text"))


def disjoint_sf_dir(spark, sf_dir: str, r: int) -> str:
    """Stage a scaled sf dir under /tmp whose ``documents`` table holds
    ``r`` DISJOINT replicas (replica-tagged tokens, offset doc_ids), so
    corpus curation sees r× genuinely distinct documents — output (and
    runtime) should scale ~linearly, unlike the exact-replica fan-out
    where the whole corpus collapses into one near-dup component."""
    from marie_icr_spark.functions.columns import ws_tokens
    from marie_icr_spark.sources.tables import load_table

    out = f"/tmp/stress_sf_disjoint_{r}x"
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            src = os.path.join(sf_dir, f"{t}.parquet")
            dst = os.path.join(out, f"{t}.parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        docs = load_table(spark, sf_dir, "documents")
        rep = docs.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(r - 1)))
        )
        tag = F.concat(F.lit("zq"), F.col("r").cast("string"), F.lit("y"))
        txt = F.when(F.col("r") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    ws_tokens(F.col("text")),
                    lambda t: F.concat(tag, t),
                ),
                " ",
            )
        )
        scaled = rep.select(
            (
                F.col("doc_id").cast("long")
                + F.col("r").cast("long") * F.lit(100_000_000).cast("long")
            ).alias("doc_id"),
            txt.alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        tmp = os.path.join(out, "_documents_build")
        scaled.coalesce(8).write.mode("overwrite").parquet(tmp)
        os.rename(tmp, os.path.join(out, "documents.parquet"))
    return out


def run_op(spark, sf_dir: str, op: str, r: int, mode: str) -> dict:
    from marie_icr_spark import queries_ext as X
    from marie_icr_spark.operators.components import dedup_groups
    from marie_icr_spark.operators.dedup import jaccard_pairs

    t0 = time.time()
    if op == "corpus-disjoint":
        from marie_icr_spark.plans import corpus as CP
        from marie_icr_spark.sources.transcripts import transcripts_from_docs

        staged = sf_dir if r == 1 else disjoint_sf_dir(spark, sf_dir, r)
        t = transcripts_from_docs(spark, staged)
        n_in = t.count()
        handles: list = []
        t0 = time.time()
        out = CP.build_corpus(
            t, rates=dict(CP.SAMPLE_RATES), persist_handles=handles
        )
        rows = out.count()
        dt = time.time() - t0
        for h in handles:
            h.unpersist()
        return {
            "op": op, "scale": r, "mode": "disjoint-docs",
            "input_rows": n_in, "output_rows": rows, "sec": round(dt, 2),
        }
    if op == "corpus":
        from marie_icr_spark.plans import corpus as CP
        from marie_icr_spark.sources.transcripts import transcripts_from_docs

        t = transcripts_from_docs(spark, sf_dir, replicate=r, partitions=256)
        n_in = t.count()
        handles: list = []
        t0 = time.time()
        out = CP.build_corpus(
            t, rates=dict(CP.SAMPLE_RATES), persist_handles=handles
        )
        rows = out.count()
        dt = time.time() - t0
        for h in handles:
            h.unpersist()
    elif op == "templates":
        # composite template/selector matching over replicated layout
        # turns (per-frame work: runtime must scale ~linearly in R and
        # the length-bound prune must hold its ratio at every scale)
        from marie_icr_spark.operators.extraction import extract_turns
        from marie_icr_spark.operators.readingorder import (
            xy_cut_reading_order,
        )
        from marie_icr_spark.operators.templates import composite_match_turns
        from marie_icr_spark.sources.transcripts import transcripts_from_docs

        # partitions=256: the generator's single input split would
        # otherwise serialize payload construction AND the extraction map
        # on one task (same 256-split shape bench.py materializes)
        t = transcripts_from_docs(spark, sf_dir, replicate=r, partitions=256)
        e = extract_turns(t, with_structs=True).filter(
            F.col("payload_kind") == "layout"
        )
        n_in = e.count()
        t0 = time.time()
        rows = composite_match_turns(e).count()
        dt = time.time() - t0
        t1 = time.time()
        ro = xy_cut_reading_order(e).count()
        dt_ro = time.time() - t1
        return {
            "op": op, "scale": r, "mode": "replicate",
            "input_rows": n_in, "output_rows": rows, "sec": round(dt, 2),
            "xy_cut_rows": ro, "xy_cut_sec": round(dt_ro, 2),
        }
    else:
        corpus = scaled_corpus(spark, sf_dir, r, mode)
        n_in = corpus.count()
        t0 = time.time()
        if op == "jaccard":
            rows = jaccard_pairs(corpus, X._JACCARD_T).count()
        elif op == "groups":
            rows = dedup_groups(
                jaccard_pairs(corpus, X._JACCARD_T)
            ).count()
        elif op == "survivors":
            groups = dedup_groups(jaccard_pairs(corpus, X._JACCARD_T))
            drops = groups.filter(
                F.col("doc_id") != F.col("keep_id")
            ).select("doc_id")
            rows = (
                corpus.select("doc_id")
                .join(drops, "doc_id", "left_anti")
                .count()
            )
        else:
            raise ValueError(op)
        dt = time.time() - t0
    return {
        "op": op, "scale": r, "mode": mode if op != "corpus" else "replicate",
        "input_rows": n_in, "output_rows": rows, "sec": round(dt, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,5")
    ap.add_argument("--ops", default="jaccard,groups,survivors,corpus")
    ap.add_argument("--mode", default="disjoint",
                    choices=["disjoint", "clique"])
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    from marie_icr_spark.session import build_session

    spark = build_session(
        app_name="stress-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    results = []
    for op in args.ops.split(","):
        for r in (int(x) for x in args.scales.split(",")):
            res = run_op(spark, args.sf_dir, op, r, args.mode)
            results.append(res)
            print(json.dumps(res), flush=True)
    spark.stop()

    if args.record:
        lines = ["", f"Stress run ({args.mode} mode, local[{args.cpus}], "
                     f"{os.path.basename(os.path.normpath(args.sf_dir))}):",
                 "", "| op | scale | input rows | output rows | sec |",
                 "|---|---|---|---|---|"]
        for r in results:
            lines.append(
                f"| {r['op']} ({r['mode']}) | {r['scale']}x | "
                f"{r['input_rows']} | {r['output_rows']} | {r['sec']} |"
            )
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH.md"), "a") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
