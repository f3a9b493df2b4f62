"""spark-submit entrypoint (jobs/run_extraction.py) end-to-end: CLI args →
resumable job → results + lineage on disk. Covers the north rule's launch
shape without invoking the spark-submit binary (main() runs in-process)."""

import json
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "jobs"))
import run_extraction  # noqa: E402

from marie_icr_spark.plans.lineage import read_lineage, read_results
from marie_icr_spark.sources.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    tdf, _ = synth_transcripts(n_convs=15, seed=21, hot_factor=4)
    path = str(tmp_path_factory.mktemp("cli_in"))
    spark.createDataFrame(tdf, schema=TRANSCRIPT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_cli_end_to_end_and_resume_noop(spark, input_dir, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("cli_out"))
    rc = run_extraction.main(
        ["--input", input_dir, "--output", out, "--n-buckets", "4",
         "--buckets-per-commit", "2", "--salt-partitions", "8"],
        spark=spark,
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(summary["buckets_processed"]) == list(range(4))
    n_in = spark.read.parquet(input_dir).count()
    assert read_results(spark, out, committed_only=True).count() == n_in
    lin = read_lineage(spark, out)
    assert lin.filter("status = 'completed'").select("bucket").distinct().count() == 4

    # rerun = resume noop
    rc2 = run_extraction.main(
        ["--input", input_dir, "--output", out, "--n-buckets", "4"],
        spark=spark,
    )
    assert rc2 == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["buckets_processed"] == []


def test_cli_psm_mode_flag_reaches_extraction(spark, input_dir, tmp_path_factory, capsys):
    """--mode must change layout-turn extraction (regression: the flag was
    parsed but never passed through to the job)."""
    out_sparse = str(tmp_path_factory.mktemp("cli_sparse"))
    out_raw = str(tmp_path_factory.mktemp("cli_raw"))
    for out, mode in ((out_sparse, "sparse"), (out_raw, "raw_line")):
        rc = run_extraction.main(
            ["--input", input_dir, "--output", out, "--n-buckets", "2",
             "--mode", mode],
            spark=spark,
        )
        assert rc == 0
    n_in = spark.read.parquet(input_dir).count()
    a = read_results(spark, out_sparse)
    b = read_results(spark, out_raw)
    assert a.count() == n_in and b.count() == n_in
    # raw_line flattens layout turns to one input-order line → texts differ
    joined = (
        a.select("conv_id", "turn_idx", a["extracted_text"].alias("t_sparse"))
        .join(
            b.select("conv_id", "turn_idx", b["extracted_text"].alias("t_raw")),
            ["conv_id", "turn_idx"],
        )
        .filter("t_sparse != t_raw")
    )
    assert joined.count() > 0


def test_cli_atomic_flag_commits_via_manifest(spark, input_dir, tmp_path_factory, capsys):
    """--atomic routes the job through the manifest-swap catalog: CURRENT
    advances, data lands in an immutable per-run dir, resume is a no-op,
    and the manifest reader returns every row."""
    from marie_icr_spark.plans import manifest as M

    out = str(tmp_path_factory.mktemp("cli_atomic"))
    rc = run_extraction.main(
        ["--input", input_dir, "--output", out, "--n-buckets", "4",
         "--buckets-per-commit", "2", "--atomic"],
        spark=spark,
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["manifest_version"] == 2
    assert M.current_version(out) == 2
    n_in = spark.read.parquet(input_dir).count()
    assert M.read_results(spark, out).count() == n_in
    # resume: nothing pending, no new manifest version
    rc2 = run_extraction.main(
        ["--input", input_dir, "--output", out, "--n-buckets", "4",
         "--buckets-per-commit", "2", "--atomic"],
        spark=spark,
    )
    assert rc2 == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["buckets_processed"] == []
    assert M.current_version(out) == 2
