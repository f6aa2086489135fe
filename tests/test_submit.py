"""north_rule deployment shape: the engine runs via
``spark-submit --py-files <pkg.zip>`` with the package imported from the
zip (not the checkout), building an index and answering a query."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spark_submit = shutil.which("spark-submit")


@pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from bm25_pagerank_rpi_spark.sources.transcripts import synthesize_transcripts

    tpath = str(tmp_path / "transcripts")
    synthesize_transcripts(spark, "/root/testdata/sf0.001", replicas=1).write.mode(
        "overwrite"
    ).parquet(tpath)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "pkg.zip"))

    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            tpath, str(tmp_path / "index"), "hash join table", "5",
        ],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path),  # NOT the repo: the package must come from the zip
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON from spark-submit: {out.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["turns"] == 500
    assert len(res["topk"]) == 5
    assert res["topk"][0]["rank"] == 1
    # rank-identical to the in-process exact path on the same corpus
    from bm25_pagerank_rpi_spark.operators import scorer
    from bm25_pagerank_rpi_spark.sources.transcripts import with_doc_identity

    docs = with_doc_identity(spark.read.parquet(tpath)).select("doc_id", "text")
    q = spark.createDataFrame(
        [("q1", "hash join table")], "query_id string, text string"
    )
    exact = scorer.rank_documents(docs, q, k=5).orderBy("rank").collect()
    assert [r["doc_id"] for r in res["topk"]] == [r.doc_id for r in exact]
    for got, exp in zip(res["topk"], exact):
        assert got["bm25"] == pytest.approx(exp.bm25, abs=1e-6)
