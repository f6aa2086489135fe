"""Package the engine for ``spark-submit --py-files`` (north_rule: "run
via spark-submit --py-files on multi-executor clusters").

Produces a single zip of the ``bm25_pagerank_rpi_spark`` package (pure
Python, no compiled extensions, no top-level side effects — importable
on every executor straight from the zip via Spark's py-files mechanism).

Usage: python tools/make_pyfiles.py [out.zip]   (default dist/bm25_pagerank_rpi_spark.zip)
Then:  spark-submit --master <cluster> --py-files dist/bm25_pagerank_rpi_spark.zip \
           tools/submit_job.py <transcripts_parquet> <index_dir>
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "bm25_pagerank_rpi_spark"


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", f"{PKG}.zip")
    print(build(out))
