"""Index catalog: parquet tables + JSON stage manifests.

The north_rule asks for Iceberg tables with per-partition lineage manifests
and checkpoint-resumable build stages. Iceberg jars are not available in
this sandbox, so the catalog abstracts the storage contract the same way
(SURVEY.md §7 hard-part (e)): each logical table is a parquet directory and
each build stage records a manifest entry {completed, rows, seconds,
metrics} in ``_manifest.json``. On a cluster this class is the seam where
``spark.read.parquet`` becomes ``spark.table("catalog.db.tbl")`` and the
manifest becomes Iceberg snapshot metadata — no other code changes.

Tables:
  doc_meta     (doc_id, doc_int, conv_id, turn_idx, role, tool, ts, url,
                doc_length)                         — S3's metadata service
  corpus_stats (doc_count, avg_doc_length)          — S4's stats service
  postings     (term, doc_int, tf, doc_length, bucket) partitioned by bucket
                                                    — S1's index service
  blocks       (term, range_id, block_id, n_postings, min_doc, max_doc,
                max_factor, min_factor, docs_enc, tfs_enc, factors_enc,
                bucket) partitioned by bucket       — compressed segments;
                range_id = doc_int // range_rows is the WAND shard key
  terms        (term, df, idf, max_factor, min_factor) — per-term stats
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


@dataclass
class IndexCatalog:
    spark: SparkSession
    root: str

    # -- manifest -----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def read_manifest(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"stages": {}, "config": {}}

    def write_manifest(self, manifest: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    def stage_complete(self, stage: str) -> bool:
        st = self.read_manifest()["stages"].get(stage)
        if not st or not st.get("completed"):
            return False
        out = st.get("output")
        return out is None or os.path.exists(out)

    def record_stage(self, stage: str, output: str | None, rows: int | None,
                     seconds: float, metrics: dict | None = None) -> None:
        m = self.read_manifest()
        m["stages"][stage] = {
            "completed": True,
            "output": output,
            "rows": rows,
            "seconds": round(seconds, 3),
            "metrics": metrics or {},
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self.write_manifest(m)

    # -- tables -------------------------------------------------------------
    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write_counted(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> tuple[str, int]:
        """Write + row count WITHOUT a second Spark scan: counts come from
        the written parquet footers, a driver-side metadata read (on an
        object store: one small range request per file). The re-read
        `.count()` this replaces was pure fixed cost per build stage (for
        the blocks table it re-scanned the binary block columns just to
        count rows) — measured as a leading term in the T(k) = F + W/k
        fixed-cost fit of stage scaling.

        An ``Observation`` riding the write (``df.observe``) was the first
        cut, but in Spark 4.1 merely initializing the session's lazy
        ``observationManager`` makes the SparkSession non-serializable —
        and MLlib's ``model.transform`` captures the session inside its
        prediction UDF closure (via ``trainingSummary``), so any later
        MLlib action in the same session dies with Task-not-serializable.
        Footer counts are exact, launch no job, and touch no session
        state."""
        path = self.write(df, table, partition_by)
        return path, _parquet_num_rows(path)

    def write(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> str:
        p = self.path(table)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(p)
        # a dynamically-partitioned write of ZERO rows emits zero files and
        # the table becomes unreadable (no schema to infer). Repair AFTER the
        # write by checking for data files — a driver-side listing — instead
        # of probing df.isEmpty() up front, which launches a take(1) job that
        # re-executes the full upstream plan (tokenize/explode/encode) and
        # roughly doubles map-side work of the hottest build stages.
        if partition_by and not _has_parquet_files(p):
            (self.spark.createDataFrame([], df.schema)
                 .coalesce(1).write.mode("overwrite").parquet(p))
        return p

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    # convenience typed readers
    def doc_meta(self) -> DataFrame:
        return self.read("doc_meta")

    def corpus_stats(self) -> DataFrame:
        return self.read("corpus_stats")

    def postings(self) -> DataFrame:
        return self.read("postings")

    def blocks(self) -> DataFrame:
        return self.read("blocks")

    def terms(self) -> DataFrame:
        return self.read("terms")

    def scalar_stats(self) -> tuple[int, float]:
        row = self.corpus_stats().collect()[0]
        # avg over an empty corpus is NULL -> 0.0 (nothing to normalize)
        avgdl = float(row.avg_doc_length) if row.avg_doc_length is not None else 0.0
        return int(row.doc_count), avgdl

    # -- tombstones ---------------------------------------------------------
    # Lucene-style deletion model: deleting a document appends its doc_int
    # to the `deletes` table; postings/blocks/doc_meta rows stay on disk
    # until the next full compaction purges them (streaming/deletes.py).
    # Between compactions every query path masks tombstoned docs; per-term
    # df/idf stay FROZEN at their encode-time values (deleted docs still
    # count, exactly as Lucene keeps them in docFreq until segment merge),
    # while corpus_stats tracks the LIVE corpus so avgdl drift from heavy
    # deletion trips the same epsilon compaction gate as heavy insertion.

    def n_deletes(self) -> int:
        """Live tombstone count from the manifest — a local JSON read, so
        the zero-deletes hot path costs no Spark job and no table scan."""
        return int(self.read_manifest().get("n_deletes", 0))

    def deletes(self) -> DataFrame:
        """Tombstone relation (doc_int: long). Empty frame if none exist."""
        if self.n_deletes() and os.path.exists(self.path("deletes")):
            return self.read("deletes").select("doc_int")
        return self.spark.createDataFrame([], "doc_int long")

    def deleted_doc_ints(self):
        """Sorted int64 numpy array of tombstoned doc_ints, or None when
        there are none — the form the WAND kernels mask with (docs live
        inside encoded blocks there, so a relational anti-join cannot
        reach them). Driver-side collect: the set is bounded between
        compactions (compaction purges it back to zero); on a real
        cluster the same array ships once per query as part of the
        applyInPandas closure — for extreme churn a roaring bitmap
        broadcast variable is the drop-in upgrade at this seam."""
        import numpy as np

        if not self.n_deletes():
            return None
        vals = [r.doc_int for r in self.deletes().collect()]
        if not vals:
            return None
        return np.sort(np.asarray(vals, dtype=np.int64))

    def live_doc_meta(self) -> DataFrame:
        """doc_meta minus tombstoned rows — what corpus statistics and any
        full-corpus consumer should read between delete and purge."""
        dm = self.doc_meta()
        if self.n_deletes():
            return dm.join(F.broadcast(self.deletes()), "doc_int", "left_anti")
        return dm


def _parquet_num_rows(path: str) -> int:
    """Exact row count of a parquet table from file footers only —
    driver-side, no Spark job, no data pages read."""
    import pyarrow.parquet as pq

    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                total += pq.ParquetFile(os.path.join(dirpath, name)).metadata.num_rows
    return total


def _has_parquet_files(path: str) -> bool:
    """True if any parquet data file exists under ``path`` (recursively).
    Driver-side listing — O(#files), never re-executes the write plan."""
    for dirpath, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                return True
    return False


def term_bucket(col: F.Column | str, n_buckets: int) -> F.Column:
    """Stable bucket id for a term — the partition-pruning key. xxhash64 is
    deterministic across Spark sessions/versions for string input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


# the trigram index (plans.index_build.build_trigram_index) buckets on the
# same stable hash; a separate alias keeps call sites self-documenting
trigram_bucket = term_bucket
