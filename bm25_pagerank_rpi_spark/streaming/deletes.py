"""Document deletion and update (upsert) for a live index catalog.

The reference engine is strictly additive — its index service owns the
corpus and the ranker never removes a document (there is no delete verb
anywhere under /root/reference/internal). A real engine serving a growing
transcript corpus needs one, so this module adds the Lucene-style
tombstone model on top of the segment/compaction machinery in
``streaming/incremental.py``:

- ``delete_docs`` / ``delete_where`` append the victims' doc_ints to the
  catalog's ``deletes`` table. O(deletes), never O(corpus): postings,
  blocks and doc_meta rows stay on disk untouched.
- Every query path masks tombstones immediately: the relational paths
  (exact-from-index, positional phrase) anti-join the bounded deletes
  table (operators/query_exact.py, operators/phrase.py); the WAND path
  masks decoded doc ids inside the kernel at candidate-admission time
  (operators/wand.py::_live_keep_mask), because there the docs live
  inside encoded binary blocks where no relational join can reach them.
- Consistency model between delete and purge (exactly Lucene's): per-term
  df/idf and the encoded BM25 factors stay FROZEN at encode-time values —
  deleted docs still count in docFreq until segment merge — while
  ``corpus_stats`` tracks the LIVE corpus, so avgdl drift from heavy
  deletion trips the same epsilon compaction gate as heavy insertion
  (incremental.refresh_blocks). The exact-from-index path recomputes
  df/avgdl from live relations per query and is therefore the live-truth
  oracle; WAND serves within the documented epsilon band and snaps back
  to bit-exact parity at compaction.
- ``incremental.compact`` calls :func:`purge_deletes` first: doc_meta and
  postings are rewritten without the tombstoned rows (broadcast
  anti-join, temp-dir + atomic rename like minor_compact), the deletes
  table is cleared, and the re-encode then produces an index
  bit-identical to a from-scratch build of the live corpus
  (tests/test_deletes.py pins this).
- ``update_docs`` = tombstone the old turn versions + append the new text
  as a fresh segment (new doc_ints above the high-water mark, so the
  doc-ordered block invariant holds) + the usual epsilon-gated block
  refresh. An updated turn is visible to queries as soon as the refresh
  lands, its stale version invisible the moment the tombstone lands.

Single-writer ingest model throughout, same as the rest of the catalog.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.catalog import IndexCatalog
from ..sources.transcripts import with_doc_identity
from .incremental import (
    DEFAULT_AVGDL_EPSILON,
    DEFAULT_MINOR_COMPACT_GENS,
    _next_doc_int,
    append_segment,
    refresh_blocks,
)


def _rewrite_live_stats(cat: IndexCatalog) -> None:
    """corpus_stats over the LIVE corpus (doc_meta minus tombstones)."""
    stats = cat.live_doc_meta().agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.avg("doc_length").alias("avg_doc_length"),
    )
    stats.write.mode("overwrite").parquet(cat.path("corpus_stats"))


def delete_docs(cat: IndexCatalog, doc_ids: DataFrame | list[str]) -> int:
    """Tombstone documents by doc_id ("conv:turn"). Accepts a DataFrame
    with a ``doc_id`` column or a plain list of ids; unknown and
    already-deleted ids are ignored (idempotent). Returns the number of
    NEW tombstones. Cost: one broadcast join against doc_meta plus a
    1-row stats agg — independent of index size beyond the meta scan."""
    if not isinstance(doc_ids, DataFrame):
        doc_ids = cat.spark.createDataFrame(
            [(str(d),) for d in doc_ids], "doc_id string"
        )
    ids = doc_ids.select("doc_id").distinct()
    victims = (
        cat.doc_meta()
        .join(F.broadcast(ids), "doc_id")
        .select("doc_int")
        .distinct()
    )
    if cat.n_deletes():
        victims = victims.join(
            F.broadcast(cat.deletes()), "doc_int", "left_anti"
        )
    victims = victims.persist()
    n = victims.count()
    if n == 0:
        victims.unpersist()
        return 0
    victims.write.mode("append").parquet(cat.path("deletes"))
    victims.unpersist()
    m = cat.read_manifest()
    m["n_deletes"] = int(m.get("n_deletes", 0)) + n
    cat.write_manifest(m)
    _rewrite_live_stats(cat)
    return n


def delete_where(cat: IndexCatalog, predicate) -> int:
    """Tombstone every live document whose doc_meta row satisfies
    ``predicate`` (a Column over doc_meta columns, e.g.
    ``F.col("role") == "tool"`` or ``F.col("ts") < cutoff``) — the
    retention-policy entry point. Returns the number of new tombstones."""
    victims = cat.live_doc_meta().filter(predicate).select("doc_id")
    return delete_docs(cat, victims)


def update_docs(
    cat: IndexCatalog,
    batch: DataFrame,
    n_buckets: int | None = None,
    avgdl_epsilon: float = DEFAULT_AVGDL_EPSILON,
    minor_compact_after: int = DEFAULT_MINOR_COMPACT_GENS,
) -> int:
    """Upsert a transcript batch: tombstone any existing version of each
    (conv_id, turn_idx) turn, append the batch as a new segment (fresh
    doc_ints above the high-water mark — the doc-ordered block invariant
    is preserved, an updated doc simply moves to the newest doc range),
    then run the standard epsilon-gated block refresh. Returns the number
    of turns written."""
    if n_buckets is None:
        n_buckets = int(cat.read_manifest().get("config", {}).get("n_buckets") or 32)
    old = with_doc_identity(batch).select("doc_id").distinct()
    delete_docs(cat, old)
    base = _next_doc_int(cat)
    n = append_segment(cat, batch, n_buckets=n_buckets)
    if n:
        refresh_blocks(cat, base, avgdl_epsilon, minor_compact_after)
    return n


def _swap_rewrite(cat: IndexCatalog, table: str, df: DataFrame,
                  partition_by: list[str] | None) -> None:
    """Rewrite ``table`` from ``df`` via temp dir + atomic rename (the
    source table is an input of ``df``'s plan, so an in-place overwrite
    would read-while-truncating)."""
    final = cat.path(table)
    tmp = final + "._purging"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    shutil.rmtree(final)
    os.rename(tmp, final)


def purge_deletes(cat: IndexCatalog) -> int:
    """Physically remove tombstoned rows from doc_meta and postings and
    clear the deletes table — the merge half of the Lucene model, called
    by ``incremental.compact`` so the block re-encode that follows sees
    only live postings. Broadcast anti-join: O(corpus rewrite), which is
    what compaction already costs. Returns the number of purged docs."""
    n = cat.n_deletes()
    if n == 0:
        return 0
    dele = cat.deletes().persist()
    dele.count()
    _swap_rewrite(
        cat, "doc_meta",
        cat.doc_meta().join(F.broadcast(dele), "doc_int", "left_anti"),
        None,
    )
    _swap_rewrite(
        cat, "postings",
        cat.postings().join(F.broadcast(dele), "doc_int", "left_anti"),
        ["bucket"],
    )
    dele.unpersist()
    shutil.rmtree(cat.path("deletes"), ignore_errors=True)
    m = cat.read_manifest()
    m["n_deletes"] = 0
    m.setdefault("encodes", []).append({"type": "purge", "purged_docs": n})
    cat.write_manifest(m)
    _rewrite_live_stats(cat)
    return n
