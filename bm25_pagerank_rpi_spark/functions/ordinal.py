"""Distributed dense ordinal assignment (no global single-partition sort).

Used by the batch index build (stage 1) and the streaming segment append
to mint ``doc_int`` ids in a stable order: range-partition on the order
key (range boundaries come from sampling), number rows per partition,
then add per-partition offsets computed from a tiny count pass. Every
step is parallel; the only driver-side data is one count per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ordinal(
    df: DataFrame,
    order_col: str,
    out_col: str = "doc_int",
    base: int = 0,
    npart: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Attach ``out_col`` = ``base`` + ordinal of ``order_col`` in ascending
    order. Returns ``(result, total_rows, pinned)`` — ``pinned`` is the
    persisted range-partitioned intermediate: the count job and the
    ordinal job MUST see the same (sampled) range boundaries, so the
    caller unpersists it only after materializing ``result``."""
    spark = df.sparkSession
    npart = npart or max(spark.sparkContext.defaultParallelism, 4)
    ranged = df.repartitionByRange(npart, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged.persist()
    counts = ranged.groupBy("_pid").count().collect()
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r._pid):
        offsets[r._pid] = acc
        acc += r["count"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            (F.lit(int(base)) + F.col("_offset") + F.col("_rn") - 1).cast("long"),
        )
        .drop("_pid", "_rn", "_offset")
    )
    return out, acc, ranged
