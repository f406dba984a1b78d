"""Relational operators Spark lacks natively: the as-of (point-in-time)
join and the interval-overlap (range) join.

``asof_join`` matches every left row to the LATEST right row of the same
key with ``right.ts <= left.ts`` — the standard point-in-time lookup of
event pipelines (latest view before a purchase, latest price before a
trade, latest crawl before an annotation).  DuckDB ships this as
``ASOF JOIN``; Spark has no such operator, so this implements it as a
union + per-key ordered window with a carried last-non-null value:

    union(left tagged probe, right tagged build)
    -> window PARTITION BY key ORDER BY (ts, is_probe, id)
    -> last(build_payload, ignorenulls) over unbounded..current
    -> keep probe rows

Ordering build rows BEFORE probe rows at equal ts implements the
inclusive ``<=`` bound deterministically even under ts ties (which native
ASOF JOIN leaves unspecified); the id tiebreak makes the carried value a
total order, so the result is hash-stable at any parallelism.

100-TB plan: one shuffle on the key; window state is a single carried
struct per partition-ordered scan (Spark's WindowExec streams frames for
UNBOUNDED PRECEDING..CURRENT ROW running aggregates — no buffering of the
full key group).  Skewed keys degrade to one task per hot key like any
keyed window; for pathological hubs, pre-bucket by time range and run the
same window per (key, bucket) with per-bucket boundary carry — the same
two-phase trick as ingest.dense_ids (documented, not needed at gate
scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every row of ``left`` plus the payload columns of
    the latest ``right`` row with the same ``key`` and
    ``right_ts <= left_ts`` (null payload when no such row).  Payload
    columns are renamed with ``suffix``; ``right_ts`` itself is always
    carried as ``{right_ts}{suffix}``."""
    payload = list(payload or [])
    carry_cols = [right_ts] + [c for c in payload if c != right_ts]
    carried = F.struct(*[F.col(c) for c in carry_cols])

    probe = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_probe"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None).cast(
            right.select(carried).schema[0].dataType.simpleString()
        ).alias("_carry"),
    )
    build = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_probe"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]))
            .schema[0].dataType.simpleString()
        ).alias("_row"),
        carried.alias("_carry"),
    )
    # build rows sort before probe rows at equal ts -> inclusive <= bound;
    # _carry struct starts with ts then ids, so last() is a total order
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_probe", F.col("_carry"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        probe.unionByName(build)
        .withColumn("_m", F.last("_carry", ignorenulls=True).over(w))
        .filter(F.col("_probe") == 1)
    )
    out = matched.select(
        *[F.col("_row")[c].alias(c) for c in left.columns],
        *[
            F.col("_m")[c].alias(f"{c}{suffix}")
            for c in carry_cols
        ],
    )
    return out


def asof_purchase_view_sql(table: str = "events") -> str:
    """DuckDB twin of the purchase->latest-view gate, as the SAME
    deterministic window formulation (native ASOF JOIN leaves ts ties
    unspecified; this never does)."""
    return f"""
WITH u AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'view' THEN event_id END AS v_id,
         CASE WHEN event_type = 'view' THEN ts END AS v_ts
  FROM {table} WHERE event_type IN ('purchase', 'view')
),
m AS (
  SELECT *,
         last_value(v_id IGNORE NULLS) OVER w AS view_event_id,
         last_value(v_ts IGNORE NULLS) OVER w AS view_ts
  FROM u
  WINDOW w AS (
    PARTITION BY user_id
    ORDER BY ts, (event_type = 'purchase'), event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(view_event_id AS BIGINT) AS view_event_id,
       CAST(date_diff('microsecond', view_ts, ts) AS BIGINT) AS lag_us
FROM m WHERE event_type = 'purchase'
"""

# ---------------------------------------------------------------------------
# interval-overlap (range) join
# ---------------------------------------------------------------------------


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    key: str | None = None,
    l_suffix: str = "_l",
    r_suffix: str = "_r",
) -> DataFrame:
    """Inner join of every left/right row pair whose closed integer
    intervals ``[l_start, l_end]`` and ``[r_start, r_end]`` OVERLAP
    (optionally also requiring ``key`` equality) — the range join relational
    engines special-case and Spark would execute as a cartesian product
    with an inequality filter (BroadcastNestedLoopJoin: |L|x|R| — the
    scale-killer this operator exists to avoid).

    Plan: the classic bucket trick.  Both sides explode each interval to
    the width-``bucket_width`` time buckets it touches (via ``sequence``
    — JVM-side, no Python), the join is a pure EQUI-join on
    ``(key, bucket)``, and the overlap predicate plus the emit-once rule
    ``bucket == floor(greatest(l_start, r_start) / W)`` (the first bucket
    the pair SHARES) keep exactly one copy of every overlapping pair — no
    distinct needed afterwards.

    100-TB plan: shuffle is one hash exchange per side keyed on
    ``(key, bucket)``; cost scales with sum(interval_length)/W per side,
    tunable via ``bucket_width`` (pick ~ the median interval length so
    the blow-up factor stays ~2).  Hot buckets are just skewed join keys
    — AQE skew-join splits them; no single task ever needs more than one
    bucket's pairs.  Output columns keep their names, suffixed on clash.
    """
    # the equi key (if any) must keep its name on both sides
    clash = (set(left.columns) & set(right.columns)) - ({key} if key else set())
    lcols = [
        F.col(c).alias(f"{c}{l_suffix}" if c in clash else c)
        for c in left.columns
    ]
    rcols = [
        F.col(c).alias(f"{c}{r_suffix}" if c in clash else c)
        for c in right.columns
    ]
    w = int(bucket_width)

    def _bucket(c):  # exact for non-negative longs: (c - c % w) / w
        cc = c.cast("long")
        return ((cc - cc % w) / w).cast("long")

    ls, le = F.col(l_start).cast("long"), F.col(l_end).cast("long")
    rs, re_ = F.col(r_start).cast("long"), F.col(r_end).cast("long")

    lb = left.select(
        *lcols,
        F.explode(
            F.sequence(_bucket(ls), _bucket(le))
        ).alias("_bucket"),
        ls.alias("_ls"),
        le.alias("_le"),
    )
    rb = right.select(
        *rcols,
        F.explode(
            F.sequence(_bucket(rs), _bucket(re_))
        ).alias("_bucket"),
        rs.alias("_rs"),
        re_.alias("_re"),
    )
    on = ["_bucket"] + ([key] if key else [])
    j = lb.join(rb, on=on, how="inner").filter(
        (F.col("_ls") <= F.col("_re"))
        & (F.col("_rs") <= F.col("_le"))
        # emit-once: only the first shared bucket produces the pair
        & (F.col("_bucket") == _bucket(F.greatest("_ls", "_rs")))
    )
    return j.drop("_bucket", "_ls", "_le", "_rs", "_re")
