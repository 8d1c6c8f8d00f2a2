"""Specialized join operators Spark has no single built-in for.

The reference's gate admits DuckDB's full join surface including ASOF and
range joins (reference: src/iceberg_explorer/query/executor.py:107 admits any
SELECT; SURVEY §2B notes as-of join needs composition in Spark). Implemented
here as compositions of built-in DataFrame ops — no UDFs, fully Catalyst
optimizable:

- range join: non-equi predicate alongside an equi key, so Spark still plans
  a hash/sort-merge join on the equi part and evaluates the band predicate as
  a post-join filter (the scalable shape; a pure theta join would be BNLJ).
- as-of join: union + window. The classic scalable as-of algorithm:
  tag both sides, union, window per key ordered by time, carry the last left
  row forward with a running "last value" — one shuffle on the key, no
  per-row probing, linear in input. This is how a 100 TB as-of join should
  run; the naive correlated-subquery shape (the oracle) is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iceberg_explorer_spark.operators.registry import query
from iceberg_explorer_spark.sources.registry import load_table


@query(
    "range_join_ship_window",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE)) AS INTEGER) AS ship_delay_days
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    WHERE o.o_custkey < 200
    """,
    doc="Equi + range band join: hash join on the key, band predicate as a "
    "join condition — no BNLJ, scales linearly.",
)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    return li.join(o, cond).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("ship_delay_days"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tie_breaker: str | None = None,
) -> DataFrame:
    """Generic scalable as-of join: for each left row, attach the latest
    right row with ``right_time <= left_time`` for the same ``on`` key.

    Union-and-carry-forward: one shuffle on ``on``, one window sort —
    O(n log n) per key group vs the O(n·m) correlated-subquery formulation.
    ``tie_breaker`` orders simultaneous right rows (max wins).
    """
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_values]).alias("s"))
            .schema["s"]
            .dataType.simpleString()
        ).alias("_rvals"),
    )
    tb = F.col(tie_breaker) if tie_breaker else F.lit(0)
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType.simpleString()).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_values]).alias("_rvals"),
        tb.alias("_tb"),
    )
    lt = lt.withColumn("_tb", F.lit(None).cast(rt.schema["_tb"].dataType))

    # Order: time asc, right rows before left rows at equal time (<= semantics),
    # tie-breaker last-wins among simultaneous right rows.
    unioned = lt.unionByName(rt)
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_is_left"), F.col("_tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        "_asof", F.last(F.when(F.col("_is_left") == 0, F.col("_rvals")), True).over(w)
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        F.col("_lrow.*"), F.col("_asof").alias("_rmatch")
    )
    for c in right_values:
        out = out.withColumn(f"asof_{c}", F.col(f"_rmatch.{c}"))
    return out.drop("_rmatch")


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           CAST(EPOCH_US(p.ts) AS BIGINT) AS purchase_ts_us,
           CAST((
             SELECT MAX(EPOCH_US(c.ts)) FROM events c
             WHERE c.user_id = p.user_id
               AND c.event_type = 'click'
               AND c.ts <= p.ts
           ) AS BIGINT) AS last_click_ts_us
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="As-of join: latest prior click per purchase. Spark side is the "
    "union+window carry-forward algorithm (one shuffle, linear); the oracle "
    "is the quadratic correlated-subquery definition.",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .withColumn("click_ts_us", F.unix_micros("ts"))
        .select("user_id", "ts", "click_ts_us")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["click_ts_us"],
        tie_breaker="click_ts_us",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("asof_click_ts_us").alias("last_click_ts_us"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Explicit salted join for skewed keys — the manual fallback when AQE's
    skew-join split can't apply (the hot key lives in ONE shuffle partition
    of a shuffled-hash/sort-merge join and the other side is too large to
    broadcast).

    The big (skewed, probe) side gets a deterministic-per-row salt in
    [0, num_salts); the small (build) side is replicated num_salts times via
    a broadcast cross join. Joining on (key…, _salt) spreads each hot key
    over num_salts reducers while every original pair still meets exactly
    once, so the result multiset is identical to the unsalted join. Cost:
    the build side shuffles num_salts× its size — cheap exactly when salting
    is needed (small build side, huge skewed probe side).

    Only inner/left joins preserve semantics (the replicated side must not
    produce null-extended rows per replica); other types raise.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    spark = big.sparkSession
    # salt from the row's own join key + a physical tiebreaker: uniform
    # enough to spread a hot key, computable without any extra shuffle
    salt = F.pmod(
        F.hash(*[F.col(c) for c in on], F.monotonically_increasing_id()),
        F.lit(num_salts),
    )
    big_s = big.withColumn("_salt", salt)
    replicas = spark.range(num_salts).select(F.col("id").cast("int").alias("_salt"))
    small_s = small.crossJoin(F.broadcast(replicas))
    return big_s.join(small_s, on=[*on, "_salt"], how=how).drop("_salt")
