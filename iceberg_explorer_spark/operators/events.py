"""Event-stream analytics, batch form: tumbling/sliding/session windows and
JSON extraction over the events table.

These are the batch twins of the Structured Streaming operators in
``iceberg_explorer_spark.streaming`` — same semantics, expressed over a static
DataFrame so they are oracle-checkable. (The reference has no streaming at
all — SURVEY §2C; "streaming" there is HTTP chunking. These extend it per the
north star.)

Window starts are surfaced as epoch-microsecond BIGINTs: integer arithmetic
is engine- and timezone-independent, unlike raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iceberg_explorer_spark.functions.deterministic import sum_money
from iceberg_explorer_spark.operators.registry import query
from iceberg_explorer_spark.sources.registry import (
    load_table,
    repartition_for_compute,
)

FIVE_MIN_US = 300_000_000
TEN_MIN_US = 600_000_000


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT (EPOCH_US(ts) // {FIVE_MIN_US}) * {FIVE_MIN_US} AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 5-minute windows per event type — F.window() tumbling "
    "aggregation (epoch-aligned, same as the oracle's integer bucketing). "
    "Streaming twin: streaming/windows.py tumbling_counts.",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_money("value").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sliding_window",
    oracle=f"""
    SELECT ((EPOCH_US(ts) // {FIVE_MIN_US}) - k) * {FIVE_MIN_US} AS window_start_us,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events, (SELECT UNNEST(generate_series(0, 1)) AS k)
    GROUP BY 1
    """,
    doc="Sliding windows (10-minute width, 5-minute slide): each event lands "
    "in exactly width/slide = 2 windows. Spark's F.window(slideDuration=...) "
    "does the same expansion map-side.",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "n_users",
        )
    )


@query(
    "events_session_window",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > {TEN_MIN_US}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM seq
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(MIN(EPOCH_US(ts)) AS BIGINT) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_no
    """,
    doc="Sessionization (10-minute inactivity gap) via lag + running sum of "
    "session starts — the classic scalable sessionizer: one shuffle on "
    "user_id, linear per-user pass. Streaming twin uses session_window().",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    seq = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > TEN_MIN_US), 1).otherwise(0),
    )
    sess = seq.withColumn("session_no", F.sum("new_session").over(wrun).cast("bigint"))
    return sess.groupBy("user_id", "session_no").agg(
        F.min(F.unix_micros("ts")).cast("bigint").alias("session_start_us"),
        F.count(F.lit(1)).alias("n_events"),
        sum_money("value").alias("total_value"),
    )


@query(
    "events_json_extract",
    oracle="""
    WITH x AS (
      -- k counts ONLY as an integral JSON number (quoted or bare):
      -- anything else is "no value" on BOTH engines. Without the regexp
      -- gate the engines genuinely disagree on valid JSON: Spark's
      -- string->int cast truncates '1.5' to 1 where DuckDB's rounds to 2,
      -- and DuckDB hard-errors on 'abc' where Spark yields NULL. TRY_CAST,
      -- not CAST: an INT32-overflowing integral (e.g. 9999999999) passes
      -- the regexp gate, and DuckDB CAST would hard-error the whole query
      -- where Spark's non-ANSI cast yields NULL.
      SELECT event_type,
             CASE WHEN json_valid(props) AND regexp_matches(
                    json_extract_string(props, '$.k'), '^-?[0-9]+$')
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN k > 50 THEN 1 END) AS n_high
    FROM x
    GROUP BY event_type
    """,
    doc="Semi-structured extraction: JSON property pulled JVM-side "
    "(get_json_object) then aggregated — schema-on-read over a string "
    "column, no Python. The k contract is integral-JSON-number-or-NULL, "
    "enforced by the same regexp gate in both engines (engine casts "
    "disagree on fractional and non-numeric values).",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan the scan out before the per-row JSON parse: get_json_object over
    # every props string is the op's dominant cost and runs pre-shuffle
    # (interleaved 5-iter min at sf0.1: 0.59 s vs 1.19 s single-split);
    # no-op at real scale where the scan is already wide
    ev = repartition_for_compute(load_table(spark, sf_dir, "events"))
    ks = F.get_json_object("props", "$.k")
    k = F.when(ks.rlike("^-?[0-9]+$"), ks.cast("int"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )


@query(
    "events_rate_per_user_type",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(MIN(EPOCH_US(ts)) AS BIGINT) AS first_seen_us,
           CAST(MAX(EPOCH_US(ts)) AS BIGINT) AS last_seen_us
    FROM events GROUP BY user_id, event_type
    """,
    doc="Per-(user, type) activity profile — the wide-key aggregation shape "
    "used for per-entity feature extraction at scale.",
)
def events_rate_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        sum_money("value").alias("total_value"),
        F.min(F.unix_micros("ts")).cast("bigint").alias("first_seen_us"),
        F.max(F.unix_micros("ts")).cast("bigint").alias("last_seen_us"),
    )


@query(
    "events_distinct_users_salted",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    doc="Exact distinct count with a LOW-cardinality group key (5 event "
    "types → 5 reduce keys at any data size). Salting by a hash OF THE "
    "COUNTED COLUMN keeps the count exact: each user_id lands in exactly "
    "one of 32 salt buckets, so per-(type, salt) distinct counts sum to the "
    "true per-type count. Both shuffles spread over type×32 keys instead of "
    "funneling 100 TB of rows into 5 reducers. The salt never escapes the "
    "plan, so the oracle is the plain COUNT(DISTINCT).",
)
def events_distinct_users_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    salted = ev.select(
        "event_type",
        "user_id",
        F.pmod(F.xxhash64("user_id"), F.lit(32)).alias("salt"),
    )
    per_salt = salted.groupBy("event_type", "salt").agg(
        F.countDistinct("user_id").alias("nd")
    )
    return per_salt.groupBy("event_type").agg(F.sum("nd").alias("n_users"))


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, CAST(MIN(EPOCH_US(ts)) AS BIGINT) AS t_view_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, CAST(MIN(EPOCH_US(e.ts)) AS BIGINT) AS t_click_us
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND EPOCH_US(e.ts) >= v.t_view_us
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, CAST(MIN(EPOCH_US(e.ts)) AS BIGINT) AS t_purchase_us
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND EPOCH_US(e.ts) >= c.t_click_us
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view_us, c.t_click_us, p.t_purchase_us
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="Ordered conversion funnel (view → click → purchase): earliest "
    "qualifying timestamp per stage, each stage gated on the previous "
    "stage's time. Every join and aggregate keys on user_id, so the whole "
    "funnel reuses ONE hash partitioning — on a cluster the exchanges after "
    "the first are eliminated (ReusedExchange/co-partitioning), and at "
    "100 TB the events table bucketed by user_id runs the funnel with no "
    "shuffle at all.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )

    def stage(etype: str, gate: DataFrame | None, gate_col: str, out: str):
        src = ev.filter(F.col("event_type") == etype)
        if gate is not None:
            src = src.join(gate, "user_id").filter(
                F.col("t_us") >= F.col(gate_col)
            )
        return src.groupBy("user_id").agg(F.min("t_us").alias(out))

    v = stage("view", None, "", "t_view_us")
    c = stage("click", v, "t_view_us", "t_click_us")
    p = stage("purchase", c, "t_click_us", "t_purchase_us")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view_us", "t_click_us", "t_purchase_us")
    )


@query(
    "events_approx_distinct_hll",
    oracle=None,
    doc="HyperLogLog++ approximate distinct users per event type "
    "(approx_count_distinct, rsd=2%) — the 100 TB-scale companion to "
    "events_distinct_users_salted: sketches merge associatively, so the "
    "count is one map-side-combined shuffle of ~1.5 KB sketches per group "
    "instead of shuffling every (type, user) pair. No oracle: HLL estimates "
    "are sketch-implementation-specific, so DuckDB's approx_count_distinct "
    "would legitimately differ; the rows-only check pins shape, and the "
    "test suite bounds the estimate against the exact count.",
)
def events_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_variant_shred",
    oracle="""
    -- json_valid + integral-number gate: DuckDB's json casts hard-error
    -- on malformed JSON and non-numeric k (and round fractional k) where
    -- Spark's variant path NULLs (and coerces booleans) — the contract
    -- is integral-JSON-number-or-NULL, identical on both engines.
    -- TRY_CAST: an int64-overflowing integral (>19 digits) passes the
    -- regexp gate; DuckDB CAST would error, Spark try_variant_get NULLs.
    WITH x AS (
      SELECT event_id,
             CASE WHEN json_valid(props) AND regexp_matches(
                    json_extract_string(props, '$.k'), '^-?[0-9]+$')
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k
      FROM events
      WHERE event_id < 2000
    )
    SELECT event_id, k AS k_value, k % 10 AS k_bucket FROM x
    """,
    doc="VARIANT-typed semi-structured shredding (Spark 4): props is parsed "
    "once into a binary VARIANT column, then typed paths are extracted with "
    "variant_get — the open-format encoding that makes schema-on-read JSON "
    "columnar-fast (parse once, extract many, no per-access string "
    "re-parsing; at 100 TB parquet shreds frequently-read VARIANT paths "
    "into real columns). Oracle uses DuckDB's native JSON extraction — "
    "the semantics VARIANT must reproduce.",
)
def events_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    # try_parse_json: malformed props must yield NULL, not kill the job.
    # Parse ONCE into the variant, extract twice (string form for the
    # integral gate, bigint form for the value) — try_variant_get, since
    # plain variant_get throws on type-mismatched values, and the gate,
    # since the variant cast coerces booleans to 1 where the contract
    # (and DuckDB) say "no value".
    v = "try_parse_json(props)"
    k = F.expr(
        f"CASE WHEN try_variant_get({v}, '$.k', 'string')"
        f"          RLIKE '^-?[0-9]+$'"
        f"     THEN try_variant_get({v}, '$.k', 'bigint') END"
    )
    return ev.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_bucket"),
    )


@query(
    "events_hll_sketch_rollup",
    oracle=None,
    doc="Mergeable-sketch rollup (hll_sketch_agg / hll_union_agg): user_id "
    "sketches are built per (day, event_type) — the shape of a materialized "
    "daily pre-aggregate table — then re-merged per event_type and "
    "estimated. Sketch algebra is what makes distinct-count dashboards "
    "feasible at 100 TB: the expensive pass over raw events happens once a "
    "day over new data only, and every later rollup merges kilobyte "
    "sketches instead of re-scanning history. No oracle (DataSketches "
    "binary format is Spark-specific); the test bounds estimates against "
    "exact counts.",
)
def events_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_daily_sketches"),
    )


#: MAD multiplier for the robust outlier fence
MAD_K = 3


@query(
    "events_value_outliers_mad",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(v_c, 0.5) AS med_c
      FROM v GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, v.v_c, m.med_c, ABS(v.v_c - m.med_c) AS adev
      FROM v JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad_c
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           ANY_VALUE(d.med_c) AS median_cents,
           ANY_VALUE(m.mad_c) AS mad_cents,
           COUNT(*) FILTER (WHERE d.adev > {MAD_K} * m.mad_c) AS n_outliers,
           COUNT(*) FILTER (WHERE d.adev > {MAD_K} * m.mad_c) * 1.0 / COUNT(*)
             AS outlier_rate
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier detection per event type: median / median-absolute-"
    "deviation fence (|v - median| > 3·MAD) — the rank-based filter that "
    "survives the heavy-tailed value distributions where mean/stddev fences "
    "drown. Values are quantized to integer cents FIRST, so every exact "
    "median is a dyadic rational that both engines represent exactly — the "
    "flag comparison is deterministic where raw-double percentiles are "
    "ulp-fragile. Plan: two grouped exact percentiles with the tiny "
    "per-type tables broadcast back onto the corpus. Exact percentile "
    "buffers each group's values, so at 100 TB swap both quantiles for "
    "approx_percentile (mergeable t-digest sketches, same plan shape) — "
    "here groups are few and exactness is what the oracle checks.",
)
def events_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
    )
    med = v.groupBy("event_type").agg(
        F.expr("percentile(v_c, 0.5)").alias("med_c")
    )
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v_c") - F.col("med_c"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_c")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = F.col("adev") > MAD_K * F.col("mad_c")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.first("med_c").alias("median_cents"),
        F.first("mad_c").alias("mad_cents"),
        F.count(F.when(is_out, 1)).alias("n_outliers"),
        (F.count(F.when(is_out, 1)) * 1.0 / F.count(F.lit(1))).alias(
            "outlier_rate"
        ),
    )


DAY_US = 86_400_000_000


@query(
    "events_user_retention",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, EPOCH_US(ts) // {DAY_US} AS day_num
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(day_num) AS cohort_day FROM ud GROUP BY user_id
    )
    SELECT c.cohort_day AS cohort_day,
           ud.day_num - c.cohort_day AS day_offset,
           COUNT(*) AS n_users
    FROM ud JOIN cohort c ON ud.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users grouped by first-active day, counted "
    "on each later active day (the classic growth-analytics triangle; at "
    "training-pipeline scale the same shape tracks crawl-source freshness). "
    "Days are tz-free integer day numbers (epoch_us DIV 86400e6) so every "
    "engine buckets identically. Plan: per-(user, day) distinct partially "
    "aggregates map-side, the cohort day comes back as a WINDOW MIN over "
    "user_id on the already-(user,day)-clustered frame — no self-join, no "
    "broadcast of an O(users) table (users is the BIG dimension at scale) — "
    "then one final (cohort, offset) aggregation. Each (user, day) row is "
    "unique, so COUNT(*) per (cohort, offset) IS the distinct-user count.",
)
def events_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            # integer DIV, not double / + cast: double rounding at a day
            # boundary could bucket an event into the next day
            F.expr(f"unix_micros(ts) DIV {DAY_US}").alias("day_num"),
        )
        .distinct()
    )
    cohort_day = F.min("day_num").over(W.partitionBy("user_id"))
    return (
        ud.select(
            "user_id",
            "day_num",
            cohort_day.alias("cohort_day"),
        )
        .groupBy(
            "cohort_day",
            (F.col("day_num") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_resample_gapfill",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             EPOCH_US(ts) // {FIVE_MIN_US} AS bucket,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    obs AS (
      SELECT event_type, bucket,
             COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM b GROUP BY event_type, bucket
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM b GROUP BY event_type
    ),
    spine AS (
      SELECT event_type, lo + UNNEST(range(hi - lo + 1)) AS bucket
      FROM bounds
    )
    SELECT s.event_type,
           s.bucket * {FIVE_MIN_US} AS bucket_start_us,
           COALESCE(o.n, 0) AS n_events,
           last_value(o.total_cents IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_total_cents
    FROM spine s LEFT JOIN obs o
      ON s.event_type IS NOT DISTINCT FROM o.event_type
     AND s.bucket = o.bucket
    """,
    doc="Time-series resample with gap fill — the TimescaleDB/QuestDB "
    "time_bucket_gapfill + locf shape, via the LEAD idiom instead of a "
    "spine join: each observed bucket emits itself plus every empty bucket "
    "up to (not including) the NEXT observation, carrying its running "
    "total — so the forward fill is free by construction and the dense "
    "grid never exists as a join table. The oracle states the equivalent "
    "declarative spine + last_value(IGNORE NULLS) formulation. Money stays "
    "integer cents so fill values are exact. Plan: ONE corpus scan, one "
    "partial-aggregated shuffle to O(types × buckets), one tiny window "
    "shuffle on that frame, ZERO joins — at 100 TB the cost is the corpus "
    "aggregation; spine density costs only output rows.",
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.expr(f"unix_micros(ts) DIV {FIVE_MIN_US}").alias("bucket"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    obs = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    wl = W.partitionBy("event_type").orderBy("bucket")
    # locf carries the last NON-NULL total: a bucket observed with only
    # NULL-value events is "no observation of value" and inherits the
    # previous fill, exactly the oracle's last_value(IGNORE NULLS). The
    # NULL event_type is a real series of its own on both sides (the
    # oracle's spine join is IS NOT DISTINCT FROM; Spark's window
    # partitioning groups NULLs natively).
    carry = F.last("total_cents", ignorenulls=True).over(
        wl.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = (
        obs.withColumn("nxt", F.lead("bucket").over(wl))
        .withColumn("carry_cents", carry)
        .select(
            "event_type",
            "n",
            "carry_cents",
            F.col("bucket").alias("obs_bucket"),
            F.explode(
                F.sequence(
                    "bucket",
                    F.coalesce(F.col("nxt") - 1, F.col("bucket")),
                )
            ).alias("bucket"),
        )
    )
    return filled.select(
        "event_type",
        (F.col("bucket") * FIVE_MIN_US).alias("bucket_start_us"),
        F.when(F.col("bucket") == F.col("obs_bucket"), F.col("n"))
        .otherwise(0)
        .alias("n_events"),
        F.col("carry_cents").alias("filled_total_cents"),
    )


@query(
    "events_markov_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type) AS p_transition
    FROM c
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next_type | type) from consecutive event pairs — the "
    "user-journey / session-model statistic (and the event-stream "
    "analogue of BPE pair counting). One shuffle partitions each user's "
    "history for the LEAD, then the bigram counts collapse to an "
    "O(types²) matrix — 25 rows at ANY corpus size, so the probability "
    "normalization window is free. The division is exact-integer n over "
    "exact-integer row sums, bit-identical across engines.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(wl).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = W.partitionBy("event_type")
    return c.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt)).alias(
            "p_transition"
        ),
    )


@query(
    "events_dau_wau_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT EPOCH_US(ts) // {DAY_US} AS day_num, user_id
      FROM events
    ),
    dau AS (
      SELECT day_num, COUNT(*) AS dau FROM ud GROUP BY day_num
    ),
    wau AS (
      SELECT a.day_num,
             COUNT(DISTINCT b.user_id) AS wau
      FROM dau a JOIN ud b
        ON b.day_num BETWEEN a.day_num - 6 AND a.day_num
      GROUP BY a.day_num
    )
    SELECT d.day_num, d.dau, w.wau,
           d.dau * 1.0 / w.wau AS stickiness
    FROM dau d JOIN wau w ON d.day_num = w.day_num
    """,
    doc="DAU / trailing-7-day WAU / stickiness per day — the growth-"
    "analytics staple. The Spark side avoids the oracle's range self-join "
    "entirely: per-(day, user) distinct rows expand to the ≤7 trailing "
    "days each user-day CONTRIBUTES to (a constant ≤7× map-side sequence "
    "explode — same trick as the sliding window), then one exact distinct "
    "per day. All counts are exact integers; stickiness is their ratio. "
    "Plan: (day, user) distinct shuffle, then the contribution explode is "
    "narrow and the per-day distinct partial-aggregates — no join, no "
    "range condition, scale-independent of the day-span.",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            F.expr(f"unix_micros(ts) DIV {DAY_US}").alias("day_num"),
            "user_id",
        )
        .distinct()
    )
    dau = ud.groupBy("day_num").agg(F.count(F.lit(1)).alias("dau"))
    # each (day, user) contributes to windows ending on day..day+6; clamp
    # to observed days via the semi join against dau's day list (tiny)
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day_num"), F.col("day_num") + 6)
        ).alias("day_num"),
    )
    wau = (
        contrib.join(F.broadcast(dau.select("day_num")), "day_num", "left_semi")
        .groupBy("day_num")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day_num")
        .select(
            "day_num",
            "dau",
            "wau",
            (F.col("dau") * 1.0 / F.col("wau")).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
def _funnel_latency_oracle() -> str:
    """CTE-wrap the ALREADY-REGISTERED funnel oracle — one source of truth
    for the stage gating semantics."""
    from iceberg_explorer_spark.operators.registry import QUERIES as _Q

    funnel = _Q["events_funnel"].oracle
    return f"""
    WITH funnel AS ({funnel}),
    agg AS (
      SELECT COUNT(*) AS n_view,
             COUNT(t_click_us) AS n_click,
             COUNT(t_purchase_us) AS n_purchase,
             CAST(MIN(t_click_us - t_view_us) AS BIGINT) AS min1,
             CAST(SUM(t_click_us - t_view_us) AS BIGINT) AS sum1,
             CAST(MAX(t_click_us - t_view_us) AS BIGINT) AS max1,
             CAST(MIN(t_purchase_us - t_click_us) AS BIGINT) AS min2,
             CAST(SUM(t_purchase_us - t_click_us) AS BIGINT) AS sum2,
             CAST(MAX(t_purchase_us - t_click_us) AS BIGINT) AS max2
      FROM funnel
    )
    SELECT 'view->click' AS stage,
           n_view AS n_entered, n_click AS n_converted,
           CASE WHEN n_view = 0 THEN NULL
                ELSE CAST(n_click AS DOUBLE) / n_view END AS conv_rate,
           min1 AS min_us,
           CASE WHEN n_click = 0 THEN NULL
                ELSE CAST(sum1 AS DOUBLE) / n_click END AS avg_us,
           max1 AS max_us
    FROM agg
    UNION ALL
    SELECT 'click->purchase',
           n_click, n_purchase,
           CASE WHEN n_click = 0 THEN NULL
                ELSE CAST(n_purchase AS DOUBLE) / n_click END,
           min2,
           CASE WHEN n_purchase = 0 THEN NULL
                ELSE CAST(sum2 AS DOUBLE) / n_purchase END,
           max2
    FROM agg
    """


@query(
    "events_funnel_latency",
    oracle=_funnel_latency_oracle(),
    doc="Funnel latency report: per stage transition, how many users "
    "entered, how many converted, and the min/avg/max time-to-convert — "
    "the numbers a growth team actually reads off a funnel (conversion "
    "alone hides WHERE users stall). Composes events_funnel's exact "
    "per-user stage times (builder and oracle text both), then collapses "
    "them in ONE aggregation pass: all six stage statistics are computed "
    "in a single global agg (partial map-side), and the two report rows "
    "come from unpivoting that 1-row frame — the funnel is never "
    "recomputed per stage. Determinism: time deltas are exact BIGINT "
    "micros; averages divide an exact integer sum by an exact count.",
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_explorer_spark.operators.registry import QUERIES as _Q

    return _funnel_latency_report(_Q["events_funnel"].builder(spark, sf_dir))


def _funnel_latency_report(funnel: DataFrame) -> DataFrame:
    """The one-pass agg + unpivot behind events_funnel_latency, split out so
    the empty-funnel edge (all denominators 0 → NULL rates, never NaN) is
    directly testable (tests/test_properties.py)."""
    d1 = F.col("t_click_us") - F.col("t_view_us")
    d2 = F.col("t_purchase_us") - F.col("t_click_us")
    agg = funnel.agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("t_click_us").alias("n_click"),
        F.count("t_purchase_us").alias("n_purchase"),
        F.min(d1).alias("min1"),
        F.sum(d1).alias("sum1"),
        F.max(d1).alias("max1"),
        F.min(d2).alias("min2"),
        F.sum(d2).alias("sum2"),
        F.max(d2).alias("max2"),
    )
    # CAST(... AS DOUBLE) — Spark SQL's bare 1.0 literal is DECIMAL, which
    # would surface decimal ratio columns and break the double contract.
    # Every division is zero-guarded to NULL in BOTH engines: on an empty
    # funnel Spark's integer division yields NULL but DuckDB's IEEE double
    # division yields NaN — a latent oracle divergence without the guard
    # (ADVICE r5).
    return agg.selectExpr(
        "stack(2,"
        " 'view->click', n_view, n_click,"
        "   CASE WHEN n_view = 0 THEN NULL"
        "        ELSE CAST(n_click AS DOUBLE) / n_view END,"
        "   min1,"
        "   CASE WHEN n_click = 0 THEN NULL"
        "        ELSE CAST(sum1 AS DOUBLE) / n_click END,"
        "   max1,"
        " 'click->purchase', n_click, n_purchase,"
        "   CASE WHEN n_click = 0 THEN NULL"
        "        ELSE CAST(n_purchase AS DOUBLE) / n_click END,"
        "   min2,"
        "   CASE WHEN n_purchase = 0 THEN NULL"
        "        ELSE CAST(sum2 AS DOUBLE) / n_purchase END,"
        "   max2"
        ") AS (stage, n_entered, n_converted, conv_rate,"
        "      min_us, avg_us, max_us)"
    )


# ---------------------------------------------------------------------------
#: how many top user-journey paths the report returns
PATH_TOP_K = 20


@query(
    "events_path_topk",
    oracle=f"""
    WITH o AS (
      SELECT event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WHERE event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           COUNT(*) AS n_occurrences
    FROM o WHERE e3 IS NOT NULL
    GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT {PATH_TOP_K}
    """,
    doc="User-journey path mining: the corpus's most common length-3 "
    "event-type sequences (sliding window per user, ordered by ts with "
    "event_id tie-break) — the sequential-pattern sibling of the Markov "
    "transition matrix (which only sees pairs). Scale shape: the LEAD "
    "window partitions on high-cardinality user_id (bounded per-user "
    "groups, spread over the cluster), path counts partial-aggregate "
    "map-side onto the O(event_types^3) key space, and the final top-k "
    "is TakeOrderedAndProject (per-partition heaps), never a global "
    "sort. Counts exact; ordering tie-broken by path string.",
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL event types are dropped BEFORE the window in both engines:
    # Spark's concat_ws would silently skip a NULL segment (phantom
    # 2-step paths) while the oracle's || null-propagates — filtering is
    # the one semantics both express identically
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .filter(F.col("event_type").isNotNull())
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        o.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(PATH_TOP_K)
    )


# ---------------------------------------------------------------------------
#: per-mille-of-a-million grid for categorical share quantization
DRIFT_SHARE_SCALE = 1_000_000


@query(
    "events_categorical_drift",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE event_id % 2 = 0) AS n_a,
             COUNT(*) FILTER (WHERE event_id % 2 = 1) AS n_b
      FROM events GROUP BY event_type
    ),
    w AS (
      SELECT event_type, n_a, n_b,
             CAST(SUM(n_a) OVER () AS BIGINT) AS total_a,
             CAST(SUM(n_b) OVER () AS BIGINT) AS total_b
      FROM c
    )
    SELECT event_type, n_a, n_b,
           CAST(ROUND(n_a * {DRIFT_SHARE_SCALE} * 1.0 / total_a)
             AS BIGINT) AS share_a_micro,
           CAST(ROUND(n_b * {DRIFT_SHARE_SCALE} * 1.0 / total_b)
             AS BIGINT) AS share_b_micro,
           CAST(ABS(ROUND(n_a * {DRIFT_SHARE_SCALE} * 1.0 / total_a)
                    - ROUND(n_b * {DRIFT_SHARE_SCALE} * 1.0 / total_b))
             AS BIGINT) AS abs_shift_micro
    FROM w
    """,
    doc="Categorical distribution-shift monitor — the event-type sibling "
    "of similarity_centroid_drift (numeric): per-type share of two "
    "hash-split ingest batches and the absolute share shift, in integer "
    "micro-units. Summing abs_shift_micro/2 gives total-variation "
    "distance; keeping the per-type rows (rather than one TVD scalar) "
    "both names WHICH categories moved and keeps every output an exact "
    "integer — each share is ONE division of exact counts rounded onto "
    "the micro-grid, so no cross-row float sum exists anywhere. A type "
    "present in only ONE batch still gets a row (count 0, share 0 on "
    "the missing side) — appearing/vanishing categories are the "
    "strongest shift signal and the earlier inner-join formulation was "
    "blind to them. Plan shape: ONE scan and ONE (event_type) partial-"
    "aggregated shuffle with conditional counts (no per-batch self-"
    "join), then batch totals via an unpartitioned window over the O(types) frame (the tiny-frame window idiom).",
)
def events_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("event_id") % 2 == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("event_id") % 2 == 1, 1)).alias("n_b"),
    )
    # batch totals via an unpartitioned window over the O(types) aggregate
    # (the tiny-frame window idiom, like the novelty curve) — a second
    # aggregate subtree would re-plan the corpus scan
    wt = W.partitionBy()
    withtot = c.select(
        "event_type",
        "n_a",
        "n_b",
        F.sum("n_a").over(wt).cast("bigint").alias("total_a"),
        F.sum("n_b").over(wt).cast("bigint").alias("total_b"),
    )
    share_a = F.round(
        F.col("n_a") * DRIFT_SHARE_SCALE * 1.0 / F.col("total_a")
    ).cast("bigint")
    share_b = F.round(
        F.col("n_b") * DRIFT_SHARE_SCALE * 1.0 / F.col("total_b")
    ).cast("bigint")
    return withtot.select(
        "event_type",
        "n_a",
        "n_b",
        share_a.alias("share_a_micro"),
        share_b.alias("share_b_micro"),
        F.abs(share_a - share_b).cast("bigint").alias("abs_shift_micro"),
    )


# ---------------------------------------------------------------------------
@query(
    "events_incremental_rollup",
    oracle="""
    WITH hist AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v,
             CAST(MAX(EPOCH_US(ts)) AS BIGINT) AS last_us
      FROM events WHERE event_id % 8 <> 7 GROUP BY event_type
    ),
    delta AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v,
             CAST(MAX(EPOCH_US(ts)) AS BIGINT) AS last_us
      FROM events WHERE event_id % 8 = 7 GROUP BY event_type
    )
    SELECT COALESCE(h.event_type, d.event_type) AS event_type,
           CAST(COALESCE(h.n, 0) + COALESCE(d.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(h.v, 0) + COALESCE(d.v, 0) AS DOUBLE) AS total_value,
           GREATEST(COALESCE(h.last_us, 0), COALESCE(d.last_us, 0))
             AS last_seen_us
    FROM hist h FULL OUTER JOIN delta d
      ON h.event_type IS NOT DISTINCT FROM d.event_type
    """,
    doc="Incremental materialized-view maintenance: the per-type rollup is "
    "kept as a mergeable state (count, exact-decimal sum, max) and a new "
    "ingest batch's delta aggregate MERGES into the history aggregate "
    "with +/GREATEST — never a re-scan of history. This is the shape "
    "that turns a 100 TB daily rollup from an O(corpus) recompute into "
    "an O(day) job: both sides aggregate independently (partial "
    "map-side), the merge is a full outer join on the O(types) key, and "
    "because every state component is commutative-associative (count, "
    "decimal sum, max) the merged result is bit-identical to the full "
    "recompute — which is exactly what the oracle-equivalence check "
    "proves, since tests also pin merged == events_rate-style full "
    "aggregate semantics. The 7:1 hash split stands in for "
    "history vs today's ingest.",
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_explorer_spark.functions.deterministic import dec

    ev = load_table(spark, sf_dir, "events")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("decimal(18,2)").alias("v"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("last_us"),
        )

    hist = rollup(ev.filter(F.col("event_id") % 8 != 7))
    delta = rollup(ev.filter(F.col("event_id") % 8 == 7))
    h, d = hist.alias("h"), delta.alias("d")
    # eqNullSafe: a NULL event_type must merge into ONE row like the full
    # recompute's groupBy does — a plain equi-join would emit two
    return h.join(
        d,
        F.col("h.event_type").eqNullSafe(F.col("d.event_type")),
        "full_outer",
    ).select(
        F.coalesce(F.col("h.event_type"), F.col("d.event_type")).alias(
            "event_type"
        ),
        (
            F.coalesce(F.col("h.n"), F.lit(0))
            + F.coalesce(F.col("d.n"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_events"),
        (
            F.coalesce(F.col("h.v"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("d.v"), F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("total_value"),
        F.greatest(
            F.coalesce(F.col("h.last_us"), F.lit(0)),
            F.coalesce(F.col("d.last_us"), F.lit(0)),
        ).alias("last_seen_us"),
    )


# ---------------------------------------------------------------------------
#: Rate-spike detection grid: hourly buckets, |z| >= Z_SPIKE flags a spike.
HOUR_US = 3_600_000_000
Z_SPIKE = 2.0


@query(
    "events_rate_spike_zscore",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             (EPOCH_US(ts) // {HOUR_US}) * {HOUR_US} AS bucket_us,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n_buckets,
             CAST(SUM(n_events) AS BIGINT) AS sum_c,
             CAST(SUM(n_events * n_events) AS BIGINT) AS sum_c2
      FROM b GROUP BY event_type
    ),
    z AS (
      SELECT b.event_type, b.bucket_us, b.n_events,
             s.sum_c * 1.0 / s.n_buckets AS mean_rate,
             CASE WHEN s.sum_c2 * 1.0 / s.n_buckets
                       - (s.sum_c * 1.0 / s.n_buckets)
                         * (s.sum_c * 1.0 / s.n_buckets) > 0
                  THEN (b.n_events - s.sum_c * 1.0 / s.n_buckets)
                       / sqrt(s.sum_c2 * 1.0 / s.n_buckets
                              - (s.sum_c * 1.0 / s.n_buckets)
                                * (s.sum_c * 1.0 / s.n_buckets))
             END AS z
      FROM b JOIN s ON b.event_type IS NOT DISTINCT FROM s.event_type
    )
    SELECT event_type, bucket_us, n_events, mean_rate, z,
           CASE WHEN z >= {Z_SPIKE} OR z <= -{Z_SPIKE}
                THEN TRUE ELSE FALSE END AS is_spike
    FROM z
    """,
    doc="Volume-anomaly monitoring: hourly event counts per type, z-scored "
    "against that type's own bucket distribution — the ops-monitoring twin "
    "of events_value_outliers_mad (which scores VALUES; this scores RATES: "
    "traffic spikes, outages, bot bursts). Bucketing is exact-integer on "
    "both engines — Spark `unix_micros(ts) DIV hour` vs DuckDB "
    "`EPOCH_US(ts) // hour`, both truncate toward zero (verified on "
    "negative operands), so pre-epoch timestamps bucket identically and "
    "no FP division appears anywhere in the key. Determinism discipline: the "
    "per-type moments are EXACT BIGINT sums (Σc, Σc², bucket count) — "
    "order-independent however the buckets shuffle — and mean/variance/z "
    "are derived from those three integers with the same literal "
    "double-arithmetic expression on both engines, so z is bit-identical. "
    "Variance guarded > 0 (all-equal buckets → z NULL, not NaN/÷0). NULL "
    "event types join with IS NOT DISTINCT FROM (a NULL type is a real "
    "series). Scale: two partial-aggregated shuffles (type×hour, then "
    "type) + an O(types) stats join — the stats side is broadcast-size at "
    "any corpus scale but NOT hinted (AQE decides from measured size). "
    "reference: no analogue — training-pipeline extension.",
)
def events_rate_spike_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        (F.expr(f"unix_micros(ts) DIV {HOUR_US}") * HOUR_US).alias(
            "bucket_us"
        ),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    s = b.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n_events").cast("bigint").alias("sum_c"),
        F.sum(F.col("n_events") * F.col("n_events"))
        .cast("bigint")
        .alias("sum_c2"),
    )
    mean = F.col("sum_c") * 1.0 / F.col("n_buckets")
    var = F.col("sum_c2") * 1.0 / F.col("n_buckets") - mean * mean
    z = F.when(var > 0, (F.col("n_events") - mean) / F.sqrt(var))
    joined = b.join(s, b["event_type"].eqNullSafe(s["et"])).select(
        b["event_type"],
        "bucket_us",
        "n_events",
        mean.alias("mean_rate"),
        z.alias("z"),
    )
    return joined.withColumn(
        "is_spike",
        F.when(
            (F.col("z") >= Z_SPIKE) | (F.col("z") <= -Z_SPIKE), F.lit(True)
        ).otherwise(F.lit(False)),
    )


@query(
    "events_scd2_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             -- the first-row clause probes a NEVER-NULL column: for a
             -- user whose FIRST event is NULL-typed, LAG(event_type)
             -- IS DISTINCT FROM event_type is FALSE (NULL vs NULL), and
             -- without it the user's leading NULL run would silently
             -- vanish from the history (r15 generative-test find — the
             -- oracle encoded the same flaw, so the differential gate
             -- could not see it)
             CASE WHEN LAG(event_id) OVER w IS NULL
                       OR LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS new_run,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_user
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    starts AS (SELECT * FROM seq WHERE new_run = 1)
    SELECT user_id, event_type,
           CAST(EPOCH_US(ts) AS BIGINT) AS valid_from_us,
           CAST(EPOCH_US(LEAD(ts) OVER w2) AS BIGINT) AS valid_to_us,
           CAST(COALESCE(LEAD(rn) OVER w2, n_user + 1) - rn AS BIGINT)
             AS n_events,
           LEAD(rn) OVER w2 IS NULL AS is_current
    FROM starts
    WINDOW w2 AS (PARTITION BY user_id ORDER BY rn)
    """,
    doc="SCD2 interval compaction (r15) — the warehouse type-2 history "
    "build from an append-only event log: each user's consecutive runs "
    "of one event_type collapse to a half-open validity interval "
    "[valid_from, valid_to) with valid_to = the NEXT change's start and "
    "NULL marking the current state, plus the run's event count — the "
    "CDC merge pattern every dimension pipeline runs nightly. Run "
    "detection is the lag-vs-self flip flag (IS DISTINCT FROM "
    "semantics: NULL-typed runs collapse like any other, pinned); the "
    "compaction is a BOUNDARY-ROW FILTER, not a run-keyed groupBy — "
    "interval ends and event counts come from lead() over the "
    "already-partitioned change rows (counts by row-number arithmetic, "
    "the last run closed by the per-user total), so the op costs "
    "exactly ONE shuffle on user_id serving every window pass, and the "
    "second window sorts |changes| rows, not |events|. Determinism: "
    "(ts, event_id) total order; epoch-micro BIGINT interval bounds. "
    "At 100 TB: per-user partitions are bounded by user activity "
    "(no corpus-wide window), the output is change-compressed "
    "(|intervals| << |events|), and the plan incrementalizes by "
    "unioning each touched user's OPEN interval (as a pseudo-event at "
    "valid_from carrying its n_events as a weight — counts must sum "
    "weights there, not rows) with the new day and re-compacting only "
    "those users. reference: no analogue — "
    "training-pipeline extension (the warehouse-modeling face of the "
    "events family).",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wp = W.partitionBy("user_id")
    seq = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn(
            "new_run",
            # lag(event_id) NULL == "no previous row": the first event
            # is ALWAYS a run start, even when its type is NULL and the
            # type-vs-lag null-safe comparison alone would say "same
            # run as the (nonexistent) predecessor" (r15 generative
            # find; the session operator's LAG(ts) IS NULL clause is
            # the same idiom)
            F.when(
                F.lag("event_id").over(w).isNull()
                | ~F.col("event_type").eqNullSafe(
                    F.lag("event_type").over(w)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .withColumn("n_user", F.count(F.lit(1)).over(wp))
    )
    starts = seq.filter(F.col("new_run") == 1)
    w2 = W.partitionBy("user_id").orderBy("rn")
    return starts.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").cast("bigint").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w2))
        .cast("bigint")
        .alias("valid_to_us"),
        (
            F.coalesce(F.lead("rn").over(w2), F.col("n_user") + 1)
            - F.col("rn")
        )
        .cast("bigint")
        .alias("n_events"),
        F.lead("rn").over(w2).isNull().alias("is_current"),
    )


#: Watermark candidates audited by the lateness report, in microseconds:
#: "how many events would withWatermark('1 minute' / '1 hour') drop".
WM_1M_US = 60_000_000
WM_1H_US = 3_600_000_000


@query(
    "events_watermark_lateness_audit",
    oracle=f"""
    WITH l AS (
      SELECT event_type,
             CASE WHEN MAX(EPOCH_US(ts)) OVER w IS NULL THEN 0
                  ELSE GREATEST(MAX(EPOCH_US(ts)) OVER w - EPOCH_US(ts), 0)
             END AS late_us
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(MAX(late_us) AS BIGINT) AS max_lateness_us,
           CAST(SUM(late_us) AS DOUBLE) / (1000000.0 * COUNT(*))
             AS avg_lateness_sec,
           CAST(SUM(CASE WHEN late_us > {WM_1M_US} THEN 1 ELSE 0 END)
             AS BIGINT) AS dropped_wm_1m,
           CAST(SUM(CASE WHEN late_us > {WM_1H_US} THEN 1 ELSE 0 END)
             AS BIGINT) AS dropped_wm_1h
    FROM l GROUP BY event_type
    """,
    doc="Watermark lateness audit (r16) — the batch answer to the ONE "
    "question every Structured Streaming deployment must answer before "
    "setting withWatermark: how out-of-order does each event stream "
    "actually arrive, and what would a given delay threshold DROP? "
    "Arrival order is the append log's event_id (the ingest sequence); "
    "an event's lateness is how far its OWN stream's event-time "
    "high-watermark — max event time over STRICTLY EARLIER arrivals — "
    "had already passed it, clamped at 0 for in-order arrivals (the "
    "first arrival per type is 0 by the NULL-frame case, never NULL). "
    "Per type the audit reports the out-of-order count, max and mean "
    "lateness, and the events a 1-minute / 1-hour watermark would "
    "discard (lateness > delay is Spark's drop rule verbatim). "
    "Honesty about scope: Spark tracks ONE GLOBAL watermark per query, "
    "not one per type — so these drop counts are EXACT for a query "
    "consuming that type's stream alone (the per-source-job layout), "
    "and a LOWER BOUND for a mixed query, where another type's "
    "arrivals can only advance the watermark further; the global "
    "audit is this plan with the partition key removed, and the "
    "per-type decomposition is precisely what tells you WHICH stream "
    "forces the mixed query's delay. The bound is EXECUTED, not just "
    "stated (r17): the claims test runs the global-watermark form on "
    "the crafted log + every generative seed and asserts per-event "
    "lateness domination and per-type drop-count domination, with a "
    "crafted in-order stream the global watermark drops at 1m "
    "(tests/test_properties.py, _global_watermark_audit). "
    "Determinism: epoch-micro BIGINT "
    "lateness, exact integer counts, the one mean divided last; "
    "event_id is unique so the arrival order is total. Plan: exactly "
    "ONE shuffle — the running-max window hash-partitions on "
    "event_type and the groupBy reuses that distribution "
    "(partial+final HashAggregate directly over the Window output, no "
    "second exchange), with the scan pruned to the three columns "
    "read. At 100 TB arrival streams are per ingest partition, so the "
    "audit keys on (event_type) here and (source partition) there — "
    "same single-exchange shape, partitions bounded by a day's "
    "arrivals, no global order anywhere. reference: no analogue — "
    "training-pipeline extension (the measurement face of "
    "streaming/dedup.py's watermark contracts).",
)
def events_watermark_lateness_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max = F.max(F.unix_micros("ts")).over(w)
    late = F.when(prev_max.isNull(), F.lit(0)).otherwise(
        F.greatest(prev_max - F.unix_micros("ts"), F.lit(0))
    )
    l = ev.select("event_type", late.alias("late_us"))
    return l.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_out_of_order"),
        F.max("late_us").cast("bigint").alias("max_lateness_us"),
        (
            F.sum("late_us").cast("double")
            / (F.lit(1_000_000.0) * F.count(F.lit(1)))
        ).alias("avg_lateness_sec"),
        F.sum(F.when(F.col("late_us") > WM_1M_US, 1).otherwise(0))
        .cast("bigint")
        .alias("dropped_wm_1m"),
        F.sum(F.when(F.col("late_us") > WM_1H_US, 1).otherwise(0))
        .cast("bigint")
        .alias("dropped_wm_1h"),
    )


#: The watermark-delay calibration grid, in whole seconds. Rung 0 is
#: the STRUCTURAL anchor: a zero watermark drops exactly the
#: out-of-order events (n_dropped == the audit's summed
#: n_out_of_order — the cross-operator identity the claims test
#: executes); 60 and 3600 coincide with the audit's two fixed
#: thresholds, so the sweep and the audit must agree rung-for-rung.
WM_SWEEP_DELAYS_SEC = (0, 10, 60, 600, 3600)


@query(
    "events_watermark_delay_sweep",
    oracle=f"""
    WITH l AS (
      SELECT event_type,
             CASE WHEN MAX(EPOCH_US(ts)) OVER w IS NULL THEN 0
                  ELSE GREATEST(MAX(EPOCH_US(ts)) OVER w - EPOCH_US(ts), 0)
             END AS late_us
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    grid AS (SELECT * FROM (VALUES {", ".join(f"({d})" for d in WM_SWEEP_DELAYS_SEC)})
             AS g(delay_sec)),
    agg AS (
      SELECT g.delay_sec,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN late_us > g.delay_sec * CAST(1000000 AS BIGINT)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             CAST(SUM(CASE WHEN late_us > 0 AND late_us <=
                             g.delay_sec * CAST(1000000 AS BIGINT)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_late_kept
      FROM l CROSS JOIN grid g
      GROUP BY g.delay_sec
    )
    SELECT CAST(delay_sec AS BIGINT) AS delay_sec, n_dropped, n_late_kept,
           CAST(n_dropped AS DOUBLE) / n_events AS drop_rate
    FROM agg
    """,
    doc="Watermark-delay calibration sweep (r17) — the tuning leg for "
    "events_watermark_lateness_audit, completing the family symmetry "
    "(the audit reports what two fixed thresholds WOULD drop; this "
    "prices the whole knob): events dropped / late-but-kept / drop "
    f"rate at withWatermark delays of {WM_SWEEP_DELAYS_SEC} seconds, "
    "under the audit's exact per-stream lateness rule (running "
    "event-time max over STRICTLY EARLIER arrivals by event_id, "
    "clamped at 0 — one shared formulation, so the two operators "
    "cannot desync; the same GLOBAL-vs-per-stream scope honesty "
    "applies verbatim: per-stream drops are exact for per-source-job "
    "queries and a lower bound for mixed ones). Rung 0 is the "
    "structural anchor — a zero delay drops exactly the out-of-order "
    "events — and the 60/3600 rungs must equal the audit's summed "
    "dropped_wm_1m/dropped_wm_1h: both identities are EXECUTED "
    "cross-operator in the claims test. n_dropped is monotone "
    "non-increasing and n_late_kept monotone non-decreasing in the "
    "delay (every row an out-of-order event moves through exactly one "
    "of the two counters). Determinism: exact BIGINT lateness and "
    "counts, the one rate divided last. Plan: exactly ONE exchange — "
    "the audit's running-max window — then ONE global partial+final "
    "aggregate computing every rung's counters in a single pass "
    "(conditional aggregation, NOT an explode: the grid multiplies "
    "nothing), and the per-rung rows unfold from the 1-row aggregate "
    "via a 5-element inline array. At 100 TB this is the audit's scan "
    "plus five integer columns of map-side partial state; the rung "
    "grid is free. reference: no analogue — training-pipeline "
    "extension (the streaming-deployment tuning face of the "
    "watermark contracts).",
)
def events_watermark_delay_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max = F.max(F.unix_micros("ts")).over(w)
    late = F.when(prev_max.isNull(), F.lit(0)).otherwise(
        F.greatest(prev_max - F.unix_micros("ts"), F.lit(0))
    )
    l = ev.select(late.alias("late_us"))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_events")]
    for d in WM_SWEEP_DELAYS_SEC:
        us = d * 1_000_000
        aggs.append(
            F.sum(F.when(F.col("late_us") > us, 1).otherwise(0))
            .cast("bigint")
            .alias(f"drop_{d}")
        )
        aggs.append(
            F.sum(
                F.when(
                    (F.col("late_us") > 0) & (F.col("late_us") <= us), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"kept_{d}")
        )
    one = l.agg(*aggs)
    rungs = F.array(
        *[
            F.struct(
                F.lit(d).cast("bigint").alias("delay_sec"),
                F.col(f"drop_{d}").alias("n_dropped"),
                F.col(f"kept_{d}").alias("n_late_kept"),
                (F.col(f"drop_{d}").cast("double") / F.col("n_events")).alias(
                    "drop_rate"
                ),
            )
            for d in WM_SWEEP_DELAYS_SEC
        ]
    )
    return one.select(F.explode(rungs).alias("r")).select(
        F.col("r.delay_sec").alias("delay_sec"),
        F.col("r.n_dropped").alias("n_dropped"),
        F.col("r.n_late_kept").alias("n_late_kept"),
        F.col("r.drop_rate").alias("drop_rate"),
    )


#: The sessionization-gap calibration grid, in whole seconds. 600 s is
#: the registered sessionizer's own 10-minute knob — at that rung
#: n_sessions must equal events_session_window's row count (the
#: cross-operator identity the claims test executes).
SESSION_GAP_SWEEP_SEC = (60, 600, 1800, 3600, 86400)


@query(
    "events_session_gap_sweep",
    oracle=f"""
    WITH d AS (
      SELECT user_id,
             EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
      FROM events
    ),
    grid AS (SELECT * FROM (VALUES {", ".join(f"({g})" for g in SESSION_GAP_SWEEP_SEC)})
             AS g(gap_sec)),
    agg AS (
      SELECT g.gap_sec,
             CAST(SUM(CASE WHEN delta_us IS NULL OR delta_us >
                             g.gap_sec * CAST(1000000 AS BIGINT)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             CAST(SUM(CASE WHEN delta_us >
                             g.gap_sec * CAST(1000000 AS BIGINT)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM d CROSS JOIN grid g
      GROUP BY g.gap_sec
    )
    SELECT CAST(gap_sec AS BIGINT) AS gap_sec, n_sessions, n_boundaries,
           CAST(n_events AS DOUBLE) / n_sessions AS avg_session_events
    FROM agg
    """,
    doc="Sessionization-gap calibration sweep (r17) — the tuning leg "
    "for events_session_window (the sessionizer hard-codes a "
    "10-minute inactivity gap; this prices the knob): session count, "
    "session boundaries crossed, and mean events-per-session at "
    f"inactivity gaps of {SESSION_GAP_SWEEP_SEC} seconds, from ONE "
    "inter-event-delta pass. The identity doing the work: a user's "
    "session count at gap G is 1 + |deltas > G|, so summing over "
    "users needs only the delta distribution — n_sessions(G) = "
    "n_users + |deltas > G| — and the sweep never sessionizes R "
    "times (the delay sweep's trick with LAG instead of a running "
    "max). The boundary rule is the sessionizer's own STRICT "
    "comparison (delta > G starts a session; a delta of exactly G "
    "stays inside — the claims test pins the edge), over the same "
    "(ts, event_id) per-user total order, so the 600 s rung must "
    "equal events_session_window's row count exactly — the "
    "cross-operator identity, EXECUTED in the claims and generative "
    "tests. n_sessions and n_boundaries are monotone non-increasing "
    "in G (n_boundaries = n_sessions - n_users at every rung) and "
    "avg_session_events monotone non-decreasing. Determinism: exact "
    "BIGINT deltas and counts, the one mean divided last. Plan: "
    "exactly ONE exchange — the per-user LAG window — then ONE "
    "global partial+final conditional aggregation for every rung in "
    "a single pass (the grid multiplies nothing; the one Generate "
    "unfolds the 1-row aggregate into five rung rows). At 100 TB "
    "this is one keyed exchange plus ten integer columns of "
    "map-side partial state; production keying is (user, day) as "
    "for the other events ops. reference: no analogue — "
    "training-pipeline extension (the session-boundary face of the "
    "events-warehouse family).",
)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    d = ev.select(delta.alias("delta_us"))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_events")]
    for g in SESSION_GAP_SWEEP_SEC:
        us = g * 1_000_000
        aggs.append(
            F.sum(
                F.when(
                    F.col("delta_us").isNull() | (F.col("delta_us") > us), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"sess_{g}")
        )
        aggs.append(
            F.sum(F.when(F.col("delta_us") > us, 1).otherwise(0))
            .cast("bigint")
            .alias(f"bnd_{g}")
        )
    one = d.agg(*aggs)
    rungs = F.array(
        *[
            F.struct(
                F.lit(g).cast("bigint").alias("gap_sec"),
                F.col(f"sess_{g}").alias("n_sessions"),
                F.col(f"bnd_{g}").alias("n_boundaries"),
                (
                    F.col("n_events").cast("double") / F.col(f"sess_{g}")
                ).alias("avg_session_events"),
            )
            for g in SESSION_GAP_SWEEP_SEC
        ]
    )
    return one.select(F.explode(rungs).alias("r")).select(
        F.col("r.gap_sec").alias("gap_sec"),
        F.col("r.n_sessions").alias("n_sessions"),
        F.col("r.n_boundaries").alias("n_boundaries"),
        F.col("r.avg_session_events").alias("avg_session_events"),
    )
