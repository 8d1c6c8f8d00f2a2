"""Structured Streaming: batch/stream duality — each streaming operator's
drained result must equal its batch twin over the same events data."""

import pytest

from iceberg_explorer_spark.sources.registry import load_table
from iceberg_explorer_spark.streaming.stateful import user_activity_state
from iceberg_explorer_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    running_type_rollup,
    session_aggregates,
    sliding_user_counts,
    stream_dedupe,
    tumbling_counts,
)
from tests.conftest import SF_DIR_SMALL


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SF_DIR_SMALL)


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_DIR_SMALL, "events")


def test_tumbling_stream_equals_batch(spark, events_stream, events_batch):
    got = run_to_memory(tumbling_counts(events_stream), "t_tumbling")
    want = tumbling_counts(events_batch)
    cols = ["window_start_us", "event_type", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_sliding_stream_equals_batch(spark, events_stream, events_batch):
    got = run_to_memory(sliding_user_counts(events_stream), "t_sliding")
    want = sliding_user_counts(events_batch)
    cols = ["window_start_us", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_session_stream_equals_batch(spark, events_stream, events_batch):
    got = run_to_memory(session_aggregates(events_stream), "t_session")
    want = session_aggregates(events_batch)
    cols = ["user_id", "session_start_us", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_session_matches_batch_operator(spark, events_batch):
    """The native session_window twin agrees with the lag+prefix-sum batch
    sessionizer in operators/events.py on (user, start, n, total)."""
    from iceberg_explorer_spark.operators.registry import QUERIES

    native = session_aggregates(events_batch)
    manual = QUERIES["events_session_window"].builder(spark, SF_DIR_SMALL)
    cols = ["user_id", "session_start_us", "n_events", "total_value"]
    assert _sorted_rows(native, cols) == _sorted_rows(manual, cols)


def test_stream_dedupe(spark, events_stream, events_batch):
    got = run_to_memory(
        stream_dedupe(events_stream), "t_dedupe", output_mode="append"
    )
    assert got.count() == events_batch.count()  # event_ids are unique
    assert got.select("event_id").distinct().count() == events_batch.count()


def test_running_rollup_stream_equals_batch(spark, events_stream, events_batch):
    """The IVM merge state (count, exact-decimal sum, max) maintained by
    Structured Streaming must land exactly on the batch rollup — the
    streaming form of events_incremental_rollup's contract: every state
    component is commutative-associative, so micro-batch merge order
    cannot matter."""
    got = run_to_memory(
        running_type_rollup(events_stream), "t_rollup", output_mode="complete"
    )
    want = running_type_rollup(events_batch)
    cols = ["event_type", "n_events", "total_value", "last_seen_us"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_stateful_user_activity(spark, events_stream, events_batch):
    got = run_to_memory(
        user_activity_state(events_stream), "t_state", output_mode="update"
    )
    # terminal state per user == batch aggregate
    from pyspark.sql import functions as F

    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_micros("ts")).alias("last_seen_us"),
    )
    got_last = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_seen_us").alias("last_seen_us"),
        )
    )
    cols = ["user_id", "n_events", "last_seen_us"]
    assert _sorted_rows(got_last, cols) == _sorted_rows(want, cols)


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving after its window passed the watermark is DROPPED:
    the already-finalized window's count must not change.

    Three files → three availableNow micro-batches (maxFilesPerTrigger=1).
    Dropping is guaranteed only once the window's STATE is evicted, which
    happens at the end of the first batch that runs with watermark past the
    window end — so the late row must arrive a full batch after the
    watermark advance, not in the same one:
      batch 0: events at 10:00 and 10:58   → watermark becomes 10:48
      batch 1: event at 11:00; runs WITH wm 10:48 → [10:00,10:05) emitted
               and evicted at batch end; wm becomes 10:50
      batch 2: LATE event back at 10:01 (state gone, below wm → dropped)
               + an event at 12:00 → wm 11:50 finalizes the 10:55/11:00
               windows at batch end.
    Append-mode output holds exactly the finalized windows with the late
    event invisible; the still-open 12:00 window must be absent.
    """
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from pyspark.sql import types as T

    # this test writes its OWN int64-nanos fixture files, so the long-ts
    # schema is pinned here (the real source probes the footer flavour)
    events_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def ns(hhmm: str) -> int:  # epoch nanos on 2024-01-01
        h, m = map(int, hhmm.split(":"))
        return (1704067200 + h * 3600 + m * 60) * 1_000_000_000

    def write(path, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(cols[0], pa.int64()),
                    "ts": pa.array(cols[1], pa.int64()),
                    "user_id": pa.array(cols[2], pa.int64()),
                    "event_type": pa.array(cols[3], pa.string()),
                    "value": pa.array(cols[4], pa.float64()),
                    "props": pa.array(cols[5], pa.string()),
                }
            ),
            path,
        )

    stage = tmp_path / "landing"
    stage.mkdir()
    f1 = str(stage / "b1.parquet")
    f2 = str(stage / "b2.parquet")
    f3 = str(stage / "b3.parquet")
    write(f1, [(1, ns("10:00"), 1, "click", 1.0, "{}"),
               (2, ns("10:58"), 1, "click", 1.0, "{}")])
    write(f2, [(3, ns("11:00"), 1, "click", 1.0, "{}")])  # evicts 10:00 win
    write(f3, [(4, ns("10:01"), 1, "click", 1.0, "{}"),   # LATE: dropped
               (5, ns("12:00"), 1, "click", 1.0, "{}")])  # advances watermark
    now = time.time()
    os.utime(f1, (now - 120, now - 120))  # file source orders by mtime
    os.utime(f2, (now - 60, now - 60))
    os.utime(f3, (now, now))

    raw = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    out = run_to_memory(
        tumbling_counts(events, watermark="10 minutes"),
        "late_data_tbl",
        output_mode="append",
    )
    got = _sorted_rows(out, ["window_start_us", "n_events"])
    us = lambda hhmm: ns(hhmm) // 1000  # noqa: E731
    assert got == [
        (us("10:00"), 1),  # late event NOT counted — stayed at 1
        (us("10:55"), 1),
        (us("11:00"), 1),
    ]


def test_stream_stream_join_equals_batch(spark, events_stream, events_batch):
    """Watermarked stream-stream self-join (purchase←clicks attribution)
    drains to the same row set as the identical plan over the static
    DataFrame — append mode, state bounded by the watermark + time-range
    condition."""
    from iceberg_explorer_spark.streaming.windows import purchase_click_join

    got = run_to_memory(
        purchase_click_join(events_stream), "ss_join", output_mode="append"
    )
    want = purchase_click_join(events_batch)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_stream_static_enrichment_equals_batch(spark, events_stream, events_batch):
    from pyspark.sql import functions as F

    from iceberg_explorer_spark.streaming.windows import enrich_with_users

    # static dim derived from batch data: user tier by activity
    user_dim = (
        events_batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") >= 20, "heavy").otherwise("light").alias("user_tier"),
        )
    )
    got = run_to_memory(
        enrich_with_users(events_stream, user_dim), "enrich", output_mode="append"
    )
    want = enrich_with_users(events_batch, user_dim)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop/restart recovery: a file-source → parquet-sink stream with a
    checkpoint processes batch-1 files, is STOPPED, and a restarted query
    (same checkpoint) must pick up exactly the NEW files — no reprocessing
    of batch 1, no loss of batch 2. This is the exactly-once source-progress
    contract that lets a 100 TB/day ingest pipeline crash and resume without
    double-writing training shards."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import types as T

    landing = tmp_path / "landing"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
        ]
    )

    def write(name, ids):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "user_id": pa.array([i % 3 for i in ids], pa.int64()),
                }
            ),
            str(landing / name),
        )

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(landing))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write("b1.parquet", [1, 2, 3])
    run_once()
    first = spark.read.parquet(str(out))
    assert sorted(r["event_id"] for r in first.collect()) == [1, 2, 3]

    write("b2.parquet", [4, 5])
    run_once()  # restarted query: same checkpoint, must resume not replay
    final = spark.read.parquet(str(out))
    assert sorted(r["event_id"] for r in final.collect()) == [1, 2, 3, 4, 5]


def test_transform_with_state_ltv(spark, events_stream, events_batch):
    """Spark 4 transformWithStateInPandas: the typed-ValueState lifetime
    accumulator's terminal rows must equal the batch per-user aggregate
    (exact integer cents — state survives batches, float drift would
    compound).

    SKIPS (not passes) when the TWS Python driver worker cannot start:
    this container's sandbox kills the separate state-server worker
    process even for the minimal upstream example (verified with a plain
    rate-source repro), exactly like the missing Iceberg jar — the
    operator code is real and runs wherever the worker can spawn; the
    applyInPandasWithState twin covers the stateful semantics here."""
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from iceberg_explorer_spark.streaming.stateful import user_ltv_state

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = run_to_memory(
            user_ltv_state(events_stream), "t_ltv", output_mode="update"
        )
    except StreamingQueryException as e:
        if "TransformWithStateInPySpark driver worker" in str(e):
            pytest.skip(
                "transformWithStateInPandas driver worker cannot start in "
                "this container (state-server subprocess); verified the "
                "minimal upstream example fails identically"
            )
        raise
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    )
    got_last = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_cents").alias("total_cents"),
    )
    cols = ["user_id", "n_events", "total_cents"]
    assert _sorted_rows(got_last, cols) == _sorted_rows(want, cols)


def test_streaming_exact_dedup_two_day_parity(spark, tmp_path):
    """The streaming exact-dedup twin replays the incremental family's
    two-day story with GroupState as the digest artifact: day 1 (one
    micro-batch) keeps the min-id holder of each digest and drops its
    in-batch dups; day 2 (the next micro-batch) classifies against the
    state day 1 left behind — a dup of day 1's KEPT doc AND a dup of a
    day 1 DROPPED doc both read dropped_vs_history (digest membership,
    exactly like the artifact path, where the kept doc appended the
    group's digest either way). Then the PARITY pin: the same two days
    replayed through the batch rule (incremental_exact_flags with an
    empty day-1 history and day 1's digests as day 2's history
    artifact) must produce identical per-doc stages."""
    import os

    from iceberg_explorer_spark.operators.dedup import (
        content_digest,
        incremental_exact_flags,
    )
    from iceberg_explorer_spark.streaming.dedup import (
        DOCS_SCHEMA,
        read_documents_stream,
        streaming_exact_dedup,
    )
    from iceberg_explorer_spark.streaming.windows import run_to_memory

    t1 = "alpha beta gamma delta"
    t2 = "epsilon zeta eta theta"
    t3 = "iota kappa lambda mu"
    # day 1: t1 group {1, 2} -> 1 kept, 2 dropped_in_batch; t2 {3}
    # kept; NULL-text doc 4 -> the sentinel digest group, kept (the
    # content_digest NULL sentinel must flow through the streaming
    # groupBy/state path exactly as it does through the artifact)
    day1 = [(1, t1, "en", "a", len(t1)), (2, t1, "en", "a", len(t1)),
            (3, t2, "en", "b", len(t2)), (4, None, "en", "a", 0)]
    # day 2 claims: id 11 (t1) dups a digest day 1 KEPT a holder of ->
    # dropped_vs_history; ids 12/13 (t3, never seen) -> min 12 kept,
    # 13 dropped_in_batch; id 14 (t2) dups day-1's singleton keep ->
    # dropped_vs_history; id 15 (NULL text) dups the day-1 sentinel
    # group -> dropped_vs_history. (A dup of day-1's DROPPED doc 2 is
    # the same t1 digest as id 11 — digest membership, not per-doc
    # fate, decides, which is exactly what the claim pins.)
    day2 = [(11, t1, "en", "a", len(t1)), (12, t3, "en", "c", len(t3)),
            (13, t3, "en", "c", len(t3)), (14, t2, "en", "b", len(t2)),
            (15, None, "en", "c", 0)]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for name, rows, mtime in (("day1", day1, 1_000), ("day2", day2, 2_000)):
        f = str(tmp_path / f"{name}.parquet")
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        # one FILE per day inside the landing dir, mtime-ordered: the
        # file stream source processes oldest-first, so day1 is batch 0
        part = [
            p for p in os.listdir(f)
            if p.endswith(".parquet") and not p.startswith((".", "_"))
        ][0]
        dst = os.path.join(landing, f"{name}.parquet")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (mtime, mtime))

    got = run_to_memory(
        streaming_exact_dedup(read_documents_stream(spark, landing)),
        "t_stream_dedup",
        output_mode="append",
    )
    stages = {r["doc_id"]: r["stage"] for r in got.collect()}
    assert stages == {
        1: "kept", 2: "dropped_in_batch", 3: "kept", 4: "kept",
        11: "dropped_vs_history",
        12: "kept", 13: "dropped_in_batch",
        14: "dropped_vs_history", 15: "dropped_vs_history",
    }, stages

    # parity: the batch rule over the same two days
    from pyspark.sql import functions as F

    all_true = lambda c: F.lit(True)  # noqa: E731
    d1 = spark.createDataFrame(day1, DOCS_SCHEMA)
    d2 = spark.createDataFrame(day2, DOCS_SCHEMA)
    empty_h = spark.createDataFrame([], "h string")
    day1_digests = d1.select(content_digest().alias("h")).distinct()

    def to_stages(flags):
        return {
            r["doc_id"]: (
                "dropped_vs_history" if r["seen"] == 1
                else "kept" if r["is_canon"] == 1
                else "dropped_in_batch"
            )
            for r in flags.collect()
        }

    batch_stages = to_stages(
        incremental_exact_flags(d1, history_digests=empty_h,
                                batch_pred=all_true)
    )
    batch_stages.update(to_stages(
        incremental_exact_flags(d2, history_digests=day1_digests,
                                batch_pred=all_true)
    ))
    assert batch_stages == stages


@pytest.mark.parametrize("seed", ["g1", "g2", "g3"])
def test_streaming_exact_dedup_generative_parity(spark, tmp_path, seed):
    """Generative multi-day parity: THREE deterministic pseudo-random
    corpora (md5-derived day counts, group sizes, text collisions and
    NULL-text rows) drained through the streaming twin must match the
    batch rule replayed day-by-day (history = the union of all prior
    days' digests, the artifact-append invariant) — parity computed
    GENERICALLY from the flags, not hand-written stages, so this covers
    shapes the crafted two-day test does not: digest groups recurring
    across three days, days where every row is history-claimed, groups
    larger than two, and NULL-text recurrence."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from iceberg_explorer_spark.operators.dedup import (
        content_digest,
        incremental_exact_flags,
    )
    from iceberg_explorer_spark.streaming.dedup import (
        DOCS_SCHEMA,
        read_documents_stream,
        streaming_exact_dedup,
    )
    from iceberg_explorer_spark.streaming.windows import run_to_memory

    def h(*parts) -> int:
        return hashlib.md5(":".join(map(str, parts)).encode()).digest()[0]

    n_days = 2 + h(seed, "days") % 2  # 2 or 3 micro-batches
    days, next_id = [], 1
    for day in range(n_days):
        rows = []
        for g in range(3 + h(seed, day, "groups") % 3):
            # text pool of 6 — collisions within and across days by
            # construction; ~1 in 7 groups is the NULL-text sentinel
            pool = h(seed, day, g, "text") % 7
            text = None if pool == 6 else f"text pool {pool} body"
            for _ in range(1 + h(seed, day, g, "size") % 3):
                rows.append(
                    (next_id, text, "en", "s",
                     len(text) if text else 0)
                )
                next_id += 1
        days.append(rows)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate(days):
        f = str(tmp_path / f"d{i}.parquet")
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        part = [
            p for p in os.listdir(f)
            if p.endswith(".parquet") and not p.startswith((".", "_"))
        ][0]
        dst = os.path.join(landing, f"d{i}.parquet")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (1_000 * (i + 1), 1_000 * (i + 1)))

    got = run_to_memory(
        streaming_exact_dedup(read_documents_stream(spark, landing)),
        f"t_stream_gen_{seed}",
        output_mode="append",
    )
    stream_stages = {r["doc_id"]: r["stage"] for r in got.collect()}

    all_true = lambda c: F.lit(True)  # noqa: E731
    batch_stages = {}
    history = spark.createDataFrame([], "h string")
    for rows in days:
        d = spark.createDataFrame(rows, DOCS_SCHEMA)
        flags = incremental_exact_flags(
            d, history_digests=history, batch_pred=all_true
        )
        for r in flags.collect():
            batch_stages[r["doc_id"]] = (
                "dropped_vs_history" if r["seen"] == 1
                else "kept" if r["is_canon"] == 1
                else "dropped_in_batch"
            )
        history = history.unionByName(
            d.select(content_digest().alias("h"))
        ).distinct()

    assert len(stream_stages) == sum(len(r) for r in days)
    assert stream_stages == batch_stages


def test_streaming_simhash_dedup_parity_and_exactly_once(spark, tmp_path):
    """The streaming SimHash twin (r14 — the twin's second modality):
    foreachBatch classifies each micro-batch "day" against the
    persisted signature artifact via the SAME simhash_cls_from_history
    rule the nightly path runs, and appends kept docs' signatures with
    the epoch id as the store's idempotence handle. Claims: (1) day-1
    vs pre-loaded history — a sig-dup of history is vs_corpus, an
    in-batch sig group keeps its min (component semantics), a novel doc
    is kept; (2) day-2 vs GROWN state — a dup of day-1's KEPT doc reads
    vs_corpus because its signature was appended between micro-batches;
    (3) batch parity — the same days replayed through
    simhash_cls_from_history with the history union grown by each day's
    kept signatures produce identical per-doc flags; (4) exactly-once
    state — re-entering the processor with an already-committed epoch
    id (Structured Streaming's retry) leaves the signature artifact
    unchanged (the store detects the replay), while a genuinely new
    epoch still lands."""
    import os

    from pyspark.sql import functions as F

    from iceberg_explorer_spark.operators.dedup import simhash_signatures
    from iceberg_explorer_spark.operators.incremental_artifacts import (
        BucketedArtifactStore,
        simhash_cls_from_history,
    )
    from iceberg_explorer_spark.streaming.dedup import (
        DOCS_SCHEMA,
        read_documents_stream,
        simhash_batch_processor,
        streaming_simhash_dedup,
    )

    t_a = " ".join(f"ash{i} oak{i % 5}" for i in range(25))
    t_b = " ".join(f"elm{i} fir{i % 7}" for i in range(25))
    t_c = " ".join(f"yew{i} may{i % 3}" for i in range(25))
    hist_docs = [(3, t_a, "en", "web", len(t_a))]
    # day 1: 20 sig-dups history 3; {10, 30} batch-only t_b group
    day1 = [(10, t_b, "en", "s1", len(t_b)),
            (20, t_a, "en", "s2", len(t_a)),
            (30, t_b, "en", "s3", len(t_b))]
    # day 2: 15 dups day-1 KEPT 10 (grown state); {25, 35, 45} novel
    # t_c group -> min kept, rest in-batch
    day2 = [(15, t_b, "en", "q1", len(t_b)),
            (25, t_c, "en", "q2", len(t_c)),
            (35, t_c, "en", "q3", len(t_c)),
            (45, t_c, "en", "q4", len(t_c))]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for name, rows, mtime in (("day1", day1, 1_000), ("day2", day2, 2_000)):
        f = str(tmp_path / f"{name}.parquet")
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        part = [
            p for p in os.listdir(f)
            if p.endswith(".parquet") and not p.startswith((".", "_"))
        ][0]
        dst = os.path.join(landing, f"{name}.parquet")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (mtime, mtime))

    store = BucketedArtifactStore(
        spark, "t_stream_simhash", n_buckets=2,
        artifacts={"simhash": ("doc_id",)},
    )
    try:
        store.write(
            "simhash",
            simhash_signatures(spark.createDataFrame(hist_docs, DOCS_SCHEMA)),
        )
        results: dict[int, dict] = {}

        def sink(cls, epoch_id):
            results[int(epoch_id)] = {
                r["doc_id"]: (r["vs_corpus"], r["in_batch"])
                for r in cls.collect()
            }

        q = streaming_simhash_dedup(
            read_documents_stream(spark, landing), store, sink,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
        assert sorted(results) == [0, 1], results
        # (1) day 1 against the pre-loaded history
        assert results[0] == {10: (0, 0), 20: (1, 0), 30: (0, 1)}
        # (2) day 2 against state GROWN by day-1's kept signature
        assert results[1] == {
            15: (1, 0), 25: (0, 0), 35: (0, 1), 45: (0, 1)
        }

        # (3) batch parity, history grown by each day's kept signatures
        hist = simhash_signatures(
            spark.createDataFrame(hist_docs, DOCS_SCHEMA)
        )
        for i, rows in enumerate((day1, day2)):
            d = spark.createDataFrame(rows, DOCS_SCHEMA)
            cls = simhash_cls_from_history(d, hist).localCheckpoint(
                eager=True
            )
            assert {
                r["doc_id"]: (r["vs_corpus"], r["in_batch"])
                for r in cls.collect()
            } == results[i]
            kept = cls.filter(
                (F.col("vs_corpus") == 0) & (F.col("in_batch") == 0)
            ).select("doc_id")
            hist = hist.unionByName(
                simhash_signatures(d.join(kept, "doc_id"))
            ).distinct()

        # state after the drain: history + day-1 kept (10) + day-2 kept
        # (25) — exactly one signature row each, no double-landing
        state = {r["doc_id"] for r in store.read("simhash").collect()}
        assert state == {3, 10, 25}
        assert store.read("simhash").count() == 3

        # (4) exactly-once on micro-batch RETRY: re-entering the
        # processor with epoch 1 (already committed) IN THE SAME
        # idempotence namespace (derived from the checkpoint path, as
        # streaming_simhash_dedup does) must leave the artifact
        # unchanged; a NEW epoch lands its kept signatures
        import hashlib

        ns = hashlib.md5(
            str(tmp_path / "ckpt").encode()
        ).hexdigest()[:12]
        replay_sink_calls = []
        proc = simhash_batch_processor(
            store,
            lambda cls, e: replay_sink_calls.append(int(e)),
            namespace=ns,
        )
        proc(spark.createDataFrame(day2, DOCS_SCHEMA), 1)
        assert replay_sink_calls == [1]  # sink is at-least-once
        assert store.read("simhash").count() == 3  # state unchanged
        t_d = " ".join(f"new{i} word{i % 4}" for i in range(25))
        proc(
            spark.createDataFrame(
                [(99, t_d, "en", "z", len(t_d))], DOCS_SCHEMA
            ),
            2,
        )
        assert store.read("simhash").count() == 4
        assert {r["doc_id"] for r in store.read("simhash").collect()} == {
            3, 10, 25, 99
        }
        # a logically NEW stream (different checkpoint lineage → a
        # different namespace) re-using epoch id 1 must NOT be dropped
        # as a replay of the old run's epoch 1 (review r14 finding)
        t_e = " ".join(f"other{i} term{i % 3}" for i in range(25))
        proc2 = simhash_batch_processor(
            store, lambda cls, e: None, namespace="run2"
        )
        proc2(
            spark.createDataFrame(
                [(150, t_e, "en", "z", len(t_e))], DOCS_SCHEMA
            ),
            1,
        )
        assert store.read("simhash").count() == 5
    finally:
        store.drop()


@pytest.mark.parametrize("seed", ["g1", "g2"])
def test_streaming_simhash_generative_parity(spark, tmp_path, seed):
    """Generative multi-day parity for the streaming SimHash twin (the
    exact twin's generative pin applied to the second modality): a
    deterministic pseudo-random corpus of word-POOL permutation groups
    (same multiset -> identical SimHash; permutations -> distinct
    digests) recurring within and across days is drained through the
    real file-source stream and must match the batch rule
    (simhash_cls_from_history with the history union grown by each
    day's kept signatures) per-doc — parity computed GENERICALLY from
    the flags, never hand-written stages, so it covers shapes the
    crafted test does not: groups recurring across three days,
    multi-member same-day groups, days whose every group is
    history-claimed, and whatever chance cross-pool Hamming
    collisions the seed produces (both sides run the same rule, so
    parity holds regardless). Post-drain state must be exactly
    history + every day's kept signatures, exactly once."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from iceberg_explorer_spark.operators.dedup import simhash_signatures
    from iceberg_explorer_spark.operators.incremental_artifacts import (
        BucketedArtifactStore,
        simhash_cls_from_history,
    )
    from iceberg_explorer_spark.streaming.dedup import (
        DOCS_SCHEMA,
        read_documents_stream,
        streaming_simhash_dedup,
    )

    def h(*parts) -> int:
        return hashlib.md5(":".join(map(str, parts)).encode()).digest()[0]

    pools = {
        p: [f"p{p}w{i:02d}" for i in range(25)] for p in range(4)
    }

    def perm_text(pool: int, which: int) -> str:
        w = pools[pool]
        if which % 3 == 1:
            w = list(reversed(w))
        elif which % 3 == 2:
            w = w[0::2] + w[1::2]
        return " ".join(w)

    n_days = 2 + h(seed, "days") % 2
    days, next_id = [], 100
    for day in range(n_days):
        rows = []
        for g in range(2 + h(seed, day, "groups") % 3):
            pool = h(seed, day, g, "pool") % 4
            for m in range(1 + h(seed, day, g, "size") % 3):
                t = perm_text(pool, h(seed, day, g, m, "perm"))
                rows.append((next_id, t, "en", f"s{pool}", len(t)))
                next_id += 1
        days.append(rows)
    hist_docs = [(3, perm_text(0, 0), "en", "web", 1)]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate(days):
        f = str(tmp_path / f"d{i}.parquet")
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        part = [
            p for p in os.listdir(f)
            if p.endswith(".parquet") and not p.startswith((".", "_"))
        ][0]
        dst = os.path.join(landing, f"d{i}.parquet")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (1_000 * (i + 1), 1_000 * (i + 1)))

    store = BucketedArtifactStore(
        spark, f"t_stream_simgen_{seed}", n_buckets=2,
        artifacts={"simhash": ("doc_id",)},
    )
    try:
        store.write(
            "simhash",
            simhash_signatures(spark.createDataFrame(hist_docs, DOCS_SCHEMA)),
        )
        results: dict[int, dict] = {}

        def sink(cls, epoch_id):
            results[int(epoch_id)] = {
                r["doc_id"]: (r["vs_corpus"], r["in_batch"])
                for r in cls.collect()
            }

        q = streaming_simhash_dedup(
            read_documents_stream(spark, landing), store, sink,
            str(tmp_path / f"ckpt_{seed}"),
        )
        q.awaitTermination(180)
        assert sorted(results) == list(range(n_days)), results

        # batch replay with the grown-history rule, parity per day
        hist = simhash_signatures(
            spark.createDataFrame(hist_docs, DOCS_SCHEMA)
        )
        expected_state = {3}
        for i, rows in enumerate(days):
            d = spark.createDataFrame(rows, DOCS_SCHEMA)
            cls = simhash_cls_from_history(d, hist).localCheckpoint(
                eager=True
            )
            batch_flags = {
                r["doc_id"]: (r["vs_corpus"], r["in_batch"])
                for r in cls.collect()
            }
            assert batch_flags == results[i], (seed, i)
            kept = cls.filter(
                (F.col("vs_corpus") == 0) & (F.col("in_batch") == 0)
            ).select("doc_id")
            expected_state |= {r["doc_id"] for r in kept.collect()}
            hist = hist.unionByName(
                simhash_signatures(d.join(kept, "doc_id"))
            ).distinct()

        state = {r["doc_id"] for r in store.read("simhash").collect()}
        assert state == expected_state, (seed, state, expected_state)
        assert store.read("simhash").count() == len(expected_state)
    finally:
        store.drop()


def test_epoch_keyed_sink_idempotence(spark):
    """epoch_keyed_sink (r15 — VERDICT r14 #5): the executable form of
    the sink-idempotence contract simhash_batch_processor documents.
    Claims: (1) a first delivery lands the epoch's classification in
    the sink artifact (epoch_id column appended; the artifact is
    auto-backfilled empty on first use) and fires the chained `inner`
    exactly once; (2) crash BETWEEN sink and state append — the retry
    re-delivers the same classification, the sink DROPS it (no
    duplicate rows, inner silent) and the state append still lands:
    both sides end exactly-once; (3) crash AFTER the state append —
    the SimHash retry re-classifies IDENTICALLY (asserted directly:
    the rule's doc_id-stable membership disproves this module's
    earlier vs_corpus-divergence claim — the r15 review
    counterexample), so the drop's value there is preventing row
    DUPLICATION in the durable log, for solo and multi-doc epochs
    both; (4) keep-first under genuine divergence — a crafted
    DIFFERENT re-delivery for an already-landed epoch (simulating a
    classify rule that is not retry-stable) is dropped and the first
    delivery's rows survive; (5) the landed log reconstructs
    per-epoch results exactly, and a fresh epoch still lands; (6)
    concurrent FIRST use of a fresh artifact by two streams is safe —
    the auto-backfill's exists+create runs under the store lock, so
    neither stream's landed epoch is wiped by the other's overwrite
    (the r15 review-pass race)."""
    import hashlib

    from pyspark.sql import functions as F

    from iceberg_explorer_spark.operators.dedup import simhash_signatures
    from iceberg_explorer_spark.operators.incremental_artifacts import (
        BucketedArtifactStore,
        simhash_cls_from_history,
    )
    from iceberg_explorer_spark.streaming.dedup import (
        DOCS_SCHEMA,
        epoch_keyed_sink,
        simhash_batch_processor,
    )

    t_a = " ".join(f"ivy{i} gum{i % 5}" for i in range(25))
    t_b = " ".join(f"box{i} bay{i % 7}" for i in range(25))
    t_c = " ".join(f"nut{i} fig{i % 3}" for i in range(25))
    hist_docs = [(3, t_a, "en", "web", len(t_a))]
    day1 = [(10, t_b, "en", "s1", len(t_b)),
            (20, t_a, "en", "s2", len(t_a))]   # 10 novel-kept, 20 vs hist
    day2 = [(25, t_c, "en", "q1", len(t_c))]   # novel-kept
    ns = hashlib.md5(b"sink-contract-run").hexdigest()[:12]

    store = BucketedArtifactStore(
        spark, "t_sink_epoch", n_buckets=2,
        artifacts={"simhash": ("doc_id",), "cls_log": ("doc_id",),
                   "cls_race": ("doc_id",)},
    )
    try:
        store.write(
            "simhash",
            simhash_signatures(spark.createDataFrame(hist_docs, DOCS_SCHEMA)),
        )
        inner_calls = []
        sink = epoch_keyed_sink(
            store, "cls_log", ns,
            inner=lambda cls, e: inner_calls.append(int(e)),
        )
        proc = simhash_batch_processor(store, sink, namespace=ns)
        d1 = spark.createDataFrame(day1, DOCS_SCHEMA)
        d2 = spark.createDataFrame(day2, DOCS_SCHEMA)

        # (2) crash BETWEEN sink and state append: the sink ran for
        # epoch 0 (lands + auto-backfill), the append never did
        assert not store.exists("cls_log")
        cls0 = simhash_cls_from_history(d1, store.read("simhash"))
        assert sink(cls0, 0) is True
        assert inner_calls == [0]
        assert store.read("simhash").count() == 1  # state NOT advanced
        # ... Structured Streaming retries the whole micro-batch:
        proc(d1, 0)
        # sink side exactly-once (re-delivery dropped, inner silent)
        log0 = {
            r["doc_id"]: (r["vs_corpus"], r["in_batch"])
            for r in store.read("cls_log").filter(F.col("epoch_id") == 0)
            .collect()
        }
        assert log0 == {10: (0, 0), 20: (1, 0)}
        assert store.read("cls_log").count() == 2  # no duplicate rows
        assert inner_calls == [0]
        # state side landed exactly once on the retry
        assert {r["doc_id"] for r in store.read("simhash").collect()} == {
            3, 10,
        }

        # (3) crash AFTER the state append: epoch 1 completes fully,
        # then the whole micro-batch is retried
        proc(d2, 1)
        assert inner_calls == [0, 1]
        # the post-append rerun is classification-IDENTICAL: 25's own
        # signature is history now, but membership is by doc_id and
        # the duplicate signature rows collapse under distinct — the
        # corrected ordering-note claim, pinned for the solo epoch...
        rerun = {
            r["doc_id"]: (r["vs_corpus"], r["in_batch"])
            for r in simhash_cls_from_history(
                d2, store.read("simhash")
            ).collect()
        }
        assert rerun == {25: (0, 0)}
        # ...and for the multi-doc epoch 0 (both docs post-append)
        rerun0 = {
            r["doc_id"]: (r["vs_corpus"], r["in_batch"])
            for r in simhash_cls_from_history(
                d1, store.read("simhash")
            ).collect()
        }
        assert rerun0 == {10: (0, 0), 20: (1, 0)}
        proc(d2, 1)  # the retry: identical content, still must not double
        proc(d1, 0)  # deep-history retry of the multi-doc epoch
        log1 = {
            r["doc_id"]: (r["vs_corpus"], r["in_batch"])
            for r in store.read("cls_log").filter(F.col("epoch_id") == 1)
            .collect()
        }
        assert log1 == {25: (0, 0)}
        assert store.read("cls_log").count() == 3  # no duplicated rows
        assert inner_calls == [0, 1]
        assert store.read("simhash").count() == 3  # state exactly-once

        # (4) keep-first under genuine divergence: a rule that is NOT
        # retry-stable would re-deliver a DIFFERENT frame for the same
        # epoch — the sink must drop it and preserve the first delivery
        divergent = simhash_cls_from_history(
            d2, store.read("simhash")
        ).withColumn("vs_corpus", F.lit(1))
        assert sink(divergent, 1) is False
        assert {
            r["doc_id"]: (r["vs_corpus"], r["in_batch"])
            for r in store.read("cls_log").filter(F.col("epoch_id") == 1)
            .collect()
        } == {25: (0, 0)}  # FIRST delivery preserved

        # (5) a fresh epoch still lands normally
        t_d = " ".join(f"ash{i} haw{i % 4}" for i in range(25))
        proc(
            spark.createDataFrame([(40, t_d, "en", "z1", len(t_d))],
                                  DOCS_SCHEMA),
            2,
        )
        assert inner_calls == [0, 1, 2]
        assert store.read("cls_log").count() == 4

        # (6) concurrent FIRST use of a fresh artifact: two streams'
        # sinks (distinct namespaces) race exists+create — the lock
        # makes the auto-backfill once-only, so NEITHER stream's
        # landed epoch is wiped by the other's overwrite (r15 review)
        import threading

        sinks = [
            epoch_keyed_sink(store, "cls_race", f"race-{i}")
            for i in range(2)
        ]
        cls_a = simhash_cls_from_history(d1, store.read("simhash"))
        cls_b = simhash_cls_from_history(d2, store.read("simhash"))
        results = []
        threads = [
            threading.Thread(
                target=lambda s_, c_: results.append(s_(c_, 0)),
                args=(sinks[i], (cls_a, cls_b)[i]),
            )
            for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert results == [True, True]
        assert (
            store.read("cls_race").count() == cls_a.count() + cls_b.count()
        )
    finally:
        store.drop()


def test_epoch_keyed_sink_empty_epochs(spark):
    """r16 (VERDICT r15 #5 / ADVICE): the empty-epoch contracts are
    aligned — the store's vacuous-landing rule returns True for a
    zero-row epoch on EVERY delivery (no provenance to replay-detect),
    and the sink now keeps `inner` effectively-once by never firing it
    for empty frames. Pins: (1) an empty epoch returns landed=True on
    first delivery AND on re-delivery, with inner silent both times
    and no rows in the log; (2) a later non-empty epoch fires inner
    exactly once, its re-delivery is dropped (False, inner silent);
    (3) a trailing empty re-delivery still never fires inner — the
    vacuous True is the store's defined behavior, the sink's inner
    contract is unconditional."""
    from iceberg_explorer_spark.operators.dedup import simhash_signatures
    from iceberg_explorer_spark.operators.incremental_artifacts import (
        BucketedArtifactStore,
        simhash_cls_from_history,
    )
    from iceberg_explorer_spark.streaming.dedup import (
        DOCS_SCHEMA,
        epoch_keyed_sink,
    )

    store = BucketedArtifactStore(
        spark, "t_sink_empty", n_buckets=2,
        artifacts={"simhash": ("doc_id",), "cls_log": ("doc_id",)},
    )
    try:
        t_a = " ".join(f"elm{i} oak{i % 5}" for i in range(25))
        store.write(
            "simhash",
            simhash_signatures(
                spark.createDataFrame([(3, t_a, "en", "web", len(t_a))],
                                      DOCS_SCHEMA)
            ),
        )
        inner_calls = []
        sink = epoch_keyed_sink(
            store, "cls_log", "empty-contract",
            inner=lambda cls, e: inner_calls.append(int(e)),
        )
        empty = simhash_cls_from_history(
            spark.createDataFrame([], DOCS_SCHEMA), store.read("simhash")
        )
        # (1) vacuous landing, both deliveries; inner never fires
        assert sink(empty, 0) is True
        assert sink(empty, 0) is True  # re-delivery: True again (defined)
        assert inner_calls == []
        assert store.read("cls_log").count() == 0
        # (2) a non-empty epoch: inner exactly once, replay dropped
        t_b = " ".join(f"yew{i} ash{i % 7}" for i in range(25))
        cls1 = simhash_cls_from_history(
            spark.createDataFrame([(11, t_b, "en", "s1", len(t_b))],
                                  DOCS_SCHEMA),
            store.read("simhash"),
        )
        assert sink(cls1, 1) is True
        assert sink(cls1, 1) is False
        assert inner_calls == [1]
        # (3) trailing empty re-delivery: still vacuous, still silent
        assert sink(empty, 0) is True
        assert inner_calls == [1]
    finally:
        store.drop()
