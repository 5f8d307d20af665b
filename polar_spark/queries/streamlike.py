"""Stream-semantics queries over the `events` table (SURVEY.md §2.1).

These oracle-check the engine's topic semantics in batch form: partition
placement, contiguous offset assignment, poll-after-commit, reset
policies, JSON payload parsing, event-time windows (tumbling / sliding /
session), and at-least-once dedup — the behaviors the reference's
integration suite asserts (internal/test/integration/roundtrip_test.go).

Partitioner note: the engine's hot path places rows with JVM-side
``pmod(xxhash64(key), P)`` (hashing.partition_col). For oracle
comparability these queries use the documented SQL-parity partitioner
``(user_id * 2654435761) mod 2^32 mod P`` (Knuth multiplicative hash) —
same placement law (deterministic key→partition), expressible in any
ANSI engine. Murmur3 byte parity is covered by tests/test_hashing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.operators.sessionize import sessionize
from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table

P = 12  # 3 brokers × 4 consumer ranges (reference defaults)

_PART = f"pmod(pmod(user_id * 2654435761, 4294967296), {P})"
_PART_DUCK = f"((user_id * 2654435761) % 4294967296) % {P}"


def _with_partition_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    part = F.expr(_PART).cast("int").alias("partition")
    w = Window.partitionBy("partition").orderBy("ts", "event_id")
    return (
        ev.select("event_id", "ts", "user_id", "event_type", "value", "props", part)
        .withColumn("offset", (F.row_number().over(w) - 1).cast("long"))
    )


@query(
    "ingest_partition_offset",
    oracle=f"""
SELECT event_id, {_PART_DUCK} AS partition,
  ROW_NUMBER() OVER (PARTITION BY {_PART_DUCK} ORDER BY ts, event_id) - 1 AS offset
FROM events
""",
)
def ingest_partition_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition placement + contiguous per-partition offset assignment —
    the produce path's core invariant (coalescer offset assignment,
    internal/producing/coalescer.go:164-170)."""
    df = _with_partition_offset(spark, sf_dir)
    return df.select("event_id", "partition", F.col("offset"))


@query(
    "consume_poll_window",
    oracle=f"""
WITH t AS (
  SELECT event_id, user_id, {_PART_DUCK} AS partition,
    ROW_NUMBER() OVER (PARTITION BY {_PART_DUCK} ORDER BY ts, event_id) - 1 AS offset
  FROM events
)
SELECT event_id, "partition", "offset" FROM t WHERE "offset" > 100 AND "offset" <= 150
""",
)
def consume_poll_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A poll after commit=100 with a 50-record-per-partition budget —
    the offset-range read of the consumer path (segment_reader seek +
    ConsumerReadThreshold, internal/consuming/group_read_queue.go)."""
    df = _with_partition_offset(spark, sf_dir)
    return df.filter((F.col("offset") > 100) & (F.col("offset") <= 150)).select(
        "event_id", "partition", "offset"
    )


@query(
    "consume_reset_latest",
    oracle=f"""
SELECT {_PART_DUCK} AS partition, COUNT(*) AS n
FROM events WHERE ts >= TIMESTAMP '2024-01-20'
GROUP BY {_PART_DUCK}
""",
)
def consume_reset_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startFromLatest reset: only events after registration time are
    visible (internal/consuming/offset_state.go:139-236)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") >= F.lit("2024-01-20").cast("timestamp"))
        .select(F.expr(_PART).cast("bigint").alias("partition"))
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "consume_seek_timestamp",
    oracle=f"""
WITH t AS (
  SELECT event_id, ts, {_PART_DUCK} AS partition,
    ROW_NUMBER() OVER (PARTITION BY {_PART_DUCK} ORDER BY ts, event_id) - 1 AS offset
  FROM events
), starts AS (
  SELECT partition, MIN("offset") AS s FROM t
  WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY partition
)
SELECT t.event_id, t.partition, t."offset"
FROM t JOIN starts USING (partition) WHERE t."offset" >= starts.s
""",
)
def consume_seek_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seek-by-time (Kafka offsetsForTimes law, engine implementation
    ConsumerGroup.seek_to_timestamp — pytest-driven against a real topic
    with non-monotonic event time): per partition, reposition at the
    MIN offset whose record ts >= T and re-serve from there to the
    tail. The engine path pushes ts >= T into parquet footer stats so
    wholly-older segments prune at the listing."""
    df = _with_partition_offset(spark, sf_dir)
    wseek = Window.partitionBy("partition")
    first = F.min(
        F.when(
            F.col("ts") >= F.lit("2024-01-15").cast("timestamp"), F.col("offset")
        )
    ).over(wseek)
    return (
        df.withColumn("_s", first)
        .filter(F.col("offset") >= F.col("_s"))
        .select("event_id", "partition", "offset")
    )


@query(
    "consume_log_start_jump",
    oracle=f"""
WITH t AS (
  SELECT event_id, ts, {_PART_DUCK} AS partition,
    ROW_NUMBER() OVER (PARTITION BY {_PART_DUCK} ORDER BY ts, event_id) - 1 AS offset
  FROM events
), heads AS (
  SELECT partition, MIN("offset") AS head FROM t
  WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY partition
)
SELECT t.event_id, t.partition, t."offset"
FROM t JOIN heads USING (partition)
WHERE t."offset" >= heads.head AND t."offset" < heads.head + 50
""",
)
def consume_log_start_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-start clamp law (r10; Kafka logStartOffset analog, engine
    implementation TopicCatalog.heads + the poll waterfill clamp,
    pytest-driven against real vacuumed topics in test_longevity.py):
    after retention expired every record before T, a fresh earliest
    consumer's FIRST poll with a 50-record-per-partition budget serves
    offsets [head, head+50) where head is the partition's first retained
    offset — one poll, not gap/max_records empty windows. Offsets are
    ts-ordered per partition, so the declarative head is the min offset
    with ts >= T."""
    df = _with_partition_offset(spark, sf_dir)
    whead = Window.partitionBy("partition")
    head = F.min(
        F.when(
            F.col("ts") >= F.lit("2024-01-15").cast("timestamp"), F.col("offset")
        )
    ).over(whead)
    return (
        df.withColumn("_h", head)
        .filter((F.col("offset") >= F.col("_h")) & (F.col("offset") < F.col("_h") + 50))
        .select("event_id", "partition", "offset")
    )


@query(
    "json_payload_extract",
    oracle="""
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
)
def json_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parsing — the consumer's JSON format surface
    (from_json/get_json_object over opaque bodies,
    internal/consuming/models.go:136-199)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "window_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
""",
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (streaming form:
    F.window(ts, '1 hour') + watermark — see streaming/aggregates.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(15,4)")).alias("_sv"),
        )
        .select("hour", "event_type", "n", F.col("_sv").cast("double").alias("sum_value"))
    )


@query(
    "window_sliding_1h_30m",
    oracle="""
WITH w AS (
  SELECT e.*, CAST(wstart AS TIMESTAMP) AS wstart
  FROM events e,
       UNNEST([to_timestamp(epoch_us(ts) // 1800000000 * 1800),
               to_timestamp(epoch_us(ts) // 1800000000 * 1800 - 1800)]) AS t(wstart)
)
SELECT wstart, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS sum_value
FROM w GROUP BY wstart
""",
)
def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide): each event lands in two
    epoch-aligned windows — F.window handles assignment natively."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(15,4)")).alias("_sv"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "n",
            F.col("_sv").cast("double").alias("sum_value"),
        )
    )


@query(
    "session_windows_30m",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts, event_id,
    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
  MIN(ts) AS session_start,
  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM s GROUP BY user_id, session_id
""",
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min), lag+cumsum — the scalable batch
    form of F.session_window (operators/sessionize.py)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, tiebreakers=("event_id",))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@query(
    "dedup_redelivered_events",
    oracle="""
WITH redelivered AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 10 = 0
)
SELECT event_type, COUNT(DISTINCT event_id) AS n_unique, COUNT(*) AS n_delivered
FROM redelivered GROUP BY event_type
""",
)
def dedup_redelivered_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once consumer dedup: re-deliver a tail slice (as a broker
    failover would), then exact-dedup by event id — the client-side dedup
    story for the reference's at-least-once guarantee
    (docs/benchmarks/README.md:11-12)."""
    ev = load_table(spark, sf_dir, "events")
    redelivered = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    return redelivered.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_unique"),
        F.count(F.lit(1)).alias("n_delivered"),
    )


@query(
    "binary_frame_roundtrip",
    oracle="""
SELECT CAST(event_id % 65536 AS INTEGER) AS stream_id, 0 AS record_idx,
  ts AS timestamp, event_id::VARCHAR AS key, props AS value
FROM events
""",
)
def binary_frame_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binary framed produce path (reference op #2,
    internal/producing/binary_server.go): records encoded into
    CRC-checked produce frames, then decoded back — the decode output is
    exactly the produce-record stream, proving the wire codec is
    lossless."""
    from polar_spark.sources.frames import (
        decode_produce_frames,
        encode_produce_frames,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("k"),
        "props",
        "ts",
        (F.col("event_id") % 65536).alias("sid"),
    )
    frames = encode_produce_frames(ev, "k", "props", "ts", stream_id_col="sid")
    return decode_produce_frames(frames)


@query(
    "rollup_time_multires",
    oracle="""
SELECT
  CASE WHEN GROUPING(date_trunc('day', ts)) = 0 AND GROUPING(date_trunc('hour', ts)) = 1
       THEN 'day' ELSE 'hour' END AS resolution,
  COALESCE(date_trunc('hour', ts), date_trunc('day', ts)) AS bucket_ts,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)))
""",
)
def rollup_time_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass produces
    the same measures at hour AND day resolution via GROUPING SETS (the
    partial aggregates are shared map-side; a materialized multi-res
    rollup table at 100 TB is this query's output partitioned by
    resolution)."""
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        "ts", F.floor(F.col("value") * 100).cast("bigint").alias("cents")
    ).createOrReplaceTempView("_ev_rollup")
    return spark.sql("""
SELECT
  CASE WHEN GROUPING(date_trunc('day', ts)) = 0 AND GROUPING(date_trunc('hour', ts)) = 1
       THEN 'day' ELSE 'hour' END AS resolution,
  COALESCE(date_trunc('hour', ts), date_trunc('day', ts)) AS bucket_ts,
  COUNT(*) AS n_events,
  SUM(cents) AS sum_cents
FROM _ev_rollup
GROUP BY GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)))
""")


@query(
    "gapfill_hourly_locf",
    oracle="""
WITH b AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
    COUNT(*) AS n_rows,
    CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
)
SELECT g.event_type, g.bucket,
  COALESCE(b.n_rows, 0) AS n_rows,
  CAST(last_value(b.sum_cents IGNORE NULLS) OVER (
    PARTITION BY g.event_type ORDER BY g.bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_cents
FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.bucket = g.bucket
""",
)
def gapfill_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time_bucket_gapfill + locf: hourly buckets per
    event_type, every bucket in each type's span materialized (n_rows=0
    for gaps) and sum_cents carried forward from the last non-empty
    bucket (operators/gapfill.py — grid via sequence+explode, one keyed
    agg + one keyed window, no driver loops)."""
    from polar_spark.operators.gapfill import gapfill_locf

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", F.floor(F.col("value") * 100).cast("bigint").alias("cents")
    )
    out = gapfill_locf(
        ev,
        key="event_type",
        ts="ts",
        bucket_seconds=3600,
        aggs={"sum_cents": F.sum("cents")},
        locf_cols=["sum_cents"],
    )
    return out.select("event_type", "bucket", "n_rows", "sum_cents")


@query(
    "funnel_click_to_purchase",
    oracle="""
WITH first_click AS (
  SELECT user_id, MIN(ts) AS c_ts FROM events
  WHERE event_type = 'click' GROUP BY user_id
), converted AS (
  SELECT DISTINCT f.user_id
  FROM first_click f JOIN events p
    ON p.user_id = f.user_id AND p.event_type = 'purchase'
   AND p.ts >= f.c_ts AND p.ts <= f.c_ts + INTERVAL 1 HOUR
)
SELECT CAST(dayofweek(f.c_ts) + 1 AS INTEGER) AS dow,
  COUNT(*) AS n_clicked,
  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_converted,
  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS conversion_rate
FROM first_click f LEFT JOIN converted c ON f.user_id = c.user_id
GROUP BY dayofweek(f.c_ts) + 1
""",
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: of users whose FIRST click happened on
    each weekday, how many purchased within the following hour — the
    product-analytics conversion query.

    Scale shape: first-click is one keyed agg; the conversion probe
    joins events once on user_id (both sides hash-partition on the same
    key, no broadcast needed at corpus scale); the weekday rollup is a
    7-row aggregate. Weekday numbering: Spark dayofweek is 1=Sunday,
    DuckDB's is 0=Sunday — the oracle adds 1 to align."""
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_click.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id")
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    j = first_click.join(converted, "user_id", "left")
    conv = F.when(F.col("_conv").isNotNull(), 1).otherwise(0)
    return j.groupBy(F.dayofweek("c_ts").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_clicked"),
        F.sum(conv).cast("bigint").alias("n_converted"),
        (F.sum(conv).cast("double") / F.count(F.lit(1))).alias("conversion_rate"),
    )


@query(
    "retention_cohort_daily",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), co AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT cohort_day,
  date_diff('day', cohort_day, day) AS day_offset,
  COUNT(DISTINCT ud.user_id) AS n_users
FROM ud JOIN co ON ud.user_id = co.user_id
GROUP BY cohort_day, date_diff('day', cohort_day, day)
""",
)
def retention_cohort_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, with
    the count of them still active at each day offset — the standard
    product-analytics rollup a broker's event stream feeds.

    Scale: the (user, day) distinct and the per-user min reuse one hash
    shuffle family on user_id; the cohort table is |users|-sized so the
    re-join is a shuffled hash join on user_id (NOT broadcast — at 100 TB
    the user dimension is large), and the final matrix is
    days × offsets — tiny. countDistinct is exact (the matrix needs it);
    the sketch variants live in functions/sketches.py for when
    approximate is acceptable.
    """
    ev = load_table(spark, sf_dir, "events")
    user_day = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = user_day.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        user_day.join(cohort, "user_id")
        .groupBy(
            "cohort_day", F.datediff("day", "cohort_day").alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "top_event_transitions",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev || '>' || event_type AS transition, COUNT(*) AS cnt
FROM o WHERE prev IS NOT NULL
GROUP BY prev || '>' || event_type
ORDER BY cnt DESC, transition LIMIT 15
""",
)
def top_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the most common consecutive event-type
    transitions across user sessions (the first-order Markov view of
    the event stream; event_id breaks timestamp ties so both engines
    order identically).

    Scale: ONE hash shuffle on user_id for the lag window (at 100 TB the
    stored topic layout is already user-partitioned when produced with
    key_col=user_id — the exchange then collapses to a local sort), a
    map-side-combined count into ≤ |event_types|² groups, TakeOrdered
    top-15. No joins, no explode.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.concat_ws(">", "prev", "event_type").alias("transition"))
        .groupBy("transition")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("transition"))
        .limit(15)
    )


@query(
    "event_rate_anomaly",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), trail AS (
  SELECT event_type, hour, n,
    COUNT(*) OVER w AS m,
    SUM(n) OVER w AS s,
    SUM(n * n) OVER w AS sq
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n,
  CAST(m AS BIGINT) AS m, CAST(s AS BIGINT) AS s,
  CASE WHEN m >= 12
        AND CAST(n * m - s AS DECIMAL(19,0)) * CAST(n * m - s AS DECIMAL(19,0))
            > CAST(9 * m AS DECIMAL(3,0)) * CAST(sq AS DECIMAL(19,0))
              - CAST(3 * s AS DECIMAL(19,0)) * CAST(3 * s AS DECIMAL(19,0))
       THEN 1 ELSE 0 END AS anomaly
FROM trail
""",
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ops staple: flag hours whose event rate deviates >3σ
    from the trailing 24-hour mean, per event type. The z-score test is
    algebraically cleared of division — flag iff
    (n·m − s)² > (9m)·sq − (3s)² over integer counts — so both engines
    decide every row with exact arithmetic (no float variance whose
    last bit could flip a flag). The squares run in DECIMAL(19,0)² →
    (38,0): an int64 square would overflow once an hourly count passes
    ~1.2·10⁸ (a hot type at 100 TB), and Spark's ANSI mode would throw
    where DuckDB silently promotes to HUGEINT — folding the 9 into the
    operands (9m ≤ tiny, 3s still < 10¹⁹) keeps every product within
    DECIMAL(38,0) on BOTH engines. Warm-up hours (fewer than 12
    trailing samples) never flag.

    Scale: one hash shuffle into (type, hour) groups (map-side
    combinable — the shuffle carries hourly aggregates, not events),
    then a bounded ROWS-frame window per type over the tiny hourly
    series. The same shape runs continuously as a Structured Streaming
    sliding aggregate (streaming/aggregates.py) with the flag applied in
    foreachBatch.
    """
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    t = hourly.select(
        "event_type",
        "hour",
        "n",
        F.count(F.lit(1)).over(w).alias("m"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
    )
    dev = (F.col("n") * F.col("m") - F.col("s")).cast("decimal(19,0)")
    nine_m = (F.lit(9) * F.col("m")).cast("decimal(3,0)")
    three_s = (F.lit(3) * F.col("s")).cast("decimal(19,0)")
    rhs = nine_m * F.col("sq").cast("decimal(19,0)") - three_s * three_s
    return t.select(
        "event_type",
        "hour",
        "n",
        "m",
        "s",
        F.when((F.col("m") >= 12) & (dev * dev > rhs), 1)
        .otherwise(0)
        .alias("anomaly"),
    )


@query(
    "scd2_user_type_intervals",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
    LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type, ts, event_id,
    SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id
  FROM ordered
), runs AS (
  SELECT user_id, event_type, run_id,
    MIN(ts) AS effective_from, COUNT(*) AS n_events
  FROM changes GROUP BY user_id, event_type, run_id
)
SELECT user_id, event_type, CAST(run_id AS BIGINT) AS run_id,
  effective_from,
  LEAD(effective_from) OVER (PARTITION BY user_id ORDER BY run_id)
    AS effective_to,
  n_events
FROM runs
""",
)
def scd2_user_type_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build, Spark-first: each
    user's consecutive runs of one event type become validity intervals
    [effective_from, effective_to) — the change-tracking table a MERGE
    statement maintains row-by-row in a warehouse, derived here in one
    declarative pass (gaps-and-islands: lag to mark change points,
    running sum to number runs, lead for the closing edge; event_id
    breaks timestamp ties so both engines order identically; the
    current run's effective_to is NULL = open interval).

    Scale: ONE hash shuffle on user_id serves all three window passes
    (same partitioning — Catalyst reuses the exchange), then a
    (user, run) aggregation that combines map-side. No joins, no state,
    no MERGE: at 100 TB this rebuilds the full dimension in a single
    pass, or runs incrementally per micro-batch over only the users
    present in the batch.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    changed = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = (
        ev.withColumn("run_id", F.sum(changed).over(w))
        .groupBy("user_id", "event_type", "run_id")
        .agg(
            F.min("ts").alias("effective_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        "event_type",
        F.col("run_id").cast("bigint").alias("run_id"),
        "effective_from",
        F.lead("effective_from").over(w2).alias("effective_to"),
        "n_events",
    )


@query(
    "session_entry_exit_paths",
    oracle="""
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, ts, event_id,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
  FROM marked
), ranked AS (
  SELECT user_id, sess_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id, sess_id ORDER BY ts, event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY user_id, sess_id ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM sess
), paths AS (
  SELECT user_id, sess_id,
    MIN(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
    MIN(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type
  FROM ranked GROUP BY user_id, sess_id
)
SELECT entry_type, exit_type, COUNT(*) AS n_sessions
FROM paths GROUP BY entry_type, exit_type
""",
)
def session_entry_exit_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: how users enter and leave 30-minute
    sessions — the (entry event type, exit event type) distribution
    (complements top_event_transitions' within-session view).
    Gaps-and-islands sessionization; event_id breaks timestamp ties so
    both engines pick identical entry/exit rows, and the 30-minute gap
    compares in exact MICROSECONDS on both sides (a seconds-truncating
    cast would misclassify gaps within a second of the boundary).

    Scale: every window partitions on user_id (or its (user, session)
    refinement) — ONE user-hash exchange serves the whole chain; the
    final matrix is ≤ |types|² rows with map-side partials.
    """
    ev = load_table(spark, sf_dir, "events")
    # reuse the sessionize operator (same lag/unix_micros/cumsum chain
    # session_windows_30m runs) — one gap law, defined once
    sess = sessionize(
        ev, key="user_id", ts="ts", gap_seconds=1800,
        session_col="sess_id", tiebreakers=("event_id",),
    )
    ws = Window.partitionBy("user_id", "sess_id")
    ranked = sess.select(
        "user_id",
        "sess_id",
        "event_type",
        F.row_number()
        .over(ws.orderBy("ts", "event_id"))
        .alias("rn_a"),
        F.row_number()
        .over(ws.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    paths = ranked.groupBy("user_id", "sess_id").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias("entry_type"),
        F.min(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias("exit_type"),
    )
    return paths.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


@query(
    "debounce_repeated_events",
    oracle="""
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
    epoch_us(ts) - epoch_us(LAG(ts) OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_id, user_id, event_type, ts
FROM g WHERE gap_us IS NULL OR gap_us > 300000000
""",
)
def debounce_repeated_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: drop an event when the SAME (user, type) fired within
    the previous 5 minutes — the duplicate-click / retry-storm cleaning
    step (distinct from dedup_redelivered_events' exact-id dedup: here
    the ids differ and the signal is temporal proximity). Gap compared
    in exact microseconds; event_id breaks timestamp ties.

    Scale: one hash shuffle on (user, type) for the lag window — state
    is one previous timestamp per partition-local group, nothing
    accumulates. The streaming form is
    ``dropDuplicatesWithinWatermark`` on a (user, type) key (covered by
    stateful_dedup_builtin's machinery).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("_gap", gap)
        .filter(F.col("_gap").isNull() | (F.col("_gap") > 300_000_000))
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "decayed_event_rate",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') AS INT) AS age
  FROM events
), bucketed AS (
  SELECT event_type, age, COUNT(*) AS cnt FROM d GROUP BY event_type, age
)
SELECT event_type,
  CAST(SUM(CASE WHEN age BETWEEN 0 AND 62 THEN cnt >> age ELSE 0 END) AS BIGINT) AS decayed_score,
  CAST(SUM(cnt) AS BIGINT) AS n_total
FROM bucketed GROUP BY event_type
""",
)
def decayed_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score per event type with a
    one-day half-life — the trending/feature-store recency metric —
    in EXACT integers: weight 2^-age applies as a per-day-bucket right
    shift (cnt_d >> age_d), so the score is engine-exact and mergeable
    (day buckets are additive; a streaming sink maintains them like any
    count partial and the serving read applies the shifts — decay costs
    nothing at write time, the classic epoch-halving trick).

    Ages are clamped to [0, 62] in BOTH engines: a future-dated event
    (negative age) gets weight 0 rather than hitting engine-specific
    shift semantics (Spark's shiftright wraps the amount mod 64;
    DuckDB's >> does not), and age >= 63 underflows to 0 anyway.

    Scale: ONE map-side-combined aggregation to (type, day) buckets —
    O(types · days) rows — then the shift-weighted rollup; the corpus
    never shuffles at event grain."""
    d = load_table(spark, sf_dir, "events")
    b = (
        d.select(
            "event_type",
            F.datediff(F.lit("2024-01-31").cast("date"), F.col("ts").cast("date")).alias("age"),
        )
        .groupBy("event_type", "age")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return b.groupBy("event_type").agg(
        F.sum(
            F.when(
                F.col("age").between(0, 62), F.expr("shiftright(cnt, age)")
            ).otherwise(0)
        ).cast("long").alias("decayed_score"),
        F.sum("cnt").cast("long").alias("n_total"),
    )


@query(
    "novelty_first_seen_daily",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT CAST(CAST(first_ts AS DATE) AS VARCHAR) AS day,
  COUNT(*) AS n_new_users
FROM f GROUP BY 1
""",
)
def novelty_first_seen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve of the stream: first-ever-seen users per day (the
    new-vs-returning split every ingest dashboard tracks, and the
    corpus-novelty signal a training pipeline watches to detect a
    source going stale). Two map-side-combined aggregations — per-user
    min(ts), then a day rollup over O(users) rows; the raw stream
    shuffles once on user_id."""
    d = load_table(spark, sf_dir, "events")
    f = d.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        f.select(F.col("first_ts").cast("date").cast("string").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_new_users"))
    )
