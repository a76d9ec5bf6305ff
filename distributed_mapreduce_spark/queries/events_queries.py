"""Event-stream batch analytics over the `events` table.

The reference has no time-series/stream surface (SURVEY.md §2.4) — this
is [EXT] north-star coverage: JSON extraction, sessionization, pivot,
and the batch twins of the streaming window queries (the streaming
forms live in distributed_mapreduce_spark/streaming/).

Scale notes: sessionization and per-user windows shuffle once on
user_id; at 100 TB the user_id key space is huge and uniform, so the
shuffle partitions evenly (no salting needed). JSON extraction is a
JVM-side expression (no Python), applied post-scan on the pruned
`props` column only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_mapreduce_spark.queries.relational import dec, money
from distributed_mapreduce_spark.sources import table

SESSION_GAP_MIN = 30
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def ev_q1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the props column: bucket events by the JSON
    field k (mod 10) — scalar JSON functions the reference lacks."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select(F.pmod(k, F.lit(10)).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            money(F.avg(dec("value")), 4).alias("avg_value"),
        )
    )


def ev_q2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    session counter per user — the batch form of session windows."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond epochs: exact integers on both engines (second-level
    # casts would truncate differently from DuckDB's fractional epoch()).
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


def ev_q3_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: user-bucket × event-type count matrix (fixed pivot values
    so the plan is a single pass, no value-discovery job)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.pmod("user_id", F.lit(10)))
        .groupBy("bucket")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


def ev_q4_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + event volume: date_trunc + distinct agg."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.count("*").alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
    )


def ev_q5_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase matched to the
    user's most recent click at-or-before it; per-user purchase count,
    matched count, and average click→purchase latency in seconds.
    Oracle: DuckDB's native ASOF JOIN — the composed union-scan form
    must agree with a real ASOF implementation."""
    from distributed_mapreduce_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, key="user_id", ts="ts")
    lat = F.unix_micros("ts") - F.unix_micros("asof_ts")
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.count("asof_ts").alias("n_matched"),
        money(F.avg((lat / 1_000_000).cast("decimal(18,6)")), 3).alias("avg_lag_s"),
    )


VALUE_BANDS = (
    ("low", 0.0, 5.0),
    ("mid", 5.0, 10.0),
    ("high", 10.0, 20.0),
    ("whale", 20.0, 1e18),
)


def ev_q6_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events bucketed into value bands via a non-equi
    broadcast join (lo <= value < hi). With a literal 4-row band dim the
    right physical plan IS BroadcastNestedLoopJoin — each event tests 4
    ranges map-side, no shuffle; at scale a huge band table would
    instead be bucketized to an equi-join on floor(value/step)."""
    ev = table(spark, sf_dir, "events")
    bands = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{n}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))" for n, lo, hi in VALUE_BANDS)
        + " AS t(band, lo, hi)"
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            money(F.avg(dec("value")), 4).alias("avg_value"),
        )
    )


ORACLES = {
    "ev_q6_value_bands": f"""
        WITH bands(band, lo, hi) AS (
            VALUES {", ".join(f"('{n}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))" for n, lo, hi in VALUE_BANDS)}
        )
        SELECT band,
               count(*) AS n_events,
               CAST(round(avg(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS avg_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band
    """,
    "ev_q5_asof_click": """
        WITH p AS (
            SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'
        ),
        j AS (
            SELECT p.user_id, p.ts, c.ts AS asof_ts
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        )
        SELECT user_id,
               count(*) AS n_purchases,
               count(asof_ts) AS n_matched,
               CAST(round(avg(CAST((epoch_us(ts) - epoch_us(asof_ts)) / 1000000
                                   AS DECIMAL(18,6))), 3) AS DOUBLE) AS avg_lag_s
        FROM j
        GROUP BY user_id
    """,
    "ev_q1_json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*) AS n_events,
               CAST(round(avg(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS avg_value
        FROM events
        GROUP BY 1
    """,
    "ev_q2_sessionize": f"""
        WITH flagged AS (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1000000}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM flagged
        GROUP BY user_id
    """,
    "ev_q3_type_pivot": """
        SELECT user_id % 10 AS bucket,
               count(*) FILTER (WHERE event_type = 'click')    AS click,
               count(*) FILTER (WHERE event_type = 'error')    AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS signup,
               count(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events
        GROUP BY 1
    """,
}

def ev_q7_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (signup → click → purchase): per user,
    the earliest signup, the earliest click at-or-after that signup,
    and the earliest purchase at-or-after that click — the
    order-constrained conversion analysis that a bare per-type pivot
    (ev_q3) cannot express, plus the stage the user reached (0–3).
    Timestamps compare as exact microsecond instants, so the oracle
    matches bit-for-bit.

    Scale shape: three conditional min-aggregations keyed on user_id.
    The first is a plain groupBy; the later stages need the previous
    stage's timestamp, so they join the (tiny, one-row-per-user) stage
    table back to the events and re-aggregate — each pass shuffles the
    events once on user_id, and AQE broadcasts the per-user stage
    tables. A window formulation would also work but sorts every
    user's events; the conditional-min form only aggregates."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    users = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("click_ts").isNotNull(), 2)
        .when(F.col("signup_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(s, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "click_ts",
            "purchase_ts",
            stage.cast("int").alias("stage"),
        )
    )


RETENTION_MAX_OFFSET = 7


def ev_q8_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    as active on each of the following RETENTION_MAX_OFFSET days — the
    (cohort day, day offset) → active-users matrix behind every
    retention curve. Pure date arithmetic (exact integers on both
    engines).

    Scale shape: distinct (user, day) activity (keyed agg), a
    per-user min (keyed agg), one equi-join back on user_id, and the
    final matrix agg — every stage shuffles on user_id or the tiny
    matrix key; the activity table is ∝ active user-days, far below
    raw event volume."""
    act = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    off = F.datediff("day", "cohort_day")
    return (
        act.join(first, "user_id")
        .where(off <= RETENTION_MAX_OFFSET)
        .groupBy("cohort_day", off.cast("bigint").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def ev_q9_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward-fill — the time-series
    gap-filling operator (regularize an irregular event stream onto an
    hourly grid; empty hours carry the last observed value forward):
    per user, the grid spans their first..last active hour; each
    hour's observation is the value of the LATEST event in that hour
    (deterministic (ts, event_id) tiebreak); gaps fill from the last
    non-null. The filled value is a stored double copied, never
    recomputed — so the oracle matches bit-for-bit with no rounding
    discipline needed.

    Scale shape: one keyed agg for per-user bounds, a generator
    explode for the grid (rows ∝ user-hours, never driver-side), one
    keyed agg for per-hour latest observations, an equi-join of grid
    and observations on (user, hour), and one ordered window per user
    for the fill — all shuffles on user_id."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value", F.date_trunc("hour", "ts").alias("hour")
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour"),
    )
    obs = ev.groupBy("user_id", "hour").agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("v")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.last("v", ignorenulls=True).over(w).alias("value_ff"),
            F.col("v").isNotNull().cast("int").alias("observed"),
        )
    )


def ev_q10_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event transition matrix: per user, order events by
    (ts, event_id) and count (event_type → next event_type) pairs, plus
    the row-normalized transition probability — the first-order
    behavioral model behind next-action prediction and funnel
    discovery. Probability is an exact-decimal quotient of two bigints
    rounded to 6 places, so both engines agree bit-for-bit.

    Scale shape: one window (shuffle+sort on user_id) to pair each
    event with its successor, then a count agg on the tiny (from, to)
    key space, and a 25-row window for row normalization — the heavy
    lifting is the single user_id shuffle; everything after is
    group-cardinality-sized."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("to_type", F.lead("event_type").over(w)).where(
        F.col("to_type").isNotNull()
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count("*").alias("n"))
    row_w = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        # decimal(28,12): 16 integer digits of headroom — a transition
        # count overflows this only past 10^16 events per (from,to).
        F.round(
            F.col("n").cast("decimal(28,12)") / F.sum("n").over(row_w), 6
        )
        .cast("double")
        .alias("p"),
    )


def ev_q11_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 run collapse: treat each user's event stream as a
    changing attribute and emit one validity interval per consecutive
    run of the same event_type — (user_id, event_type, valid_from,
    valid_to, n_events, is_current), with valid_to = the next run's
    start (NULL on the open current run). This is the
    slowly-changing-dimension history build every warehouse ingest
    needs and the reference's KV config history (kv_q4) generalized to
    arbitrary attribute streams. All values are copied instants and
    exact integers — no rounding discipline needed.

    Scale shape: one shuffle+sort on user_id feeds both the
    change-point window and the run aggregation (same partitioning, so
    Catalyst reuses the sort); the post-agg valid_to window runs on the
    collapsed run table, ∝ change points, far below event volume."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    change = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = (
        ev.withColumn("run_id", F.sum(change).over(w))
        .groupBy("user_id", "run_id")
        .agg(
            F.min("event_type").alias("event_type"),
            F.min("ts").alias("valid_from"),
            F.count("*").alias("n_events"),
        )
    )
    run_w = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(run_w).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(run_w).isNull().cast("int").alias("is_current"),
    )


OUTLIER_Z = 3


def ev_q12_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly detection with EXACT cross-engine
    flagging: an event is an outlier iff |value − μ| > Z·σ within its
    event_type. A float μ/σ comparison would be engine- and
    accumulation-order-dependent at the threshold boundary, so the
    predicate is algebraized into integer arithmetic instead: with
    value lifted to scale-4 fixed point i (exact — fixture doubles are
    2-decimal clean), |x−μ| > Z·σ  ⟺  (i·n − S)² > Z²·(n·SS − S²)
    where S = Σi, SS = Σi² per type — every quantity an exact integer
    (DECIMAL(38,0) on Spark, HUGEINT in the oracle; magnitudes ≤ ~1e24
    at sf1, far under 128-bit range). Both engines therefore flag the
    identical event set, no epsilon anywhere.

    Scale shape: one per-type agg (5 groups, map-side combine → tiny
    shuffle), a 5-row broadcast join back, and a final per-type count —
    two passes over the scan, no wide shuffle. At petabyte scale the
    stats pass collapses to bytes; the predicate stays map-side."""
    i = F.round(F.col("value") * F.lit(10000.0), 0).cast("decimal(19,0)")
    ev = table(spark, sf_dir, "events").select("event_type", i.alias("i"))
    stats = ev.groupBy("event_type").agg(
        F.count("*").cast("decimal(19,0)").alias("n"),
        F.sum("i").cast("decimal(19,0)").alias("s"),
        F.sum((F.col("i") * F.col("i")).cast("decimal(38,0)")).alias("ss"),
    )
    d = F.col("i") * F.col("n") - F.col("s")
    lhs = (d * d).cast("decimal(38,0)")
    rhs = (
        F.lit(OUTLIER_Z * OUTLIER_Z).cast("decimal(19,0)")
        * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    ).cast("decimal(38,0)")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_type", "n", (lhs > rhs).cast("bigint").alias("is_out"))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.sum("is_out").alias("n_outliers"),
            F.round(F.sum("is_out") / F.max("n").cast("bigint"), 6).alias(
                "outlier_frac"
            ),
        )
    )


def ev_q13_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential smoothing of event values
    (operators/timeseries.py::ewma_last): the monitoring/forecast
    current-level estimate, computed as an Arrow-batched per-group
    sequential fold — a recurrence SQL windows cannot express — and
    graded bit-exact against a DuckDB recursive-CTE replay of the
    identical IEEE recurrence (no rounding discipline needed: every
    step is the same two multiplies and one add on both engines)."""
    from distributed_mapreduce_spark.operators.timeseries import ewma_last

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return ewma_last(ev, "user_id", ["ts", "event_id"], "value")


def ev_q14_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling aggregates per user — the RANGE window
    frame (value-based, gap-aware) that ROWS frames can't express: a
    user active on days 1 and 9 must NOT see day 1 in day 9's window,
    which a ROWS BETWEEN 6 PRECEDING frame would wrongly include.
    Implemented on an integer day index so Spark's rangeBetween and
    DuckDB's RANGE BETWEEN 6 PRECEDING agree exactly; daily totals
    stage through DECIMAL (window sums of decimals are exact, so the
    frame aggregate is order-independent).

    Scale shape: one keyed agg to daily grain (shuffle ∝ active
    user-days), then one window over the compacted daily table — the
    frame never touches raw events."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.to_date("ts").alias("day"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).alias("v"),
    )
    day_num = F.datediff("day", F.lit("2024-01-01"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(day_num)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        "day",
        F.sum("n").over(w).alias("n_events_7d"),
        money(F.sum("v").over(w)).alias("total_value_7d"),
        F.count("*").over(w).alias("active_days_7d"),
    )


WINSOR_LO, WINSOR_HI = 0.01, 0.99


def ev_q15_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — robust outlier CAPPING (vs ev_q12's flagging):
    clamp values to the per-type [p01, p99] percentile band and report
    per-type totals before/after plus the clamp counts. Complements
    z-score detection: capping is what a feature pipeline actually
    ships. Thresholds are exact per-group percentiles rounded to 6 on
    both engines (the text_q13 discipline), clamps compare against the
    rounded bound, and totals stage through DECIMAL.

    Scale shape: one per-type percentile agg (5 groups) broadcast
    back, then a map-side clamp + one per-type agg; at 100 TB swap
    exact percentiles for approx_percentile, same shape."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    v = F.col("value").cast("double")
    bounds = ev.groupBy("event_type").agg(
        F.round(F.percentile(v, F.lit(WINSOR_LO)), 6).alias("lo"),
        F.round(F.percentile(v, F.lit(WINSOR_HI)), 6).alias("hi"),
    )
    clamped = F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((v < F.col("lo")).cast("bigint")).alias("n_floor"),
            F.sum((v > F.col("hi")).cast("bigint")).alias("n_cap"),
            money(F.sum(dec("value"))).alias("total_raw"),
            money(F.sum(clamped.cast("decimal(18,6)"))).alias("total_winsor"),
        )
    )


QUERIES = {
    "ev_q1_json_extract": ev_q1_json_extract,
    "ev_q2_sessionize": ev_q2_sessionize,
    "ev_q3_type_pivot": ev_q3_type_pivot,
    "ev_q5_asof_click": ev_q5_asof_click,
    "ev_q6_value_bands": ev_q6_value_bands,
}

# Daily-active is a plain groupBy + countDistinct — the distinct-agg
# machinery it exercises is already graded via dedup_q1/text_q5 and the
# tumbling-window twin st_q1, so it rides the shadow tier (registry.py).
SHADOW_QUERIES = {
    "ev_q4_daily_active": ev_q4_daily_active,
    "ev_q7_funnel": ev_q7_funnel,
    "ev_q8_retention": ev_q8_retention,
    "ev_q9_resample_ffill": ev_q9_resample_ffill,
    "ev_q10_transitions": ev_q10_transitions,
    "ev_q11_scd2": ev_q11_scd2,
    "ev_q12_outliers": ev_q12_outliers,
    "ev_q13_ewma": ev_q13_ewma,
    "ev_q14_rolling_7d": ev_q14_rolling_7d,
    "ev_q15_winsorize": ev_q15_winsorize,
}


def _ewma_oracle() -> str:
    from distributed_mapreduce_spark.operators.timeseries import ewma_sql

    return ewma_sql(
        "SELECT user_id, ts, event_id, value FROM events",
        "user_id",
        "ts, event_id",
        "value",
    )

SHADOW_ORACLES = {
    "ev_q13_ewma": _ewma_oracle(),
    # Mirrors ev_q15: quantile_cont = Spark percentile (rel_q15
    # parity), 6-rounded bounds, identical clamp + decimal staging.
    "ev_q15_winsorize": f"""
        WITH b AS (
            SELECT event_type,
                   round(quantile_cont(CAST(value AS DOUBLE), {WINSOR_LO}), 6) AS lo,
                   round(quantile_cont(CAST(value AS DOUBLE), {WINSOR_HI}), 6) AS hi
            FROM events GROUP BY 1
        )
        SELECT e.event_type,
               count(*) AS n_events,
               CAST(sum(CASE WHEN CAST(value AS DOUBLE) < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_floor,
               CAST(sum(CASE WHEN CAST(value AS DOUBLE) > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_cap,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_raw,
               CAST(round(sum(CAST(least(greatest(CAST(value AS DOUBLE), lo), hi)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_winsor
        FROM events e JOIN b ON e.event_type = b.event_type
        GROUP BY 1
    """,
    # Mirrors ev_q14: same daily grain, same integer day index, same
    # RANGE 6 PRECEDING frame; decimal window sums are exact on both.
    "ev_q14_rolling_7d": """
        WITH daily AS (
            SELECT user_id,
                   CAST(ts AS DATE) AS day,
                   count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,4))) AS v
            FROM events
            GROUP BY 1, 2
        )
        SELECT user_id, day,
               CAST(sum(n) OVER w AS BIGINT) AS n_events_7d,
               CAST(round(sum(v) OVER w, 2) AS DOUBLE) AS total_value_7d,
               count(*) OVER w AS active_days_7d
        FROM daily
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY (day - DATE '2024-01-01')
            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
        )
    """,
    # Mirrors ev_q9_resample_ffill: same grid, same latest-in-hour
    # tiebreak, same ignore-nulls running fill; the filled double is a
    # stored value copied, so equality is exact.
    "ev_q9_resample_ffill": """
        WITH e AS (
            SELECT user_id, ts, event_id, value,
                   time_bucket(INTERVAL '1 hour', ts) AS hour
            FROM events
        ),
        bounds AS (
            SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM e GROUP BY 1
        ),
        grid AS (
            SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
            FROM bounds
        ),
        obs AS (
            SELECT user_id, hour, value AS v
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, hour ORDER BY ts DESC, event_id DESC
                ) AS rn
                FROM e
            ) WHERE rn = 1
        )
        SELECT g.user_id, g.hour,
               last_value(o.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING
               ) AS value_ff,
               CAST(o.v IS NOT NULL AS INT) AS observed
        FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour = o.hour
    """,
    # Mirrors ev_q8_retention: DuckDB date subtraction yields integer
    # days = Spark datediff.
    "ev_q8_retention": f"""
        WITH a AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        SELECT f.cohort_day,
               CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
               count(DISTINCT a.user_id) AS n_active
        FROM a JOIN f ON a.user_id = f.user_id
        WHERE a.day - f.cohort_day <= {RETENTION_MAX_OFFSET}
        GROUP BY 1, 2
    """,
    # Mirrors ev_q7_funnel stage by stage (conditional mins chained on
    # the previous stage's timestamp).
    "ev_q7_funnel": """
        WITH s AS (
            SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS click_ts
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.signup_ts
            GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS purchase_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
            GROUP BY 1
        )
        SELECT u.user_id, s.signup_ts, c.click_ts, p.purchase_ts,
               CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                         WHEN c.click_ts IS NOT NULL THEN 2
                         WHEN s.signup_ts IS NOT NULL THEN 1
                         ELSE 0 END AS INT) AS stage
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s ON u.user_id = s.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p ON u.user_id = p.user_id
    """,
    # Mirrors ev_q12_outliers: identical fixed-point lift, the same
    # algebraized predicate in exact HUGEINT (Spark side: DECIMAL(38,0))
    # — both engines flag the identical event set.
    "ev_q12_outliers": f"""
        WITH e AS (
            SELECT event_type,
                   CAST(round(value * 10000.0) AS HUGEINT) AS i
            FROM events
        ),
        stats AS (
            SELECT event_type,
                   CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(i) AS HUGEINT) AS s,
                   CAST(sum(i * i) AS HUGEINT) AS ss
            FROM e GROUP BY 1
        ),
        flagged AS (
            SELECT e.event_type, n,
                   CASE WHEN (i * n - s) * (i * n - s)
                             > {OUTLIER_Z * OUTLIER_Z} * (n * ss - s * s)
                        THEN 1 ELSE 0 END AS is_out
            FROM e JOIN stats USING (event_type)
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_events,
               CAST(sum(is_out) AS BIGINT) AS n_outliers,
               round(CAST(sum(is_out) AS BIGINT)
                     / CAST(max(n) AS BIGINT), 6) AS outlier_frac
        FROM flagged GROUP BY 1
    """,
    # Mirrors ev_q10_transitions: lead over the same (ts, event_id)
    # order; p is the same decimal quotient rounded to 6.
    "ev_q10_transitions": """
        WITH pairs AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        counts AS (
            SELECT from_type, to_type, count(*) AS n
            FROM pairs WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(round(CAST(n AS DECIMAL(28,12))
                          / sum(n) OVER (PARTITION BY from_type), 6)
                    AS DOUBLE) AS p
        FROM counts
    """,
    # Mirrors ev_q11_scd2: same change-point cumulative sum, same run
    # collapse, same lead-based valid_to.
    "ev_q11_scd2": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(event_type) OVER w IS NULL
                             OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS change
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT *, sum(change) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS run_id
            FROM flagged
        ),
        runs AS (
            SELECT user_id, run_id, min(event_type) AS event_type,
                   min(ts) AS valid_from, count(*) AS n_events
            FROM numbered
            GROUP BY 1, 2
        )
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER w2 AS valid_to,
               n_events,
               CAST(lead(valid_from) OVER w2 IS NULL AS INT) AS is_current
        FROM runs
        WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
    """,
    "ev_q4_daily_active": """
        SELECT CAST(ts AS DATE) AS day,
               count(DISTINCT user_id) AS active_users,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1
    """,
}
