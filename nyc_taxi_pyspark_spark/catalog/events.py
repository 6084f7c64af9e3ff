"""Event-sequence analytics over ``events`` (north-star extension).

The reference's event surface stops at per-trip aggregates; a production
event stream additionally needs ORDER-dependent analytics — funnels and
cohort retention — whose Spark form is "one shuffle on user_id, then
window passes over the per-user timeline". Both queries here follow that
shape, which is the scale story: at 100 TB the only wide exchange is the
hash partition on user_id (AQE-coalesced), every window pass reuses the
same sort, and the final re-aggregations are tiny.

Timestamps come through ``sources.io.load_table``, which footer-sniffs the
physical unit of ``events.ts`` (MICROS reads natively; a NANOS file is
truncated ns→µs exactly as DuckDB does).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nyc_taxi_pyspark_spark.catalog.registry import query
from nyc_taxi_pyspark_spark.sources.io import load_table


@query(
    "events_funnel",
    oracle="""
    WITH fv AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id) AS first_view
        FROM events
    ),
    fc AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > first_view
                           THEN ts END)
                    OVER (PARTITION BY user_id) AS first_click
        FROM fv
    ),
    fp AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > first_click
                           THEN ts END)
                    OVER (PARTITION BY user_id) AS first_purchase
        FROM fc
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT CASE WHEN first_view IS NOT NULL
                                    THEN user_id END) AS BIGINT) AS n_viewed,
           CAST(COUNT(DISTINCT CASE WHEN first_click IS NOT NULL
                                    THEN user_id END) AS BIGINT) AS n_clicked,
           CAST(COUNT(DISTINCT CASE WHEN first_purchase IS NOT NULL
                                    THEN user_id END) AS BIGINT) AS n_purchased
    FROM fp
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase.

    Each stage is "first event of the stage type STRICTLY AFTER the
    previous stage's first event", so a click that precedes every view
    does not convert. Three stacked unbounded windows over the same
    user_id partition — one exchange, one sort, three passes — then a
    single global distinct-count roll-up. No self-joins: the per-user
    timeline is scanned in place, which is the form that survives a
    1000-executor shuffle (cf. reference KPI scripts, which have no
    sequence-dependent analytics at all).
    """
    w = Window.partitionBy("user_id")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("first_view", fv)
    fc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("first_click", fc)
    fp = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("first_click")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("first_purchase", fp)
    return staged.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.when(F.col("first_view").isNotNull(), F.col("user_id"))
        ).alias("n_viewed"),
        F.countDistinct(
            F.when(F.col("first_click").isNotNull(), F.col("user_id"))
        ).alias("n_clicked"),
        F.countDistinct(
            F.when(F.col("first_purchase").isNotNull(), F.col("user_id"))
        ).alias("n_purchased"),
    )


@query(
    "events_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, ts,
               MIN(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    )
    SELECT CAST(first_ts AS DATE) AS cohort_date,
           CAST(date_diff('day', CAST(first_ts AS DATE), CAST(ts AS DATE))
                AS INTEGER) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM firsts
    GROUP BY 1, 2
    """,
)
def events_retention(spark, sf_dir):
    """Cohort retention: users grouped by the calendar date of their first
    event, counted per day-offset they return on.

    Shape: one window pass on the user_id partition to stamp the cohort,
    then a distinct-count keyed by (cohort_date, day_offset). At scale the
    distinct-count's exchange is the small one (cohort × offset keys), and
    the user-level dedup happens map-side within the already-partitioned
    window output.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    staged = ev.withColumn("first_ts", F.min("ts").over(w))
    return (
        staged.select(
            F.to_date("first_ts").alias("cohort_date"),
            F.datediff(F.to_date("ts"), F.to_date("first_ts")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "events_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS lo,
               time_bucket(INTERVAL '1 hour', MAX(ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        FROM bounds
    ),
    agg AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(try_cast(ROUND(value * 100) as bigint)) AS DOUBLE) / 100
                 AS sum_value
        FROM events GROUP BY 1
    )
    SELECT g.bucket,
           COALESCE(a.n, 0) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value,
           last_value(a.sum_value IGNORE NULLS)
             OVER (ORDER BY g.bucket ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS last_known_sum
    FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket
    """,
)
def events_gapfill(spark, sf_dir):
    """Time-series gap filling + forward fill — an operator Spark has no
    native form for: build the complete hourly grid with ``sequence()``
    (explode of a generated range — rows from expressions, no driver
    loop), left-join the real aggregates, zero-fill counts, and carry the
    last observed value across empty buckets with last_value(ignorenulls).

    Scale: the grid is O(hours in range) — tiny next to the events — and
    the forward-fill window is a single global sort only because this
    series is global; a per-key series partitions the window by the key,
    which is the usual 100 TB shape."""
    from pyspark.sql import Window

    from nyc_taxi_pyspark_spark.functions.exact import dsum

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("n"), dsum("value", 2).alias("sum_value")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(agg, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            F.last("sum_value", ignorenulls=True).over(w).alias("last_known_sum"),
        )
    )


# 30-minute inactivity gap, in exact microseconds (unix_micros ↔ epoch_us —
# both engines see the same integer, no fractional-second drift).
SESSION_GAP_US = 1_800_000_000


@query(
    "events_sessionize",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), s AS (
        SELECT *, SUM(CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_US}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sess_id
        FROM o
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
    FROM s GROUP BY user_id, sess_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Batch sessionization by inactivity gap — the lag/flag/cumsum idiom:
    a new session starts where the gap to the previous event exceeds 30
    minutes; the running sum of start-flags numbers the sessions.

    This is the batch twin of ``stream_session_window`` (same 100 TB
    shape as the funnel: ONE hash exchange on user_id, then both window
    passes — lag and cumsum — reuse the same per-user sort, and the final
    per-session aggregation re-partitions only (user, session) keys).
    Arithmetic is integer microseconds end-to-end, so the hash comparison
    has no float drift."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | ((us - prev) > SESSION_GAP_US)).cast("int")
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("us", us)
        .withColumn("sess_id", sess.cast("bigint"))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.max("us") - F.min("us")).cast("bigint").alias("duration_us"),
        )
    )


ATTRIBUTION_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days, exact micros


@query(
    "events_attribution",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS us,
               MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_us
        FROM events
    )
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                          AND us - last_click_us <= {ATTRIBUTION_WINDOW_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
    FROM o
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def events_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the most recent
    click by the same user within a 7-day lookback. Same scale shape as the
    funnel/sessionization family — ONE hash exchange on user_id, a running
    max over the per-user timeline (carrying only the latest click
    timestamp, not the click list), then a tiny per-day re-aggregation.
    Exact integer microseconds end-to-end."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    us = F.unix_micros(F.col("ts"))
    last_click = F.max(
        F.when(F.col("event_type") == "click", us)
    ).over(w)
    flagged = ev.withColumn("us", us).withColumn("last_click_us", last_click)
    attributed = (
        F.col("last_click_us").isNotNull()
        & ((F.col("us") - F.col("last_click_us")) <= ATTRIBUTION_WINDOW_US)
    ).cast("int")
    return (
        flagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(attributed).cast("bigint").alias("n_attributed"),
        )
    )


@query(
    "events_top_paths",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), s AS (
        SELECT *, SUM(CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_US}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sess_id
        FROM o
    ), paths AS (
        SELECT user_id, sess_id,
               string_agg(coalesce(event_type, '(null)'),
                          '>' ORDER BY ts, event_id) AS path
        FROM s GROUP BY user_id, sess_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def events_top_paths(spark, sf_dir):
    """Top within-session event-type paths (product-analytics "user
    journeys"): sessionize (same lag-gap-cumsum as events_sessionize),
    concatenate each session's ordered event types, count the most common
    paths. Ordering inside a session is made deterministic by sorting the
    collected (ts, event_id, type) structs — no window re-sort needed —
    and the final top-20 is TakeOrdered. Path cardinality is bounded by
    session length, so the second agg's keyspace stays small at any corpus
    size."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | ((us - prev) > SESSION_GAP_US)).cast("int")
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    paths = (
        ev.withColumn("sess_id", sess)
        .groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
                # a NULL event_type is a journey step, not a separator to
                # swallow: array_join would silently DROP it (an all-NULL
                # session becomes path "") while the oracle's string_agg
                # yields NULL — the placeholder keeps both engines and the
                # session length honest (round-11 dirty-parity audit)
                "(null)",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH hourly AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, quantile_cont(n_events, 0.5) AS med_count
        FROM hourly GROUP BY event_type
    ),
    mad AS (
        SELECT h.event_type,
               quantile_cont(ABS(h.n_events - m.med_count), 0.5) AS mad
        FROM hourly h JOIN med m USING (event_type)
        GROUP BY h.event_type
    )
    SELECT h.event_type, h.hour_start, h.n_events, m.med_count, d.mad,
           CAST(d.mad > 0 AND ABS(h.n_events - m.med_count) > 3 * d.mad
                AS INTEGER) AS is_anomaly
    FROM hourly h
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """Robust volume-anomaly detection: hourly event counts per type flagged
    when they sit more than 3 median-absolute-deviations from the type's
    median — the outlier rule that, unlike mean±3σ, isn't dragged by the
    outliers it is hunting. The pipeline-observability op a 100 TB/day
    ingest runs on its own event stream.

    Exact interpolated percentile (quantile_cont twin) over integer counts
    keeps the medians engine-portable — interpolation on ints yields .0/.5
    steps, exact in doubles. Plan: ONE wide shuffle (the hourly count);
    median and MAD are per-type scalar re-aggregations of the tiny hourly
    table, broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("n_events"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(n_events, 0.5)").alias("med_count")
    )
    mad = (
        hourly.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(n_events - med_count), 0.5)").alias("mad")
        )
    )
    flagged = (
        (F.col("mad") > 0)
        & (F.abs(F.col("n_events") - F.col("med_count")) > 3 * F.col("mad"))
    ).cast("int")
    return (
        hourly.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "hour_start",
            "n_events",
            "med_count",
            "mad",
            flagged.alias("is_anomaly"),
        )
    )


@query(
    "events_rolling_wau",
    oracle="""
    WITH contrib AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(ts AS DATE),
                                           CAST(ts AS DATE) + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM events
    )
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib
    WHERE day <= (SELECT MAX(CAST(ts AS DATE)) FROM events)
    GROUP BY day
    """,
)
def events_rolling_wau(spark, sf_dir):
    """Rolling 7-day active users (WAU) per day — the sliding-distinct
    metric window functions cannot express (no COUNT(DISTINCT) over a range
    frame in either engine's window path).

    Scale shape: each event CONTRIBUTES itself to the 7 days it is active
    for (explode of a 7-element date sequence — a bounded 7× row factor),
    then one hash countDistinct keyed by day. That is the form that
    distributes: no day×events non-equi join (which would plan as a
    broadcast nested loop), no per-day rescan; the distinct dedup happens
    in the day-partitioned aggregate. Trailing-partial windows at the
    range edges are kept (days past the last event date are dropped; the
    cutoff is a driver-side metadata literal, same discipline as TF-ICF's
    N)."""
    ev = load_table(spark, sf_dir, "events")
    max_day = ev.agg(F.max(F.to_date("ts"))).first()[0]
    d = F.to_date("ts")
    return (
        ev.select(
            "user_id",
            F.explode(F.sequence(d, F.date_add(d, 6))).alias("day"),
        )
        .filter(F.col("day") <= F.lit(max_day))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    outs AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out FROM pairs
        GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.n,
           CAST(p.n AS DOUBLE) / CAST(o.n_out AS DOUBLE) AS prob
    FROM pairs p JOIN outs o USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of event types per user — the
    sequence-statistics prep step behind next-event models and synthetic
    session generation. LEAD partitions by user_id (parallelism scales
    with users, never a global window); the 5×5 transition counts reduce
    with map-side combine, and the row-normalizing out-degree joins back
    at broadcast size. prob is one deterministic division of exact
    counts, so the matrix hash-checks."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = (
        o.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    outs = pairs.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("n_out")
    )
    return (
        pairs.join(F.broadcast(outs), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("n_out").cast("double")).alias(
                "prob"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "events_user_features",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS max_ts FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_active,
           CAST(SUM(try_cast(ROUND(value * 100.0) as bigint)) AS DOUBLE) / 100.0
               AS total_value,
           CAST(date_diff('day', CAST(MAX(ts) AS DATE),
                          CAST((SELECT max_ts FROM anchor) AS DATE))
                AS BIGINT) AS recency_days
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def events_user_features(spark, sf_dir):
    """Feature-store build: one per-user feature vector from a single
    scan — per-type counts (conditional sums, not five passes or a
    pivot shuffle), active-day distinct count, exact-cents monetary
    total, and recency against the corpus max timestamp (1-row
    broadcast anchor). This is the table a training pipeline joins
    labels onto; at 100 TB it is one user-keyed aggregate with map-side
    combine plus the anchor pass, nothing else."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("__max_ts"))

    def n_type(t):
        # when/otherwise, not a bare boolean cast: (NULL == t) is NULL, so
        # a user whose types are all NULL would sum to NULL where the
        # oracle's CASE..ELSE 0 gives 0 (round-11 dirty-parity audit)
        return (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
        )

    return (
        ev.join(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            n_type("view"),
            n_type("click"),
            n_type("signup"),
            n_type("purchase"),
            n_type("error"),
            F.count_distinct(F.to_date("ts"))
            .cast("bigint")
            .alias("days_active"),
            (
                F.sum(F.round(F.col("value") * 100.0).try_cast("bigint")).cast(
                    "double"
                )
                / 100.0
            ).alias("total_value"),
            F.datediff(F.to_date(F.max("__max_ts")), F.to_date(F.max("ts")))
            .cast("bigint")
            .alias("recency_days"),
        )
        .orderBy("user_id")
    )


@query(
    "events_leakfree_labels",
    oracle="""
    WITH w AS (
        SELECT event_id, user_id, ts, event_type,
               COUNT(*) OVER pre AS n_prior_events,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER pre AS n_prior_purchases,
               SUM(try_cast(ROUND(value * 100.0) as bigint)) OVER pre
                   AS prior_cents
        FROM events
        WINDOW pre AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CAST(COALESCE(n_prior_events, 0) AS BIGINT) AS n_prior_events,
           CAST(COALESCE(n_prior_purchases, 0) AS BIGINT)
               AS n_prior_purchases,
           CAST(COALESCE(prior_cents, 0) AS DOUBLE) / 100.0
               AS prior_total_value
    FROM w WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def events_leakfree_labels(spark, sf_dir):
    """Point-in-time-correct training examples — the leakage guard every
    supervised pipeline over event data needs: for each label event
    (purchase), the feature values computed from that user's history
    STRICTLY BEFORE the label timestamp (ROWS ... 1 PRECEDING frames,
    tie-broken on event_id), never from the future and never from the
    label row itself. One user-partitioned window (parallelism scales
    with users), exact integer-cents running sums, label filter after
    the frame so features see the full history. The companion
    events_user_features table is what you must NOT join onto labels —
    it aggregates over all time."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = F.round(F.col("value") * 100.0).try_cast("bigint")
    enriched = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("__n_prior"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .over(w)
        .alias("__n_prior_p"),
        F.sum(cents).over(w).alias("__prior_cents"),
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.coalesce("__n_prior", F.lit(0))
            .cast("bigint")
            .alias("n_prior_events"),
            F.coalesce("__n_prior_p", F.lit(0))
            .cast("bigint")
            .alias("n_prior_purchases"),
            (
                F.coalesce("__prior_cents", F.lit(0)).cast("double")
                / 100.0
            ).alias("prior_total_value"),
        )
        .orderBy("event_id")
    )


@query(
    "events_watermark_tuning",
    oracle="""
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS us,
               MAX(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS run_max
        FROM events
    ),
    lat AS (
        SELECT CASE WHEN run_max IS NULL OR run_max <= us THEN 0
                    ELSE run_max - us END AS late_us
        FROM o
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS late_share,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us,
           CAST(quantile_disc(late_us, 0.99) AS BIGINT) AS p99_late_us
    FROM lat
    """,
)
def events_watermark_tuning(spark, sf_dir):
    """Watermark sizing from data, not guesswork: per-user out-of-order
    lateness (running max of event time over ARRIVAL order — event_id is
    the arrival sequence — minus the event's own time), rolled up to the
    late share, max, and p99 lateness. p99_late_us IS the watermark you
    configure: a delay covering 99 % of disorder with bounded state,
    with max_late_us showing what the last 1 % would cost. One
    user-partitioned window (scales with users) + one global rollup; the
    p99 uses the mergeable approx_percentile sketch (exact and
    quantile_disc-adjudicated at the 1e6 accuracy bound)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros("ts")
    run_max = F.max(us).over(w)
    late = (
        F.when(
            run_max.isNull() | (run_max <= us), F.lit(0).cast("bigint")
        )
        .otherwise(run_max - us)
        .alias("late_us")
    )
    lat = ev.select(late)
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.coalesce(F.sum((F.col("late_us") > 0).cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_late"),
        (
            F.sum((F.col("late_us") > 0).cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("late_share"),
        F.max("late_us").cast("bigint").alias("max_late_us"),
        F.expr("approx_percentile(late_us, 0.99, 1000000)")
        .cast("bigint")
        .alias("p99_late_us"),
    )


@query(
    "events_ewma_anomaly",
    oracle="""
    WITH lagged AS (
        SELECT event_id, user_id, value,
               LAG(value, 1) OVER w AS l1, LAG(value, 2) OVER w AS l2,
               LAG(value, 3) OVER w AS l3, LAG(value, 4) OVER w AS l4,
               LAG(value, 5) OVER w AS l5, LAG(value, 6) OVER w AS l6,
               LAG(value, 7) OVER w AS l7, LAG(value, 8) OVER w AS l8
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    scored AS (
        SELECT event_id, user_id, value,
               (l1 * 128 + l2 * 64 + l3 * 32 + l4 * 16
                + l5 * 8 + l6 * 4 + l7 * 2 + l8 * 1) / 255.0 AS ewma
        FROM lagged WHERE l8 IS NOT NULL
    )
    SELECT event_id, user_id, value, ewma,
           value - ewma AS deviation,
           CAST(value > 2 * ewma AS INTEGER) AS is_spike
    FROM scored
    ORDER BY ABS(value - ewma) DESC, event_id LIMIT 50
    """,
)
def events_ewma_anomaly(spark, sf_dir):
    """Per-entity EWMA anomaly scoring: each event's value is compared to
    an exponentially-weighted moving average of the SAME user's 8 prior
    values (ordered by ts, event_id) — the streaming-telemetry smoothing
    rule (alpha = 1/2) that reacts to level shifts faster than a plain
    moving average while damping one-off noise. Events whose value departs
    most from their own history surface first; `is_spike` marks a >2x
    departure above trend.

    Engine-portable float discipline: the weights are dyadic
    (128/255 ... 1/255), so every product lag*2^k is EXACT in doubles and
    the left-associated 8-term sum plus ONE division by 255.0 evaluates
    bit-identically on the JVM and DuckDB — no libm exp(), no recursive
    state. The 8-lag truncation of the infinite EWMA tail under-weights
    history by <0.4% and makes the operator a bounded window instead of a
    sequential scan.

    Plan/scale: one shuffle on user_id; all 8 lags share a single sort
    (one Window node); the top-50 is TakeOrdered. Per-user timelines are
    independent — embarrassingly parallel at any user count."""
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    lags = [F.lag("value", j).over(wu) for j in range(1, 9)]
    num = lags[0] * 128
    for j, lg in enumerate(lags[1:], start=1):
        num = num + lg * (2 ** (7 - j))
    scored = (
        ev.select(
            "event_id",
            "user_id",
            "value",
            lags[7].alias("l8"),
            (num / F.lit(255.0)).alias("ewma"),
        )
        .filter(F.col("l8").isNotNull())
        .drop("l8")
    )
    return (
        scored.select(
            "event_id",
            "user_id",
            "value",
            "ewma",
            (F.col("value") - F.col("ewma")).alias("deviation"),
            (F.col("value") > 2 * F.col("ewma")).cast("int").alias(
                "is_spike"
            ),
        )
        .orderBy(F.abs(F.col("deviation")).desc(), "event_id")
        .limit(50)
    )


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH c AS (
        SELECT event_type, ts, event_id,
               try_cast(ROUND(value * 100.0) as bigint) AS cents
        FROM events
    ),
    tot AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(cents) AS total
        FROM c GROUP BY event_type
    ),
    pre AS (
        SELECT c.event_type, c.ts, c.event_id, t.n,
               t.n * SUM(c.cents) OVER w
                 - (ROW_NUMBER() OVER w) * t.total AS s_scaled
        FROM c JOIN tot t USING (event_type)
        WINDOW w AS (PARTITION BY c.event_type ORDER BY c.ts, c.event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    best AS (
        SELECT event_type, n,
               MAX(ABS(s_scaled)) AS s_max
        FROM pre GROUP BY event_type, n
    )
    SELECT b.event_type, b.n,
           MIN(p.ts) AS changepoint_ts,
           CAST(b.s_max AS BIGINT) AS s_max_scaled,
           CAST(b.s_max AS DOUBLE) / (b.n * 100.0) AS s_max_cents_mean
    FROM best b
    JOIN pre p ON p.event_type = b.event_type
              AND ABS(p.s_scaled) = b.s_max
    GROUP BY b.event_type, b.n, b.s_max
    ORDER BY b.event_type
    """,
)
def events_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point estimation per event type — WHERE the value
    level shifted, completing the monitoring trio (events_anomaly_mad =
    which hours are odd, events_ewma_anomaly = which events depart their
    own trend, this = where the regime changed): the classic estimator
    locates the maximum-|deviation| point of the cumulative sum of
    (x - mean).

    Integer discipline: with values as exact cents, the mean-centered
    prefix sum is kept UNDIVIDED as s'_t = n*cumsum(c) - t*total — pure
    int64 (documented bound: n * Σ|c| < 2^63, fine to ~1e8 rows/type;
    past that, dsum_wide's hi/lo split) — so the argmax and the scaled
    maximum are exact and partition-invariant; the only doubles are the
    final display divisions, identical on both engines. Ties on |s'|
    resolve to the earliest timestamp (MIN over the equality join /
    min-struct on the Spark side).

    Plan/scale — TWO-TIER prefix (the text_novelty_curve / Gini
    discipline), because event_type has cardinality ~5: the naive form
    (one ordered window per type) funnels each type's ENTIRE history
    through a single task — the amplified strong-scaling sweep measured
    it as the only serial section left in the suite (1.1× from 4→32
    cores, E(32)=0.14). Instead rows bucket into fixed 1-hour time
    cells (cell id is a pure function of ts, so the split is
    deterministic and needs no lineage pinning, unlike a sampled range
    partitioner). Tier 1: one keyed aggregate per (type, cell) — sum,
    row count, non-null count — then an EXCLUSIVE per-type prefix over
    the cell frame (O(cells) rows: 720/type/month here; at years of
    100 TB history still ≤ ~10^5 rows, trivially one task; recurse the
    same split if it ever is not). Tier 2: the inclusive prefix WITHIN
    each (type, cell) — a partitioned window that divides across
    cores/executors. Global cumsum = cell offset + in-cell prefix;
    global row_number likewise. Null cents reproduce SUM-over-window
    semantics exactly: the running sum is NULL until the first non-null
    value, then skips nulls — tracked via the non-null prefix count.
    Equal-ts rows always share a cell, so (ts, event_id) ordering is
    preserved across the split. The fact shuffles ONCE (an explicit
    hash(type, cell) repartition both consumers reuse), the per-type
    totals ride the same tiny cell-window pass as the offsets (one
    broadcast), and the argmax + earliest-ts tie-break collapse into a
    single lexicographic struct-max aggregate — no second pass over the
    scored rows. Amplified-sweep history: the naive per-type window read
    1.1x from 4→32 cores (E(32)=0.14, the last serial section in the
    suite); this shape measures 2.4x with a monotone curve (SCALING.md r12 sweep), the residual
    being multi-stage scheduling latency at the 3.2M-row amp size, not
    serialized data flow."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).try_cast("bigint").alias("cents"),
    ).withColumn(
        "cell",
        F.floor(F.col("ts").cast("long") / F.lit(_CUSUM_CELL_SECONDS)),
    )
    # ONE exchange of the fact: both the cell-partials aggregate and the
    # tier-2 window consume this same hash(type, cell) repartition
    # (identical subtrees — exchange reuse), so the fact is scanned and
    # shuffled once. The amplified sweep drove this shape: the earlier
    # separate tot/offs branches added three tiny-but-serial stage chains
    # (each aggregate/broadcast is its own AQE stage wave) that did not
    # divide with cores.
    keyed = c.repartition("event_type", "cell")
    # tier 1: per-(type, cell) partials; the exclusive cell prefix AND the
    # per-type totals come from two frames of the SAME tiny window pass
    # (one sort over O(cells) rows) — no separate totals aggregate, one
    # broadcast instead of two
    cells = keyed.groupBy("event_type", "cell").agg(
        F.sum("cents").alias("csum"),
        F.count(F.lit(1)).cast("bigint").alias("ccnt"),
        F.count("cents").cast("bigint").alias("cnn"),
    )
    w_excl = (
        Window.partitionBy("event_type")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy("event_type")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offs = cells.select(
        "event_type",
        "cell",
        F.coalesce(F.sum("csum").over(w_excl), F.lit(0)).alias("sum_below"),
        F.coalesce(F.sum("ccnt").over(w_excl), F.lit(0)).alias("cnt_below"),
        F.coalesce(F.sum("cnn").over(w_excl), F.lit(0)).alias("nn_below"),
        F.sum("ccnt").over(w_all).alias("n"),
        F.sum("csum").over(w_all).alias("total"),
    )
    # tier 2: inclusive prefix within each (type, cell) — partitioned
    w_in = (
        Window.partitionBy("event_type", "cell")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # SUM(cents) OVER (type ORDER BY ts, id): NULL until the first
    # non-null cents, then nulls add 0 — reproduced exactly from the
    # coalesced two-tier sum gated on the running non-null count
    nn_rank = F.col("nn_below") + F.count("cents").over(w_in)
    cumsum = F.when(
        nn_rank > 0,
        F.col("sum_below") + F.sum(F.coalesce("cents", F.lit(0))).over(w_in),
    )
    rn = F.col("cnt_below") + F.row_number().over(
        Window.partitionBy("event_type", "cell").orderBy("ts", "event_id")
    )
    pre = keyed.join(F.broadcast(offs), ["event_type", "cell"]).withColumn(
        "s_scaled", F.col("n") * cumsum - rn * F.col("total")
    )
    # argmax in the SAME pass: max over (|s'|, -micros, ts) — lexicographic
    # struct max is greatest |s'| tie-broken by SMALLEST ts (negated exact
    # micros; the third field rides along so no micros→ts reconstruction).
    # One map-side-combined 5-row aggregate instead of a second window pass
    # + equality join back over the fact (measured: halves the amplified
    # runtime). NULL s' rows (all-null cents prefix) are filtered exactly
    # as the old MAX/equality-join pair ignored them.
    best = (
        pre.filter(F.col("s_scaled").isNotNull())
        .groupBy("event_type", "n")
        .agg(
            F.max(
                F.struct(
                    F.abs(F.col("s_scaled")).alias("s_abs"),
                    (-F.unix_micros(F.col("ts"))).alias("neg_us"),
                    F.col("ts").alias("ts"),
                )
            ).alias("m")
        )
    )
    return (
        best.select(
            "event_type",
            "n",
            F.col("m.ts").alias("changepoint_ts"),
            F.col("m.s_abs").alias("s_max_scaled"),
            (F.col("m.s_abs").cast("double") / (F.col("n") * F.lit(100.0)))
            .alias("s_max_cents_mean"),
        )
        .orderBy("event_type")
    )


_CUSUM_CELL_SECONDS = 3_600  # 1-hour cells for the two-tier CUSUM prefix


# first letter of each event_type: v(iew) c(lick) s(ignup) p(urchase) e(rror)
_PATTERN = "v[^c]*p"  # a view later converted to purchase with NO click between


@query(
    "events_pattern_match",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               string_agg(coalesce(substr(event_type, 1, 1), '?'), ''
                          ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS n_events,
           CAST(regexp_matches(s, '{_PATTERN}') AS INTEGER) AS matched
    FROM seq ORDER BY user_id
    """,
)
def events_pattern_match(spark, sf_dir):
    """Sequence-pattern detection (the MATCH_RECOGNIZE / CEP capability
    class): fold each user's timeline into an ordered event-initial
    string and test a regex over it — here '{v[^c]*p}': a view later
    followed by a purchase with NO intervening click, the
    unattributable-conversion shape funnel counting cannot express
    (funnels check stage ORDER; patterns constrain what happens BETWEEN
    stages).

    The fold is one groupBy with an in-group sort (array_sort over
    (ts, event_id, initial) structs — deterministic, no relying on
    collect_list order); the regex runs once per user. The pattern stays
    in the RE2∩Java-regex common subset (same discipline as
    text_scrub_pii) so both engines match identically. State bound: one
    char per event per user — fine for bounded entities; an unbounded
    stream would run this as a stateful automaton (one enum state per
    user) instead of a string fold."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                # '?' placeholder (outside the pattern alphabet): a NULL
                # event_type is an event in the timeline, not a char to
                # drop — array_join would swallow it while the oracle's
                # string_agg NULLs the whole sequence (r11 dirty audit)
                F.coalesce(
                    F.substring("event_type", 1, 1), F.lit("?")
                ).alias("c"),
            ).alias("st"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("st")), lambda x: x["c"]
                ),
                "",
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("bigint").alias("n_events"),
        F.col("s").rlike(_PATTERN).cast("int").alias("matched"),
    ).orderBy("user_id")


_OVERLAP_CELL_US = 3_600_000_000  # 1-hour time-grid cells for the overlap join
_KM_CELL_SECONDS = 3_600  # 1-hour duration cells for the two-tier risk count


@query(
    "events_session_overlap",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, ts, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), s AS (
        SELECT *, SUM(CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_US}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sess_id
        FROM o
    ), sess AS (
        SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
               MIN(us) AS s_us, MAX(us) AS e_us
        FROM s GROUP BY user_id, sess_id
    )
    SELECT a.user_id AS user_a, a.sess_id AS sess_a,
           b.user_id AS user_b, b.sess_id AS sess_b,
           CAST(LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS BIGINT)
             AS overlap_us
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id AND a.s_us < b.e_us AND b.s_us < a.e_us
    ORDER BY overlap_us DESC, user_a, sess_a, user_b, sess_b
    LIMIT 20
    """,
)
def events_session_overlap(spark, sf_dir):
    """Interval-overlap self-join (Allen's-algebra 'overlaps'): the top-20
    cross-user pairs of concurrently-active sessions by shared wall-clock
    micros — co-activity mining, contention analysis, ad co-exposure.

    The oracle's range self-join is the O(n²) trap at scale. The Spark
    plan never range-joins: each session (built by the same
    lag/flag/cumsum idiom as ``events_sessionize``, exact integer micros)
    explodes onto a 1-hour time grid — session length is gap-bounded by
    construction, so the per-row fanout is tiny and bounded — and
    candidates come from an EQUI-join on the grid cell, so only sessions
    sharing an hour ever meet. A pair sharing several cells would surface
    once per cell; the distinct() collapses it before the top-k. Strict
    overlap (> 0 µs) keeps touching-at-a-boundary pairs out on both
    engines. At 100 TB: one user_id exchange for sessionization, one
    cell-hash exchange for the join (hot hours are the skew axis — the
    cell is salt-able like any hot join key), TakeOrdered for the top-k;
    cell width tracks the session-gap bound so fanout stays O(1)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | ((us - prev) > SESSION_GAP_US)).cast("int")
    sess_id = (
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).cast("bigint")
    sess = (
        ev.select("user_id", "ts", "event_id", us.alias("us"))
        .withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
    )
    pairs, _ = session_overlap_pairs(sess)
    return pairs.orderBy(
        F.desc("overlap_us"), "user_a", "sess_a", "user_b", "sess_b"
    ).limit(20)


def session_overlap_pairs(
    sess,
    max_sessions_per_cell: int | None = None,
    cell_us: int = _OVERLAP_CELL_US,
):
    """Cross-user overlapping-session pairs from a (user_id, sess_id,
    s_us, e_us) frame via the time-grid equi-join, with an OPT-IN
    co-activity cap.

    The pair count grows quadratically with per-cell co-activity (k
    concurrent sessions in an hour cell → ~k²/2 candidate pairs — the sf1
    rehearsal measured 4.6× output on a 10× step, SCALING.md). The cap is
    the dial for that: with ``max_sessions_per_cell`` set, cells whose
    session count exceeds it are EXCLUDED from the pair join, and the
    truncation is REPORTED, never silent — the second return value is
    ``{"capped_cells": ..., "capped_sessions": ...}`` (one bounded agg
    job over per-cell counts; None when no cap is set, and the default
    plan is then byte-identical to the uncapped original). A pair is
    still found if it shares ANY surviving cell, so capping a hot hour
    drops only pairs whose entire overlap sits inside capped cells.
    """
    cells = sess.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.col("s_us") / F.lit(cell_us)),
                F.floor(F.col("e_us") / F.lit(cell_us)),
            )
        ),
    )
    report = None
    if max_sessions_per_cell is not None:
        counts = cells.groupBy("cell").agg(F.count("*").alias("k"))
        hot = counts.filter(F.col("k") > max_sessions_per_cell)
        r = hot.agg(
            F.count("*").alias("capped_cells"),
            F.coalesce(F.sum("k"), F.lit(0)).alias("capped_sessions"),
        ).first()
        report = {
            "capped_cells": int(r["capped_cells"]),
            "capped_sessions": int(r["capped_sessions"]),
        }
        # anti-join beats a counts rejoin: the hot list is tiny (it is
        # the report the caller just saw), so it broadcasts
        cells = cells.join(F.broadcast(hot.select("cell")), "cell", "left_anti")
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s_us") < F.col("b.e_us"))
            & (F.col("b.s_us") < F.col("a.e_us")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.sess_id").alias("sess_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.sess_id").alias("sess_b"),
            (
                F.least(F.col("a.e_us"), F.col("b.e_us"))
                - F.greatest(F.col("a.s_us"), F.col("b.s_us"))
            )
            .cast("bigint")
            .alias("overlap_us"),
        )
        .distinct()
    )
    return pairs, report


@query(
    "events_survival_km",
    oracle="""
    WITH u AS (
        SELECT user_id,
               epoch_us(MIN(ts)) AS first_us,
               epoch_us(MIN(CASE WHEN event_type = 'purchase' THEN ts END))
                 AS purch_us,
               epoch_us(MAX(ts)) AS last_us
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT user_id,
               (COALESCE(purch_us, last_us) - first_us) // 1000000
                 AS duration_s,
               CASE WHEN purch_us IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM u
    ),
    g AS (
        SELECT CAST(duration_s AS BIGINT) AS duration_s,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(ev) AS BIGINT) AS d_events
        FROM d GROUP BY duration_s
    ),
    r AS (
        SELECT duration_s, n_all, d_events,
               CAST(SUM(n_all) OVER (ORDER BY duration_s DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        FROM g
    )
    SELECT duration_s, n_risk, d_events,
           n_all - d_events AS n_censored_at
    FROM r WHERE d_events > 0
    ORDER BY duration_s
    LIMIT 50
    """,
)
def events_survival_km(spark, sf_dir):
    """Kaplan-Meier risk table for time-to-first-purchase: per distinct
    event time t (integer seconds from a user's first event), the number
    at risk (duration ≥ t, censored users counted until their last
    observed event), conversions d_t, and same-time censorings — survival
    analysis' standard life table, here in its hash-checkable integer
    form (the Π(1−d/n) product curve is a k-term float fold, so the exact
    inputs are the contract and the curve is one driver-side map away).

    Plan: durations come from ONE conditional-aggregate groupBy(user_id)
    — no window over raw events — then the risk counts are a reverse
    cumulative sum computed TWO-TIER (the Gini global-rank discipline,
    mirrored for descending order): tier 1 buckets durations into 1-hour
    cells, aggregates one count per cell, and takes the exclusive
    above-suffix over the BOUNDED cell frame (max duration / cell width
    — catalog metadata, not data-sized), rejoining via broadcast; tier 2
    is a PARTITIONED reverse prefix within each cell, so no unpartitioned
    window ever touches the distinct-duration frame. Censoring is the
    standard right-censoring at last observation."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("first_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("purch_us"),
        F.max(us).alias("last_us"),
    )
    d = u.select(
        F.expr("(COALESCE(purch_us, last_us) - first_us) DIV 1000000")
        .cast("bigint")
        .alias("duration_s"),
        F.col("purch_us").isNotNull().cast("int").alias("ev"),
    )
    g = d.groupBy("duration_s").agg(
        F.count("*").alias("n_all"), F.sum("ev").alias("d_events")
    ).withColumn(
        "cell", F.floor(F.col("duration_s") / F.lit(_KM_CELL_SECONDS))
    )
    wa = Window.orderBy(F.desc("cell")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cells = (
        g.groupBy("cell")
        .agg(F.sum("n_all").alias("bc"))
        .select(
            "cell",
            F.coalesce(F.sum("bc").over(wa), F.lit(0)).alias("above"),
        )
    )
    w = (
        Window.partitionBy("cell")
        .orderBy(F.desc("duration_s"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = g.join(F.broadcast(cells), "cell").select(
        "duration_s",
        "n_all",
        "d_events",
        (F.col("above") + F.sum("n_all").over(w))
        .cast("bigint")
        .alias("n_risk"),
    )
    return (
        r.filter(F.col("d_events") > 0)
        .select(
            "duration_s",
            "n_risk",
            F.col("d_events").cast("bigint").alias("d_events"),
            (F.col("n_all") - F.col("d_events"))
            .cast("bigint")
            .alias("n_censored_at"),
        )
        .orderBy("duration_s")
        .limit(50)
    )
