package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.ops.ExactAgg._
import graft.ops.{AsOfJoin, Sessionize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence / window / as-of operators (SURVEY.md §2.4 J2-J9, §2.5 A1/A2/A7,
  * §2.6 W1-W5, §2.9 R4) over the `events` stream table.
  *
  * Time base: the parquet column `ts` is nanosecond-precision; Spark reads
  * it as BIGINT nanos (spark.sql.legacy.parquet.nanosAsLong=true — set in
  * Verify/Bench/tests) while DuckDB truncates to µs on read. The portable
  * value both engines agree on is epoch MICROseconds: Spark `ts div 1000`
  * == DuckDB `epoch_us(ts)` (both floor; all data is post-epoch). Every
  * query works in `us` BIGINT — also the right call at 100 TB: integer
  * comparisons, no timezone semantics in the hot path.
  */
object EventOps extends QueryModule {

  private val Us = expr("ts div 1000")

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("us", Us)

  def defs: Seq[QueryDef] = Seq(a1Deltas, a2Valuation, a7ArgminDownsample,
    f9ExpDecay, w1LagLead, w2Sessionize, w4LastIgnoreNulls, j2AsOf,
    j3RangeJoin, j4Vwap, j6SandwichPattern, j9TriggerSearch, r4SlidingWindow,
    w5Funnel, w6CohortRetention, w7AbTest, w8Anomaly)

  /** W7: A/B experiment readout — users assigned to arms by md5 parity
    * (deterministic, balanced, assignment independent of behavior), the
    * metric is per-user mean purchase value, and the readout is the
    * two-sample z statistic from exact-decimal sums: the experimentation
    * primitive every event platform ships. All moments are
    * order-independent reductions; the z arithmetic runs on identical
    * doubles in both engines. */
  private val w7AbTest = QueryDef(
    "w7_ab_test",
    (s, dir) => {
      import graft.ops.ExactAgg.{dsum, dsumR, snap}
      val per = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B"))
        .groupBy("arm", "user_id")
        .agg((dsum(col("value")) / count(lit(1))).as("user_mean"))
      val arms = per.groupBy("arm")
        .agg(count(lit(1)).as("n_users"),
          snap(dsumR(col("user_mean")) / count(lit(1))).as("mean"),
          snap(dsumR(col("user_mean") * col("user_mean")) / count(lit(1)))
            .as("m2"))
        .withColumn("var", snap(col("m2") - col("mean") * col("mean")))
      val a = arms.filter(col("arm") === "A")
        .select(col("n_users").as("n_a"), col("mean").as("mean_a"),
          col("var").as("var_a"))
      val b = arms.filter(col("arm") === "B")
        .select(col("n_users").as("n_b"), col("mean").as("mean_b"),
          col("var").as("var_b"))
      a.crossJoin(b)
        .withColumn("z", snap((col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b"))))
        .select("n_a", "n_b", "mean_a", "mean_b", "z")
    },
    Some {
      import graft.ops.ExactAgg.{sqlSnap, sqlSum, sqlSumR}
      s"""WITH per AS (
        SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
            THEN 'A' ELSE 'B' END AS arm, user_id,
          (${sqlSum("value")} / COUNT(*)) AS user_mean
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      arms AS (
        SELECT arm, COUNT(*) AS n_users,
          ${sqlSnap(s"${sqlSumR("user_mean")} / COUNT(*)")} AS mean,
          ${sqlSnap(s"${sqlSumR("user_mean * user_mean")} / COUNT(*)")} AS m2
        FROM per GROUP BY 1),
      v AS (SELECT arm, n_users, mean,
          ${sqlSnap("m2 - mean * mean")} AS var FROM arms)
      SELECT a.n_users AS n_a, b.n_users AS n_b,
        a.mean AS mean_a, b.mean AS mean_b,
        ${sqlSnap("""(a.mean - b.mean)
          / SQRT(a.var / a.n_users + b.var / b.n_users)""")} AS z
      FROM (SELECT * FROM v WHERE arm = 'A') a
      CROSS JOIN (SELECT * FROM v WHERE arm = 'B') b"""
    })

  /** W8: trailing-window anomaly detection — per-day event volume scored
    * against the PRECEDING 7-day mean/std (the day itself excluded, so a
    * spike cannot mask itself); days with z > 2 flag. Day volumes are a
    * date-grain table, so the trailing window runs over ~30 rows — the
    * corpus contributes one count rollup. */
  private val w8Anomaly = QueryDef(
    "w8_anomaly",
    (s, dir) => {
      import graft.ops.ExactAgg.snap
      val w = Window.orderBy(col("day").asc).rowsBetween(-7, -1)
      ev(s, dir)
        .select(expr("us div 86400000000").as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_events"))
        .withColumn("trail_n", count(lit(1)).over(w))
        .withColumn("trail_mean", snap(sum(col("n_events")).over(w)
          .cast("double") / col("trail_n")))
        .withColumn("trail_m2", snap(
          sum(col("n_events") * col("n_events")).over(w).cast("double")
            / col("trail_n")))
        .filter(col("trail_n") === 7)
        .withColumn("sd", sqrt(snap(
          col("trail_m2") - col("trail_mean") * col("trail_mean"))))
        // explicit zero-variance guard: Spark (ANSI off) yields NULL for
        // x/0.0 while DuckDB yields Infinity — pin NULL on both sides
        .withColumn("z", when(col("sd") === 0.0e0, lit(null).cast("double"))
          .otherwise(snap(
            (col("n_events") - col("trail_mean")) / col("sd"))))
        .withColumn("is_anomaly", (abs(col("z")) > 2.0e0).cast("long"))
        .select("day", "n_events", "trail_mean", "z", "is_anomaly")
        .orderBy("day")
    },
    Some {
      import graft.ops.ExactAgg.sqlSnap
      s"""WITH days AS (
        SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n_events
        FROM events GROUP BY 1),
      tr AS (
        SELECT day, n_events,
          COUNT(*) OVER w AS trail_n,
          ${sqlSnap("CAST(SUM(n_events) OVER w AS DOUBLE) / (COUNT(*) OVER w)")}
            AS trail_mean,
          ${sqlSnap(
            "CAST(SUM(n_events * n_events) OVER w AS DOUBLE) / (COUNT(*) OVER w)")}
            AS trail_m2
        FROM days
        WINDOW w AS (ORDER BY day ASC ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      sc AS (
        SELECT day, n_events, trail_mean,
          CASE WHEN SQRT(${sqlSnap("trail_m2 - trail_mean * trail_mean")}) = 0
               THEN NULL
               ELSE ${sqlSnap(s"""(n_events - trail_mean)
                 / SQRT(${sqlSnap("trail_m2 - trail_mean * trail_mean")})""")}
          END AS z
        FROM tr WHERE trail_n = 7)
      SELECT day, n_events, trail_mean, z,
        CAST(CASE WHEN ABS(z) > 2.0e0 THEN 1 ELSE 0 END AS BIGINT)
          AS is_anomaly
      FROM sc ORDER BY day"""
    })

  /** W5: conversion funnel — the ordered-stage analytics classic: per
    * user, first `view`, first `click` AT OR AFTER that view, first
    * `purchase` at or after that click; the funnel reports stage reach and
    * the mean stage-transition latency. Each stage is one conditional-min
    * aggregation at user grain — no self-join of the event fact; the
    * ordering constraint rides in the WHEN predicate.
    *
    * Skew stance at 100 TB: the shuffle key is `user_id`, and a power
    * user is bounded by human event rates (even 1 event/sec for a year
    * is ~3×10⁷ rows ≈ single-digit GB — one task, not a spill). The
    * per-user state is O(1) (three conditional mins), so AQE's skew-join
    * split plus the map-side partial aggregation already flatten any
    * hot key; salting would only buy a second shuffle. Same stance for
    * w6's (user, day) rollup. */
  private val w5Funnel = QueryDef(
    "w5_funnel",
    (s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"), col("us"))
      val v = e.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("us"))).as("v1"))
      val c = e.join(v, Seq("user_id"))
        .groupBy(col("user_id"), col("v1"))
        .agg(min(when(col("event_type") === "click" && col("us") >= col("v1"),
          col("us"))).as("c1"))
      val p = e.join(c, Seq("user_id"))
        .groupBy(col("user_id"), col("v1"), col("c1"))
        .agg(min(when(col("event_type") === "purchase" && col("us") >= col("c1"),
          col("us"))).as("p1"))
      p.agg(count(lit(1)).as("n_users"),
        sum(col("v1").isNotNull.cast("long")).as("n_view"),
        sum(col("c1").isNotNull.cast("long")).as("n_click_after_view"),
        sum(col("p1").isNotNull.cast("long")).as("n_purchase_after_click"),
        graft.ops.ExactAgg.snap(
          graft.ops.ExactAgg.dsumR((col("c1") - col("v1")).cast("double") / 3600e6)
            / sum(col("c1").isNotNull.cast("long"))).as("avg_view_to_click_h"),
        graft.ops.ExactAgg.snap(
          graft.ops.ExactAgg.dsumR((col("p1") - col("c1")).cast("double") / 3600e6)
            / sum(col("p1").isNotNull.cast("long"))).as("avg_click_to_buy_h"))
    },
    Some {
      import graft.ops.ExactAgg.{sqlSnap, sqlSumR}
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      v AS (SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN us END) AS v1
        FROM e GROUP BY 1),
      c AS (SELECT e.user_id, v.v1,
          MIN(CASE WHEN event_type = 'click' AND us >= v1 THEN us END) AS c1
        FROM e JOIN v ON v.user_id = e.user_id GROUP BY 1, 2),
      p AS (SELECT e.user_id, c.v1, c.c1,
          MIN(CASE WHEN event_type = 'purchase' AND us >= c1 THEN us END) AS p1
        FROM e JOIN c ON c.user_id = e.user_id GROUP BY 1, 2, 3)
      SELECT COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_view,
        CAST(SUM(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_click_after_view,
        CAST(SUM(CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_purchase_after_click,
        ${sqlSnap(s"""${sqlSumR("CAST(c1 - v1 AS DOUBLE) / 3600e6")}
          / SUM(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END)""")}
          AS avg_view_to_click_h,
        ${sqlSnap(s"""${sqlSumR("CAST(p1 - c1 AS DOUBLE) / 3600e6")}
          / SUM(CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END)""")}
          AS avg_click_to_buy_h
      FROM p"""
    })

  /** W6: cohort retention — users cohorted by first-active day; for the
    * classic offsets (0/1/3/7/14 days) the matrix reports how many of
    * each cohort were active again. Two distinct-rollups at (user, day)
    * and (cohort, offset) grain — the fact is never self-joined; the
    * cohort dimension rides back by a user-grain join. */
  private val w6CohortRetention = QueryDef(
    "w6_cohort_retention",
    (s, dir) => {
      val days = ev(s, dir)
        .select(col("user_id"), expr("us div 86400000000").as("day"))
        .distinct()
      val cohort = days.groupBy("user_id").agg(min(col("day")).as("c_day"))
      val sizes = cohort.groupBy("c_day").agg(count(lit(1)).as("cohort_size"))
      days.join(cohort, Seq("user_id"))
        .withColumn("offset", col("day") - col("c_day"))
        .filter(col("offset").isin(0L, 1L, 3L, 7L, 14L))
        .groupBy(col("c_day"), col("offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, Seq("c_day"))
        .withColumn("retention", graft.ops.ExactAgg.snap(
          col("n_active").cast("double") / col("cohort_size")))
        .select("c_day", "offset", "n_active", "cohort_size", "retention")
        .orderBy("c_day", "offset")
    },
    Some(s"""WITH days AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events),
      cohort AS (SELECT user_id, MIN(day) AS c_day FROM days GROUP BY 1),
      sizes AS (SELECT c_day, COUNT(*) AS cohort_size FROM cohort GROUP BY 1),
      act AS (
        SELECT c.c_day, d.day - c.c_day AS off, COUNT(*) AS n_active
        FROM days d JOIN cohort c ON c.user_id = d.user_id
        WHERE d.day - c.c_day IN (0, 1, 3, 7, 14)
        GROUP BY 1, 2)
      SELECT a.c_day, a.off AS offset, CAST(a.n_active AS BIGINT) AS n_active,
        CAST(s.cohort_size AS BIGINT) AS cohort_size,
        ${graft.ops.ExactAgg.sqlSnap(
          "CAST(a.n_active AS DOUBLE) / s.cohort_size")} AS retention
      FROM act a JOIN sizes s ON s.c_day = a.c_day
      ORDER BY 1, 2"""))

  /** A1 account_for_actions (accounting.rs:19-56): fold a typed action
    * stream into net deltas per account — signed conditional sums, one
    * shuffle on the account key. */
  private val a1Deltas = QueryDef(
    "a1_delta_accounting",
    (s, dir) => ev(s, dir)
      .groupBy("user_id")
      .agg(
        dsum(when(col("event_type") === "purchase", col("value"))
          .when(col("event_type") === "error", -col("value"))
          .otherwise(lit(0.0))).as("net"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_credit"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_debit"))
      .orderBy("user_id"),
    Some(s"""SELECT user_id,
      ${sqlSum("CASE WHEN event_type = 'purchase' THEN value WHEN event_type = 'error' THEN -value ELSE 0.0 END")} AS net,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_credit,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_debit
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** A2 usd_delta valuation (shared_utils.rs:428): join deltas against a
    * derived price dimension (broadcast — it's tiny), then weighted sum. */
  private val a2Valuation = QueryDef(
    "a2_usd_valuation",
    (s, dir) => {
      val e = ev(s, dir)
      val px = e.groupBy("event_type").agg(davg(col("value")).as("px"))
      e.join(broadcast(px), "event_type")
        .groupBy("user_id")
        .agg(dsum(col("value") * col("px")).as("usd"), count(lit(1)).as("n"))
        .orderBy("user_id")
    },
    Some(s"""WITH px AS (SELECT event_type, ${sqlSum("value")} / COUNT(*) AS px
        FROM events GROUP BY 1)
      SELECT user_id, ${sqlSum("value * px")} AS usd, COUNT(*) AS n
      FROM events JOIN px USING (event_type)
      GROUP BY 1 ORDER BY 1"""))

  /** A7 argMin nearest-to-bucket-start downsampling (raw_cex_quotes.sql):
    * row_number per (key, bucket) ordered by distance-to-anchor with a
    * unique tiebreak, keep rank 1. */
  private val a7ArgminDownsample = QueryDef(
    "a7_argmin_downsample",
    (s, dir) => {
      val bucket = expr("us div 60000000")
      val dist = col("us") - col("bucket") * 60000000L
      val w = Window.partitionBy(col("user_id"), col("bucket"))
        .orderBy(dist.asc, col("event_id").asc)
      ev(s, dir)
        .withColumn("bucket", bucket)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_buckets"), dsum(col("value")).as("sum_picked"))
        .orderBy("user_id")
    },
    Some(s"""SELECT user_id, COUNT(*) AS n_buckets, ${sqlSum("value")} AS sum_picked
      FROM (SELECT user_id, value, ROW_NUMBER() OVER (
              PARTITION BY user_id, epoch_us(ts) // 60000000
              ORDER BY epoch_us(ts) - (epoch_us(ts) // 60000000) * 60000000 ASC,
                       event_id ASC) AS rn
            FROM events)
      WHERE rn = 1 GROUP BY 1 ORDER BY 1"""))

  /** F9 exp-decay weights (db/cex/trades/utils.rs:485): w = exp(-Δt), fully
    * codegen'd scalar math; anchor is fixed so the weight is a pure row
    * function (no global pass). */
  private val f9ExpDecay = QueryDef(
    "f9_exp_decay",
    (s, dir) => {
      val anchorUs = 1704067200000000L // 2024-01-01T00:00:00Z
      val ageDays = (col("us") - lit(anchorUs)).cast("double") / lit(86400.0e6)
      ev(s, dir)
        .withColumn("w", exp(-ageDays))
        .groupBy("event_type")
        .agg(dsum(col("value") * col("w")).as("weighted_sum"),
          dsum(col("w")).as("sum_w"))
        .orderBy("event_type")
    },
    Some(s"""SELECT event_type,
      ${sqlSum("value * EXP(-((epoch_us(ts) - 1704067200000000) / 86400e6))")} AS weighted_sum,
      ${sqlSum("EXP(-((epoch_us(ts) - 1704067200000000) / 86400e6))")} AS sum_w
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** W1 duplicate-sender sequence window (sandwich/mod.rs:1014): lag/lead
    * over per-key tx order; here: consecutive same-type pairs per user. */
  private val w1LagLead = QueryDef(
    "w1_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
      ev(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "click" && col("prev_type") === "click", 1L)
          .otherwise(0L)).as("n_click_pairs"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id,
      CAST(SUM(CASE WHEN event_type = 'click' AND prev_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click_pairs,
      COUNT(*) AS n_events
      FROM (SELECT user_id, event_type, LAG(event_type, 1) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_type
            FROM events)
      GROUP BY 1 ORDER BY 1"""))

  /** W2 partition_into_gaps (sandwich/mod.rs:902): gap-split sessions via
    * running sum of gap markers (see ops.Sessionize). Gap = 30 min. */
  private val w2Sessionize = QueryDef(
    "w2_sessionize",
    (s, dir) => {
      Sessionize.byGap(ev(s, dir), Seq("user_id"), "us", "event_id", 1800000000L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("sn"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), max(col("sn")).as("max_session_n"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, COUNT(*) AS n_sessions, MAX(sn) AS max_session_n
      FROM (SELECT user_id, session_id, COUNT(*) AS sn
            FROM (SELECT user_id, SUM(is_new) OVER (
                    PARTITION BY user_id ORDER BY us ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                  FROM (SELECT user_id, event_id, epoch_us(ts) AS us,
                          CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
                            PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
                            > 1800000000 THEN 1 ELSE 0 END AS is_new
                        FROM events))
            GROUP BY 1,2)
      GROUP BY 1 ORDER BY 1"""))

  /** W4 price_at_or_before (db/dex.rs:183): forward-fill the last non-null
    * observation — last(…, ignoreNulls) over unbounded-preceding rows. */
  private val w4LastIgnoreNulls = QueryDef(
    "w4_last_ignore_nulls",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("filled",
          last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
        .groupBy("user_id")
        .agg(dsum(col("filled")).as("sum_filled"),
          sum(when(col("filled").isNotNull, 1L).otherwise(0L)).as("n_filled"))
        .orderBy("user_id")
    },
    Some(s"""SELECT user_id, ${sqlSum("filled")} AS sum_filled,
      CAST(SUM(CASE WHEN filled IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled
      FROM (SELECT user_id, LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
            FROM events)
      GROUP BY 1 ORDER BY 1"""))

  /** J2/J3 as-of join (price_at_or_before / CEX nearest-before quote):
    * purchases pick up the latest 'view' value per user via ops.AsOfJoin —
    * one shuffle, no range-join blowup. Right side is deduped per (key, ts)
    * with arg-max on event_id so ties are deterministic. */
  private val j2AsOf = QueryDef(
    "j2_asof_join",
    (s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "us", "event_id", "value")
      val views = e.filter(col("event_type") === "view")
        .groupBy("user_id", "us")
        .agg(max_by(col("value"), col("event_id")).as("view_value"))
      AsOfJoin.backward(purchases, views, Seq("user_id"), "us", "view_value", "last_view")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("last_view").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          dsum(col("last_view")).as("sum_last_view"))
        .orderBy("user_id")
    },
    Some(s"""WITH v AS (SELECT user_id, epoch_us(ts) AS us, ARG_MAX(value, event_id) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1,2),
      p AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase')
      SELECT p.user_id AS user_id, COUNT(*) AS n_purchases,
        CAST(SUM(CASE WHEN v.view_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        ${sqlSum("v.view_value")} AS sum_last_view
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.us >= v.us
      GROUP BY 1 ORDER BY 1"""))

  /** J3 interval join (CEX quotes in a window around block time): click →
    * purchase pairs within 30 min, equi-keyed on user so the range predicate
    * only scans within a key group. */
  private val j3RangeJoin = QueryDef(
    "j3_range_join",
    (s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("us").as("c_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"), col("value"))
      clicks.join(purchases, Seq("user_id"))
        .filter(col("p_us") > col("c_us") && col("p_us") <= col("c_us") + 1800000000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"), dsum(col("value")).as("sum_value"))
        .orderBy("user_id")
    },
    Some(s"""SELECT c.user_id AS user_id, COUNT(*) AS n_pairs, ${sqlSum("p.value")} AS sum_value
      FROM (SELECT user_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click') c
      JOIN (SELECT user_id, epoch_us(ts) AS p_us, value FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.p_us > c.c_us AND p.p_us <= c.c_us + 1800000000
      GROUP BY 1 ORDER BY 1"""))

  /** J4/A6 VWAP with weights (time_window_vwam.rs): Σ(px·w)/Σ(w) per
    * (type, hour); the weight comes from the props payload (regex parse —
    * portable across engines, unlike JSON extensions). */
  private val j4Vwap = QueryDef(
    "j4_vwap",
    (s, dir) => {
      ev(s, dir)
        .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
        .withColumn("hour", expr("us div 3600000000"))
        .groupBy("event_type", "hour")
        .agg(dsum(col("value") * col("k")).as("pv"), sum(col("k")).as("sum_k"))
        .filter(col("sum_k") > 0)
        .select(col("event_type"), col("hour"),
          (col("pv") / col("sum_k")).as("vwap"), col("sum_k"))
        .orderBy("event_type", "hour")
    },
    Some(s"""SELECT event_type, hour, pv / sum_k AS vwap, sum_k
      FROM (SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
              ${sqlSum("value * TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)")} AS pv,
              CAST(SUM(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS sum_k
            FROM events GROUP BY 1,2)
      WHERE sum_k > 0 ORDER BY event_type, hour"""))

  /** J6/J7 sandwich possible-set (sandwich/mod.rs:851-1148): consecutive
    * same-key "bracket" rows with victims strictly between. Brackets wider
    * than 2h are discarded (reference brackets live within a block).
    *
    * Scale shape: the bracket↔victim match is an EQUI-join on coarse time
    * buckets (bucket width == max bracket width, so a bracket spans ≤2
    * buckets and is exploded into exactly those), with the exact range
    * predicate applied post-join. A victim lands in exactly one bucket, so
    * no pair is produced twice. This keeps the join a shuffled hash/sort
    * join partitioned by bucket — never a BroadcastNestedLoopJoin over
    * brackets × victims. */
  private val j6SandwichPattern = QueryDef(
    "j6_sandwich_pattern",
    (s, dir) => {
      val MaxWidth = 7200000000L // 2h, also the bucket width
      val e = ev(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
      val brackets = e.filter(col("event_type") === "click")
        .withColumn("back_us", lead(col("us"), 1).over(w))
        .withColumn("back_id", lead(col("event_id"), 1).over(w))
        .filter(col("back_us").isNotNull && col("back_us") - col("us") <= MaxWidth)
        .select(col("user_id"), col("event_id").as("front_id"),
          col("us").as("front_us"), col("back_id"), col("back_us"))
        .withColumn("bucket", explode(array_distinct(array(
          expr(s"front_us div $MaxWidth"), expr(s"back_us div $MaxWidth")))))
      val victims = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("v_user"), col("us").as("v_us"),
          expr(s"us div $MaxWidth").as("v_bucket"))
      brackets.join(victims,
          col("bucket") === col("v_bucket") &&
            col("v_user") =!= col("user_id") &&
            col("v_us") > col("front_us") && col("v_us") < col("back_us"))
        .groupBy("user_id", "front_id", "back_id")
        .agg(count(lit(1)).as("n_victims"))
        .orderBy("user_id", "front_id")
    },
    Some("""WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us,
          LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS back_us,
          LEAD(event_id, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS back_id
        FROM events WHERE event_type = 'click')
      SELECT c.user_id AS user_id, c.event_id AS front_id, c.back_id AS back_id,
        COUNT(*) AS n_victims
      FROM c JOIN (SELECT user_id, epoch_us(ts) AS v_us FROM events
                   WHERE event_type = 'purchase') v
        ON v.user_id <> c.user_id AND v.v_us > c.us AND v.v_us < c.back_us
      WHERE c.back_us IS NOT NULL AND c.back_us - c.us <= 7200000000
      GROUP BY 1,2,3 ORDER BY 1,2"""))

  /** J9 atomic-arb trigger-tx search (atomic_arb.rs:239-280): for each
    * event, the latest STRICTLY-earlier row of another type on the same key
    * — an exclusive-bound as-of (left time shifted by one tick). */
  private val j9TriggerSearch = QueryDef(
    "j9_trigger_search",
    (s, dir) => {
      val e = ev(s, dir)
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), (col("us") - 1).as("us"), col("event_id"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy("user_id", "us")
        .agg(max(col("event_id")).as("trig_id"))
      AsOfJoin.backward(errors, clicks, Seq("user_id"), "us", "trig_id", "trigger")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_errors"),
          sum(when(col("trigger").isNotNull, 1L).otherwise(0L)).as("n_with_trigger"))
        .orderBy("user_id")
    },
    Some("""WITH t AS (SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS trig_id
        FROM events WHERE event_type = 'click' GROUP BY 1,2),
      err AS (SELECT user_id, epoch_us(ts) - 1 AS us FROM events WHERE event_type = 'error')
      SELECT err.user_id AS user_id, COUNT(*) AS n_errors,
        CAST(SUM(CASE WHEN t.trig_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_trigger
      FROM err ASOF LEFT JOIN t ON err.user_id = t.user_id AND err.us >= t.us
      GROUP BY 1 ORDER BY 1"""))

  /** R4 multi-block sliding window (multi_block_window.rs): native Spark
    * sliding windows (10 min length, 5 min slide → every row in exactly 2
    * windows). Batch form of the Structured Streaming windowed agg. */
  private val r4SlidingWindow = QueryDef(
    "r4_sliding_window",
    (s, dir) => {
      ev(s, dir)
        .withColumn("tsm", timestamp_micros(col("us")))
        .groupBy(window(col("tsm"), "10 minutes", "5 minutes").as("win"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("win.start")).as("window_start"), col("n"), col("sum_value"))
        .orderBy("window_start")
    },
    Some(s"""SELECT window_start, COUNT(*) AS n, ${sqlSum("value")} AS sum_value
      FROM (SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start, value FROM events
            UNION ALL
            SELECT (epoch_us(ts) // 300000000) * 300000000 - 300000000 AS window_start, value FROM events)
      GROUP BY 1 ORDER BY 1"""))
}
