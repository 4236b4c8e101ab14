package graft.queries

import graft.Tables
import graft.streaming.Events
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Events/streaming surface bound to the driver contract (§2E). The
  * batch shapes here are the oracle-checked equivalents of the
  * streaming queries exercised in StreamingSpec.
  */
object EventsOps {

  type Q = (SparkSession, String) => DataFrame

  def evt_window_agg(spark: SparkSession, dir: String): DataFrame =
    Events.hourlyAgg(Tables(spark, dir, "events"))
      .orderBy(col("hour"), col("event_type"))

  def evt_sessionize(spark: SparkSession, dir: String): DataFrame =
    Events.sessionStats(Tables(spark, dir, "events"))
      .orderBy(col("user_id"))

  /** Ordered view→click→purchase conversion funnel (first-touch). */
  def evt_funnel(spark: SparkSession, dir: String): DataFrame =
    Events.funnel(Tables(spark, dir, "events"))
      .orderBy(col("stage"))

  /** Weekly retention cohorts anchored on signup. */
  def evt_retention(spark: SparkSession, dir: String): DataFrame =
    Events.retention(Tables(spark, dir, "events"))
      .orderBy(col("cohort_week"), col("week_offset"))

  /** Incremental (streamed) funnel: the drained changelog stream must
    * equal batch [[evt_funnel]] — gated by the SAME oracle.
    */
  def evt_funnel_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runFunnel(spark, Tables(spark, dir, "events"))
      .orderBy(col("stage"))

  /** Incremental (streamed) retention cohorts — same oracle as batch
    * [[evt_retention]]; late-signup cohort revisions are handled by
    * the changelog weights.
    */
  def evt_retention_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runRetention(spark, Tables(spark, dir, "events"))
      .orderBy(col("cohort_week"), col("week_offset"))

  /** Click→view attribution pairs within a 4 h window (one user-keyed
    * shuffle; interval bounds the per-user pair fan-out).
    */
  def evt_attribution(spark: SparkSession, dir: String): DataFrame =
    Events.attribution(Tables(spark, dir, "events"))
      .orderBy(col("user_id"), col("click_id"), col("view_id"))

  /** The SAME pairs produced by a watermarked stream-stream interval
    * join (state evicted past watermark − window); same oracle as
    * batch [[evt_attribution]]. The default is skew-safe AUTO salting:
    * a SpaceSaving pass over the staged events salts only the keys
    * whose share exceeds the hot bound (none at the gated SFs, so this
    * plan stays the classic unsalted join there).
    */
  def evt_attribution_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runAttribution(spark, Tables(spark, dir, "events"))
      .orderBy(col("user_id"), col("click_id"), col("view_id"))

  /** The salted-join mitigation itself under the oracle: every key
    * forced across 4 salt buckets (clicks hash to one, views replicate
    * to all), so the fan-out/match-once machinery — not just the
    * unsalted fast path — is hash-checked against batch every driver
    * run.
    */
  def evt_attribution_stream_salted(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runAttribution(spark, Tables(spark, dir, "events"),
        saltBuckets = 4)
      .orderBy(col("user_id"), col("click_id"), col("view_id"))

  /** Top-20 per-user event-type trigram paths (navigation patterns). */
  def evt_paths(spark: SparkSession, dir: String): DataFrame =
    Events.topPaths(Tables(spark, dir, "events"))
      .orderBy(col("n").desc, col("path"))

  /** Incremental per-user trigram paths — changelog multiset diff per
    * user timeline (a late event retracts the trigrams it splits);
    * drained ≡ batch [[evt_paths]], same oracle.
    */
  def evt_paths_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runPaths(spark, Tables(spark, dir, "events"))
      .orderBy(col("n").desc, col("path"))

  /** Incremental (streamed) sessionization — same oracle as batch
    * [[evt_sessionize]]; a late event can merge sessions, handled by
    * changelog retraction.
    */
  def evt_sessionize_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runSessionize(spark, Tables(spark, dir, "events"))
      .orderBy(col("user_id"))

  /** Hourly-count anomalies per event type (exact integer-core z). */
  def evt_anomaly(spark: SparkSession, dir: String): DataFrame =
    Events.hourlyAnomaly(Tables(spark, dir, "events"))
      .orderBy(col("event_type"), col("hour"))

  /** Incremental (streamed) anomaly detector — same oracle as batch
    * [[evt_anomaly]]; non-monotone membership handled by changelog
    * retraction.
    */
  def evt_anomaly_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runAnomaly(spark, Tables(spark, dir, "events"))
      .orderBy(col("event_type"), col("hour"))

  /** Hopping-window aggregation (2 h windows every 1 h) — the sliding
    * companion of [[evt_window_agg]]'s tumbling windows.
    */
  def evt_sliding_agg(spark: SparkSession, dir: String): DataFrame =
    Events.slidingAgg(Tables(spark, dir, "events"))
      .orderBy(col("win_start"), col("event_type"))

  /** Streamed tumbling-window agg — drained ≡ batch [[evt_window_agg]],
    * same oracle.
    */
  def evt_window_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runWindowAgg(spark, Tables(spark, dir, "events"))
      .orderBy(col("hour"), col("event_type"))

  /** Streamed hopping-window agg — drained ≡ batch [[evt_sliding_agg]],
    * same oracle.
    */
  def evt_sliding_stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingEvents.runSlidingAgg(spark, Tables(spark, dir, "events"))
      .orderBy(col("win_start"), col("event_type"))

  val queries: Map[String, Q] = Map(
    "evt_sliding_agg" -> (evt_sliding_agg _),
    "evt_window_stream" -> (evt_window_stream _),
    "evt_sliding_stream" -> (evt_sliding_stream _),
    "evt_attribution" -> (evt_attribution _),
    "evt_attribution_stream" -> (evt_attribution_stream _),
    "evt_attribution_stream_salted" -> (evt_attribution_stream_salted _),
    "evt_paths" -> (evt_paths _),
    "evt_paths_stream" -> (evt_paths_stream _),
    "evt_sessionize_stream" -> (evt_sessionize_stream _),
    "evt_window_agg" -> (evt_window_agg _),
    "evt_anomaly" -> (evt_anomaly _),
    "evt_anomaly_stream" -> (evt_anomaly_stream _),
    "evt_funnel" -> (evt_funnel _),
    "evt_retention" -> (evt_retention _),
    "evt_funnel_stream" -> (evt_funnel_stream _),
    "evt_retention_stream" -> (evt_retention_stream _),
    "evt_sessionize" -> (evt_sessionize _))

  private val attributionSql =
    """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
      |       epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
      |FROM events c JOIN events v
      |  ON c.user_id = v.user_id
      | AND c.event_type = 'click' AND v.event_type = 'view'
      | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 4 HOUR
      |ORDER BY c.user_id, click_id, view_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // drained stream-stream join ≡ batch join: one oracle, three
    // entries (plain, auto-salted default, forced-salted mitigation)
    "evt_attribution" -> attributionSql,
    "evt_attribution_stream" -> attributionSql,
    "evt_attribution_stream_salted" -> attributionSql,
    "evt_paths" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         lead(event_type, 1) OVER w AS n1,
        |         lead(event_type, 2) OVER w AS n2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_type || '>' || n1 || '>' || n2 AS path, count(*) AS n
        |FROM seq WHERE n1 IS NOT NULL AND n2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "evt_paths_stream" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         lead(event_type, 1) OVER w AS n1,
        |         lead(event_type, 2) OVER w AS n2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_type || '>' || n1 || '>' || n2 AS path, count(*) AS n
        |FROM seq WHERE n1 IS NOT NULL AND n2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    // z computed on its integer core: exact numerator/radicand, one
    // sqrt, one division -> bit-identical doubles on both engines
    "evt_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        |         count(*)::bigint AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*)::bigint AS k,
        |         cast(sum(n) as bigint) AS s, cast(sum(n * n) as bigint) AS ss
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.hour, h.n,
        |       cast(h.n * st.k - st.s as double)
        |         / sqrt(cast(st.k * st.ss - st.s * st.s as double)) AS z
        |FROM h JOIN st USING (event_type)
        |WHERE st.k * st.ss > st.s * st.s
        |  AND abs(cast(h.n * st.k - st.s as double)
        |          / sqrt(cast(st.k * st.ss - st.s * st.s as double))) >= 2.0
        |ORDER BY event_type, hour""".stripMargin,
    "evt_anomaly_stream" ->
      """WITH h AS (
        |  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        |         count(*)::bigint AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*)::bigint AS k,
        |         cast(sum(n) as bigint) AS s, cast(sum(n * n) as bigint) AS ss
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.hour, h.n,
        |       cast(h.n * st.k - st.s as double)
        |         / sqrt(cast(st.k * st.ss - st.s * st.s as double)) AS z
        |FROM h JOIN st USING (event_type)
        |WHERE st.k * st.ss > st.s * st.s
        |  AND abs(cast(h.n * st.k - st.s as double)
        |          / sqrt(cast(st.k * st.ss - st.s * st.s as double))) >= 2.0
        |ORDER BY event_type, hour""".stripMargin,
    "evt_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT '01_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT '02_click', count(*) FROM c
        |UNION ALL SELECT '03_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,
    "evt_retention" ->
      """WITH c AS (
        |  SELECT user_id, min(cast(floor(epoch(ts) / 604800) as bigint)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, cast(floor(epoch(ts) / 604800) as bigint) AS w
        |      FROM events)
        |SELECT c.cohort_week, cast(a.w - c.cohort_week as int) AS week_offset,
        |       count(DISTINCT c.user_id) AS n_users
        |FROM c JOIN a USING (user_id)
        |WHERE a.w - c.cohort_week >= 0 AND a.w - c.cohort_week < 4
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // drained stream ≡ batch: the SAME oracles gate both entries
    "evt_funnel_stream" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT '01_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT '02_click', count(*) FROM c
        |UNION ALL SELECT '03_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,
    "evt_retention_stream" ->
      """WITH c AS (
        |  SELECT user_id, min(cast(floor(epoch(ts) / 604800) as bigint)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, cast(floor(epoch(ts) / 604800) as bigint) AS w
        |      FROM events)
        |SELECT c.cohort_week, cast(a.w - c.cohort_week as int) AS week_offset,
        |       count(DISTINCT c.user_id) AS n_users
        |FROM c JOIN a USING (user_id)
        |WHERE a.w - c.cohort_week >= 0 AND a.w - c.cohort_week < 4
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "evt_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        | event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // drained streaming window agg ≡ batch: same oracle, two entries
    "evt_window_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        | event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "evt_sliding_stream" ->
      """SELECT strftime(date_trunc('hour', ts) - to_hours(u.k), '%Y-%m-%d %H') AS win_start,
        | event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
        |FROM events, unnest([0, 1]) AS u(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // each event lands in the two hop windows whose start is within
    // (ts - 2h, ts]: start = floor_hour(ts) - k hours for k in {0,1}
    "evt_sliding_agg" ->
      """SELECT strftime(date_trunc('hour', ts) - to_hours(u.k), '%Y-%m-%d %H') AS win_start,
        | event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
        |FROM events, unnest([0, 1]) AS u(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // drained sessionize changelog ≡ batch session_window: same oracle
    "evt_sessionize_stream" ->
      """WITH flags AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 1 DAY
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flags
        |), per_session AS (
        |  SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_sessions,
        |  cast(sum(n) as bigint) AS n_events,
        |  cast(max(n) as bigint) AS max_session_events
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,
    "evt_sessionize" ->
      """WITH flags AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 1 DAY
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flags
        |), per_session AS (
        |  SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_sessions,
        |  cast(sum(n) as bigint) AS n_events,
        |  cast(max(n) as bigint) AS max_session_events
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin)
}
