package graft.analytics

import graft.core.EventLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the event stream — the two join shapes an
  * event-log engine needs beyond equi-joins, each built as the SCALE-SAFE
  * plan, not the naive theta-join:
  *
  *  - AS-OF JOIN (`j1`): "for each probe event, the most recent prior
  *    build-side event of the same key". The naive plan is a key-equi +
  *    time-theta join (quadratic per key, then rank) — instead both sides
  *    are UNIONED and sorted once per key, and a running
  *    `last(_, ignoreNulls)` window carries the newest build row forward.
  *    One shuffle on the join key, O(n log n) per key, no pair explosion —
  *    the same merge-scan shape DuckDB's ASOF JOIN and kdb's `aj` lower to.
  *
  *  - RANGE (interval) JOIN (`j2`): "all events within ±W of each probe"
  *    with NO equi key. The naive plan is a full cross join with a time
  *    filter. Instead time is BUCKETED at the window width: probes expand
  *    to their 3 covering buckets, events keep their single home bucket,
  *    and the join becomes an equi-join on bucket + a residual filter.
  *    Each qualifying pair meets in exactly one bucket (the event's home
  *    bucket), so no post-dedup is needed. Shuffle is bucket-local;
  *    candidate count is O(events in ±1 bucket), not O(n²) — the standard
  *    bucketed interval-join (Flink's interval join / Spark range-join
  *    hints lower to the same shape).
  *
  * Both reuse the canonical ms event-time derivation ([[EventLog.events]])
  * so the DuckDB oracles line up bit-for-bit; outputs are integer-only
  * (counts, id checksums, ms gaps) to stay hash-stable.
  */
object JoinQueries {

  /** j2's half-window width in ms (±5 min), and its bucket size. */
  val RangeWindowMs = 300000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // AS-OF: each click joins the most recent prior purchase of its user
    // ("prior" = lexicographically earlier (t_ms, event_id), so same-ms
    // ordering is deterministic). Aggregated per user with id checksums —
    // every click's matched purchase id feeds sum_matched_eid, so one
    // misassigned row breaks the hash.
    "j1_asof_join" -> { (s, dir) =>
      val e = EventLog
        .events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(
          col("user_id"),
          col("timestamp_ms").as("t_ms"),
          col("event_id"),
          when(col("event_type") === "purchase", col("event_id")).as("p_eid"),
          when(col("event_type") === "purchase", col("timestamp_ms")).as("p_tms"),
          (col("event_type") === "click").as("is_click")
        )
      // per-user running "latest purchase so far" — the merge-scan as-of
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("t_ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_p_eid", last(col("p_eid"), ignoreNulls = true).over(w))
        .withColumn("last_p_tms", last(col("p_tms"), ignoreNulls = true).over(w))
        .filter(col("is_click"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_clicks"),
          count(col("last_p_eid")).as("n_matched"),
          coalesce(sum(col("last_p_eid")), lit(0L)).as("sum_matched_eid"),
          coalesce(max(col("t_ms") - col("last_p_tms")), lit(-1L)).as("max_gap_ms")
        )
    },

    // RANGE: per error event, how many events (any type, any user) landed
    // within ±5 minutes — bucketed interval join, zero-match probes kept.
    "j2_range_join" -> { (s, dir) =>
      val W   = RangeWindowMs
      val all = EventLog
        .events(s, dir)
        .select(col("event_id"), col("timestamp_ms").as("t_ms"))
        .withColumn("b", expr(s"t_ms div $W"))
      val probes = EventLog
        .events(s, dir)
        .filter(col("event_type") === "error")
        .select(col("event_id").as("p_eid"), col("timestamp_ms").as("p_t"))
        .withColumn("pb", expr(s"p_t div $W"))
      val expanded = probes
        .withColumn("jb", explode(array(col("pb") - 1, col("pb"), col("pb") + 1)))
      val matches = expanded
        .join(all, col("jb") === col("b"))
        .filter(abs(col("t_ms") - col("p_t")) <= W && col("event_id") =!= col("p_eid"))
        .groupBy(col("p_eid"), col("p_t"))
        .agg(count(lit(1)).as("n_within"), sum(col("event_id")).as("sum_within_eid"))
      probes
        .select(col("p_eid"), col("p_t"))
        .join(matches, Seq("p_eid", "p_t"), "left")
        .select(
          col("p_eid").as("event_id"),
          col("p_t").as("t_ms"),
          coalesce(col("n_within"), lit(0L)).as("n_within"),
          coalesce(col("sum_within_eid"), lit(0L)).as("sum_within_eid")
        )
    }
  )

  def oracles: Map[String, String] = Map(
    "j1_asof_join" ->
      """WITH ev AS (SELECT event_id, epoch_ms(ts) AS t_ms, user_id, event_type FROM events),
        |c AS (SELECT event_id, user_id, t_ms FROM ev WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, t_ms FROM ev WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT c.event_id AS c_eid, c.user_id, c.t_ms AS c_t, p.event_id AS p_eid, p.t_ms AS p_t,
        |         row_number() OVER (PARTITION BY c.event_id ORDER BY p.t_ms DESC, p.event_id DESC) AS rn
        |  FROM c JOIN p ON p.user_id = c.user_id
        |   AND (p.t_ms < c.t_ms OR (p.t_ms = c.t_ms AND p.event_id < c.event_id))),
        |best AS (SELECT * FROM m WHERE rn = 1)
        |SELECT c.user_id, count(*) AS n_clicks, count(b.p_eid) AS n_matched,
        |  CAST(coalesce(sum(b.p_eid), 0) AS BIGINT) AS sum_matched_eid,
        |  coalesce(max(c.t_ms - b.p_t), -1) AS max_gap_ms
        |FROM c LEFT JOIN best b ON b.c_eid = c.event_id
        |GROUP BY 1""".stripMargin,
    "j2_range_join" ->
      s"""WITH ev AS (SELECT event_id, epoch_ms(ts) AS t_ms, user_id, event_type FROM events),
         |pr AS (SELECT event_id, t_ms FROM ev WHERE event_type = 'error')
         |SELECT pr.event_id, pr.t_ms, count(e.event_id) AS n_within,
         |  CAST(coalesce(sum(e.event_id), 0) AS BIGINT) AS sum_within_eid
         |FROM pr LEFT JOIN ev e
         |  ON e.event_id != pr.event_id AND abs(e.t_ms - pr.t_ms) <= $RangeWindowMs
         |GROUP BY 1, 2""".stripMargin
  )
}
