package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's hot-buffer query surface (SURVEY §2.2, Q1–Q5 + Q9) and
  * ingestion-side views (S6 sequence assignment, S7 idempotency dedup, F2
  * hour grouping), re-expressed as declarative DataFrame plans over the
  * canonical log.
  *
  * Reference behaviors matched:
  *  - Q1 offset range scan:  `/root/reference/src/storage/rocksdb.rs:808-849`
  *  - Q2 all-partition merge read: `/root/reference/src/storage/rocksdb.rs:1017-1062`
  *  - Q3 timestamp-range read: `/root/reference/src/storage/rocksdb.rs:1064-1127`
  *  - Q4 column projection: `/root/reference/src/api/handlers.rs:737-813`
  *  - Q5 limit + has_more: `/root/reference/src/api/handlers.rs:992-1002`
  *  - Q9 consumer offsets (deprecated): `/root/reference/src/storage/rocksdb.rs:896-917`
  *  - S7 duplicate returns original offset: `/root/reference/src/storage/rocksdb.rs:504-576`
  *  - F2 hour grouping of flush batches: `/root/reference/src/flusher/mod.rs:338-456`
  *
  * Every query is a filter/sort/limit/agg the optimizer can push down —
  * `TakeOrderedAndProject` for the limit scans, partial aggregation for the
  * groupings. Nothing collects to the driver.
  */
object HotQueries {
  // Time-range window used by q3: [2024-01-05, 2024-01-10) UTC in epoch ms.
  val RangeLo = 1704412800000L
  val RangeHi = 1704844800000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s6_sequence_assign" -> { (s, dir) =>
      EventLog.hot(s, dir).select("part_id", "sequence", "event_id", "timestamp_ms")
    },
    "s7_idempotency_dedup" -> { (s, dir) =>
      EventLog
        .raw(s, dir)
        .groupBy("idempotency_key", "part_id")
        .agg(count(lit(1)).as("n_attempts"), min("event_id").as("winner_event_id"))
        .filter(col("n_attempts") > 1)
    },
    "q1_offset_scan" -> { (s, dir) =>
      EventLog
        .hot(s, dir)
        .filter(col("part_id") === 3 && col("sequence") >= 100L)
        .orderBy("sequence")
        .limit(500)
        .select("sequence", "event_id", "timestamp_ms", "event_type")
    },
    "q2_merge_read" -> { (s, dir) =>
      EventLog
        .hot(s, dir)
        .orderBy("timestamp_ms", "part_id", "sequence")
        .limit(1000)
        .select("timestamp_ms", "part_id", "sequence", "event_id")
    },
    "q3_time_range" -> { (s, dir) =>
      EventLog
        .hot(s, dir)
        .filter(col("timestamp_ms") >= RangeLo && col("timestamp_ms") < RangeHi)
        .select("event_id", "timestamp_ms", "event_type", "part_id", "sequence")
    },
    "q4_projection" -> { (s, dir) =>
      EventLog.hot(s, dir).filter(col("part_id") === 2).select("event_id", "event_type")
    },
    "q5_limit_hasmore" -> { (s, dir) =>
      val l     = EventLog.hot(s, dir)
      val total = l.select(count(lit(1)).as("_total"))
      l.orderBy("timestamp_ms", "part_id", "sequence")
        .limit(200)
        .select("timestamp_ms", "part_id", "sequence", "event_id")
        .crossJoin(broadcast(total))
        .withColumn("has_more", col("_total") > 200L)
        .drop("_total")
    },
    "f2_hour_grouping" -> { (s, dir) =>
      EventLog
        .hot(s, dir)
        .groupBy("event_date_days", "event_hour", "part_id")
        .agg(
          count(lit(1)).as("n_events"),
          min("sequence").as("min_seq"),
          max("sequence").as("max_seq"),
          min("timestamp_ms").as("min_ts"),
          max("timestamp_ms").as("max_ts")
        )
    },
    "q9_consumer_offsets" -> { (s, dir) =>
      EventLog
        .hot(s, dir)
        .groupBy("part_id")
        .agg(max("sequence").as("committed_offset"))
        .withColumn("consumer_group", lit("g1"))
    },
    // Analytical surface over the log (what external engines run against
    // the committed table): exact aggregates — doubles summed as DECIMAL so
    // the result is order-independent and hash-stable.
    "agg_event_type_stats" -> { (s, dir) =>
      EventLog
        .hot(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          (sum(col("value").cast("decimal(18,6)")) * 1000000).cast("long").as("sum_value_micro"),
          min("timestamp_ms").as("first_ts"),
          max("timestamp_ms").as("last_ts")
        )
    },
    // Sessionization: a new session starts after a >30min gap per user —
    // the classic event-analytics window, one shuffle on user_id.
    "w1_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("timestamp_ms", "event_id")
      EventLog
        .hot(s, dir)
        .withColumn("prev_ts", lag("timestamp_ms", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("timestamp_ms") - col("prev_ts") > 1800000L, 1).otherwise(0))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum("new_session").cast("long").as("n_sessions"),
          max(col("timestamp_ms") - col("prev_ts")).as("max_gap_ms")
        )
    }
  )

  def oracles: Map[String, String] = Map(
    "s6_sequence_assign" -> Oracle.sql(
      "SELECT part_id, sequence, event_id, timestamp_ms FROM evlog"),
    "s7_idempotency_dedup" -> Oracle.sql(
      """SELECT idempotency_key, part_id, count(*) AS n_attempts, min(event_id) AS winner_event_id
        |FROM raw GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin),
    "q1_offset_scan" -> Oracle.sql(
      """SELECT sequence, event_id, timestamp_ms, event_type FROM evlog
        |WHERE part_id = 3 AND sequence >= 100 ORDER BY sequence LIMIT 500""".stripMargin),
    "q2_merge_read" -> Oracle.sql(
      """SELECT timestamp_ms, part_id, sequence, event_id FROM evlog
        |ORDER BY timestamp_ms, part_id, sequence LIMIT 1000""".stripMargin),
    "q3_time_range" -> Oracle.sql(
      s"""SELECT event_id, timestamp_ms, event_type, part_id, sequence FROM evlog
         |WHERE timestamp_ms >= $RangeLo AND timestamp_ms < $RangeHi""".stripMargin),
    "q4_projection" -> Oracle.sql(
      "SELECT event_id, event_type FROM evlog WHERE part_id = 2"),
    "q5_limit_hasmore" -> Oracle.sql(
      """SELECT timestamp_ms, part_id, sequence, event_id,
        |       (SELECT count(*) FROM evlog) > 200 AS has_more
        |FROM evlog ORDER BY timestamp_ms, part_id, sequence LIMIT 200""".stripMargin),
    "f2_hour_grouping" -> Oracle.sql(
      """SELECT event_date_days, event_hour, part_id, count(*) AS n_events,
        |       min(sequence) AS min_seq, max(sequence) AS max_seq,
        |       min(timestamp_ms) AS min_ts, max(timestamp_ms) AS max_ts
        |FROM evlog GROUP BY 1, 2, 3""".stripMargin),
    "q9_consumer_offsets" -> Oracle.sql(
      """SELECT part_id, max(sequence) AS committed_offset, 'g1' AS consumer_group
        |FROM evlog GROUP BY 1""".stripMargin),
    "agg_event_type_stats" -> Oracle.sql(
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_value_micro,
        |       min(timestamp_ms) AS first_ts, max(timestamp_ms) AS last_ts
        |FROM evlog GROUP BY 1""".stripMargin),
    "w1_sessionize" -> Oracle.sql(
      """SELECT user_id, count(*) AS n_events,
        |       CAST(sum(CASE WHEN prev_ts IS NULL OR timestamp_ms - prev_ts > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       max(timestamp_ms - prev_ts) AS max_gap_ms
        |FROM (
        |  SELECT user_id, event_id, timestamp_ms,
        |         lag(timestamp_ms) OVER (PARTITION BY user_id ORDER BY timestamp_ms, event_id) AS prev_ts
        |  FROM evlog)
        |GROUP BY 1""".stripMargin)
  )
}
