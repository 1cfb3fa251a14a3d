package graft.core

/** DuckDB-SQL twins of the canonical event-log derivation in [[EventLog]].
  * The driver runs these against the same parquet tables and hash-compares
  * with the Spark results, so every expression here must be value-identical
  * to the DataFrame code: integer division only (`//`), no float paths for
  * timestamps, identical tie-breakers in every window.
  */
object Oracle {
  /** WITH-prefix defining raw -> dedup -> evlog, shared by all event queries.
    * Retries (every 97th event) inherit the ORIGINAL event's partition via a
    * self-join on event_id - 1, mirroring EventLog.raw. */
  val base: String =
    """WITH ev AS (
      |  SELECT event_id, epoch_ms(ts) AS timestamp_ms, user_id, event_type, value, props FROM events
      |), raw AS (
      |  SELECT e.event_id, e.timestamp_ms, e.user_id, e.event_type, e.value, e.props,
      |         CAST(coalesce(o.user_id, e.user_id) % 8 AS INT) AS part_id,
      |         'k' || CAST(coalesce(o.event_id, e.event_id) AS VARCHAR) AS idempotency_key
      |  FROM ev e LEFT JOIN ev o
      |    ON e.event_id % 97 = 0 AND e.event_id > 0 AND o.event_id = e.event_id - 1
      |), dedup AS (
      |  SELECT * EXCLUDE (_rn) FROM (
      |    SELECT *, row_number() OVER (PARTITION BY part_id, idempotency_key ORDER BY timestamp_ms, event_id) AS _rn
      |    FROM raw) WHERE _rn = 1
      |), evlog AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY part_id ORDER BY timestamp_ms, event_id) AS BIGINT) AS sequence,
      |         CAST(timestamp_ms // 86400000 AS INT) AS event_date_days,
      |         CAST((timestamp_ms // 3600000) % 24 AS INT) AS event_hour
      |  FROM dedup
      |)
      |""".stripMargin

  /** base + the given SELECT over `evlog`/`raw`/`dedup`. */
  def sql(select: String): String = base + select
}
