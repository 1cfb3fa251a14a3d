package graft.serve

import graft.core.Oracle
import graft.table.{CommittedTables, EventTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Q6 gate: a projected, limited committed read is encoded to an Arrow IPC
  * stream and decoded back; the decoded rows must hash-match the plain SQL
  * oracle — proving the IPC bytes are a faithful encoding of the read. */
object ServeQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_arrow_roundtrip" -> { (s, dir) =>
      val root = CommittedTables.tableRoot(s, dir)
      val cols = ArrowOutput.validateProjection(Seq("sequence", "timestamp_ms", "payload"))
      val read = EventTable
        .readCommitted(s, root)
        .filter(col("partition") === 5 && col("sequence") >= 10L)
        .orderBy("sequence")
        .limit(150)
        .select(cols.map(col): _*)
      val bytes        = ArrowOutput.encode(read)
      val (names, rows) = ArrowOutput.decode(bytes)
      val schema = StructType(Seq(
        StructField("sequence", LongType),
        StructField("timestamp_ms", LongType),
        StructField("payload", BinaryType)
      ))
      require(names == cols, s"arrow schema drift: $names")
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq), schema)
        .select(col("sequence"), col("timestamp_ms"), col("payload").cast("string").as("props"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q6_arrow_roundtrip" -> Oracle.sql(
      """SELECT sequence, timestamp_ms, props FROM evlog
        |WHERE part_id = 5 AND sequence >= 10 ORDER BY sequence LIMIT 150""".stripMargin)
  )
}
