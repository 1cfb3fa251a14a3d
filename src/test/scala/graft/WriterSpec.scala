package graft

import graft.core.EventLog
import graft.table.EventTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The size-targeted writer's file-count contract: exactly
  * Σ ceil(partition_bytes / target) files — the arithmetic the
  * a4_manifest_totals oracle (and manifest totals at any scale) relies on.
  * Routing (partition, bucket) through the dynamic-partition writer makes
  * the count exact even when two buckets hash to one shuffle task. */
class WriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeData emits exactly ceil(bytes/target) files per partition; returns its own files") {
    val df   = EventTable.committedSchema(EventLog.log(spark, "/root/testdata/sf0.001"))
    val root = Files.createTempDirectory("graft-writer-").toString
    val target = 8L * 1024 // force several buckets per partition
    val expected = df
      .groupBy("partition")
      .agg(sum(length(col("payload")) + lit(64L)).as("bytes"))
      .collect()
      .map(r => math.max(1L, (r.getLong(1) + target - 1) / target))
      .sum
    val written = EventTable.writeData(df, root, targetFileSize = target)
    assert(written.size.toLong === expected, "file count must be exactly Σ ceil(bytes/target)")
    assert(EventTable.listParquet(root).toSet === written.toSet,
      "returned list must be exactly what landed in data/")
    // every file holds one partition and rows stay intact
    val back = EventTable.readCommitted(spark,
      { // commit so readCommitted can resolve the files
        val c = new graft.iceberg.IcebergCommitter(new graft.iceberg.LocalTableIO(root), "events")
        val files = EventTable.collectDataFiles(spark, root, written)
        c.commitAppend(files, EventTable.watermarksOf(files))
        root
      })
    assert(back.count() === df.count())
  }
}
