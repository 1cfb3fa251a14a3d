package graft.table

import graft.core.EventLog
import graft.iceberg._
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The flush pipeline (SURVEY §2.3 F2–F4) + cold read, Spark-first.
  *
  * Reference behaviors matched:
  *  - hour grouping + per-partition flush (`/root/reference/src/flusher/mod.rs:338-456`):
  *    here a single shuffle on (event_date, event_hour, partition) — the
  *    partitionBy writer splits hour groups for free
  *  - sorted Zstd parquet segments in
  *    `data/event_date=…/event_hour=…/partition=…/` layout
  *    (`/root/reference/src/storage/iceberg_storage.rs:1318-1387,1789-1808`,
  *    sort `/root/reference/src/storage/parquet.rs:657-683`)
  *  - per-file column statistics read from parquet FOOTERS (metadata-only,
  *    no data re-scan) → Iceberg big-endian bounds
  *    (`/root/reference/src/storage/parquet.rs:479-604`)
  *
  * Scale notes: the one shuffle keys on the same columns as the physical
  * layout, so each (date, hour, partition) group is written by exactly one
  * task (no small-file explosion); file size is bounded via
  * `maxRecordsPerFile`. Footer reads and the snapshot commit are driver-side
  * metadata operations proportional to #files, not #rows.
  */
object EventTable {
  val Topic = "events"

  /** Canonical log projected to the reference's 8-column committed schema.
    * `event_date`/`event_hour`/`partition` become directory columns. */
  def committedSchema(log: DataFrame): DataFrame =
    log.select(
      col("sequence"),
      lit(Topic).as("topic"),
      col("props").cast("binary").as("payload"),
      col("timestamp_ms"),
      col("idempotency_key"),
      expr("date_add(date '1970-01-01', event_date_days)").as("event_date"),
      col("event_hour"),
      col("part_id").as("partition")
    )

  /** F2+F3: one sorted, hour-partitioned Zstd parquet write.
    * `saltFiles > 1` deliberately fragments each partition dir into that many
    * files (used to exercise compaction); 0/1 writes one file per group. */
  def writeData(df: DataFrame, tableRoot: String, saltFiles: Int = 1): Unit = {
    val parts = Seq(col("event_date"), col("event_hour"), col("partition"))
    val distributed =
      if (saltFiles > 1)
        df.repartition((parts :+ pmod(col("sequence"), lit(saltFiles))): _*)
      else df.repartition(parts: _*)
    distributed
      .sortWithinPartitions(col("event_date"), col("event_hour"), col("partition"), col("timestamp_ms"), col("sequence"))
      .write
      .mode("append")
      .option("compression", "zstd")
      .partitionBy("event_date", "event_hour", "partition")
      .parquet(s"$tableRoot/data")
  }

  /** F4: DataFile stats from parquet footers + identity partition values
    * parsed from the Hive-style path. Paths stored table-root-relative. */
  def collectDataFiles(tableRoot: String, newFiles: Seq[Path]): Seq[DataFile] = {
    val conf = new Configuration()
    newFiles.map { p =>
      val rel    = Paths.get(tableRoot).relativize(p).toString
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toString), conf))
      var rows                                   = 0L
      var seqMin, tsMin                          = Long.MaxValue
      var seqMax, tsMax                          = Long.MinValue
      try {
        reader.getFooter.getBlocks.asScala.foreach { b =>
          rows += b.getRowCount
          b.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            val st   = c.getStatistics
            if (st != null && !st.isEmpty) name match {
              case "sequence" =>
                seqMin = math.min(seqMin, st.genericGetMin.asInstanceOf[java.lang.Long])
                seqMax = math.max(seqMax, st.genericGetMax.asInstanceOf[java.lang.Long])
              case "timestamp_ms" =>
                tsMin = math.min(tsMin, st.genericGetMin.asInstanceOf[java.lang.Long])
                tsMax = math.max(tsMax, st.genericGetMax.asInstanceOf[java.lang.Long])
              case _ => ()
            }
          }
        }
      } finally reader.close()

      // Identity partition values from the path: event_date=…/event_hour=…/partition=…
      val partVals = rel
        .split('/')
        .filter(_.contains('='))
        .map { seg => val Array(k, v) = seg.split("=", 2); k -> v }
        .toMap
      val dateDays = java.time.LocalDate.parse(partVals("event_date")).toEpochDay.toInt
      val hour     = partVals("event_hour").toInt
      val part     = partVals("partition").toInt

      DataFile(
        content = 0,
        filePath = rel,
        fileFormat = "PARQUET",
        recordCount = rows,
        fileSizeInBytes = Files.size(p),
        lowerBounds = Map(
          FieldIds.Sequence    -> Bounds.encodeLong(seqMin),
          FieldIds.Partition   -> Bounds.encodeInt(part),
          FieldIds.TimestampMs -> Bounds.encodeLong(tsMin),
          FieldIds.EventDate   -> Bounds.encodeInt(dateDays),
          FieldIds.EventHour   -> Bounds.encodeInt(hour)
        ),
        upperBounds = Map(
          FieldIds.Sequence    -> Bounds.encodeLong(seqMax),
          FieldIds.Partition   -> Bounds.encodeInt(part),
          FieldIds.TimestampMs -> Bounds.encodeLong(tsMax),
          FieldIds.EventDate   -> Bounds.encodeInt(dateDays),
          FieldIds.EventHour   -> Bounds.encodeInt(hour)
        )
      )
    }
  }

  def listParquet(tableRoot: String): Seq[Path] = {
    val dataDir = Paths.get(tableRoot, "data")
    if (!Files.isDirectory(dataDir)) Nil
    else {
      val s = Files.walk(dataDir)
      try s.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      finally s.close()
    }
  }

  /** Full ingest → sorted partitioned write → stats → Iceberg append commit.
    * Returns the committer for follow-up metadata queries. */
  def ingestAndCommit(spark: SparkSession, sfDir: String, tableRoot: String, saltFiles: Int = 1): IcebergCommitter = {
    val log = EventLog.log(spark, sfDir)
    writeData(committedSchema(log), tableRoot, saltFiles)
    val committer = new IcebergCommitter(new LocalTableIO(tableRoot), Topic)
    val dataFiles = collectDataFiles(tableRoot, listParquet(tableRoot))
    val watermarks = dataFiles
      .flatMap(f => for { p <- f.lowerInt(FieldIds.Partition); s <- f.upperLong(FieldIds.Sequence) } yield p -> s)
      .groupMapReduce(_._1)(_._2)(math.max)
    committer.commitAppend(dataFiles, watermarks)
    committer
  }

  /** Cold read over the committed snapshot: manifest-driven file listing.
    * `basePath` lets Spark recover the identity partition columns from the
    * Hive-style paths. */
  def readCommitted(spark: SparkSession, tableRoot: String, files: Seq[DataFile] = null): DataFrame = {
    val committer = new IcebergCommitter(new LocalTableIO(tableRoot), Topic)
    val active    = Option(files).getOrElse(committer.activeDataFiles())
    val paths     = active.map(f => s"$tableRoot/${f.filePath}")
    spark.read.option("basePath", s"$tableRoot/data").parquet(paths: _*)
  }

  /** Manifest-level file pruning for a timestamp range (Q3's payoff at
    * scale: skip entire files before Spark ever lists them). */
  def pruneByTimeRange(committer: IcebergCommitter, loMs: Long, hiMs: Long): Seq[DataFile] =
    committer.activeDataFiles().filter { f =>
      val lo = f.lowerLong(FieldIds.TimestampMs).getOrElse(Long.MinValue)
      val hi = f.upperLong(FieldIds.TimestampMs).getOrElse(Long.MaxValue)
      hi >= loMs && lo < hiMs
    }
}

/** One committed table per (JVM, sfDir), built lazily — queries over the
  * committed snapshot share a single ingest+commit. */
object CommittedTables {
  private val cache = scala.collection.mutable.Map.empty[String, String]

  def tableRoot(spark: SparkSession, sfDir: String): String = synchronized {
    cache.getOrElseUpdate(
      sfDir, {
        val root = Files.createTempDirectory("graft-table-").toString
        EventTable.ingestAndCommit(spark, sfDir, root)
        root
      }
    )
  }
}
