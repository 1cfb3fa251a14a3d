package graft.table

import graft.iceberg.{IcebergCommitter, TableIO}
import org.apache.spark.sql.SparkSession

/** The nightly maintenance composite a long-lived table needs — ONE call
  * that restores every bounded-metadata invariant the write path erodes:
  *
  *  1. sweep crashed-write staging dirs ([[EventTable.sweepStaging]]);
  *  2. compact until no candidate remains — the size rules AND the
  *     delete-ratio trigger under `compactionCfg`, so merge-on-read
  *     delete files FOLD and the V2 scan's mask weight returns to zero;
  *  3. `rewrite_manifests` — coalesce the carry-forward manifest list
  *     (one manifest per live (content, spec)) so planning stops walking
  *     one Avro object per historical commit;
  *  4. expire snapshots under the given retention — bounds the snapshots
  *     array in `v{N}.metadata.json` and physically GCs files (data AND
  *     delete) no retained snapshot references;
  *  5. distributed orphan GC for crash leftovers past `gcHorizonMs`.
  *
  * Each step is individually CAS-safe; a concurrent commit aborts the run
  * with [[graft.iceberg.CommitConflict]] (the next vacuum picks up), and
  * an unpublished WAP stage makes the expiry step refuse loudly rather
  * than GC staged work. A 100 TB table at a 5 s trigger accretes ~17k
  * snapshots/day — this is the call that keeps its metadata parse cost
  * flat (the reference never faced this: 300 s flushes, short-lived
  * tables; our engine added time travel and rollback, so it must also
  * bound their retention). */
object Maintenance {
  final case class VacuumReport(
      stagingSwept: Int,
      compactions: Int,
      manifestsCoalesced: Boolean,
      expiredSnapshots: Int,
      orphansRemoved: Int,
      compactionTruncated: Boolean = false)

  /** `stepLock`: each STEP synchronizes on it separately (never the whole
    * composite) — a caller serializing vacuum against its own writers (the
    * gateway's per-table flush lock) lets flushes interleave between
    * compaction passes instead of stalling ingestion for the full run;
    * every step is individually CAS-safe, so interleaving is correct.
    *
    * `keepNewerThanTsMs` is an ABSOLUTE epoch cutoff (Iceberg's
    * expire_snapshots(older_than)); a relative age is rejected loudly —
    * see [[IcebergCommitter.expireSnapshots]].
    *
    * The compact-until-dry loop is BOUNDED by `maxCompactionPasses`:
    * because flushes interleave between passes, sustained ingestion can
    * mint fresh candidates forever (3 small files per partition dir
    * re-qualify a group) — an uncapped loop would hold the caller's
    * compacting guard indefinitely. A truncated run reports
    * `compactionTruncated = true`; the next vacuum continues the work. */
  def vacuum(spark: SparkSession, tableRoot: String,
             compactionCfg: Compaction.Config = Compaction.Config(),
             keepSnapshots: Int = 2,
             keepNewerThanTsMs: Long = Long.MaxValue,
             gcHorizonMs: Long = 24L * 60 * 60 * 1000,
             stepLock: AnyRef = new AnyRef,
             maxCompactionPasses: Int = 32): VacuumReport = {
    def step[A](f: => A): A = stepLock.synchronized(f)
    val swept = step { EventTable.sweepStaging(tableRoot) }
    var compactions = 0
    while (compactions < maxCompactionPasses &&
           step { Compaction.compact(spark, tableRoot, compactionCfg) }.isDefined)
      compactions += 1
    val truncated = compactions >= maxCompactionPasses
    val committer = new IcebergCommitter(TableIO.forRoot(tableRoot), EventTable.Topic)
    // rewrite BEFORE expiry: the coalesced snapshot becomes current, and
    // the expiry that follows GCs the superseded per-commit manifests with
    // the historical snapshots that referenced them
    val coalesced = step { committer.rewriteManifests().isDefined }
    val expired   = step { committer.expireSnapshots(keepSnapshots, keepNewerThanTsMs).size }
    val orphans   = step { graft.iceberg.OrphanGc.remove(spark, tableRoot, gcHorizonMs).size }
    VacuumReport(swept, compactions, coalesced, expired, orphans, truncated)
  }
}
