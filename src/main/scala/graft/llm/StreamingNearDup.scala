package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental near-duplicate detection over a STREAMING corpus — the
  * online twin of `d2_minhash_lsh` for documents that arrive continuously
  * (crawler output, export drops) where "re-run the batch dedup" means
  * re-reading the whole corpus per drop.
  *
  * Shape: the same stateless MinHash signature + LSH band computation as
  * d2 ([[LlmQueries.signaturesOf]] — one plan fragment for both paths),
  * then `flatMapGroupsWithState` keyed by (band, band_hash): each bucket's
  * state holds the (doc_id, signature) list of its members, and a newly
  * arrived doc emits one candidate pair per existing member, scored by the
  * signature-estimated Jaccard (matching minhash positions / K — the
  * standard streaming estimate; the exact set verify needs the full
  * shingle sets, which no bounded state can hold).
  *
  * Every pair is emitted EXACTLY ONCE per shared band — when its second
  * member arrives — so over any prefix of the stream the emitted set
  * equals the batch answer on the documents seen so far (order-independent
  * while no bucket overflows).
  *
  * Scale guards:
  *  - state per bucket is capped at `maxBucket` ([[LlmQueries.BandMaxBucket]]
  *    by default — d2's hot-bucket cap). A FULL bucket stops ADMITTING new
  *    members (the streaming analogue of d2's drop-the-bucket: pairs
  *    already emitted cannot be retracted in append mode) and counts the
  *    overflow, surfaced via [[overflow]] markers so the cap is never
  *    silent. Bounded state ⇒ bounded per-trigger work: a hot bucket costs
  *    O(cap) per arrival, never O(bucket²).
  *  - signatures in state are K short strings per doc (~100 B) — a bucket
  *    at cap holds ~25 KB; RocksDB state keeps the total off-heap.
  *
  * Reference behavior: the dedup semantics of `d2_minhash_lsh` (SPEC
  * near-dup pipeline) applied to the streamed-corpus arrival path the
  * reference serves through its write API.
  */
object StreamingNearDup {

  /** One exploded band row per (doc, band). */
  final case class BandRow(band: Int, band_hash: String, doc_id: Long, sig: Seq[String])

  /** Candidate pair with the signature-estimated Jaccard (integer
    * permille). `band` identifies which bucket produced it — a pair
    * agreeing on both bands appears once per band, like the batch band
    * join before its `distinct()`. */
  final case class CandidatePair(doc_a: Long, doc_b: Long, band: Int, est_permille: Long)

  /** Per-bucket state: admitted members + how many arrivals the cap turned
    * away. `ids`/`sigs`/`admitMs` are parallel lists (a Map is not
    * encodable as cheaply and lookup is a full scan either way at cap
    * size); `admitMs` stamps each member's ADMISSION so the TTL horizon
    * expires members individually by age — a bucket-level idle stamp
    * would let steady traffic keep arbitrarily old members alive. */
  final case class BucketState(ids: List[Long], sigs: List[Seq[String]], overflowed: Long,
                               admitMs: List[Long] = Nil)

  /** Stateless (doc, band) explosion shared by [[pairs]] and [[overflow]]
    * — column pruning drops the signature frame's unused set columns. */
  private def bandRowsOf(docsStream: DataFrame): Dataset[BandRow] = {
    val s = docsStream.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(s)
    LlmQueries.signaturesOf(docsStream)
      .select(col("doc_id"), col("sig"), explode(expr(LlmQueries.minhashBandsExpr)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.band_hash").as("band_hash"),
              col("doc_id"), col("sig"))
      .as[BandRow]
  }

  /** The PURE per-trigger bucket transition shared by [[pairs]] and
    * [[overflow]] (and property-tested in isolation): fold this trigger's
    * arrivals into the bucket state, returning the new state, the pairs
    * emitted, and how many arrivals the cap refused this trigger.
    *
    * Arrivals are sorted by doc_id first — group-iterator order is not
    * contractual, and a replayed trigger must emit the IDENTICAL output
    * for the file sink's exactly-once story. The sort materializes one
    * bucket's arrivals for one trigger: bounded by per-trigger input
    * (`maxFilesPerTrigger`), not by the bucket's lifetime size.
    *
    * `ttlMs` is the DEDUP HORIZON: members admitted more than the TTL
    * before `nowMs` are expired FIRST (each by its own `admitMs` age —
    * per-member, so steady bucket traffic cannot keep old members alive),
    * freeing their capacity; arrivals then pair only against members
    * inside the horizon — the bounded-retention mode a perpetual 100 TB
    * stream runs in. Callers pass the BATCH processing time as `nowMs`
    * (stable across a replay), never the wall clock. Expiry runs on
    * arrival, not via GroupStateTimeout: with ProcessingTimeTimeout an
    * AvailableNow replay waits out every registered timeout before
    * terminating (measured here as a hung spec at a 1 h TTL); a bucket
    * that never sees another arrival keeps its last state — dead-bucket
    * GC belongs to checkpoint rotation, not the hot path.
    *
    * `refused` counts refused ARRIVALS, not distinct documents: under
    * at-least-once upstream delivery a re-sent refused doc counts again
    * (remembering refused ids would grow state without bound — the very
    * thing the cap exists to prevent). */
  private[graft] def stepBucket(band: Int, st0: BucketState, arrivals: Seq[BandRow],
                                maxBucket: Int, nowMs: Long = 0L,
                                ttlMs: Option[Long] = None): (BucketState, Seq[CandidatePair], Long) = {
    val k = LlmQueries.MinHashK
    // states written before admitMs existed (or test fixtures) are treated
    // as admitted-now rather than mis-zipped
    val admits0 =
      if (st0.admitMs.length == st0.ids.length) st0.admitMs else st0.ids.map(_ => nowMs)
    var st = ttlMs match {
      case Some(ttl) =>
        val h = nowMs - ttl
        val kept = st0.ids.lazyZip(st0.sigs).lazyZip(admits0).toList.filter(_._3 >= h)
        BucketState(kept.map(_._1), kept.map(_._2), st0.overflowed, kept.map(_._3))
      case None => st0.copy(admitMs = admits0)
    }
    var refused = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
    arrivals.sortBy(_.doc_id).foreach { r =>
      if (!st.ids.contains(r.doc_id)) {
        if (st.ids.size >= maxBucket) { st = st.copy(overflowed = st.overflowed + 1); refused += 1 }
        else {
          st.ids.iterator.zip(st.sigs.iterator).foreach { case (oid, osig) =>
            val matches = osig.iterator.zip(r.sig.iterator).count { case (a, b) => a == b }
            out += CandidatePair(math.min(oid, r.doc_id), math.max(oid, r.doc_id),
                                 band, 1000L * matches / k)
          }
          st = BucketState(r.doc_id :: st.ids, r.sig :: st.sigs, st.overflowed, nowMs :: st.admitMs)
        }
      }
    }
    (st, out.toSeq, refused)
  }

  /** The single stateful transition both streams run: resolve the batch
    * processing time (NOT the wall clock — the batch timestamp is
    * recorded with the batch, so a replayed trigger expires the same
    * members and emits the identical output), step the bucket, persist
    * the new state, and hand back (emitted pairs, refused count) for the
    * caller to project. One body so the two query shapes cannot drift. */
  private def stepGroup(key: (Int, String), rows: Iterator[BandRow],
                        state: GroupState[BucketState], maxBucket: Int,
                        stateTtlMs: Option[Long]): (Seq[CandidatePair], Long) = {
    val nowMs = state.getCurrentProcessingTimeMs()
    val (st, out, refused) = stepBucket(key._1,
      state.getOption.getOrElse(BucketState(Nil, Nil, 0L)),
      rows.toSeq, maxBucket, nowMs, stateTtlMs)
    state.update(st)
    (out, refused)
  }

  /** Candidate-pair stream over a streaming (doc_id, text) frame. */
  def pairs(docsStream: DataFrame,
            maxBucket: Int = LlmQueries.BandMaxBucket,
            stateTtlMs: Option[Long] = None): Dataset[CandidatePair] = {
    val s = docsStream.sparkSession
    import s.implicits._
    bandRowsOf(docsStream)
      .groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, String), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          stepGroup(key, rows, state, maxBucket, stateTtlMs)._1.iterator)
  }

  /** Overflow audit over the same state: buckets report how many arrivals
    * the cap refused (run as its own query over a replayed stream, or
    * derived downstream by counting `est_permille IS NULL` markers in an
    * extended emit — kept separate so the hot pair path stays narrow). */
  def overflow(docsStream: DataFrame,
               maxBucket: Int = LlmQueries.BandMaxBucket,
               stateTtlMs: Option[Long] = None): Dataset[(Int, String, Long)] = {
    val s = docsStream.sparkSession
    import s.implicits._
    bandRowsOf(docsStream)
      .groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, String), rows: Iterator[BandRow], state: GroupState[BucketState]) => {
          val refused = stepGroup(key, rows, state, maxBucket, stateTtlMs)._2
          if (refused > 0) Iterator.single((key._1, key._2, refused)) else Iterator.empty
        })
  }
}
