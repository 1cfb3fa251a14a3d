package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents.parquet` and
  * `embeddings.parquet` — the large-scale data-curation surface layered on
  * top of the event engine (brief §"training-data pipeline"; the reference
  * itself stops at opaque payloads, `/root/reference/SPEC.md:761-773`, so
  * these are Spark-first designs, not ports).
  *
  * Every operator is written for the 100 TB shape:
  *  - exact dedup: one hash-shuffle on the content hash, no collect
  *  - near-dedup: shingle → MinHash signature → LSH band buckets; candidate
  *    pairs are generated ONLY inside band buckets (a shuffle-local
  *    self-join on (band, hash)), then verified with exact Jaccard — the
  *    classic MinHash/LSH plan; NO all-pairs crossJoin anywhere
  *  - SimHash: per-doc 16-bit fingerprint from word-hash bit votes —
  *    near-dup candidates share fingerprints; pure map-side
  *  - ANN: brute-force top-k as the exact baseline, shaped as
  *    broadcast(small query set) × partial top-k per partition (never a
  *    full×full shuffle); plus a random-hyperplane LSH variant whose
  *    candidate set is bucket-local
  *  - text stats / language-ID / token counts: pure map-side expressions
  *
  * Determinism contract with the DuckDB oracle: all hashing goes through
  * md5 hex strings (identical in Spark and DuckDB), all ranking floats are
  * computed as sequential double dot products (bit-identical to DuckDB's
  * `list_inner_product` on DOUBLE[] — verified), all counts are longs.
  */
object LlmQueries {
  // ---- MinHash / LSH parameters (K = Bands × RowsPerBand) ----
  // 2 bands × 6 rows ⇒ LSH threshold (1/b)^(1/r) ≈ 0.89 — proper near-dup
  // territory; a shallower curve floods this small-vocabulary corpus with
  // low-similarity candidates.
  val MinHashK     = 12
  val Bands        = 2
  val RowsPerBand  = 6

  /** Largest prime below 2^32 — the universal-hash modulus. */
  val MinHashP = 4294967291L

  /** Winnowing window: guarantee window of W consecutive k-gram hashes. */
  val WinnowWindow = 4

  /** d16: the incoming-batch slice — every [[IncrEvery]]-th doc (slot
    * [[IncrSlot]]) plays "today's crawl"; the rest is the already-admitted
    * corpus it must be deduplicated against. A modulus split (not a range
    * split) so planted near-dup pairs straddle the boundary at every SF. */
  val IncrEvery = 5L
  val IncrSlot  = 0L

  /** ann_incremental_add: id offset that makes the synthesized vector
    * batch disjoint from every corpus vec_id at any SF (the qscale shift
    * constant applied to the ANN admission path). */
  val IncrIdShift = 1000000000L

  /** d16: the enforced batch-size bound of the incremental-admission
    * contract. Every batch-proportional frame in d16 rides a broadcast
    * (bands, shingle sets, candidates); 2^22 band rows ≈ a few hundred
    * MB of the fattest of those (the shingle-set probe) — the practical
    * broadcast ceiling. Beyond it, admission is the wrong tool (run the
    * d2 full self-dedup) and d16 fails fast with that message instead of
    * a driver OOM mid-plan. */
  val IncrMaxBatchBands = 1L << 22

  /** d4: shingles seen in more than this many docs are dropped from
    * CANDIDATE GENERATION (the standard hot-posting cap of an inverted
    * index — a stop-shingle shared by half the corpus would otherwise
    * make its posting-list bucket quadratic). Jaccard itself is computed
    * on the FULL shingle sets of each surviving candidate pair. */
  val NgramMaxDf = 20

  /** d18: Bloom-filter geometry for benchmark decontamination. A real
    * eval suite is FIXED-size (the corpus is what scales), so the filter
    * is a fixed design constant — 64 Kibit ≈ 1% FP at ~6.5k grams with 3
    * probes — packed into 32-BIT words ([[BloomWordBits]]) because the
    * DuckDB twin's `<<` overflows on a 64-bit sign-bit shift while Spark's
    * `shiftleft` wraps; 32-bit words keep every set-bit value positive in
    * both engines. The result's fill_permille column surfaces saturation
    * (the d11/d15 audit discipline) — a saturated filter flags everything
    * and the number says so. */
  val BloomBits     = 1 << 16
  val BloomWordBits = 32
  val BloomHashes   = 3

  /** d2/d10: LSH band buckets larger than this stop generating ALL-PAIRS
    * candidates — the band-join twin of [[NgramMaxDf]]'s hot-posting cap.
    * Without it a single hot (band, value) bucket (mass-duplicated
    * boilerplate, near-empty docs hashing alike) makes the bucket-local
    * self-join quadratic IN THAT BUCKET: one 1M-doc bucket is 5·10^11
    * pairs regardless of how healthy the other buckets are.
    *
    * Hot buckets are STAR-LINKED, not dropped: every member pairs with
    * the bucket's hub (its minimum doc_id), |bucket|−1 pairs instead of
    * |bucket|²/2 — linear, deterministic, oracle-reproducible. The verify
    * step (exact Jaccard / hamming) then filters false positives as
    * usual, and a genuinely near-identical mega-cluster still collapses:
    * all its hub links pass verification, so connected components
    * ([[dedupClusters]]) joins the whole cluster through the hub. (The
    * old drop-the-bucket-whole guard made clusters LARGER than the cap —
    * the most heavily duplicated content of all — invisible to near-dup
    * entirely.) A cross-bucket near-dup pair that is hub-less in one hot
    * band still surfaces through any NON-hot band it shares (d4's
    * pigeonhole recall argument). [[bandSkewAudit]]
    * (`d11_band_skew_audit`) surfaces how many rows were degraded from
    * all-pairs to star links — the cap is never silent. */
  val BandMaxBucket = 256

  /** Deterministic multiply-add coefficients for the K minhash permutations
    * h_k(v) = (A_k·v + B_k) mod P over the 32-bit shingle hash v. A_k is odd
    * and < 2^31 so A_k·v stays well inside Long. Derived from md5 so both
    * sides can embed identical literals. */
  val MinHashA: Seq[Long] = (0 until MinHashK).map(k => (hex32(s"A:$k") % (1L << 31)) | 1L)
  val MinHashB: Seq[Long] = (0 until MinHashK).map(k => hex32(s"B:$k") % MinHashP)

  private def hex32(seed: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  // ---- ANN parameters ----
  val NumQueries   = 8   // query set: vec_id < 8
  val TopK         = 5
  /** r3: MMR candidate pool per query (the relevance top-C the greedy
    * diversifier reranks) and the diversified selection size. C bounds
    * every per-query decision frame: C relevances + C² pair sims. */
  val MmrCandidates = 20
  val MmrK          = 5
  /** r5: neighborhood size for the margin denominator (Artetxe & Schwenk's
    * k), and the fixed-point scale for the shifted-cosine sims. */
  val BitextK  = 4
  val BitextFp = 1 << 20
  /** d19: permille of a doc's shingle set that must overlap another doc
    * for the doc to count as CONTAINED in it (asymmetric near-dup). */
  val ContainPermille = 800L
  /** e2: a vector is an outlier when its cosine to its OWN label centroid
    * falls below this permille of the label's mean cosine. */
  val OutlierPermille = 800L
  val Hyperplanes  = 6   // FLOOR of the derived plane count: ≥ 2^6 buckets
  val NumCentroids = 8   // FLOOR of the derived IVF cell count
  val KMeansIters  = 2   // Lloyd updates from the first-N seeds

  // Index sizing is DERIVED from the corpus, not hardcoded: a constant
  // cell/bucket count means bucket-local candidate generation silently
  // degrades to corpus-local as the data grows 100×. Both derivations use
  // integer-or-IEEE-exact arithmetic so the DuckDB oracle lands on the
  // same knob value from the same count(*).
  // The centroid cap is a BROADCAST bound, not a driver-collect bound: the
  // Lloyd update is fully distributed (the k×dim fixed-point sums stay a
  // frame), so k follows the √N rule up to 65536 cells — 65536×64 doubles
  // ≈ 32 MB of centroids, the practical ceiling for the broadcast side of
  // the assignment join. That is the SemDeDup paper's own k ≈ 10⁴–10⁵
  // regime, keeping the within-cell O(N²/k) pair pass tolerable at scale.
  val MaxCentroids       = 65536
  // 30 planes → 2^30 buckets: the occupancy rule holds to ~34B vectors
  // (beyond that the bucket id would overflow the int it packs into).
  // Plane literals are DERIVED (hyperplane(h, d)) — raising the ceiling
  // costs nothing until a corpus actually demands the extra planes.
  val MaxHyperplanes     = 30
  val LshTargetOccupancy = 32L  // expected vectors per LSH bucket

  /** The FAISS √N rule, clamped to [[NumCentroids]]..[[MaxCentroids]]:
    * IVF cell count from the indexed corpus size. floor(sqrt(n)) is
    * bit-identical across engines — IEEE sqrt is correctly rounded. */
  def centroidsFor(n: Long): Long =
    math.min(MaxCentroids.toLong,
      math.max(NumCentroids.toLong, math.floor(math.sqrt(n.toDouble)).toLong))

  /** Occupancy rule with INTEGER semantics (no float log to disagree on):
    * the smallest H in [[Hyperplanes]]..[[MaxHyperplanes]] with
    * occupancy·2^H ≥ n, i.e. expected bucket size stays ≤
    * [[LshTargetOccupancy]] as the corpus grows. */
  def hyperplanesFor(n: Long): Int = {
    var h = Hyperplanes
    while (h < MaxHyperplanes && (LshTargetOccupancy << h) < n) h += 1
    h
  }

  /** Deterministic hyperplane component for (plane h, dim d): a dyadic
    * rational in [-0.5, 0.5) derived from md5("h:<h>:<d>") — exactly
    * representable as a double AND as a decimal SQL literal, so Spark and
    * the oracle use bit-identical hyperplanes. */
  def hyperplane(h: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"h:$h:$d".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      (Integer.parseInt(hex, 16) - 32768).toDouble / 65536.0
    }

  val EmbeddingDim = 64 // embeddings.parquet: list<float>[64]

  /** Spread an under-split source before a SINGLE-TASK-DOMINATED compute
    * chain — and only there. Two measured bounds shape this (round 20):
    * a bare repartition(col) is eligible for AQE coalescing, whose
    * size-based rule folds the ~10 MB bench corpus back to one partition
    * — blind to the 100× compute the partition carries (t25's whole
    * explode chain ran in a single 1.9 s task; pinning the width cut the
    * warm median 3×) — but pinning the width UNIVERSALLY taxed every
    * mid-tier warm query ~0.5 s of task-scheduling overhead on tiny
    * local data (widened memoized frames, 32 tasks per stage). So the
    * explicit spread is opt-in per query: only chains whose single-task
    * compute clearly exceeds the overhead (t25, t23, d17, t7) call it. A real
    * multi-split corpus passes through untouched — at 100 TB this
    * shuffle would move the whole corpus, and the input splits already
    * provide the parallelism. The split count is memoized per (session,
    * path): no JOB ever runs at construction, and only the FIRST call per
    * session pays the physical-planning pass `df.rdd` implies — repeat
    * constructions (the sweep's reps, plan audits) hit the memo. */
  private val splitCache = new graft.core.SessionMemo[Int]()
  /** ONE under-split decision for both spread forms (review finding, round
    * 22 — two hand-maintained copies of the threshold/memo logic would
    * desynchronize): `pinWidth = true` is the opt-in pinned spread above,
    * `pinWidth = false` is the default-read AQE-coalescible form — an
    * under-split source (the single-file bench corpus) repartitions so
    * compute-heavy lambdas parallelize, while a real multi-split corpus
    * (thousands of splits at 100 TB) passes through untouched: the
    * blanket `repartition(col)` this replaced (rounds 2–21, guide §2.4)
    * shuffled the ENTIRE corpus text/vectors on every consumer. */
  private def spreadImpl(s: SparkSession, df: DataFrame, key: String,
                         memoPath: String, pinWidth: Boolean): DataFrame = {
    val target = s.sessionState.conf.numShufflePartitions
    val splits = splitCache.getOrElseUpdate(s, memoPath)(df.rdd.getNumPartitions)
    if (splits >= math.max(2, target / 2)) df
    else if (pinWidth) df.repartition(target, col(key))
    else df.repartition(col(key))
  }
  private[llm] def spread(s: SparkSession, df: DataFrame, key: String, memoPath: String): DataFrame =
    spreadImpl(s, df, key, memoPath, pinWidth = true)
  private def spreadIfUnderSplit(s: SparkSession, df: DataFrame, key: String,
                                 memoPath: String): DataFrame =
    spreadImpl(s, df, key, memoPath, pinWidth = false)

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val path = s"$dir/documents.parquet"
    spreadIfUnderSplit(s, s.read.parquet(path), "doc_id", path)
  }

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val path = s"$dir/embeddings.parquet"
    spreadIfUnderSplit(s,
      s.read.parquet(path)
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v")),
      "vec_id", path)
  }

  /** Corpus size backing the derived index knobs ([[centroidsFor]],
    * [[hyperplanesFor]]), memoized per (session, dir) — a count(*) over
    * the parquet footers, metadata-priced at any scale. */
  private val embCountCache = new graft.core.SessionMemo[Long]()
  private def embCount(s: SparkSession, dir: String): Long =
    embCountCache.getOrElseUpdate(s, dir)(
      s.read.parquet(s"$dir/embeddings.parquet").count())

  /** words: lowercase, whitespace-split, empties dropped. */
  /** Shared corpus tokenization — ONE definition for d2/d4/d9 shingles and
    * CorpusQueries' t7 repetition gate, so the word split and bigram shape
    * can never silently desynchronize between operators. */
  private[llm] val wordsExpr = "filter(split(lower(text), '\\\\s+'), w -> w != '')"
  private[llm] val bigramsExpr =
    """CASE WHEN size(words) < 2 THEN array()
      |ELSE zip_with(slice(words, 1, size(words) - 1), slice(words, 2, size(words) - 1),
      |              (a, b) -> concat(a, ' ', b))
      |END""".stripMargin

  /** Sequential double dot product — the native codegen'd
    * [[graft.functions.DotProduct]], fold-left like DuckDB's
    * list_inner_product, bit-for-bit. */
  private def dot(a: String, b: String): String = s"graft_dot($a, $b)"

  /** DuckDB twin of [[graft.functions.Fnv32]]: FNV-1a 32-bit folded over
    * code points with `list_reduce` — verified bit-identical to the Spark
    * expression for ASCII and multi-byte inputs. */
  private[graft] def fnv32Expr(s: String): String =
    s"""list_reduce(
       |  list_prepend(2166136261::BIGINT,
       |               list_transform(generate_series(1, length($s)), fnv_i -> unicode(substr($s, fnv_i, 1))::BIGINT)),
       |  (fnv_h, fnv_c) -> (xor(fnv_h, fnv_c) * 16777619) % 4294967296)""".stripMargin

  private def duckArray(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")

  /** t14/d20 shared: the fastText-style hashed linear quality score —
    * one integer weight in [-8, 7] per token hash, summed. ONE definition
    * so the classifier that gates t14's per-source audit and the one that
    * picks d20's canonical member can never drift. */
  private[llm] val qualityScoreExpr: String =
    s"""aggregate(transform($wordsExpr,
       |                    w -> cast(graft_fnv32(w) % 16 as bigint) - 8),
       |          cast(0 as bigint), (a, x) -> a + x)""".stripMargin

  /** DuckDB twin of [[qualityScoreExpr]] over an already-split words
    * column (t14's twin splits its own; d20's twin reuses the
    * ngramPairCtes `base`). */
  private[llm] def duckQualityScore(wordsCol: String): String =
    s"CAST(coalesce(list_sum(list_transform($wordsCol, w -> (${fnv32Expr("w")}) % 16 - 8)), 0) AS BIGINT)"

  /** Multi-probe IVF: cells searched per query in `ann_ivf_probe2`. */
  val IvfProbes = 2

  /** SemDeDup multi-probe: trained cells each vector's pair pass searches
    * (its own cell plus the [[SemDeDupProbes]]-1 next-nearest) — the IVF
    * probe lever applied to d13's dedup candidates. Single-probe cell
    * locality measurably leaks near-dups across cell boundaries (bench
    * `dedup_recall` recorded 0.286 cell recall at the probe tau); the
    * recorded probe curve on the bench fixture is P=2 → 0.536, P=4 →
    * 0.571, P=8 → 0.750, P=12 → 0.929, P=16 → 0.964, so 12 clears the
    * 0.8 quality floor at 12× the paper's own O(N²/k) pair volume — the
    * probe-tau pairs sit at cosine 0.50–0.60 (57–60° apart, measured),
    * far outside a single √N-cell's radius; at the production tau 0.8
    * (37°) far fewer probes would suffice, so 12 is the conservative
    * end of the candidates-vs-recall trade the IVF family records for
    * probes 1..4. */
  val SemDeDupProbes = 12

  /** d3 multi-table LSH: independent hyperplane tables (the classic
    * Indyk–Motwani amplification, and exactly d2's band shape applied to
    * sign-bit signatures). ONE table of [[hyperplanesFor]] planes keeps
    * occupancy bounded but measurably misses boundary-straddlers (bench
    * recall 0.0 at the probe tau — a cos-0.5 pair crosses ≥1 of 6 planes
    * almost surely); L independent tables retry the experiment L times.
    * Recorded on the bench fixture: L=8 → 0.643, L=12 → 0.786, L=16 →
    * 0.857, L=24 → 0.929. 16 clears the 0.8 floor with candidate volume
    * bounded at L × [[LshTargetOccupancy]] per vector — constant in N,
    * since the per-table plane count (not L) absorbs corpus growth.
    * Table t draws planes [[hyperplane]](t·32 + h) so tables never share
    * a plane even at the [[MaxHyperplanes]] ceiling. */
  val LshTables = 16

  /** Scalar-quantized search: candidates kept per query before the exact
    * full-precision re-rank (the standard SQ8 refine step). */
  val SqCandidates = 4 * TopK

  /** r2 hybrid retrieval: the RRF rank constant (Cormack et al.'s k=60)
    * and the fixed bits(N) stand-in for the integer idf (valid to 2^40
    * documents; a constant here only shifts every term's idf uniformly). */
  val RrfK        = 60
  val RrfIdfScale = 40

  // ---- PQ parameters (FAISS's workhorse quantizer) ----
  /** Subquantizers: the vector splits into PqM subvectors of PqSubDim
    * dims; each is coded independently against a per-subspace codebook of
    * PqK centroids — M×log2(K) bits per vector (8×5 = 5 bytes here vs 64
    * for SQ8, 512 for raw doubles). K=32 over K=16 measured recall@5
    * 0.600→0.775 (ivfpq 0.775→0.850) at sf0.1 for ~+0.1 s — the
    * codebook-size lever, still a broadcast-trivial 256-codeword table. */
  val PqM      = 8
  val PqSubDim = EmbeddingDim / PqM
  val PqK      = 32

  /** PQ refine cut: 5-bit codes are a much coarser approximation than SQ8,
    * so the exact re-rank over-fetches deeper (the FAISS refine-factor
    * lever) — still bounded, still broadcast-sized survivors. The cut was
    * the binding constraint on PQ recall, measured on the sf0.1 ladder:
    * 40 → 0.775, 80 → 0.825, 120 → 0.875, 200 → 0.900 recall@5 with FLAT
    * warm latency (~0.8 s — the scan dominates; the re-rank join-back is
    * queries × cut rows). 24×TopK clears the 0.85 bar with margin, at a
    * survivor set still thousands of times smaller than the corpus. */
  val PqCandidates = 24 * TopK

  /** SimHash near-dup: 4 independent 16-bit SimHash bands (disjoint md5
    * bit slices) form a 64-bit signature. Pigeonhole: hamming <=
    * SimBands - 1 over the full signature can flip bits in at most 3 of
    * the 4 bands, so every qualifying pair shares at least one EXACT band
    * value — band equality is a complete, shuffle-local candidate
    * generator. */
  val SimBands      = graft.functions.SimHashBands.Bands
  val SimHammingMax = SimBands - 1

  /** d10's narrow (doc_id, bands) signature frame, persisted per
    * (session, dir) so the banded self-join reads one copy. */
  private val simSigCache = new graft.core.SessionMemo[DataFrame](onEvict = _.unpersist())

  /** One materialized signature table per (session, sfDir). Keyed by the
    * SparkSession too (identity), not just the dir: a cached DataFrame is
    * bound to the session that created it, and handing it to a second
    * session in the same JVM would be a dead reference. */
  /** d18's packed Bloom filter per (session, dir): [[BloomBits]] /
    * [[BloomWordBits]] = 2048 longs plus the set-bit count — a driver-side
    * decision value (8 KiB by geometry, like the BPE merge table, NOT
    * corpus-sized state). Memoized so warm invocations skip the
    * filter-build collect job; the probe enters the plan as ONE typedLit
    * array literal instead of a 2048-element parsed expression tree (the
    * giant-literal re-ANALYSIS cost CLAUDE.md flags — the d3 sigCache
    * lesson). Consumers: d18_bloom_decontaminate — Bench evicts after its
    * reps. */
  private val bloomCache = new graft.core.SessionMemo[(Array[Long], Long)]()
  def evictBloom(s: SparkSession, dir: String): Unit = bloomCache.remove(s, dir)

  private val sigCache = new graft.core.SessionMemo[DataFrame](onEvict = _.unpersist())

  /** Connected components over the near-dup pair graph (doc_id,
    * cluster_id), memoized per (session, dir): the converged label frame
    * stays persisted and is shared by d6 and the composed d7 pipeline.
    *
    * Pair lists are not a dedup decision: near-duplication is transitive
    * only through clusters (A~B, B~C ⇒ keep one of {A,B,C}). Components
    * are computed by iterative min-label propagation — each round is one
    * edge join + one min-agg (both key-bucketed shuffles), rounds are
    * O(component diameter), and convergence is a metadata-sized driver
    * check. Dup clusters are tiny (diameter ≤ a few hops), so this is
    * the plan that holds at corpus scale; no union-find on one machine. */
  private val clusterCache = new graft.core.SessionMemo[DataFrame](onEvict = _.unpersist())

  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    clusterCache.getOrElseUpdate(s, dir) {
      val dup = ngramDupPairs(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = dup.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(dup.select(col("doc_b").as("u"), col("doc_a").as("v")))
      var labels = docs(s, dir).select(col("doc_id"), col("doc_id").as("cluster_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var cached    = labels // the currently-persisted round frame
      var converged = false
      var rounds    = 0
      while (!converged && rounds < 20) {
        val fromNbr = edges
          .join(labels.withColumnRenamed("doc_id", "v"), "v")
          .groupBy(col("u").as("doc_id"))
          .agg(min(col("cluster_id")).as("nbr_min"))
        // Carry the previous label through the round so ONE action both
        // materializes the new labels into cache and answers "did anything
        // change?" — halving the jobs per round vs a separate check join.
        val nextFull = labels.withColumnRenamed("cluster_id", "old")
          .join(fromNbr, Seq("doc_id"), "left")
          .select(col("doc_id"),
                  least(col("old"), coalesce(col("nbr_min"), col("old"))).as("cluster_id"),
                  col("old"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val changed = nextFull
          .agg(count(when(col("cluster_id") =!= col("old"), 1)).as("n")).head().getLong(0)
        cached.unpersist()
        cached = nextFull
        labels = nextFull.drop("old")
        converged = changed == 0L
        rounds += 1
      }
      require(converged, s"label propagation did not converge in $rounds rounds")
      // Persist the MEMOIZED frame itself (unpersist on a projection would
      // not free the round frame's cache), then release the scaffolding.
      val result = labels.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      result.count() // materialize from the final round's cache before freeing it
      cached.unpersist()
      dup.unpersist()
      result
    }

  /** Trained IVF index per (session, sfDir): (centroids, assigned corpus),
    * both cached — training happens once and probe-1/probe-2 share it.
    *
    * TRAINED centroids: deterministic Lloyd's k-means — first-N seeds,
    * KMeansIters update steps. Cluster means are computed from FIXED-POINT
    * integer sums (floor(x·2^20) per component), which are
    * order-independent, so Spark's shuffle order and the DuckDB oracle
    * produce bit-identical centroids and the whole query stays hash-gated.
    * The Lloyd update is FULLY DISTRIBUTED: the k×dim fixed-point sums
    * stay a frame end to end (no driver `.collect()`), so k follows the
    * √N rule ([[centroidsFor]]) all the way to the [[MaxCentroids]]
    * broadcast bound instead of a driver-memory cap. Assignment is a
    * broadcast(k centroids) × corpus map, the standard distributed
    * k-means shape, with the argmax as a partial-aggregatable max_by over
    * a UNIQUE (c_sim, -c_id) key — map-side combine, no window
    * shuffle+sort, same tie-break as the oracle's row_number ordering.
    *
    * MATERIALIZED SIDECAR (round 22 — the r21 verdict's #3): persist
    * caches data, not the plan, so every consumer of the trained frames
    * used to inline the FULL KMeansIters training lineage into its own
    * plan — ann_ivfpq_topk's constructor plan carried 274 Exchange nodes
    * (plans/r21/ann_ivfpq_topk_before.txt), a re-ANALYSIS tax on every
    * cold build and a planner hazard at scale. Both trained frames now
    * round-trip through a parquet sidecar exactly like [[pqIndexFull]]'s
    * codes (FAISS materializes the same artifacts: centroids + invlist
    * assignments), re-rooting every consumer plan at a file scan bounded
    * regardless of training iterations. Parquet round-trips binary64 and
    * ints exactly, so oracle parity is untouched. Fresh uuid dir per
    * build (no cross-run reuse); onEvict drops both frames AND the dir. */
  private val ivfCache = new graft.core.SessionMemo[(DataFrame, DataFrame, String)](onEvict = {
    case (c, a, side) =>
      c.unpersist(); a.unpersist()
      try graft.core.FsUtil.deleteTree(side)
      catch { case scala.util.control.NonFatal(_) => () }
      ()
  })

  /** Fresh uuid-suffixed sidecar directory under the configurable index
    * root ($SPARK_GRAFT_INDEX_DIR / spark conf graft.index.root — an
    * object-store URI every executor reaches on a real cluster),
    * defaulting to a driver temp dir on local[*]. Registered with the
    * FsUtil exit sweep; each build writes a FRESH dir and never reads a
    * pre-existing one (no cross-run caching). */
  private def sidecarDir(s: SparkSession, what: String): String = {
    val side = sys.env.get("SPARK_GRAFT_INDEX_DIR")
      .orElse(s.conf.getOption("graft.index.root"))
      .map(_.stripSuffix("/"))
      .map(r => s"$r/graft-$what-sidecar-${java.util.UUID.randomUUID()}")
      .getOrElse(java.nio.file.Files.createTempDirectory(s"graft-$what-sidecar-").toString)
    graft.core.FsUtil.deleteOnExit(side)
    side
  }

  /** Test/spec accessor: the trained cell assignment (vec_id, v,
    * centroid_id) — lets serial references (r5's mutual-NN spec) start
    * from the SAME index the operator consumed instead of replicating the
    * k-means chain. */
  private[graft] def ivfAssignments(s: SparkSession, dir: String): DataFrame =
    ivfIndex(s, dir)._2

  private def ivfIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (cents, assigned, _) = ivfIndexFull(s, dir)
    (cents, assigned)
  }

  private def ivfIndexFull(s: SparkSession, dir: String): (DataFrame, DataFrame, String) =
    {
      ivfCache.getOrElseUpdate(s, dir)({
        // persisted only for the duration of the build (KMeansIters + 1
        // traversals), unpersisted before returning — holding it in the memo
        // value would leak the cached blocks past session eviction, whose
        // onEvict only covers the assigned frame
        val e = emb(s, dir).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

        def assign(cents: DataFrame): DataFrame = {
          // per-vector norm hoisted above the k-wide centroid cross join
          // (round 22): one self-dot per vector, not per (vector, cell) —
          // identical doubles, so training and the oracle are untouched
          val simToCent = expr(s"${dot("v", "cv")} / (sqrt(vn2) * sqrt(${dot("cv", "cv")}))")
          e.withColumn("vn2", expr(dot("v", "v"))).crossJoin(broadcast(cents))
            .withColumn("c_sim", simToCent)
            .groupBy(col("vec_id"))
            .agg(max_by(struct(col("c_id").as("centroid_id"), col("v").as("v")),
                        struct(col("c_sim").as("s"), (-col("c_id")).as("neg_id"))).as("best"))
            .select(col("vec_id"), col("best.v").as("v"), col("best.centroid_id").as("centroid_id"))
        }

        // √N cells ([[centroidsFor]]): the count also materializes the
        // persisted frame before the training traversals
        val nc = centroidsFor(e.count())
        var cents = e.filter(col("vec_id") < nc)
          .select(col("vec_id").as("c_id"), col("v").as("cv"))
        (1 to KMeansIters).foreach { _ =>
          // Distributed Lloyd update: per-(cell, dim) fixed-point sums fold
          // through one partial-aggregatable shuffle, then re-pack to a
          // k-row (c_id, cv) frame — never touching the driver. The
          // division is the same binary64 arithmetic as the collected
          // version (and the oracle): CAST(s)/(CAST(n) * 1048576.0).
          cents = assign(cents)
            .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
            .groupBy("centroid_id", "pos")
            .agg(sum(expr("cast(floor(x * 1048576) as bigint)")).as("s"), count(lit(1)).as("n"))
            .groupBy(col("centroid_id"))
            .agg(expr("array_sort(collect_list(named_struct('pos', pos, 's', s, 'n', n)))").as("pc"))
            .select(col("centroid_id").as("c_id"),
              expr("transform(pc, p -> cast(p.s as double) / (cast(p.n as double) * 1048576.0D))").as("cv"))
        }
        // Materialize the trained index as a parquet sidecar (see the
        // sidecar note at [[ivfCache]]): writing the centroids runs the
        // training chain once (the old persist+count did the same work);
        // reading them back re-roots every consumer — probe selection,
        // ann_ivf_probe/2, ann_ivfsq/ivfpq, pqIndexFull's residual chain —
        // at a bounded file scan instead of the KMeansIters lineage. Both
        // frames stay persisted too: the centroids are re-broadcast by
        // every probe-selection pass, the assignment is every consumer's
        // corpus-side scan.
        val side = sidecarDir(s, "ivf")
        cents.write.mode("overwrite").parquet(s"$side/cents")
        val trained = s.read.parquet(s"$side/cents")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        trained.count()
        assign(trained).write.mode("overwrite").parquet(s"$side/assigned")
        val assigned = s.read.parquet(s"$side/assigned")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        assigned.count() // materialize off `e` before releasing it
        e.unpersist()
        (trained, assigned, side)
      })
    }

  /** SQ8 index per (session, sfDir): the one-row per-dimension (mn, mx)
    * stats frame (broadcastable) and the coded corpus persisted as
    * (vec_id, code array<tinyint>) — 1 byte per dimension, the sidecar a
    * 100 TB deployment materializes next to the vectors so candidate
    * generation never touches full-precision data. Codes store cell-128
    * (the 0..255 cell shifted into tinyint range); de-quantization adds
    * 128 back, keeping the midpoint arithmetic bit-identical to coding
    * straight from `v`. */
  private val sqCache = new graft.core.SessionMemo[(DataFrame, DataFrame)](onEvict = { case (_, c) => c.unpersist(); () })

  private def sqIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    {
      sqCache.getOrElseUpdate(s, dir)({
        val e = emb(s, dir)
        // per-dimension min/max: one partial-aggregatable shuffle folded
        // to a single row, then broadcast everywhere it's needed
        val mm = e
          .select(explode(expr(s"transform(sequence(0, ${EmbeddingDim - 1}), d -> struct(d AS d, v[d] AS x))")).as("dx"))
          .groupBy(col("dx.d").as("d"))
          .agg(min("dx.x").as("mn"), max("dx.x").as("mx"))
          .agg(expr("array_sort(collect_list(struct(d, mn, mx)))").as("mm"))
        val codes = e.crossJoin(broadcast(mm))
          .select(col("vec_id"), expr(
            s"""transform(sequence(0, ${EmbeddingDim - 1}), d ->
               |  CAST(CASE WHEN mm[d].mx = mm[d].mn THEN 0L
               |       ELSE least(255L, greatest(0L, floor((v[d] - mm[d].mn) / (mm[d].mx - mm[d].mn) * 255.0D)))
               |  END - 128 AS TINYINT))""".stripMargin).as("code"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (mm, codes)
      })
    }

  /** PQ index per (session, sfDir): (bkm, codes).
    *
    *  - `bkm` is the packed codebook — ONE row whose `bkm[m][c]` is the
    *    c-th codeword of subspace m (dense per-m lists, so the layout
    *    stays total even when Lloyd leaves a codeword empty or the corpus
    *    has fewer than PqK seed vectors) — broadcast to every scoring
    *    scan, never joined.
    *  - `codes` is the persisted sidecar (vec_id, cell, code array<int>):
    *    the vector's trained coarse cell plus the DENSE per-subspace
    *    codeword index, PqM small ints per vector — the
    *    few-bytes-per-vector scan that is PQ's whole point at 100 TB
    *    (FAISS invlists carry exactly this: cell-bucketed codes).
    *
    * RESIDUAL encoding (round 20 — the FAISS IndexIVFPQ `by_residual`
    * default, Jégou et al. 2011 §IV): codes quantize r = v − cv(cell)
    * against per-subspace codebooks trained ON residuals, and
    * reconstruction is xhat = cv(cell) + decode(code). Residuals are an
    * order of magnitude smaller than raw components once the coarse
    * quantizer has absorbed cluster structure, so the same 8×5-bit
    * budget spends on the fine detail the re-rank needs — measured as
    * the pq_refine_curve lift in the bench (recall@5 at the
    * PqCandidates cut: 0.875 flat → ≥0.94). The residual subtraction
    * and the centroid-add reconstruction are plain IEEE binary64
    * (centroids are the fixed-point-trained [[ivfIndex]] ones both
    * engines already derive bit-identically), so the DuckDB twin stays
    * hash-gated.
    *
    * Training is the same fully distributed fixed-point Lloyd as
    * [[ivfIndex]], run per SUBSPACE over residual subvectors: assignment
    * by squared L2 (the PQ literature's metric; cosine is meaningless on
    * subvectors) with ties to the smaller codeword id, update via
    * order-independent floor(x·2^20) integer sums — bit-identical in the
    * DuckDB twin. Empty codewords simply drop out of the update (both
    * engines GROUP BY only assigned codewords), which is why codes store
    * the DENSE re-key (row_number over the ≤ PqM×PqK trained codebook —
    * a window over a bounded frame). */
  private val pqCache = new graft.core.SessionMemo[(DataFrame, DataFrame, String)](onEvict = {
    case (b, c, side) =>
      b.unpersist(); c.unpersist()
      try graft.core.FsUtil.deleteTree(side)
      catch { case scala.util.control.NonFatal(_) => () }
      ()
  })

  private def pqIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (bkm, codes, _) = pqIndexFull(s, dir)
    (bkm, codes)
  }

  private def pqIndexFull(s: SparkSession, dir: String): (DataFrame, DataFrame, String) =
    {
      pqCache.getOrElseUpdate(s, dir)({
        val (cents, assigned) = ivfIndex(s, dir)
        // residuals vs the trained coarse cell: centroids are a bounded
        // broadcast; the frame is persisted only for the training
        // traversals and released once codes materialize
        val rsd = assigned
          .join(broadcast(cents), col("centroid_id") === col("c_id"))
          .select(col("vec_id"), col("centroid_id"),
                  expr("zip_with(v, cv, (a, b) -> a - b)").as("rv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rsd.count()
        val sub = rsd.select(col("vec_id"), explode(expr(
          s"""transform(sequence(0, ${PqM - 1}),
             |          m -> struct(m AS m, slice(rv, m * $PqSubDim + 1, $PqSubDim) AS sv))""".stripMargin)).as("ms"))
          .select(col("vec_id"), col("ms.m").as("m"), col("ms.sv").as("sv"))

        // nearest codeword per (vector, subspace) by squared L2 — the same
        // partial-aggregatable max_by shape as ivfIndex.assign (maximize
        // (-dist, -c_id): ties go to the SMALLER codeword id)
        def assign(books: DataFrame): DataFrame =
          sub.join(broadcast(books), "m")
            .withColumn("dist", expr(
              "graft_dot(sv, sv) - 2.0D * graft_dot(sv, cv) + graft_dot(cv, cv)"))
            .groupBy(col("vec_id"), col("m"))
            .agg(max_by(struct(col("c_id"), col("sv")),
                        struct((-col("dist")).as("nd"), (-col("c_id")).as("ni"))).as("best"))
            .select(col("vec_id"), col("m"), col("best.c_id").as("c_id"), col("best.sv").as("sv"))

        var books = sub.filter(col("vec_id") < PqK)
          .select(col("m"), col("vec_id").as("c_id"), col("sv").as("cv"))
        (1 to KMeansIters).foreach { _ =>
          books = assign(books)
            .select(col("m"), col("c_id"), posexplode(col("sv")).as(Seq("pos", "x")))
            .groupBy("m", "c_id", "pos")
            .agg(sum(expr("cast(floor(x * 1048576) as bigint)")).as("s"), count(lit(1)).as("n"))
            .groupBy(col("m"), col("c_id"))
            .agg(expr("array_sort(collect_list(named_struct('pos', pos, 's', s, 'n', n)))").as("pc"))
            .select(col("m"), col("c_id"),
              expr("transform(pc, p -> cast(p.s as double) / (cast(p.n as double) * 1048576.0D))").as("cv"))
        }
        val trained = books.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        trained.count()
        // dense re-key: c-th surviving codeword of subspace m → index c
        // (window over the ≤ PqM×PqK-row codebook — bounded by knobs)
        val wDense = Window.partitionBy(col("m")).orderBy(col("c_id"))
        val dense  = trained.withColumn("dc", row_number().over(wDense) - 1)
        val bkm0 = dense
          .groupBy("m").agg(expr("array_sort(collect_list(named_struct('c', dc, 'cv', cv)))").as("cl"))
          .agg(expr("array_sort(collect_list(named_struct('m', m, 'cl', cl)))").as("ml"))
          .select(expr("transform(ml, x -> transform(x.cl, y -> y.cv))").as("bkm"))
        // the sidecar carries the vector's coarse cell (residual decode
        // needs it; IVFPQ's probe restriction reads it for free) — joined
        // from the long-lived assigned frame, not the transient rsd
        val codes0 = assign(trained)
          .join(broadcast(dense.select(col("m"), col("c_id"), col("dc"))), Seq("m", "c_id"))
          .groupBy(col("vec_id"))
          .agg(expr("array_sort(collect_list(named_struct('m', m, 'dc', dc)))").as("pc"))
          .select(col("vec_id"), expr("transform(pc, p -> p.dc)").as("code"))
          .join(assigned.select(col("vec_id"), col("centroid_id").as("cell")), "vec_id")
          .select(col("vec_id"), col("cell"), col("code"))
        // MATERIALIZED SIDECAR: the residual chain's logical tree inlines
        // the coarse Lloyd chain under the per-subspace one, and every
        // warm consumer paid ~2 s of DRIVER re-analysis over it per
        // execution (persist caches data, not the plan — the sigCache
        // lesson one level up). Writing codes + codebook to parquet and
        // reading them back re-roots every consumer plan at a file scan —
        // which IS the deployment shape: FAISS materializes exactly these
        // invlists (cell, code) next to the vectors. Parquet round-trips
        // ints and binary64 exactly, so oracle parity is untouched.
        // INDEX ROOT (round 21): on a real cluster, executors cannot write
        // parquet to a driver-local temp path — [[sidecarDir]] resolves the
        // configurable root; eviction deletes it scheme-aware, and the
        // FsUtil exit sweep covers a JVM that dies without evicting.
        val side = sidecarDir(s, "pq")
        bkm0.write.mode("overwrite").parquet(s"$side/bkm")
        codes0.write.mode("overwrite").parquet(s"$side/codes")
        val bkm = s.read.parquet(s"$side/bkm")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        bkm.count()
        val codes = s.read.parquet(s"$side/codes")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.count()
        rsd.unpersist()
        trained.unpersist()
        (bkm, codes, side)
      })
    }

  /** Probe selection shared by EVERY IVF-composed query (ivfProbeAt,
    * ann_ivfsq_topk, ann_ivfpq_topk — one definition so probe tie-breaking
    * can never silently diverge between the variants): the top-nProbes
    * trained cells per query by centroid cosine, ranked over the bounded
    * queries × broadcast(cells) frame. */
  private def probeSelect(assigned: DataFrame, cents: DataFrame, nProbes: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("c_sim").desc, col("c_id"))
    assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("c_sim", expr(s"${dot("qv", "cv")} / (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}))"))
      .withColumn("pn", row_number().over(wProbe))
      .filter(col("pn") <= nProbes)
      .select(col("q_id"), col("qv"), col("c_id").as("centroid_id"))
  }

  /** The exact full-precision re-rank tail shared by the coded ANN family
    * (SQ/PQ/IVF×SQ/IVF×PQ): bounded candidates (q_id, vec_id, qv)
    * broadcast onto the vectors, exact cosine, ranked over the
    * queries × candidates survivor set — never a corpus-sized window. */
  private def exactRerank(e: DataFrame, cands: DataFrame): DataFrame = {
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(cands), "vec_id")
      .withColumn("sim", expr(s"${dot("v", "qv")} / (sqrt(${dot("v", "v")}) * sqrt(${dot("qv", "qv")}))"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
              col("vec_id").as("neighbor_id"))
  }

  /** Per-VECTOR PQ reconstruction over a codes frame: appends (xhat, xn2)
    * — xhat = cell centroid + decoded residual, the IVFPQ `by_residual`
    * reconstruction — from the broadcast packed codebook and the bounded
    * broadcast trained centroids. Called BEFORE any per-query or
    * per-probe join, so each vector decodes exactly once per scan — the
    * DuckDB twin's `x` CTE shape. */
  private def pqDecode(codesFrame: DataFrame, bkm: DataFrame, cents: DataFrame): DataFrame =
    codesFrame
      .join(broadcast(cents.select(col("c_id").as("cell"), col("cv").as("_ccv"))), "cell")
      .crossJoin(broadcast(bkm))
      .withColumn("xhat", expr(
        s"""zip_with(_ccv,
           |         flatten(transform(sequence(0, ${PqM - 1}),
           |                 m -> element_at(element_at(bkm, m + 1), element_at(code, m + 1) + 1))),
           |         (a, b) -> a + b)""".stripMargin))
      .withColumn("xn2", expr(dot("xhat", "xhat")))
      .drop("bkm", "_ccv")

  /** The shared two-phase distributed top-k for the ANN family: a scored
    * frame with columns (q_id, sim, vec_id) folds through the bounded
    * [[graft.functions.TopKByScore]] aggregate. The map side combines down
    * to k entries per (task, q_id) BEFORE the exchange, so the shuffle onto
    * `q_id` carries at most tasks × queries × k tiny triples — never the
    * scored corpus. `posexplode` of the best-first survivor array
    * reproduces the old `row_number` ranks exactly (same score-desc,
    * id-asc ordering), so every oracle row is unchanged.
    *
    * `payload` rides one long of per-candidate context through the
    * aggregation (the IVF queries carry the neighbor's cell id). */
  /** r3's bounded candidate frames — (relevance: q_id, vec_id, rel) and
    * (pairwise sims: q_id, a_id, b_id, sim), both queries × C(²) rows by
    * construction. Split out so PlanAuditSpec can pin the candidate
    * generation (broadcast query set, bounded top-C graft_topk cut, no
    * cartesian on the corpus side — the per-query candidate×candidate
    * pair join runs over the already-cut C rows only). */
  /** e1/e2 shared: every vector scored against its OWN label centroid —
    * fixed-point order-independent centroid sums (the k-means toolkit),
    * centroids broadcast back (labels are a bounded dimension),
    * floor(cos·2^20) longs out, so both consumers hash-gate. The
    * centroid frame is the trained model a deployment materializes once
    * (the IVF-centroid discipline), memoized per (session, dir) so e2's
    * two consumers of the scored frame — the label-stats fold and the
    * probe side — each pay only the narrow map-side cosine pass, never a
    * second (label, dim) centroid shuffle. */
  private val centroidCache = new graft.core.SessionMemo[DataFrame](onEvict = _.unpersist())
  def evictLabelCentroids(s: SparkSession, dir: String): Unit = centroidCache.remove(s, dir)
  private def labelCentroids(s: SparkSession, dir: String): DataFrame =
    centroidCache.getOrElseUpdate(s, dir)(
      emb(s, dir).select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(sum(expr("cast(floor(x * 1048576) as bigint)")).as("s"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(expr("array_sort(collect_list(named_struct('pos', pos, 's', s, 'n', n)))").as("pc"))
        .select(col("label"),
          expr("transform(pc, p -> cast(p.s as double) / (cast(p.n as double) * 1048576.0D))").as("cv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  private def labelScored(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).join(broadcast(labelCentroids(s, dir)), "label")
      .withColumn("cos_fp", expr(s"cast(floor((${cosSim("v", "cv")}) * 1048576) as bigint)"))
      .select(col("label"), col("vec_id"), col("cos_fp"))

  private[graft] def collectMmrRels(rel: DataFrame): Seq[(Long, Long, Double)] =
    rel.collect().toSeq
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("rel")))

  private[graft] def collectMmrSims(pairs: DataFrame): Map[(Long, Long, Long), Double] =
    pairs.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("sim")).toMap

  /** The MMR greedy over the collected decision values — ONE definition
    * shared by r3 and Bench's retrieval-quality block, so the bench never
    * re-executes the candidate generation just to replay the selection.
    * Round 1 maximizes pure relevance (empty-set diversity term); later
    * rounds the λ=0.5 marginal score. Ties → smaller vec_id. Explicit
    * Double.compare, not key negation: under negation -0.0 < 0.0 and NaN
    * inverts, diverging from the oracle's row_number(score DESC, vec_id)
    * — Double.compare ranks NaN above all reals, exactly DuckDB's DESC
    * NaN-first order. */
  private[graft] def mmrSelect(
      rels: Seq[(Long, Long, Double)],
      sims: Map[(Long, Long, Long), Double]): Seq[(Long, Long, Long)] =
    rels.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      val relOf = cs.map(c => c._2 -> c._3).toMap
      var selected = Vector.empty[Long]
      (1 to MmrK).flatMap { rank =>
        val remaining = relOf.keys.filterNot(selected.contains).toSeq
        if (remaining.isEmpty) None
        else {
          val best = remaining.map { c =>
            val score =
              if (selected.isEmpty) relOf(c)
              else 0.5 * relOf(c) - 0.5 * selected.map(sb => sims((qid, c, sb))).max
            (c, score)
          }.reduceLeft { (x, y) =>
            val cmp = java.lang.Double.compare(y._2, x._2)
            if (cmp > 0 || (cmp == 0 && y._1 < x._1)) y else x
          }._1
          selected :+= best
          Some((qid, rank.toLong, best))
        }
      }
    }

  private[graft] def mmrCandidateFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cosQ = s"${dot("v", "qv")} / (sqrt(${dot("v", "v")}) * sqrt(${dot("qv", "qv")}))"
    // candidate scan scores with the hoisted per-vector norm (round 22 —
    // same doubles as cosQ, one self-dot per vector instead of per pair);
    // the bounded rel/red frames below keep the shared cosQ form.
    val scored = e.withColumn("vn2", expr(dot("v", "v"))).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", expr(s"${dot("v", "qv")} / (sqrt(vn2) * sqrt(${dot("qv", "qv")}))"))
    val cand = topkPerQuery(scored, MmrCandidates)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
    val cv = cand.join(e.select(col("vec_id"), col("v")), "vec_id")
    val rel = cv.join(broadcast(q), "q_id")
      .withColumn("rel", expr(cosQ))
      .select("q_id", "vec_id", "rel")
    val pairs = cv.select(col("q_id"), col("vec_id").as("a_id"), col("v").as("av"))
      .join(cv.select(col("q_id"), col("vec_id").as("b_id"), col("v").as("bv")), Seq("q_id"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim", expr(
        s"${dot("av", "bv")} / (sqrt(${dot("av", "av")}) * sqrt(${dot("bv", "bv")}))"))
      .select("q_id", "a_id", "b_id", "sim")
    (rel, pairs)
  }

  private def topkPerQuery(scored: DataFrame, k: Int,
                           payload: org.apache.spark.sql.Column = lit(0L)): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.column(col("sim"), col("vec_id"), payload, k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
              col("t.id").as("neighbor_id"), col("t.payload").as("payload"))

  /** Parametric multi-probe IVF: the `ann_ivf_probe2` plan with `nProbes`
    * cells searched per query. `ann_ivf_probe2` delegates here with
    * [[IvfProbes]]; Bench sweeps probes 1..4 through it to record the
    * recall-vs-probe curve — the recall/speed lever a deployment tunes has
    * to be measured, not assumed. Probe selection is a broadcast(k cells)
    * ranking per query; candidates stay cell-local at every probe count. */
  private[graft] def ivfProbeAt(s: SparkSession, dir: String, nProbes: Int): DataFrame = {
    val (cents, assigned) = ivfIndex(s, dir)
    val probes = probeSelect(assigned, cents, nProbes)
    val scored = assigned.withColumn("vn2", expr(dot("v", "v")))
      .join(broadcast(probes), "centroid_id")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", expr(s"${dot("v", "qv")} / (sqrt(vn2) * sqrt(${dot("qv", "qv")}))"))
    topkPerQuery(scored, 3, col("centroid_id").cast("long"))
      .select(col("q_id"), col("rank"), col("neighbor_id"),
              col("payload").as("centroid_id"))
  }

  /** ann_incremental_add's synthesized arriving batch: every
    * [[IncrEvery]]-th corpus vector under a shared cyclic half-rotation of
    * its coordinates, with ids shifted by [[IncrIdShift]]. A shared
    * coordinate permutation preserves inner products AMONG batch vectors
    * (the batch inherits the corpus's pair structure), while a rotated
    * vector is cosine-unrelated to its own source — i.e. genuinely NEW
    * vectors drawn from the corpus distribution, the qscale replica trick
    * applied to admission. */
  private def incrementalBatch(s: SparkSession, dir: String): DataFrame = {
    val rot = EmbeddingDim / 2
    emb(s, dir).filter(col("vec_id") % IncrEvery === IncrSlot)
      .select((col("vec_id") + IncrIdShift).as("vec_id"),
        expr(s"concat(slice(v, ${rot + 1}, ${EmbeddingDim - rot}), slice(v, 1, $rot))").as("v"))
  }

  /** The FAISS `add` path: assign the arriving batch to the nearest
    * TRAINED cell — broadcast(k centroids) × batch, the identical
    * max_by-argmax shape (and tie-break) as [[ivfIndex]]'s corpus
    * assignment, with NO retraining. The batch never shuffles. */
  private def incrementalAssigned(s: SparkSession, dir: String): DataFrame = {
    val (cents, _) = ivfIndex(s, dir)
    incrementalBatch(s, dir).withColumn("vn2", expr(dot("v", "v")))
      .crossJoin(broadcast(cents))
      .withColumn("c_sim", expr(s"${dot("v", "cv")} / (sqrt(vn2) * sqrt(${dot("cv", "cv")}))"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("c_id").as("centroid_id"), col("v").as("v")),
                  struct(col("c_sim").as("s"), (-col("c_id")).as("neg_id"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"), col("best.centroid_id").as("centroid_id"))
  }

  /** Bench probe: the ann_ivf_probe2 plan run over the MERGED index
    * (trained corpus assignment ∪ incrementally added batch). Its recall
    * against [[incrementalBrute]] is the quality cost of admission without
    * retrain — the number a production FAISS deployment watches to decide
    * when the drifted index needs a re-train. */
  private[graft] def incrementalProbe(s: SparkSession, dir: String): DataFrame = {
    val (cents, assigned) = ivfIndex(s, dir)
    val merged = assigned.unionByName(incrementalAssigned(s, dir))
    val probes = probeSelect(assigned, cents, IvfProbes)
    val scored = merged.withColumn("vn2", expr(dot("v", "v")))
      .join(broadcast(probes), "centroid_id")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", expr(s"${dot("v", "qv")} / (sqrt(vn2) * sqrt(${dot("qv", "qv")}))"))
    topkPerQuery(scored, 3, col("centroid_id").cast("long"))
      .select(col("q_id"), col("rank"), col("neighbor_id"),
              col("payload").as("centroid_id"))
  }

  /** Bench truth for [[incrementalProbe]]: exact brute-force top-3 over the
    * same merged vector set (corpus ∪ batch). */
  private[graft] def incrementalBrute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val merged = e.select(col("vec_id"), col("v"))
      .unionByName(incrementalBatch(s, dir))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = merged.withColumn("vn2", expr(dot("v", "v"))).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", expr(s"${dot("v", "qv")} / (sqrt(vn2) * sqrt(${dot("qv", "qv")}))"))
    topkPerQuery(scored, 3)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
  }

  /** Parametric PQ search: the `ann_pq_topk` plan with a caller-chosen
    * refine cut (candidates kept per query before the exact re-rank).
    * `ann_pq_topk` delegates here with [[PqCandidates]]; Bench sweeps the
    * cut to record the refine-factor-vs-recall curve — the FAISS refine
    * lever, measured instead of assumed. The survivor set stays bounded
    * (queries × candidates) at every sweep point, so plan shape never
    * changes — only the breadth of the broadcast join-back. */
  private[graft] def pqTopkAt(s: SparkSession, dir: String, candidates: Int): DataFrame = {
    val e = emb(s, dir)
    val (bkm, codes) = pqIndex(s, dir)
    val (cents, _)   = ivfIndex(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // decode ONCE per vector ([[pqDecode]] before the query join —
    // scoring against NumQueries queries reuses one reconstruction),
    // then sim from the precomputed xhat norm: the same doubles as
    // recomputing dot(xhat, xhat) per pair, 1/NumQueries the decode work
    val scored = pqDecode(codes, bkm, cents).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", expr(s"${dot("xhat", "qv")} / (sqrt(xn2) * sqrt(${dot("qv", "qv")}))"))
    val cands = topkPerQuery(scored, candidates)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
      .join(broadcast(q), "q_id")
    exactRerank(e, cands)
  }

  private def buildSignatures(s: SparkSession, dir: String): DataFrame =
    signaturesOf(docs(s, dir))

  /** The stateless signature computation over ANY (doc_id, text) frame —
    * batch or streaming (every expression is per-row, so the same plan
    * fragment drives d2's batch joins and the incremental
    * [[StreamingNearDup]] path). */
  private[llm] def signaturesOf(docsDf: DataFrame): DataFrame =
    docsDf
        .withColumn("words", expr(wordsExpr))
        // zip_with over two slices, NOT element_at(words, i) in a lambda —
        // an outer-column reference inside a lambda body gets inlined by
        // CollapseProject and re-evaluates the whole split() per element
        // (measured 13x slower); lambda variables are bound once.
        .withColumn("shingles", expr(bigramsExpr))
        .filter(size(col("shingles")) > 0)
        // ONE codegen'd FNV-1a-32 per shingle (one multiply per character —
        // ~10× cheaper than the md5 round it replaced, same DuckDB-oracle
        // reproducibility) → K cheap multiply-mod permutations.
        .withColumn("vhash", expr("transform(shingles, s -> graft_fnv32(s))"))
        // one pass per permutation with SCALAR coefficients — constant
        // folding keeps the inner lambda allocation-free
        .withColumn(
          "sig",
          array((0 until MinHashK).map { k =>
            expr(s"cast(array_min(transform(vhash, v -> (${MinHashA(k)} * v + ${MinHashB(k)}) % $MinHashP)) as string)")
          }: _*)
        )
        .withColumn("shingle_set", array_distinct(col("shingles")))
        .select("doc_id", "sig", "shingle_set", "vhash")


  /** d4/d6 shared: exact n-gram-Jaccard duplicate pairs. The exact
    * counterpart of d2's MinHash: no signatures — candidates come from a
    * shingle inverted index (pairs must share at least one non-hot
    * shingle), then exact Jaccard over the full sets decides. Every join
    * is posting-list-local (bucketed by shingle); the [[NgramMaxDf]] cap
    * bounds each bucket's pair fan-out, which is what keeps the plan
    * linear-ish at corpus scale. */
  private[llm] def ngramDupPairs(s: SparkSession, dir: String): DataFrame =
    // Jaccard >= 1/2 without a float: 2·|∩| >= |∪|, over the shared
    // posting-local candidate scorer (ONE generator for d4 AND d19 — the
    // DuckDB ngramPairCtes is likewise shared, so candidate semantics
    // cannot drift between the two operators)
    ngramScoredPairs(s, dir)
      .withColumn("union_cnt", col("na") + col("nb") - col("inter_cnt"))
      .filter(col("inter_cnt") * 2 >= col("union_cnt"))
      .select("doc_a", "doc_b", "inter_cnt", "union_cnt")

  /** The memoized signature table (shingle sets + MinHash sigs) — the
    * subtree d2/d4/d16/d21 and the split/funnel family all share:
    * materialized ONCE per (session, dir), like the classic
    * signature-table materialization, instead of re-persisting (and
    * leaking) a cache entry per invocation. */
  private def sigFrame(s: SparkSession, dir: String): DataFrame =
    sigCache.getOrElseUpdate(s, dir)(buildSignatures(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** d2/d21 shared LSH candidate generator. Candidate pairs exist ONLY
    * inside (band, band_hash) buckets — bucket-local on the band hash,
    * never all-pairs — with the [[BandMaxBucket]] hot-bucket guard in
    * star-link form (see [[bandPairs]]): cold buckets all-pairs, hot
    * buckets hub-linked, one band-key shuffle total. ONE definition so
    * the loss audit (d21) grades exactly the candidates d2 emits. */
  private def minhashCandidatePairs(s: SparkSession, dir: String): DataFrame = {
    val bands = sigFrame(s, dir)
      .select(col("doc_id"), explode(expr(minhashBandsExpr)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
    bandPairs(bands, Seq("band", "band_hash")).select("doc_a", "doc_b")
  }

  /** The d4/d19 shared candidate scorer: posting-local pairs with exact
    * |∩| and both set sizes, pre-filter. One bounded posting-key
    * aggregate instead of a df count-window (a keyed SORT of the full
    * postings frame) followed by a two-sided self-join: per shingle, the
    * exact df plus up to NgramMaxDf member doc ids fold through
    * graft_topk (constant score ⇒ min-k by id; the array is COMPLETE
    * whenever df ≤ the cap, which is the only case that emits). Rare
    * postings explode their ≤ cap²/2 pairs locally from the aggregated
    * array; hot postings (df > cap) are dropped whole — the documented
    * IDF-style cap (a shingle shared by more than NgramMaxDf docs
    * identifies nothing), same semantics as the windowed plan and the
    * oracle. */
  private def ngramScoredPairs(s: SparkSession, dir: String): DataFrame = {
    val base = sigFrame(s, dir)
    val postings = base.select(col("doc_id"), explode(col("shingle_set")).as("sh"))
    val pairs = postings.groupBy("sh")
      .agg(count(lit(1)).as("df"),
           graft.functions.TopKByScore.column(lit(0.0), col("doc_id"), lit(0L), NgramMaxDf)
             .as("members"))
      .filter(col("df") >= 2 && col("df") <= NgramMaxDf)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(members) - 2),
          |  i -> transform(sequence(i + 1, size(members) - 1),
          |    j -> struct(members[i].id AS doc_a, members[j].id AS doc_b))))""".stripMargin)).as("pr"))
      .select(col("pr.doc_a"), col("pr.doc_b"))
      .distinct()
    val sa = base.select(col("doc_id").as("doc_a"), col("shingle_set").as("set_a"))
    val sb = base.select(col("doc_id").as("doc_b"), col("shingle_set").as("set_b"))
    pairs
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn("inter_cnt", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
        size(col("set_a")).cast("long").as("na"),
        size(col("set_b")).cast("long").as("nb"))
  }

  /** The d2/d10 candidate generator with the [[BandMaxBucket]] guard in
    * star-link form. `bandRows` is (doc_id, key...); returns distinct
    * (doc_a, doc_b, carry_a, carry_b) with doc_a < doc_b.
    *
    * ONE pass over the band frame: per bucket, the exact size plus the
    * cap smallest member (doc_id, carry) entries fold through the bounded
    * [[graft.functions.TopKByScore]] aggregate (constant score ⇒ min-k by
    * id; ascending-id output). The map side combines to ≤ cap entries per
    * (task, bucket), so the only band-key exchange carries bounded bucket
    * summaries — never the raw band rows.
    *
    *  - cold buckets (size ≤ cap ⇒ the member array is COMPLETE) explode
    *    their ≤ cap²/2 pairs LOCALLY from the aggregated array — no
    *    self-join, no second shuffle of the band frame (the round-10
    *    window cap sorted the full band frame; its star-link replacement
    *    still cost a stats pass + a tagging pass + a two-sided self-join);
    *  - hot buckets (> cap) emit |bucket|−1 hub links (hub = min doc_id =
    *    members[0]) via a broadcast of the hot set (bounded by N/cap) —
    *    linear, and an oversized near-identical cluster still collapses
    *    through its hub in the connected-components pass;
    *  - `carry` is an optional packed-long payload (d10's 4×16-bit
    *    signature) riding the same aggregate, so the caller verifies
    *    pairs WITHOUT joining back to the signature frame. */
  private def bandPairs(bandRows: DataFrame, keys: Seq[String],
                        carry: Option[String] = None): DataFrame = {
    val kc = keys.map(col)
    val payload = carry.map(col).getOrElse(lit(0L))
    val buckets = bandRows.groupBy(kc: _*).agg(
      count(lit(1)).as("bsz"),
      graft.functions.TopKByScore.column(lit(0.0), col("doc_id"), payload, BandMaxBucket)
        .as("members"))
    val coldPairs = buckets
      .filter(col("bsz") >= 2 && col("bsz") <= BandMaxBucket)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(members) - 2),
          |  i -> transform(sequence(i + 1, size(members) - 1),
          |    j -> struct(members[i].id AS doc_a, members[j].id AS doc_b,
          |                members[i].payload AS carry_a, members[j].payload AS carry_b))))"""
          .stripMargin)).as("pr"))
      .select(col("pr.doc_a"), col("pr.doc_b"), col("pr.carry_a"), col("pr.carry_b"))
    val hot = buckets.filter(col("bsz") > BandMaxBucket)
      .select(kc :+ col("members")(0).getField("id").as("hub")
                 :+ col("members")(0).getField("payload").as("hub_carry"): _*)
    val starPairs = bandRows.join(broadcast(hot), keys)
      .filter(col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"),
              col("hub_carry").as("carry_a"), payload.as("carry_b"))
    // carry values are functions of the doc ids, so dedup only on the pair
    coldPairs.unionByName(starPairs).dropDuplicates("doc_a", "doc_b")
  }

  /** The LSH band rows of a minhash signature: one (band, band_hash) struct
    * per band, band_hash joining the band's rows with '|'. Shared by d2 and
    * the d11 audit so the two can't drift. */
  private[llm] val minhashBandsExpr: String =
    s"""transform(sequence(0, ${Bands - 1}),
       |          b -> struct(b as band,
       |               array_join(slice(sig, $RowsPerBand * b + 1, $RowsPerBand), '|') as band_hash))""".stripMargin

  /** d10's narrow (doc_id, bands) signature frame: ONE md5 per word and one
    * codegen'd graft_simhash_bands pass computing all 4×16-bit bands from
    * disjoint slices of the 128-bit hash. Memoized per (session, dir) so
    * the banded self-join's two sides read one persisted copy instead of
    * re-hashing the corpus twice. */
  private def simhashSigs(s: SparkSession, dir: String): DataFrame =
    simSigCache.getOrElseUpdate(s, dir)(
      docs(s, dir)
        .withColumn("words", expr(wordsExpr))
        .filter(size(col("words")) > 0)
        .select(col("doc_id"),
          expr("graft_simhash_bands(transform(words, w -> md5(w)))").as("bands"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Evict everything this module memoized for (session, dir) — for
    * callers that build a THROWAWAY copy of a corpus dir (the bench's 4×
    * scale replica): without this, persisted signature/index frames keyed
    * by the deleted temp dir stay pinned for the session's lifetime and
    * any lost-block recompute would read a path that no longer exists. */
  def evictDir(s: SparkSession, dir: String): Unit = {
    sigCache.remove(s, dir)
    simSigCache.remove(s, dir)
    clusterCache.remove(s, dir)
    ivfCache.remove(s, dir)
    sqCache.remove(s, dir)
    pqCache.remove(s, dir)
    lshCache.remove(s, dir)
    bloomCache.remove(s, dir)
    centroidCache.remove(s, dir)
    CorpusQueries.evictCmsVocab(s, dir)
    CorpusQueries.evictFunnel(s, dir)
    CorpusQueries.evictLmToks(s, dir)
    CorpusQueries.evictBpeMerges(s, dir)
    CorpusQueries.evictLangProfiles(s, dir)
    CorpusQueries.evictDsirLm(s, dir)
    // d12's sink AND staging replica are dir-keyed (session-independent
    // files): drop the entries and their parquet so a reused dir path
    // recomputes instead of serving a stale pre-change pair set, and a
    // throwaway dir doesn't leave its staging replica on disk until JVM
    // exit
    streamDupSink.synchronized {
      def drop(cache: scala.collection.mutable.Map[String, String]): Unit =
        cache.keys.filter(k => k == dir || k.startsWith(dir + "@")).toSeq
          .foreach { k =>
            cache.remove(k).foreach(path =>
              try graft.core.FsUtil.deleteRecursively(path)
              catch { case scala.util.control.NonFatal(_) => () })
          }
      drop(streamDupSinkCache)
      drop(streamStageCache)
      drop(bitextSinkCache)
      drop(qaSinkCache)
      // w6/w7 staging replicas + checkpoints ride a parallel aux map
      sinkAuxCache.keys.filter(k => k.startsWith(dir + "@")).toSeq.foreach { k =>
        sinkAuxCache.remove(k).foreach(_.foreach(p =>
          try graft.core.FsUtil.deleteRecursively(p)
          catch { case scala.util.control.NonFatal(_) => () }))
      }
    }
  }

  /** Family-scoped eviction, keyed by the memo that backs each query
    * family. A long bench sweep (or any batch driver that runs query
    * families in sequence) calls the hook for a cache as soon as its LAST
    * consumer finishes, releasing executor storage memory for the
    * families still to run — holding every index for the whole sweep was
    * measured pressuring unrelated queries (round-10 tpch_q5/q7 warm
    * medians). Consumers per cache:
    *   - signatures (sigCache): d2, d4, d6, d7, d9, d11, d12_state_audit,
    *     d16, d18, d19, d20, d21, d22, t3, t15, t15_funnel_ppl, t26_source_overlap
    *   - simhash signatures (simSigCache): d10, d11
    *   - dedup clusters (clusterCache): d6, d7, d20
    *   - IVF index (ivfCache): ann_ivf_probe, ann_ivf_probe2,
    *     ann_ivfpq_topk, ann_ivfsq_topk, ann_incremental_add, d13_semdedup,
    *     d15_cell_skew_audit, r2_hybrid_retrieve, r5_bitext_mining,
    *     w6_stream_bitext + w6_mining_audit (via the sink BUILD — dir-keyed,
    *     so only their first touch trains, but that first touch must come
    *     before the eviction hook fires), and — since the residual-PQ
    *     round — every pqCache consumer (ann_pq_topk, e4_pq_error):
    *     residual codes train against and decode through the trained
    *     coarse centroids
    *     (ANY new ivfIndex/sqIndex/pqIndex consumer
    *     MUST be added to Bench's cacheLastConsumer table too — an omitted
    *     consumer silently rebuilds the index mid-sweep and re-pins it,
    *     the exact storage-pressure failure the eviction prevents)
    *   - SQ codes (sqCache): ann_sq_topk, ann_ivfsq_topk,
    *     e3_quantization_error
    *   - PQ codebook+codes (pqCache): ann_pq_topk, ann_ivfpq_topk,
    *     e4_pq_error
    *   - LSH tables (lshCache): d3_embedding_neardup (and the bench's
    *     bucket-recall probe)
    *   - BPE merge table (CorpusQueries.bpeMergeCache, driver-side Seq):
    *     t19_bpe_learn, t20_bpe_apply
    *   - language-ID profiles (CorpusQueries.langProfCache): t23_langid
    *   - CMS word-count vocab (CorpusQueries.cmsVocabCache): t22_cms_heavy_hitters
    *   - DSIR LM weights (CorpusQueries.dsirLmCache): t24_dsir_select
    *   - d18 Bloom filter words (bloomCache, driver-side Array[Long]):
    *     d18_bloom_decontaminate
    *   - label centroids (centroidCache): e1_embedding_coherence,
    *     e2_embedding_outliers
    *   - r7 first-pass hits (rocchioFirstCache, driver-side Seq):
    *     r7_rocchio_prf
    *   - query-vocabulary postings (qpostsCache): r2_hybrid_retrieve */
  def evictSignatures(s: SparkSession, dir: String): Unit  = sigCache.remove(s, dir)
  def evictSimSignatures(s: SparkSession, dir: String): Unit = simSigCache.remove(s, dir)
  def evictClusters(s: SparkSession, dir: String): Unit    = clusterCache.remove(s, dir)
  def evictIvfIndex(s: SparkSession, dir: String): Unit    = ivfCache.remove(s, dir)
  def evictSqIndex(s: SparkSession, dir: String): Unit     = sqCache.remove(s, dir)
  def evictPqIndex(s: SparkSession, dir: String): Unit     = pqCache.remove(s, dir)

  /** r7's collected first pass (NumQueries × TopK (q_id, rank,
    * neighbor_id) tuples) per (session, dir): the brute scan executes
    * once per session, not once per invocation — plan inspection and
    * bench warm reps reuse the bounded decision values. */
  private val rocchioFirstCache = new graft.core.SessionMemo[Seq[(Long, Long, Long)]]()
  def evictRocchioFirst(s: SparkSession, dir: String): Unit = rocchioFirstCache.remove(s, dir)

  /** r2's lexical-arm postings restricted to the QUERY vocabulary, per
    * (session, dir): (doc_id, w) pairs for w in the NumQueries query
    * docs' distinct words — bounded by the query vocabulary's posting
    * lists at any corpus scale (the slice of the inverted index a
    * retrieval tier materializes per query batch). Persisted LAZILY (no
    * job at construction) because the arm reads it twice per execution —
    * the term-df fold and the scoring join — and each lazy reference
    * would otherwise re-tokenize the whole corpus. Consumers: r2 only;
    * Bench evicts after its reps (cacheLastConsumer). */
  private val qpostsCache = new graft.core.SessionMemo[DataFrame](onEvict = { df => df.unpersist(); () })
  def evictQposts(s: SparkSession, dir: String): Unit = qpostsCache.remove(s, dir)

  /** d12 family: one parquet sink per (sfDir, variant) — the pair sink
    * (variant "") and the overflow-audit sink (variant "#audit"). File
    * sinks are session-independent, so the key is the dir — any session
    * reads the same files — PLUS a content stamp of the input: a
    * documents.parquet rewritten at the same path must recompute, not
    * serve the stale pre-change set. */
  private val streamDupSink = new Object
  private val streamDupSinkCache = scala.collection.mutable.Map.empty[String, String]
  // staging replicas shared ACROSS variants, keyed by the same dir@stamp
  // prefix: the pair sink and the audit sink replay the identical 3-drop
  // input, so one corpus rewrite serves both
  private val streamStageCache = scala.collection.mutable.Map.empty[String, String]

  /** The d12-family sink protocol: replay `dir`'s corpus as a 3-drop file
    * stream into a cached parquet sink, returning the sink path. `run`
    * starts the streaming query for its variant (pairs or overflow
    * markers). Stale-STAMP keys of the whole family are dropped before
    * computing (prefix compare — a stamp change invalidates both
    * variants and the shared staging replica; a sibling variant under
    * the CURRENT stamp, and its staging, are preserved). */
  private def streamSinkFor(s: SparkSession, dir: String, variant: String)(
      run: (DataFrame, String, String) => org.apache.spark.sql.streaming.StreamingQuery): String =
    streamDupSink.synchronized {
      val prefix = s"$dir@${docsStamp(dir)}"
      val key = s"$prefix$variant"
      streamDupSinkCache.keys.filter(k => k.startsWith(dir + "@") && !k.startsWith(prefix)).toSeq
        .foreach { k =>
          streamDupSinkCache.remove(k).foreach(sink =>
            try graft.core.FsUtil.deleteRecursively(sink)
            catch { case scala.util.control.NonFatal(_) => () })
        }
      streamStageCache.keys.filter(k => k.startsWith(dir + "@") && k != prefix).toSeq
        .foreach { k =>
          streamStageCache.remove(k).foreach(st =>
            try graft.core.FsUtil.deleteRecursively(st)
            catch { case scala.util.control.NonFatal(_) => () })
        }
      streamDupSinkCache.getOrElseUpdate(key, {
        val staging = streamStageCache.getOrElseUpdate(prefix, {
          val st = java.nio.file.Files.createTempDirectory("graft-d12-stage-").toString
          docs(s, dir).repartition(3).write.mode("overwrite").parquet(st)
          graft.core.FsUtil.deleteOnExit(st)
          st
        })
        val sink = java.nio.file.Files.createTempDirectory("graft-d12-sink-").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft-d12-ckpt-").toString
        // batch drivers exit without evicting — sweep on JVM shutdown
        Seq(sink, ckpt).foreach(graft.core.FsUtil.deleteOnExit)
        val src = s.readStream.schema(docs(s, dir).schema)
          .option("maxFilesPerTrigger", 1).parquet(staging)
        run(src, sink, ckpt).awaitTermination()
        sink
      })
    }

  /** Content signature over the dir's documents.parquet file(s) — the
    * invalidation component of the d12 sink-cache key. Per-file
    * (name, length, mtime) tuples, name-sorted, folded to one md5: an
    * aggregated max(mtime)+total-length stamp would collide for a fixture
    * regenerated within the same millisecond at identical total size. */
  private def docsStamp(dir: String): String = fileStamp(dir, "documents.parquet")

  /** [[docsStamp]] generalized to any input table — w6's sink cache stamps
    * embeddings.parquet the same way. */
  private def fileStamp(dir: String, name: String): String = {
    val p = new java.io.File(dir, name)
    val files =
      if (p.isDirectory) Option(p.listFiles()).getOrElse(Array.empty[java.io.File]).filter(_.isFile)
      else Array(p)
    val detail = files.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
      .mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest(detail.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Cosine similarity between array columns `x` and `y` as a SQL
    * fragment — the one formula every embedding operator shares. */
  private def cosSim(x: String, y: String): String =
    s"${dot(x, y)} / (sqrt(${dot(x, x)}) * sqrt(${dot(y, y)}))"

  /** Stage a frame as 3 mtime-ordered shard files (shard = `shardCol` % 3)
    * in ONE pass over the input: coalesce(1) + partitionBy writes exactly
    * one file per present shard, which is then moved into a flat staging
    * dir the file-stream source replays in order. Shared by the w6/w7
    * sink builders (the per-shard filter version paid one corpus scan per
    * shard). Returns the staging dir. */
  private def stageShards(df: DataFrame, shardCol: String, prefix: String): String = {
    val tmpRoot = java.nio.file.Files.createTempDirectory(s"$prefix-tmp-").toString
    df.withColumn("_shard", pmod(col(shardCol), lit(3L)))
      .coalesce(1).write.partitionBy("_shard").mode("overwrite").parquet(tmpRoot)
    val staging = java.nio.file.Files.createTempDirectory(s"$prefix-stage-").toString
    (0 until 3).foreach { i =>
      val dirF  = new java.io.File(s"$tmpRoot/_shard=$i")
      val parts = Option(dirF.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.endsWith(".parquet"))
      // an EMPTY shard writes no partition dir at all — a valid refresh
      // with nothing in it (one fewer trigger; shard identity travels in
      // the data, so nothing downstream miscounts)
      require(parts.length <= 1, s"expected at most one file for shard $i, got ${parts.length}")
      parts.headOption.foreach { part =>
        val dst = java.nio.file.Paths.get(staging, s"shard-$i.parquet")
        java.nio.file.Files.move(part.toPath, dst)
        dst.toFile.setLastModified(1600000000000L + i * 60000L)
        ()
      }
    }
    graft.core.FsUtil.deleteRecursively(tmpRoot)
    staging
  }

  /** Aux dirs (staging replica + checkpoint) per sink-cache key, for the
    * w6/w7 stale-stamp sweeps: the d12 discipline — a superseded build's
    * corpus replica must be deleted WITH its sink, not leak until JVM
    * exit. */
  private val sinkAuxCache = scala.collection.mutable.Map.empty[String, Seq[String]]

  private def dropStaleSinkKeys(cache: scala.collection.mutable.Map[String, String],
                                dir: String, liveKey: String): Boolean = {
    val stale = cache.keys.filter(k => k.startsWith(dir + "@") && k != liveKey).toSeq
    stale.foreach { k =>
      (cache.remove(k).toSeq ++ sinkAuxCache.remove(k).getOrElse(Nil)).foreach(p =>
        try graft.core.FsUtil.deleteRecursively(p)
        catch { case scala.util.control.NonFatal(_) => () })
    }
    stale.nonEmpty
  }

  /** w7: streaming corpus quality gate — t14's classifier run per
    * arriving shard, the admission QA a streaming ingestion pipeline
    * keeps in front of the corpus (score each incoming doc map-side,
    * roll up per (refresh, source), alert on a pass-rate drop). Stateless
    * per refresh: the SHARED [[qualityScoreExpr]] scores (semantics
    * cannot drift from t14/t15), one bounded (drop, source) rollup per
    * micro-batch, nothing keyed to cap. Shard identity travels in the
    * data (doc_id % 3). Sink is dir@stamp-keyed parquet like w6's. */
  private val qaSinkCache = scala.collection.mutable.Map.empty[String, String]

  private def streamQualitySink(s: SparkSession, dir: String): String = streamDupSink.synchronized {
    val key = s"$dir@${fileStamp(dir, "documents.parquet")}"
    dropStaleSinkKeys(qaSinkCache, dir, key)
    qaSinkCache.getOrElseUpdate(key, {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val src       = docs(s, dir).select("doc_id", "source", "text")
      val srcSchema = src.schema
      val staging   = stageShards(src, "doc_id", "graft-w7")
      val sink = java.nio.file.Files.createTempDirectory("graft-w7-sink-").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-w7-ckpt-").toString
      Seq(staging, sink, ckpt).foreach(graft.core.FsUtil.deleteOnExit)
      val q = s.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            graft.functions.GraftFunctions.ensureRegistered(batch.sparkSession)
            batch
              .select(pmod(col("doc_id"), lit(3L)).as("drop_id"), col("source"),
                      expr(qualityScoreExpr).as("score"))
              .groupBy("drop_id", "source")
              .agg(count(lit(1)).as("n_docs"),
                   sum(when(col("score") >= 0, 1L).otherwise(0L)).as("n_keep"),
                   sum("score").as("sum_score"))
              .write.mode("append").parquet(s"$sink/data")
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // aux dirs are registered only on SUCCESS (paired with the sink-cache
      // entry); a failed build reclaims its dirs immediately instead of
      // orphaning an aux entry no stale sweep can see
      try q.awaitTermination()
      catch {
        case t: Throwable =>
          Seq(staging, sink, ckpt).foreach(p =>
            try graft.core.FsUtil.deleteRecursively(p)
            catch { case scala.util.control.NonFatal(_) => () })
          throw t
      }
      sinkAuxCache(key) = Seq(staging, ckpt)
      s"$sink/data"
    })
  }

  /** r5's margin miner between a static `a` side (a_id, av, cell) and a
    * `b` side (b_id, bv, cell) — ONE definition shared by the batch
    * operator (r5) and the streaming per-refresh pass (w6), so the mining
    * semantics cannot drift between them. Cell-local pair join, bounded
    * graft_topk neighborhoods per endpoint, mutual-NN gate, all-integer
    * ratio margin (see r5's scale/parity notes). */
  private[llm] def bitextMine(a: DataFrame, b: DataFrame): DataFrame = {
    // endpoint norms hoisted above the cell-local pair join (round 22):
    // each endpoint self-dots once, not once per pair — identical doubles
    val pairs = a.withColumn("an2", expr(dot("av", "av")))
      .join(b.withColumn("bn2", expr(dot("bv", "bv"))), "cell")
      .withColumn("s1", expr(
        s"1L + cast(floor((1.0D + ${dot("av", "bv")} / (sqrt(an2) * sqrt(bn2))) * $BitextFp) as bigint)"))
      .select(col("cell"), col("a_id"), col("b_id"), col("s1"))
    def side(key: String, other: String): DataFrame = pairs
      .groupBy(col(key), col("cell"))
      .agg(graft.functions.TopKByScore.column(
        col("s1").cast("double"), col(other), col("s1"), BitextK).as("top"))
      .select(col(key), col("cell"),
        expr("top[0].id").as(s"${other}1"),
        expr("top[0].payload").as("top_s1"),
        expr("aggregate(top, 0L, (acc, t) -> acc + t.payload)").as(s"d_$key"),
        size(col("top")).cast("long").as(s"k_$key"))
    val fwd = side("a_id", "b_id")
    val bwd = side("b_id", "a_id")
      .select(col("b_id"), col("a_id1"), col("d_b_id"), col("k_b_id"))
    fwd.join(bwd, col("b_id1") === col("b_id") && col("a_id1") === col("a_id"))
      .select(col("a_id"), col("b_id"), col("cell").cast("long").as("cell"),
        expr("(2000L * top_s1 * k_a_id * k_b_id) div (d_a_id * k_b_id + d_b_id * k_a_id)")
          .as("margin_permille"))
  }

  /** w6: streaming bitext mining — the incremental pass a production
    * alignment pipeline runs per corpus refresh. The odd-label side
    * ("today's translation shard") arrives as a 3-drop file stream
    * (deterministic shards: vec_id % 3); each micro-batch is assigned to
    * the TRAINED IVF cells via broadcast centroids (the FAISS add path —
    * arriving vectors are NOT in the index) and mined r5-style against the
    * static even side, batch-local mutual NN. Stateless per refresh: the
    * trained index is the only carried structure, so there is no keyed
    * streaming state to cap — the audit (w6_mining_audit) instead gates
    * per-refresh COMPLETENESS (every staged shard mined, batch sizes
    * reconciled) and the cell fan-out. Sink is parquet, keyed by dir (any
    * session reads the same files). */
  private val bitextSinkCache = scala.collection.mutable.Map.empty[String, String]

  private def streamBitextSink(s: SparkSession, dir: String): String = streamDupSink.synchronized {
    // keyed by dir@embeddings-stamp (the d12 discipline) and guarded by the
    // SAME monitor evictDir's drop() takes, so build and evict can never
    // race on the map. The stamp protects the SESSION-INDEPENDENT file
    // sink (a fresh JVM must not serve a sink mined from a replaced
    // corpus); in-session invalidation after an in-place regeneration is
    // [[evictDir]]'s job — the documented contract for every (session,
    // dir) memo in this file, which also evicts the IVF memo this build
    // trains against. A stale-stamp drop here additionally evicts the IVF
    // memo (belt: the common regenerate-then-re-query flow stays
    // consistent even without an evictDir call, whenever a prior build's
    // key makes the regeneration detectable).
    val key = s"$dir@${fileStamp(dir, "embeddings.parquet")}"
    if (dropStaleSinkKeys(bitextSinkCache, dir, key)) evictIvfIndex(s, dir)
    bitextSinkCache.getOrElseUpdate(key, {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val (cents, assigned) = ivfIndex(s, dir)
      val lab = emb(s, dir).select(col("vec_id"), col("label"))
      val aSide = assigned.join(lab, "vec_id").filter(col("label") % 2 === 0)
        .select(col("vec_id").as("a_id"), col("v").as("av"), col("centroid_id").as("cell"))
      // stage the arriving side as 3 mtime-ordered shard files; drop
      // identity travels IN the data (vec_id % 3), never via batch ids, so
      // the sink is correct under any file-source ordering
      val src = emb(s, dir).filter(col("label") % 2 === 1).select("vec_id", "v")
      val srcSchema = src.schema
      val staging = stageShards(src, "vec_id", "graft-w6")
      val sink = java.nio.file.Files.createTempDirectory("graft-w6-sink-").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-w6-ckpt-").toString
      Seq(staging, sink, ckpt).foreach(graft.core.FsUtil.deleteOnExit)
      val q = s.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            // map-side admission against the broadcast trained centroids —
            // identical argmax + tie-break to the index's own assignment,
            // so the oracle can derive the cells from its assigned CTE
            val b = batch.withColumn("vn2", expr(dot("v", "v")))
              .crossJoin(broadcast(cents))
              .withColumn("c_sim", expr(s"${dot("v", "cv")} / (sqrt(vn2) * sqrt(${dot("cv", "cv")}))"))
              .groupBy(col("vec_id"))
              .agg(max_by(struct(col("c_id").as("centroid_id"), col("v").as("v")),
                          struct(col("c_sim").as("s"), (-col("c_id")).as("neg_id"))).as("best"))
              .select(col("vec_id").as("b_id"), col("best.v").as("bv"),
                      col("best.centroid_id").as("cell"))
            bitextMine(aSide, b)
              .withColumn("drop_id", pmod(col("b_id"), lit(3L)))
              .write.mode("append").parquet(s"$sink/data")
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // success-only aux registration — see streamQualitySink
      try q.awaitTermination()
      catch {
        case t: Throwable =>
          Seq(staging, sink, ckpt).foreach(p =>
            try graft.core.FsUtil.deleteRecursively(p)
            catch { case scala.util.control.NonFatal(_) => () })
          throw t
      }
      sinkAuxCache(key) = Seq(staging, ckpt)
      s"$sink/data"
    })
  }

  /** The SINGLE-TABLE hyperplane-LSH bucketed embedding frame —
    * ann_lsh_nn's generator. Its planes are [[lshTabled]]'s table 0
    * (plane ids 0..hp−1), so the ANN bucket ids and d3's reported
    * `bucket` column stay the same id space; d3 and the bench's
    * bucket-locality probe use the multi-table [[lshTabled]] /
    * [[lshTablePairs]]. Plane count derived from corpus size
    * ([[hyperplanesFor]]). */
  private def lshBucketed(s: SparkSession, dir: String): DataFrame = {
    val planes = (0 until hyperplanesFor(embCount(s, dir))).map(h => hyperplane(h, EmbeddingDim))
    val bucketExpr = planes.zipWithIndex
      .map { case (p, h) =>
        val lit = p.mkString("cast(array(", ", ", ") as array<double>)")
        s"CASE WHEN ${dot("v", lit)} >= 0.0 THEN ${1 << h} ELSE 0 END"
      }
      .mkString(" + ")
    emb(s, dir).withColumn("bucket", expr(bucketExpr))
  }

  /** Bucket-local candidate pairs over a [[lshBucketed]] frame: self-join
    * ONLY within buckets (shuffles on the bucket id, never all-pairs). */
  private def bucketLocalPairs(b: DataFrame): DataFrame =
    // endpoint norms attached BEFORE the bucket-local self-join (round
    // 22): one self-dot per row per side, not per pair — consumers score
    // with [[pairSimExpr]], the same doubles as cosSim("v", "ov")
    b.withColumn("vn2", expr(dot("v", "v"))).as("a")
      .join(b.select(col("vec_id").as("o_id"), col("v").as("ov"), col("bucket"))
              .withColumn("on2", expr(dot("ov", "ov"))).as("o"),
            Seq("bucket"))
      .filter(col("vec_id") =!= col("o_id"))

  /** The [[LshTables]]-table hyperplane-LSH frame for d3: per vector, one
    * band struct (t, bkt) per independent table — table t over planes
    * t·32+h, h < the corpus-derived count — plus `bucket`, the table-0
    * bucket (the same planes as [[lshBucketed]], so the reported bucket id
    * is unchanged from the single-table operator). All per-row arithmetic,
    * no shuffle; the oracle rebuilds the planes from the same md5
    * derivation ([[hyperplane]] components are dyadic rationals exactly
    * expressible in SQL), bit-for-bit. */
  private val lshCache = new graft.core.SessionMemo[DataFrame](onEvict = { df => df.unpersist(); () })
  def evictLshTables(s: SparkSession, dir: String): Unit = lshCache.remove(s, dir)

  private def lshTabled(s: SparkSession, dir: String): DataFrame =
    lshCache.getOrElseUpdate(s, dir) {
      val hp = hyperplanesFor(embCount(s, dir))
      def bucketExprFor(t: Int): String =
        (0 until hp).map { h =>
          val lit = hyperplane(t * 32 + h, EmbeddingDim).mkString("cast(array(", ", ", ") as array<double>)")
          s"CASE WHEN ${dot("v", lit)} >= 0.0 THEN ${1 << h} ELSE 0 END"
        }.mkString(" + ")
      val bandsExpr = (0 until LshTables)
        .map(t => s"named_struct('t', $t, 'bkt', ${bucketExprFor(t)})")
        .mkString("array(", ", ", ")")
      // MEMOIZE-PERSIST (the sigCache pattern — at 100 TB this is the LSH
      // sidecar a deployment materializes next to the vectors): the bands
      // expression is L×hp inline plane literals, and measured cost is
      // dominated by re-ANALYZING and re-COMPILING that tree on every
      // invocation (the d3 plan references the frame three times), not by
      // evaluating it — persisting turns the giant expression into data
      // built once per (session, dir).
      emb(s, dir).withColumn("bands", expr(bandsExpr))
        .withColumn("bucket", expr("bands[0].bkt"))
        .select("vec_id", "v", "bands", "bucket")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Multi-table bucket-local pairs over a [[lshTabled]] frame — d3's
    * generator, also the bench's bucket-locality probe. Candidates are
    * pairs sharing a bucket in ANY of the [[LshTables]] tables: one
    * explode (L rows per vector), ONE shuffle on the (table, bucket) key
    * — exactly d2's band-join shape, never all-pairs, candidate volume
    * bounded at L × occupancy per vector. A pair agreeing in several
    * tables appears once per agreeing table; consumers that count
    * partners dedupe (d3 counts DISTINCT o_id). */
  private def lshTablePairs(b: DataFrame): DataFrame = {
    val x = b.select(col("vec_id"), col("v"), explode(col("bands")).as("band"))
      .select(col("vec_id"), col("v"), col("band.t").as("t"), col("band.bkt").as("bkt"))
    // endpoint norms hoisted above the band-local self-join (round 22 —
    // see [[bucketLocalPairs]]); consumers score with [[pairSimExpr]]
    x.withColumn("vn2", expr(dot("v", "v")))
      .join(x.select(col("vec_id").as("o_id"), col("v").as("ov"), col("t"), col("bkt"))
              .withColumn("on2", expr(dot("ov", "ov"))),
           Seq("t", "bkt"))
      .filter(col("vec_id") =!= col("o_id"))
  }

  /** Multi-probe cell-local candidate pairs over the trained IVF index —
    * d13's generator, also the bench's cell-locality probe. Each vector
    * searches its own cell PLUS its [[SemDeDupProbes]]-1 next-nearest
    * trained cells (the recorded IVF probe-curve lever applied to the
    * dedup pair pass). The extra cells come from ONE bounded graft_topk
    * aggregate over the (corpus × broadcast centroids) scored frame —
    * map-side combine, no corpus-wide window; re-attaching `v` joins on
    * vec_id, the partitioning the persisted assignment already carries.
    * Probe 1 needs no pass at all (the assigned cell IS the nearest,
    * same score and tie-break). The pair join then shuffles on the cell
    * key exactly like the single-probe plan with ≤ P× the candidate
    * volume, and the excluded own-cell filter plus distinct probe cells
    * guarantee no duplicate (vec_id, o_id) pairs. */
  private def semProbePairs(s: SparkSession, dir: String): DataFrame = {
    val (cents, assigned) = ivfIndex(s, dir)
    val a = assigned.select(col("vec_id"), col("v"), col("centroid_id"))
    val extras = a.withColumn("vn2", expr(dot("v", "v")))
      .crossJoin(broadcast(cents))
      .filter(col("c_id") =!= col("centroid_id"))
      .withColumn("c_sim", expr(s"${dot("v", "cv")} / (sqrt(vn2) * sqrt(${dot("cv", "cv")}))"))
      .groupBy(col("vec_id"))
      .agg(graft.functions.TopKByScore.column(col("c_sim"), col("c_id"), lit(0L),
                                              SemDeDupProbes - 1).as("top"))
      .select(col("vec_id"), explode(col("top")).as("tp"))
      .select(col("vec_id"), col("tp.id").as("pcell"))
      .join(a.select(col("vec_id"), col("v")), Seq("vec_id"))
    a.select(col("vec_id"), col("v"), col("centroid_id").as("pcell"))
      .unionAll(extras.select(col("vec_id"), col("v"), col("pcell")))
      // endpoint norms attached BEFORE the cell-local pair join (round
      // 22): each side self-dots once per row, not once per pair — the
      // consumers' [[pairSimExpr]] reuses them, identical doubles
      .withColumn("vn2", expr(dot("v", "v")))
      .join(a.select(col("vec_id").as("o_id"), col("v").as("ov"),
                     col("centroid_id").as("pcell"))
              .withColumn("on2", expr(dot("ov", "ov"))),
            Seq("pcell"))
      .filter(col("vec_id") =!= col("o_id"))
  }

  /** Pair cosine over the pair-generator outputs ([[semProbePairs]],
    * [[bucketLocalPairs]], [[lshTablePairs]]) — the cosSim("v", "ov")
    * doubles computed from the pre-join hoisted norms. */
  private def pairSimExpr: String =
    s"${dot("v", "ov")} / (sqrt(vn2) * sqrt(on2))"

  /** Exact embedding-space ground truth for the bench's dedup-recall
    * block: vectors with at least one OTHER vector at cosine ≥ tau, from
    * a brute-force all-pairs pass. Deliberately O(N²) — this is the
    * bench-side oracle the approximate families (d3 bucket-local, d13
    * cell-local) are measured against, not a pipeline operator. */
  private[graft] def exactCosineDupVectors(s: SparkSession, dir: String,
                                           tau: Double = 0.8): Set[Long] = {
    val e = emb(s, dir)
    val o = e.select(col("vec_id").as("o_id"), col("v").as("ov"))
    e.crossJoin(o)
      .filter(col("vec_id") < col("o_id"))
      .filter(expr(s"${cosSim("v", "ov")} >= $tau"))
      .select(explode(array(col("vec_id"), col("o_id"))).as("vec_id"))
      .distinct().collect().map(_.getLong(0)).toSet
  }

  /** Parametric detection set for the bench's dedup-recall block: the
    * vec_ids the CELL-LOCAL candidate generator (d13's [[semProbePairs]]
    * — the literal production generator, not a copy) detects as
    * cosine-≥tau duplicates. The production operator fixes tau = 0.8; the
    * bench probes at a tau where the synthetic corpus actually HAS
    * duplicates, isolating the recall cost of cell locality (the only
    * approximation — the cosine itself is exact). */
  private[graft] def cellDupVectorsAt(s: SparkSession, dir: String, tau: Double): Set[Long] =
    semProbePairs(s, dir)
      .filter(expr(s"$pairSimExpr >= $tau"))
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet

  /** Same probe for the BUCKET-LOCAL generator (d3's
    * [[lshTablePairs]] over [[lshTabled]]). */
  private[graft] def bucketDupVectorsAt(s: SparkSession, dir: String, tau: Double): Set[Long] =
    lshTablePairs(lshTabled(s, dir))
      .filter(expr(s"$pairSimExpr >= $tau"))
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet

  /** Per-algorithm bucket audit backing the [[BandMaxBucket]] cap: bucket
    * count, hot buckets (> cap) and the rows in them — rows whose
    * candidate generation degraded from all-pairs to star links. One
    * partial-aggregatable shuffle per algorithm folded to a single row —
    * a cheap side query a pipeline owner runs next to d2/d10 so the cap
    * is never a silent degradation. */
  private def bandSkewAudit(s: SparkSession, dir: String): DataFrame = {
    def auditOf(algo: String, bandDf: DataFrame, keys: Seq[String]): DataFrame =
      bandDf.groupBy(keys.map(col): _*).agg(count(lit(1)).as("sz"))
        .agg(
          count(lit(1)).as("n_buckets"),
          coalesce(sum(when(col("sz") > BandMaxBucket, 1L).otherwise(0L)), lit(0L)).as("n_hot_buckets"),
          coalesce(sum(when(col("sz") > BandMaxBucket, col("sz")).otherwise(lit(0L))), lit(0L)).as("n_capped_rows"))
        .select(lit(algo).as("algo"), col("n_buckets"), col("n_hot_buckets"), col("n_capped_rows"))
    val base = sigFrame(s, dir)
    val mhBands = base.select(explode(expr(minhashBandsExpr)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
    val shBands = simhashSigs(s, dir)
      .select(posexplode(col("bands")).as(Seq("band", "band_val")))
    auditOf("minhash", mhBands, Seq("band", "band_hash"))
      .unionAll(auditOf("simhash", shBands, Seq("band", "band_val")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------- exact dedup (content hash) ----------
    "d1_exact_dedup" -> { (s, dir) =>
      val w = Window.partitionBy(col("content_hash"))
      docs(s, dir)
        .withColumn("content_hash", md5(col("text")))
        .withColumn("keeper_id", min("doc_id").over(w))
        .select(
          col("doc_id"),
          col("content_hash"),
          (col("doc_id") === col("keeper_id")).as("is_canonical")
        )
    },

    // ---------- near-dedup: MinHash + LSH band join + Jaccard verify ----------
    "d2_minhash_lsh" -> { (s, dir) =>
      val base  = sigFrame(s, dir)
      val pairs = minhashCandidatePairs(s, dir)
      val sa = base.select(col("doc_id").as("doc_a"), col("shingle_set").as("set_a"))
      val sb = base.select(col("doc_id").as("doc_b"), col("shingle_set").as("set_b"))
      pairs
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter_cnt", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
        .withColumn("union_cnt", (size(col("set_a")) + size(col("set_b"))).cast("long") - col("inter_cnt"))
        .select("doc_a", "doc_b", "inter_cnt", "union_cnt")
    },

    // ---------- dedup QA: banding loss vs the exact ground truth ----------
    "d21_banding_loss" -> { (s, dir) =>
      // The bench's banding-recall probe promoted to a first-class,
      // hash-gated operator: per Jaccard decile, how many TRUE dup pairs
      // (d4's exact inverted-index ground truth) the d2 banding surfaces
      // as candidates — the loss curve a dedup owner reads before tuning
      // bands × rows. Both generators are the shared ones d2/d4
      // themselves run ([[minhashCandidatePairs]], [[ngramDupPairs]] —
      // candidate semantics cannot drift from the operators they grade);
      // the join is pair-keyed over two bounded pair frames, the rollup
      // one decile agg, integers end to end.
      val truth = ngramDupPairs(s, dir)
        .withColumn("jac_band", expr("((1000 * inter_cnt) div union_cnt) div 100"))
      val caught = minhashCandidatePairs(s, dir).withColumn("_c", lit(1L))
      truth.join(caught, Seq("doc_a", "doc_b"), "left")
        .groupBy("jac_band")
        .agg(count(lit(1)).as("n_true_pairs"),
             sum(coalesce(col("_c"), lit(0L))).as("n_caught"),
             expr("cast((1000 * sum(coalesce(_c, 0L))) div count(1) as bigint)").as("caught_permille"))
    },

    // ---------- dedup QA: near-dup leakage across the train/val/test split ----------
    "d22_split_leakage" -> { (s, dir) =>
      // The eval-integrity audit run before any benchmark claim: a test
      // doc whose near-duplicate sits in train measures memorization,
      // not generalization (the leak class decontamination pipelines
      // exist for — Lee et al. 2022 quantify it). d4's exact dup pairs
      // are the truth and d5's deterministic bucket is the split — BOTH
      // shared generators ([[ngramDupPairs]], [[CorpusQueries
      // .splitCaseOf]]), so the audit can never drift from the split it
      // audits. One row per ordered leaking split pair: pair count,
      // distinct leaked docs on each side, mean Jaccard permille. The
      // split is pure map-side arithmetic over the bounded pair frame —
      // no extra scan, no shuffle beyond the rollup.
      val cross = ngramDupPairs(s, dir)
        .withColumn("split_a", expr(CorpusQueries.splitCaseOf("doc_a")))
        .withColumn("split_b", expr(CorpusQueries.splitCaseOf("doc_b")))
        .filter(col("split_a") =!= col("split_b"))
        .withColumn("split_lo", least(col("split_a"), col("split_b")))
        .withColumn("split_hi", greatest(col("split_a"), col("split_b")))
        .withColumn("doc_lo", when(col("split_a") === col("split_lo"), col("doc_a")).otherwise(col("doc_b")))
        .withColumn("doc_hi", when(col("split_a") === col("split_lo"), col("doc_b")).otherwise(col("doc_a")))
      cross.groupBy("split_lo", "split_hi")
        .agg(count(lit(1)).as("n_pairs"),
             countDistinct(col("doc_lo")).as("n_docs_lo"),
             countDistinct(col("doc_hi")).as("n_docs_hi"),
             expr("cast((1000 * sum(inter_cnt)) div sum(union_cnt) as bigint)").as("mean_jaccard_permille"))
    },

    // ---------- near-dedup: SimHash banded hamming ----------
    "d10_simhash_neardup" -> { (s, dir) =>
      // ONE md5 per word and one codegen'd graft_simhash_bands pass
      // computing all 4×16-bit bands from disjoint slices of the 128-bit
      // hash. hamming <= 3 over the 64-bit signature touches at most 3 of
      // the 4 bands, so every qualifying pair shares one exact band value:
      // candidates exist only inside (band, value) buckets — the self-join
      // shuffles on the band value, never all-pairs. The narrow signature
      // frame is memoized per (session, dir) so the self-join's two sides
      // read one persisted copy instead of re-hashing the corpus twice.
      val sigs = simhashSigs(s, dir)
      // the 4×16-bit bands packed into ONE long — it IS the 64-bit SimHash
      // signature, and xor+popcount on the packed form equals the summed
      // per-band hamming exactly (disjoint 16-bit lanes)
      val packExpr = (0 until SimBands)
        .map(i => s"shiftleft(cast(bands[$i] as bigint), ${16 * (SimBands - 1 - i)})")
        .mkString(" + ")
      val bandRows = sigs.select(col("doc_id"), expr(packExpr).as("packed"),
        posexplode(col("bands")).as(Seq("band", "band_val")))
      // Same hot-bucket guard as d2 ([[bandPairs]]): cold buckets
      // all-pairs, hot buckets star-linked to their hub, one band-key
      // shuffle. Pairs are deduped BEFORE scoring: a pair sharing k bands
      // would otherwise be xor/popcount'ed k times (≤4× wasted work). The
      // packed signature rides THROUGH the pair generation (carry) so the
      // hamming verify needs no join back to the signature frame.
      val cand = bandPairs(bandRows, Seq("band", "band_val"), carry = Some("packed"))
      cand
        .select(col("doc_a"), col("doc_b"),
          expr("cast(bit_count(carry_a ^ carry_b) as long)").as("hamming"))
        .filter(col("hamming") <= SimHammingMax)
    },

    // ---------- near-dedup: EXACT n-gram Jaccard via inverted index ----------
    "d4_ngram_jaccard" -> { (s, dir) => ngramDupPairs(s, dir) },

    // ---------- cross-source duplication matrix (corpus provenance audit) ----------
    "t26_source_overlap" -> { (s, dir) =>
      // WHICH sources duplicate WHICH: d4's exact near-dup pairs rolled
      // up into a source×source matrix — the provenance audit a corpus
      // curator reads before choosing what to crawl less of (mirrors the
      // cross-snapshot overlap tables in the C4/RefinedWeb writeups,
      // public). Ordered (source_a ≤ source_b) so each unordered source
      // pair is one row; self-cells count within-source duplication.
      // Plan: the pair frame is the shared d4 generator (posting-local,
      // df-capped); the two source lookups are corpus-key joins over the
      // narrow (doc_id, source) projection; the rollup is a bounded
      // sources² aggregate.
      val pairs = ngramDupPairs(s, dir)
      val srcOf = docs(s, dir).select(col("doc_id"), col("source"))
      pairs
        .join(srcOf.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
        .join(srcOf.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("source_a"),
                greatest(col("sa"), col("sb")).as("source_b"),
                col("inter_cnt"), col("union_cnt"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_dup_pairs"),
             sum(col("inter_cnt")).as("sum_inter"),
             expr("cast((1000 * sum(inter_cnt)) div sum(union_cnt) as bigint)")
               .as("mean_jaccard_permille"))
    },

    // ---------- asymmetric containment dedup (partial-copy detection) ----------
    "d19_containment" -> { (s, dir) =>
      // Near-CONTAINMENT detection (Broder's containment coefficient,
      // public): |A∩B| / |A| ≥ [[ContainPermille]]‰ flags A as contained
      // in B — the asymmetric criterion Jaccard misses (a page quoting a
      // whole smaller doc has low Jaccard but total containment), the
      // real-world partial-copy / quotation dedup case. Candidates come
      // from the SAME df-capped posting-local generator as d4 (a
      // contained doc shares every shingle with its container, so any
      // sub-cap shared shingle surfaces the pair); the gate is integer
      // permille, emitted in BOTH directions when both hold (mutual
      // containment = near-identical sets). One extra frame over d4's
      // machinery — no new shuffle shape.
      val sc = ngramScoredPairs(s, dir)
      val fwd = sc.filter(col("inter_cnt") * 1000 >= lit(ContainPermille) * col("na"))
        .select(col("doc_a").as("contained_id"), col("doc_b").as("container_id"),
                col("inter_cnt"), col("na").as("n_contained"), col("nb").as("n_container"))
      val bwd = sc.filter(col("inter_cnt") * 1000 >= lit(ContainPermille) * col("nb"))
        .select(col("doc_b").as("contained_id"), col("doc_a").as("container_id"),
                col("inter_cnt"), col("nb").as("n_contained"), col("na").as("n_container"))
      fwd.unionByName(bwd)
    },

    // ---------- band-bucket skew audit for the capped self-joins ----------
    "d11_band_skew_audit" -> { (s, dir) => bandSkewAudit(s, dir) },

    // ---------- INCREMENTAL dedup: a new batch admitted against the corpus ----------
    "d16_incremental_dedup" -> { (s, dir) =>
      // The production shape of continuous corpus building: a daily crawl
      // batch (doc_id % IncrEvery == IncrSlot here — the modulus split is
      // FIXTURE convenience so planted pairs straddle the boundary at
      // every SF; a real deployment's batch is a separate input) is
      // admitted against an already-deduplicated corpus. The asymmetry IS
      // the scale story, and it is a CONTRACT: every broadcast below is
      // BATCH-proportional (bands, shingle sets, candidates), so the plan
      // assumes a batch within the broadcast bound (the daily-crawl
      // regime — GBs against a 100 TB corpus). A batch approaching corpus
      // scale is not an admission problem; run the d2 full self-dedup
      // instead. Under that contract:
      //   - the corpus band frame folds through ONE bounded band-key
      //     aggregate (count-free: just the cap smallest members via
      //     graft_topk — map-side combine to ≤ cap entries per task), the
      //     only shuffle the corpus pays;
      //   - the batch's band rows are BROADCAST into those bucket
      //     summaries (a hash probe, no corpus movement);
      //   - batch-internal dedup (arrival order: lower doc_id wins) is a
      //     broadcast self-probe of the batch — the corpus is not involved;
      //   - exact-Jaccard verification probes the corpus shingle sets with
      //     the (small) candidate list broadcast, so the corpus scan again
      //     moves nothing.
      // A corpus band bucket hotter than BandMaxBucket contributes only
      // its cap smallest members as candidate partners (the d2/d10 cap
      // family; d11 audits bucket heat) — a batch doc colliding with a
      // mega-cluster still sees the cluster's lowest-id members, which
      // include its canonical representative.
      val base = sigFrame(s, dir)
      val isInc = col("doc_id") % IncrEvery === IncrSlot
      val bands = base.select(col("doc_id"), explode(expr(minhashBandsExpr)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
      val incBands = bands.filter(isInc)
        .select(col("doc_id").as("inc_id"), col("band"), col("band_hash"))
      // ENFORCE the batch-fits-broadcast contract instead of stating it: a
      // batch above the bound would otherwise surface as a driver OOM or
      // an opaque broadcast error mid-plan. One count over the persisted
      // signature frame (batch-side rows only) — metadata-priced next to
      // the admission joins it guards.
      val nIncBands = incBands.count()
      require(nIncBands <= IncrMaxBatchBands,
        s"d16 batch has $nIncBands band rows > $IncrMaxBatchBands (IncrMaxBatchBands): " +
          "the batch exceeds the incremental-admission broadcast bound — " +
          "run d2_minhash_lsh full dedup over the combined corpus instead")
      val corpBuckets = bands.filter(!isInc)
        .groupBy("band", "band_hash")
        .agg(graft.functions.TopKByScore.column(lit(0.0), col("doc_id"), lit(0L), BandMaxBucket)
          .as("members"))
      val corpCand = corpBuckets
        .join(broadcast(incBands), Seq("band", "band_hash"))
        .select(col("inc_id"), explode(col("members")).as("m"))
        .select(col("inc_id"), col("m.id").as("partner_id"), lit("corpus").as("kind"))
      val batchCand = incBands
        .join(broadcast(incBands.select(col("inc_id").as("partner_id"), col("band"), col("band_hash"))),
              Seq("band", "band_hash"))
        .filter(col("partner_id") < col("inc_id"))
        .select(col("inc_id"), col("partner_id"), lit("batch").as("kind"))
      val cand = corpCand.unionByName(batchCand).dropDuplicates("inc_id", "partner_id")
      val incSets = base.filter(isInc)
        .select(col("doc_id").as("inc_id"), col("shingle_set").as("set_i"))
      val ver = base.select(col("doc_id").as("partner_id"), col("shingle_set").as("set_p"))
        .join(broadcast(cand), "partner_id")
        .join(broadcast(incSets), "inc_id")
        .withColumn("inter_cnt", size(array_intersect(col("set_i"), col("set_p"))).cast("long"))
        .withColumn("union_cnt",
          (size(col("set_i")) + size(col("set_p"))).cast("long") - col("inter_cnt"))
        // the d2/d4 dup criterion, float-free: Jaccard ≥ 1/2 ⇔ 2·|∩| ≥ |∪|
        .filter(col("inter_cnt") * 2 >= col("union_cnt"))
      val perDoc = ver.groupBy("inc_id").agg(
        sum(when(col("kind") === "corpus", 1L).otherwise(0L)).as("n_corpus_dups"),
        sum(when(col("kind") === "batch", 1L).otherwise(0L)).as("n_batch_dups"),
        min(col("partner_id")).as("best_match"))
      docs(s, dir).filter(isInc).select(col("doc_id"))
        .join(perDoc.withColumnRenamed("inc_id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("best_match").isNotNull, "reject").otherwise("admit").as("verdict"),
          coalesce(col("n_corpus_dups"), lit(0L)).as("n_corpus_dups"),
          coalesce(col("n_batch_dups"), lit(0L)).as("n_batch_dups"),
          col("best_match"))
    },

    // ---------- INCREMENTAL near-dup over the streamed corpus ----------
    "d12_stream_neardup" -> { (s, dir) =>
      // The corpus replayed as a 3-drop file stream through
      // [[StreamingNearDup.pairs]] (flatMapGroupsWithState band buckets)
      // into a parquet sink — the 100 TB-honest emission path (executor-
      // written files, nothing through the driver), cached per dir like
      // the w2/w3 sinks. The verify run is UNCAPPED (maxBucket = MaxValue):
      // under overflow the streaming cap admits the FIRST arrivals while
      // the batch QUALIFY drops the bucket whole — semantics no batch
      // oracle can reproduce — so the oracle gate checks the exact
      // property that CAN hold at any data (streamed set == batch band
      // join), and the cap path is spec-gated with a planted hot bucket.
      val out = streamSinkFor(s, dir, "") { (src, sink, ckpt) =>
        StreamingNearDup.pairs(src, maxBucket = Int.MaxValue).toDF().writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", sink)
          .outputMode("append").start()
      }
      s.read.parquet(out)
        .select(col("doc_a"), col("doc_b"), col("band").cast("long").as("band"), col("est_permille"))
    },

    // ---------- streaming state-cap audit ----------
    "d12_state_audit" -> { (s, dir) =>
      // d11/d15-style visibility for the STREAMING cap: d12's production
      // path degrades SILENTLY at [[BandMaxBucket]] — a full bucket
      // refuses admissions, so pairs involving refused members are never
      // emitted. This audit replays the SAME 3-drop stream through
      // [[StreamingNearDup.overflow]] at the production cap and folds the
      // per-trigger refusal markers to ONE row next to the batch-side
      // bucket facts. With the TTL off, refusals are ORDER-INDEPENDENT: a
      // bucket with sz arrivals admits min(sz, cap) members whatever the
      // arrival order, so the oracle reproduces the stream's numbers from
      // the batch band frame as greatest(0, sz − cap) — the hash equality
      // PROVES the streaming cap implements exactly that contract, and
      // the degradation (refused members) is a CI-visible number.
      val out = streamSinkFor(s, dir, "#audit") { (src, sink, ckpt) =>
        StreamingNearDup.overflow(src, maxBucket = BandMaxBucket)
          .toDF("band", "band_hash", "refused").writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", sink)
          .outputMode("append").start()
      }
      // explicit schema: a refusal-free corpus leaves the sink empty and
      // schema inference would fail on a metadata-only directory
      val streamAgg = s.read.schema("band INT, band_hash STRING, refused BIGINT").parquet(out)
        .groupBy("band", "band_hash").agg(sum("refused").as("refused"))
        .agg(count(lit(1)).as("n_overflow_buckets_stream"),
             coalesce(sum("refused"), lit(0L)).as("n_refused_stream"))
      val base = sigFrame(s, dir)
      val batchAgg = base.select(explode(expr(minhashBandsExpr)).as("bb"))
        .select(col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
        .groupBy("band", "band_hash").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_buckets"),
             coalesce(sum(when(col("sz") > BandMaxBucket, 1L).otherwise(0L)), lit(0L)).as("n_hot_buckets"),
             coalesce(sum(when(col("sz") > BandMaxBucket, col("sz") - BandMaxBucket).otherwise(lit(0L))), lit(0L)).as("n_refused_expected"))
      batchAgg.crossJoin(streamAgg)
    },

    // ---------- decontamination: eval-set n-gram overlap ----------
    "d9_decontaminate" -> { (s, dir) =>
      // Benchmark decontamination: flag training docs whose bigram sets
      // overlap an eval suite too heavily (here ≥60%, integer test
      // 5·|∩| ≥ 3·|set|). The synthetic eval suite is every 50th doc; a
      // real one is a FIXED-size benchmark, which is why the distinct
      // eval vocabulary is the broadcast side — it stays MBs while the
      // corpus side scales, so the overlap join is a map-side hash probe
      // per posting, no shuffle of the corpus postings at all.
      val base = sigFrame(s, dir)
      val evalVocab = base.filter(col("doc_id") % 50 === 0)
        .select(explode(col("shingle_set")).as("sh")).distinct()
      val train = base.filter(col("doc_id") % 50 =!= 0)
      val matched = train.select(col("doc_id"), explode(col("shingle_set")).as("sh"))
        .join(broadcast(evalVocab), "sh")
        .groupBy("doc_id").agg(count(lit(1)).as("inter_cnt"))
      train.select(col("doc_id"), size(col("shingle_set")).cast("long").as("n_shingles"))
        .join(matched, Seq("doc_id"), "left")
        .withColumn("inter_cnt", coalesce(col("inter_cnt"), lit(0L)))
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("inter_cnt") * 5 >= col("n_shingles") * 3, 1L).otherwise(0L)).as("n_contaminated"),
          sum(col("inter_cnt")).as("sum_overlap"),
          sum(col("n_shingles")).as("sum_shingles"))
    },

    "d18_bloom_decontaminate" -> { (s, dir) =>
      // d9's decontamination re-expressed the way a 100 TB pipeline runs
      // it: the eval suite folds into a FIXED-size Bloom filter
      // ([[BloomBits]] bits, [[BloomHashes]] fnv32 probes per gram)
      // instead of a broadcast vocabulary — 8 KiB regardless of suite
      // size, embedded as a plan literal so the probe is pure map-side
      // set-bit arithmetic over each doc's gram set: no join, no shuffle
      // of the corpus before the per-source rollup. Bloom flags are a
      // SUPERSET of d9's exact flags (false positives only; LlmSpec pins
      // the containment), and bloom_set_bits/fill_permille make filter
      // saturation observable. The filter build collects WORD rows
      // (BloomBits/32 = 2048, bounded by the fixed geometry — a decision
      // value like k-means' convergence bit, NOT corpus-sized state).
      val base = sigFrame(s, dir)
      val nWords = BloomBits / BloomWordBits
      val posExpr = (g: String) =>
        s"transform(sequence(0, ${BloomHashes - 1}), j -> graft_fnv32(concat(cast(j as string), ':', $g)) % $BloomBits)"
      val (bloom, setBits) = bloomCache.getOrElseUpdate(s, dir) {
        val filterRows = base.filter(col("doc_id") % 50 === 0)
          .select(explode(col("shingle_set")).as("g")).distinct()
          .select(explode(expr(posExpr("g"))).as("pos")).distinct()
          .select(expr(s"pos div $BloomWordBits").as("w"),
                  expr(s"shiftleft(1L, cast(pos % $BloomWordBits as int))").as("bit"))
          .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
          .collect()
        val arr = Array.fill(nWords)(0L)
        filterRows.foreach(r => arr(r.getAs[Long]("w").toInt) = r.getAs[Long]("bits"))
        (arr, arr.map(java.lang.Long.bitCount).sum.toLong)
      }
      // ONE Literal node carrying the packed words (typedLit), not a
      // parsed-and-analyzed 2048-element array(...) expression string —
      // probe math identical to the pre-literal SQL form
      val bloomCol  = typedLit(bloom)
      val wordShift = java.lang.Integer.numberOfTrailingZeros(BloomWordBits)
      val positions = (g: org.apache.spark.sql.Column) =>
        transform(sequence(lit(0), lit(BloomHashes - 1)),
          j => call_function("graft_fnv32", concat(j.cast("string"), lit(":"), g)) % lit(BloomBits))
      val hit = (g: org.apache.spark.sql.Column) => forall(positions(g), p =>
        element_at(bloomCol, shiftright(p, wordShift).cast("int") + lit(1))
          .bitwiseAND(call_function("shiftleft", lit(1L), (p % lit(BloomWordBits)).cast("int"))) =!= lit(0L))
      base.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"),
                size(col("shingle_set")).cast("long").as("n_shingles"),
                size(filter(col("shingle_set"), hit)).cast("long").as("bloom_cnt"))
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("bloom_cnt") * 5 >= col("n_shingles") * 3, 1L).otherwise(0L)).as("n_contaminated"),
          sum(col("bloom_cnt")).as("sum_overlap"),
          sum(col("n_shingles")).as("sum_shingles"))
        .withColumn("bloom_set_bits", lit(setBits))
        .withColumn("fill_permille", lit(setBits * 1000L / BloomBits))
    },

    // ---------- dedup clustering: connected components over dup pairs ----------
    "d6_dedup_clusters" -> { (s, dir) =>
      dedupClusters(s, dir).select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
    },

    // ---------- the composed curation pipeline: dedup → canonical → split ----------
    "d7_curation_split" -> { (s, dir) =>
      // What a training-data run actually executes, end to end: near-dup
      // clusters (d6) → keep ONLY each cluster's canonical representative →
      // deterministic stratified train/val/test split (d5) of the
      // survivors. Every stage is individually hash-gated; this gates the
      // COMPOSITION (the join of cluster labels back onto the corpus and
      // the split over the filtered survivor set).
      val canon = dedupClusters(s, dir)
        .filter(col("doc_id") === col("cluster_id"))
        .select("doc_id")
      docs(s, dir)
        .join(canon, "doc_id")
        .withColumn("split", expr(CorpusQueries.splitCaseOf("doc_id")))
        .groupBy("source", "split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    },

    // ---------- dedup: quality-aware canonical selection per cluster ----------
    "d20_cluster_canon" -> { (s, dir) =>
      // d7's admission rule keeps each cluster's MIN doc_id; the policy a
      // production pipeline actually wants is "keep the BEST member" —
      // highest t14 classifier score, doc_id tie-break. One row per
      // NON-SINGLETON cluster: size, the quality-argmax keeper and its
      // score, the min-id policy's score, and whether the two policies
      // agree — the audit that quantifies the quality the min-id rule
      // leaves on the table before a corpus owner switches admission
      // policies.
      // Scale shape: the cluster frame is the shared d6 memo; the score
      // is t14's pure map-side classifier over one corpus scan (shared
      // [[qualityScoreExpr]] — the two operators cannot drift); their
      // join is doc-keyed (one co-partitioned exchange); the rollup is
      // one cluster_id agg whose argmax is a partial-aggregatable
      // min(struct(-score, doc_id)) — no window, integers end to end
      // (scores are token-bounded sums, negation exact).
      graft.functions.GraftFunctions.ensureRegistered(s)
      val scored = docs(s, dir).select(col("doc_id"), expr(qualityScoreExpr).as("score"))
      dedupClusters(s, dir)
        .join(scored, "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
             min(struct((-col("score")).as("ns"), col("doc_id").as("d"))).as("best"),
             max(when(col("doc_id") === col("cluster_id"), col("score"))).as("minid_score"))
        .filter(col("n_members") >= 2)
        .select(col("cluster_id"), col("n_members"),
                col("best.d").as("keep_doc_id"),
                (-col("best.ns")).as("keep_score"),
                col("minid_score"),
                (col("best.d") === col("cluster_id")).as("policies_agree"))
    },

    // ---------- winnowing: rolling k-gram fingerprints (MOSS scheme) ----------
    "t3_winnowing" -> { (s, dir) =>
      // Window of W consecutive k-gram hashes, keep the minimum per window,
      // dedupe — the classic winnowing fingerprint set. Runs over the
      // MATERIALIZED vhash column (sigCache): lambda references to a cached
      // attribute are plain column reads, not re-evaluated expression trees.
      val base = sigFrame(s, dir)
      val W = WinnowWindow
      base
        .withColumn(
          "fp_set",
          expr(s"""CASE WHEN size(vhash) < $W THEN array_distinct(array(array_min(vhash)))
                  |ELSE array_distinct(transform(sequence(1, size(vhash) - $W + 1),
                  |                              i -> array_min(slice(vhash, i, $W))))
                  |END""".stripMargin)
        )
        .select(
          col("doc_id"),
          size(col("vhash")).cast("long").as("n_kgrams"),
          size(col("fp_set")).cast("long").as("n_fingerprints"),
          array_min(col("fp_set")).as("min_fp"),
          array_max(col("fp_set")).as("max_fp")
        )
    },

    // ---------- SimHash fingerprint + exact content fingerprint ----------
    "t2_fingerprint" -> { (s, dir) =>
      // graft_simhash16: one codegen'd pass computing all 16 bit votes —
      // bit-identical to the nested-aggregate SQL the oracle still uses,
      // which re-walked the hash array 16 times through interpreted lambdas.
      docs(s, dir)
        .withColumn("words", expr(wordsExpr))
        .withColumn("simhash16", expr("graft_simhash16(transform(words, w -> md5(w)))"))
        .withColumn("fingerprint", md5(concat_ws(" ", col("words"))))
        .select(col("doc_id"), col("fingerprint"), col("simhash16"))
    },

    // ---------- text analysis: tokens, vocab, stopwords, language, quality ----------
    "t1_text_stats" -> { (s, dir) =>
      // Quality ratios use INTEGER arithmetic (scaled div) so the columns
      // hash-match the oracle exactly — no float ratios in the output.
      docs(s, dir)
        .withColumn("words", expr(wordsExpr))
        .withColumn("n_punct",
          (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long"))
        .select(
          col("doc_id"),
          size(col("words")).cast("long").as("n_words"),
          size(array_distinct(col("words"))).cast("long").as("n_distinct_words"),
          length(col("text")).cast("long").as("n_chars"),
          size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0)")).cast("long").as("n_subword_tokens"),
          size(expr("filter(words, w -> array_contains(array('the','a','of','and','to','in'), w))"))
            .cast("long").as("n_stop_en"),
          size(expr("filter(words, w -> array_contains(array('el','la','de','que','y','un'), w))"))
            .cast("long").as("n_stop_es"),
          col("n_punct"),
          // per-mille stopword density and punctuation density, integer div
          expr("""CASE WHEN size(words) = 0 THEN 0L
                 |ELSE (1000 * size(filter(words, w -> array_contains(array('the','a','of','and','to','in'), w))) +
                 |      1000 * size(filter(words, w -> array_contains(array('el','la','de','que','y','un'), w)))) div size(words)
                 |END""".stripMargin).as("stop_permille"),
          expr("CASE WHEN length(text) = 0 THEN 0L ELSE (1000 * n_punct) div length(text) END").as("punct_permille"),
          // quality verdict: enough words, avg word length sane, not punct soup
          expr("""size(words) >= 5 AND length(text) >= 20
                 |AND (CASE WHEN length(text) = 0 THEN 0L ELSE (1000 * n_punct) div length(text) END) <= 150""".stripMargin)
            .as("quality_ok"),
          // language-ID heuristic: argmax of per-language stopword hits,
          // es wins strictly-greater ties, no hits at all -> 'und'
          expr("""CASE
                 |WHEN size(filter(words, w -> array_contains(array('the','a','of','and','to','in'), w))) = 0
                 | AND size(filter(words, w -> array_contains(array('el','la','de','que','y','un'), w))) = 0 THEN 'und'
                 |WHEN size(filter(words, w -> array_contains(array('el','la','de','que','y','un'), w))) >
                 |     size(filter(words, w -> array_contains(array('the','a','of','and','to','in'), w))) THEN 'es'
                 |ELSE 'en' END""".stripMargin).as("lang_guess")
        )
    },

    // ---------- retrieval: ANN hits joined back to the document store ----------
    // ---------- per-label embedding coherence audit ----------
    "e1_embedding_coherence" -> { (s, dir) =>
      // The curation-side question "does this label hold together in
      // embedding space?" — per-label centroid plus the distribution of
      // each member's cosine to its OWN centroid (a low min or mean flags
      // a polluted label; the audit a labeling pipeline runs next to
      // d13's semantic dedup). Numerics are the shared k-means toolkit:
      // ORDER-INDEPENDENT fixed-point component sums (floor(x·2^20) —
      // both engines derive bit-identical binary64 centroids from
      // identical integer sums) and floor(cos·2^20) integers for the
      // per-member fold — no unordered float aggregation anywhere, so the
      // row set hash-gates. Scale shape: one partial-aggregatable
      // (label, dim) shuffle for the centroids, centroids broadcast back
      // (labels are a bounded dimension), one map-side cosine pass, one
      // label rollup.
      labelScored(s, dir)
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
             sum("cos_fp").as("sum_cos_fp"),
             min("cos_fp").as("min_cos_fp"),
             max("cos_fp").as("max_cos_fp"))
    },

    // ---------- embedding audit: per-label outlier flagging ----------
    "e2_embedding_outliers" -> { (s, dir) =>
      // e1's question sharpened to the actionable row: WHICH vectors drag
      // a label down — the mislabeled-example audit an embedding-training
      // pipeline runs before contrastive fine-tuning. A vector is an
      // outlier when its centroid cosine falls below
      // [[OutlierPermille]]‰ of its label's MEAN centroid cosine
      // (mean_fp = sum div n, floored — the comparison
      // cos_fp·1000 < ‰·mean_fp keeps every product inside a long at any
      // corpus size; the band presumes coherent labels, mean > 0 — the
      // e1 audit upstream). Worst offender per label is the min(struct)
      // argmin. Plan: the label-stats frame is labels-bounded and
      // broadcasts back onto the scored scan (two narrow embedding
      // passes); everything else is the e1 toolkit, integer end to end.
      val scored = labelScored(s, dir)
      val stats = scored.groupBy("label")
        .agg(expr("sum(cos_fp) div count(1)").as("mean_fp"))
      scored.join(broadcast(stats), "label")
        .withColumn("is_out",
          col("cos_fp") * 1000 < lit(OutlierPermille) * col("mean_fp"))
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
             sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
             min(struct(col("cos_fp"), col("vec_id"))).as("worst"),
             min(col("mean_fp")).as("mean_fp"))
        .select(col("label"), col("n_vecs"), col("n_outliers"),
                col("worst.cos_fp").as("worst_cos_fp"),
                col("worst.vec_id").as("worst_vec_id"), col("mean_fp"))
    },

    // ---------- embedding audit: SQ reconstruction fidelity per label ----------
    "e3_quantization_error" -> { (s, dir) =>
      // The recall ladders say WHERE the SQ8 index ranks diverge; this
      // audits WHY — the reconstruction fidelity itself. Each vector is
      // de-quantized from its own 1-byte codes ([[sqIndex]]'s sidecar,
      // the exact expression ann_sq_topk scores with) and scored against
      // its full-precision self as floor(cos·2^20); per label: the
      // floored mean, the worst member, and its id — what a quantization
      // owner reads before trading the SQ scan for PQ's coarser codes.
      // Reconstruction cosine is positive by construction (midpoint
      // error per dimension is < the observed corpus range / 255, far
      // under a unit vector's norm), so the floored integer mean agrees
      // across engines. Plan: codes join back to vectors on the shared
      // vec_id partitioning, mm broadcasts, one label rollup — integer
      // outputs end to end.
      val e = emb(s, dir)
      val (mm, codes) = sqIndex(s, dir)
      codes.join(e, "vec_id").crossJoin(broadcast(mm))
        .withColumn("xhat", expr(
          """transform(code, (c, d) ->
            |  CASE WHEN mm[d].mx = mm[d].mn THEN mm[d].mn
            |       ELSE mm[d].mn + ((CAST(c AS DOUBLE) + 128.0D) + 0.5D) * (mm[d].mx - mm[d].mn) / 255.0D
            |  END)""".stripMargin))
        .withColumn("cos_fp", expr(
          s"cast(floor((${dot("v", "xhat")} / (sqrt(${dot("v", "v")}) * sqrt(${dot("xhat", "xhat")}))) * 1048576) as bigint)"))
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
             expr("sum(cos_fp) div count(1)").as("avg_cos_fp"),
             min(struct(col("cos_fp"), col("vec_id"))).as("worst"))
        .select(col("label"), col("n_vecs"), col("avg_cos_fp"),
                col("worst.cos_fp").as("worst_cos_fp"),
                col("worst.vec_id").as("worst_vec_id"))
    },

    // ---------- embedding audit: PQ reconstruction fidelity per label ----------
    "e4_pq_error" -> { (s, dir) =>
      // e3's audit for the PQ codes: each vector reconstructed from its
      // own cell centroid + 5-bit-per-subspace RESIDUAL codes via the
      // broadcast packed codebook (the exact [[pqDecode]] expression
      // ann_pq_topk scores with), cosine to its full-precision self as
      // floor(cos·2^20). PQ's coarser codes are WHY its refine cut is 6×
      // deeper than SQ's — e3/e4 side by side quantify the fidelity
      // trade the recall ladders only imply. Same shape as e3: codes
      // join back on vec_id, codebook broadcasts, one label rollup,
      // integers out.
      val e = emb(s, dir)
      val (bkm, codes) = pqIndex(s, dir)
      val (cents, _)   = ivfIndex(s, dir)
      pqDecode(codes, bkm, cents).join(e, "vec_id")
        .withColumn("cos_fp", expr(
          s"cast(floor((${dot("v", "xhat")} / (sqrt(${dot("v", "v")}) * sqrt(xn2))) * 1048576) as bigint)"))
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
             expr("sum(cos_fp) div count(1)").as("avg_cos_fp"),
             min(struct(col("cos_fp"), col("vec_id"))).as("worst"))
        .select(col("label"), col("n_vecs"), col("avg_cos_fp"),
                col("worst.cos_fp").as("worst_cos_fp"),
                col("worst.vec_id").as("worst_vec_id"))
    },

    // ---------- embedding audit: refresh-drift monitor ----------
    "e5_embedding_drift" -> { (s, dir) =>
      // Did the embedding distribution MOVE between two corpus slices
      // (vec_id parity stands in for yesterday's index vs today's
      // refresh)? The audit a production pipeline runs before swapping an
      // index: per label, the cosine between the two slices' centroids
      // (direction drift) and the floored per-slice mean vector norm
      // (magnitude drift, which the cosine is blind to). Numerics are the
      // e1 toolkit — order-independent fixed-point component sums give
      // bit-identical binary64 centroids on both engines; norms enter as
      // per-row floor(|v|·2^20) integers, so everything hash-gates.
      // Scale shape: one (label, slice, dim) partial-aggregatable
      // shuffle + a labels-bounded re-pack for the centroids; norms fold
      // through one (label) rollup; the final joins are labels-bounded
      // broadcasts.
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = emb(s, dir).withColumn("slice", pmod(col("vec_id"), lit(2L)))
      val cents = e.select(col("label"), col("slice"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "slice", "pos")
        .agg(sum(expr("cast(floor(x * 1048576) as bigint)")).as("s"), count(lit(1)).as("n"))
        .groupBy("label", "slice")
        .agg(expr("array_sort(collect_list(named_struct('pos', pos, 's', s, 'n', n)))").as("pc"))
        .select(col("label"), col("slice"),
          expr("transform(pc, p -> cast(p.s as double) / (cast(p.n as double) * 1048576.0D))").as("cv"))
      val ca = cents.filter(col("slice") === 0).select(col("label"), col("cv").as("ca"))
      val cb = cents.filter(col("slice") === 1).select(col("label"), col("cv").as("cb"))
      e.withColumn("norm_fp", expr(s"cast(floor(sqrt(${dot("v", "v")}) * 1048576) as bigint)"))
        .groupBy("label")
        .agg(
          sum(when(col("slice") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("slice") === 1, 1L).otherwise(0L)).as("n_b"),
          expr("sum(CASE WHEN slice = 0 THEN norm_fp ELSE 0L END) div greatest(sum(CASE WHEN slice = 0 THEN 1L ELSE 0L END), 1L)").as("avg_norm_fp_a"),
          expr("sum(CASE WHEN slice = 1 THEN norm_fp ELSE 0L END) div greatest(sum(CASE WHEN slice = 1 THEN 1L ELSE 0L END), 1L)").as("avg_norm_fp_b"))
        .join(broadcast(ca), "label")
        .join(broadcast(cb), "label")
        .select(col("label").cast("long").as("label"), col("n_a"), col("n_b"),
          expr(s"cast(floor((${cosSim("ca", "cb")}) * 1048576) as bigint)").as("drift_cos_fp"),
          col("avg_norm_fp_a"), col("avg_norm_fp_b"))
    },

    // ---------- hybrid retrieval: lexical + dense, RRF-fused ----------
    "r2_hybrid_retrieve" -> { (s, dir) =>
      // The production RAG retriever shape: a BM25-backbone lexical
      // ranking and the dense IVF ranking fused by Reciprocal Rank
      // Fusion (Cormack et al. 2009, public). Everything is
      // integer-exact so the row set hash-gates:
      //  - lexical score = Σ over DISTINCT shared terms of idf_bits(w) =
      //    [[RrfIdfScale]] − bits(df_w) (t16's power-of-two log; the
      //    constant plays bits(N)'s role so no corpus-count job runs) —
      //    BM25's idf backbone without the float k1/b terms;
      //  - RRF = 1000000 div ([[RrfK]] + rank), summed over the arms a
      //    doc appears in.
      // Plan shape: the query vocabulary (NumQueries docs' distinct
      // words) rides BROADCASTS — first onto the term-df frame, then
      // onto the corpus postings (the d9 probe: postings never shuffle
      // for it); per-(q, doc) idf sums fold through ONE doc-keyed agg
      // and the bounded graft_topk cut; the dense arm is the recorded
      // ivf probe-2 plan; fusion touches only the two queries×k hit
      // lists (tiny) and re-cuts with graft_topk.
      val posts = docs(s, dir)
        .select(col("doc_id"), explode(array_distinct(expr(wordsExpr))).as("w"))
      val qterms = posts.filter(col("doc_id") < NumQueries)
        .select(col("doc_id").as("q_id"), col("w"))
      // §3.2 semi-join pre-filter (round 22): df is only ever read for
      // words in the QUERY vocabulary (the groupBy's output joins straight
      // onto broadcast(qterms)), yet the aggregation used to shuffle one
      // partial count per (distinct word × map partition) — the ENTIRE
      // corpus vocabulary. Dropping non-query words with a broadcast
      // inner join BEFORE the exchange leaves each surviving word's count
      // untouched (df = posts rows per word, and the filter is on the
      // grouping key itself) while the df exchange shrinks from corpus-
      // vocabulary-sized to query-vocabulary-sized (NumQueries docs'
      // distinct words — broadcast-bounded at any corpus scale).
      val qv = qterms.select("w").distinct()
      // The filtered postings are read TWICE (df fold below, scoring join
      // after) — memoize-persist them ([[qpostsCache]]) so one corpus
      // tokenize serves both reads and every warm rep.
      val qposts = qpostsCache.getOrElseUpdate(s, dir)(
        posts.join(broadcast(qv), "w")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val qw = qposts
        .groupBy("w").agg(count(lit(1)).as("df"))
        .join(broadcast(qterms), "w")
        .withColumn("idf_bits", expr(s"${RrfIdfScale}L - cast(length(bin(df)) as bigint)"))
        .select("q_id", "w", "idf_bits")
      val lexTop = topkPerQuery(
        qposts.join(broadcast(qw), "w")
          .filter(col("doc_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("doc_id"))
          .agg(sum("idf_bits").as("lex"))
          .select(col("q_id"), col("lex").cast("double").as("sim"), col("doc_id").as("vec_id")),
        TopK)
        .select(col("q_id"), col("rank").as("lex_rank"), col("neighbor_id"))
      val vecTop = ivfProbeAt(s, dir, IvfProbes)
        .select(col("q_id"), col("rank").as("vec_rank"), col("neighbor_id"))
      val fused = lexTop.join(vecTop, Seq("q_id", "neighbor_id"), "full_outer")
        .withColumn("rrf", expr(
          s"coalesce(1000000L div (${RrfK}L + lex_rank), 0L) + coalesce(1000000L div (${RrfK}L + vec_rank), 0L)"))
      topkPerQuery(
        fused.select(col("q_id"), col("rrf").cast("double").as("sim"),
                     col("neighbor_id").as("vec_id"), col("rrf")),
        TopK, col("rrf"))
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("payload").as("rrf"))
    },

    "r1_rag_retrieve" -> { (s, dir) =>
      // The RAG-shaped read: top-k in embedding space, then the hit list
      // joined back to the corpus for the documents themselves. The hit
      // list is queries×k rows — IT broadcasts; the document store is the
      // fact side and never shuffles for the join (at 100 TB the corpus
      // lookup is a broadcast-hash probe per scan partition, exactly like
      // d9's eval vocabulary).
      val hits = queries("ann_topk_brute")(s, dir)
      docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
        .join(broadcast(hits), col("doc_id") === col("neighbor_id"))
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("source"), col("n_chars"))
    },

    // ---------- retrieval: Rocchio pseudo-relevance feedback ----------
    "r7_rocchio_prf" -> { (s, dir) =>
      // Rocchio PRF (Rocchio 1971 — the classic query-refinement loop):
      // the first-pass top-K hits are ASSUMED relevant, their mean pulls
      // the query toward the relevant region (α=β=1), and the shifted
      // query re-retrieves. Each feedback-pass hit carries its FIRST-pass
      // rank (0 = newly surfaced) — the reorder/drift signal a retrieval
      // owner reads before enabling PRF in production.
      // Parity/scale shape: the feedback mean folds through
      // ORDER-INDEPENDENT fixed-point component sums (floor(x·2^20)
      // longs — both engines derive bit-identical binary64 feedback
      // vectors, the e1/IVF centroid discipline); the query-side frames
      // (hits, shifted queries) are NumQueries-bounded and broadcast on
      // both passes; corpus work is two brute scans with bounded partial
      // top-k — no corpus window, no all-pairs.
      import s.implicits._
      val e = emb(s, dir)
      // The first pass feeds BOTH the feedback fold and the drift join:
      // referenced lazily twice it would embed the brute corpus scan
      // twice in the plan, so collect its bounded result once
      // (NumQueries × TopK rows — the r3/compaction decision-values
      // discipline), memoized per session so plan inspection and warm
      // reps never re-run the scan, and fan the local frame out.
      val first = rocchioFirstCache.getOrElseUpdate(s, dir) {
        queries("ann_topk_brute")(s, dir)
          .select(col("q_id"), col("rank"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      }.toDF("q_id", "rank", "neighbor_id")
      val fb = first
        .join(e.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
        .select(col("q_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("q_id", "pos")
        .agg(sum(expr("cast(floor(x * 1048576) as bigint)")).as("fs"), count(lit(1)).as("n"))
        .groupBy("q_id")
        .agg(expr("array_sort(collect_list(named_struct('pos', pos, 's', fs, 'n', n)))").as("pc"))
        .select(col("q_id"),
          expr("transform(pc, p -> cast(p.s as double) / (cast(p.n as double) * 1048576.0D))").as("fv"))
      val q2 = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
        .join(fb, "q_id")
        .select(col("q_id"), expr("zip_with(qv, fv, (a, b) -> a + b)").as("qv"))
      val rescored = e.withColumn("vn2", expr(dot("v", "v"))).crossJoin(broadcast(q2))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          expr(s"${dot("v", "qv")} / (sqrt(vn2) * sqrt(${dot("qv", "qv")}))"))
      topkPerQuery(rescored, TopK)
        .join(broadcast(first.select(col("q_id"), col("neighbor_id"), col("rank").as("_fr"))),
              Seq("q_id", "neighbor_id"), "left")
        .select(col("q_id"), col("rank"), col("neighbor_id"),
                coalesce(col("_fr"), lit(0L)).as("first_rank"))
    },

    // ---------- retrieval: MMR-diversified rerank over ANN candidates ----------
    "r3_mmr_rerank" -> { (s, dir) =>
      // Maximal Marginal Relevance (Carbonell & Goldstein 1998, public):
      // rerank each query's relevance top-C so the K results trade
      // relevance against redundancy — round i picks
      // argmax(λ·rel − (1−λ)·max sim to already-selected), λ = 0.5.
      //
      // Distributed shape: the scale-bearing work is candidate
      // generation — the ann_topk_brute plan (broadcast query set,
      // bounded two-phase top-C cut) — plus the candidate relevance and
      // candidate×candidate sim frames, all bounded by construction at
      // queries × C². The greedy K-step selection over those bounded
      // numbers is a decision value (the compaction-candidate
      // discipline): the driver sees C rels + C² sims per query, never
      // corpus rows, and every double it compares was computed by the
      // SAME engine expressions the oracle twin uses (sequential
      // graft_dot ↔ list_inner_product), so the selection is
      // bit-reproducible across engines.
      val (rel, pairs) = mmrCandidateFrames(s, dir)
      val out = mmrSelect(collectMmrRels(rel), collectMmrSims(pairs))
        .map { case (q, rank, v) => org.apache.spark.sql.Row(q, rank, v) }
      val st = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType)))
      s.createDataFrame(scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava, st)
    },

    // ---------- retrieval: hard-negative mining for embedding training ----------
    "r4_hard_negatives" -> { (s, dir) =>
      // Contrastive-training hard negatives (the DPR/SimCSE mining step,
      // public): for each anchor, the corpus vectors MOST similar to it
      // whose label differs — the near-miss examples a contrastive loss
      // learns the most from. The plan is ann_topk_brute with the label
      // inequality fused into the same broadcast-scored scan (the filter
      // runs before the bounded per-query top-k cut, so mislabeled
      // lookalikes never occupy candidate slots), and the negative's
      // label rides the payload long — no join-back to recover it.
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
                col("v").as("qv"))
      val scored = e.withColumn("vn2", expr(dot("v", "v"))).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
        .withColumn(
          "sim",
          expr(s"${dot("v", "qv")} / (sqrt(vn2) * sqrt(${dot("qv", "qv")}))"))
      topkPerQuery(scored, TopK, col("label").cast("long"))
        .select(col("q_id"), col("rank"), col("neighbor_id"),
                col("payload").as("neighbor_label"))
    },

    // ---------- retrieval: margin-based bitext mining (cell-local) ----------
    "r5_bitext_mining" -> { (s, dir) =>
      // Margin-based parallel-pair mining (Artetxe & Schwenk 2019 — the
      // LASER/CCMatrix alignment step, public): two corpus "sides" (even
      // vs odd label standing in for the two languages), candidates
      // restricted to mutual nearest neighbors, scored by the RATIO
      // margin — cos(x, y) normalized by the mean similarity of each
      // endpoint's top-[[BitextK]] neighborhood — so generically-central
      // vectors don't flood the mined set.
      //
      // Distributed shape: candidates are CELL-LOCAL over the shared
      // trained IVF index (the d13 discipline — ONE bounded join on the
      // cell key, occupancy follows the √N rule; this is exactly how the
      // production pipelines shard the FAISS search). Each side's
      // neighborhood folds through the bounded partial graft_topk; the
      // mutual-NN join touches two narrow per-id summary frames; no
      // windows, no corpus-wide shuffle beyond the cell join. Integer-
      // exact: sims enter as 1 + floor((1+cos)·2^20) — strictly positive
      // fixed-point longs (exactly representable as the topk ordering
      // doubles; the shift keeps every denominator off zero and the
      // integer division positive-only, where Spark's truncating div and
      // DuckDB's flooring // agree) — so the mined rows hash-gate.
      val (_, assigned) = ivfIndex(s, dir)
      val lab = emb(s, dir).select(col("vec_id"), col("label"))
      val sided = assigned.join(lab, "vec_id")
      val a = sided.filter(col("label") % 2 === 0)
        .select(col("vec_id").as("a_id"), col("v").as("av"), col("centroid_id").as("cell"))
      val b = sided.filter(col("label") % 2 === 1)
        .select(col("vec_id").as("b_id"), col("v").as("bv"), col("centroid_id").as("cell"))
      bitextMine(a, b)
    },

    // ---------- streaming bitext: per-refresh mining of arriving shards ----------
    "w6_stream_bitext" -> { (s, dir) =>
      // The sink accumulated by the 3-drop streaming pass (see
      // [[streamBitextSink]]): each arriving shard was admitted to the
      // trained cells map-side and mined r5-style against the static even
      // side. The oracle rebuilds every per-shard mining pass from the
      // same trained chain, so a dropped shard, a wrong cell assignment,
      // or drifted margin arithmetic all hash-fail.
      s.read.parquet(streamBitextSink(s, dir))
        .select(col("drop_id"), col("a_id"), col("b_id"), col("cell"), col("margin_permille"))
    },
    "w7_stream_quality_gate" -> { (s, dir) =>
      // Per-(refresh, source) pass rates from the streamed QA sink — the
      // oracle recomputes every shard's rollup from the raw corpus with
      // the same shared scorer, so a skipped shard, a drifted score, or a
      // lost rollup row all hash-fail.
      s.read.parquet(streamQualitySink(s, dir))
        .select(col("drop_id"), col("source"), col("n_docs"), col("n_keep"), col("sum_score"))
    },
    "w6_mining_audit" -> { (s, dir) =>
      // Per-refresh completeness audit (the d12-audit discipline for a
      // STATELESS streaming pass: nothing keyed to cap, so the gate is
      // that every staged shard was mined and its cell fan-out is sane):
      // batch sizes derive from the corpus arithmetic, mined counts from
      // the sink — a silently skipped refresh shows as n_mined=0 against
      // a nonzero n_batch.
      val mined = s.read.parquet(streamBitextSink(s, dir))
        .groupBy("drop_id")
        .agg(count(lit(1)).as("n_mined"), countDistinct(col("cell")).as("n_cells"))
      emb(s, dir).filter(col("label") % 2 === 1)
        .groupBy(pmod(col("vec_id"), lit(3L)).as("drop_id"))
        .agg(count(lit(1)).as("n_batch"))
        .join(mined, Seq("drop_id"), "left")
        .select(col("drop_id"), col("n_batch"),
          coalesce(col("n_mined"), lit(0L)).as("n_mined"),
          coalesce(col("n_cells"), lit(0L)).as("n_cells"))
    },

    // ---------- retrieval: label-relevance evaluation of the top-k ----------
    "r6_retrieval_eval" -> { (s, dir) =>
      // The eval harness a retrieval deployment runs after every index
      // build: treat the query's label as the relevance oracle and score
      // the brute top-K per query — precision@K and the reciprocal rank
      // of the first relevant hit, both integer-scaled (permille / ppm)
      // so the rows hash-gate. Plan shape: the hit list is queries×K —
      // it BROADCASTS into the corpus label frame (the r1 lookup
      // discipline, the corpus never shuffles for it); everything after
      // is per-query arithmetic over ≤ K rows.
      val hits = queries("ann_topk_brute")(s, dir)
      val lab  = emb(s, dir).select(col("vec_id"), col("label"))
      val qlab = lab.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"))
      lab.join(broadcast(hits), col("vec_id") === col("neighbor_id"))
        .join(broadcast(qlab), "q_id")
        .withColumn("rel", (col("label") === col("q_label")).cast("long"))
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("k"),
             sum(col("rel")).as("n_relevant"),
             min(when(col("rel") === 1L, col("rank"))).as("first_rel"))
        .select(col("q_id"),
          col("n_relevant"),
          expr("(1000 * n_relevant) div k").as("p_at_k_permille"),
          coalesce(col("first_rel"), lit(0L)).as("first_rel_rank"),
          coalesce(expr("1000000 div first_rel"), lit(0L)).as("rr_ppm"))
    },

    // ---------- ANN: exact brute-force top-k (broadcast query set) ----------
    "ann_topk_brute" -> { (s, dir) =>
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      // Broadcast the (tiny) query set against the (huge) corpus: each
      // corpus partition scores locally; the only shuffle is the final
      // per-query top-k, folded through the bounded partial aggregate
      // (TakeOrdered shape) — the legitimate 100 TB brute-force plan:
      // no all-pairs crossJoin, and no full-corpus window on q_id.
      // corpus-vector norm hoisted ABOVE the query join (round 22): vn2
      // depends only on v, so it computes once per vector instead of once
      // per (vector, query) pair — same doubles, half the scoring dots.
      val scored = e.withColumn("vn2", expr(dot("v", "v"))).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn(
          "sim",
          expr(s"${dot("v", "qv")} / (sqrt(vn2) * sqrt(${dot("qv", "qv")}))")
        )
      topkPerQuery(scored, TopK).select("q_id", "rank", "neighbor_id")
    },

    // ---------- ANN: random-hyperplane LSH buckets, bucket-local NN ----------
    "ann_lsh_nn" -> { (s, dir) =>
      // Bucket-local candidates from the SHARED [[lshBucketed]] /
      // [[bucketLocalPairs]] generator (plane count derived from corpus
      // size, occupancy bounded as the corpus grows), then each vector's
      // nearest in-bucket neighbor as a partial-aggregatable max_by over
      // the UNIQUE (sim, -o_id) key — map-side combine to one row per
      // (task, vec_id), no window shuffle+sort of the pair frame, same
      // tie-break as the oracle's row_number (sim desc, o_id asc).
      bucketLocalPairs(lshBucketed(s, dir))
        .withColumn("sim", expr(pairSimExpr))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("bucket").cast("long").as("bucket"), col("o_id").as("nn_id")),
                    struct(col("sim").as("s"), (-col("o_id")).as("neg_id"))).as("best"))
        .select(col("vec_id"), col("best.bucket").as("bucket"), col("best.nn_id").as("nn_id"))
    },

    // ---------- embedding-cosine near-dup (bucket-local, thresholded) ----------
    "d3_embedding_neardup" -> { (s, dir) =>
      // Near-duplicate detection in EMBEDDING space: MULTI-TABLE
      // hyperplane-LSH ([[lshTabled]] — [[LshTables]] independent plane
      // sets, candidates share a bucket in ANY table), cosine >= threshold
      // as the dup criterion, then a d1-style single-hop canonical
      // assignment (smallest qualifying vec_id wins). Candidates stay
      // bucket-local (ONE shuffle on the (table, bucket) key — d2's band
      // shape — never all-pairs); partners are counted DISTINCT because a
      // pair can agree in several tables. The reported `bucket` is the
      // table-0 bucket — the same planes as the single-table operator. No
      // floats in the output — counts and ids only, so the row set
      // hash-matches the oracle exactly.
      //
      // DELIBERATELY no [[BandMaxBucket]]-style drop-cap here: dropping a
      // hot bucket would silently lose near-dups — the very rows this
      // query exists to report (multi-table recovery softens but doesn't
      // void that: all L tables can be hot for a viral vector). Bucket
      // size is controlled by the OTHER knob: the per-table plane count
      // ([[hyperplanesFor]]), scaled with corpus size so expected
      // occupancy stays bounded.
      val tau = 0.8
      val b = lshTabled(s, dir)
      val dups = lshTablePairs(b)
        .filter(expr(s"$pairSimExpr >= $tau"))
        .groupBy(col("vec_id"))
        .agg(min(col("o_id")).as("min_partner"),
             countDistinct(col("o_id")).as("n_neardups"))
      b.select(col("vec_id"), col("bucket").cast("long").as("bucket"))
        .join(dups, Seq("vec_id"), "left")
        .select(
          col("vec_id"),
          col("bucket"),
          least(col("vec_id"), coalesce(col("min_partner"), col("vec_id"))).as("canonical_id"),
          coalesce(col("n_neardups"), lit(0L)).as("n_neardups"))
    },

    // ---------- semantic dedup: cluster-then-cosine (SemDeDup) ----------
    "d13_semdedup" -> { (s, dir) =>
      // SemDeDup (Abbas et al. 2023, public): k-means-cluster the
      // embedding space, then call any within-cluster pair above a cosine
      // threshold a SEMANTIC duplicate — catches paraphrases and
      // re-encodings that shingle/LSH dedup (d2/d3/d10) can miss because
      // the clusters are TRAINED on the data rather than sliced by random
      // hyperplanes. Reuses the shared [[ivfIndex]] (√N cells, fixed-point
      // deterministic Lloyd's) so the ANN family and the dedup family
      // literally share one index build; candidates are cell-local with
      // top-[[SemDeDupProbes]] multi-probe ([[semProbePairs]] — the
      // paper's O(N²/k) within-cluster pairwise at P× the volume,
      // extended by each vector's P−1 next-nearest cells so
      // boundary-straddling dups are found; recall curve at the
      // constant), canonical = smallest qualifying vec_id,
      // counts-and-ids-only output so the row set hash-matches the
      // oracle exactly.
      val tau = 0.8
      val (_, assigned) = ivfIndex(s, dir)
      val dups = semProbePairs(s, dir)
        .filter(expr(s"$pairSimExpr >= $tau"))
        .groupBy(col("vec_id"))
        .agg(min(col("o_id")).as("min_partner"), count(lit(1)).as("n_semdups"))
      assigned.select(col("vec_id"), col("centroid_id").cast("long").as("centroid_id"))
        .join(dups, Seq("vec_id"), "left")
        .select(
          col("vec_id"),
          col("centroid_id"),
          least(col("vec_id"), coalesce(col("min_partner"), col("vec_id"))).as("canonical_id"),
          coalesce(col("n_semdups"), lit(0L)).as("n_semdups"))
    },

    // ---------- IVF/SemDeDup cell-occupancy audit ----------
    "d15_cell_skew_audit" -> { (s, dir) =>
      // d11-style visibility for the trained-cell family (d13 + the IVF
      // ANN queries): per-cell occupancy folded to ONE row — cell count,
      // corpus size, the largest cell, and the cells (and rows) above 4×
      // the mean occupancy, i.e. exactly where d13's within-cell O(sz²)
      // pair pass concentrates at scale. One partial-aggregatable shuffle
      // over the SHARED cached assignment (no rebuild); the hot test is
      // INTEGER-ONLY (sz·nc > 4·N — no float division for the oracle to
      // disagree on, nc = the derived [[centroidsFor]] knob).
      val (_, assigned) = ivfIndex(s, dir)
      val n  = embCount(s, dir)
      val nc = centroidsFor(n)
      assigned.groupBy(col("centroid_id")).agg(count(lit(1)).as("sz"))
        .agg(
          count(lit(1)).as("n_cells"),
          coalesce(sum(col("sz")), lit(0L)).as("n_vectors"),
          coalesce(max(col("sz")), lit(0L)).as("max_cell"),
          coalesce(sum(when(col("sz") * nc > n * 4L, 1L).otherwise(0L)), lit(0L)).as("n_hot_cells"),
          coalesce(sum(when(col("sz") * nc > n * 4L, col("sz")).otherwise(lit(0L))), lit(0L)).as("n_hot_rows"))
    },

    // ---------- ANN: IVF — k-means-trained cells, probe=1 ----------
    "ann_ivf_probe" -> { (s, dir) =>
      // Probe=1: a query scores ONLY its own cell. Training + assignment
      // are memoized per dir (see ivfIndex) and shared with probe-2.
      val (_, assigned) = ivfIndex(s, dir)
      val q = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("centroid_id"))
      // cell-local scoring, then the bounded two-phase top-k (the cell scan
      // is N/centroids rows per query — a window on q_id over it would
      // shuffle all of that onto |queries| tasks; the aggregate keeps the
      // exchange at tasks × queries × k rows). The matched cell id rides
      // the payload slot.
      val scored = assigned.join(broadcast(q), "centroid_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", expr(s"${dot("v", "qv")} / (sqrt(${dot("v", "v")}) * sqrt(${dot("qv", "qv")}))"))
      topkPerQuery(scored, 3, col("centroid_id").cast("long"))
        .select(col("q_id"), col("rank"), col("neighbor_id"),
                col("payload").as("centroid_id"))
    },

    // ---------- ANN: IVF — multi-probe (probe=2) ----------
    "ann_ivf_probe2" -> { (s, dir) =>
      // The standard recall lever: each query searches its TOP-2 nearest
      // cells instead of one, catching neighbors that fell just across a
      // cell boundary. Candidates stay cell-local (2 cells/query — the
      // scored set merely doubles); probe selection is a broadcast(k)
      // ranking, so the plan shape is unchanged at corpus scale. The
      // parametric [[ivfProbeAt]] carries the plan; Bench sweeps it over
      // probes 1..4 for the recall curve.
      ivfProbeAt(s, dir, IvfProbes)
    },

    // ---------- ANN: incremental admission — add a batch to the TRAINED index ----------
    "ann_incremental_add" -> { (s, dir) =>
      // d16's admission discipline applied to the ANN family (the
      // production FAISS `add` path): a NEW vector batch joins the index
      // WITHOUT retraining — each arriving vector is assigned to its
      // nearest TRAINED cell ([[incrementalAssigned]]: broadcast
      // centroids, map-side argmax, the batch never shuffles) — and the
      // audit reports per-cell occupancy drift, the signal a deployment
      // watches to decide when accumulated drift warrants a re-train.
      // Scale shape: the only exchanges are the two bounded (≤ cells)
      // occupancy rollups; their join is cell-keyed over ≤ cells rows.
      // Integer counts + permille end to end, so the row set hash-gates
      // against the oracle's independently trained k-means chain.
      val (_, assigned) = ivfIndex(s, dir)
      val before = assigned.groupBy(col("centroid_id").cast("long").as("centroid_id"))
        .agg(count(lit(1)).as("n_before"))
      val added = incrementalAssigned(s, dir)
        .groupBy(col("centroid_id").cast("long").as("centroid_id"))
        .agg(count(lit(1)).as("n_added"))
      before.join(added, Seq("centroid_id"), "full_outer")
        .select(col("centroid_id"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_added"), lit(0L)).as("n_added"))
        .withColumn("n_after", col("n_before") + col("n_added"))
        .withColumn("drift_permille", expr("(1000 * n_added) div greatest(n_before, 1L)"))
    },

    // ---------- ANN: int8 scalar quantization + exact re-rank ----------
    "ann_sq_topk" -> { (s, dir) =>
      // SQ8: each dimension is affinely mapped to an int8 code using the
      // CORPUS per-dimension min/max. At 100 TB the win is the scan, not
      // the math: the candidate pass scans the MATERIALIZED codes index
      // (1 byte/dim — [[sqIndex]], the sidecar a deployment keeps next to
      // the vectors; 4-8x less IO than float/double vectors) and ONLY the
      // SqCandidates survivors — NumQueries x SqCandidates rows, bounded —
      // are joined back to full-precision vectors for the exact re-rank,
      // as a broadcast of the survivor keys so the corpus never shuffles.
      // Scoring is ASYMMETRIC (the ADC of the SQ/PQ literature): the code
      // is de-quantized to the cell midpoint and scored against the FULL
      // precision query vector — code-vs-code dot is not monotone with
      // the true inner product under per-dimension affine coding.
      val e = emb(s, dir)
      val (mm, codes) = sqIndex(s, dir)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      // de-quantize ON TOP of the 1-byte scan: (stored + 128) recovers the
      // 0..255 cell, midpoint arithmetic bit-identical to coding from v.
      // The candidate cut is the bounded two-phase top-k aggregate — the
      // codes scan never shuffles onto q_id; only ≤ tasks × queries ×
      // SqCandidates partial survivors do; [[exactRerank]] ranks the
      // BOUNDED survivor set (queries × SqCandidates rows) — fine at
      // any scale.
      // de-quantize ONCE per vector (round 22 — the pqTopkAt discipline):
      // xhat and its norm depend only on (code, mm), so both compute
      // BEFORE the query cross join; the old order re-ran the 64-lambda
      // decode and its norm NumQueries times per vector. Same doubles —
      // the reused xhat/xn2 are the identical expressions evaluated once.
      val decoded = codes.crossJoin(broadcast(mm))
        .withColumn("xhat", expr(
          """transform(code, (c, d) ->
            |  CASE WHEN mm[d].mx = mm[d].mn THEN mm[d].mn
            |       ELSE mm[d].mn + ((CAST(c AS DOUBLE) + 128.0D) + 0.5D) * (mm[d].mx - mm[d].mn) / 255.0D
            |  END)""".stripMargin))
        .withColumn("xn2", expr(dot("xhat", "xhat")))
      val scoredCodes = decoded.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", expr(s"${dot("xhat", "qv")} / (sqrt(xn2) * sqrt(${dot("qv", "qv")}))"))
      val cands = topkPerQuery(scoredCodes, SqCandidates)
        .select(col("q_id"), col("neighbor_id").as("vec_id"))
        .join(broadcast(q), "q_id")
      exactRerank(e, cands)
    },

    // ---------- ANN: product quantization — 5-bit-per-subspace codes ----------
    "ann_pq_topk" -> { (s, dir) =>
      // PQ (the FAISS workhorse): the candidate pass scans the PqM-small-
      // int codes sidecar ([[pqIndex]] — 8×5 bits per vector vs 64 bytes
      // for SQ8), reconstructs each candidate from the BROADCAST packed
      // codebook inside the scoring expression (bkm[m][code[m]] — no join,
      // no decoded frame materialized), and scores the reconstruction
      // against the full-precision query (asymmetric ADC, scored as ONE
      // sequential 64-dim dot so the DuckDB twin is bit-identical). The
      // bounded graft_topk cut keeps PqCandidates per query (a 6× deeper
      // refine cut than SQ8 — 5-bit codes are coarser; see the measured
      // ladder at the constant); only those
      // survivors touch full-precision vectors for the exact re-rank,
      // broadcast so the corpus never shuffles — the ann_sq_topk shape
      // with a ~13× smaller scan.
      pqTopkAt(s, dir, PqCandidates)
    },

    // ---------- ANN: IVF cells × SQ8 codes — the composed scale index ----------
    "ann_ivfsq_topk" -> { (s, dir) =>
      // The FAISS IVFx,SQ8 shape: probe the top-IvfProbes trained cells per
      // query, score ONLY the 1-byte/dim codes of vectors in those cells
      // (asymmetric de-quantized cosine), and re-rank the bounded survivor
      // set against full-precision vectors. At 100 TB the candidate scan
      // touches cells/total of the corpus AND 1 byte/dim of what it does
      // touch — the two pruning axes multiply; everything non-broadcast
      // stays cell-local, survivors join back as a broadcast of keys.
      val e = emb(s, dir)
      val (cents, assigned) = ivfIndex(s, dir)
      val (mm, codes)       = sqIndex(s, dir)
      val probes = probeSelect(assigned, cents, IvfProbes)
      val cells  = assigned.select(col("vec_id"), col("centroid_id"))
      // probed-cell codes scoring folded through the bounded top-k
      // aggregate (no q_id window over the codes scan); qv is re-attached
      // to the bounded survivor set from the tiny query frame.
      val qFrame = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      // restrict to probed cells FIRST (the ann_ivfpq shape), then
      // de-quantize ONCE per surviving vector (round 22 — xhat/xn2 depend
      // only on (code, mm); the old order joined probes first, so a
      // vector in a cell probed by several queries decoded per query).
      // The probed-cell semi-join keeps the decode from touching
      // unprobed cells — identical rows to the old inner probes join.
      val probedCells = probes.select(col("centroid_id")).distinct()
      val decoded = codes.join(cells, "vec_id")
        .join(broadcast(probedCells), "centroid_id")
        .crossJoin(broadcast(mm))
        .withColumn("xhat", expr(
          """transform(code, (c, d) ->
            |  CASE WHEN mm[d].mx = mm[d].mn THEN mm[d].mn
            |       ELSE mm[d].mn + ((CAST(c AS DOUBLE) + 128.0D) + 0.5D) * (mm[d].mx - mm[d].mn) / 255.0D
            |  END)""".stripMargin))
        .withColumn("xn2", expr(dot("xhat", "xhat")))
      val scoredCodes = decoded.join(broadcast(probes), "centroid_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", expr(s"${dot("xhat", "qv")} / (sqrt(xn2) * sqrt(${dot("qv", "qv")}))"))
      val cands = topkPerQuery(scoredCodes, SqCandidates)
        .select(col("q_id"), col("neighbor_id").as("vec_id"))
        .join(broadcast(qFrame), "q_id")
      exactRerank(e, cands)
    },

    // ---------- ANN: IVF cells × PQ codes — the FAISS IVFPQ composition ----------
    "ann_ivfpq_topk" -> { (s, dir) =>
      // IVFx,PQ: probe the top-IvfProbes trained cells, score ONLY the
      // probed cells' 5-bit-per-subspace codes (reconstructed from the
      // broadcast packed codebook inside the scan — ann_pq_topk's ADC),
      // exact-re-rank the bounded survivors. The two pruning axes multiply
      // — cells/total of the corpus touched × 4 bytes/vector scanned —
      // the densest index this family ships; recall is recorded next to
      // ivfsq's in the bench.
      val e = emb(s, dir)
      val (cents, assigned) = ivfIndex(s, dir)
      val (bkm, codes)      = pqIndex(s, dir)
      val probes = probeSelect(assigned, cents, IvfProbes)
      val qFrame = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      // restrict to probed cells FIRST (the IVF pruning axis) straight off
      // the sidecar's own cell column (the FAISS invlist key — no
      // assignment join at scan time), then decode each surviving vector
      // ONCE — a vector in a cell probed by several queries still
      // reconstructs a single xhat
      val probedCells = probes.select(col("centroid_id").as("cell")).distinct()
      val decoded = pqDecode(
        codes.join(broadcast(probedCells), "cell"), bkm, cents)
        .withColumn("centroid_id", col("cell"))
      val scoredCodes = decoded.join(broadcast(probes), "centroid_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", expr(s"${dot("xhat", "qv")} / (sqrt(xn2) * sqrt(${dot("qv", "qv")}))"))
      val cands = topkPerQuery(scoredCodes, PqCandidates)
        .select(col("q_id"), col("neighbor_id").as("vec_id"))
        .join(broadcast(qFrame), "q_id")
      exactRerank(e, cands)
    },

    // ---------- multimodal: opaque binary payload + typed feature extraction ----------
    "m1_multimodal" -> { (s, dir) =>
      Multimodal.features(s, dir)
    },

    // ---------- multimodal: frame sampling + resize-to-target ----------
    "m2_frame_sample" -> { (s, dir) =>
      Multimodal.frameSamples(s, dir)
    },

    // ---------- multimodal: REAL PNG encode->decode round trip ----------
    "m3_image_decode" -> { (s, dir) =>
      Multimodal.imageDecode(s, dir)
    },

    // ---------- multimodal: REAL WAV encode->parse round trip ----------
    "m4_audio_decode" -> { (s, dir) =>
      Multimodal.audioDecode(s, dir)
    },

    // ---------- multimodal: perceptual-hash image dedup ----------
    "m5_image_phash" -> { (s, dir) =>
      // dHash dedup over REAL decoded rasters ([[Multimodal.imagePhash]]):
      // the image half of the dedup story — duplicate uploads collapse by
      // fingerprint even though their bytes re-encoded separately. One
      // phash-key shuffle for the canonical rollup (the d1 shape), the
      // canon frame joins back on the same key — no all-pairs, no window.
      val ph = Multimodal.imagePhash(s, dir)
      val canon = ph.groupBy("phash")
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      ph.join(canon, "phash")
        .select(col("doc_id"), col("phash"), col("canonical_id"),
                col("n_copies"), col("decoder"))
    }
  )

  /** DuckDB twins. Hash/compare-safe by construction: md5 hex strings,
    * integer counts as BIGINT, cosine similarities used only for ranking
    * (bit-identical double arithmetic on both sides). */
  /** DuckDB twin of [[wordsExpr]] — shared with CorpusQueries' oracles. */
  private[llm] val duckWords =
    "list_filter(string_split_regex(lower(text), '\\s+'), w -> w != '')"

  /** e1/e2 shared DuckDB CTE block — the twin of [[labelScored]]: per-label
    * fixed-point centroids (integer floor(x·2^20) sums, so both engines
    * derive bit-identical binary64 centroids) and every vector's
    * floor(cos·2^20) against its OWN label centroid. One definition so a
    * centroid-math fix can never apply to one twin and not the other. */
  private[llm] lazy val labelScoredCtes: String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (
       |  SELECT label, list(s::DOUBLE / (n::DOUBLE * 1048576.0) ORDER BY d) AS cv FROM (
       |    SELECT label, dd.d AS d,
       |           sum(CAST(floor(v[dd.d] * 1048576) AS BIGINT)) AS s, count(*) AS n
       |    FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) AS d) dd
       |    GROUP BY 1, 2)
       |  GROUP BY 1),
       |sc AS (
       |  SELECT e.label, e.vec_id,
       |         CAST(floor((list_inner_product(e.v, c.cv) / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(c.cv, c.cv)))) * 1048576) AS BIGINT) AS cos_fp
       |  FROM e JOIN c USING (label))""".stripMargin

  /** d4/d6/t15 shared CTE chain: shingle sets → inverted index with the
    * hot-posting cap → candidate pairs → exact-Jaccard-thresholded `dup`.
    * Object-level so CorpusQueries' funnel oracle composes the same chain
    * (one definition — the dup criterion can't drift between operators). */
  /** The d4 truth chain (inverted index → df cap → exact-Jaccard `dup`)
    * parameterized on the shingle-set CTE — ngramPairCtes instantiates it
    * over `sets.sset`; d21's twin re-instantiates the SAME text over the
    * minhash family's `sigs.shingle_set` (an identical frame), so the
    * ground truth the loss audit grades against cannot drift from d4's. */
  private def ngramTruthCtes(setsCte: String, setCol: String): String =
    s"""ex AS (
       |  SELECT doc_id, unnest($setCol) AS s FROM $setsCte
       |), dfreq AS (
       |  SELECT s, count(*) AS df FROM ex GROUP BY 1
       |), rare AS (
       |  SELECT ex.doc_id, ex.s FROM ex JOIN dfreq USING (s) WHERE df <= $NgramMaxDf
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
       |), dup AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.$setCol, sb.$setCol)) AS BIGINT) AS inter_cnt,
       |    CAST(len(sa.$setCol) + len(sb.$setCol) - len(list_intersect(sa.$setCol, sb.$setCol)) AS BIGINT) AS union_cnt
       |  FROM cand JOIN $setsCte sa ON sa.doc_id = doc_a JOIN $setsCte sb ON sb.doc_id = doc_b
       |  WHERE 2 * len(list_intersect(sa.$setCol, sb.$setCol)) >= len(sa.$setCol) + len(sb.$setCol) - len(list_intersect(sa.$setCol, sb.$setCol))
       |)""".stripMargin

  private[llm] lazy val ngramPairCtes: String = {
    val words = duckWords
      s"""base AS (SELECT doc_id, $words AS words FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(words) < 2 THEN []
         |    ELSE list_transform(generate_series(1, len(words) - 1), i -> words[i] || ' ' || words[i + 1])
         |    END AS shingles
         |  FROM base
         |), sets AS (
         |  SELECT doc_id, list_distinct(shingles) AS sset FROM sh WHERE len(shingles) > 0
         |), ${ngramTruthCtes("sets", "sset")}""".stripMargin
  }

  def oracles: Map[String, String] = {
    val words = duckWords

    // Shared CTE chain (documents → bigrams → fnv32 → minhash sigs → band
    // rows) reused by d2's pair query and d11's bucket audit so the two
    // oracles can't drift.
    val minhashCtes =
      s"""base AS (
         |  SELECT doc_id, $words AS words FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(words) < 2 THEN []
         |    ELSE list_transform(generate_series(1, len(words) - 1), i -> words[i] || ' ' || words[i + 1])
         |    END AS shingles
         |  FROM base
         |), vh AS (
         |  SELECT doc_id, shingles,
         |         list_transform(shingles, s -> ${fnv32Expr("s")}) AS vhash
         |  FROM sh WHERE len(shingles) > 0
         |), sigs AS (
         |  SELECT doc_id, list_distinct(shingles) AS shingle_set,
         |    list_transform(generate_series(0, ${MinHashK - 1}),
         |      k -> CAST(list_min(list_transform(vhash,
         |             v -> (${duckArray(MinHashA)}[k + 1] * v + ${duckArray(MinHashB)}[k + 1]) % $MinHashP)) AS VARCHAR)) AS sig
         |  FROM vh
         |), bands AS (
         |  SELECT doc_id, b,
         |         array_to_string(sig[$RowsPerBand * b + 1 : $RowsPerBand * b + $RowsPerBand], '|') AS band_hash
         |  FROM sigs, (SELECT unnest(generate_series(0, ${Bands - 1})) AS b) bs
         |)""".stripMargin

    // the star-link candidate chain (bstats → cold all-pairs + hot hub
    // links → distinct `pairs`), shared by d2's twin and d21's loss audit
    // so the audited candidate set IS d2's
    val minhashPairsCtes =
      s"""bstats AS (
         |  SELECT b, band_hash, count(*) AS bsz, min(doc_id) AS hub FROM bands GROUP BY 1, 2
         |), bands_c AS (
         |  SELECT bands.* FROM bands JOIN bstats USING (b, band_hash) WHERE bsz <= $BandMaxBucket
         |), pairs AS (
         |  SELECT DISTINCT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |    FROM bands_c a JOIN bands_c c ON a.b = c.b AND a.band_hash = c.band_hash AND a.doc_id < c.doc_id
         |    UNION ALL
         |    SELECT s.hub AS doc_a, bn.doc_id AS doc_b
         |    FROM bands bn JOIN bstats s ON bn.b = s.b AND bn.band_hash = s.band_hash
         |    WHERE s.bsz > $BandMaxBucket AND bn.doc_id != s.hub)
         |)""".stripMargin

    val minhashSql =
      s"""WITH $minhashCtes, $minhashPairsCtes
         |SELECT p.doc_a, p.doc_b,
         |       len(list_intersect(sa.shingle_set, sc.shingle_set)) AS inter_cnt,
         |       len(sa.shingle_set) + len(sc.shingle_set) - len(list_intersect(sa.shingle_set, sc.shingle_set)) AS union_cnt
         |FROM pairs p
         |JOIN sigs sa ON sa.doc_id = p.doc_a
         |JOIN sigs sc ON sc.doc_id = p.doc_b""".stripMargin

    /** d16 twin: the corpus side capped to the BandMaxBucket smallest
      * doc_ids per band bucket (row_number mirrors graft_topk's
      * constant-score min-k), the batch side uncapped, batch-internal
      * pairs in arrival order, then the exact-Jaccard dup criterion. */
    val incrSql =
      s"""WITH $minhashCtes,
         |inc_b AS (SELECT doc_id, b, band_hash FROM bands WHERE doc_id % $IncrEvery = $IncrSlot),
         |corp_m AS (
         |  SELECT b, band_hash, doc_id FROM (
         |    SELECT b, band_hash, doc_id,
         |           row_number() OVER (PARTITION BY b, band_hash ORDER BY doc_id) AS rn
         |    FROM bands WHERE doc_id % $IncrEvery != $IncrSlot)
         |  WHERE rn <= $BandMaxBucket),
         |cand AS (
         |  SELECT DISTINCT inc_id, partner_id, kind FROM (
         |    SELECT i.doc_id AS inc_id, c.doc_id AS partner_id, 'corpus' AS kind
         |    FROM inc_b i JOIN corp_m c USING (b, band_hash)
         |    UNION ALL
         |    SELECT i.doc_id, j.doc_id, 'batch'
         |    FROM inc_b i JOIN inc_b j
         |      ON i.b = j.b AND i.band_hash = j.band_hash AND j.doc_id < i.doc_id)),
         |ver AS (
         |  SELECT inc_id, partner_id, kind
         |  FROM cand
         |  JOIN sigs si ON si.doc_id = inc_id
         |  JOIN sigs sp ON sp.doc_id = partner_id
         |  WHERE 2 * len(list_intersect(si.shingle_set, sp.shingle_set))
         |        >= len(si.shingle_set) + len(sp.shingle_set)
         |           - len(list_intersect(si.shingle_set, sp.shingle_set))),
         |vagg AS (
         |  SELECT inc_id,
         |         CAST(sum(CASE WHEN kind = 'corpus' THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus_dups,
         |         CAST(sum(CASE WHEN kind = 'batch' THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_dups,
         |         min(partner_id) AS best_match
         |  FROM ver GROUP BY 1)
         |SELECT d.doc_id,
         |       CASE WHEN a.best_match IS NOT NULL THEN 'reject' ELSE 'admit' END AS verdict,
         |       CAST(coalesce(a.n_corpus_dups, 0) AS BIGINT) AS n_corpus_dups,
         |       CAST(coalesce(a.n_batch_dups, 0) AS BIGINT) AS n_batch_dups,
         |       a.best_match
         |FROM documents d LEFT JOIN vagg a ON a.inc_id = d.doc_id
         |WHERE d.doc_id % $IncrEvery = $IncrSlot""".stripMargin

    val winnowSql = {
      val w = WinnowWindow
      s"""WITH base AS (
         |  SELECT doc_id, $words AS words FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(words) < 2 THEN []
         |    ELSE list_transform(generate_series(1, len(words) - 1), i -> words[i] || ' ' || words[i + 1])
         |    END AS shingles
         |  FROM base
         |), vh AS (
         |  SELECT doc_id,
         |         list_transform(shingles, s -> ${fnv32Expr("s")}) AS vhash
         |  FROM sh WHERE len(shingles) > 0
         |)
         |SELECT doc_id, len(vhash)::BIGINT AS n_kgrams, len(fp_set)::BIGINT AS n_fingerprints,
         |       list_min(fp_set) AS min_fp, list_max(fp_set) AS max_fp
         |FROM (
         |  SELECT doc_id, vhash,
         |    CASE WHEN len(vhash) < $w THEN list_distinct([list_min(vhash)])
         |    ELSE list_distinct(list_transform(generate_series(1, len(vhash) - $w + 1),
         |                                      i -> list_min(vhash[i : i + $w - 1])))
         |    END AS fp_set
         |  FROM vh)""".stripMargin
    }

    val simhashSql =
      s"""SELECT doc_id,
         |  md5(array_to_string($words, ' ')) AS fingerprint,
         |  CAST(list_sum(list_transform(generate_series(0, 15), i ->
         |    CASE WHEN list_sum(list_transform($words, w ->
         |           ((instr('0123456789abcdef', substr(md5(w), (i // 4) + 1, 1)) - 1)
         |            >> (3 - i % 4)) % 2 * 2 - 1
         |         )) > 0
         |    THEN 1 << i ELSE 0 END)) AS BIGINT) AS simhash16
         |FROM documents""".stripMargin

    /** Shared CTE chain for d10/d11: SimHash signatures (t2's bit-vote
      * pattern, band b reading hex chars [4b, 4b+4)) exploded to one
      * (doc_id, b, band_val) row per band — the same banded-row shape the
      * Spark side joins on, so the [[BandMaxBucket]] cap applies to
      * identical buckets on both sides. */
    val simhashBandCtes =
      s"""w AS (
         |  SELECT doc_id, words FROM (SELECT doc_id, $words AS words FROM documents)
         |  WHERE len(words) > 0
         |), sig AS (
         |  SELECT doc_id, list_transform(generate_series(0, ${SimBands - 1}), b ->
         |    CAST(list_sum(list_transform(generate_series(0, 15), i ->
         |      CASE WHEN list_sum(list_transform(words, w ->
         |             ((instr('0123456789abcdef', substr(md5(w), (b * 4 + i // 4) + 1, 1)) - 1)
         |              >> (3 - i % 4)) % 2 * 2 - 1
         |           )) > 0
         |      THEN 1 << i ELSE 0 END)) AS BIGINT)) AS bands
         |  FROM w
         |), sbr AS (
         |  SELECT doc_id, b, bands[b + 1] AS band_val
         |  FROM sig, (SELECT unnest(generate_series(0, ${SimBands - 1})) AS b) bs
         |)""".stripMargin

    /** d10 twin: banded-row candidate generation with the hot-bucket cap
      * (mirroring the Spark plan exactly), then xor + per-bit popcount
      * hamming over the full 4-band signatures of each distinct pair. */
    val simhashDupSql =
      s"""WITH $simhashBandCtes, sstats AS (
         |  SELECT b, band_val, count(*) AS bsz, min(doc_id) AS hub FROM sbr GROUP BY 1, 2
         |), sbr_c AS (
         |  SELECT sbr.* FROM sbr JOIN sstats USING (b, band_val) WHERE bsz <= $BandMaxBucket
         |), cand AS (
         |  SELECT DISTINCT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |    FROM sbr_c a JOIN sbr_c c ON a.b = c.b AND a.band_val = c.band_val AND a.doc_id < c.doc_id
         |    UNION ALL
         |    SELECT s.hub AS doc_a, sn.doc_id AS doc_b
         |    FROM sbr sn JOIN sstats s ON sn.b = s.b AND sn.band_val = s.band_val
         |    WHERE s.bsz > $BandMaxBucket AND sn.doc_id != s.hub)
         |)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT doc_a, doc_b,
         |    CAST(list_sum(list_transform(generate_series(1, $SimBands), k ->
         |      len(list_filter(generate_series(0, 15), j ->
         |        ((xor(sa.bands[k], sb.bands[k]) >> j) % 2) = 1)))) AS BIGINT) AS hamming
         |  FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
         |) WHERE hamming <= $SimHammingMax""".stripMargin

    /** d12 twin: the streamed band buckets emit exactly the batch band
      * join's pair set (per band, no distinct) with the signature-match
      * Jaccard estimate — integer permille of agreeing minhash rows.
      * UNCAPPED on both sides (see the d12 query comment). */
    val streamDupSql =
      s"""WITH $minhashCtes
         |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, a.b AS band,
         |  (1000 * len(list_filter(generate_series(1, $MinHashK), k -> sa.sig[k] = sc.sig[k]))) // $MinHashK AS est_permille
         |FROM bands a JOIN bands c ON a.b = c.b AND a.band_hash = c.band_hash AND a.doc_id < c.doc_id
         |JOIN sigs sa ON sa.doc_id = a.doc_id
         |JOIN sigs sc ON sc.doc_id = c.doc_id""".stripMargin

    /** d11 twin: per-(band, value) bucket sizes from the SAME two CTE
      * chains d2/d10 use, folded to one audit row per algorithm. */
    val bandAuditSql =
      s"""WITH $minhashCtes, $simhashBandCtes,
         |mh AS (SELECT b, band_hash, count(*) AS sz FROM bands GROUP BY 1, 2),
         |sb AS (SELECT b, band_val, count(*) AS sz FROM sbr GROUP BY 1, 2)
         |SELECT 'minhash' AS algo, count(*)::BIGINT AS n_buckets,
         |       COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN 1 ELSE 0 END), 0)::BIGINT AS n_hot_buckets,
         |       COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN sz ELSE 0 END), 0)::BIGINT AS n_capped_rows
         |FROM mh
         |UNION ALL
         |SELECT 'simhash' AS algo, count(*)::BIGINT AS n_buckets,
         |       COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN 1 ELSE 0 END), 0)::BIGINT AS n_hot_buckets,
         |       COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN sz ELSE 0 END), 0)::BIGINT AS n_capped_rows
         |FROM sb""".stripMargin

    /** d12 audit twin: with the TTL off, the streaming cap's refusals are
      * a pure function of batch bucket size — refused = greatest(0,
      * sz − cap) — so BOTH the batch columns and the stream columns come
      * from the same band CTE. Hash equality of the Spark row (whose
      * stream columns really come from the replayed stream) against this
      * row is the proof the streaming state machine implements the
      * contract. */
    val streamAuditSql =
      s"""WITH $minhashCtes,
         |mh AS (SELECT b, band_hash, count(*) AS sz FROM bands GROUP BY 1, 2)
         |SELECT count(*)::BIGINT AS n_buckets,
         |  COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN 1 ELSE 0 END), 0)::BIGINT AS n_hot_buckets,
         |  COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN sz - $BandMaxBucket ELSE 0 END), 0)::BIGINT AS n_refused_expected,
         |  COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN 1 ELSE 0 END), 0)::BIGINT AS n_overflow_buckets_stream,
         |  COALESCE(SUM(CASE WHEN sz > $BandMaxBucket THEN sz - $BandMaxBucket ELSE 0 END), 0)::BIGINT AS n_refused_stream
         |FROM mh""".stripMargin

    val statsSql =
      s"""SELECT doc_id,
         |  len($words)::BIGINT AS n_words,
         |  len(list_distinct($words))::BIGINT AS n_distinct_words,
         |  length(text)::BIGINT AS n_chars,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))::BIGINT AS n_subword_tokens,
         |  len(list_filter($words, w -> list_contains(['the','a','of','and','to','in'], w)))::BIGINT AS n_stop_en,
         |  len(list_filter($words, w -> list_contains(['el','la','de','que','y','un'], w)))::BIGINT AS n_stop_es,
         |  (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::BIGINT AS n_punct,
         |  CASE WHEN len($words) = 0 THEN 0
         |  ELSE (1000 * len(list_filter($words, w -> list_contains(['the','a','of','and','to','in'], w))) +
         |        1000 * len(list_filter($words, w -> list_contains(['el','la','de','que','y','un'], w)))) // len($words)
         |  END::BIGINT AS stop_permille,
         |  CASE WHEN length(text) = 0 THEN 0
         |  ELSE (1000 * (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))) // length(text)
         |  END::BIGINT AS punct_permille,
         |  (len($words) >= 5 AND length(text) >= 20
         |   AND (CASE WHEN length(text) = 0 THEN 0
         |        ELSE (1000 * (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))) // length(text)
         |        END) <= 150) AS quality_ok,
         |  CASE
         |  WHEN len(list_filter($words, w -> list_contains(['the','a','of','and','to','in'], w))) = 0
         |   AND len(list_filter($words, w -> list_contains(['el','la','de','que','y','un'], w))) = 0 THEN 'und'
         |  WHEN len(list_filter($words, w -> list_contains(['el','la','de','que','y','un'], w))) >
         |       len(list_filter($words, w -> list_contains(['the','a','of','and','to','in'], w))) THEN 'es'
         |  ELSE 'en' END AS lang_guess
         |FROM documents""".stripMargin

    val bruteSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
         |         list_inner_product(c.v, q.v) / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(q.v, q.v))) AS sim
         |  FROM e q JOIN e c ON c.vec_id != q.vec_id
         |  WHERE q.vec_id < $NumQueries
         |)
         |SELECT q_id, rank, neighbor_id FROM (
         |  SELECT q_id, neighbor_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= $TopK""".stripMargin

    // Derived-knob CTE + gated bucket expression shared by the two
    // hyperplane-LSH twins: the static SQL text carries ALL MaxHyperplanes
    // plane literals, and planes beyond the floor contribute a bit only
    // when h < hp — reproducing the Spark side's corpus-derived plane
    // count ([[hyperplanesFor]]) with pure integer gating.
    val lshKnobCte = {
      val cases = (Hyperplanes until MaxHyperplanes)
        .map(h => s"WHEN count(*) <= ${LshTargetOccupancy << h} THEN $h").mkString(" ")
      s"k AS (SELECT CASE $cases ELSE $MaxHyperplanes END AS hp FROM e)"
    }
    val lshBucketExpr = (0 until MaxHyperplanes).map { h =>
      val lit = hyperplane(h, EmbeddingDim).mkString("[", ", ", "]::DOUBLE[]")
      val bit = s"CASE WHEN list_inner_product(v, $lit) >= 0.0 THEN ${1 << h} ELSE 0 END"
      if (h < Hyperplanes) bit else s"CASE WHEN $h < k.hp THEN $bit ELSE 0 END"
    }.mkString(" + ")
    val lshSql = {
      val bucketExpr = lshBucketExpr
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$lshKnobCte,
         |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e, k),
         |pairs AS (
         |  SELECT a.vec_id, a.bucket, o.vec_id AS o_id,
         |         list_inner_product(a.v, o.v) / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(o.v, o.v))) AS sim
         |  FROM b a JOIN b o ON a.bucket = o.bucket AND a.vec_id != o.vec_id
         |)
         |SELECT vec_id, bucket::BIGINT AS bucket, o_id AS nn_id FROM (
         |  SELECT vec_id, bucket, o_id,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, o_id) AS rn
         |  FROM pairs)
         |WHERE rn = 1""".stripMargin
    }

    // The k-means chain mirrors the Spark pipeline step for step: assignment
    // CTEs argmax cosine to the previous centroids; update CTEs sum
    // FIXED-POINT components (order-independent BIGINTs) and divide — both
    // engines derive bit-identical binary64 centroids from identical
    // integer sums, keeping the trained-IVF query hash-gated.
    def ivfAssignSql(centsCte: String): String =
      s"""SELECT vec_id, v, c_id AS centroid_id FROM (
         |    SELECT e.vec_id, e.v, c.c_id,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             list_inner_product(e.v, c.cv) / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(c.cv, c.cv))) DESC,
         |             c.c_id) AS rn
         |    FROM e, $centsCte c)
         |  WHERE rn = 1""".stripMargin
    def ivfUpdateSql(assignCte: String): String =
      s"""SELECT centroid_id AS c_id,
         |       list(s::DOUBLE / (n::DOUBLE * 1048576.0) ORDER BY d) AS cv FROM (
         |    SELECT centroid_id, dd.d AS d,
         |           sum(CAST(floor(v[dd.d] * 1048576) AS BIGINT)) AS s, count(*) AS n
         |    FROM $assignCte, (SELECT unnest(generate_series(1, $EmbeddingDim)) AS d) dd
         |    GROUP BY 1, 2)
         |  GROUP BY 1""".stripMargin
    val ivfTrainCtes = (1 to KMeansIters).map { i =>
      s"a${i - 1} AS (${ivfAssignSql(s"c${i - 1}")}),\nc$i AS (${ivfUpdateSql(s"a${i - 1}")})"
    }.mkString(",\n")
    // ONE definition of the trained-coarse-quantizer CTE chain
    // (kc -> c0 -> Lloyd iterations -> assigned), shared verbatim by every
    // IVF-composed twin AND the residual-PQ chain — a seeding or
    // iteration tweak lands in exactly one place.
    val ivfIndexCtes =
      s"""kc AS (SELECT LEAST($MaxCentroids, GREATEST($NumCentroids, CAST(floor(sqrt(count(*))) AS BIGINT))) AS nc FROM e),
         |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < (SELECT nc FROM kc)),
         |$ivfTrainCtes,
         |assigned AS (${ivfAssignSql(s"c$KMeansIters")})""".stripMargin
    val ivfSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |q AS (SELECT vec_id AS q_id, v AS qv, centroid_id FROM assigned WHERE vec_id < $NumQueries)
         |SELECT q_id, rank, neighbor_id, centroid_id FROM (
         |  SELECT q.q_id, a.vec_id AS neighbor_id, a.centroid_id::BIGINT AS centroid_id,
         |         row_number() OVER (PARTITION BY q.q_id ORDER BY
         |           list_inner_product(a.v, q.qv) / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(q.qv, q.qv))) DESC,
         |           a.vec_id) AS rank
         |  FROM assigned a JOIN q ON a.centroid_id = q.centroid_id AND a.vec_id != q.q_id)
         |WHERE rank <= 3""".stripMargin

    // SemDeDup twin: the trained-assignment CTE chain composed with the
    // multi-probe thresholded pair join — `p2` mirrors the Spark side's
    // bounded graft_topk over non-assigned cells (same cosine, same
    // score-desc/id-asc tie-break), the probe union = own cell + the
    // SemDeDupProbes-1 next-nearest. Identical IEEE cosine, so the
    // integer/id-only output hash-matches.
    val semdedupSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |p2 AS (
         |  SELECT vec_id, v, c_id AS pcell FROM (
         |    SELECT a.vec_id, a.v, c.c_id,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             list_inner_product(a.v, c.cv) / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(c.cv, c.cv))) DESC,
         |             c.c_id) AS rn
         |    FROM assigned a JOIN c$KMeansIters c ON c.c_id != a.centroid_id)
         |  WHERE rn <= ${SemDeDupProbes - 1}),
         |probes AS (
         |  SELECT vec_id, v, centroid_id AS pcell FROM assigned
         |  UNION ALL SELECT vec_id, v, pcell FROM p2),
         |dups AS (
         |  SELECT p.vec_id, min(o.vec_id) AS min_partner, count(*) AS n_semdups
         |  FROM probes p JOIN assigned o
         |    ON p.pcell = o.centroid_id AND p.vec_id != o.vec_id
         |  WHERE list_inner_product(p.v, o.v) / (sqrt(list_inner_product(p.v, p.v)) * sqrt(list_inner_product(o.v, o.v))) >= 0.8
         |  GROUP BY 1)
         |SELECT a.vec_id, a.centroid_id::BIGINT AS centroid_id,
         |       least(a.vec_id, coalesce(d.min_partner, a.vec_id)) AS canonical_id,
         |       coalesce(d.n_semdups, 0)::BIGINT AS n_semdups
         |FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id""".stripMargin

    // Cell-occupancy audit twin: the same trained-assignment chain folded
    // to one integer row; the hot test reuses the kc knob CTE so both
    // engines gate on the identical derived cell count.
    val cellAuditSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |tot AS (SELECT count(*) AS n FROM e),
         |sizes AS (SELECT centroid_id, count(*) AS sz FROM assigned GROUP BY 1)
         |SELECT count(*)::BIGINT AS n_cells,
         |       COALESCE(SUM(sz), 0)::BIGINT AS n_vectors,
         |       COALESCE(MAX(sz), 0)::BIGINT AS max_cell,
         |       COALESCE(SUM(CASE WHEN sz * (SELECT nc FROM kc) > 4 * (SELECT n FROM tot) THEN 1 ELSE 0 END), 0)::BIGINT AS n_hot_cells,
         |       COALESCE(SUM(CASE WHEN sz * (SELECT nc FROM kc) > 4 * (SELECT n FROM tot) THEN sz ELSE 0 END), 0)::BIGINT AS n_hot_rows
         |FROM sizes""".stripMargin

    // Incremental-add twin: the same trained chain, the same cyclic
    // half-rotation batch (list slicing copies components verbatim — no
    // float arithmetic to disagree on), row_number argmax with the
    // max_by tie-break, identical integer occupancy/permille rollup.
    val rotAt = EmbeddingDim / 2
    val incAddSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |batch AS (
         |  SELECT vec_id + $IncrIdShift AS vec_id,
         |         v[${rotAt + 1}:$EmbeddingDim] || v[1:$rotAt] AS v
         |  FROM e WHERE vec_id % $IncrEvery = $IncrSlot),
         |badd AS (
         |  SELECT vec_id, c_id AS centroid_id FROM (
         |    SELECT b.vec_id, c.c_id,
         |           row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |             list_inner_product(b.v, c.cv) / (sqrt(list_inner_product(b.v, b.v)) * sqrt(list_inner_product(c.cv, c.cv))) DESC,
         |             c.c_id) AS rn
         |    FROM batch b, c$KMeansIters c)
         |  WHERE rn = 1),
         |nb AS (SELECT centroid_id, count(*)::BIGINT AS n_before FROM assigned GROUP BY 1),
         |na AS (SELECT centroid_id, count(*)::BIGINT AS n_added FROM badd GROUP BY 1)
         |SELECT coalesce(nb.centroid_id, na.centroid_id)::BIGINT AS centroid_id,
         |       coalesce(n_before, 0)::BIGINT AS n_before,
         |       coalesce(n_added, 0)::BIGINT AS n_added,
         |       (coalesce(n_before, 0) + coalesce(n_added, 0))::BIGINT AS n_after,
         |       ((1000 * coalesce(n_added, 0)) // greatest(coalesce(n_before, 0), 1))::BIGINT AS drift_permille
         |FROM nb FULL JOIN na ON nb.centroid_id = na.centroid_id""".stripMargin

    val ivfSql2 =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |qp AS (
         |  SELECT q_id, qv, c_id AS centroid_id FROM (
         |    SELECT q.q_id, q.qv, c.c_id,
         |           row_number() OVER (PARTITION BY q.q_id ORDER BY
         |             list_inner_product(q.qv, c.cv) / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.cv, c.cv))) DESC,
         |             c.c_id) AS pn
         |    FROM (SELECT vec_id AS q_id, v AS qv FROM assigned WHERE vec_id < $NumQueries) q, c$KMeansIters c)
         |  WHERE pn <= $IvfProbes)
         |SELECT q_id, rank, neighbor_id, centroid_id FROM (
         |  SELECT qp.q_id, a.vec_id AS neighbor_id, a.centroid_id::BIGINT AS centroid_id,
         |         row_number() OVER (PARTITION BY qp.q_id ORDER BY
         |           list_inner_product(a.v, qp.qv) / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(qp.qv, qp.qv))) DESC,
         |           a.vec_id) AS rank
         |  FROM assigned a JOIN qp ON a.centroid_id = qp.centroid_id AND a.vec_id != qp.q_id)
         |WHERE rank <= 3""".stripMargin

    // d3 twin: the multi-table band join. Planes are REBUILT in SQL from
    // the same md5 derivation as [[hyperplane]] (dyadic rationals — the
    // hex-prefix cast lands on the identical double), table t over plane
    // ids t·32+h; bits beyond the derived count are gated by the same
    // knob CTE. Table 0 is the reported `bucket` (same planes as the
    // single-table ann_lsh_nn). DISTINCT candidate pairs mirror the Spark
    // side's countDistinct partner count.
    val neardupSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$lshKnobCte,
         |ph AS (
         |  SELECT t, h,
         |         list((('0x' || substr(md5('h:' || (t * 32 + h) || ':' || d), 1, 4))::INT - 32768)::DOUBLE / 65536.0 ORDER BY d) AS p
         |  FROM generate_series(0, ${LshTables - 1}) tt(t),
         |       generate_series(0, ${MaxHyperplanes - 1}) hh(h),
         |       generate_series(0, ${EmbeddingDim - 1}) dd(d)
         |  GROUP BY t, h),
         |bands AS (
         |  SELECT e.vec_id, e.v, ph.t,
         |         sum(CASE WHEN ph.h < k.hp AND list_inner_product(e.v, ph.p) >= 0.0 THEN 1 << ph.h ELSE 0 END)::INT AS bkt
         |  FROM e, ph, k GROUP BY 1, 2, 3),
         |b AS (SELECT vec_id, v, bkt AS bucket FROM bands WHERE t = 0),
         |cand AS (
         |  SELECT DISTINCT a.vec_id, a.v, o.vec_id AS o_id, o.v AS ov
         |  FROM bands a JOIN bands o ON a.t = o.t AND a.bkt = o.bkt AND a.vec_id != o.vec_id),
         |dups AS (
         |  SELECT vec_id, min(o_id) AS min_partner, count(*) AS n_neardups
         |  FROM cand
         |  WHERE list_inner_product(v, ov) / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(ov, ov))) >= 0.8
         |  GROUP BY 1
         |)
         |SELECT b.vec_id, b.bucket::BIGINT AS bucket,
         |       least(b.vec_id, coalesce(d.min_partner, b.vec_id)) AS canonical_id,
         |       coalesce(d.n_neardups, 0)::BIGINT AS n_neardups
         |FROM b LEFT JOIN dups d ON d.vec_id = b.vec_id""".stripMargin

    // SQ8 twin: identical affine coding and midpoint de-quantization
    // (same IEEE sub/div/mul/floor on the same per-dimension min/max),
    // asymmetric cosine scoring, exact re-rank — hash-stable end to end.
    val sqSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |mm AS (SELECT dd.d AS d, min(v[dd.d]) AS mn, max(v[dd.d]) AS mx
         |       FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) AS d) dd GROUP BY 1),
         |c AS (SELECT e.vec_id, e.v,
         |             list(CASE WHEN mm.mx = mm.mn THEN mm.mn
         |                       ELSE mm.mn + (CAST(least(255, greatest(0, CAST(floor((e.v[mm.d] - mm.mn) / (mm.mx - mm.mn) * 255.0) AS BIGINT))) AS DOUBLE) + 0.5) * (mm.mx - mm.mn) / 255.0
         |                  END ORDER BY mm.d) AS xhat
         |      FROM e, mm GROUP BY e.vec_id, e.v),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
         |cand AS (
         |  SELECT c.vec_id, c.v, q.q_id, q.qv,
         |         row_number() OVER (PARTITION BY q.q_id ORDER BY
         |           list_inner_product(c.xhat, q.qv) / (sqrt(list_inner_product(c.xhat, c.xhat)) * sqrt(list_inner_product(q.qv, q.qv))) DESC,
         |           c.vec_id) AS crank
         |  FROM c, q WHERE c.vec_id != q.q_id)
         |SELECT q_id, rank, neighbor_id FROM (
         |  SELECT q_id, vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY
         |           list_inner_product(v, qv) / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) DESC,
         |           vec_id) AS rank
         |  FROM cand WHERE crank <= $SqCandidates)
         |WHERE rank <= $TopK""".stripMargin

    // PQ twins: the ivfTrain pattern run per SUBSPACE over RESIDUAL
    // subvectors (r = v − trained cell centroid — the FAISS by_residual
    // default; ivfIndexCtes above is the shared coarse trained-cell CTE
    // set) with squared-L2 assignment, dense re-key of surviving
    // codewords, packed-codebook + centroid-add reconstruction, then
    // sqSql's asymmetric scoring + re-rank.
    def pqAssignSql(booksCte: String): String =
      s"""SELECT vec_id, m, sv, c_id FROM (
         |    SELECT s.vec_id, s.m, s.sv, c.c_id,
         |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
         |             list_inner_product(s.sv, s.sv) - 2.0 * list_inner_product(s.sv, c.cv) + list_inner_product(c.cv, c.cv) ASC,
         |             c.c_id) AS rn
         |    FROM sub s JOIN $booksCte c ON c.m = s.m)
         |  WHERE rn = 1""".stripMargin
    def pqUpdateSql(assignCte: String): String =
      s"""SELECT m, c_id,
         |       list(s::DOUBLE / (n::DOUBLE * 1048576.0) ORDER BY d) AS cv FROM (
         |    SELECT m, c_id, dd.d AS d,
         |           sum(CAST(floor(sv[dd.d] * 1048576) AS BIGINT)) AS s, count(*) AS n
         |    FROM $assignCte, (SELECT unnest(generate_series(1, $PqSubDim)) AS d) dd
         |    GROUP BY 1, 2, 3)
         |  GROUP BY 1, 2""".stripMargin
    val pqTrainCtes = (1 to KMeansIters).map { i =>
      s"pa${i - 1} AS (${pqAssignSql(s"p${i - 1}")}),\np$i AS (${pqUpdateSql(s"pa${i - 1}")})"
    }.mkString(",\n")
    // the full trained-PQ reconstruction chain (sub → train → dense re-key
    // → packed codebook → per-vector xhat), shared by pqSql and ivfPqSql
    val pqIndexCtes =
      s"""rsd AS (SELECT a.vec_id, a.centroid_id,
         |               list_transform(generate_series(1, $EmbeddingDim), d -> a.v[d] - cc.cv[d]) AS rv
         |        FROM assigned a JOIN c$KMeansIters cc ON cc.c_id = a.centroid_id),
         |sub AS (SELECT vec_id, mm.m AS m, rv[mm.m * $PqSubDim + 1 : mm.m * $PqSubDim + $PqSubDim] AS sv
         |        FROM rsd, (SELECT unnest(generate_series(0, ${PqM - 1})) AS m) mm),
         |p0 AS (SELECT m, vec_id AS c_id, sv AS cv FROM sub WHERE vec_id < $PqK),
         |$pqTrainCtes,
         |pfin AS (${pqAssignSql(s"p$KMeansIters")}),
         |db AS (SELECT m, c_id, row_number() OVER (PARTITION BY m ORDER BY c_id) - 1 AS dc FROM p$KMeansIters),
         |cd AS (SELECT a.vec_id, list(db.dc ORDER BY a.m) AS code
         |       FROM pfin a JOIN db ON db.m = a.m AND db.c_id = a.c_id GROUP BY 1),
         |bk AS (SELECT list(cl ORDER BY m) AS bkm
         |       FROM (SELECT m, list(cv ORDER BY c_id) AS cl FROM p$KMeansIters GROUP BY 1)),
         |xf AS (SELECT vec_id, flatten(list_transform(generate_series(0, ${PqM - 1}),
         |                              m -> bkm[m + 1][code[m + 1] + 1])) AS fh
         |       FROM cd, bk),
         |x AS (SELECT xf.vec_id,
         |             list_transform(generate_series(1, $EmbeddingDim), d -> cc.cv[d] + xf.fh[d]) AS xhat
         |      FROM xf JOIN rsd r ON r.vec_id = xf.vec_id JOIN c$KMeansIters cc ON cc.c_id = r.centroid_id)""".stripMargin
    val pqSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |$pqIndexCtes,
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
         |cand AS (
         |  SELECT x.vec_id, q.q_id, q.qv,
         |         row_number() OVER (PARTITION BY q.q_id ORDER BY
         |           list_inner_product(x.xhat, q.qv) / (sqrt(list_inner_product(x.xhat, x.xhat)) * sqrt(list_inner_product(q.qv, q.qv))) DESC,
         |           x.vec_id) AS crank
         |  FROM x, q WHERE x.vec_id != q.q_id)
         |SELECT q_id, rank, neighbor_id FROM (
         |  SELECT c.q_id, c.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY c.q_id ORDER BY
         |           list_inner_product(e.v, c.qv) / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(c.qv, c.qv))) DESC,
         |           c.vec_id) AS rank
         |  FROM cand c JOIN e ON e.vec_id = c.vec_id
         |  WHERE c.crank <= $PqCandidates)
         |WHERE rank <= $TopK""".stripMargin

    // IVF×PQ twin: the trained-cell probe restriction composed with the
    // PQ reconstruction chain's asymmetric scoring + exact re-rank.
    val ivfPqSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |$pqIndexCtes,
         |qp AS (
         |  SELECT q_id, qv, c_id AS centroid_id FROM (
         |    SELECT q.q_id, q.qv, cc.c_id,
         |           row_number() OVER (PARTITION BY q.q_id ORDER BY
         |             list_inner_product(q.qv, cc.cv) / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(cc.cv, cc.cv))) DESC,
         |             cc.c_id) AS pn
         |    FROM (SELECT vec_id AS q_id, v AS qv FROM assigned WHERE vec_id < $NumQueries) q, c$KMeansIters cc)
         |  WHERE pn <= $IvfProbes),
         |cand AS (
         |  SELECT a.vec_id, qp.q_id, qp.qv,
         |         row_number() OVER (PARTITION BY qp.q_id ORDER BY
         |           list_inner_product(x.xhat, qp.qv) / (sqrt(list_inner_product(x.xhat, x.xhat)) * sqrt(list_inner_product(qp.qv, qp.qv))) DESC,
         |           a.vec_id) AS crank
         |  FROM assigned a
         |  JOIN qp ON a.centroid_id = qp.centroid_id AND a.vec_id != qp.q_id
         |  JOIN x ON x.vec_id = a.vec_id)
         |SELECT q_id, rank, neighbor_id FROM (
         |  SELECT c.q_id, c.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY c.q_id ORDER BY
         |           list_inner_product(e.v, c.qv) / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(c.qv, c.qv))) DESC,
         |           c.vec_id) AS rank
         |  FROM cand c JOIN e ON e.vec_id = c.vec_id
         |  WHERE c.crank <= $PqCandidates)
         |WHERE rank <= $TopK""".stripMargin

    // IVF×SQ8 twin: the trained-cell probe restriction of ivfSql2 composed
    // with sqSql's midpoint de-quantized asymmetric scoring + exact re-rank.
    val ivfSqSql =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |mm AS (SELECT dd.d AS d, min(v[dd.d]) AS mn, max(v[dd.d]) AS mx
         |       FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) AS d) dd GROUP BY 1),
         |c AS (SELECT e.vec_id,
         |             list(CASE WHEN mm.mx = mm.mn THEN mm.mn
         |                       ELSE mm.mn + (CAST(least(255, greatest(0, CAST(floor((e.v[mm.d] - mm.mn) / (mm.mx - mm.mn) * 255.0) AS BIGINT))) AS DOUBLE) + 0.5) * (mm.mx - mm.mn) / 255.0
         |                  END ORDER BY mm.d) AS xhat
         |      FROM e, mm GROUP BY e.vec_id),
         |qp AS (
         |  SELECT q_id, qv, c_id AS centroid_id FROM (
         |    SELECT q.q_id, q.qv, cc.c_id,
         |           row_number() OVER (PARTITION BY q.q_id ORDER BY
         |             list_inner_product(q.qv, cc.cv) / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(cc.cv, cc.cv))) DESC,
         |             cc.c_id) AS pn
         |    FROM (SELECT vec_id AS q_id, v AS qv FROM assigned WHERE vec_id < $NumQueries) q, c$KMeansIters cc)
         |  WHERE pn <= $IvfProbes),
         |cand AS (
         |  SELECT a.vec_id, qp.q_id, qp.qv,
         |         row_number() OVER (PARTITION BY qp.q_id ORDER BY
         |           list_inner_product(c.xhat, qp.qv) / (sqrt(list_inner_product(c.xhat, c.xhat)) * sqrt(list_inner_product(qp.qv, qp.qv))) DESC,
         |           a.vec_id) AS crank
         |  FROM assigned a
         |  JOIN qp ON a.centroid_id = qp.centroid_id AND a.vec_id != qp.q_id
         |  JOIN c ON c.vec_id = a.vec_id)
         |SELECT q_id, rank, neighbor_id FROM (
         |  SELECT cand.q_id, e.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY cand.q_id ORDER BY
         |           list_inner_product(e.v, cand.qv) / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(cand.qv, cand.qv))) DESC,
         |           e.vec_id) AS rank
         |  FROM cand JOIN e ON e.vec_id = cand.vec_id
         |  WHERE cand.crank <= $SqCandidates)
         |WHERE rank <= $TopK""".stripMargin

    // r5 twin: the shared k-means chain re-unrolled (same CTEs as ivfSql),
    // then cell-local cross-side pairs, per-endpoint top-K neighborhoods
    // by (s1 DESC, id) — the exact order graft_topk keeps, since s1 longs
    // are exactly representable as its ordering doubles — mutual-NN join,
    // and the all-integer ratio margin. s1 = 1 + floor((1+cos)·2^20):
    // strictly positive, so // here equals Spark's truncating div.
    // the mining pass parameterized by a b-side predicate — the SAME block
    // instantiates r5 (unrestricted) and w6's three per-shard refreshes,
    // mirroring the Spark side's shared bitextMine
    def bitextBlock(tag: String, bPred: String): String =
      s"""sb$tag AS (SELECT b.vec_id AS b_id, b.v AS bv, b.centroid_id AS cell
         |       FROM assigned b JOIN lab l ON l.vec_id = b.vec_id WHERE l.label % 2 = 1$bPred),
         |p$tag AS (SELECT sa.cell, a_id, b_id,
         |        1 + CAST(floor((1.0 + list_inner_product(av, bv) / (sqrt(list_inner_product(av, av)) * sqrt(list_inner_product(bv, bv)))) * $BitextFp) AS BIGINT) AS s1
         |      FROM sa JOIN sb$tag ON sa.cell = sb$tag.cell),
         |fr$tag AS (SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY s1 DESC, b_id) AS rn FROM p$tag),
         |fwd$tag AS (SELECT a_id, any_value(cell) AS cell,
         |               max(CASE WHEN rn = 1 THEN b_id END) AS b1,
         |               max(CASE WHEN rn = 1 THEN s1 END) AS s1,
         |               sum(s1) FILTER (WHERE rn <= $BitextK) AS da,
         |               count(*) FILTER (WHERE rn <= $BitextK) AS ka
         |        FROM fr$tag GROUP BY a_id),
         |br$tag AS (SELECT *, row_number() OVER (PARTITION BY b_id ORDER BY s1 DESC, a_id) AS rn FROM p$tag),
         |bwd$tag AS (SELECT b_id,
         |               max(CASE WHEN rn = 1 THEN a_id END) AS a1,
         |               sum(s1) FILTER (WHERE rn <= $BitextK) AS db,
         |               count(*) FILTER (WHERE rn <= $BitextK) AS kb
         |        FROM br$tag GROUP BY b_id),
         |res$tag AS (SELECT f.a_id, f.b1 AS b_id, f.cell::BIGINT AS cell,
         |       ((2000 * f.s1 * f.ka * w.kb) // (f.da * w.kb + w.db * f.ka))::BIGINT AS margin_permille
         |FROM fwd$tag f JOIN bwd$tag w ON w.b_id = f.b1 AND w.a1 = f.a_id)""".stripMargin
    val bitextPrefix =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$ivfIndexCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |sa AS (SELECT a.vec_id AS a_id, a.v AS av, a.centroid_id AS cell
         |       FROM assigned a JOIN lab l ON l.vec_id = a.vec_id WHERE l.label % 2 = 0)""".stripMargin
    val bitextSql =
      s"""$bitextPrefix,
         |${bitextBlock("", "")}
         |SELECT a_id, b_id, cell, margin_permille FROM res""".stripMargin
    val w6Blocks = (0 until 3).map(i => bitextBlock(i.toString, s" AND b.vec_id % 3 = $i")).mkString(",\n")
    // w6 twin: every per-shard refresh rebuilt from the same trained
    // chain; the streamed sink must equal the union exactly
    val w6Sql =
      s"""$bitextPrefix,
         |$w6Blocks
         |SELECT drop_id, a_id, b_id, cell, margin_permille FROM (
         |  SELECT 0::BIGINT AS drop_id, * FROM res0
         |  UNION ALL SELECT 1::BIGINT, * FROM res1
         |  UNION ALL SELECT 2::BIGINT, * FROM res2)""".stripMargin
    val w6AuditSql =
      s"""$bitextPrefix,
         |$w6Blocks,
         |mined AS (
         |  SELECT 0::BIGINT AS drop_id, count(*)::BIGINT AS n_mined, count(DISTINCT cell)::BIGINT AS n_cells FROM res0
         |  UNION ALL SELECT 1::BIGINT, count(*)::BIGINT, count(DISTINCT cell)::BIGINT FROM res1
         |  UNION ALL SELECT 2::BIGINT, count(*)::BIGINT, count(DISTINCT cell)::BIGINT FROM res2),
         |batches AS (SELECT (vec_id % 3)::BIGINT AS drop_id, count(*)::BIGINT AS n_batch
         |            FROM embeddings WHERE label % 2 = 1 GROUP BY 1)
         |SELECT b.drop_id, b.n_batch, coalesce(m.n_mined, 0)::BIGINT AS n_mined,
         |       coalesce(m.n_cells, 0)::BIGINT AS n_cells
         |FROM batches b LEFT JOIN mined m ON m.drop_id = b.drop_id""".stripMargin


    Map(
      "d1_exact_dedup" ->
        """SELECT doc_id, md5(text) AS content_hash,
          |       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
          |FROM documents""".stripMargin,
      "d3_embedding_neardup" -> neardupSql,
      "d13_semdedup" -> semdedupSql,
      "d15_cell_skew_audit" -> cellAuditSql,
      "d2_minhash_lsh" -> minhashSql,
      "d16_incremental_dedup" -> incrSql,
      "d10_simhash_neardup" -> simhashDupSql,
      "d11_band_skew_audit" -> bandAuditSql,
      "d12_state_audit" -> streamAuditSql,
      "d12_stream_neardup" -> streamDupSql,
      "d4_ngram_jaccard" ->
        s"""WITH $ngramPairCtes
           |SELECT doc_a, doc_b, inter_cnt, union_cnt FROM dup""".stripMargin,
      // d21 twin: the minhash family's sigs/bands/pairs (shared with d2's
      // twin) + the d4 truth chain instantiated over sigs.shingle_set
      // (the same distinct-bigram frame as ngramPairCtes' sets.sset),
      // LEFT-joined on the ordered pair key, decile rollup.
      "d21_banding_loss" ->
        s"""WITH $minhashCtes, $minhashPairsCtes, ${ngramTruthCtes("sigs", "shingle_set")}
           |SELECT ((1000 * inter_cnt) // union_cnt) // 100 AS jac_band,
           |  count(*) AS n_true_pairs,
           |  CAST(sum(CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
           |  CAST((1000 * sum(CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS caught_permille
           |FROM dup d LEFT JOIN pairs p ON p.doc_a = d.doc_a AND p.doc_b = d.doc_b
           |GROUP BY 1""".stripMargin,
      // d22 twin: d4's dup CTE, both endpoints bucketed by the SAME d5
      // split arithmetic, ordered pair rollup.
      "d22_split_leakage" ->
        s"""WITH $ngramPairCtes,
           |lab AS (
           |  SELECT doc_a, doc_b, inter_cnt, union_cnt,
           |         ${CorpusQueries.splitCaseOf("doc_a")} AS split_a,
           |         ${CorpusQueries.splitCaseOf("doc_b")} AS split_b
           |  FROM dup),
           |x AS (
           |  SELECT inter_cnt, union_cnt,
           |         least(split_a, split_b) AS split_lo, greatest(split_a, split_b) AS split_hi,
           |         CASE WHEN split_a = least(split_a, split_b) THEN doc_a ELSE doc_b END AS doc_lo,
           |         CASE WHEN split_a = least(split_a, split_b) THEN doc_b ELSE doc_a END AS doc_hi
           |  FROM lab WHERE split_a != split_b)
           |SELECT split_lo, split_hi, count(*) AS n_pairs,
           |  CAST(count(DISTINCT doc_lo) AS BIGINT) AS n_docs_lo,
           |  CAST(count(DISTINCT doc_hi) AS BIGINT) AS n_docs_hi,
           |  CAST((1000 * sum(inter_cnt)) // sum(union_cnt) AS BIGINT) AS mean_jaccard_permille
           |FROM x GROUP BY 1, 2""".stripMargin,
      // t26 twin: d4's dup CTE joined to sources, ordered pair key,
      // identical integer permille rollup
      "t26_source_overlap" ->
        s"""WITH $ngramPairCtes
           |SELECT least(da.source, db.source) AS source_a,
           |       greatest(da.source, db.source) AS source_b,
           |       count(*) AS n_dup_pairs,
           |       CAST(sum(inter_cnt) AS BIGINT) AS sum_inter,
           |       CAST((1000 * sum(inter_cnt)) // sum(union_cnt) AS BIGINT) AS mean_jaccard_permille
           |FROM dup
           |JOIN documents da ON da.doc_id = dup.doc_a
           |JOIN documents db ON db.doc_id = dup.doc_b
           |GROUP BY 1, 2""".stripMargin,

      // d19 twin: same candidate CTEs, exact |∩| with both set sizes,
      // the same permille containment gate in both directions
      "d19_containment" ->
        s"""WITH $ngramPairCtes,
           |sc AS (
           |  SELECT doc_a, doc_b,
           |    CAST(len(list_intersect(sa.sset, sb.sset)) AS BIGINT) AS inter_cnt,
           |    CAST(len(sa.sset) AS BIGINT) AS na, CAST(len(sb.sset) AS BIGINT) AS nb
           |  FROM cand JOIN sets sa ON sa.doc_id = doc_a JOIN sets sb ON sb.doc_id = doc_b
           |)
           |SELECT doc_a AS contained_id, doc_b AS container_id, inter_cnt,
           |       na AS n_contained, nb AS n_container
           |FROM sc WHERE inter_cnt * 1000 >= $ContainPermille * na
           |UNION ALL
           |SELECT doc_b, doc_a, inter_cnt, nb, na
           |FROM sc WHERE inter_cnt * 1000 >= $ContainPermille * nb""".stripMargin,
      // reuses the base/sh/sets prefix; DuckDB prunes the unused pair CTEs
      "d9_decontaminate" ->
        s"""WITH $ngramPairCtes,
           |evalv AS (SELECT DISTINCT unnest(sset) AS s FROM sets WHERE doc_id % 50 = 0),
           |train AS (SELECT doc_id, sset FROM sets WHERE doc_id % 50 != 0),
           |m AS (
           |  SELECT t.doc_id, count(*) AS inter_cnt
           |  FROM (SELECT doc_id, unnest(sset) AS s FROM train) t JOIN evalv USING (s)
           |  GROUP BY 1
           |),
           |scored AS (
           |  SELECT tr.doc_id, len(tr.sset) AS n_shingles, coalesce(m.inter_cnt, 0) AS inter_cnt
           |  FROM train tr LEFT JOIN m ON m.doc_id = tr.doc_id
           |)
           |SELECT d.source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN 5 * inter_cnt >= 3 * n_shingles THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           |  CAST(sum(inter_cnt) AS BIGINT) AS sum_overlap,
           |  CAST(sum(n_shingles) AS BIGINT) AS sum_shingles
           |FROM scored JOIN documents d USING (doc_id)
           |GROUP BY 1""".stripMargin,
      // d18 twin: rebuild the identical Bloom filter (distinct eval grams
      // → 3 fnv32 positions → 32-bit-word bit_or) and probe each train
      // gram through a LEFT JOIN on the word index — all-3-bits-set is
      // the same predicate the Spark literal-array probe evaluates.
      "d18_bloom_decontaminate" ->
        s"""WITH $ngramPairCtes,
           |seeds AS (SELECT unnest(generate_series(0, ${BloomHashes - 1})) AS j),
           |evalg AS (SELECT DISTINCT unnest(sset) AS g FROM sets WHERE doc_id % 50 = 0),
           |epos AS (
           |  SELECT DISTINCT (${fnv32Expr("j::VARCHAR || ':' || g")}) % $BloomBits AS p
           |  FROM evalg, seeds),
           |filt AS (
           |  SELECT p // $BloomWordBits AS w,
           |         bit_or(1::BIGINT << (p % $BloomWordBits)::INT) AS bits
           |  FROM epos GROUP BY 1),
           |fill AS (SELECT CAST(coalesce(sum(bit_count(bits)), 0) AS BIGINT) AS set_bits FROM filt),
           |gr AS (
           |  SELECT doc_id, unnest(sset) AS g FROM sets WHERE doc_id % 50 != 0),
           |probe AS (
           |  SELECT gr.doc_id, gr.g, (${fnv32Expr("j::VARCHAR || ':' || g")}) % $BloomBits AS p
           |  FROM gr, seeds),
           |pg AS (
           |  SELECT probe.doc_id, probe.g,
           |         min(CASE WHEN f.bits IS NOT NULL
           |                   AND (f.bits & (1::BIGINT << (p % $BloomWordBits)::INT)) != 0
           |                  THEN 1 ELSE 0 END) AS hit
           |  FROM probe LEFT JOIN filt f ON f.w = p // $BloomWordBits
           |  GROUP BY 1, 2),
           |bc AS (SELECT doc_id, CAST(sum(hit) AS BIGINT) AS bloom_cnt FROM pg GROUP BY 1)
           |SELECT d.source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN 5 * bloom_cnt >= 3 * n_shingles THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           |  CAST(sum(bloom_cnt) AS BIGINT) AS sum_overlap,
           |  CAST(sum(n_shingles) AS BIGINT) AS sum_shingles,
           |  CAST(any_value(set_bits) AS BIGINT) AS bloom_set_bits,
           |  CAST(any_value(set_bits) * 1000 // $BloomBits AS BIGINT) AS fill_permille
           |FROM (SELECT tb.doc_id, len(tb.sset)::BIGINT AS n_shingles,
           |             coalesce(bc.bloom_cnt, 0) AS bloom_cnt
           |      FROM (SELECT doc_id, sset FROM sets WHERE doc_id % 50 != 0) tb
           |      LEFT JOIN bc USING (doc_id)) scored
           |JOIN documents d USING (doc_id), fill
           |GROUP BY 1""".stripMargin,
      "d6_dedup_clusters" ->
        s"""WITH RECURSIVE $ngramPairCtes,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM dup UNION ALL SELECT doc_b, doc_a FROM dup),
           |reach(u, m) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.u, r.m FROM edges e JOIN reach r ON r.u = e.v
           |)
           |SELECT u AS doc_id, min(m) AS cluster_id, (min(m) = u) AS is_canonical
           |FROM reach GROUP BY 1""".stripMargin,
      // d6's component CTEs composed with d5's deterministic split: the
      // end-to-end curation pipeline over only canonical representatives
      "d7_curation_split" ->
        s"""WITH RECURSIVE $ngramPairCtes,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM dup UNION ALL SELECT doc_b, doc_a FROM dup),
           |reach(u, m) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.u, r.m FROM edges e JOIN reach r ON r.u = e.v
           |),
           |canon AS (SELECT u AS doc_id FROM reach GROUP BY u HAVING min(m) = u)
           |SELECT source,
           |  ${CorpusQueries.splitCaseOf("doc_id")} AS split,
           |  count(*) AS n_docs,
           |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM (SELECT d.source, d.doc_id, d.n_chars
           |      FROM documents d JOIN canon USING (doc_id))
           |GROUP BY 1, 2""".stripMargin,
      // d20 twin: d6's component CTEs + the shared t14 classifier score
      // (scored over ngramPairCtes' own `base` words frame), argmax via
      // row_number(score DESC, doc_id) — the min(struct(-score, doc_id))
      // twin.
      "d20_cluster_canon" ->
        s"""WITH RECURSIVE $ngramPairCtes,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM dup UNION ALL SELECT doc_b, doc_a FROM dup),
           |reach(u, m) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.u, r.m FROM edges e JOIN reach r ON r.u = e.v
           |),
           |cl AS (SELECT u AS doc_id, min(m) AS cluster_id FROM reach GROUP BY 1),
           |scq AS (SELECT doc_id, ${duckQualityScore("words")} AS score FROM base),
           |j AS (SELECT cl.cluster_id, cl.doc_id, scq.score FROM cl JOIN scq USING (doc_id)),
           |best AS (
           |  SELECT cluster_id, doc_id, score,
           |         row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rn
           |  FROM j),
           |ag AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members FROM j GROUP BY 1)
           |SELECT a.cluster_id, a.n_members,
           |  b.doc_id AS keep_doc_id, b.score AS keep_score,
           |  m.score AS minid_score,
           |  (b.doc_id = a.cluster_id) AS policies_agree
           |FROM ag a
           |JOIN best b ON b.cluster_id = a.cluster_id AND b.rn = 1
           |JOIN j m ON m.cluster_id = a.cluster_id AND m.doc_id = a.cluster_id
           |WHERE a.n_members >= 2""".stripMargin,
      "t3_winnowing"   -> winnowSql,
      "t2_fingerprint" -> simhashSql,
      "t1_text_stats"  -> statsSql,
      "ann_topk_brute" -> bruteSql,
      // r6 twin: the brute top-K embedded whole, labels joined back, the
      // same integer permille/ppm scoring
      "r6_retrieval_eval" ->
        s"""WITH hits AS ($bruteSql),
           |lab AS (SELECT vec_id, label FROM embeddings),
           |j AS (
           |  SELECT h.q_id, h.rank,
           |         CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END AS rel
           |  FROM hits h
           |  JOIN lab nl ON nl.vec_id = h.neighbor_id
           |  JOIN lab ql ON ql.vec_id = h.q_id
           |)
           |SELECT q_id,
           |  sum(rel)::BIGINT AS n_relevant,
           |  ((1000 * sum(rel)) // count(*))::BIGINT AS p_at_k_permille,
           |  coalesce(min(CASE WHEN rel = 1 THEN rank END), 0)::BIGINT AS first_rel_rank,
           |  coalesce(1000000 // min(CASE WHEN rel = 1 THEN rank END), 0)::BIGINT AS rr_ppm
           |FROM j GROUP BY 1""".stripMargin,
      // r3 twin: brute top-C candidates (bruteSql's ranking at C), the
      // C×C pair-sim table, then the K greedy MMR rounds unrolled as
      // CTE pairs (score over not-yet-selected → row_number argmax).
      // All doubles come from the same list_inner_product/sqrt shapes
      // the Spark side evaluates, so scores — and their ties — agree
      // bit-for-bit.
      "r3_mmr_rerank" -> {
        def cosd(a: String, b: String) =
          s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"
        def selUnion(i: Int) =
          (1 to i).map(j => s"SELECT q_id, vec_id FROM s$j").mkString(" UNION ALL ")
        def round(i: Int) =
          s"""sc$i AS (
             |  SELECT c.q_id, c.vec_id, c.rel, 0.5 * c.rel - 0.5 * max(p.sim) AS score
             |  FROM cand c
             |  JOIN (${selUnion(i - 1)}) sel ON sel.q_id = c.q_id
             |  JOIN ps p ON p.q_id = c.q_id AND p.a_id = c.vec_id AND p.b_id = sel.vec_id
             |  LEFT JOIN (${selUnion(i - 1)}) ex ON ex.q_id = c.q_id AND ex.vec_id = c.vec_id
             |  WHERE ex.vec_id IS NULL
             |  GROUP BY c.q_id, c.vec_id, c.rel),
             |s$i AS (
             |  SELECT q_id, vec_id FROM (
             |    SELECT q_id, vec_id,
             |           row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
             |    FROM sc$i) WHERE rn = 1)""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
           |scored AS (
           |  SELECT q.q_id, c.vec_id, ${cosd("c.v", "q.qv")} AS rel
           |  FROM e c JOIN q ON c.vec_id != q.q_id),
           |cand AS (
           |  SELECT q_id, vec_id, rel FROM (
           |    SELECT q_id, vec_id, rel,
           |           row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
           |    FROM scored) WHERE rn <= $MmrCandidates),
           |ps AS (
           |  SELECT a.q_id, a.vec_id AS a_id, b.vec_id AS b_id, ${cosd("ea.v", "eb.v")} AS sim
           |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.vec_id != b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id),
           |s1 AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |           row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
           |    FROM cand) WHERE rn = 1),
           |${(2 to MmrK).map(round).mkString(",\n")}
           |${(1 to MmrK)
               .map(i => s"SELECT q_id, $i::BIGINT AS rank, vec_id FROM s$i")
               .mkString("\nUNION ALL\n")}""".stripMargin
      },
      "r1_rag_retrieve" ->
        s"""WITH hits AS ($bruteSql)
           |SELECT h.q_id, h.rank, h.neighbor_id, d.source, d.n_chars
           |FROM hits h JOIN documents d ON d.doc_id = h.neighbor_id""".stripMargin,
      // r7 twin: brute first pass → fixed-point feedback mean (the
      // labelScoredCtes centroid pattern keyed by q_id) → q + fv shift →
      // brute second pass, held-hit flag via LEFT JOIN against the first
      // pass. Same floor(x·2^20) sums and binary64 division as Spark.
      "r7_rocchio_prf" ->
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id, c.v AS cv,
           |         list_inner_product(c.v, q.v) / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(q.v, q.v))) AS sim
           |  FROM e q JOIN e c ON c.vec_id != q.vec_id
           |  WHERE q.vec_id < $NumQueries),
           |first AS (
           |  SELECT q_id, neighbor_id, cv, rank FROM (
           |    SELECT q_id, neighbor_id, cv,
           |           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
           |    FROM scored)
           |  WHERE rank <= $TopK),
           |fv AS (
           |  SELECT q_id, list(fs::DOUBLE / (n::DOUBLE * 1048576.0) ORDER BY d) AS fv FROM (
           |    SELECT q_id, dd.d AS d,
           |           sum(CAST(floor(cv[dd.d] * 1048576) AS BIGINT)) AS fs, count(*) AS n
           |    FROM first, (SELECT unnest(generate_series(1, $EmbeddingDim)) AS d) dd
           |    GROUP BY 1, 2)
           |  GROUP BY 1),
           |q2 AS (
           |  SELECT q.vec_id AS q_id,
           |         list_transform(generate_series(1, $EmbeddingDim), i -> q.v[i] + fv.fv[i]) AS qv
           |  FROM e q JOIN fv ON fv.q_id = q.vec_id),
           |re AS (
           |  SELECT q2.q_id, c.vec_id AS neighbor_id,
           |         list_inner_product(c.v, q2.qv) / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(q2.qv, q2.qv))) AS sim
           |  FROM q2 JOIN e c ON c.vec_id != q2.q_id),
           |rr AS (
           |  SELECT q_id, neighbor_id,
           |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
           |  FROM re)
           |SELECT rr.q_id, rr.rank, rr.neighbor_id,
           |       coalesce(f.rank, 0) AS first_rank
           |FROM rr LEFT JOIN first f
           |  ON f.q_id = rr.q_id AND f.neighbor_id = rr.neighbor_id
           |WHERE rr.rank <= $TopK""".stripMargin,
      // r4 twin: bruteSql with the label inequality in the scored join
      // and the negative's label carried through the rank cut.
      "r4_hard_negatives" ->
        s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
           |         list_inner_product(c.v, q.v) / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(q.v, q.v))) AS sim
           |  FROM e q JOIN e c ON c.vec_id != q.vec_id AND c.label != q.label
           |  WHERE q.vec_id < $NumQueries
           |)
           |SELECT q_id, rank, neighbor_id, neighbor_label::BIGINT AS neighbor_label FROM (
           |  SELECT q_id, neighbor_id, neighbor_label,
           |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
           |  FROM scored)
           |WHERE rank <= $TopK""".stripMargin,
      // e1 twin: per-label fixed-point centroids (the ivfUpdateSql
      // pattern keyed by label) + floor(cos·2^20) member folds. The
      // e/c/sc block is [[labelScoredCtes]], shared with e2 so the
      // centroid semantics cannot drift between the twins (the
      // ngramPairCtes discipline — the Spark side already shares
      // labelScored).
      "e1_embedding_coherence" ->
        s"""WITH $labelScoredCtes
           |SELECT label::BIGINT AS label, count(*) AS n_vecs,
           |  CAST(sum(cos_fp) AS BIGINT) AS sum_cos_fp,
           |  min(cos_fp) AS min_cos_fp,
           |  max(cos_fp) AS max_cos_fp
           |FROM sc GROUP BY 1""".stripMargin,
      // e2 twin: e1's shared scored CTE, the floored integer mean
      // band, and the two-level (min cos, then min vec_id) argmin
      "e2_embedding_outliers" ->
        s"""WITH $labelScoredCtes,
           |st AS (SELECT label, sum(cos_fp) // count(*) AS mean_fp FROM sc GROUP BY 1),
           |w AS (SELECT label, min(cos_fp) AS worst_cos FROM sc GROUP BY 1)
           |SELECT sc.label::BIGINT AS label, count(*) AS n_vecs,
           |  CAST(sum(CASE WHEN sc.cos_fp * 1000 < $OutlierPermille * st.mean_fp THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           |  min(sc.cos_fp) AS worst_cos_fp,
           |  CAST(min(CASE WHEN sc.cos_fp = w.worst_cos THEN sc.vec_id END) AS BIGINT) AS worst_vec_id,
           |  CAST(min(st.mean_fp) AS BIGINT) AS mean_fp
           |FROM sc JOIN st USING (label) JOIN w ON w.label = sc.label
           |GROUP BY 1""".stripMargin,
      // e3 twin: sqSql's mm/xhat reconstruction CTEs (midpoint
      // de-quantization from the SAME corpus min/max), each vector scored
      // against its own reconstruction as floor(cos·2^20), the e2-style
      // floored mean and two-level argmin.
      "e3_quantization_error" ->
        s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           |mm AS (SELECT dd.d AS d, min(v[dd.d]) AS mn, max(v[dd.d]) AS mx
           |       FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) AS d) dd GROUP BY 1),
           |c AS (SELECT e.vec_id, e.label, e.v,
           |             list(CASE WHEN mm.mx = mm.mn THEN mm.mn
           |                       ELSE mm.mn + (CAST(least(255, greatest(0, CAST(floor((e.v[mm.d] - mm.mn) / (mm.mx - mm.mn) * 255.0) AS BIGINT))) AS DOUBLE) + 0.5) * (mm.mx - mm.mn) / 255.0
           |                  END ORDER BY mm.d) AS xhat
           |      FROM e, mm GROUP BY e.vec_id, e.label, e.v),
           |sq AS (SELECT label, vec_id,
           |              CAST(floor((list_inner_product(v, xhat) / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(xhat, xhat)))) * 1048576) AS BIGINT) AS cos_fp
           |       FROM c),
           |w AS (SELECT label, min(cos_fp) AS worst_cos FROM sq GROUP BY 1)
           |SELECT sq.label::BIGINT AS label, count(*) AS n_vecs,
           |  CAST(sum(sq.cos_fp) // count(*) AS BIGINT) AS avg_cos_fp,
           |  min(sq.cos_fp) AS worst_cos_fp,
           |  CAST(min(CASE WHEN sq.cos_fp = w.worst_cos THEN sq.vec_id END) AS BIGINT) AS worst_vec_id
           |FROM sq JOIN w ON w.label = sq.label
           |GROUP BY 1""".stripMargin,
      // e5 twin: per-(label, slice) fixed-point centroids (the e1 pattern
      // with the parity slice key), centroid-pair cosine as floor·2^20,
      // floored per-slice mean norms from per-row integer norms.
      "e5_embedding_drift" ->
        s"""WITH e AS (SELECT vec_id, label, vec_id % 2 AS slice, embedding::DOUBLE[] AS v FROM embeddings),
           |c AS (
           |  SELECT label, slice, list(s::DOUBLE / (n::DOUBLE * 1048576.0) ORDER BY d) AS cv FROM (
           |    SELECT label, slice, dd.d AS d,
           |           sum(CAST(floor(v[dd.d] * 1048576) AS BIGINT)) AS s, count(*) AS n
           |    FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) AS d) dd
           |    GROUP BY 1, 2, 3)
           |  GROUP BY 1, 2),
           |norms AS (
           |  SELECT label,
           |    sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
           |    sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
           |    (sum(CASE WHEN slice = 0 THEN CAST(floor(sqrt(list_inner_product(v, v)) * 1048576) AS BIGINT) ELSE 0 END)
           |       // greatest(sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END), 1))::BIGINT AS avg_norm_fp_a,
           |    (sum(CASE WHEN slice = 1 THEN CAST(floor(sqrt(list_inner_product(v, v)) * 1048576) AS BIGINT) ELSE 0 END)
           |       // greatest(sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END), 1))::BIGINT AS avg_norm_fp_b
           |  FROM e GROUP BY 1)
           |SELECT n.label::BIGINT AS label, n.n_a, n.n_b,
           |  CAST(floor((list_inner_product(ca.cv, cb.cv) / (sqrt(list_inner_product(ca.cv, ca.cv)) * sqrt(list_inner_product(cb.cv, cb.cv)))) * 1048576) AS BIGINT) AS drift_cos_fp,
           |  n.avg_norm_fp_a, n.avg_norm_fp_b
           |FROM norms n
           |JOIN c ca ON ca.label = n.label AND ca.slice = 0
           |JOIN c cb ON cb.label = n.label AND cb.slice = 1""".stripMargin,
            // r2 twin: the lexical arm re-derives the integer idf-bits ranking,
      // the dense arm embeds the ivf probe-2 query whole (DuckDB allows a
      // nested WITH inside a CTE body), fusion is the same integer RRF.
      "r2_hybrid_retrieve" ->
        s"""WITH base AS (SELECT doc_id, $duckWords AS words FROM documents),
           |posts AS (SELECT doc_id, unnest(list_distinct(words)) AS w FROM base),
           |dfreq AS (SELECT w, count(*) AS df FROM posts GROUP BY 1),
           |qterms AS (SELECT doc_id AS q_id, w FROM posts WHERE doc_id < $NumQueries),
           |qw AS (
           |  SELECT q.q_id, q.w, $RrfIdfScale - length(bin(d.df)) AS idf_bits
           |  FROM qterms q JOIN dfreq d USING (w)),
           |lex AS (
           |  SELECT qw.q_id, p.doc_id, CAST(sum(qw.idf_bits) AS BIGINT) AS lex
           |  FROM posts p JOIN qw ON p.w = qw.w AND p.doc_id != qw.q_id
           |  GROUP BY 1, 2),
           |lextop AS (
           |  SELECT q_id, doc_id AS neighbor_id, lex_rank FROM (
           |    SELECT q_id, doc_id,
           |           row_number() OVER (PARTITION BY q_id ORDER BY lex DESC, doc_id) AS lex_rank
           |    FROM lex)
           |  WHERE lex_rank <= $TopK),
           |vectop AS (SELECT q_id, neighbor_id, rank AS vec_rank FROM ($ivfSql2)),
           |fused AS (
           |  SELECT coalesce(l.q_id, v.q_id) AS q_id,
           |         coalesce(l.neighbor_id, v.neighbor_id) AS neighbor_id,
           |         coalesce(1000000 // ($RrfK + l.lex_rank), 0) + coalesce(1000000 // ($RrfK + v.vec_rank), 0) AS rrf
           |  FROM lextop l FULL JOIN vectop v
           |    ON l.q_id = v.q_id AND l.neighbor_id = v.neighbor_id)
           |SELECT q_id, rank, neighbor_id, rrf FROM (
           |  SELECT q_id, neighbor_id, CAST(rrf AS BIGINT) AS rrf,
           |         row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, neighbor_id) AS rank
           |  FROM fused)
           |WHERE rank <= $TopK""".stripMargin,
      "ann_lsh_nn"     -> lshSql,
      "r5_bitext_mining" -> bitextSql,
      "w6_stream_bitext" -> w6Sql,
      "w6_mining_audit"  -> w6AuditSql,
      // w7 twin: the t14 rollup keyed by (shard, source) over the raw
      // corpus — the same shared scorer arithmetic as t14's twin.
      "w7_stream_quality_gate" ->
        s"""WITH w AS (
           |  SELECT doc_id % 3 AS drop_id, source,
           |         list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS words
           |  FROM documents)
           |SELECT drop_id::BIGINT AS drop_id, source, count(*) AS n_docs,
           |  sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END)::BIGINT AS n_keep,
           |  CAST(sum(score) AS BIGINT) AS sum_score
           |FROM (SELECT drop_id, source, ${duckQualityScore("words")} AS score FROM w)
           |GROUP BY 1, 2""".stripMargin,
      "ann_ivf_probe"  -> ivfSql,
      "ann_ivf_probe2" -> ivfSql2,
      "ann_incremental_add" -> incAddSql,
      "ann_sq_topk"    -> sqSql,
      "ann_pq_topk"    -> pqSql,
      // e4 twin: the shared pqIndexCtes reconstruction (`x` — per-vector
      // xhat from the trained packed codebook), each vector scored
      // against its own reconstruction, the e3-style floored mean and
      // two-level argmin.
      "e4_pq_error" ->
        s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           |$ivfIndexCtes,
           |$pqIndexCtes,
           |sc AS (SELECT e.label, e.vec_id,
           |              CAST(floor((list_inner_product(e.v, x.xhat) / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(x.xhat, x.xhat)))) * 1048576) AS BIGINT) AS cos_fp
           |       FROM e JOIN x ON x.vec_id = e.vec_id),
           |w AS (SELECT label, min(cos_fp) AS worst_cos FROM sc GROUP BY 1)
           |SELECT sc.label::BIGINT AS label, count(*) AS n_vecs,
           |  CAST(sum(sc.cos_fp) // count(*) AS BIGINT) AS avg_cos_fp,
           |  min(sc.cos_fp) AS worst_cos_fp,
           |  CAST(min(CASE WHEN sc.cos_fp = w.worst_cos THEN sc.vec_id END) AS BIGINT) AS worst_vec_id
           |FROM sc JOIN w ON w.label = sc.label
           |GROUP BY 1""".stripMargin,
      "ann_ivfpq_topk" -> ivfPqSql,
      "ann_ivfsq_topk" -> ivfSqSql,
      "m1_multimodal"  -> Multimodal.oracleSql,
      "m2_frame_sample" -> Multimodal.frameOracleSql,
      "m3_image_decode" -> Multimodal.decodeOracleSql,
      "m4_audio_decode" -> Multimodal.audioOracleSql,
      "m5_image_phash"  -> Multimodal.phashOracleSql
    )
  }
}
