package graft

import graft.llm.LlmQueries
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Behavioral checks of the LLM-pipeline operators on constructed fixtures
  * (known duplicates, known nearest neighbors). */
class LlmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Fixture dir with documents.parquet + embeddings.parquet. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-llm-fixture-").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "src0", 43L),
      (1L, "the quick brown fox jumps over the lazy dog", "en", "src1", 43L), // exact dup of 0
      (2L, "the quick brown fox jumps over a sleepy dog", "en", "src2", 43L), // near dup of 0
      (3L, "completely different words entirely here now", "en", "src3", 44L),
      (4L, "of and to in the a", "en", "src9", 18L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    val dim = LlmQueries.EmbeddingDim
    def unit(axis: Int, eps: Float): Seq[Float] =
      Seq.tabulate(dim)(i => (if (i == axis) 1.0f else 0.0f) + (if (i == (axis + 1) % dim) eps else 0.0f))
    Seq(
      (0L, unit(0, 0.0f), 0),
      (1L, unit(0, 0.01f), 0), // nearly identical to 0
      (2L, unit(5, 0.0f), 1),
      (3L, unit(5, 0.02f), 1), // nearly identical to 2
      (4L, unit(20, 0.0f), 2),
      (8L, unit(0, 0.3f), 0),  // non-centroid (>= NumCentroids): lands in cell 0 or 1
      (9L, unit(5, 0.25f), 1)  // non-centroid: lands in cell 2 or 3
    ).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String) = LlmQueries.queries(name)(spark, dir)

  test("d1: exact duplicates share a content hash; the smallest doc_id is canonical") {
    val rows = run("d1_exact_dedup").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("content_hash"), r.getAs[Boolean]("is_canonical")))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 === byId(1L)._2, "identical texts must hash identically")
    assert(byId(0L)._3 === true)
    assert(byId(1L)._3 === false)
    assert(rows.filterNot(r => r._1 <= 1).forall(_._3), "unique docs are canonical")
  }

  test("d2: exact and near duplicates surface as LSH candidates with correct Jaccard counts") {
    val pairs = run("d2_minhash_lsh").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("inter_cnt"), r.getAs[Long]("union_cnt")))
    val p01 = pairs.find(p => p._1 == 0 && p._2 == 1)
    assert(p01.isDefined, "identical docs must share every band")
    assert(p01.get._3 === p01.get._4, "identical docs: intersection == union")
    // doc 3 shares no shingles with 0 — any candidate pair with it would be
    // a hash accident; assert none.
    assert(!pairs.exists(p => p._1 == 3 || p._2 == 3))
  }

  test("d16: a batch doc duplicating the corpus is rejected with its corpus partner") {
    // fixture split (IncrEvery=5, slot 0): doc 0 is the incoming batch;
    // docs 1–4 are the corpus. 1 is an exact copy of 0, 2 a near-dup.
    val rows = run("d16_incremental_dedup").collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"), r.getAs[Long]("n_corpus_dups"),
         r.getAs[Long]("n_batch_dups"), Option(r.getAs[java.lang.Long]("best_match")))).toMap
    assert(rows.keySet === Set(0L), "output covers exactly the incoming slice")
    val (verdict, nCorp, nBatch, best) = rows(0L)
    assert(verdict === "reject", "an exact corpus copy must be rejected")
    assert(nCorp >= 1L && best === Some(1L),
      "the rejected doc names its lowest-id corpus partner")
    assert(nBatch === 0L, "no other batch member exists to collide with")
  }

  test("d16: within-batch duplicates admit the first arrival, reject the later copy") {
    val d = Files.createTempDirectory("graft-d16-batch-").toString
    Seq(
      (0L,  "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0", 40L),
      (5L,  "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0", 40L), // batch dup of 0
      (10L, "totally unrelated content sits here sharing no phrasing at all", "en", "s1", 50L),
      (1L,  "corpus resident document one with its very own vocabulary", "en", "s2", 40L),
      (2L,  "another corpus resident covering different ground entirely today", "en", "s3", 40L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = LlmQueries.queries("d16_incremental_dedup")(spark, d).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"), r.getAs[Long]("n_corpus_dups"),
         r.getAs[Long]("n_batch_dups"), Option(r.getAs[java.lang.Long]("best_match")))).toMap
    assert(rows.keySet === Set(0L, 5L, 10L))
    assert(rows(0L)._1 === "admit", "first arrival of a batch-internal dup is admitted")
    assert(rows(5L) === (("reject", 0L, 1L, Some(0L))),
      "the later copy rejects against the earlier batch arrival, not the corpus")
    assert(rows(10L)._1 === "admit", "a unique batch doc admits")
  }

  test("d16: randomized differential vs an independent serial MinHash pipeline") {
    // From-scratch reimplementation (own FNV fold, own permutations from
    // the public constants, own banding/cap/jaccard) — shares NO kernel
    // code with production, so a bug in the Catalyst expressions or the
    // band-bucket plumbing cannot cancel out of the comparison.
    import LlmQueries._
    def fnv(s: String): Long = {
      var h = 2166136261L
      s.foreach(c => h = ((h ^ c.toLong) * 16777619L) % 4294967296L)
      h
    }
    def sigOf(text: String): Option[(Seq[String], Set[String])] = {
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val sh = if (ws.length < 2) Seq.empty[String] else ws.sliding(2).map(_.mkString(" ")).toSeq
      if (sh.isEmpty) None
      else {
        val vh  = sh.map(fnv)
        val sig = (0 until MinHashK).map(k => vh.map(v => (MinHashA(k) * v + MinHashB(k)) % MinHashP).min.toString)
        Some((0 until Bands).map(b => s"$b|" + sig.slice(RowsPerBand * b, RowsPerBand * (b + 1)).mkString("|")) -> sh.toSet)
      }
    }
    def naive(corpus: Seq[(Long, String)]): Map[Long, (String, Long, Long, Option[Long])] = {
      val sigs  = corpus.flatMap { case (id, t) => sigOf(t).map(id -> _) }.toMap
      val isInc = (id: Long) => id % IncrEvery == IncrSlot
      val corpBuckets = sigs.toSeq.filterNot(kv => isInc(kv._1))
        .flatMap { case (id, (bands, _)) => bands.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(BandMaxBucket)).toMap
      val incBands = sigs.toSeq.filter(kv => isInc(kv._1))
        .flatMap { case (id, (bands, _)) => bands.map(id -> _) }
      corpus.filter(d => isInc(d._1)).map { case (id, _) =>
        val mine = sigs.get(id)
        val cands: Set[(Long, String)] = mine match {
          case None => Set.empty
          case Some((bands, _)) =>
            val corp  = bands.flatMap(b => corpBuckets.getOrElse(b, Seq.empty)).map(_ -> "corpus")
            val batch = bands.flatMap(b => incBands.collect { case (j, bb) if bb == b && j < id => j })
              .map(_ -> "batch")
            (corp ++ batch).toSet
        }
        def jacDup(p: Long): Boolean = {
          val (a, bset) = (mine.get._2, sigs(p)._2)
          val inter = a.intersect(bset).size
          2 * inter >= a.size + bset.size - inter
        }
        val dups = cands.filter { case (p, _) => jacDup(p) }
        val best = if (dups.isEmpty) None else Some(dups.map(_._1).min)
        id -> ((if (best.isDefined) "reject" else "admit",
                dups.count(_._2 == "corpus").toLong, dups.count(_._2 == "batch").toLong, best))
      }.toMap
    }
    val vocab = Seq("alpha", "beta", "gamma", "delta", "zeta", "omega", "kappa", "sigma")
    val rnd   = new scala.util.Random(42)
    (1 to 6).foreach { trial =>
      val n = 8 + rnd.nextInt(12)
      val base = (0L until n.toLong).map { id =>
        id -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // plant near-copies so rejects actually occur: later ids copy an
      // earlier doc's text, sometimes with one word appended
      val corpus = base.map { case (id, t) =>
        if (id >= 3 && rnd.nextInt(3) == 0) {
          val src = base(rnd.nextInt(id.toInt))._2
          id -> (if (rnd.nextBoolean()) src else s"$src ${vocab(rnd.nextInt(vocab.size))}")
        } else id -> t
      }
      val d = java.nio.file.Files.createTempDirectory(s"graft-d16-fuzz$trial-").toString
      import spark.implicits._
      corpus.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
      try {
        val got = LlmQueries.queries("d16_incremental_dedup")(spark, d).collect().map(r =>
          r.getAs[Long]("doc_id") ->
            ((r.getAs[String]("verdict"), r.getAs[Long]("n_corpus_dups"),
              r.getAs[Long]("n_batch_dups"),
              Option(r.getAs[java.lang.Long]("best_match")).map(_.toLong)))).toMap
        assert(got == naive(corpus), s"trial $trial diverged on corpus:\n${corpus.mkString("\n")}")
      } finally {
        LlmQueries.evictDir(spark, d)
        graft.core.FsUtil.deleteRecursively(d)
      }
    }
  }

  test("d10: banded SimHash finds exactly the hamming<=3 pairs (brute-force differential)") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // Recompute every signature serially with an INDEPENDENT implementation
    // (plain hex parse + vote loop, no SimHashBands code), then brute-force
    // all pairs: the banded bucket join must return EXACTLY the
    // hamming <= max pairs (pigeonhole completeness + verify soundness).
    def bandsOf(ws: Array[String]): Array[Long] = {
      val votes = Array.fill(64)(0)
      for (w <- ws; h = md5hex(w); j <- 0 until 64) {
        val nib = Integer.parseInt(h.charAt(j / 4).toString, 16)
        votes(j) += ((nib >> (3 - j % 4)) & 1) * 2 - 1
      }
      Array.tabulate(LlmQueries.SimBands)(b =>
        (0 until 16).foldLeft(0L)((acc, i) => if (votes(16 * b + i) > 0) acc | (1L << i) else acc))
    }
    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
      .map { case (id, ws) => id -> bandsOf(ws) }.toMap
    val expected = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
      h = sa.zip(sb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if h <= LlmQueries.SimHammingMax
    } yield (a, b, h.toLong)).toSet
    val got = run("d10_simhash_neardup").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming"))).toSet
    assert(got === expected)
    assert(got.contains((0L, 1L, 0L)), "identical docs must pair at hamming 0")
  }

  test("t3: winnowing fingerprint sets are deterministic and bounded by k-gram count") {
    val rows = run("t3_winnowing").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_kgrams"), r.getAs[Long]("n_fingerprints"),
                 r.getAs[Long]("min_fp"), r.getAs[Long]("max_fp")))
    val byId = rows.map(r => r._1 -> r).toMap
    // identical docs → identical fingerprint profile
    assert(byId(0L).copy(_1 = 1L) === byId(1L))
    rows.foreach { r =>
      assert(r._3 >= 1 && r._3 <= r._2, "winnowed set is non-empty and no larger than the k-gram count")
      assert(r._4 <= r._5)
      assert(r._4 >= 0 && r._5 < (1L << 32), "fingerprints are 32-bit hash values")
    }
  }

  test("t2: SimHash is 16-bit; identical docs get identical fingerprints") {
    val rows = run("t2_fingerprint").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fingerprint"), r.getAs[Long]("simhash16")))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(rows.forall(r => r._3 >= 0 && r._3 < 65536))
    assert(byId(0L)._2 === byId(1L)._2)
    assert(byId(0L)._3 === byId(1L)._3)
    // near-dup differs by one word: hamming distance of simhashes is small
    val ham = java.lang.Long.bitCount(byId(0L)._3 ^ byId(2L)._3)
    assert(ham <= 6, s"near-dup simhash hamming distance was $ham")
  }

  test("t1: token counts, language guess, and quality verdict on known documents") {
    val r = run("t1_text_stats").filter($"doc_id" === 0L).head()
    assert(r.getAs[Long]("n_words") === 9L)
    assert(r.getAs[Long]("n_distinct_words") === 8L) // 'the' twice
    assert(r.getAs[Long]("n_chars") === 43L)
    assert(r.getAs[Long]("n_stop_en") === 2L)
    assert(r.getAs[String]("lang_guess") === "en")
    assert(r.getAs[Long]("n_punct") === 0L)
    assert(r.getAs[Long]("stop_permille") === 222L) // 1000*2/9
    assert(r.getAs[Boolean]("quality_ok"))
    // doc 4 ("of and to in the a", 18 chars) is too short to pass quality
    val short = run("t1_text_stats").filter($"doc_id" === 4L).head()
    assert(!short.getAs[Boolean]("quality_ok"))
    assert(short.getAs[Long]("stop_permille") === 1000L) // all stopwords
  }

  test("ann brute-force: the constructed nearest neighbor ranks first") {
    val rows = run("ann_topk_brute").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(rows.find(r => r._1 == 0L && r._2 == 1L).get._3 === 1L)
    assert(rows.find(r => r._1 == 1L && r._2 == 1L).get._3 === 0L)
    assert(rows.find(r => r._1 == 2L && r._2 == 1L).get._3 === 3L)
  }

  test("r4 hard negatives exclude the anchor's own label and rank by (sim, id)") {
    val labels = Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 8L -> 0L, 9L -> 1L)
    val rows = run("r4_hard_negatives").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
                 r.getAs[Long]("neighbor_id"), r.getAs[Long]("neighbor_label")))
    rows.foreach { case (q, _, n, nl) =>
      assert(labels(n) === nl, s"neighbor $n must carry its own label")
      assert(nl !== labels(q), s"negative $n shares anchor $q's label")
    }
    // anchor 4 (label 2, axis-20 unit vector) is orthogonal to every other
    // vector: all negatives tie at cos 0 and the cut falls back to the
    // deterministic id tie-break — 6 candidates, TopK=5 keeps the lowest ids
    assert(rows.filter(_._1 == 4L).sortBy(_._2).map(_._3).toSeq ===
      Seq(0L, 1L, 2L, 3L, 8L))
    // anchor 0's same-label lookalikes (1: near-identical, 8: offset copy)
    // must NEVER appear however similar they are
    assert(!rows.filter(_._1 == 0L).exists(r => r._3 == 1L || r._3 == 8L))
  }

  test("ann LSH: near-identical vectors land in one bucket and pick each other") {
    val rows = run("ann_lsh_nn").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket"), r.getAs[Long]("nn_id")))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 === byId(1L)._2, "near-identical vectors must share an LSH bucket")
    assert(byId(0L)._3 === 1L)
    assert(byId(1L)._3 === 0L)
  }

  test("d18: bloom contamination flags CONTAIN d9's exact flags (false positives only)") {
    // On real data the Bloom probe may over-flag (FP) but can never
    // under-flag: every gram in the exact intersection set all of its
    // bits when the filter was built. Containment therefore holds per
    // source for both the doc flags and the gram counts.
    val sf = "/root/testdata/sf0.001"
    val exact = LlmQueries.queries("d9_decontaminate")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"),
         r.getAs[Long]("sum_overlap"), r.getAs[Long]("sum_shingles"))).toMap
    val bloom = LlmQueries.queries("d18_bloom_decontaminate")(spark, sf).collect()
    assert(bloom.nonEmpty && bloom.map(_.getAs[String]("source")).toSet === exact.keySet)
    bloom.foreach { r =>
      val (nd, ec, so, ss) = exact(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("sum_shingles") === ss)
      assert(r.getAs[Long]("n_contaminated") >= ec, r.getAs[String]("source"))
      assert(r.getAs[Long]("sum_overlap") >= so, r.getAs[String]("source"))
      val fill = r.getAs[Long]("fill_permille")
      assert(fill >= 0 && fill < 1000, s"filter must not saturate on the fixture (fill=$fill)")
    }
    // and on the planted fixture: the eval doc's exact duplicate is flagged
    val planted = run("d18_bloom_decontaminate").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_contaminated")).toMap
    assert(planted("src1") === 1L, "the exact dup of the eval doc must be bloom-flagged")
  }

  test("d13 SemDeDup: trained cells surface the planted near-identical pairs; orthogonal vectors stay clean") {
    val rows = run("d13_semdedup").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("centroid_id"),
                 r.getAs[Long]("canonical_id"), r.getAs[Long]("n_semdups")))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(rows.map(_._1).toSet.size === rows.size, "one row per vector")
    // the planted near-identical pairs (0,1) and (2,3) cluster together and
    // dedup to the smaller id
    assert(byId(0L)._2 === byId(1L)._2, "near-identical vectors must share a cell")
    assert(byId(1L)._3 === 0L, "vector 1 dedups to canonical 0")
    assert(byId(0L)._3 === 0L)
    assert(byId(2L)._2 === byId(3L)._2)
    assert(byId(3L)._3 === 2L)
    assert(byId(1L)._4 >= 1L && byId(3L)._4 >= 1L)
    // the lone axis-20 vector is nobody's semantic duplicate
    assert(byId(4L)._3 === 4L && byId(4L)._4 === 0L)
  }

  test("multi-probe recall gate: d13 cell and d3 bucket generators recover >=0.8 of exact cosine dups at the probe tau") {
    // The quality axis the single-probe generators failed (measured
    // 0.286 cell / 0.0 bucket recall on this very fixture, bench round
    // 12): of the vectors with an exact brute-force cosine>=tau partner,
    // what fraction does each LOCALITY-bounded candidate generator
    // surface? The shipped recovery mechanisms — top-SemDeDupProbes(=12)
    // cell probing for d13, LshTables(=16) independent hyperplane tables
    // for d3 (weaker designs measured short: top-2 cells 0.536,
    // flip-one-plane 0.036 — curves at the constants) — exist to recover
    // the boundary-straddlers; this pins the floor so a locality
    // regression can never land silently. tau matches the bench's
    // dedup_recall probe (the production tau 0.8 has no ground truth on
    // the synthetic fixtures — measured, see Bench.scala).
    val sfDir = "/root/testdata/sf0.1"
    // environment gap ≠ regression: skip (not fail) where the bench
    // fixture is absent — every other LlmSpec test uses in-repo fixtures
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists,
      s"bench fixture $sfDir not present")
    val tau   = 0.5
    val s2 = spark.newSession()
    try {
      val exact = LlmQueries.exactCosineDupVectors(s2, sfDir, tau)
      assert(exact.nonEmpty, "fixture must contain ground-truth dup vectors")
      def recall(got: Set[Long]): Double = (got & exact).size.toDouble / exact.size
      val cellR   = recall(LlmQueries.cellDupVectorsAt(s2, sfDir, tau))
      val bucketR = recall(LlmQueries.bucketDupVectorsAt(s2, sfDir, tau))
      info(f"cell recall $cellR%.3f, bucket recall $bucketR%.3f over ${exact.size} truth vectors")
      assert(cellR >= 0.8, f"d13 cell-locality recall $cellR%.3f < 0.8 at tau $tau")
      assert(bucketR >= 0.8, f"d3 bucket-locality recall $bucketR%.3f < 0.8 at tau $tau")
    } finally graft.core.SessionMemo.release(s2)
  }

  test("r3 MMR: rank 1 equals brute rank 1; rank 2 trades the redundant runner-up for diversity") {
    val brute = run("ann_topk_brute").collect().filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    val mmr = run("r3_mmr_rerank").collect().filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id")).toSeq
    assert(mmr.head === brute.head, "the most relevant candidate is always selected first")
    // fixture geometry: vec 8 shares vec 1's axis (redundant, sim≈0.96 to
    // the rank-1 pick) while 2/3/4 are orthogonal to it — plain ranking
    // takes 8 second, MMR must take the smallest orthogonal vector
    assert(brute(1) === 8L, "precondition: relevance ranking picks the redundant vector second")
    assert(mmr(1) === 2L, "MMR must prefer an orthogonal candidate over the redundant runner-up")
    assert(mmr.size === math.min(LlmQueries.MmrK, 6), "K selections (or every candidate when fewer)")
  }

  test("r2 hybrid retrieval: a doc's exact copy wins both arms and tops the fused ranking") {
    // Fixture doc 1 is doc 0's exact text copy AND its near-identical
    // embedding: it must win the lexical arm (every term shared at max
    // idf mass) and the dense arm (cosine ~1), so RRF must place it at
    // rank 1 for query 0 — and symmetrically 0 for query 1. Ranks must
    // be dense from 1 per query (the graft_topk posexplode contract).
    val rows = run("r2_hybrid_retrieve").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
                 r.getAs[Long]("neighbor_id"), r.getAs[Long]("rrf")))
    assert(rows.find(r => r._1 == 0L && r._2 == 1L).map(_._3) === Some(1L))
    assert(rows.find(r => r._1 == 1L && r._2 == 1L).map(_._3) === Some(0L))
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted === (1L to g.size.toLong), "ranks must be dense from 1")
      val top = g.minBy(_._2)
      assert(g.forall(r => r._4 <= top._4), "rank 1 must carry the maximal RRF score")
    }
  }

  test("d12_state_audit: a planted hot bucket's streamed refusals match the batch contract exactly") {
    // BandMaxBucket + 4 EXACT duplicates: identical signatures land every
    // doc in the same bucket of all `Bands` bands, so the streamed replay
    // must refuse exactly 4 admissions per band — the order-independent
    // greatest(0, sz − cap) contract the audit row's batch columns
    // predict. This is the nonzero path of the audit (the synthetic
    // corpora never heat a bucket past the production cap).
    val d = Files.createTempDirectory("graft-hotbucket-").toString
    val n = LlmQueries.BandMaxBucket + 4
    (0 until n).map(i =>
        (i.toLong, "the same exact duplicated text repeated for bucket heat", "en", "srch", 55L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    try {
      val row = LlmQueries.queries("d12_state_audit")(spark, d).collect().head
      assert(row.getAs[Long]("n_hot_buckets") === LlmQueries.Bands.toLong)
      assert(row.getAs[Long]("n_refused_expected") === LlmQueries.Bands.toLong * 4)
      assert(row.getAs[Long]("n_overflow_buckets_stream") === row.getAs[Long]("n_hot_buckets"),
        "the stream must overflow exactly the buckets the batch frame predicts")
      assert(row.getAs[Long]("n_refused_stream") === row.getAs[Long]("n_refused_expected"),
        "streamed refusal totals must equal greatest(0, sz - cap) per bucket")
    } finally LlmQueries.evictDir(spark, d)
  }

  test("ann PQ: 5-bit codes rank the planted nearest neighbors first (dense re-key under short corpus)") {
    // 7 fixture vectors < PqK=32 seeds — every subspace codebook is short
    // AND Lloyd can empty codewords, so this exercises the dense re-key
    // path that keeps bkm[m][code[m]] total. The planted near-identical
    // pairs must survive quantization + exact re-rank.
    val rows = run("ann_pq_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(rows.find(r => r._1 == 0L && r._2 == 1L).map(_._3) === Some(1L))
    assert(rows.find(r => r._1 == 1L && r._2 == 1L).map(_._3) === Some(0L))
    assert(rows.find(r => r._1 == 2L && r._2 == 1L).map(_._3) === Some(3L))
    // every query returns a full dense ranking 1..k over the others
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted === (1L to g.size.toLong), "ranks must be dense from 1")
    }
  }

  test("ann PQ: recall vs brute-force top-5 on real embeddings") {
    val sf = "/root/testdata/sf0.001"
    def topk(name: String) = LlmQueries.queries(name)(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val pq    = topk("ann_pq_topk")
    val brute = topk("ann_topk_brute")
    val recalls = brute.map { case (q, b) => (pq.getOrElse(q, Set.empty) & b).size.toDouble / b.size }
    val mean = recalls.sum / recalls.size
    // 5 bits/subspace is a coarse quantizer; the PqCandidates over-fetch +
    // exact re-rank must still recover most of the true top-5
    assert(mean >= 0.5, s"PQ mean recall@5 was $mean (per-query $recalls)")
  }

  test("ann IVF: k-means cells keep near-identical pairs together (probe=1)") {
    val rows = run("ann_ivf_probe").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"), r.getAs[Long]("centroid_id")))
    // training pulls the near-identical axis-0 pair (0,1) into ONE cell, so
    // each finds the other as its top neighbor; likewise the axis-5 pair
    assert(rows.find(r => r._1 == 0L && r._2 == 1L).map(_._3) === Some(1L))
    assert(rows.find(r => r._1 == 1L && r._2 == 1L).map(_._3) === Some(0L))
    assert(rows.find(r => r._1 == 2L && r._2 == 1L).map(_._3) === Some(3L))
    assert(rows.find(r => r._1 == 3L && r._2 == 1L).map(_._3) === Some(2L))
    // orthogonal directions never share a cell: no axis-5 vector for an
    // axis-0 query and vice versa
    assert(!rows.exists(r => (r._1 == 0L || r._1 == 1L) && Set(2L, 3L, 9L)(r._3)))
    assert(!rows.exists(r => (r._1 == 2L || r._1 == 3L) && Set(0L, 1L, 8L)(r._3)))
    // probe=1: every reported neighbor lives in the query's own cell
    rows.groupBy(_._1).values.foreach(g => assert(g.map(_._4).distinct.size === 1))
  }

  test("ann IVF: trained probe-1 recall vs brute-force top-3 on real embeddings") {
    val sf = "/root/testdata/sf0.001"
    val ivf = LlmQueries.queries("ann_ivf_probe")(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val brute = LlmQueries.queries("ann_topk_brute")(spark, sf)
      .filter($"rank" <= 3 && $"q_id" < 4).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = brute.map { case (q, b) => (ivf.getOrElse(q, Set.empty) & b).size.toDouble / b.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"trained IVF probe-1 mean recall@3 was $mean (per-query $recalls)")

    // multi-probe: searching the top-2 cells can only widen the candidate
    // set, so recall@3 must be >= probe-1 on every query
    val ivf2 = LlmQueries.queries("ann_ivf_probe2")(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls2 = brute.map { case (q, b) => q -> (ivf2.getOrElse(q, Set.empty) & b).size.toDouble / b.size }
    brute.keys.foreach { q =>
      val r1 = (ivf.getOrElse(q, Set.empty) & brute(q)).size
      val r2 = (ivf2.getOrElse(q, Set.empty) & brute(q)).size
      assert(r2 >= r1, s"probe-2 recall regressed for query $q: $r2 < $r1")
    }
    val mean2 = recalls2.values.sum / recalls2.size
    assert(mean2 >= mean, s"probe-2 mean recall $mean2 below probe-1 $mean")
  }

  test("ann SQ8: quantized candidates + exact re-rank track brute force") {
    val sf = "/root/testdata/sf0.001"
    val sq = LlmQueries.queries("ann_sq_topk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val brute = LlmQueries.queries("ann_topk_brute")(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    // 20 quantized candidates re-ranked exactly must recover nearly all of
    // the exact top-5: int8 coding loses < 0.4% of each dimension's range
    val recalls = brute.map { case (q, b) => (sq.getOrElse(q, Set.empty) & b).size.toDouble / b.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"SQ8 mean recall@5 was $mean (per-query $recalls)")
  }

  test("ann IVF×SQ8: composed index recall tracks brute force") {
    val sf = "/root/testdata/sf0.001"
    val ivfsq = LlmQueries.queries("ann_ivfsq_topk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val brute = LlmQueries.queries("ann_topk_brute")(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    // cell restriction (probe-2) stacked on int8 coding still recovers
    // most of the exact top-k once survivors are re-ranked exactly
    val recalls = brute.map { case (q, b) => (ivfsq.getOrElse(q, Set.empty) & b).size.toDouble / b.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"IVF×SQ8 mean recall was $mean (per-query $recalls)")
    assert(ivfsq.keySet.subsetOf(brute.keySet))
  }

  test("derived index knobs hold their bounds past the old saturation points") {
    import LlmQueries.{centroidsFor, hyperplanesFor, LshTargetOccupancy, MaxCentroids, MaxHyperplanes}
    // √N rule, no longer capped at the round-11 driver-collect bound of
    // 256: a 10M-vector corpus gets 3162 cells, a 1B-vector corpus 31622,
    // and the cap only bites at the broadcast bound
    assert(centroidsFor(10_000_000L) === 3162L)
    assert(centroidsFor(1_000_000_000L) === 31622L)
    assert(centroidsFor(10_000_000_000L) === MaxCentroids.toLong)
    // occupancy rule past the old 16-plane saturation: 3M vectors need 17
    // planes (32·2^17 ≥ 3M), 500M need 24 — and whenever the knob is
    // below the cap the occupancy bound actually holds
    assert(hyperplanesFor(3_000_000L) === 17)
    assert(hyperplanesFor(500_000_000L) === 24)
    Seq(1L, 1000L, 65_000L, 3_000_000L, 500_000_000L, 30_000_000_000L).foreach { n =>
      val h = hyperplanesFor(n)
      assert(h <= MaxHyperplanes)
      if (h < MaxHyperplanes)
        assert((LshTargetOccupancy << h) >= n, s"occupancy bound broken at n=$n (h=$h)")
    }
    // the bucket id must stay a positive int: sum of 2^h for h < 30
    assert((0 until MaxHyperplanes).map(1 << _).sum === (1 << MaxHyperplanes) - 1)
  }

  test("d15: cell-occupancy audit is one consistent integer row over the shared index") {
    val r = run("d15_cell_skew_audit").collect()
    assert(r.length === 1)
    val row      = r.head
    val nCells   = row.getAs[Long]("n_cells")
    val nVecs    = row.getAs[Long]("n_vectors")
    val maxCell  = row.getAs[Long]("max_cell")
    val hotCells = row.getAs[Long]("n_hot_cells")
    val hotRows  = row.getAs[Long]("n_hot_rows")
    assert(nVecs === 7L, "every fixture vector is assigned to exactly one cell")
    assert(nCells >= 1L && nCells <= nVecs)
    // the planted near-identical pairs share cells, so some cell holds >= 2
    assert(maxCell >= 2L && maxCell <= nVecs)
    assert(hotCells >= 0L && hotRows >= hotCells * 2L || hotCells === 0L)
    assert(hotRows <= nVecs)
  }

  test("hyperplanes are deterministic dyadic rationals in [-0.5, 0.5)") {
    val p1 = LlmQueries.hyperplane(3, 16)
    val p2 = LlmQueries.hyperplane(3, 16)
    assert(p1.toSeq === p2.toSeq)
    assert(p1.forall(v => v >= -0.5 && v < 0.5))
    assert(p1.toSeq !== LlmQueries.hyperplane(4, 16).toSeq)
  }

  test("distributed k-means is partitioning-independent: same cells under a different shuffle width") {
    // The Lloyd update's correctness rests on ORDER-INDEPENDENT fixed-point
    // integer sums: however Spark partitions the shuffle, the trained
    // centroids (and so every cell assignment and d13 verdict) must be
    // bit-identical. Train in a fresh session with a different (prime)
    // shuffle width and compare the full d13 row set.
    val sf = "/root/testdata/sf0.001"
    def rows(s: org.apache.spark.sql.SparkSession): Seq[(Long, Long, Long, Long)] =
      LlmQueries.queries("d13_semdedup")(s, sf).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("centroid_id"),
                   r.getAs[Long]("canonical_id"), r.getAs[Long]("n_semdups")))
        .sortBy(_._1).toSeq
    val base = rows(spark)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    assert(rows(s2) === base,
      "trained cells must not depend on shuffle partitioning (fixed-point sums are order-independent)")
  }

  test("cached indexes are session-scoped: a second SparkSession reruns cleanly") {
    // sigCache/ivfCache/sqCache hold DataFrames bound to the creating
    // session — a dir-only key would hand session B a dead plan from
    // session A. Keyed by (session, dir), B rebuilds its own.
    val s2 = spark.newSession()
    // w2 additionally covers the streaming memory-sink caches: the sink's
    // temp view lives in the creating session's catalog, so a dir-only
    // cache key would hand session B a view name B cannot resolve
    Seq("d2_minhash_lsh", "ann_ivf_probe", "ann_sq_topk", "w2_stream_window").foreach { q =>
      val n = SparkEntry.queries(q)(s2, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$q must produce rows under a fresh session")
    }
  }

  test("m1: multimodal features are deterministic functions of the payload") {
    val rows = run("m1_multimodal").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("media_type"), r.getAs[Long]("n_bytes"),
                 r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("channels")))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 === "image")
    assert(byId(1L)._2 === "audio")
    assert(byId(0L)._3 === 43L)
    // identical payloads → identical fake-decoded features
    assert((byId(0L)._4, byId(0L)._5, byId(0L)._6) === (byId(1L)._4, byId(1L)._5, byId(1L)._6))
    assert(rows.forall(r => r._4 >= 64 && r._4 < 320 && r._6 >= 1 && r._6 <= 3))
  }

  test("r5: mined pairs equal a serial mutual-NN margin pass over the same trained cells") {
    // start from the SAME trained assignment the operator consumed (the
    // k-means chain itself is pinned by the IVF oracle rows) and replay
    // the mining serially: cell-local cross-side pairs, fixed-point
    // shifted sims, top-K neighborhoods by (s1 DESC, id ASC), mutual-NN,
    // all-integer ratio margin. Runs on sf0.001 — the constructed
    // 7-vector fixture is degenerate here (k-means seeds >= vector
    // count gives every vector its own cell, so no cell holds both
    // sides and the mined set is legitimately empty).
    val sfd = "/root/testdata/sf0.001"
    val assigned = LlmQueries.ivfAssignments(spark, sfd)
      .select("vec_id", "v", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    val label = spark.read.parquet(s"$sfd/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def s1(x: Array[Double], y: Array[Double]): Long = {
      var (dxy, dxx, dyy) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < x.length) { dxy += x(i) * y(i); dxx += x(i) * x(i); dyy += y(i) * y(i); i += 1 }
      1L + math.floor((1.0 + dxy / (math.sqrt(dxx) * math.sqrt(dyy))) * LlmQueries.BitextFp).toLong
    }
    val byCell = assigned.groupBy(_._3)
    final case class Side(best: Long, bestS1: Long, d: Long, k: Long)
    val fwd = scala.collection.mutable.Map.empty[Long, (Long, Side)] // a -> (cell, side)
    val bwd = scala.collection.mutable.Map.empty[Long, Side]
    byCell.foreach { case (cell, vs) =>
      val as = vs.filter(v => label(v._1) % 2 == 0)
      val bs = vs.filter(v => label(v._1) % 2 == 1)
      if (as.nonEmpty && bs.nonEmpty) {
        def top(me: (Long, Array[Double], Long), others: Seq[(Long, Array[Double], Long)]): Side = {
          val ranked = others.map(o => (o._1, s1(me._2, o._2)))
            .sortBy { case (id, s) => (-s, id) }.take(LlmQueries.BitextK)
          Side(ranked.head._1, ranked.head._2, ranked.map(_._2).sum, ranked.size.toLong)
        }
        as.foreach(a => fwd(a._1) = (cell, top(a, bs.toSeq)))
        bs.foreach(b => bwd(b._1) = top(b, as.toSeq))
      }
    }
    val expected = fwd.toSeq.flatMap { case (aId, (cell, f)) =>
      val b = bwd(f.best)
      if (b.best == aId)
        Some((aId, f.best, cell,
          (2000L * f.bestS1 * f.k * b.k) / (f.d * b.k + b.d * f.k)))
      else None
    }.toSet
    val got = LlmQueries.queries("r5_bitext_mining")(spark, sfd).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
                 r.getAs[Long]("cell"), r.getAs[Long]("margin_permille"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "the fixture must mine at least one mutual pair")
    // mutual NN is a partial matching: no endpoint appears twice
    assert(got.toSeq.map(_._1).distinct.size === got.size)
    assert(got.toSeq.map(_._2).distinct.size === got.size)
    // sides are genuinely cross-label-parity
    got.foreach { case (a, b, _, _) =>
      assert(label(a) % 2 === 0); assert(label(b) % 2 === 1)
    }
  }

  test("m3: the real PNG codec runs and round-trips the generated pattern exactly") {
    val rows = run("m3_image_decode").collect()
    assert(rows.nonEmpty, "the fixture has image-typed records")
    rows.foreach { r =>
      assert(r.getAs[String]("decoder") === "imageio",
        "this JDK ships a PNG reader+writer; the REAL decode path must run, not the fallback")
      assert(r.getAs[Int]("channels") === 3, "TYPE_3BYTE_BGR decodes to 3 bands")
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w >= 8 && w <= 23 && h >= 8 && h <= 23)
    }
    // the decoded-raster checksum must equal the generator arithmetic —
    // i.e. the PNG encode→decode round trip is lossless and indexed the
    // raster the same way the pattern was written
    val md = java.security.MessageDigest.getInstance("MD5")
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter("source = 'src0'").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val hex = md.digest(texts(r.getAs[Long]("doc_id")).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.reset()
      def hx(i: Int): Int = Character.digit(hex.charAt(i), 16)
      val (w, h, a) = (8 + hx(0), 8 + hx(1), hx(2) * 16 + hx(3))
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w)
        sum += (x + y * w + 1).toLong * ((a + 7 * x + 13 * y) % 256)
      assert(r.getAs[Long]("pixel_checksum") === sum,
        s"doc ${r.getAs[Long]("doc_id")}: decoded checksum diverges from the generated pattern")
      assert((r.getAs[Int]("width"), r.getAs[Int]("height")) === ((w, h)))
    }
  }

  test("e2: outlier counts reconcile with the band; planted off-label vector is the worst offender") {
    val rows = run("e2_embedding_outliers").collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_outliers"),
         r.getAs[Long]("worst_cos_fp"), r.getAs[Long]("worst_vec_id"),
         r.getAs[Long]("mean_fp"))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (n, out, worstCos, _, meanFp) =>
      assert(out <= n)
      // the worst offender defines the band edge: if anyone is an
      // outlier the worst one is; if nobody is, the worst sits inside
      val worstIsOut = worstCos * 1000 < LlmQueries.OutlierPermille * meanFp
      assert((out > 0) === worstIsOut)
    }
    // planted check: the fixture's label-0 family is vectors 0, 1
    // (near-identical axis-0) plus vec 8 (axis 0 with a large eps
    // component) — vec 8 must be label 0's worst offender
    assert(rows(0L)._4 === 8L, s"label 0's worst offender should be vec 8, got ${rows(0L)._4}")
  }

  test("t26: the source matrix is exactly d4's pairs rolled up by ordered source pair") {
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = run("d4_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
                 r.getAs[Long]("inter_cnt"), r.getAs[Long]("union_cnt")))
    val expected = pairs.groupBy { case (a, b, _, _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, ps) =>
      k -> (ps.length.toLong, ps.map(_._3).sum,
            1000L * ps.map(_._3).sum / ps.map(_._4).sum)
    }
    val got = run("t26_source_overlap").collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_dup_pairs"), r.getAs[Long]("sum_inter"),
         r.getAs[Long]("mean_jaccard_permille"))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "the fixture's planted dups must appear in the matrix")
    got.keys.foreach { case (a, b) => assert(a <= b, "pair key must be ordered") }
  }

  test("d20: the quality-argmax keeper matches a serial classifier over d6's clusters") {
    // Serial reference: FNV-1a 32-bit over code points (the Fnv32 kernel's
    // contract), weight = hash % 16 - 8 per word, summed — then per
    // cluster the (score DESC, doc_id ASC) argmax.
    def fnv32(w: String): Long = {
      var h = 2166136261L
      w.codePoints().toArray.foreach(c => h = ((h ^ c) * 16777619L) % 4294967296L)
      h
    }
    def score(text: String): Long =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map(w => fnv32(w) % 16 - 8).sum
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clusters = run("d6_dedup_clusters").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    val expected = clusters.groupBy(_._2).filter(_._2.length >= 2).map { case (cid, ms) =>
      val members = ms.map(_._1)
      val keep = members.minBy(d => (-score(texts(d)), d))
      cid -> (members.length.toLong, keep, score(texts(keep)), score(texts(cid)), keep == cid)
    }
    val got = run("d20_cluster_canon").collect().map(r =>
      r.getAs[Long]("cluster_id") -> (r.getAs[Long]("n_members"),
        r.getAs[Long]("keep_doc_id"), r.getAs[Long]("keep_score"),
        r.getAs[Long]("minid_score"), r.getAs[Boolean]("policies_agree"))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "the fixture's planted dup cluster must yield a canon row")
    got.foreach { case (_, (_, _, keepScore, minidScore, _)) =>
      assert(keepScore >= minidScore, "the argmax keeper can never score below the min-id keeper")
    }
  }

  test("r6: precision@k / MRR equal a serial pass over the brute hits and labels") {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hits = run("ann_topk_brute").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    val expected = hits.groupBy(_._1).map { case (q, hs) =>
      val rels = hs.sortBy(_._2).map(h => labels(h._3) == labels(q))
      val nRel = rels.count(identity).toLong
      val first = rels.indexWhere(identity) match { case -1 => 0L; case i => i + 1L }
      q -> (nRel, 1000L * nRel / hs.length,
            first, if (first == 0) 0L else 1000000L / first)
    }
    val got = run("r6_retrieval_eval").collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_relevant"), r.getAs[Long]("p_at_k_permille"),
         r.getAs[Long]("first_rel_rank"), r.getAs[Long]("rr_ppm"))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("d19: a planted sub-document is flagged contained in its container, not vice versa") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-contain-").toString
    try {
      import spark.implicits._
      val container = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
      val quoted    = "charlie delta echo foxtrot golf"   // strict sub-span: containment 1.0, low jaccard
      val unrelated = "zebra yankee xray whiskey victor uniform tango sierra"
      Seq((0L, container, "en", "src0", 1L), (1L, quoted, "en", "src1", 1L),
          (2L, unrelated, "en", "src2", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet")
      val rows = LlmQueries.queries("d19_containment")(spark, tmp).collect()
        .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"),
                   r.getAs[Long]("inter_cnt"), r.getAs[Long]("n_contained"),
                   r.getAs[Long]("n_container")))
      assert(rows.toSet === Set((1L, 0L, 4L, 4L, 11L)),
        s"only the quoted doc is contained (all 4 of its bigram shingles in the container); got ${rows.toSeq}")
      // the same pair is NOT a Jaccard dup — the asymmetric gate is the point
      val jac = LlmQueries.queries("d4_ngram_jaccard")(spark, tmp).collect()
      assert(jac.isEmpty, "jaccard misses the partial copy; containment catches it")
    } finally graft.core.FsUtil.deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  test("m4: the real WAV parser runs and round-trips the generated PCM exactly") {
    val rows = run("m4_audio_decode").collect()
    assert(rows.nonEmpty, "the fixture has audio-typed records")
    val md = java.security.MessageDigest.getInstance("MD5")
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter("source = 'src1'").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[String]("decoder") === "javaxsound",
        "this JDK ships a WAV provider; the REAL parse path must run, not the fallback")
      assert(r.getAs[Int]("sample_rate") === 8000)
      assert(r.getAs[Int]("channels") === 1)
      val hex = md.digest(texts(r.getAs[Long]("doc_id")).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.reset()
      def hx(i: Int): Int = Character.digit(hex.charAt(i), 16)
      val nf = 64 + hx(0) * 16 + hx(1)
      val a  = hx(2) * 16 + hx(3)
      var sum = 0L
      for (i <- 0 until nf) sum += (i + 1).toLong * (((a * 257 + i * 2311) % 65536) - 32768)
      assert(r.getAs[Long]("n_frames") === nf.toLong)
      assert(r.getAs[Long]("sample_checksum") === sum,
        s"doc ${r.getAs[Long]("doc_id")}: parsed PCM diverges from the generated samples")
    }
  }

  test("m2: videos fan out to sampled frames; stills yield one; resize fits 224 with aspect kept") {
    val rows = run("m2_frame_sample").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("media_type"), r.getAs[Int]("frame_idx"),
                 r.getAs[Long]("frame_ms"), r.getAs[Int]("out_width"), r.getAs[Int]("out_height")))
    val byDoc = rows.groupBy(_._1)
    // doc 2 is the fixture's video: multiple frames allowed, indices dense from 0
    rows.filter(_._2 != "video").groupBy(_._1).values.foreach(g => assert(g.length === 1))
    byDoc.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq === (0 until g.length), "frame indices dense from 0")
      assert(g.forall(f => f._5 <= 224 && f._6 <= 224 && (f._5 == 224 || f._6 == 224)),
        "resize fits the 224 box and pins the long side")
      assert(g.map(f => (f._5, f._6)).distinct.size === 1, "all frames share the resize dims")
      // frame times are an arithmetic progression of the fake interval
      val sorted = g.sortBy(_._3)
      if (sorted.length > 1) {
        val step = sorted(1)._4 - sorted(0)._4
        assert(step >= 1000L && sorted.sliding(2).forall(p => p(1)._4 - p(0)._4 == step))
      }
    }
  }

  test("d2/d10/d11: a planted hot band bucket is star-linked, not joined quadratically") {
    // 5000 identical docs land every one of their band values in the same
    // (band, value) buckets — uncapped, the self-join would generate
    // 5000²/2 ≈ 12.5M candidate pairs from boilerplate alone. The
    // BandMaxBucket guard must degrade those buckets to hub links (every
    // member pairs ONLY with the bucket's min doc_id — 4999 pairs, linear)
    // so the mega-cluster still collapses through the hub in d6, while the
    // healthy pairs (distinct texts, tiny buckets) still surface all-pairs.
    val d = Files.createTempDirectory("graft-llm-skew-").toString
    val planted = (0L until 5000L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do", "en", "boiler", 61L))
    val healthy = Seq(
      (9000001L, "zebra yak xylophone wombat vulture tapir", "en", "rare0", 40L),
      (9000002L, "zebra yak xylophone wombat vulture tapir", "en", "rare1", 40L), // exact dup of 9000001
      (9000003L, "entirely unrelated singleton document here", "en", "rare2", 42L)
    )
    import spark.implicits._
    (planted ++ healthy).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.parquet(s"$d/documents.parquet")

    val d2 = LlmQueries.queries("d2_minhash_lsh")(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(d2.contains((9000001L, 9000002L)), "healthy small-bucket pair must survive the cap")
    val d2Planted = d2.filter(p => p._1 < 5000L || p._2 < 5000L)
    assert(d2Planted.forall(_._1 === 0L),
      "hot-bucket candidates must all be hub links (doc 0 is the bucket min)")
    assert(d2Planted.length === 4999,
      s"star-linking emits exactly |bucket|-1 pairs, got ${d2Planted.length}")

    val d10 = LlmQueries.queries("d10_simhash_neardup")(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    assert(d10.contains((9000001L, 9000002L, 0L)))
    val d10Planted = d10.filter(p => p._1 < 5000L || p._2 < 5000L)
    assert(d10Planted.forall(p => p._1 === 0L && p._3 === 0L))
    assert(d10Planted.length === 4999)

    val audit = LlmQueries.queries("d11_band_skew_audit")(spark, d).collect()
      .map(r => r.getAs[String]("algo") ->
        ((r.getAs[Long]("n_buckets"), r.getAs[Long]("n_hot_buckets"), r.getAs[Long]("n_capped_rows")))).toMap
    for (algo <- Seq("minhash", "simhash")) {
      val (nb, hot, capped) = audit(algo)
      assert(hot >= 1L, s"$algo: the planted bucket must be reported hot")
      assert(capped >= 5000L, s"$algo: every planted row is star-capped")
      assert(nb > hot, s"$algo: healthy buckets must remain")
    }
  }
}
