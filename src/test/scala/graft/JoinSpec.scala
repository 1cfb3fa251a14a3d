package graft

import graft.analytics.JoinQueries
import graft.core.EventLog
import graft.llm.LlmQueries
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The temporal joins (as-of, bucketed range) and exact n-gram Jaccard
  * checked against independent brute-force implementations computed in
  * plain Scala on driver-collected sf0.001 data — different algorithm,
  * same answer. */
class JoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private case class Ev(eid: Long, t: Long, user: Long, typ: String)

  private lazy val evs: Seq[Ev] =
    EventLog.events(spark, dir)
      .select("event_id", "timestamp_ms", "user_id", "event_type")
      .collect()
      .toSeq
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("j1_asof_join matches per-click brute-force scan") {
    val clicks    = evs.filter(_.typ == "click")
    val purchases = evs.filter(_.typ == "purchase").groupBy(_.user)
    // per click: max (t, eid)-lexicographic purchase strictly before it
    val perClick: Seq[(Ev, Option[Ev])] = clicks.map { c =>
      val prior = purchases.getOrElse(c.user, Nil).filter(p =>
        p.t < c.t || (p.t == c.t && p.eid < c.eid))
      (c, if (prior.isEmpty) None else Some(prior.maxBy(p => (p.t, p.eid))))
    }
    val expected = perClick.groupBy(_._1.user).map { case (u, rows) =>
      val matched = rows.collect { case (c, Some(p)) => (c, p) }
      u -> (rows.size.toLong,
            matched.size.toLong,
            matched.map(_._2.eid).sum,
            if (matched.isEmpty) -1L else matched.map { case (c, p) => c.t - p.t }.max)
    }

    val got = JoinQueries.queries("j1_asof_join")(spark, dir).collect().map { r =>
      r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_clicks"), r.getAs[Long]("n_matched"),
         r.getAs[Long]("sum_matched_eid"), r.getAs[Long]("max_gap_ms"))
    }.toMap
    assert(got == expected)
  }

  test("j2_range_join matches all-pairs brute force (bucketing loses no pair)") {
    val W = JoinQueries.RangeWindowMs
    val expected = evs.filter(_.typ == "error").map { p =>
      val in = evs.filter(e => e.eid != p.eid && math.abs(e.t - p.t) <= W)
      (p.eid, p.t) -> (in.size.toLong, in.map(_.eid).sum)
    }.toMap
    val got = JoinQueries.queries("j2_range_join")(spark, dir).collect().map { r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("t_ms")) ->
        (r.getAs[Long]("n_within"), r.getAs[Long]("sum_within_eid"))
    }.toMap
    assert(got == expected)
  }

  test("d4_ngram_jaccard matches brute-force exact Jaccard over candidate pairs") {
    val docs: Seq[(Long, Set[String])] = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect().toSeq
      .map { r =>
        val words = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        val shingles = words.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
        (r.getLong(0), shingles)
      }
      .filter(_._2.nonEmpty)
    val df = docs.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rareOf: Map[Long, Set[String]] =
      docs.map { case (id, ss) => id -> ss.filter(s => df(s) <= LlmQueries.NgramMaxDf) }.toMap
    val expected = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      if (rareOf(a) & rareOf(b)).nonEmpty // candidate: share >=1 rare shingle
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if 2 * inter >= union
    } yield (a, b) -> (inter, union)).toMap

    val got = LlmQueries.queries("d4_ngram_jaccard")(spark, dir).collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("inter_cnt"), r.getAs[Long]("union_cnt"))
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty) // the corpus has known near-dups
  }

  test("d6_dedup_clusters matches union-find over the brute-force pair graph") {
    // brute-force pairs recomputed independently (same logic as the d4 test)
    val docs: Seq[(Long, Set[String])] = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect().toSeq
      .map { r =>
        val words = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        (r.getLong(0), words.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet)
      }
    val withShingles = docs.filter(_._2.nonEmpty)
    val df = withShingles.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rareOf = withShingles.map { case (id, ss) =>
      id -> ss.filter(s => df(s) <= LlmQueries.NgramMaxDf)
    }.toMap
    val pairs = for {
      (a, sa) <- withShingles; (b, sb) <- withShingles if a < b
      if (rareOf(a) & rareOf(b)).nonEmpty
      inter = (sa & sb).size.toLong
      if 2 * inter >= sa.size + sb.size - inter
    } yield (a, b)
    // union-find
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = docs.map(d => d._1 -> {
      // canonical = MIN member of the component, which min-union keeps as root
      find(d._1)
    }).toMap

    val got = LlmQueries.queries("d6_dedup_clusters")(spark, dir).collect().map { r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")
    }.toMap
    assert(got == expected)
  }
}
