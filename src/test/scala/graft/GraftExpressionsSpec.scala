package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd expressions must be value-identical to the SQL
  * formulations they replaced (the DuckDB oracle still uses those). */
class GraftExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_fnv32 matches FNV-1a-32 reference vectors incl. multi-byte code points") {
    GraftFunctions.ensureRegistered(spark)
    // vectors cross-checked against the DuckDB list_reduce twin
    val expect = Map(
      "hello world"  -> 3582672807L,
      "a"            -> 3826002220L,
      "the quick"    -> 4251334859L,
      "ünïcode test" -> 4095777371L,
      "日本語 text"  -> 4288467073L,
      "x y"          -> 3402250132L)
    val rows = expect.keys.toSeq.toDF("s")
      .selectExpr("s", "graft_fnv32(s) AS h").collect()
    rows.foreach(r => assert(r.getLong(1) === expect(r.getString(0)), s"for '${r.getString(0)}'"))
    // codegen and interpreted paths agree
    assert(graft.functions.Fnv32.hash("hello world") === 3582672807L)
    assert(graft.functions.Fnv32.hash("") === 2166136261L)
  }

  test("graft_bpe_tokens equals the regex formulation (property + planted vectors)") {
    GraftFunctions.ensureRegistered(spark)
    // the regex reference: the EXACT formulation the DuckDB oracle runs —
    // alpha chars minus the chars saved by a single greedy alternation scan
    val pat = graft.functions.BpeTokens.Merges.mkString("(", "|", ")").r
    def regexRef(text: String): Long = {
      val lower = text.toLowerCase
      val alpha = lower.count(c => c >= 'a' && c <= 'z').toLong
      val saved = pat.findAllIn(lower).map(_.length - 1L).sum
      alpha - saved
    }
    // planted vectors (hand-checked merge behavior)
    assert(graft.functions.BpeTokens.count("there") === 2L)    // [the][re]
    assert(graft.functions.BpeTokens.count("thin cat") === 4L) // [th][in] [c][at]
    assert(graft.functions.BpeTokens.count("xyz") === 3L)
    assert(graft.functions.BpeTokens.count("") === 0L)
    assert(graft.functions.BpeTokens.count("123 %$") === 0L)
    // property: random alpha/space/punct strings — kernel == regex reference
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz aeiou tthheeiinngg .,!?0189"
    val samples = (1 to 400).map { _ =>
      val len = rnd.nextInt(60)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    samples.foreach { s =>
      assert(graft.functions.BpeTokens.count(s.toLowerCase) === regexRef(s), s"for '$s'")
    }
    // and through the SQL surface (codegen path), against the regex expr
    val pattern = graft.functions.BpeTokens.Merges.mkString("(", "|", ")")
    val rows = samples.take(50).toDF("text").selectExpr(
      "graft_bpe_tokens(lower(text)) AS native",
      s"""cast(length(regexp_replace(lower(text), '[^a-z]', '')) -
         |aggregate(transform(regexp_extract_all(lower(text), '$pattern', 0),
         |                    m -> length(m) - 1), 0, (a, x) -> a + x) as long) AS sql""".stripMargin)
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_trigrams equals the substring lambda; packed order == UTF-8 byte order (full Unicode)") {
    GraftFunctions.ensureRegistered(spark)
    // deterministic pseudo-random strings over ASCII, BMP, and
    // supplementary-plane alphabets — the kernel's 21-bit fields must be
    // injective and order-preserving on ALL of Unicode, not just ASCII
    val rng = new scala.util.Random(42)
    val alphabets = Seq(
      ('a' to 'z').map(_.toString),
      Seq("é", "ß", "日", "本", "語", "ü", "α", "я", " "),
      Seq("😀", "🌍", "𝛼", "🚀", "a", "本", "\uFFFD"))
    val strings = (for {
      alpha <- alphabets
      n     <- Seq(0, 1, 2, 3, 4, 7, 40)
      _     <- 1 to 3
    } yield (1 to n).map(_ => alpha(rng.nextInt(alpha.size))).mkString) ++
      Seq("", "ab", "abc", "aaaa", "mámá😀是")
    val rows = strings.toDF("t").selectExpr(
      "t",
      "graft_trigrams(t) AS native",
      "CASE WHEN length(t) >= 3 THEN transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) ELSE array() END AS lambda")
      .collect()
    def unpack(v: Long): String = {
      val cps = Array((v >>> 42).toInt, ((v >> 21) & 0x1FFFFF).toInt, (v & 0x1FFFFF).toInt)
      new String(cps, 0, 3)
    }
    rows.foreach { r =>
      val native = r.getSeq[Long](1)
      val lambda = r.getSeq[String](2)
      assert(native.map(unpack) === lambda, s"for '${r.getString(0)}'")
    }
    // order preservation: packed long order must equal unsigned UTF-8
    // byte order (both engines' binary string collation) on every gram pair
    val grams = rows.flatMap(_.getSeq[Long](1)).distinct
    def utf8Lt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    for (a <- grams; b <- grams if a != b)
      assert((a < b) === utf8Lt(unpack(a), unpack(b)),
        s"packed order diverges from UTF-8 byte order on '${unpack(a)}' vs '${unpack(b)}'")
    // interpreted path agrees with codegen (pack is shared) + short strings empty
    assert(graft.functions.CodePointTrigrams.pack("ab").isEmpty)
    assert(graft.functions.CodePointTrigrams.pack("😀a").isEmpty) // 2 code points
    assert(graft.functions.CodePointTrigrams.pack("abc").toSeq ===
      Seq((97L << 42) | (98L << 21) | 99L))
  }

  test("graft_simhash16 equals the nested-aggregate SQL chain") {
    GraftFunctions.ensureRegistered(spark)
    val chain =
      """aggregate(
        |  transform(sequence(0, 15), i ->
        |    CASE WHEN aggregate(hashes, 0,
        |           (acc, h) -> acc +
        |             shiftright(instr('0123456789abcdef', substring(h, (i div 4) + 1, 1)) - 1,
        |                        3 - i % 4) % 2 * 2 - 1) > 0
        |    THEN shiftleft(1, i) ELSE 0 END),
        |  0, (acc, x) -> acc + x)""".stripMargin
    val rows = Seq("the quick brown fox", "a b c", "one", "x y z w v u t s")
      .toDF("s")
      .selectExpr("transform(filter(split(lower(s), '\\\\s+'), w -> w != ''), w -> md5(w)) AS hashes")
      .selectExpr("graft_simhash16(hashes) AS native", s"cast($chain as long) AS sql")
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_dot equals the fold-left aggregate/zip_with sum bit-for-bit") {
    GraftFunctions.ensureRegistered(spark)
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("cast(embedding as array<double>) AS v")
      .limit(20)
      .selectExpr(
        "graft_dot(v, v) AS native",
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x) AS hof")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(r.getDouble(1)), "must match bit-for-bit"))
  }

  test("GraftSparkExtensions injects without error (packaged-deploy path)") {
    // the registry application itself is private[sql]; the builders are the
    // same ones GraftFunctions.ensureRegistered installs and tests above
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext)
  }

  test("graft_topk: bounded top-k aggregate matches the row_number window it replaces") {
    GraftFunctions.ensureRegistered(spark)
    // 10k scored rows over 5 groups, engineered score ties (score = id % 7)
    // so the id-asc tiebreak is exercised, run at 8 partitions so partial
    // buffers genuinely merge across tasks
    val scored = spark.range(10000).repartition(8)
      .selectExpr("id % 5 AS q_id", "cast(id % 7 as double) AS sim", "id AS vec_id")
    val agg = scored.groupBy("q_id")
      .agg(org.apache.spark.sql.functions.expr("graft_topk(sim, vec_id, 0L, 3)").as("top"))
      .selectExpr("q_id", "posexplode(top) AS (pos, t)")
      .selectExpr("q_id", "pos + 1 AS rank", "t.id AS vec_id", "t.score AS sim")
    val win = scored.selectExpr("q_id", "sim", "vec_id",
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank")
      .where("rank <= 3").select("q_id", "rank", "vec_id", "sim")
    assert(agg.count() === 15)
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty,
      "aggregate top-k must equal the window top-k exactly")
    // groups smaller than k return all their rows, still best-first
    val arr = spark.range(2).selectExpr("0L AS q_id", "cast(id as double) AS sim", "id AS vec_id")
      .groupBy("q_id").agg(org.apache.spark.sql.functions.expr("graft_topk(sim, vec_id, 0L, 5)").as("top"))
      .selectExpr("transform(top, t -> t.id) AS ids").head().getSeq[Long](0)
    assert(arr === Seq(1L, 0L), "best-first: higher score first")
  }

  test("graft_topk: serialize/deserialize round-trips the bounded buffer") {
    val b = new graft.functions.TopKByScore.Buffer(3)
    Seq((0.9, 1L, 10L), (0.5, 2L, 20L), (0.9, 0L, 30L), (0.99, 7L, 70L), (0.1, 9L, 90L))
      .foreach { case (s, i, p) => b.insert(s, i, p) }
    val rt = graft.functions.TopKByScore.Buffer.fromBytes(3, b.toBytes)
    val entries = rt.sortedBestFirst.toSeq
    // kept the best 3 of 5; score desc, id-asc tiebreak between the 0.9s
    assert(entries.map(e => (e.score, e.id, e.payload)) ===
      Seq((0.99, 7L, 70L), (0.9, 0L, 30L), (0.9, 1L, 10L)))
  }

  test("graft_dot handles length mismatch and nulls") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d").head()
    assert(r.getDouble(0) === 14.0) // min-length semantics
    val n = Seq((Seq(1.0), null: Seq[Double])).toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d").head()
    assert(n.isNullAt(0))
  }
}
