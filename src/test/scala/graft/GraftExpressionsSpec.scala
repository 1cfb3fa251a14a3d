package graft

import graft.functions.{GraftFunctions, HexPrefixToLong}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd expressions must be value-identical to the SQL
  * formulations they replaced (the DuckDB oracle still uses those). */
class GraftExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_hex32 equals the instr/substr arithmetic chain") {
    GraftFunctions.ensureRegistered(spark)
    val chain = (1 to 8)
      .map(j => s"cast(instr('0123456789abcdef', substr(h, $j, 1)) - 1 as bigint) * ${1L << (4 * (8 - j))}")
      .mkString("(", " + ", ")")
    val rows = Seq("a", "hello", "shingle one", "", "Zz").toDF("s")
      .selectExpr("md5(s) AS h")
      .selectExpr(s"graft_hex32(h) AS native", s"$chain AS sql")
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(HexPrefixToLong.parse("ffffffff") === 0xffffffffL)
    assert(HexPrefixToLong.parse("00000001") === 1L)
  }

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
