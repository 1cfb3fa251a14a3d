package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hot scalar kernels of the LLM
  * pipeline (brief preference order: a codegen'd `Expression` beats a Scala
  * UDF beats interpreted HOF chains). Both are bit-compatible with the SQL
  * formulations they replace, so the DuckDB oracles are unchanged.
  */

/** First 8 hex chars of a (md5) hex string as a long — replaces an
  * 8-term `instr(substr(...))` chain in the MinHash shingle hash. */
final case class HexPrefixToLong(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hex prefix expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HexPrefixToLong.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HexPrefixToLong.parse($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): HexPrefixToLong =
    copy(child = newChild)
}

object HexPrefixToLong {
  /** Shared by eval and generated code: identical arithmetic to the SQL
    * `(instr('0123456789abcdef', substr(h, j, 1)) - 1) * 16^(8-j)` chain. */
  def parse(s: String): Long = {
    var v = 0L
    var j = 0
    val n = math.min(8, s.length)
    while (j < n) {
      v = (v << 4) | Character.digit(s.charAt(j), 16).toLong
      j += 1
    }
    v
  }
}

/** FNV-1a 32-bit over Unicode CODE POINTS — the MinHash shingle hash. One
  * multiply+xor per character instead of a full md5 round, ~10× cheaper on
  * the near-dedup hot kernel, and exactly reproducible in the DuckDB oracle
  * as `list_reduce(list_prepend(2166136261, codepoints), (h,c) ->
  * (xor(h,c) * 16777619) % 2^32)`. Code points (not UTF-8 bytes or UTF-16
  * units) because both engines index strings by code point. */
final case class Fnv32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv32 expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Fnv32.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Fnv32.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Fnv32 =
    copy(child = newChild)
}

object Fnv32 {
  def hash(s: String): Long = {
    var h = 2166136261L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = ((h ^ cp) * 16777619L) & 0xffffffffL
      i += Character.charCount(cp)
    }
    h
  }
}

/** Sequential (fold-left) double dot product over two double arrays —
  * replaces `aggregate(zip_with(a, b, ...))`, keeping the exact summation
  * order that DuckDB's `list_inner_product` uses, so cosine ranks stay
  * bit-identical to the oracle. */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot product expects array<double>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** The packaged-deploy injection point: set
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions` and both
  * native expressions register at session build, no code change needed. */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_hex32"),
      new ExpressionInfo("graft.functions", "graft_hex32"),
      (exprs: Seq[Expression]) => HexPrefixToLong(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo("graft.functions", "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_fnv32"),
      new ExpressionInfo("graft.functions", "graft_fnv32"),
      (exprs: Seq[Expression]) => Fnv32(exprs.head)))
  }
}

/** Session registration so the expressions are usable inside SQL lambdas
  * (`transform(hashes, h -> graft_hex32(h))`) — same builders as
  * [[GraftSparkExtensions]], applied to an already-built session. */
object GraftFunctions {
  private def register(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder
    )

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("graft_hex32"))) {
      register(spark, "graft_hex32", exprs => HexPrefixToLong(exprs.head))
      register(spark, "graft_dot", exprs => DotProduct(exprs.head, exprs(1)))
      register(spark, "graft_fnv32", exprs => Fnv32(exprs.head))
    }
  }
}
