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

/** 16-bit SimHash from an array of md5 hex strings — ONE pass over the
  * hashes computing all 16 bit votes, replacing a nested SQL aggregate that
  * re-walked the array 16 times through interpreted lambdas. Bit-identical
  * to `aggregate(sequence(0,15), CASE WHEN aggregate(hashes, ...) ...)`:
  * bit i of a word hash = bit (3 - i%4) of lowercase hex nibble i/4, each
  * word votes ±1 per bit, bit set if the vote is positive. */
final case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash16 expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val out = new Array[AnyRef](n)
    var i   = 0
    while (i < n) { out(i) = arr.getUTF8String(i); i += 1 }
    SimHash16.hash(out.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $c.numElements();
         |Object[] $arr = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) { $arr[$i] = $c.getUTF8String($i); }
         |${ev.value} = graft.functions.SimHash16.hash($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  def hash(hashes: Array[AnyRef]): Long = {
    val votes = new Array[Int](16)
    var w = 0
    while (w < hashes.length) {
      val h = hashes(w).toString // md5 hex, 32 lowercase chars
      var i = 0
      while (i < 16) {
        val nib = Character.digit(h.charAt(i >> 2), 16)
        val bit = (nib >> (3 - (i & 3))) & 1
        votes(i) += bit * 2 - 1
        i += 1
      }
      w += 1
    }
    var acc = 0L
    var i   = 0
    while (i < 16) { if (votes(i) > 0) acc |= 1L << i; i += 1 }
    acc
  }
}

/** 64-bit SimHash from an array of md5 hex strings, returned as 4×16-bit
  * bands (`array<bigint>`, band b = signature bits [16b, 16b+16)) — ONE
  * pass over the hashes computing all 64 bit votes. Each band draws on a
  * DISJOINT 16-bit slice of the 128-bit md5 (hex chars [4b, 4b+4)), so the
  * bands are independent without re-hashing the word per band: signature
  * bit j votes on bit (3 - j%4) of lowercase hex nibble j/4, exactly
  * [[SimHash16]]'s mapping extended to 64 bits. */
final case class SimHashBands(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_bands expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val out = new Array[AnyRef](n)
    var i   = 0
    while (i < n) { out(i) = arr.getUTF8String(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(SimHashBands.hash(out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $c.numElements();
         |Object[] $arr = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) { $arr[$i] = $c.getUTF8String($i); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SimHashBands.hash($arr));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
}

object SimHashBands {
  val Bands = 4

  def hash(hashes: Array[AnyRef]): Array[Long] = {
    val votes = new Array[Int](64)
    var w = 0
    while (w < hashes.length) {
      val h = hashes(w).toString // md5 hex, 32 lowercase chars
      var j = 0
      while (j < 64) {
        val nib = Character.digit(h.charAt(j >> 2), 16)
        votes(j) += ((nib >> (3 - (j & 3))) & 1) * 2 - 1
        j += 1
      }
      w += 1
    }
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var acc = 0L
      var i   = 0
      while (i < 16) { if (votes(16 * b + i) > 0) acc |= 1L << i; i += 1 }
      out(b) = acc
      b += 1
    }
    out
  }
}

/** Character trigrams of a string, each packed into one long as three
  * big-endian 21-bit code-point fields — the t23 language-ID gram kernel.
  *
  * Replaces `explode(transform(sequence(1, length(t)-2), i -> substring(t,
  * i, 3)))`: the lambda path paid one interpreted `substring` call AND a
  * string allocation per gram (~1.5M per corpus pass at the bench SF,
  * measured as the dominant stage); this is one codegen'd pass over the
  * backing chars producing longs. 21-bit fields cover the FULL Unicode
  * range (max code point U+10FFFF = 21 bits; 3×21 = 63 bits, always a
  * non-negative long), so packing is injective on trigrams and packed
  * order == code-point lexicographic order == UTF-8 byte order — the
  * (count DESC, gram ASC) rank tie-breaks downstream match DuckDB's
  * binary string collation exactly for ANY input, no ASCII/BMP
  * assumption. Strings shorter than 3 code points yield an empty
  * array. */
final case class CodePointTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"trigrams expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      CodePointTrigrams.pack(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CodePointTrigrams.pack($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CodePointTrigrams =
    copy(child = newChild)
}

object CodePointTrigrams {
  def pack(s: String): Array[Long] = {
    val n = s.codePointCount(0, s.length)
    if (n < 3) return Array.emptyLongArray
    val cps = new Array[Long](n)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp.toLong
      k += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Long](n - 2)
    var j = 0
    while (j < n - 2) {
      out(j) = (cps(j) << 42) | (cps(j + 1) << 21) | cps(j + 2)
      j += 1
    }
    out
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

/** Toy-BPE token count over an ALREADY-LOWERCASED string — the codegen'd
  * kernel behind `t13_bpe_pack`'s token budgeting (callers pass
  * `graft_bpe_tokens(lower(text))`; the expression itself never lowercases,
  * so Spark's own `lower` semantics stay in charge of case folding).
  *
  * Semantics are EXACTLY the regex formulation the DuckDB oracle runs
  * (`len(strip non-[a-z])` minus the chars saved by a single global
  * `regexp_extract_all` over the ordered literal alternation in
  * [[BpeTokens.Merges]]): scan positions left to right; at each position
  * try the merges in table order (longest-first), the first that matches
  * consumes its length as ONE token; an unmatched [a-z] char is one token;
  * anything else is skipped. Leftmost-position-first + listed-alternative
  * priority + resume-after-match is precisely Java regex / RE2 alternation
  * over literals — property-gated against the regex reference in
  * GraftExpressionsSpec. The hand scan exists because `java.util.regex`
  * was the t13 kernel's whole cost at bench scale. */
final case class BpeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BpeTokens.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.BpeTokens.count($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeTokens {
  /** The fixed merge table: frequent English character n-grams, ordered
    * LONGEST-FIRST then by priority. Single source of truth — the regex
    * oracle twin builds its alternation from this same list. */
  val Merges: Seq[String] = Seq(
    "the", "ing", "and", "ion", "ent", "her", "for", "ter", "ati",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "ed", "is", "it", "al", "ar", "st", "to")

  // first-char dispatch: only merges starting with s(i) are tried, in
  // table order (two merges with different first chars can never both
  // match at one position, so bucketing preserves alternation priority)
  private val byFirst: Array[Array[String]] = {
    val buckets = Array.fill(26)(Vector.empty[String])
    Merges.foreach { m => val b = m.charAt(0) - 'a'; buckets(b) = buckets(b) :+ m }
    buckets.map(_.toArray)
  }

  def count(s: String): Long = {
    var tokens = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var consumed = 1
        val cands = byFirst(c - 'a')
        var j = 0
        var done = false
        while (j < cands.length && !done) {
          val m = cands(j)
          if (i + m.length <= n && s.startsWith(m, i)) { consumed = m.length; done = true }
          j += 1
        }
        tokens += 1
        i += consumed
      } else i += 1
    }
    tokens
  }
}

/** `might_contain` over a driver-broadcast [[org.apache.spark.util.sketch.BloomFilter]],
  * codegen'd — replaces the last Scala UDF on the streamed-ingest hot path
  * (the bootstrap committed-keys gate). Bit-compatible with
  * `BloomFilter.mightContainString`: `mightContainString(s)` is defined as
  * `mightContainBinary(utf8Bytes(s))`, and the child's `UTF8String.getBytes`
  * are exactly those bytes — so this skips the per-row `String` allocation
  * the UDF paid on top of staying inside whole-stage codegen. */
final case class BloomMightContain(
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
    child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"might_contain expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle travels in the references array; the filter
    // itself is resolved once per task, not per row
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val filter = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter", "graftBloom",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $filter.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-level entry: `mightContain(bloomBc, concat(...))`. */
  def apply(bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
            col: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.SqlBridge.column(
      BloomMightContain(bloom, org.apache.spark.sql.graft.SqlBridge.expression(col)))
}

/** Executor-side index over driver-collected merge-on-read delete masks —
  * broadcast ONCE per delete-file set and probed by the codegen'd
  * [[PosMasked]]/[[EqMasked]] predicates, so a masked committed read is a
  * map-side FILTER inside whole-stage codegen (scan → filter → agg in one
  * span), never a broadcast anti-join: no delete-parquet re-read per
  * query, no hash-relation build, no join node. The lazy indexes convert
  * once per executor (broadcast values are process-cached). */
final class MorMaskIndex(posByFile: Map[String, Array[Long]],
                         eqByPart: Map[Int, Array[Long]]) extends Serializable {
  @transient private lazy val posIdx: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](math.max(4, posByFile.size * 2))
    posByFile.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val eqIdx: java.util.HashMap[Integer, Array[Long]] = {
    val m = new java.util.HashMap[Integer, Array[Long]](math.max(4, eqByPart.size * 2))
    eqByPart.foreach { case (k, v) => m.put(Integer.valueOf(k), v) }
    m
  }
  def posHit(key: UTF8String, pos: Long): Boolean = {
    val a = posIdx.get(key)
    a != null && java.util.Arrays.binarySearch(a, pos) >= 0
  }
  def eqHit(partition: Int, sequence: Long): Boolean = {
    val a = eqIdx.get(partition)
    a != null && java.util.Arrays.binarySearch(a, sequence) >= 0
  }
}

/** TRUE when (file key, physical row ordinal) is position-deleted in the
  * broadcast mask index — the codegen'd replacement for the posKeys
  * anti-join on every masked committed read. */
final case class PosMasked(
    idx: org.apache.spark.broadcast.Broadcast[MorMaskIndex],
    left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pos_masked expects (string, long), got (${left.dataType}, ${right.dataType})")

  override def prettyName: String = "pos_masked"

  override def nullSafeEval(k: Any, p: Any): Any =
    idx.value.posHit(k.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftPosMaskBc", idx,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val ix = ctx.addMutableState("graft.functions.MorMaskIndex", "graftPosMaskIdx",
      v => s"$v = (graft.functions.MorMaskIndex) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (k, p) => s"${ev.value} = $ix.posHit($k, $p);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PosMasked =
    copy(left = newLeft, right = newRight)
}

object PosMasked {
  def apply(idx: org.apache.spark.broadcast.Broadcast[MorMaskIndex],
            fkey: org.apache.spark.sql.Column,
            pos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.SqlBridge.column(PosMasked(idx,
      org.apache.spark.sql.graft.SqlBridge.expression(fkey),
      org.apache.spark.sql.graft.SqlBridge.expression(pos)))
}

/** TRUE when (partition, sequence) is equality-deleted in the broadcast
  * mask index — ditto for the eqKeys anti-join. */
final case class EqMasked(
    idx: org.apache.spark.broadcast.Broadcast[MorMaskIndex],
    left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"eq_masked expects (int, long), got (${left.dataType}, ${right.dataType})")

  override def prettyName: String = "eq_masked"

  override def nullSafeEval(p: Any, s: Any): Any =
    idx.value.eqHit(p.asInstanceOf[Int], s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftEqMaskBc", idx,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val ix = ctx.addMutableState("graft.functions.MorMaskIndex", "graftEqMaskIdx",
      v => s"$v = (graft.functions.MorMaskIndex) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (p, s) => s"${ev.value} = $ix.eqHit($p, $s);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): EqMasked =
    copy(left = newLeft, right = newRight)
}

object EqMasked {
  def apply(idx: org.apache.spark.broadcast.Broadcast[MorMaskIndex],
            partition: org.apache.spark.sql.Column,
            sequence: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.SqlBridge.column(EqMasked(idx,
      org.apache.spark.sql.graft.SqlBridge.expression(partition),
      org.apache.spark.sql.graft.SqlBridge.expression(sequence)))
}

/** The packaged-deploy injection point: set
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions` and both
  * native expressions register at session build, no code change needed. */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo("graft.functions", "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_fnv32"),
      new ExpressionInfo("graft.functions", "graft_fnv32"),
      (exprs: Seq[Expression]) => Fnv32(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo("graft.functions", "graft_simhash16"),
      (exprs: Seq[Expression]) => SimHash16(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash_bands"),
      new ExpressionInfo("graft.functions", "graft_simhash_bands"),
      (exprs: Seq[Expression]) => SimHashBands(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_topk"),
      new ExpressionInfo("graft.functions", "graft_topk"),
      (exprs: Seq[Expression]) => GraftFunctions.topkBuilder(exprs)))
    ext.injectFunction((FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo("graft.functions", "graft_bpe_tokens"),
      (exprs: Seq[Expression]) => BpeTokens(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_trigrams"),
      new ExpressionInfo("graft.functions", "graft_trigrams"),
      (exprs: Seq[Expression]) => CodePointTrigrams(exprs.head)))
  }
}

/** Session registration so the expressions are usable inside SQL lambdas
  * (`transform(words, w -> graft_fnv32(w))`) — same builders as
  * [[GraftSparkExtensions]], applied to an already-built session. */
object GraftFunctions {
  private def register(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder
    )

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("graft_fnv32"))) {
      register(spark, "graft_dot", exprs => DotProduct(exprs.head, exprs(1)))
      register(spark, "graft_fnv32", exprs => Fnv32(exprs.head))
      register(spark, "graft_simhash16", exprs => SimHash16(exprs.head))
      register(spark, "graft_simhash_bands", exprs => SimHashBands(exprs.head))
      register(spark, "graft_topk", topkBuilder)
      register(spark, "graft_bpe_tokens", exprs => BpeTokens(exprs.head))
      register(spark, "graft_trigrams", exprs => CodePointTrigrams(exprs.head))
    }
  }

  /** `graft_topk(score, id, payload, k)` with k a foldable int literal. */
  private[functions] def topkBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4, s"graft_topk(score, id, payload, k), got ${exprs.length} args")
    require(exprs(3).foldable, "graft_topk's k must be a literal")
    TopKByScore(exprs(0), exprs(1), exprs(2),
      exprs(3).eval().asInstanceOf[Number].intValue())
  }
}
