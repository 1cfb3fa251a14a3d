package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate — the distributed TakeOrdered shape for
  * the ANN family's final ranking.
  *
  * The problem it replaces: `row_number() OVER (PARTITION BY q_id ORDER BY
  * sim DESC, id)` over a scored corpus shuffles EVERY scored row onto
  * |queries| tasks (a constant — 8 here) and sorts them there. Correct at
  * sf0.1, a full-network shuffle onto a handful of executors at 100 TB.
  *
  * This aggregate keeps a bounded k-entry buffer per group. Because it is a
  * proper partial-aggregatable `TypedImperativeAggregate`, the map side
  * combines DOWN TO k ENTRIES PER (task, q_id) before the exchange: the
  * shuffle onto `q_id` then carries at most tasks × queries × k tiny
  * (double, long, long) triples — the classic two-phase top-k, with the
  * "per-partition partial top-k" happening inside Spark's own partial
  * aggregation instead of a hand-rolled mapPartitions.
  *
  * Ordering contract (matches the window it replaces bit for bit): score
  * DESC with SQL double semantics (`-0.0 == 0.0`; scores are cosine
  * similarities and never NaN), ties broken by id ASC. `eval` returns the
  * survivors best-first as `array<struct<score, id, payload>>`, so
  * `posexplode` yields exactly the old `row_number` ranks.
  *
  * The payload slot carries one long of per-candidate context (e.g. the IVF
  * cell a neighbor was found in); queries without context pass 0.
  */
final case class TopKByScore(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer] with TernaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def first: Expression  = score
  override def second: Expression = id
  override def third: Expression  = payload

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType && payload.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (double, bigint, bigint), got " +
        s"(${score.dataType}, ${id.dataType}, ${payload.dataType})")

  override def dataType: DataType = TopKByScore.ResultType
  override def nullable: Boolean  = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKByScore.Buffer = new TopKByScore.Buffer(k)

  override def update(buffer: TopKByScore.Buffer, input: InternalRow): TopKByScore.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = payload.eval(input)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) 0L else p.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKByScore.Buffer, other: TopKByScore.Buffer): TopKByScore.Buffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKByScore.Buffer): Any = {
    val sorted = buffer.sortedBestFirst
    new GenericArrayData(sorted.map(e => InternalRow(e.score, e.id, e.payload): Any))
  }

  override def serialize(buffer: TopKByScore.Buffer): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer =
    TopKByScore.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByScore =
    copy(score = newFirst, id = newSecond, payload = newThird)
}

object TopKByScore {
  val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  final case class Entry(score: Double, id: Long, payload: Long)

  /** `a` strictly outranks `b`: higher score, or equal score (SQL `==`
    * double semantics, so `-0.0` ties `0.0`) and lower id. */
  private def outranks(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean =
    aScore > bScore || (aScore == bScore && aId < bId)

  /** Bounded buffer: a worst-first binary heap of at most k entries, so an
    * update against a full buffer is O(log k) and the map-side partial
    * state can never exceed k entries per group. */
  final class Buffer(k: Int) {
    private val heap = new java.util.PriorityQueue[Entry](
      math.min(k, 1024),
      new java.util.Comparator[Entry] {
        // worst first: lower score first, ties broken by HIGHER id first
        override def compare(a: Entry, b: Entry): Int =
          if (outranks(a.score, a.id, b.score, b.id)) 1
          else if (outranks(b.score, b.id, a.score, a.id)) -1
          else 0
      })

    def insert(score: Double, id: Long, payload: Long): Unit =
      if (heap.size < k) { heap.add(Entry(score, id, payload)); () }
      else {
        val worst = heap.peek()
        if (outranks(score, id, worst.score, worst.id)) {
          heap.poll(); heap.add(Entry(score, id, payload)); ()
        }
      }

    def mergeFrom(other: Buffer): Unit = {
      val it = other.heap.iterator()
      while (it.hasNext) { val e = it.next(); insert(e.score, e.id, e.payload) }
    }

    def sortedBestFirst: Array[Entry] = {
      val arr = heap.toArray(new Array[Entry](heap.size))
      java.util.Arrays.sort(arr, new java.util.Comparator[Entry] {
        override def compare(a: Entry, b: Entry): Int =
          if (outranks(a.score, a.id, b.score, b.id)) -1
          else if (outranks(b.score, b.id, a.score, a.id)) 1
          else 0
      })
      arr
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + heap.size * 24)
      bb.putInt(heap.size)
      val it = heap.iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putDouble(e.score); bb.putLong(e.id); bb.putLong(e.payload)
      }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n  = bb.getInt
      val b  = new Buffer(k)
      var i  = 0
      while (i < n) { b.insert(bb.getDouble, bb.getLong, bb.getLong); i += 1 }
      b
    }
  }

  /** Column-level entry for the DataFrame API:
    * `groupBy(q).agg(TopKByScore.column(sim, id, payload, k))`. */
  def column(score: Column, id: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.graft.SqlBridge.column(
      TopKByScore(
        org.apache.spark.sql.graft.SqlBridge.expression(score),
        org.apache.spark.sql.graft.SqlBridge.expression(id),
        org.apache.spark.sql.graft.SqlBridge.expression(payload),
        k).toAggregateExpression())
}
