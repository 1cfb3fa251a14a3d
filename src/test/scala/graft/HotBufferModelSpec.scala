package graft

import graft.serve.HotBuffer
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property check: the HotBuffer must agree with a naive
  * reference model under arbitrary interleavings of writes (with duplicate
  * keys), reads, and watermark cleanups — the L2 invariant style of
  * `/root/reference/tests/property_tests.rs` applied to the serving tier. */
class HotBufferModelSpec extends AnyFunSuite {

  sealed trait Op
  case class W(partition: Int, key: Option[String], ts: Long) extends Op
  case class Clean(watermarks: Map[Int, Long])                extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    8 -> (for {
      p   <- Gen.chooseNum(0, 2)
      key <- Gen.option(Gen.chooseNum(0, 8).map(k => s"k$k"))
      ts  <- Gen.chooseNum(0L, 100L)
    } yield W(p, key, ts)),
    1 -> (for {
      wms <- Gen.mapOf(Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0L, 5L)))
    } yield Clean(wms))
  )

  /** Naive single-threaded model: per-partition lists + key→offset maps. */
  private final class Model {
    var seqs    = Map.empty[Int, Long].withDefaultValue(0L)
    var idem    = Map.empty[(Int, String), Long]
    var events  = Map.empty[Int, List[(Long, Long)]].withDefaultValue(Nil) // (seq, ts)

    def write(p: Int, key: Option[String], ts: Long): (Long, Boolean) =
      key.flatMap(k => idem.get((p, k))) match {
        case Some(orig) => (orig, true)
        case None =>
          val next = seqs(p) + 1
          seqs += p -> next
          events += p -> (events(p) :+ (next, ts))
          key.foreach(k => idem += (p, k) -> next)
          (next, false)
      }

    def clean(wms: Map[Int, Long]): Unit = wms.foreach { case (p, wm) =>
      val (drop, keep) = events(p).partition(_._1 <= wm)
      events += p -> keep
      // evicted events free their idempotency keys
      idem = idem.filterNot { case ((ip, _), seq) => ip == p && drop.exists(_._1 == seq) }
    }
  }

  test("HotBuffer matches the naive model under random op sequences (property)") {
    val prop = Prop.forAll(Gen.listOfN(60, genOp)) { ops =>
      val h = new HotBuffer
      val m = new Model
      val resultsMatch = ops.zipWithIndex.forall {
        case (W(p, key, ts), i) =>
          h.write("t", p, Array.emptyByteArray, ts, key) == m.write(p, key, ts)
        case (Clean(wms), _) =>
          h.cleanup("t", wms); m.clean(wms); true
      }
      val stateMatches = (0 to 2).forall { p =>
        h.readPartition("t", p, 0L, 1000).map(e => (e.sequence, e.timestampMs)) == m.events(p)
      } && h.highWatermarks("t") == m.seqs.filter(_._2 > 0)
      resultsMatch && stateMatches
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop).passed)
  }
}
