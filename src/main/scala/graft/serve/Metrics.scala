package graft.serve

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLongArray, LongAdder}
import scala.jdk.CollectionConverters._

/** A5: counters + fixed-bucket latency histograms rendered in Prometheus
  * text format (`/root/reference/src/metrics/registry.rs:79-660`,
  * `src/metrics/histogram.rs:44-133` — 12 buckets; the reference's
  * `/metrics` endpoint emits the same exposition format). Gauges are
  * registered as callbacks so values like pending-file sums (A3) and
  * consumer lag read live state. */
final class Metrics {
  private val counters   = new ConcurrentHashMap[String, LongAdder]()
  private val histograms = new ConcurrentHashMap[String, Histogram]()
  private val gauges     = new ConcurrentHashMap[String, () => Double]()
  // labelled families — the reference's per-topic breakdowns
  // (`zombi_writes_by_topic_total{topic=...}`, registry.rs:560-660)
  private val labelled       = new ConcurrentHashMap[String, ConcurrentHashMap[String, LongAdder]]()
  private val labelledGauges = new ConcurrentHashMap[String, () => Seq[(String, Double)]]()

  def inc(name: String, delta: Long = 1L): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).add(delta)

  def counter(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  /** `labels` is the rendered label body, e.g. `topic="events"`. */
  def incLabelled(name: String, labels: String, delta: Long = 1L): Unit =
    labelled.computeIfAbsent(name, _ => new ConcurrentHashMap[String, LongAdder]())
      .computeIfAbsent(labels, _ => new LongAdder).add(delta)

  def labelledCounter(name: String, labels: String): Long =
    Option(labelled.get(name)).flatMap(m => Option(m.get(labels))).map(_.sum()).getOrElse(0L)

  def observeMs(name: String, ms: Double): Unit =
    histograms.computeIfAbsent(name, _ => new Histogram).observe(ms)

  def gauge(name: String)(f: => Double): Unit = gauges.put(name, () => f)

  /** A gauge family whose label/value pairs are read live at render time
    * (the reference's per-(topic,partition) hot-storage gauges). */
  def labelledGauge(name: String)(f: => Seq[(String, Double)]): Unit =
    labelledGauges.put(name, () => f)

  /** Prometheus text exposition. */
  def render(): String = {
    val sb = new StringBuilder
    counters.asScala.toSeq.sortBy(_._1).foreach { case (n, v) =>
      sb.append(s"# TYPE $n counter\n$n ${v.sum()}\n")
    }
    labelled.asScala.toSeq.sortBy(_._1).foreach { case (n, m) =>
      sb.append(s"# TYPE $n counter\n")
      m.asScala.toSeq.sortBy(_._1).foreach { case (lbl, v) => sb.append(s"$n{$lbl} ${v.sum()}\n") }
    }
    gauges.asScala.toSeq.sortBy(_._1).foreach { case (n, f) =>
      sb.append(s"# TYPE $n gauge\n$n ${f()}\n")
    }
    labelledGauges.asScala.toSeq.sortBy(_._1).foreach { case (n, f) =>
      sb.append(s"# TYPE $n gauge\n")
      f().sortBy(_._1).foreach { case (lbl, v) => sb.append(s"$n{$lbl} $v\n") }
    }
    histograms.asScala.toSeq.sortBy(_._1).foreach { case (n, h) =>
      sb.append(s"# TYPE $n histogram\n")
      var cum = 0L
      Histogram.BucketsMs.zipWithIndex.foreach { case (le, i) =>
        cum += h.bucketCount(i)
        sb.append(s"""${n}_bucket{le="$le"} $cum\n""")
      }
      sb.append(s"""${n}_bucket{le="+Inf"} ${h.count}\n""")
      sb.append(s"${n}_sum ${h.sumMs}\n${n}_count ${h.count}\n")
    }
    sb.toString
  }
}

object Histogram {
  /** 12 latency buckets (ms), log-spaced like the reference's. */
  val BucketsMs: Seq[Double] =
    Seq(0.5, 1, 2.5, 5, 10, 25, 50, 100, 250, 500, 1000, 2500)
}

final class Histogram {
  private val buckets = new AtomicLongArray(Histogram.BucketsMs.size)
  private val totalCount = new LongAdder
  private val totalSum   = new LongAdder // microseconds, to stay integral

  def observe(ms: Double): Unit = {
    val i = Histogram.BucketsMs.indexWhere(ms <= _)
    if (i >= 0) buckets.incrementAndGet(i)
    totalCount.increment()
    totalSum.add((ms * 1000).toLong)
  }

  def bucketCount(i: Int): Long = buckets.get(i)
  def count: Long               = totalCount.sum()
  def sumMs: Double             = totalSum.sum() / 1000.0
}
