package graft.core

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memo for session-bound values (cached DataFrames,
  * memory-sink view names): entries must not outlive their SparkSession —
  * a cached plan or temp-view name from session A is dead to session B —
  * and must not PIN sessions either. Sessions are held weakly, so a
  * request-scoped or test-scoped session becomes collectable (with its
  * driver-side cached results) once the caller drops it; a plain
  * `(SparkSession, key)`-keyed map would retain every session for the JVM
  * lifetime. */
final class SessionMemo[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, V]]

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V = synchronized {
    val inner = Option(bySession.get(s)).getOrElse {
      val m = scala.collection.mutable.Map.empty[String, V]
      bySession.put(s, m)
      m
    }
    inner.getOrElseUpdate(key, build)
  }
}
