package graft

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memo for DataFrames that act as shared indexes
  * across queries (shingle rows, jaccard pairs, PQ codes): built once,
  * `.cache()`d, and served to every consumer in the session — the way
  * a production pipeline builds an index once per run. A fixture dir
  * mutated mid-session serves the stale index, as any index would.
  *
  * LIFECYCLE CONTRACT (r21 advice): although the per-session map is
  * keyed weakly, the cached DataFrames strongly reference their
  * SparkSession (every Dataset holds its session), so the weak entry
  * can never be collected while a memo exists — an ABANDONED session
  * keeps its pinned blocks for process lifetime unless the owner calls
  * [[SessionCache.invalidate]] (as ScaleCurve does between scale
  * points). Long-lived multi-corpus processes must treat invalidate as
  * the session's close(). Pressure behavior within a live session is
  * bounded by Spark itself: every memo is `.cache()` =
  * MEMORY_AND_DISK, so the storage region evicts hot-memory blocks to
  * disk rather than growing the heap, and the worst case of an
  * unbounded key set is disk-resident index copies, not an OOM —
  * SCALING.md ("SessionCache lifetime at 100 TB") records the sizing
  * arithmetic.
  */
final class SessionCache[A] {
  SessionCache.register(this)

  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, A]]())

  def getOrElseUpdate(s: SparkSession, key: String)(mk: => A): A = {
    val perKey = bySession.synchronized {
      val existing = bySession.get(s)
      if (existing != null) existing
      else {
        val m = scala.collection.concurrent.TrieMap.empty[String, A]
        bySession.put(s, m)
        m
      }
    }
    perKey.getOrElseUpdate(key, mk)
  }

  private def drop(s: SparkSession): Unit =
    bySession.synchronized { bySession.remove(s); () }
}

object SessionCache {
  // every module-level SessionCache, so a measurement harness can
  // reset them all; the instances are static vals, so a strong list
  // is their lifetime anyway
  private val instances =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[SessionCache[_]]())

  private def register(c: SessionCache[_]): Unit = { instances.add(c); () }

  /** Forget every memo held for `s` AND unpersist all cached blocks.
    * Needed together: `clearCache()` alone leaves the memoized
    * DataFrames registered but permanently uncached (the `.cache()`
    * call happened at construction), so every later consumer would
    * silently recompute its index per use. After this, the next
    * consumer rebuilds and re-caches — a fresh session, effectively.
    * Used by [[ScaleCurve]] between scale points so one JVM's heap
    * doesn't accumulate four corpora of pinned index blocks.
    */
  def invalidate(s: SparkSession): Unit = {
    instances.synchronized {
      instances.forEach(_.drop(s))
    }
    s.catalog.clearCache()
  }
}
