package graft

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memo for DataFrames that act as shared indexes
  * across queries (shingle rows, jaccard pairs, PQ codes): built once,
  * `.cache()`d, and served to every consumer in the session — the way
  * a production pipeline builds an index once per run. Keyed weakly by
  * the session object so an ended session and its cached blocks can be
  * collected; a fixture dir mutated mid-session serves the stale
  * index, as any index would.
  */
final class SessionCache[A] {
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
}
