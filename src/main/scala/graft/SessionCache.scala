package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-keyed cache of built values (DataFrames, fixture paths) —
  * the one implementation behind SqlFacade's view cache and
  * TrainingQueries' shared-census caches.
  *
  * Keyed on the session OBJECT (identityHashCode keys are not unique
  * after GC — a stale entry could be handed to a different live
  * session). Cached DataFrames reference their session, so the
  * WeakHashMap's weak keys alone can never fire (the value → key
  * strong path — the WeakHashMap javadoc pitfall). Eviction is
  * therefore explicit, twice over:
  *
  *  1. every access sweeps entries whose SparkContext is stopped;
  *  2. a SparkListener registered at first insertion drops the
  *     session's entry at application end — so a stopped session's
  *     cached frames are released even when no LATER cache access
  *     ever occurs (the round-12 ADVICE residual: without this, the
  *     last session before JVM idle was retained for the JVM
  *     lifetime).
  *
  * Growth is bounded by the live sessions either way.
  */
final class SessionCache[V] {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, V]]())

  /** The cached value for (spark, key), building (and caching) it on
    * first access. `build` may be eager (run Spark jobs); it executes
    * at most once per (session, key) absent races — TrieMap's
    * getOrElseUpdate semantics.
    */
  def getOrElseUpdate(spark: SparkSession, key: String)(build: => V): V = {
    cache.synchronized {
      cache.keySet.removeIf(s => s.sparkContext.isStopped)
    }
    cache.computeIfAbsent(spark, s => {
      // onApplicationEnd fires when THIS session's context stops;
      // removing the entry releases the frames. The listener holds a
      // reference to the stopped session afterwards — harmless, the
      // context (and its listener bus) is gone with it. A context
      // stopped BETWEEN the sweep above and here makes the listener
      // bus throw — swallow it: the next access's sweep evicts the
      // dead entry, which is all the listener would have done.
      try s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          cache.remove(s); ()
        }
      })
      catch { case _: IllegalStateException => }
      scala.collection.concurrent.TrieMap.empty[String, V]
    }).getOrElseUpdate(key, build)
  }
}
