package graft.operators

import org.apache.spark.sql.Dataset

/** Operator-lifetime Dataset cache registry, shared by the operators whose
  * corpus-derived caches must outlive their builder call (the returned
  * DataFrame's plan reads them at action time) AND whose build closures
  * capture fresh Broadcast handles — which defeats Spark's plan-identity
  * cache dedup, so a naive per-call `.cache()` leaks one entry per call.
  *
  * Each family memoizes under an explicit (family, session, key): a repeat
  * call returns the SAME cached Dataset, and a call with a NEW key releases
  * the family's previous cache, so a long-lived session holds at most one
  * live cache per operator family. (Unpersisting a cache a still-running
  * older query references is safe — Spark recomputes evicted partitions
  * from lineage; it costs that query a rescan, never correctness.)
  * `releaseAll()` drops everything, for session teardown or tests.
  */
private[graft] object OpCache {

  private val liveCaches =
    new java.util.concurrent.ConcurrentHashMap[String, Dataset[_]]()

  def memo[T](family: String, appId: String, key: String,
              build: => Dataset[T]): Dataset[T] =
    liveCaches.synchronized {
      val full = s"$family|$appId|$key"
      val hit = liveCaches.get(full)
      if (hit != null) hit.asInstanceOf[Dataset[T]]
      else {
        val it = liveCaches.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey.startsWith(family + "|")) {
            try e.getValue.unpersist()
            catch { case scala.util.control.NonFatal(_) => () } // stopped old session
            it.remove()
          }
        }
        val ds = build
        liveCaches.put(full, ds)
        ds
      }
    }

  /** Unpersist and forget a single family's live cache (if any). For paths
    * that prove the cache will never be read (e.g. an empty corpus): a bare
    * `unpersist()` on the Dataset would leave the registry entry behind, so
    * a later call on the same key would get a memo hit on a no-longer-
    * cached Dataset — correct but silently recomputing per action.
    */
  def release(family: String): Unit = liveCaches.synchronized {
    val it = liveCaches.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(family + "|")) {
        try e.getValue.unpersist()
        catch { case scala.util.control.NonFatal(_) => () }
        it.remove()
      }
    }
  }

  def releaseAll(): Unit = liveCaches.synchronized {
    val it = liveCaches.entrySet().iterator()
    while (it.hasNext) {
      try it.next().getValue.unpersist()
      catch { case scala.util.control.NonFatal(_) => () }
      it.remove()
    }
  }
}
