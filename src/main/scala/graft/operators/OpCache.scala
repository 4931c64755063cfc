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

  /** Cheap content fingerprint of an input directory: regular-file count,
    * total bytes, max mtime (millis). Memo keys that embed an input dir
    * also embed its stamp (via [[memoDir]]), so a MUTATED dir — a
    * compaction, a re-generated corpus, an appended partition — misses
    * the memo and rebuilds instead of silently serving frames derived
    * from the old contents. The walk is driver-side file listing, the
    * same cost class planners already pay per query; bounded at 100k
    * entries (a corpus dir here is a handful of parquet files). Paths
    * the local filesystem can't resolve (remote URIs) stamp as
    * "unstamped" — behavior degrades to the round-9 convention (caller
    * guarantees immutability), never to an error.
    */
  def dirStamp(dir: String): String =
    try {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) "absent"
      else {
        var n = 0L; var bytes = 0L; var maxM = 0L
        val st = java.nio.file.Files.walk(p)
        try {
          val it = st.iterator()
          while (it.hasNext && n < 100000) {
            val f = it.next()
            try {
              val a = java.nio.file.Files.readAttributes(
                f, classOf[java.nio.file.attribute.BasicFileAttributes])
              if (a.isRegularFile) {
                n += 1; bytes += a.size()
                maxM = math.max(maxM, a.lastModifiedTime().toMillis)
              }
            } catch { case _: java.io.IOException => () } // racing delete
          }
        } finally st.close()
        s"$n:$bytes:$maxM"
      }
    } catch { case scala.util.control.NonFatal(_) => "unstamped" }

  /** [[memo]] for caches derived from an input directory: the dir's
    * [[dirStamp]] joins the key, so mutated inputs invalidate (the
    * family-eviction in memo releases the stale entry on the next call).
    */
  def memoDir[T](family: String, appId: String, dir: String, subKey: String,
                 build: => Dataset[T]): Dataset[T] =
    memo(family, appId, s"$dir|${dirStamp(dir)}|$subKey", build)

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
