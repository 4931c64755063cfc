package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Archive naming + store/reader surface: the reference's S3 layout
  * (`YYYYMMDD/<stream>-<client>-<unixTs>.tri`,
  * `/root/reference/triton/store.go:91-104`,
  * `/root/reference/triton/archive.go:45-81`) re-expressed as a Spark
  * partitioned file index: `date`/`client` become partition columns so
  * Catalyst partition pruning replaces the hand-rolled per-day prefix
  * listing of `/root/reference/triton/store_reader.go:54-111`.
  */
object Archive {

  /** The reference's archive key regex (`/root/reference/triton/archive.go:46`). */
  val KeyPattern = "^(\\d{8})/(.+)-(\\d+)\\.tri$".r

  def archiveKey(date: String, stream: String, client: String, unixTs: Long): String =
    s"$date/$stream-$client-$unixTs.tri"

  /** Parse `YYYYMMDD/<stream>[-<client>]-<unixTs>.tri` →
    * (date, stream, client, sortValue); malformed keys → None (the skip
    * path of `/root/reference/triton/store_reader.go:75-79`).
    */
  def parseKey(key: String): Option[(String, String, String, Long)] = key match {
    case KeyPattern(date, name, ts) =>
      val (stream, client) = name.lastIndexOf('-') match {
        case -1 => (name, "")
        case i => (name.substring(0, i), name.substring(i + 1))
      }
      Some((date, stream, client, ts.toLong))
    case _ => None
  }

  /** Store a batch of records into the archive: date/client-partitioned
    * `.tri` files. The buffered/rotated/uploaded lifecycle of the
    * reference's Store (`/root/reference/triton/store.go:106-171`) is
    * subsumed by the file sink: each task streams through a snappy-framed
    * writer, files commit atomically, and `maxRecordsPerFile` bounds rows
    * per file the way hourly rotation bounded it. `maxBytesPerFile` (> 0
    * to enable) additionally rotates on uncompressed encoded bytes — the
    * reference's own rotation unit (`store.go:201`) — so skewed record
    * sizes cannot produce a monster non-splittable file that serializes
    * the readers.
    */
  def store(df: DataFrame, root: String, client: String,
            maxRecordsPerFile: Long = 1000000L,
            maxBytesPerFile: Long = 0L): Unit =
    df
      .withColumn("date", date_format(col("ts"), "yyyyMMdd"))
      .withColumn("client", lit(client))
      .write.format("tri")
      .partitionBy("date", "client")
      .option("maxRecordsPerFile", maxRecordsPerFile) // bounds rows like hourly rotation did
      .option("maxBytesPerFile", maxBytesPerFile)
      .mode("append")
      .save(root)

  /** Archive range scan — the `cat` query
    * (`/root/reference/triton/store_reader.go:54-111`): date-range +
    * client predicates prune partitions (no data read outside the range),
    * single-client invariant enforced like the reference's mixed-client
    * error (`store_reader.go:90-99`).
    *
    * The invariant check is metadata-only: the reference enforces it while
    * *listing* keys, so here it reads the `date=`/`client=` partition
    * directory names — never a data-touching Spark job. At 100 TB that is
    * one listing per in-range date directory instead of a full-range scan
    * before every query.
    */
  def read(spark: SparkSession, root: String, client: String,
           startDate: String, endDate: String): DataFrame = {
    val clients = listClients(spark, root, startDate, endDate)
      .filter(c => client.isEmpty || c == client)
    if (clients.size > 1)
      throw new IllegalStateException(
        s"mixed clients in archive range: ${clients.toSeq.sorted.mkString(",")}")
    val df = spark.read.format("tri").load(root)
      .where(col("date") >= startDate && col("date") <= endDate)
    if (client.nonEmpty) df.where(col("client") === client) else df
  }

  /** Compact one (date, client) partition of the archive — the maintenance
    * job a streaming store makes necessary: `foreachBatch` appends one
    * `.tri` file per (micro-batch, task), so a day of 5-second batches
    * leaves thousands of files, each a listing entry and (the format is
    * non-splittable) a separate read task. Compaction rewrites the
    * partition as ceil(records / maxRecordsPerFile) files and swaps
    * directories in two renames, via hidden (`.`-prefixed) staging and
    * backup names that Spark's partition discovery never sees — so a
    * reader observes either the old file set or the new one, modulo the
    * instant between the renames (run under the maintenance window or a
    * coordinator lock; the reference makes the same single-writer
    * assumption for its uploader). Failure windows: before the first
    * rename nothing changed; a failed second rename rolls the backup
    * back; the final backup delete is retryable garbage. On a
    * rename-as-copy object store the swap degrades to copy+delete —
    * still correct, not atomic.
    *
    * Returns (filesBefore, filesAfter); partitions already at one file
    * (or absent) are left untouched.
    */
  def compact(spark: SparkSession, root: String, client: String, date: String,
              maxRecordsPerFile: Long = 1000000L): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _
    val conf = spark.sessionState.newHadoopConf()
    val partDir = new Path(new Path(root, s"date=${esc(date)}"), s"client=${esc(client)}")
    val fs = partDir.getFileSystem(conf)
    if (!fs.exists(partDir)) return (0L, 0L)
    def dataFiles(p: Path) = fs.listStatus(p).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val before = dataFiles(partDir).length.toLong
    if (before <= 1) return (before, before)
    val df = spark.read.format("tri").load(partDir.toString)
    val n = df.count()
    val nFiles = math.max(1L, (n + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt
    val tmp = new Path(partDir.getParent, s".compact_${partDir.getName}")
    val bak = new Path(partDir.getParent, s".bak_${partDir.getName}")
    fs.delete(tmp, true); fs.delete(bak, true)
    df.repartition(nFiles).write.format("tri")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").save(tmp.toString)
    if (!fs.rename(partDir, bak))
      throw new java.io.IOException(s"compact: cannot stage $partDir")
    if (!fs.rename(tmp, partDir)) {
      fs.rename(bak, partDir) // rollback: the old partition comes back
      throw new java.io.IOException(s"compact: cannot swap in $tmp")
    }
    fs.delete(bak, true)
    (before, dataFiles(partDir).length.toLong)
  }

  /** Distinct `client` partition values present in [startDate, endDate],
    * from the directory layout alone (`date=YYYYMMDD/client=<c>/`). The
    * per-date listings run concurrently: on an object store each LIST is
    * ~tens of ms, so a multi-year range listed serially would cost more
    * than the query — 16-way fan-out keeps it bounded by the slowest call,
    * like the reference's per-day prefix listing loop but parallel.
    *
    * A client directory holding no data files (an aborted write's leftover,
    * or a cleaned-up partition) does not count: the invariant is about data
    * rows, and the reference derives it from keys that by construction have
    * bytes behind them. The whole fan-out is bounded by `listTimeout`
    * (`graft.archive.listTimeoutSec`, default 120 s) — a hung object-store
    * LIST fails the query naming the stuck date directory instead of
    * blocking it forever.
    */
  private def listClients(spark: SparkSession, root: String,
                          startDate: String, endDate: String): Set[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val timeoutSec = spark.conf.getOption("graft.archive.listTimeoutSec")
      .map(_.toLong).getOrElse(120L)
    val dateDirs = fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .flatMap(d => partValue(d.getPath.getName, "date").map(_ -> d.getPath))
      .filter { case (date, _) => date >= startDate && date <= endDate }
      .map(_._2)
    listClientDirs(fs, dateDirs, timeoutSec)
  }

  private def partValue(name: String, col: String): Option[String] =
    if (name.startsWith(col + "=")) Some(
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(name.substring(col.length + 1)))
    else None

  /** The fan-out body of [[listClients]], seam-exposed for tests (a slow
    * FileSystem fake can exercise the timeout without a real object store).
    */
  private[graft] def listClientDirs(fs: org.apache.hadoop.fs.FileSystem,
                                      dateDirs: Seq[org.apache.hadoop.fs.Path],
                                      timeoutSec: Long): Set[String] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, dateDirs.size)))
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val deadline = System.nanoTime() + timeoutSec * 1000000000L
      def awaitAll[T](futs: Seq[(org.apache.hadoop.fs.Path, Future[T])]): Seq[T] =
        futs.map { case (dir, fut) =>
          val left = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
          try Await.result(fut, left.millis)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              throw new java.io.IOException(
                s"archive listing timed out after ${timeoutSec}s at $dir")
          }
        }
      // phase 1: one LIST per date dir — client names from directory names
      val clientDirs = awaitAll(dateDirs.map { d =>
        d -> Future {
          fs.listStatus(d).toSeq.filter(_.isDirectory)
            .flatMap(c => partValue(c.getPath.getName, "client").map(_ -> c.getPath))
        }
      }).flatten
      val byClient = clientDirs.groupBy(_._1)
      if (byClient.size <= 1) byClient.keySet
      else {
        // phase 2 — only when the cheap listing LOOKS mixed: probe each
        // client's dirs for an actual data file, so a leftover empty
        // `client=` dir (aborted write) cannot raise a false mixed-client
        // error. The single-client common case never pays these LISTs.
        def hasData(p: org.apache.hadoop.fs.Path): Boolean =
          fs.listStatus(p).exists { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
        awaitAll(byClient.toSeq.map { case (client, dirs) =>
          dirs.head._2 -> Future { if (dirs.exists(d => hasData(d._2))) Some(client) else None }
        }).flatten.toSet
      }
    } finally pool.shutdownNow()
  }
}
