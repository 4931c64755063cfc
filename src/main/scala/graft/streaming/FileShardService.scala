package graft.streaming

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

/** Directory-backed [[ShardService]]: the stream NAME is a directory path,
  * its subdirectories are shards, and each record is a
  * `<seq>.rec` file holding `[keyLen:int32][keyBytes][data]`.
  *
  * Two real jobs: replaying a recorded stream capture offline through the
  * exact same source code path as the live transport, and exercising the
  * class-name resolution seam ACROSS JVM boundaries — [[FakeKinesis]]
  * state is per-JVM, so only a shared-storage service can prove the
  * source works when driver and executors are separate processes
  * (`local-cluster`, or a real cluster). Resolution:
  * `option("service", "graft.streaming.FileShardService")`.
  *
  * One file per record is deliberately the simplest durable layout — this
  * is a replay/test transport, not the archive (that's the `.tri` format);
  * throughput shapes are the live transport's concern.
  */
object FileShardService extends ShardService {

  private def shardDir(stream: String, shard: String) = new File(stream, shard)

  private def seqsOf(stream: String, shard: String): Array[Long] =
    Option(shardDir(stream, shard).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".rec"))
      .map(_.getName.stripSuffix(".rec").toLong)

  override def listShards(stream: String): Seq[String] =
    Option(new File(stream).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq

  override def latestSequence(stream: String, shard: String): Long = {
    val s = seqsOf(stream, shard)
    if (s.isEmpty) -1L else s.max
  }

  override def getRecords(stream: String, shard: String, afterSeq: Long,
                          limit: Int): Seq[FakeKinesis.Rec] =
    seqsOf(stream, shard).filter(_ > afterSeq).sorted.take(limit).toSeq.map { seq =>
      val f = new File(shardDir(stream, shard), s"$seq.rec")
      val in = new DataInputStream(new FileInputStream(f))
      try {
        val key = new Array[Byte](in.readInt()); in.readFully(key)
        // size from the file length, not available() (an estimate by
        // contract — exact only for a plain local FileInputStream)
        val data = new Array[Byte]((f.length() - 4 - key.length).toInt)
        in.readFully(data)
        FakeKinesis.Rec(seq, new String(key, "UTF-8"), data)
      } finally in.close()
    }

  /** Producer/test helper: append one record to a shard. Write-then-rename
    * so a concurrently polling reader never sees a half-written file.
    */
  def put(stream: String, shard: String, seq: Long, partitionKey: String,
          data: Array[Byte]): Unit = {
    val dir = shardDir(stream, shard); dir.mkdirs()
    val tmp = new File(dir, s"$seq.rec.tmp")
    val out = new DataOutputStream(new FileOutputStream(tmp))
    try {
      val key = partitionKey.getBytes("UTF-8")
      out.writeInt(key.length); out.write(key); out.write(data)
    } finally out.close()
    if (!tmp.renameTo(new File(dir, s"$seq.rec")))
      throw new java.io.IOException(s"rename failed for $tmp")
  }
}
