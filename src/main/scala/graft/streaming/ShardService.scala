package graft.streaming

/** The four-call seam to the sharded-stream service — the surface the
  * reference consumes from the AWS SDK (`/root/reference/triton/stream.go:
  * 84-111`, `/root/reference/triton/shard.go`): list a stream's shards,
  * read the head sequence, and page records after a sequence number.
  *
  * A production deployment implements this against the real client and
  * names the implementation in the source's `service` option; the sandbox
  * and tests use the stateful [[FakeKinesis]] singleton. Resolution is by
  * class name on both driver and executors, so the swap is structural —
  * no source code changes, just an option.
  */
trait ShardService extends Serializable {
  def listShards(stream: String): Seq[String]
  def latestSequence(stream: String, shard: String): Long

  /** Up to `limit` records of `shard` strictly after `afterSeq`
    * (-1 = trim horizon), in sequence order. May throw a retryable
    * throttling error ([[FakeKinesis.ThrottledException]]).
    *
    * A SHORT page carries no meaning: implementations may legitimately
    * return fewer than `limit` records while more remain (real Kinesis
    * GetRecords does). Only an EMPTY result means the backlog after
    * `afterSeq` is drained — the reader keeps fetching until it sees one
    * or passes its batch-end sequence.
    */
  def getRecords(stream: String, shard: String, afterSeq: Long, limit: Int): Seq[FakeKinesis.Rec]

  /** Shard id by position in the stream's shard listing — "give me the 2nd
    * shard without knowing its id", the reference's `PickShardID`
    * (`/root/reference/triton/stream.go:226-245`). 0-based; fails with the
    * shard count when the stream has no shard `n` (the reference's
    * bounds check, minus its off-by-one at exactly len).
    */
  def pickShardId(stream: String, n: Int): String = {
    val shards = listShards(stream)
    require(n >= 0 && n < shards.length,
      s"stream $stream doesn't have a shard $n (${shards.length} shards)")
    shards(n)
  }
}

object ShardService {
  /** Resolve by name: empty/"fake" -> the in-memory service; otherwise a
    * Scala object (MODULE$) or a no-arg class implementing the trait.
    */
  def resolve(name: String): ShardService =
    if (name == null || name.isEmpty || name == "fake") FakeKinesis
    else try {
      Class.forName(if (name.endsWith("$")) name else name + "$")
        .getField("MODULE$").get(null).asInstanceOf[ShardService]
    } catch {
      case _: ClassNotFoundException | _: NoSuchFieldException =>
        Class.forName(name).getDeclaredConstructor().newInstance().asInstanceOf[ShardService]
    }
}
