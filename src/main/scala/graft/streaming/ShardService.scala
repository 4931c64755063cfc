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
