package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.table

/** Decoded metadata emitted per blob by the (stubbed) media decoder. */
case class BlobMeta(doc_id: Long, n_bytes: Long, checksum: String,
                    width: Long, height: Long)

/** Multimodal plumbing: media handled as opaque `binary` columns with typed
  * metadata extracted by a partition-local decode stage.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side is real:
  * binary column construction, `Dataset[T]` encoders, `mapPartitions`
  * batching (the Scala analog of `mapInPandas` — one iterator per
  * partition, decoder state initialized once per partition, no per-row
  * setup), and frame-explosion for sampled per-frame features.
  */
object Multimodal {

  /** STUB decoder: in production this would call the real image/audio codec
    * on `bytes` and return true dimensions. Deterministic fake: dimensions
    * derived from the md5 of the payload, so the pipeline shape (schema,
    * batching, partitioning) is testable end-to-end.
    */
  private val hexDigits = "0123456789abcdef".toCharArray

  private def decodeStub(id: Long, bytes: Array[Byte]): BlobMeta = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    // table-driven hex: the per-byte format-string path allocates a
    // formatter per byte and costs ~10x in a per-row kernel
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < digest.length) {
      sb.append(hexDigits((digest(i) >> 4) & 0xf)).append(hexDigits(digest(i) & 0xf))
      i += 1
    }
    val hex = sb.toString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    BlobMeta(id, bytes.length.toLong, hex, h % 1024L, (h >> 10) % 1024L)
  }

  /** Blob metadata extraction: documents' text re-encoded as a binary
    * payload column (standing in for image/audio bytes), decoded via
    * `mapPartitions` — partition-parallel, one decoder instance per task,
    * rows never collected to the driver.
    */
  def blobMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = table(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    blobs
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Frame sampling: chunk each payload into fixed 64-char frames, keep
    * every 3rd (a video frame-sampler's stride), emit per-frame checksums.
    * The explode is partition-local; at scale frame rows shuffle only if a
    * downstream op groups them.
    */
  def frameSample(s: SparkSession, dir: String, frameLen: Int = 64, stride: Int = 3): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id",
        posexplode(expr(
          s"transform(sequence(0, cast((length(text) - 1) div $frameLen as int)), " +
          s"i -> substring(text, i * $frameLen + 1, $frameLen))")))
      .where($"pos" % stride === 0)
      .select($"doc_id", $"pos".cast("long").as("frame_idx"), md5(col("col")).as("frame_md5"))
      .orderBy($"doc_id", $"frame_idx")
  }
}
