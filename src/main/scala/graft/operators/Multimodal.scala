package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.table

/** Decoded metadata emitted per image blob by the real PNG decoder. */
case class ImageMeta(doc_id: Long, width: Long, height: Long,
                     n_pixel_bytes: Long, pixel_md5: String)

/** Decoded metadata emitted per audio blob by the real WAV decoder. */
case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
                     n_frames: Long, pcm_md5: String)

/** Multimodal columns: media handled as opaque `binary` columns with typed
  * metadata extracted by a partition-local decode stage.
  *
  * Both decoders are REAL JDK codecs — `javax.imageio.ImageIO` (PNG) and
  * `javax.sound.sampled.AudioSystem` (WAV/PCM) ship with the JVM, so no
  * stub is needed. The payloads are generated deterministically from the
  * documents table (the testdata carries no media bytes), which is exactly
  * what makes the decode VERIFIABLE: PNG and PCM-WAV are lossless, so the
  * decoded pixel/sample checksum must equal a checksum the oracle can
  * compute from the same source text without any codec.
  *
  * Spark-side shape (the part that must survive 100 TB): media stays in
  * `binary` columns, decode runs in `mapPartitions` (the Scala analog of
  * `mapInPandas` — one iterator per partition, codec configured once per
  * JVM, no per-row setup, rows never collected to the driver), and
  * per-frame features come from a partition-local explode.
  */
object Multimodal {

  // ImageIO defaults to spilling intermediate state through a temp-file
  // disk cache; executors decoding millions of small blobs must stay
  // in-memory. JVM-global, idempotent.
  javax.imageio.ImageIO.setUseCache(false)

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): String = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < digest.length) {
      sb.append(hexDigits((digest(i) >> 4) & 0xf)).append(hexDigits(digest(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Deterministic PNG payload for a document: a `w x h` RGB raster whose
    * pixel bytes are the document's text bytes cycled in order (byte i of
    * the raster = text byte `i mod len` — the oracle reproduces this as
    * `substring(repeat(text, k), 1, w*h*3)`). Dimensions derive from
    * doc_id alone so the oracle can state them without decoding.
    */
  private[graft] def buildPng(docId: Long, text: String): Array[Byte] = {
    val w = (1L + docId % 16L).toInt
    val h = (1L + (docId / 16L) % 16L).toInt
    val src = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = src(i % src.length) & 0xff
        val g = src((i + 1) % src.length) & 0xff
        val b = src((i + 2) % src.length) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        i += 3; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(w * h * 3 + 128)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: `ImageIO.read` parses the PNG container, inflates
    * the IDAT stream, and hands back the raster — width/height/pixels here
    * are what the codec decoded, not metadata carried alongside.
    */
  private def decodePng(id: Long, payload: Array[Byte]): ImageMeta = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var i = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    ImageMeta(id, w.toLong, h.toLong, out.length.toLong, md5Hex(out))
  }

  /** Image metadata extraction (q30): build the real PNG binary column,
    * then decode it via `mapPartitions` — partition-parallel, nothing on
    * the driver. PNG losslessness is the correctness lever: the decoded
    * pixel checksum must equal md5 of the cycled text bytes, which the
    * DuckDB oracle computes directly from `documents.text`.
    */
  def blobMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) => (id, buildPng(id, text)) } // media column: real PNG bytes
    blobs
      .mapPartitions { it => it.map { case (id, png) => decodePng(id, png) } }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Deterministic WAV payload: 16-bit PCM mono, little-endian, sample
    * rate `8000 * (1 + doc_id mod 4)`, one frame per text byte with
    * sample value `byte * 257` — so the two LE bytes of each sample are
    * both the text byte itself, and the PCM byte stream is the text with
    * every char doubled (printable ASCII end to end), which the oracle
    * can md5 without blob support.
    */
  private[graft] def buildWav(docId: Long, text: String): Array[Byte] = {
    val src = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rate = (8000L * (1L + docId % 4L)).toInt
    val pcm = new Array[Byte](src.length * 2)
    var i = 0
    while (i < src.length) {
      val v = (src(i) & 0xff) * 257 // <= 32639: fits a signed short
      pcm(2 * i) = (v & 0xff).toByte // little-endian low byte first
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, src.length.toLong)
    val bos = new java.io.ByteArrayOutputStream(pcm.length + 64)
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: `AudioSystem.getAudioInputStream` parses the RIFF
    * header and yields format + frames; the PCM checksum is over the bytes
    * the decoder streamed back, oracle-checked against the generating rule.
    */
  private def decodeWav(id: Long, payload: Array[Byte]): AudioMeta = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    val nFrames = ais.getFrameLength
    val pcm = ais.readAllBytes()
    ais.close()
    AudioMeta(id, fmt.getSampleRate.toLong, fmt.getChannels.toLong, nFrames, md5Hex(pcm))
  }

  /** Audio metadata extraction (q60): same shape as [[blobMeta]] — real
    * WAV bytes in a binary column, real JDK decode per partition.
    */
  def audioMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) => (id, buildWav(id, text)) }
      .mapPartitions { it => it.map { case (id, wav) => decodeWav(id, wav) } }
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
