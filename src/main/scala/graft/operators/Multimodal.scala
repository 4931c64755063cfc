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

/** Thumbnail row emitted per image by the resize stage (q61).
  *
  * Top-level on purpose: a `private case class` nested in the object makes
  * the accessors package-private in bytecode, and Janino-generated
  * `SerializeFromObject` code can't call them — every task then throws
  * `CompileException` and falls back to interpreted projection.
  */
case class ThumbMeta(doc_id: Long, src_w: Long, src_h: Long,
                     thumb_md5: String)

/** Per-doc amplitude stats emitted by the audio feature extractor (q62).
  * Top-level for codegen visibility — see [[ThumbMeta]].
  */
case class AudioEnergy(doc_id: Long, n_frames: Long, sum_amp: Long,
                       peak_amp: Long)

/** Per-doc resample stats emitted by the audio rate converter (q160).
  * Top-level for codegen visibility — see [[ThumbMeta]].
  */
case class ResampleStats(doc_id: Long, src_rate: Long, n_in: Long,
                         n_out: Long, sum_amp: Long, peak_amp: Long)

/** Per-image difference-hash bands (q150). Top-level for codegen
  * visibility — see [[ThumbMeta]].
  */
case class DhashBands(doc_id: Long, src_w: Long, src_h: Long,
                      b0: Long, b1: Long, b2: Long, b3: Long)

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

  /** Deterministic raster for a document: `w x h` RGB pixels that are the
    * document's text bytes cycled in order (byte i of the raster = text
    * byte `i mod len` — the oracle reproduces this as
    * `substring(repeat(text, k), 1, w*h*3)`). Dimensions derive from
    * doc_id alone so the oracle can state them without decoding.
    */
  private def pngRaster(docId: Long, text: String): java.awt.image.BufferedImage = {
    val w = (1L + docId % 16L).toInt
    val h = (1L + (docId / 16L) % 16L).toInt
    val src = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0; var j = 0
    while (j < px.length) {
      val r = src(i % src.length) & 0xff
      val g = src((i + 1) % src.length) & 0xff
      val b = src((i + 2) % src.length) & 0xff
      px(j) = (r << 16) | (g << 8) | b
      i += 3; j += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w) // one bulk raster write, not w*h calls
    img
  }

  /** Encode through a caller-owned writer — the payload-generation twin of
    * [[decodePng]]'s per-partition reader reuse.
    */
  private def encodePng(writer: javax.imageio.ImageWriter,
                        img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(img.getWidth * img.getHeight * 3 + 128)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.close()
    bos.toByteArray
  }

  /** One-shot PNG payload (tests, single blobs): fresh writer per call. */
  private[graft] def buildPng(docId: Long, text: String): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    try encodePng(writer, pngRaster(docId, text)) finally writer.dispose()
  }

  /** REAL image decode: the PNG reader parses the container, inflates the
    * IDAT stream, and hands back the raster — width/height/pixels here
    * are what the codec decoded, not metadata carried alongside. Takes
    * the reader as an argument so the decode stage instantiates ONE
    * reader per partition (the `ImageIO.read` convenience re-runs the
    * service-provider lookup per call — measurable per-row overhead on a
    * million-blob partition); pixels move via one bulk `getRGB`.
    */
  /** Decode a PNG payload to (width, height, packed RGB ints) — the
    * container-read sequence shared by q30's metadata path and q61's
    * resize path, so codec handling (input-stream lifetime, bulk getRGB)
    * has exactly one implementation. Closes the image input stream on
    * failure as well as success.
    */
  private def decodeRaster(reader: javax.imageio.ImageReader,
                           payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, true, true)
      val img = reader.read(0)
      val w = img.getWidth; val h = img.getHeight
      (w, h, img.getRGB(0, 0, w, h, null, 0, w))
    } finally iis.close()
  }

  private def decodePng(reader: javax.imageio.ImageReader, id: Long,
                        payload: Array[Byte]): ImageMeta = {
    val (w, h, px) = decodeRaster(reader, payload)
    val out = new Array[Byte](w * h * 3)
    var i = 0; var j = 0
    while (j < px.length) {
      val rgb = px(j)
      out(i) = ((rgb >> 16) & 0xff).toByte
      out(i + 1) = ((rgb >> 8) & 0xff).toByte
      out(i + 2) = (rgb & 0xff).toByte
      i += 3; j += 1
    }
    ImageMeta(id, w.toLong, h.toLong, out.length.toLong, md5Hex(out))
  }

  /** Image metadata extraction (q30): build the real PNG binary column,
    * then decode it via `mapPartitions` — partition-parallel, decoder
    * instantiated once per partition, nothing on the driver. PNG
    * losslessness is the correctness lever: the decoded pixel checksum
    * must equal md5 of the cycled text bytes, which the DuckDB oracle
    * computes directly from `documents.text`.
    */
  def blobMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { it => // media column: real PNG bytes, one writer per partition
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        it.map { case (id, text) => (id, encodePng(writer, pngRaster(id, text))) }
      }
    blobs
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        it.map { case (id, png) => decodePng(reader, id, png) }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Image RESIZE (q61): decode the real PNG, nearest-neighbor downsample
    * the decoded raster to `outW x outH`, and emit the thumbnail's pixel
    * checksum — the feature-extraction step of a vision-data pipeline
    * (every VLM preprocessing stack opens with decode + resize). The
    * sampling rule is integer arithmetic (`sx = x*w / outW`), so the
    * oracle reproduces the thumbnail bytes from the generating text with
    * no codec — possible precisely because the decode is lossless and
    * the kernel deterministic. Same scale shape as q30: per-partition
    * codec, no shuffle, nothing on the driver.
    */
  def imageResize(s: SparkSession, dir: String, outW: Int = 8, outH: Int = 8): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { it =>
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        it.map { case (id, text) => (id, encodePng(writer, pngRaster(id, text))) }
      }
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        it.map { case (id, png) =>
          val (w, h, px) = decodeRaster(reader, png)
          val out = new Array[Byte](outW * outH * 3)
          var p = 0
          while (p < outW * outH) {
            val x = p % outW; val y = p / outW
            val rgb = px((y * h / outH) * w + (x * w / outW))
            out(3 * p) = ((rgb >> 16) & 0xff).toByte
            out(3 * p + 1) = ((rgb >> 8) & 0xff).toByte
            out(3 * p + 2) = (rgb & 0xff).toByte
            p += 1
          }
          ThumbMeta(id, w.toLong, h.toLong, md5Hex(out))
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** The JDK's REAL WAV codec pair, resolved once via the same SPI
    * registry `AudioSystem` dispatches through. Going to the SPI directly
    * matters in a per-row kernel: the `AudioSystem.getAudioInputStream`
    * convenience retries EVERY registered provider per call, and each
    * non-WAV reader signals "not mine" by throwing — an exception-storm
    * tax of hundreds of µs/row (q60 measured 200 s for 5 M blobs at sf10
    * through the convenience path; see BENCH_NOTES for the SPI number).
    */
  private def wavReader(): javax.sound.sampled.spi.AudioFileReader = {
    // build the probe bytes ONCE, outside the per-reader try: if the WAV
    // writer itself is missing, that failure must surface as its own
    // error, not be swallowed into "no reader" for every candidate
    val probe = buildWavBytes(8000, Array[Byte](65))
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    while (it.hasNext) {
      val r = it.next()
      // probe with a minimal valid WAV: the reader that accepts it is the
      // container's codec (com.sun.media.sound.WaveFileReader in the JDK)
      try {
        r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe))
        return r
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    throw new IllegalStateException("no WAV AudioFileReader on this JVM")
  }

  private def wavWriter(): javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    while (it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE)) return w
    }
    throw new IllegalStateException("no WAV AudioFileWriter on this JVM")
  }

  private def buildWavBytes(rate: Int, src: Array[Byte]): Array[Byte] = {
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
    val w = wavWriterTL.get()
    w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // one resolved codec pair per executor thread — the SPI probe runs once,
  // not per row or even per partition
  private lazy val wavWriterTL =
    ThreadLocal.withInitial[javax.sound.sampled.spi.AudioFileWriter](() => wavWriter())
  private lazy val wavReaderTL =
    ThreadLocal.withInitial[javax.sound.sampled.spi.AudioFileReader](() => wavReader())

  /** Deterministic WAV payload: 16-bit PCM mono, little-endian, sample
    * rate `8000 * (1 + doc_id mod 4)`, one frame per text byte with
    * sample value `byte * 257` — so the two LE bytes of each sample are
    * both the text byte itself, and the PCM byte stream is the text with
    * every char doubled (printable ASCII end to end), which the oracle
    * can md5 without blob support.
    */
  private[graft] def buildWav(docId: Long, text: String): Array[Byte] =
    buildWavBytes((8000L * (1L + docId % 4L)).toInt,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** REAL audio decode: the RIFF header is parsed and the PCM streamed
    * back by the JDK's WAV codec; checksum is over what the decoder
    * returned, oracle-checked against the generating rule.
    */
  private def decodeWav(id: Long, payload: Array[Byte]): AudioMeta = {
    val ais = wavReaderTL.get()
      .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
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

  /** Audio FEATURE EXTRACTION (q62): decode the real WAV and fold the
    * decoded 16-bit samples into amplitude statistics (sum + peak —
    * integer-exact, so no float-order concerns cross engines). The same
    * shape as any real per-clip featurizer (loudness, clipping
    * detection): stream the decoder's PCM once, O(1) state per row.
    */
  def audioEnergy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) => (id, buildWav(id, text)) }
      .mapPartitions { it =>
        it.map { case (id, wav) =>
          val ais = wavReaderTL.get()
            .getAudioInputStream(new java.io.ByteArrayInputStream(wav))
          val pcm = ais.readAllBytes()
          ais.close()
          var i = 0; var sum = 0L; var peak = 0L
          while (i + 1 < pcm.length) {
            val v = ((pcm(i) & 0xff) | ((pcm(i + 1) & 0xff) << 8)).toLong
            sum += v; if (v > peak) peak = v
            i += 2
          }
          AudioEnergy(id, pcm.length.toLong / 2L, sum, peak)
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Audio resample to a fixed target rate (q160): decode the real WAV
    * through the JDK codec, then linear-interpolate the 16-bit PCM from
    * its source rate (8000·(1+id%4)) to `outRate` (11025 default — not a
    * divisor or multiple of any source rate, so the fractional blend
    * path runs on every clip; 8000-rate clips UPSAMPLE, exercising the
    * end-clamp) — the
    * sample-rate normalization every audio training pipeline runs before
    * batching (models want one rate). The interpolation is EXACT integer
    * arithmetic: source position of output i is the rational
    * i·srcRate/outRate, split as idx = div and frac = mod, and the
    * blended sample is (s[idx]·(outRate−frac) + s[idx+1]·frac) div
    * outRate — no float resampler convention to match, so the oracle
    * reproduces every output sample from the generating text. Emitted as
    * amplitude stats (the q62 shape): order-free integer sums.
    *
    * Scale shape: per-partition codec kernel, O(1) state per clip, no
    * shuffle.
    */
  def audioResample(s: SparkSession, dir: String,
                    outRate: Int = 11025): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) => (id, buildWav(id, text)) }
      .mapPartitions { it =>
        it.map { case (id, wav) =>
          val ais = wavReaderTL.get()
            .getAudioInputStream(new java.io.ByteArrayInputStream(wav))
          val srcRate = ais.getFormat.getSampleRate.toLong
          val pcm = ais.readAllBytes()
          ais.close()
          val nIn = pcm.length / 2
          def sample(j: Int): Long = {
            val k = math.min(j, nIn - 1)
            ((pcm(2 * k) & 0xff) | ((pcm(2 * k + 1) & 0xff) << 8)).toLong
          }
          val nOut = (nIn * outRate) / srcRate
          var i = 0L; var sum = 0L; var peak = 0L
          while (i < nOut) {
            val posNum = i * srcRate
            val idx = (posNum / outRate).toInt
            val frac = posNum % outRate
            val v = (sample(idx) * (outRate - frac) + sample(idx + 1) * frac) / outRate
            sum += v; if (v > peak) peak = v
            i += 1
          }
          ResampleStats(id, srcRate, nIn.toLong, nOut, sum, peak)
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Frame sampling: chunk each payload into fixed 64-char frames, keep
    * every 3rd (a video frame-sampler's stride), emit per-frame checksums.
    * The explode is partition-local; at scale frame rows shuffle only if a
    * downstream op groups them.
    */
  /** Animated-GIF payload, emitted BY HAND to the GIF89a wire format:
    * each 4×4 frame's 16 pixel bytes are exactly
    * md5(s"$docId:$frame:$text") (a digest is 16 bytes — no cycling
    * rule to restate), indexed into an identity grayscale palette so a
    * decoded frame's red channel IS the original pixel byte. GIF is
    * palette-indexed and lossless at ≤256 colors — the correctness
    * lever that lets the oracle state decoded pixel sums without
    * running a codec.
    *
    * Wire layout:
    * header + logical screen descriptor, the 256-entry grayscale global
    * color table, and per frame an image descriptor (no interlace, no
    * local table) plus a valid literal-only LZW stream (CLEAR, 16
    * 9-bit literals, END — the dictionary never reaches the 512-entry
    * width bump, so fixed 9-bit codes are spec-correct).
    *
    * Hand emission is deliberate, for two reasons. Speed: the JDK GIF
    * writer costs ~1.2 ms/payload in a per-row kernel — writeToSequence
    * re-parses a 260-node metadata tree per frame (and without explicit
    * metadata it either interlaces, which the JDK pair mis-round-trips
    * below 8 rows — rows permuted and zeroed, measured — or swaps in a
    * web-safe palette). Evidence: the DECODE stage still runs the real
    * JDK codec, so the q89 oracle certifies a CROSS-IMPLEMENTATION
    * round trip — this writer's bytes through Sun's LZW decoder —
    * which is stronger than same-library symmetry.
    */
  private[graft] def buildGif(docId: Long, text: String): Array[Byte] = {
    val nFrames = (2L + docId % 6L).toInt
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(4); out.write(0); out.write(4); out.write(0) // screen 4x4, LE
    out.write(0xF7) // global color table, 8-bit color, 256 entries
    out.write(0); out.write(0) // background index, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    var f = 0
    while (f < nFrames) {
      val digest = md.digest(
        s"$docId:$f:$text".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.write(0x2C) // image descriptor
      out.write(0); out.write(0); out.write(0); out.write(0) // left, top
      out.write(4); out.write(0); out.write(4); out.write(0) // 4x4
      out.write(0x00) // no local table, no interlace
      out.write(8)    // LZW minimum code size
      // 9-bit codes LSB-first: CLEAR(256), 16 pixel literals, END(257)
      var acc = 0L; var nbits = 0
      val blk = new java.io.ByteArrayOutputStream(24)
      def put(code: Int): Unit = {
        acc |= code.toLong << nbits; nbits += 9
        while (nbits >= 8) { blk.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      }
      put(256)
      var p = 0
      while (p < 16) { put(digest(p) & 0xff); p += 1 }
      put(257)
      if (nbits > 0) blk.write((acc & 0xff).toInt)
      out.write(blk.size()) // one sub-block (21 bytes)
      blk.writeTo(out)
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** VIDEO-style frame sampling over a real multi-frame container (q89):
    * build an animated GIF per document, then run the standard video
    * preprocessing primitive — decode the container, count its frames,
    * keep every `stride`-th — through the JDK's actual GIF codec
    * (frame-indexed `reader.read(f)`, not a metadata shortcut; skipped
    * frames are never rasterized). Emits per doc the container's frame
    * count, the sampled count, and the decoded-pixel sum over sampled
    * frames; the oracle recomputes that sum from the md5 generation
    * rule, so a codec round-trip defect in ANY sampled frame
    * hash-mismatches. Same scale shape as q30/q60/q61: per-partition
    * codec instances, no shuffle, nothing on the driver.
    */
  def gifFrameSample(s: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) => (id, buildGif(id, text)) }
      }
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val mapped = it.map { case (id, gif) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(gif))
          try {
            reader.setInput(iis, false, true) // random access: frame count + read(f)
            val nFrames = reader.getNumImages(true)
            var pixSum = 0L; var nSampled = 0L; var f = 0
            while (f < nFrames) {
              val img = reader.read(f)
              val w = img.getWidth; val h = img.getHeight
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var j = 0
              while (j < px.length) { pixSum += (px(j) >> 16) & 0xff; j += 1 }
              nSampled += 1
              f += stride
            }
            (id, nFrames.toLong, nSampled, pixSum)
          } finally iis.close()
        }
        // ImageReader holds codec/metadata state until dispose(); release
        // it when the partition iterator is exhausted rather than at GC.
        new Iterator[(Long, Long, Long, Long)] {
          private var disposed = false
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h && !disposed) { disposed = true; reader.dispose() }
            h
          }
          def next(): (Long, Long, Long, Long) = mapped.next()
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "pix_sum")
      .orderBy($"doc_id")
  }

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

  /** 16-bit dHash bands from a decoded raster: 9×8 nearest-neighbor
    * grayscale (integer luma (299r+587g+114b) div 1000), one bit per
    * horizontal gradient (g[y][x] < g[y][x+1]), rows 2k/2k+1 packed into
    * band k at bit (y%2)*8+x. Pure integer — the oracle reproduces the
    * bits from the generating text with no codec.
    */
  private[graft] def dhashFromRaster(w: Int, h: Int,
                                     px: Array[Int]): Array[Long] = {
    val g = new Array[Int](72)
    var p = 0
    while (p < 72) {
      val y = p / 9; val x = p % 9
      val rgb = px((y * h / 8) * w + (x * w / 9))
      g(p) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
      p += 1
    }
    val bands = new Array[Long](4)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1))
          bands(y / 2) |= 1L << ((y % 2) * 8 + x)
        x += 1
      }
      y += 1
    }
    bands
  }

  /** Perceptual image hash (q150): build the real PNG binary column,
    * decode it through the JDK codec, and emit the classic dHash
    * (difference hash — gradient signs over a 9×8 downsample) as four
    * 16-bit BIGINT bands. The bands ARE the LSH index for image
    * near-dup: exact-match any band → candidate pair, 4 bands pigeonhole
    * every pair within Hamming distance 3 into at least one shared band
    * (see [[dhashPairs]]). PNG losslessness keeps the whole chain
    * oracle-checkable — the DuckDB side recomputes the bits from the
    * generating text, so a codec bug anywhere in the round trip breaks
    * the hash compare.
    *
    * Scale shape: per-partition codec kernel (same as q30/q61), no
    * shuffle, 4 small integers per image out.
    */
  def imageDhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { it =>
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        it.map { case (id, text) => (id, encodePng(writer, pngRaster(id, text))) }
      }
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
        it.map { case (id, png) =>
          val (w, h, px) = decodeRaster(reader, png)
          val b = dhashFromRaster(w, h, px)
          DhashBands(id, w.toLong, h.toLong, b(0), b(1), b(2), b(3))
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Banded image near-dup pairs over [[imageDhash]] output: exact-match
    * any of the 4 bands → candidate, then the full 64-bit Hamming
    * distance filters to ≤ `maxDist`. Pigeonhole-complete for
    * maxDist ≤ 3 (4 bands, so ≤ 3 differing bits leave ≥ 1 band clean).
    * Two guards make the bucket join 100 TB-safe: images smaller than
    * the 9×8 sampling grid are excluded (their upsampled gradients are
    * constant-dominated — at this corpus they all hash to a handful of
    * values and would form quadratic buckets), and any bucket larger
    * than `bucketCap` is dropped as low-information (the q20/q21
    * saturation rule; deterministic, so the spec can pin it).
    */
  def dhashPairs(hashes: DataFrame, maxDist: Int = 3,
                 bucketCap: Int = 64): DataFrame = {
    val s = hashes.sparkSession
    import s.implicits._
    val banded = hashes
      .where($"src_w" >= 9 && $"src_h" >= 8) // at least the sampling grid
      .select($"doc_id", $"b0", $"b1", $"b2", $"b3",
        posexplode(array($"b0", $"b1", $"b2", $"b3")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "v")
    val ok = banded.groupBy($"band", $"v").agg(count(lit(1)).as("bc"))
      .where($"bc" <= bucketCap)
    val inBucket = banded.join(ok, Seq("band", "v"))
    val cand = inBucket.as("x").join(inBucket.as("y"),
        $"x.band" === $"y.band" && $"x.v" === $"y.v" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        (expr("bit_count(x.b0 ^ y.b0) + bit_count(x.b1 ^ y.b1)") +
          expr("bit_count(x.b2 ^ y.b2) + bit_count(x.b3 ^ y.b3)")).as("hamming"))
      .distinct()
    cand.where($"hamming" <= maxDist).orderBy($"doc_a", $"doc_b")
  }
}
