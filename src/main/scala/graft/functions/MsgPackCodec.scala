package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal MessagePack codec over Catalyst values, written against the
  * public msgpack spec (github.com/msgpack/msgpack/blob/master/spec.md) —
  * the wire format of the reference's records
  * (`/root/reference/triton/stream_reader.go:173`,
  * `/root/reference/triton/archive_reader.go:19`).
  *
  * Encoding is schema-driven (a Catalyst `DataType` guides both directions):
  * struct -> map with field-name keys, map -> map, array -> array,
  * long/int -> int64 family, double -> float64, float -> float32,
  * string -> str, binary -> bin, boolean -> bool, timestamp -> ext -1
  * (timestamp96: nanoseconds uint32 + seconds int64), null -> nil.
  *
  * Decode is strict about trailing garbage — extra bytes after the
  * top-level value are an error, mirroring the reference's corrupt-record
  * check (`/root/reference/triton/stream_reader.go:185-194`); the
  * expression layer turns decode errors into null (PERMISSIVE semantics).
  */
object MsgPackCodec {

  final class MsgPackException(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------- encode

  def encode(value: Any, dt: DataType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    write(out, value, dt)
    out.toByteArray
  }

  private def write(out: ByteArrayOutputStream, value: Any, dt: DataType): Unit = {
    if (value == null) { out.write(0xc0); return }
    dt match {
      case BooleanType => out.write(if (value.asInstanceOf[Boolean]) 0xc3 else 0xc2)
      case ByteType => writeLong(out, value.asInstanceOf[Byte].toLong)
      case ShortType => writeLong(out, value.asInstanceOf[Short].toLong)
      case IntegerType => writeLong(out, value.asInstanceOf[Int].toLong)
      case LongType => writeLong(out, value.asInstanceOf[Long])
      case FloatType =>
        out.write(0xca); writeBytes(out, ByteBuffer.allocate(4).putFloat(value.asInstanceOf[Float]).array())
      case DoubleType =>
        out.write(0xcb); writeBytes(out, ByteBuffer.allocate(8).putDouble(value.asInstanceOf[Double]).array())
      case StringType => writeStr(out, value.asInstanceOf[UTF8String].getBytes)
      case BinaryType =>
        val b = value.asInstanceOf[Array[Byte]]
        if (b.length < 256) { out.write(0xc4); out.write(b.length) }
        else if (b.length < 65536) { out.write(0xc5); writeShortLen(out, b.length) }
        else { out.write(0xc6); writeIntLen(out, b.length) }
        writeBytes(out, b)
      case TimestampType =>
        // ext type -1, timestamp96: uint32 nanoseconds + int64 seconds
        val us = value.asInstanceOf[Long]
        val sec = Math.floorDiv(us, 1000000L)
        val nsec = Math.floorMod(us, 1000000L) * 1000L
        out.write(0xc7); out.write(12); out.write(0xff)
        writeBytes(out, ByteBuffer.allocate(12).putInt(nsec.toInt).putLong(sec).array())
      case st: StructType =>
        val row = value.asInstanceOf[InternalRow]
        writeMapHeader(out, st.length)
        var i = 0
        while (i < st.length) {
          writeStr(out, UTF8String.fromString(st(i).name).getBytes)
          write(out, if (row.isNullAt(i)) null else row.get(i, st(i).dataType), st(i).dataType)
          i += 1
        }
      case MapType(StringType, vt, _) =>
        val m = value.asInstanceOf[MapData]
        writeMapHeader(out, m.numElements())
        val keys = m.keyArray(); val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          writeStr(out, keys.getUTF8String(i).getBytes)
          write(out, if (vals.isNullAt(i)) null else vals.get(i, vt), vt)
          i += 1
        }
      case ArrayType(et, _) =>
        val arr = value.asInstanceOf[ArrayData]
        val n = arr.numElements()
        if (n < 16) out.write(0x90 | n)
        else if (n < 65536) { out.write(0xdc); writeShortLen(out, n) }
        else { out.write(0xdd); writeIntLen(out, n) }
        var i = 0
        while (i < n) { write(out, if (arr.isNullAt(i)) null else arr.get(i, et), et); i += 1 }
      case NullType => out.write(0xc0)
      case other => throw new MsgPackException(s"unsupported encode type: $other")
    }
  }

  private def writeLong(out: ByteArrayOutputStream, v: Long): Unit = {
    if (v >= 0 && v < 128) out.write(v.toInt)
    else if (v < 0 && v >= -32) out.write(0xe0 | (v.toInt & 0x1f))
    else if (v >= Byte.MinValue && v <= Byte.MaxValue) { out.write(0xd0); out.write(v.toInt) }
    else if (v >= Short.MinValue && v <= Short.MaxValue) { out.write(0xd1); writeShortLen(out, v.toInt) }
    else if (v >= Int.MinValue && v <= Int.MaxValue) { out.write(0xd2); writeIntLen(out, v.toInt) }
    else { out.write(0xd3); writeBytes(out, ByteBuffer.allocate(8).putLong(v).array()) }
  }

  private def writeStr(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    if (b.length < 32) out.write(0xa0 | b.length)
    else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
    else if (b.length < 65536) { out.write(0xda); writeShortLen(out, b.length) }
    else { out.write(0xdb); writeIntLen(out, b.length) }
    writeBytes(out, b)
  }

  private def writeMapHeader(out: ByteArrayOutputStream, n: Int): Unit = {
    if (n < 16) out.write(0x80 | n)
    else if (n < 65536) { out.write(0xde); writeShortLen(out, n) }
    else { out.write(0xdf); writeIntLen(out, n) }
  }

  private def writeShortLen(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeIntLen(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = out.write(b, 0, b.length)

  // ---------------------------------------------------------------- decode

  /** Input abstraction for the decode path: one code path serves both
    * in-memory byte arrays (bounded — `remainingBound` guards corrupt
    * container counts) and true incremental streams (`.tri` archive files
    * decode record-at-a-time off the decompressor, never slurping the
    * file — the reference's lazy read,
    * `/root/reference/triton/archive.go:27-43`).
    */
  private[graft] sealed trait MsgIn {
    def u8(): Int
    def i16(): Short
    def i32(): Int
    def i64(): Long
    def f32(): Float
    def f64(): Double
    def raw(n: Int): Array[Byte]
    def skipBytes(n: Int): Unit
    def hasMore: Boolean
    /** Remaining bytes when knowable (buffers); Int.MaxValue for streams. */
    def remainingBound: Int
  }

  private final class BufIn(buf: ByteBuffer) extends MsgIn {
    def u8(): Int = buf.get() & 0xff
    def i16(): Short = buf.getShort
    def i32(): Int = buf.getInt
    def i64(): Long = buf.getLong
    def f32(): Float = buf.getFloat
    def f64(): Double = buf.getDouble
    def raw(n: Int): Array[Byte] = {
      if (n < 0 || n > buf.remaining())
        throw new MsgPackException(s"length $n exceeds remaining ${buf.remaining()}")
      val b = new Array[Byte](n); buf.get(b); b
    }
    def skipBytes(n: Int): Unit = {
      if (n < 0 || n > buf.remaining())
        throw new MsgPackException(s"skip $n exceeds remaining ${buf.remaining()}")
      buf.position(buf.position() + n)
    }
    def hasMore: Boolean = buf.hasRemaining
    def remainingBound: Int = buf.remaining()
  }

  private final class StreamIn(in0: java.io.InputStream) extends MsgIn {
    private val in = new java.io.DataInputStream(in0)
    private var peeked = -2 // -2 = nothing peeked; -1 = EOF; else one byte
    private def take(): Int =
      if (peeked >= 0) { val b = peeked; peeked = -2; b } else in.read()
    def u8(): Int = take() match {
      case -1 | -2 => throw new MsgPackException("EOF inside msgpack value")
      case b => b
    }
    def i16(): Short = ((u8() << 8) | u8()).toShort
    def i32(): Int = (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
    def i64(): Long = (i32().toLong << 32) | (i32().toLong & 0xffffffffL)
    def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def raw(n: Int): Array[Byte] = {
      if (n < 0) throw new MsgPackException(s"negative length $n")
      // grow in bounded chunks so a corrupt length EOFs before a giant
      // allocation rather than after reserving it
      if (n <= (1 << 20)) { val b = new Array[Byte](n); readFully(b, n); b }
      else {
        val out = new ByteArrayOutputStream(1 << 20)
        var left = n
        val chunk = new Array[Byte](1 << 20)
        while (left > 0) {
          val m = math.min(left, chunk.length)
          readFully(chunk, m); out.write(chunk, 0, m); left -= m
        }
        out.toByteArray
      }
    }
    private def readFully(b: Array[Byte], n: Int): Unit = {
      var off = 0
      if (peeked >= 0 && n > 0) { b(0) = peeked.toByte; peeked = -2; off = 1 }
      try in.readFully(b, off, n - off)
      catch { case _: java.io.EOFException => throw new MsgPackException("EOF inside msgpack value") }
    }
    def skipBytes(n: Int): Unit = { raw(n); () }
    def hasMore: Boolean = {
      if (peeked == -2) peeked = in.read()
      peeked != -1
    }
    def remainingBound: Int = Int.MaxValue
  }

  /** Decode one top-level value; trailing bytes raise. */
  def decode(bytes: Array[Byte], dt: DataType): Any = {
    val in = new BufIn(ByteBuffer.wrap(bytes))
    val v = read(in, dt)
    if (in.hasMore)
      throw new MsgPackException(s"${in.remainingBound} trailing bytes after msgpack value")
    v
  }

  /** Decode a concatenation of top-level values (one archive file's record
    * stream, `/root/reference/triton/archive_reader.go:16-28`) lazily.
    */
  def decodeAll(bytes: Array[Byte], dt: DataType): Iterator[Any] = {
    val in = new BufIn(ByteBuffer.wrap(bytes))
    new Iterator[Any] {
      override def hasNext: Boolean = in.hasMore
      override def next(): Any = read(in, dt)
    }
  }

  /** Decode a concatenation of top-level values incrementally from a
    * stream — memory is bounded by the single largest record, not the
    * file (`.tri` archives are one snappy-framed stream per file; foreign
    * files with no rotation cap decode safely).
    */
  def decodeStream(in0: java.io.InputStream, dt: DataType): Iterator[Any] = {
    val in = new StreamIn(in0)
    new Iterator[Any] {
      override def hasNext: Boolean = in.hasMore
      override def next(): Any = read(in, dt)
    }
  }

  /** Infer a Spark type from the first msgpack value in `bytes` — maps the
    * msgpack tag space onto (struct, array, long, double, string, binary,
    * boolean, timestamp). Used for `.tri` schema inference.
    */
  def inferType(bytes: Array[Byte]): DataType = inferValue(new BufIn(ByteBuffer.wrap(bytes)))

  private def inferValue(buf: MsgIn): DataType = {
    val tag = buf.u8()
    tag match {
      case t if t < 0x80 || t >= 0xe0 || t == 0xcc || t == 0xcd || t == 0xce || t == 0xcf
           || t == 0xd0 || t == 0xd1 || t == 0xd2 || t == 0xd3 =>
        if (t >= 0x80 && t < 0xcc) () else skipIntPayload(buf, t)
        LongType
      case 0xc0 => NullType
      case 0xc2 | 0xc3 => BooleanType
      case 0xca => buf.skipBytes(4); DoubleType
      case 0xcb => buf.skipBytes(8); DoubleType
      case t if (t & 0xe0) == 0xa0 || t == 0xd9 || t == 0xda || t == 0xdb =>
        buf.skipBytes(strLen(buf, t)); StringType
      case 0xc4 | 0xc5 | 0xc6 =>
        buf.skipBytes(binLen(buf, tag)); BinaryType
      case 0xd4 | 0xd5 | 0xd6 | 0xd7 | 0xd8 | 0xc7 | 0xc8 | 0xc9 =>
        val (et, n) = extHeader(buf, tag)
        buf.skipBytes(n)
        if (et == -1) TimestampType else BinaryType
      case t if (t & 0xf0) == 0x90 || t == 0xdc || t == 0xdd =>
        val n = arrLen(buf, t)
        if (n == 0) ArrayType(StringType)
        else {
          val et = inferValue(buf)
          var i = 1
          while (i < n) { skip(buf); i += 1 }
          ArrayType(if (et == NullType) StringType else et)
        }
      case t if (t & 0xf0) == 0x80 || t == 0xde || t == 0xdf =>
        val n = mapLen(buf, t)
        val fields = new Array[StructField](n)
        var i = 0
        while (i < n) {
          val key = UTF8String.fromBytes(buf.raw(strLen(buf, buf.u8()))).toString
          val ft = inferValue(buf)
          fields(i) = StructField(key, if (ft == NullType) StringType else ft)
          i += 1
        }
        StructType(fields)
      case t => throw new MsgPackException(f"cannot infer from tag 0x$t%02x")
    }
  }

  private def skipIntPayload(buf: MsgIn, tag: Int): Unit = tag match {
    case 0xcc | 0xd0 => buf.skipBytes(1)
    case 0xcd | 0xd1 => buf.skipBytes(2)
    case 0xce | 0xd2 => buf.skipBytes(4)
    case 0xcf | 0xd3 => buf.skipBytes(8)
    case _ => ()
  }

  private def read(buf: MsgIn, dt: DataType): Any = {
    val tag = buf.u8()
    if (tag == 0xc0) return null
    dt match {
      case BooleanType => tag match {
        case 0xc2 => false
        case 0xc3 => true
        case _ => fail(tag, dt)
      }
      case ByteType | ShortType | IntegerType | LongType =>
        val v = readLong(buf, tag)
        dt match {
          case LongType => v
          case IntegerType => v.toInt
          case ShortType => v.toShort
          case ByteType => v.toByte
        }
      case FloatType => tag match {
        case 0xca => buf.f32()
        case 0xcb => buf.f64().toFloat
        case _ => readLong(buf, tag).toFloat
      }
      case DoubleType => tag match {
        case 0xcb => buf.f64()
        case 0xca => buf.f32().toDouble
        case _ => readLong(buf, tag).toDouble
      }
      case StringType => UTF8String.fromBytes(buf.raw(strLen(buf, tag)))
      case BinaryType => buf.raw(binLen(buf, tag))
      case TimestampType =>
        val (extType, len) = extHeader(buf, tag)
        if (extType != -1) throw new MsgPackException(s"ext type $extType is not timestamp")
        len match {
          case 4 => (buf.i32().toLong & 0xffffffffL) * 1000000L
          case 8 =>
            val d = buf.i64()
            val nsec = d >>> 34
            val sec = d & 0x3ffffffffL
            sec * 1000000L + nsec / 1000L
          case 12 =>
            val nsec = buf.i32().toLong & 0xffffffffL
            val sec = buf.i64()
            sec * 1000000L + nsec / 1000L
          case n => throw new MsgPackException(s"bad timestamp ext length $n")
        }
      case st: StructType =>
        val n = sane(buf, mapLen(buf, tag))
        val values = new Array[Any](st.length)
        val idx = st.fieldNames.zipWithIndex.toMap
        var i = 0
        while (i < n) {
          val key = UTF8String.fromBytes(buf.raw(strLen(buf, buf.u8()))).toString
          idx.get(key) match {
            case Some(fi) => values(fi) = read(buf, st(fi).dataType)
            case None => skip(buf) // unknown field: ignore (schemaless producers)
          }
          i += 1
        }
        new GenericInternalRow(values)
      case MapType(StringType, vt, _) =>
        val n = sane(buf, mapLen(buf, tag))
        val keys = new Array[Any](n); val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          keys(i) = UTF8String.fromBytes(buf.raw(strLen(buf, buf.u8())))
          vals(i) = read(buf, vt)
          i += 1
        }
        ArrayBasedMapData(keys, vals)
      case ArrayType(et, _) =>
        val n = sane(buf, arrLen(buf, tag))
        val values = new Array[Any](n)
        var i = 0
        while (i < n) { values(i) = read(buf, et); i += 1 }
        new GenericArrayData(values)
      case other => throw new MsgPackException(s"unsupported decode type: $other")
    }
  }

  private def readLong(buf: MsgIn, tag: Int): Long = tag match {
    case t if t < 0x80 => t.toLong
    case t if t >= 0xe0 => (t - 256).toLong
    case 0xcc => buf.u8().toLong
    case 0xcd => (buf.i16() & 0xffff).toLong
    case 0xce => buf.i32().toLong & 0xffffffffL
    case 0xcf => buf.i64() // uint64 > Long.MaxValue wraps; reference maps to uint64 anyway
    case 0xd0 => buf.u8().toByte.toLong
    case 0xd1 => buf.i16().toLong
    case 0xd2 => buf.i32().toLong
    case 0xd3 => buf.i64()
    case t => throw new MsgPackException(f"tag 0x$t%02x is not an integer")
  }

  private def strLen(buf: MsgIn, tag: Int): Int = tag match {
    case t if (t & 0xe0) == 0xa0 => t & 0x1f
    case 0xd9 => buf.u8()
    case 0xda => buf.i16() & 0xffff
    case 0xdb => buf.i32()
    case t => throw new MsgPackException(f"tag 0x$t%02x is not a string")
  }

  private def binLen(buf: MsgIn, tag: Int): Int = tag match {
    case 0xc4 => buf.u8()
    case 0xc5 => buf.i16() & 0xffff
    case 0xc6 => buf.i32()
    case t => strLen(buf, t) // tolerate str-encoded binary (old producers)
  }

  private def mapLen(buf: MsgIn, tag: Int): Int = tag match {
    case t if (t & 0xf0) == 0x80 => t & 0x0f
    case 0xde => buf.i16() & 0xffff
    case 0xdf => buf.i32()
    case t => throw new MsgPackException(f"tag 0x$t%02x is not a map")
  }

  private def arrLen(buf: MsgIn, tag: Int): Int = tag match {
    case t if (t & 0xf0) == 0x90 => t & 0x0f
    case 0xdc => buf.i16() & 0xffff
    case 0xdd => buf.i32()
    case t => throw new MsgPackException(f"tag 0x$t%02x is not an array")
  }

  private def extHeader(buf: MsgIn, tag: Int): (Int, Int) = tag match {
    case 0xd4 => (buf.u8().toByte.toInt, 1)
    case 0xd5 => (buf.u8().toByte.toInt, 2)
    case 0xd6 => (buf.u8().toByte.toInt, 4)
    case 0xd7 => (buf.u8().toByte.toInt, 8)
    case 0xd8 => (buf.u8().toByte.toInt, 16)
    case 0xc7 => { val n = buf.u8(); (buf.u8().toByte.toInt, n) }
    case 0xc8 => { val n = buf.i16() & 0xffff; (buf.u8().toByte.toInt, n) }
    case 0xc9 => { val n = buf.i32(); (buf.u8().toByte.toInt, n) }
    case t => throw new MsgPackException(f"tag 0x$t%02x is not ext")
  }

  /** Guard container counts from corrupt input before allocating: every
    * element costs >= 1 byte, so a count beyond the remaining bytes is
    * garbage — fail fast instead of OOMing the executor on the dead-letter
    * path. (Streams have no knowable bound; their raw reads grow in
    * bounded chunks instead.)
    */
  private def sane(buf: MsgIn, n: Int): Int = {
    if (n < 0 || n > buf.remainingBound)
      throw new MsgPackException(s"container count $n exceeds remaining ${buf.remainingBound} bytes")
    n
  }

  /** Skip one value of any type (unknown struct fields). */
  private def skip(buf: MsgIn): Unit = {
    val tag = buf.u8()
    tag match {
      case t if t < 0x80 || t >= 0xe0 => ()
      case t if (t & 0xe0) == 0xa0 => buf.skipBytes(t & 0x1f)
      case t if (t & 0xf0) == 0x80 => var i = 0; val n = t & 0x0f; while (i < n) { skip(buf); skip(buf); i += 1 }
      case t if (t & 0xf0) == 0x90 => var i = 0; val n = t & 0x0f; while (i < n) { skip(buf); i += 1 }
      case 0xc0 | 0xc2 | 0xc3 => ()
      case 0xcc | 0xd0 => buf.skipBytes(1)
      case 0xcd | 0xd1 => buf.skipBytes(2)
      case 0xce | 0xd2 | 0xca => buf.skipBytes(4)
      case 0xcf | 0xd3 | 0xcb => buf.skipBytes(8)
      case 0xd9 => buf.skipBytes(buf.u8())
      case 0xda => buf.skipBytes(buf.i16() & 0xffff)
      case 0xdb => buf.skipBytes(buf.i32())
      case 0xc4 => buf.skipBytes(buf.u8())
      case 0xc5 => buf.skipBytes(buf.i16() & 0xffff)
      case 0xc6 => buf.skipBytes(buf.i32())
      case 0xd4 => buf.skipBytes(2)
      case 0xd5 => buf.skipBytes(3)
      case 0xd6 => buf.skipBytes(5)
      case 0xd7 => buf.skipBytes(9)
      case 0xd8 => buf.skipBytes(17)
      case 0xc7 => { val n = buf.u8(); buf.skipBytes(1 + n) }
      case 0xc8 => { val n = buf.i16() & 0xffff; buf.skipBytes(1 + n) }
      case 0xc9 => { val n = buf.i32(); buf.skipBytes(1 + n) }
      case 0xde => { var i = 0; val n = buf.i16() & 0xffff; while (i < n) { skip(buf); skip(buf); i += 1 } }
      case 0xdf => { var i = 0; val n = buf.i32(); while (i < n) { skip(buf); skip(buf); i += 1 } }
      case 0xdc => { var i = 0; val n = buf.i16() & 0xffff; while (i < n) { skip(buf); i += 1 } }
      case 0xdd => { var i = 0; val n = buf.i32(); while (i < n) { skip(buf); i += 1 } }
      case t => throw new MsgPackException(f"cannot skip tag 0x$t%02x")
    }
  }

  private def fail(tag: Int, dt: DataType): Nothing =
    throw new MsgPackException(f"tag 0x$tag%02x does not decode as $dt")
}
