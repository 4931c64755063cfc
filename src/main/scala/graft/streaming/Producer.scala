package graft.streaming

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MsgPackCodec

/** Producer-side client (K3) — the `tritond` analog
  * (`/root/reference/tritond/client.go:28-34`): fire a schemaless record at
  * a named stream with a partition key; the record is msgpack-encoded
  * exactly as the store pipeline expects. The ZeroMQ transport of the
  * reference is an ingestion detail — here the seam is the stream service,
  * with an in-memory mock mirroring `/root/reference/tritond/mock.go:11-75`.
  */
trait ProducerClient {
  def put(stream: String, partitionKey: String, record: Map[String, Any]): Unit
  def close(): Unit = ()
}

object Producer {

  /** Infer the Catalyst (type, value) pair for a plain Scala record value. */
  private[graft] def toCatalyst(v: Any): (DataType, Any) = v match {
    case null => (NullType, null)
    case b: Boolean => (BooleanType, b)
    case i: Int => (LongType, i.toLong)
    case l: Long => (LongType, l)
    case d: Double => (DoubleType, d)
    case f: Float => (DoubleType, f.toDouble)
    case s: String => (StringType, UTF8String.fromString(s))
    case b: Array[Byte] => (BinaryType, b)
    case t: java.sql.Timestamp => (TimestampType, t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case t: java.time.Instant => (TimestampType, t.getEpochSecond * 1000000L + t.getNano / 1000)
    case seq: Seq[_] =>
      val converted = seq.map(toCatalyst)
      val et = converted.headOption.map(_._1).getOrElse(StringType)
      (ArrayType(et), new GenericArrayData(converted.map(_._2).toArray))
    case m: Map[_, _] =>
      val (st, row) = mapToStruct(m.asInstanceOf[Map[String, Any]])
      (st, row)
    case other => throw new IllegalArgumentException(s"unsupported record value: ${other.getClass}")
  }

  private[graft] def mapToStruct(m: Map[String, Any]): (StructType, GenericInternalRow) = {
    val fields = m.toSeq.map { case (k, v) => (k, toCatalyst(v)) }
    (StructType(fields.map { case (k, (dt, _)) => StructField(k, dt) }),
      new GenericInternalRow(fields.map(_._2._2).toArray))
  }

  /** Encode a schemaless record to msgpack — the producer wire payload. */
  def encode(record: Map[String, Any]): Array[Byte] = {
    val (st, row) = mapToStruct(record)
    MsgPackCodec.encode(row, st)
  }

  /** The daemon's two-frame wire format
    * (`/root/reference/tritond/client.go:103-130`): frame 1 is a JSON
    * header `{"stream_name":...,"partition_key":...}`, frame 2 the
    * msgpack-encoded record. The ZeroMQ transport stays out of engine
    * scope (SURVEY §2.2 K3); the framing itself is the portable contract,
    * so a real daemon socket pool can send these bytes unchanged.
    */
  def frame(stream: String, partitionKey: String,
            record: Map[String, Any]): (Array[Byte], Array[Byte]) = {
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val header =
      s"""{"stream_name":${jstr(stream)},"partition_key":${jstr(partitionKey)}}"""
    (header.getBytes(java.nio.charset.StandardCharsets.UTF_8), encode(record))
  }

  /** Parse a frame-1 header back to (stream_name, partition_key) — the
    * daemon's receive side. Malformed headers → None (drop-and-count, the
    * daemon's posture toward garbage frames). Parsing is Jackson (already
    * on Spark's classpath) rather than a hand-rolled unescape loop: the
    * full JSON escape grammar — \n and friends from Go's encoding/json,
    * \uXXXX validation, surrogate pairs — comes correct for free.
    */
  private lazy val headerMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parseHeader(headerFrame: Array[Byte]): Option[(String, String)] =
    try {
      val node = headerMapper.readTree(
        new String(headerFrame, java.nio.charset.StandardCharsets.UTF_8))
      val st = node.get("stream_name")
      val pk = node.get("partition_key")
      if (st != null && st.isTextual && pk != null && pk.isTextual)
        Some((st.asText(), pk.asText()))
      else None
    } catch { case _: Exception => None } // malformed → drop
}

/** Publishes to the (fake) sharded stream service — swap for the real AWS
  * client in production; the call surface is identical.
  */
class StreamProducer extends ProducerClient {
  override def put(stream: String, partitionKey: String, record: Map[String, Any]): Unit =
    FakeKinesis.putRecord(stream, partitionKey, Producer.encode(record))
}

/** In-memory capture, the `MockClient` analog
  * (`/root/reference/tritond/mock.go:21-58`).
  */
class MockProducer extends ProducerClient {
  val puts = scala.collection.mutable.ArrayBuffer[(String, String, Array[Byte])]()
  private var closed = false
  override def put(stream: String, partitionKey: String, record: Map[String, Any]): Unit = {
    require(!closed, "put on closed producer")
    synchronized { puts += ((stream, partitionKey, Producer.encode(record))) }
  }
  override def close(): Unit = closed = true
}
