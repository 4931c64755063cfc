package graft.sources

/** Logical→physical stream indirection (G1) — the reference's YAML config
  * (`/root/reference/triton/config.go:11-43`, `README.md:24-35`):
  *
  * {{{
  * my_stream:
  *   name: my_stream_v2
  *   region: us-west-1
  *   partition_key: value
  * }}}
  *
  * Parsed with a dependency-free subset parser (2-level indented key:
  * value blocks — the only shape the reference format uses).
  */
final case class StreamConfig(name: String, region: String, partitionKey: String)

object StreamConfig {

  def parse(text: String): Map[String, StreamConfig] = {
    val entries = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]()
    var current: Option[String] = None
    text.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val indented = line.head == ' ' || line.head == '\t'
        line.trim.split(":", 2) match {
          case Array(k, v) if !indented =>
            require(v.trim.isEmpty, s"top-level '$k' must open a block")
            current = Some(k.trim)
            entries(k.trim) = scala.collection.mutable.Map()
          case Array(k, v) if indented =>
            val stream = current.getOrElse(
              throw new IllegalArgumentException(s"orphan key '$k' before any stream block"))
            entries(stream)(k.trim) = v.trim
          case other =>
            throw new IllegalArgumentException(s"unparsable config line: '$raw'")
        }
      }
    }
    entries.map { case (logical, kv) =>
      logical -> StreamConfig(
        name = kv.getOrElse("name",
          throw new IllegalArgumentException(s"stream '$logical' missing 'name'")),
        region = kv.getOrElse("region", ""),
        partitionKey = kv.getOrElse("partition_key", ""))
    }.toMap
  }

  def load(path: String): Map[String, StreamConfig] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  /** Logical name → physical config; unknown streams error like
    * `/root/reference/triton/config.go:33-41`.
    */
  def resolve(cfg: Map[String, StreamConfig], logical: String): StreamConfig =
    cfg.getOrElse(logical,
      throw new NoSuchElementException(s"stream '$logical' not in config"))
}
