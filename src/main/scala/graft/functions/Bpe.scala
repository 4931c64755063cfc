package graft.functions

/** Deterministic byte-level BPE — the subword tokenizer a training-data
  * pipeline budgets with (GPT-2-style byte fallback: every UTF-8 byte is
  * a base symbol, so ANY string encodes with zero OOV).
  *
  * Training runs on a WORD-FREQUENCY table, not the corpus: the corpus
  * collapses once into (word, count) — bounded by vocabulary, the same
  * cost class as the q81/q85 profiles — and the merge loop is driver-
  * local over that table (the standard trainer design; a corpus-sized
  * distributed pair-count per merge round would be nMerges full shuffles
  * for identical output). Symbols are ISO-8859-1 single-char strings so
  * byte⇄string round-trips losslessly.
  *
  * Determinism contract (pinned by PipelineCleaningSpec's hand fixture):
  *   - merge choice: max pair count, ties to the lexicographically
  *     smallest (left, right) pair;
  *   - merge application (train AND encode): left-to-right, earliest
  *     occurrence first — encode repeatedly applies the lowest-RANK
  *     applicable pair at its leftmost occurrence, which reproduces the
  *     trainer's left-to-right replacement exactly.
  */
object Bpe {

  private def toSymbols(word: String): Vector[String] =
    word.getBytes("UTF-8").toVector.map(b => new String(Array(b), "ISO-8859-1"))

  /** Train `nMerges` merges from (word, count) rows. Stops early when no
    * adjacent pair remains (every word fully merged).
    */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    var words: Vector[(Vector[String], Long)] =
      wordCounts.toVector.map { case (w, c) => (toSymbols(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var done = 0
    var exhausted = false
    while (done < nMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val mergedSym = best._1 + best._2
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += mergedSym; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
        done += 1
      }
    }
    merges.result()
  }

  /** Encode one word's bytes with the trained ranks: repeatedly merge the
    * lowest-rank applicable pair at its leftmost occurrence. Returns the
    * piece list; concatenating the pieces always reproduces the word's
    * bytes (the round-trip invariant).
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = toSymbols(word)
    var more = syms.length > 1
    while (more) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) more = false
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
        more = syms.length > 1
      }
    }
    syms
  }
}
