package graft.operators

/** Per-task memoization for word-level subword encoders ([[Bpe]],
  * [[WordPiece]], [[Unigram]]): the per-word encode (a merge-list replay,
  * a greedy scan, a Viterbi DP) runs once per DISTINCT word per task, not
  * per occurrence — Heaps'-law repetition makes the hit rate enormous on
  * any real corpus. The UDF closure deserializes fresh for every task, so
  * the map is task-private (single-threaded, no locking) and is freed with
  * the task; the cap bounds executor memory at any corpus size — past it
  * the encoder just recomputes.
  *
  * Memoizing inside the projection beats an explode-distinct-encode-rejoin
  * restructuring: that spelling pays two extra shuffles plus a positional
  * reassembly aggregate, while the memo keeps the single-projection plan
  * (no shuffle at all) and captures the same redundancy.
  */
private[operators] final class WordMemo(encodeWord: String => Seq[String])
    extends (String => Seq[String]) with Serializable {
  private val MemoCap = 1 << 16
  @transient private lazy val memo =
    new java.util.HashMap[String, Seq[String]](1 << 12)

  def apply(text: String): Seq[String] =
    if (text == null) Seq.empty[String]
    else text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
      val hit = memo.get(w)
      if (hit != null) hit
      else {
        val r = encodeWord(w)
        if (memo.size < MemoCap) memo.put(w, r)
        r
      }
    }.toSeq
}
