package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def enc(text: String, vocab: Seq[(String, Long)]): Seq[String] =
    Unigram.encode(Seq((1L, text)).toDF("id", "t"), "id", "t", vocab)
      .select("pieces").head.getSeq[String](0)

  test("DP beats greedy: global score picks a|bc where longest-match takes ab|c") {
    val v = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 4L, "bc" -> 9L)
    // both 2-piece segmentations exist; a+bc scores 1+9=10 > ab+c 4+1=5
    assert(enc("abc", v) === Seq("a", "bc"))
  }

  test("min piece count dominates score") {
    // abc as one piece (score 2) beats a|bc (score 1+9=10) on count
    val v = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "bc" -> 9L, "abc" -> 2L)
    assert(enc("abc", v) === Seq("abc"))
  }

  test("leftmost-longest among equal (count, score) optima") {
    // ab|c and a|bc both 2 pieces, both score 5+1=6 / 1+5: make them equal
    val v = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 5L, "bc" -> 5L)
    // ab+c = 5+1 = 6; a+bc = 1+5 = 6 -> tie -> longest first piece wins
    assert(enc("abc", v) === Seq("ab", "c"))
  }

  test("unknown single chars fall back to score-0 singletons (total encode)") {
    val v = Seq("a" -> 3L, "ab" -> 5L)
    assert(enc("axb", v) === Seq("a", "x", "b"))
    assert(enc("", v) === Seq.empty)
    // multi-word split on spaces, empties dropped
    assert(enc("ab  a", v) === Seq("ab", "a"))
  }

  test("encode matches brute-force optimum (min count, max score, leftmost-longest)") {
    val vocab = Seq("a" -> 2L, "b" -> 1L, "c" -> 3L, "ab" -> 7L, "ba" -> 7L,
      "bc" -> 6L, "ca" -> 5L, "abc" -> 11L, "cab" -> 11L, "aa" -> 4L)
    val vmap = vocab.toMap
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(3, w.length)).flatMap { k =>
        val p = w.take(k)
        if (vmap.contains(p) || k == 1) segs(w.drop(k)).map(p +: _) else Seq.empty
      }
    def score(s: Seq[String]): Long = s.map(p => vmap.getOrElse(p, 0L)).sum
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(60)((0 until (1 + rnd.nextInt(7)))
      .map(_ => "abc" (rnd.nextInt(3))).mkString)
    for (w <- words) {
      val all = segs(w)
      val minCount = all.map(_.length).min
      val best = all.filter(_.length == minCount)
      val maxScore = best.map(score).max
      val optimal = best.filter(score(_) == maxScore)
      val got = enc(w, vocab)
      assert(got.mkString("") === w, s"lossless on $w")
      assert(got.length === minCount, s"min count on $w: $got vs $optimal")
      assert(score(got) === maxScore, s"max score on $w: $got vs $optimal")
      // leftmost-longest: no optimal segmentation is lexicographically
      // "longer-earlier" than the chosen one
      val chosenLens = got.map(_.length)
      for (o <- optimal) {
        val oLens = o.map(_.length)
        val cmp = chosenLens.zip(oLens).find { case (x, y) => x != y }
        assert(cmp.forall { case (x, y) => x > y },
          s"leftmost-longest violated on $w: chose $got, also optimal $o")
      }
    }
  }

  test("EM refinement: usage-scored vocab stays total/lossless, unused pieces drop") {
    val docs = graft.engine.Tables.table(spark, sfDir, "documents")
    val v0 = Unigram.vocab(docs, "text").as[(String, Long)].collect().toSeq
    val v1 = Unigram.refine(docs, "doc_id", "text", v0)
    // every single char survives (totality), no new pieces appear
    assert(v1.count(_._1.length == 1) === v0.count(_._1.length == 1))
    assert(v1.map(_._1).toSet.subsetOf(v0.map(_._1).toSet))
    // multi-char survivors all have positive usage
    assert(v1.filter(_._1.length >= 2).forall(_._2 > 0))
    val e = Unigram.encode(docs, "doc_id", "text", v1)
    val mass = e.select(expr(
      "AGGREGATE(pieces, 0L, (acc, p) -> acc + LENGTH(p))").as("m"))
      .agg(sum("m")).head.getLong(0)
    val charMass = docs.select(sum(expr("LENGTH(REPLACE(text, ' ', ''))"))).head.getLong(0)
    assert(mass === charMass, "refined encode must stay lossless")
  }

  test("corpus encode is total and lossless on derived vocab") {
    val docs = graft.engine.Tables.table(spark, sfDir, "documents")
    val v = Unigram.vocab(docs, "text").as[(String, Long)].collect().toSeq
    // every single char of the corpus is in the vocab
    assert(v.count(_._1.length == 1) > 0)
    val e = Unigram.encode(docs, "doc_id", "text", v)
    assert(e.filter(col("n_pieces") === 0 || col("pieces").isNull).count() === 0L)
    val mass = e.select(expr(
      "AGGREGATE(pieces, 0L, (acc, p) -> acc + LENGTH(p))").as("m"))
      .agg(sum("m")).head.getLong(0)
    val charMass = docs.select(sum(expr("LENGTH(REPLACE(text, ' ', ''))"))).head.getLong(0)
    assert(mass === charMass, "encode must consume every character exactly once")
    // DP never yields more pieces than chars, and at least chars/maxLen
    val tot = e.agg(sum("n_pieces")).head.getLong(0)
    assert(tot <= charMass && tot >= charMass / 3)
  }
}
