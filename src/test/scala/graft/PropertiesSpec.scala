package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{HashSpec, Skew}

/** Property-style cross-validation: the SQL expression fragments in
  * HashSpec must compute the same function as independent plain-Scala
  * models — this is what keeps the Spark queries and the DuckDB oracles
  * (which mirror the same spec) from drifting apart. Seeded randomness so
  * failures reproduce. */
class PropertiesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randWord(): String =
    (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def randText(maxWords: Int): String =
    (1 to (1 + rnd.nextInt(maxWords))).map(_ => randWord()).mkString(" ")

  private def poly31Model(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)

  test("SQL poly31 fragment matches the Scala model on random strings") {
    val samples = Seq.fill(50)(randText(8))
    val got = samples.toDF("s")
      .select(expr(HashSpec.poly31("s")).as("h")).as[Long].collect()
    val want = samples.map(poly31Model)
    assert(got.toSeq == want)
  }

  test("fold-based minhashSig matches the naive per-permutation model") {
    val texts = Seq.fill(25)(randText(20))
    val hvArr = "TRANSFORM(SPLIT(s, ' '), t -> " + HashSpec.poly31("t") + ")"
    val got = texts.toDF("s")
      .select(expr(HashSpec.minhashSig(hvArr, 16)).as("sig"))
      .as[Seq[Long]].collect()
    val want = texts.map { s =>
      val hs = s.split(' ').toSeq.map(poly31Model)
      (0 until 16).map(i => hs.map(h => ((2 * i + 1) * h + 7919L * i + 1) % 1000000007L).min)
    }
    assert(got.map(_.toSeq).toSeq == want)
  }

  test("simhash32 expression matches a direct Scala model") {
    def model(tokens: Seq[String]): Long = {
      val votes = Array.fill(32)(0)
      tokens.foreach { t =>
        val g = (poly31Model(t) * 2654435761L) % 4294967296L
        (0 until 32).foreach(j => votes(j) += (if (((g >> j) & 1) == 1) 1 else -1))
      }
      (0 until 32).foldLeft(0L)((acc, j) => if (votes(j) > 0) acc | (1L << j) else acc)
    }
    graft.functions.TajoFunctions.register(spark)
    val texts = Seq.fill(30)(randText(12))
    val got = texts.toDF("s")
      .select(expr("simhash32(SPLIT(s, ' '))")).as[Long].collect()
    val want = texts.map(s => model(s.split(' ').toSeq))
    assert(got.toSeq == want)
  }

  test("sequential-fold dot product matches Scala fold exactly (bit level)") {
    val vecs = Seq.fill(20)((Array.fill(16)(rnd.nextFloat() * 2 - 1), Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val got = vecs.toDF("a", "b")
      .select(expr(HashSpec.dot("a", "b")).as("d")).as[Double].collect()
    val want = vecs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0)((s, xy) => s + xy._1.toDouble * xy._2.toDouble)
    }
    assert(got.toSeq == want)
  }

  test("native norm_text equals the TRIM(REGEXP_REPLACE(...)) spec bit-for-bit") {
    graft.functions.TajoFunctions.register(spark)
    // mixed-case, punctuation, digit, unicode, space-run, and edge inputs
    val texts = Seq.fill(40) {
      (1 to (1 + rnd.nextInt(12))).map { _ =>
        val w = randWord()
        rnd.nextInt(6) match {
          case 0 => w.toUpperCase
          case 1 => w + ",!"
          case 2 => s"$w${rnd.nextInt(100)}"
          case 3 => s"Füß-$w"
          case 4 => s"  $w  "
          case _ => w
        }
      }.mkString(" ")
    } ++ Seq("", "   ", "!!!", "A", " Mixed CASE  42 ", "ümlaut ß end.")
    val df = texts.toDF("s")
    val got = df.select(expr("norm_text(s)")).as[String].collect()
    val want = df.select(
      expr("TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(s), '[^a-z0-9 ]', ' '), ' +', ' '))"))
      .as[String].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("native minhash_sig equals the SQL shingle+poly31+fold pipeline") {
    graft.functions.TajoFunctions.register(spark)
    // include multi-space texts (empty tokens) and short docs (< n tokens)
    val texts = Seq.fill(40)(randText(25)) ++
      Seq("a b", "", "x", "a  b   c d e", "one two three four")
    val sqlSig = {
      val sh = HashSpec.shingles("SPLIT(s, ' ')", 3)
      val hv = s"TRANSFORM($sh, s0 -> ${HashSpec.poly31("s0")})"
      HashSpec.minhashSig(hv, 16)
    }
    val df = texts.toDF("s")
      .select(expr(sqlSig).as("spec"), expr(HashSpec.minhashNative("s", 16, 3)).as("native"))
    assert(df.filter("spec <> native").count() == 0)
  }

  test("native ngram_hash_set equals sorted-distinct poly31 over SQL shingles") {
    graft.functions.TajoFunctions.register(spark)
    val texts = Seq.fill(40)(randText(25)) ++ Seq("a b", "", "a  b   c d", "x y z x y z")
    val sh = HashSpec.shingles("SPLIT(s, ' ')", 3)
    val df = texts.toDF("s").select(
      expr(s"ARRAY_SORT(ARRAY_DISTINCT(TRANSFORM($sh, s0 -> ${HashSpec.poly31("s0")})))").as("spec"),
      expr("ngram_hash_set(s, 3)").as("native"))
    assert(df.filter("spec <> native").count() == 0)
  }

  test("native gram_hashes equals in-order poly31 over SQL grams, with repeats") {
    graft.functions.TajoFunctions.register(spark)
    val texts = Seq.fill(40)(randText(25)) ++ Seq("a b", "", "a  b   c d", "x y z x y z")
    for (n <- Seq(1, 2, 3)) {
      val sh = HashSpec.shingles("SPLIT(s, ' ')", n)
      val df = texts.toDF("s").select(
        expr(s"CASE WHEN SIZE(SPLIT(s, ' ')) >= $n THEN TRANSFORM($sh, s0 -> ${HashSpec.poly31("s0")}) ELSE ARRAY() END").as("spec"),
        expr(s"gram_hashes(s, $n)").as("native"))
      assert(df.filter("spec <> native").count() == 0, s"n=$n")
    }
    // short text: empty array, not the ngram_hash_set sentinel
    assert(spark.sql("SELECT SIZE(gram_hashes('one', 2))").as[Int].head() == 0)
    // the one-call upto variant is exactly the concatenation of sizes 1..n
    val up = texts.toDF("s").select(
      expr("CONCAT(gram_hashes(s, 1), gram_hashes(s, 2))").as("spec"),
      expr("gram_hashes_upto(s, 2)").as("native"))
    assert(up.filter("spec <> native").count() == 0)
  }

  test("native vec_dot equals the SQL sequential fold bit-exactly") {
    graft.functions.TajoFunctions.register(spark)
    val vecs = Seq.fill(30)((Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
      .select(expr(HashSpec.dot("a", "b")).as("spec"), expr(HashSpec.dotNative("a", "b")).as("native"))
    assert(df.filter("spec <> native").count() == 0)
    assert(spark.sql("SELECT vec_dot(ARRAY(1.0D), ARRAY(1.0D, 2.0D))").collect()(0).isNullAt(0))
    assert(spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), ARRAY(1.0D))").collect()(0).isNullAt(0))
  }

  test("native lsh_bucket equals the SQL hyperplane CASE/fold form") {
    graft.functions.TajoFunctions.register(spark)
    val vecs = Seq.fill(50)(Array.fill(64)(rnd.nextFloat() * 2 - 1)) :+
      Array.fill(64)(0.0f) // all-zero: every dot == 0, no bits set
    val df = vecs.toDF("v")
      .select(expr(HashSpec.lshBucket("v", 4, 64)).as("spec"),
        expr(HashSpec.lshBucketNative("v", 4, 64)).as("native"))
    assert(df.filter("spec <> native").count() == 0)
  }

  test("native window_hashes: rolling hash equals naive per-window refold at any stride") {
    graft.functions.TajoFunctions.register(spark)
    // independent model: refold each window from scratch in the same
    // mod-2^64 polynomial ring (base = FNV prime) — the rolling
    // subtraction in the native pass must reproduce it exactly
    val B = 0x100000001b3L
    def refold(s: String): Long = s.foldLeft(0L)((h, c) => h * B + c.toInt)
    def naive(s: String, len: Int, stride: Int): Seq[Long] =
      if (s.length < len) Seq.empty
      else (0 to s.length - len by stride).map(i => refold(s.substring(i, i + len)))
    val samples = Seq.fill(60)(randText(60)) :+ "" :+ "tiny" :+ ("x" * 64)
    for ((len, stride) <- Seq((10, 1), (10, 3), (40, 1), (7, 7))) {
      val got = samples.toDF("s")
        .select(expr(s"window_hashes(s, $len, $stride)").as("h"))
        .as[Seq[Long]].collect()
      samples.zip(got).foreach { case (s, hs) =>
        assert(hs == naive(s, len, stride), s"len=$len stride=$stride input: $s")
      }
    }
    // the dedup contract: equal windows hash equal, and on non-adversarial
    // text distinct windows hash distinct (spans from hash equality ==
    // spans from string equality)
    val doc = randText(300)
    val hs = Seq(doc).toDF("s")
      .select(expr("window_hashes(s, 20, 1)").as("h")).as[Seq[Long]].collect().head
    val wins = (0 to doc.length - 20).map(i => doc.substring(i, i + 20))
    assert(hs.zipWithIndex.forall { case (h, i) =>
      wins.zipWithIndex.forall { case (w, j) => (h == hs(j)) == (w == wins(i)) }
    })
  }

  test("native cdc_chunks: rolling hash equals naive per-window refold; chunks rejoin") {
    graft.functions.TajoFunctions.register(spark)
    def naiveChunks(s: String, w: Int, div: Int): Seq[String] = {
      val cuts = (w until s.length).filter { i => // 1-based end position i, i < len
        poly31Model(s.substring(i - w, i)) % div == 0
      }
      val bounds = 0 +: cuts :+ s.length
      bounds.sliding(2).map { case Seq(a, b) => s.substring(a, b) }.toSeq
    }
    val samples = Seq.fill(60)(randText(60)) :+ "" :+ "tiny" :+ ("x" * 7)
    val got = samples.toDF("s")
      .select(expr("cdc_chunks(s, 8, 16)").as("c")).as[Seq[String]].collect()
    samples.zip(got).foreach { case (s, chunks) =>
      if (s.isEmpty) assert(chunks.isEmpty)
      else {
        assert(chunks == naiveChunks(s, 8, 16), s"input: $s")
        assert(chunks.mkString == s)       // chunks partition the document
        assert(chunks.forall(_.nonEmpty))  // never an empty chunk
      }
    }
    // edit stability: an edit near the start shifts only the chunks that
    // overlap it — the suffix chunk lists converge again
    val base = randText(200)
    val edited = "Z" + base
    val a = naiveChunks(base, 8, 16)
    val b = naiveChunks(edited, 8, 16)
    assert(a.takeRight(3) == b.takeRight(3), "suffix chunks must be edit-stable")
  }

  test("salted join equals plain join; salted count equals plain count") {
    val fact = (1 to 2000).map(i => (i % 7, s"payload_$i")).toDF("k", "payload")
    val dim = (0 until 7).map(i => (i, s"dim_$i")).toDF("k", "dim_val")
    val plain = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum(length(col("payload") ) )).collect()(0).getLong(0)
      == plain.agg(sum(length(col("payload")))).collect()(0).getLong(0))
    val cnt = Skew.saltedCount(fact, "k", 8).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cnt == (1 to 2000).groupBy(_ % 7).view.mapValues(_.size.toLong).toMap)
  }

  test("canonicalUrl is idempotent on random messy URLs") {
    import graft.operators.LinkGraph
    def randUrl(): String = {
      val scheme = if (rnd.nextBoolean()) "https" else "HTTP"
      val www = if (rnd.nextBoolean()) "www." else ""
      val host = s"$www${randWord()}.${randWord()}.com"
      val port = rnd.nextInt(4) match {
        case 0 => ":80"; case 1 => ":443"; case 2 => s":${8000 + rnd.nextInt(999)}"
        case _ => "" }
      val path = (0 to rnd.nextInt(3)).map(_ => randWord()).mkString("/", "/", "")
      val slash = if (rnd.nextBoolean()) "/" else ""
      val query = rnd.nextInt(4) match {
        case 0 => s"?utm_source=${randWord()}&id=${rnd.nextInt(99)}"
        case 1 => s"?ref=${randWord()}"
        case 2 => s"?a=${rnd.nextInt(9)}&fbclid=${randWord()}&b=2"
        case _ => "" }
      val frag = if (rnd.nextBoolean()) s"#${randWord()}" else ""
      s"$scheme://$host$port$path$slash$query$frag"
    }
    val urls = Seq.fill(60)(randUrl())
    val once = urls.toDF("url").select(LinkGraph.canonicalUrl("url").as("c"))
      .as[String].collect().toSeq
    val twice = once.toDF("url").select(LinkGraph.canonicalUrl("url").as("c"))
      .as[String].collect().toSeq
    assert(twice == once)
    // canonical form carries no fragment/tracking, and no DEFAULT port —
    // :80 on https (and :443 on http) is a real nonstandard port and stays
    once.foreach { u =>
      assert(!u.contains("#"), u)
      if (u.startsWith("http://")) assert(!u.matches("http://[^/?]*:80(/|\\?|$).*") &&
        !u.endsWith(":80"), u)
      if (u.startsWith("https://")) assert(!u.matches("https://[^/?]*:443(/|\\?|$).*") &&
        !u.endsWith(":443"), u)
      assert(!u.contains("utm_") && !u.contains("fbclid"), u)
    }
  }

  test("count-min never underestimates and is exact at ample width, random inputs") {
    import graft.operators.Sketches
    val vals = Seq.fill(3000)(rnd.nextInt(200).toLong)
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hashes = vals.map(v => v * 2654435761L % 1000000007L)
    val queries = exact.keys.toSeq.map(k =>
      (k * 2654435761L % 1000000007L, k)).toDF("h", "k")
    for (w <- Seq(32, 1 << 16)) {
      val est = Sketches.countMinEstimate(
        Sketches.countMinCounters(hashes.toDF("h"), "h", width = w),
        queries, "h", width = w)
        .as[(Long, Long)].collect().toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"w=$w k=$k underestimated: ${est(k)} < $n")
      }
      if (w == (1 << 16)) exact.foreach { case (k, n) =>
        assert(est(k) === n, s"ample width should be exact for k=$k")
      }
    }
  }

  test("scaled morton is a bijection on the rank grid and order-embeds both dims") {
    import graft.operators.Layout
    val pts = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val got = pts.toDF("a", "b")
      .select(expr(Layout.mortonSql("a", "b", bits = 5)).as("z"))
      .as[Long].collect()
    assert(got.distinct.length === 1024)           // bijective on 5-bit pairs
    assert(got.min === 0L && got.max === 1023L)    // onto [0, 2^10)
  }

  test("perceptron: Spark training equals the Scala model on random separable data") {
    import graft.operators.Distill
    for (seed <- Seq(1, 2, 3)) {
      val r2 = new scala.util.Random(seed)
      val rows = (1 to 60).map { _ =>
        val x1 = r2.nextInt(50).toLong; val x2 = r2.nextInt(50).toLong
        (if (3 * x1 - 2 * x2 + 5 > 0) 1L else -1L, 1L, x1, x2)
      }
      val feat = rows.toDF("y", "f0", "f1", "f2")
      val w = Distill.perceptron(feat, "y", Seq("f0", "f1", "f2"), iterations = 6)
        .as[(Long, Long, Long)].head
      val model = {
        val ws = Array(0L, 0L, 0L)
        for (_ <- 1 to 6) {
          val d = Array(0L, 0L, 0L)
          rows.foreach { case (y, f0, f1, f2) =>
            if (y * (ws(0) * f0 + ws(1) * f1 + ws(2) * f2) <= 0) {
              d(0) += y * f0; d(1) += y * f1; d(2) += y * f2
            }
          }
          for (i <- 0 until 3) ws(i) += d(i)
        }
        (ws(0), ws(1), ws(2))
      }
      assert(w === model, s"seed=$seed")
    }
  }

  test("intervalOverlap equals the naive overlap join on random interval sets") {
    import graft.operators.RangeJoin
    import java.sql.Timestamp
    val r = new scala.util.Random(7)
    def ts(dayOffset: Int): Timestamp =
      Timestamp.valueOf(java.time.LocalDateTime.of(2021, 1, 1, 0, 0).plusHours(dayOffset.toLong))
    for (trial <- 0 until 3) {
      val keys = Seq("a", "b", "c")
      def mk(n: Int, idBase: Long) = (0 until n).map { i =>
        val s = r.nextInt(24 * 60)
        (idBase + i, keys(r.nextInt(keys.size)), ts(s), ts(s + r.nextInt(72)))
      }
      val ls = mk(40, 0L)
      val rs = mk(40, 1000L)
      val lhs = ls.toDF("lid", "lk", "ls", "le")
      val rhs = rs.toDF("rid", "rk", "rs", "re")
      val got = RangeJoin.intervalOverlap(lhs, rhs, "lk", "rk", "ls", "le", "rs", "re",
          bucket = "1 day")
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got.size === got.toSet.size, s"trial $trial: duplicate pair")
      val want = (for {
        (lid, lk, s1, e1) <- ls
        (rid, rk, s2, e2) <- rs
        if rk == lk && !s1.after(e2) && !s2.after(e1)
      } yield (lid, rid)).toSet
      assert(got.toSet === want, s"trial $trial")
    }
  }

  test("weightedSample equals the local priority model on random weights") {
    import graft.operators.Sampling
    val r = new scala.util.Random(11)
    def pri(id: Long, w: Long): Long =
      (math.min(w, 2147483647L) * 4294967296L) /
        (Math.floorMod((id % 1000000007L) * 2654435761L, 4294967296L) + 1L)
    for (trial <- 0 until 3) {
      val rows = (0 until 300).map(_ => (r.nextLong(1L << 50), 1L + r.nextInt(10000)))
        .distinctBy(_._1)
      val got = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", 40)
        .select("id").collect().map(_.getLong(0)).toSeq
      val want = rows.map { case (id, w) => (id, pri(id, w)) }
        .sortBy { case (id, p) => (-p, id) }.take(40).map(_._1)
      assert(got === want, s"trial $trial")
    }
  }

  test("kmeans lloyd equals a plain-Scala Lloyd model on random vectors") {
    import graft.operators.KMeans
    val r = new scala.util.Random(13)
    for (trial <- 0 until 2) {
      val dims = 4
      val vecs = (0 until 60).map(i =>
        (i.toLong, Array.fill(dims)((r.nextDouble() * 1.6 - 0.8).toFloat)))
      val k = 3; val iters = 2
      val got = KMeans.lloyd(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
          k, iters).orderBy("vec_id").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
      // independent Scala model of the exact integer algorithm
      val enc = vecs.map { case (id, v) =>
        id -> v.map(x => math.floor((x.toDouble + 2) * 1e6).toLong).toSeq
      }
      var cents: Seq[(Long, Seq[Long])] =
        enc.sortBy(_._1).take(k).zipWithIndex.map { case ((_, e), i) => (i.toLong, e) }
      def assign(): Seq[(Long, Long, Long)] = enc.map { case (id, e) =>
        val best = cents.map { case (cid, c) =>
          (e.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min
        (id, best._2, best._1)
      }
      for (_ <- 0 until iters) {
        val a = assign()
        val byCluster = a.zip(enc).groupBy(_._1._2)
        cents = byCluster.toSeq.sortBy(_._1).map { case (cid, members) =>
          val es = members.map(_._2._2)
          (cid, (0 until dims).map(j => {
            val s = es.map(_(j)).sum
            s / es.size // sums are positive by the +2 shift
          }))
        }
      }
      assert(got === assign().sortBy(_._1), s"trial $trial")
    }
  }
}
