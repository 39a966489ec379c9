package graft

import graft.operators.{LinkGraph, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkGraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url").select(LinkGraph.canonicalUrl("url").as("c")).head.getString(0)

  test("canonicalUrl normalizes case, www, default port, tracking params, fragment, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=3&utm_campaign=y#frag")
      === "https://example.com/a/b?id=3")
    assert(canon("http://example.com:80/") === "http://example.com")
    assert(canon("http://example.com:8080/x") === "http://example.com:8080/x")
    assert(canon("https://example.com/a?utm_a=1") === "https://example.com/a")
    assert(canon("https://example.com/a?ref=hp&x=1") === "https://example.com/a?x=1")
    assert(canon("https://example.com/a?ref=a&ref=b") === "https://example.com/a")
    // 'xref' is NOT a tracking param (the (^|&) guard), sub.www is not a www prefix
    assert(canon("https://example.com/a?xref=1") === "https://example.com/a?xref=1")
    assert(canon("https://sub.www.example.com/") === "https://sub.www.example.com")
    // https default-port stripping is scheme-gated: :443 on http survives
    assert(canon("http://example.com:443/x") === "http://example.com:443/x")
    assert(canon("not a url") === "not a url")
  }

  test("urlDedup collapses canonical variants to one keeper with a dup count") {
    val docs = Seq(
      (1L, "https://www.Example.com/p/1/"),
      (2L, "https://example.com/p/1?utm_source=a"),
      (3L, "HTTPS://example.com:443/p/1#top"),
      (4L, "https://example.com/p/2"),
      (5L, "http://example.com/p/1")).toDF("doc_id", "url")
    val got = LinkGraph.urlDedup(docs, "doc_id", "url")
      .orderBy("canonical_url")
      .as[(String, Long, Long)].collect.toSeq
    assert(got === Seq(
      ("http://example.com/p/1", 5L, 1L),
      ("https://example.com/p/1", 1L, 3L),
      ("https://example.com/p/2", 4L, 1L)))
  }

  test("domainEdges extracts weighted host pairs from page text") {
    val pages = Seq(
      ("https://a.com/x", "see https://b.com/1 and https://b.com/2 plus http://c.org/z words"),
      ("https://WWW.a.com/y", "only https://b.com/3 here"),
      ("https://b.com/z", "back to https://a.com/home")).toDF("url", "text")
    val got = LinkGraph.domainEdges(pages, "url", "text")
      .orderBy("src", "dst").as[(String, String, Long)].collect.toSeq
    assert(got === Seq(("a.com", "b.com", 3L), ("a.com", "c.org", 1L), ("b.com", "a.com", 1L)))
  }

  /** Independent model replay of the fixed-point recurrence. */
  private def modelPageRank(edges: Seq[(String, String, Long)], iters: Int,
                            damp: Long = 850000L, scale: Long = 1000000000000L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val wout = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = (1000000L - damp) * (scale / n) / 1000000L
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((s, d, w) <- edges) contrib(d) += rank(s) * w / wout(s)
      rank = nodes.map(v => v -> (base + damp * contrib(v) / 1000000L)).toMap
    }
    rank
  }

  test("pageRank matches the integer model bit-for-bit, dangling mass evaporates") {
    // c is dangling (no outlinks); b is the hub
    val edges = Seq(
      ("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L), ("b", "c", 1L), ("d", "b", 3L))
    val got = LinkGraph.pageRank(edges.toDF("src", "dst", "w"), iterations = 5)
      .as[(String, Long)].collect.toMap
    val want = modelPageRank(edges, 5)
    assert(got === want)
    // dangling c and sourceless d leak mass: total strictly below the scale
    assert(got.values.sum < 1000000000000L)
    assert(got("b") > got("a") && got("b") > got("d"))
  }

  test("pageRank iteration count changes results (fixed-iteration semantics)") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val df = edges.toDF("src", "dst", "w")
    val r3 = LinkGraph.pageRank(df, iterations = 3).as[(String, Long)].collect.toMap
    val r5 = LinkGraph.pageRank(df, iterations = 5).as[(String, Long)].collect.toMap
    assert(r3 === modelPageRank(edges, 3))
    assert(r5 === modelPageRank(edges, 5))
    assert(r3 !== r5)
  }

  test("robotsRules: group semantics — multi-UA groups, specificity override, empty Disallow dropped") {
    val robots = Seq(
      // host a: * group AND a graftbot-specific group -> only the specific
      // group's rules bind graftbot (spec 2 beats 1)
      ("a.com", "User-agent: *\nDisallow: /all\n\nUser-agent: graftbot\nUser-agent: otherbot\nDisallow: /g\nAllow: /g/ok"),
      // host b: only a * group; empty Disallow means no restriction
      ("b.com", "# hi\nUser-agent: *\nDisallow: /x\nDisallow:\nCrawl-delay: 5"),
      // host c: case-insensitive field names and agent match
      ("c.com", "USER-AGENT: GraftBot\ndisallow: /c")).toDF("host", "txt")
    val rules = LinkGraph.robotsRules(robots, "graftbot")
      .orderBy("host", "prefix").as[(String, Boolean, String)].collect.toSeq
    assert(rules === Seq(
      ("a.com", false, "/g"), ("a.com", true, "/g/ok"),
      ("b.com", false, "/x"),
      ("c.com", false, "/c")))
  }

  test("robotsGate: longest prefix wins, default allow without rules or robots") {
    val rules = Seq(
      ("a.com", false, "/private"), ("a.com", true, "/private/ok"),
      ("a.com", false, "/private/ok/no")).toDF("host", "allow", "prefix")
    val urls = Seq(
      (1L, "https://a.com/private/x"),
      (2L, "https://a.com/private/ok/y"),
      (3L, "https://a.com/private/ok/nope"),
      (4L, "https://a.com/public"),
      (5L, "https://a.com"),
      (6L, "https://other.com/private/x")).toDF("id", "url")
    val got = LinkGraph.robotsGate(urls, rules, "id", "url")
      .select("id", "allowed").as[(Long, Boolean)].collect.toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> true, 6L -> true))
    // path normalization: bare host is '/'
    val paths = LinkGraph.robotsGate(urls, rules, "id", "url")
      .select("id", "path").as[(Long, String)].collect.toMap
    assert(paths(5L) === "/")
    // query strings are not part of the matched path
    val q = Seq((9L, "https://a.com/private/x?skip=/public")).toDF("id", "url")
    assert(LinkGraph.robotsGate(q, rules, "id", "url")
      .select("allowed").head.getBoolean(0) === false)
  }

  /** Independent model replay of the batch-perceptron recurrence. */
  private def modelPerceptron(rows: Seq[(Long, Array[Long])], iters: Int): Array[Long] = {
    val k = rows.head._2.length
    val w = Array.fill(k)(0L)
    for (_ <- 1 to iters) {
      val d = Array.fill(k)(0L)
      for ((y, x) <- rows; if y * x.zip(w).map { case (a, b) => a * b }.sum <= 0)
        for (i <- 0 until k) d(i) += y * x(i)
      for (i <- 0 until k) w(i) += d(i)
    }
    w
  }

  test("perceptron matches the integer model and learns a separable rule") {
    import graft.operators.Distill
    // y = sign(x1 - x2) with a margin — linearly separable
    val rows = (1 to 40).map { i =>
      val x1 = (i * 7) % 19; val x2 = (i * 11) % 17
      val y = if (x1 - x2 > 0) 1L else -1L
      (y, Array(1L, x1.toLong, x2.toLong))
    }.filter { case (_, x) => x(1) != x(2) }
    val feat = rows.map { case (y, x) => (y, x(0), x(1), x(2)) }.toDF("y", "f0", "f1", "f2")
    val fs = Seq("f0", "f1", "f2")
    val w = Distill.perceptron(feat, "y", fs, iterations = 8)
    val got = w.select(col("w0"), col("w1"), col("w2")).as[(Long, Long, Long)].head
    val want = modelPerceptron(rows, 8)
    assert(got === ((want(0), want(1), want(2))))
    // after 8 rounds the learned boundary reproduces most of the rule
    val scored = Distill.score(feat, w, fs)
    val agree = scored.filter(col("pred") === (col("y") === 1)).count()
    assert(agree >= (rows.size * 8) / 10, s"$agree of ${rows.size}")
  }

  test("hll sketches: sparse regime is exact, merged or monolithic") {
    val n = 1600
    val vals = spark.range(n).select(concat(lit("v"), col("id")).as("v"),
      pmod(col("id"), lit(8)).as("shard"))
    val mono = vals.agg(Sketches.estimate(hll_sketch_agg(col("v"), lit(21))).as("e")).head.getLong(0)
    val merged = Sketches.mergeSketches(
        Sketches.distinctSketch(vals, Seq("shard"), col("v"), lgK = 21), Seq.empty)
      .select(Sketches.estimate(col("sketch"))).head.getLong(0)
    assert(mono === n.toLong)
    assert(merged === n.toLong)
  }

  test("hll sketches: dense regime stays within published error at n=100k") {
    val n = 100000L
    val est = spark.range(n).select(concat(lit("v"), col("id")).as("v"))
      .agg(Sketches.estimate(hll_sketch_agg(col("v"), lit(14))).as("e")).head.getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.02, s"estimate $est vs $n")
  }

  test("count-min sketch: never underestimates, exact at ample width, counters merge by addition") {
    import graft.operators.Sketches
    val occ = spark.range(3000)
      .select((col("id") % 37).as("k"))          // 37 keys, ~81 occurrences each
      .select((col("k") * 2654435761L % 1000000007L).as("h"), col("k"))
    val exact = occ.groupBy("k", "h").agg(count(lit(1)).as("exact_n"))
    // narrow width forces collisions -> overestimates, never under
    val narrow = Sketches.countMinEstimate(
      Sketches.countMinCounters(occ.select("h"), "h", width = 16),
      exact, "h", width = 16)
    assert(narrow.filter(col("cms_est") < col("exact_n")).count() === 0)
    // ample width: 37 keys across 65536 buckets x 3 planes -> exact on this data
    val wide = Sketches.countMinEstimate(
      Sketches.countMinCounters(occ.select("h"), "h", width = 65536),
      exact, "h", width = 65536)
    assert(wide.filter(col("cms_est") =!= col("exact_n")).count() === 0)
    // mergeability: counters of two halves sum bucket-wise to the whole
    val whole = Sketches.countMinCounters(occ.select("h"), "h", width = 64)
    val halves = Sketches.countMinCounters(occ.filter(col("h") % 2 === 0).select("h"), "h", width = 64)
      .unionAll(Sketches.countMinCounters(occ.filter(col("h") % 2 =!= 0).select("h"), "h", width = 64))
      .groupBy("j", "bucket").agg(sum(col("c")).as("c"))
    assert(whole.as[(Long, Long, Long)].collect.toSet ===
      halves.as[(Long, Long, Long)].collect.toSet)
  }

  test("invertedIndex: df/tf stats over all docs, postings capped and rank-ordered") {
    import org.apache.commons.codec.digest.DigestUtils
    val docs = Seq(
      (1L, "a b a"), (2L, "a a a b"), (3L, "b c"), (4L, "a")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.invertedIndex(docs, "doc_id", "text", k = 2)
      .orderBy("term").as[(String, Long, Long, String)].collect.toSeq
    // a: tf 2@1, 3@2, 1@4 -> df 3, total 6, top2 by (tf desc, id) = [2, 1]
    // b: tf 1@1, 1@2, 1@3 -> df 3, total 3, top2 = [1, 2]; c: [3]
    assert(got === Seq(
      ("a", 3L, 6L, DigestUtils.md5Hex("2,1")),
      ("b", 3L, 3L, DigestUtils.md5Hex("1,2")),
      ("c", 1L, 1L, DigestUtils.md5Hex("3"))))
  }

  test("bm25Lite matches the integer model; rarer terms and shorter docs score higher") {
    val docs = Seq(
      (1L, "x y common common"), (2L, "x common"), (3L, "common common common"),
      (4L, "y z z"), (5L, "z")).toDF("doc_id", "text")
    val q = Seq("x", "z").toDF("term")
    val got = graft.operators.TextAnalysis.bm25Lite(docs, "doc_id", "text", q, topK = 10)
      .as[(Long, Long)].collect.toMap
    // independent integer model
    val corpus = Map(1L -> Seq("x", "y", "common", "common"), 2L -> Seq("x", "common"),
      3L -> Seq("common", "common", "common"), 4L -> Seq("y", "z", "z"), 5L -> Seq("z"))
    val nDocs = corpus.size.toLong
    val totalTok = corpus.values.map(_.size.toLong).sum
    val avgdlMicro = 1000000L * totalTok / nDocs
    val dfm = Map("x" -> 2L, "z" -> 2L)
    val want = corpus.flatMap { case (d, ts) =>
      val dl = ts.size.toLong
      val s = Seq("x", "z").flatMap { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) None else {
          val dlPpm = 1000000L * dl * 1000000L / avgdlMicro
          val dlnorm = 250000L + 750000L * dlPpm / 1000000L
          val tfc = tf * 2200000L * 1000000L / (tf * 1000000L + 1200000L * dlnorm / 1000000L)
          val idf = 1000000L * (nDocs - dfm(t) + 1) / (dfm(t) + 1)
          Some(idf * tfc / 1000000L)
        }
      }
      if (s.isEmpty) None else Some(d -> s.sum)
    }
    assert(got === want)
    // doc 5 ("z" alone, shortest) must outrank doc 4 ("z z" in a longer doc
    // scores higher tf but the rare-term ordering holds for equal tf docs 1 vs 2
    assert(got(2L) > got(1L)) // same tf of x, shorter doc wins
  }

  test("reciprocalRankFusion: integer contributions, n_lists, cross-list ordering") {
    // lexical arm ranks 10 > 20 > 30; vector arm ranks 30 > 10 (no 20)
    val lex = Seq((10L, 900L), (20L, 500L), (30L, 100L)).toDF("doc_id", "score")
    val vec = Seq((30L, 0.9), (10L, 0.2)).toDF("doc_id", "cos")
    val got = graft.operators.TextAnalysis.reciprocalRankFusion(
      Seq(lex -> "score", vec -> "cos"), "doc_id", kRrf = 60, topK = 10)
      .as[(Long, Long, Long)].collect.toSeq
    // contribs: 1e6 DIV 61 = 16393, DIV 62 = 16129, DIV 63 = 15873
    assert(got === Seq(
      (10L, 16393L + 16129L, 2L),  // rank 1 lex + rank 2 vec
      (30L, 15873L + 16393L, 2L),  // rank 3 lex + rank 1 vec
      (20L, 16129L, 1L)))          // rank 2 lex only
    // a doc found by both lists beats a doc ranked first in one:
    assert(got.head._1 == 10L && got.head._2 > 16393L)
    // score-scale invariance: multiplying one arm's scores by 1000 cannot
    // move anything (only ranks enter the fusion)
    val scaled = graft.operators.TextAnalysis.reciprocalRankFusion(
      Seq(lex.withColumn("score", col("score") * 1000) -> "score", vec -> "cos"),
      "doc_id", kRrf = 60, topK = 10).as[(Long, Long, Long)].collect.toSeq
    assert(scaled === got)
    // ties break by ascending id, so equal scores still rank deterministically
    val tied = Seq((7L, 5L), (3L, 5L)).toDF("doc_id", "score")
    val t = graft.operators.TextAnalysis.reciprocalRankFusion(
      Seq(tied -> "score"), "doc_id", kRrf = 60, topK = 10)
      .as[(Long, Long, Long)].collect.toSeq
    assert(t === Seq((3L, 16393L, 1L), (7L, 16129L, 1L)))
  }

  test("snapshotDiff classifies added/removed/modified/unchanged by digest") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.snapshotDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect.toMap
    assert(got === Map(1L -> "unchanged", 2L -> "modified", 3L -> "removed", 4L -> "added"))
  }

  test("diagnoseKey reports the hot key, skew ratio, and a salt factor") {
    val df = (Seq.fill(60)(("hot", 1)) ++ Seq(("a", 1), ("b", 1), ("c", 1), ("d", 1)))
      .toDF("k", "v")
    val r = graft.operators.Skew.diagnoseKey(df, "k")
      .as[(Long, Long, Long, String, Long, Long)].head
    // 5 keys, 64 rows, mean 12 (integer), max 60 -> skew 5_000_000 ppm, salts 5
    assert(r === ((5L, 64L, 60L, "hot", 5000000L, 5L)))
  }

  test("review regressions: unseen CMS keys, null-text diff, empty diagnose/pagerank inputs") {
    import graft.operators.{Dedup, LinkGraph, Sketches, Skew}
    // CMS: a key whose buckets were never hit estimates 0 (left join +
    // implicit zero counter), and full-64-bit / negative hashes are valid
    val counters = Sketches.countMinCounters(
      Seq(5L, 5L, 9L).toDF("h"), "h", width = 65536)
    val unseen = Sketches.countMinEstimate(counters,
      Seq((-1234567890123456789L, "miss")).toDF("h", "k"), "h", width = 65536)
    assert(unseen.select("cms_est").head.getLong(0) === 0L)
    // snapshotDiff: null text is presence-with-null-content, not absence
    val o = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("doc_id", "text")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("doc_id", "text")
    val d = Dedup.snapshotDiff(o, n, "doc_id", "text").as[(Long, String)].collect.toMap
    assert(d === Map(1L -> "unchanged", 2L -> "modified"))
    // diagnoseKey: empty input reports nulls, no ANSI divide-by-zero
    val empty = Skew.diagnoseKey(Seq.empty[(String, Int)].toDF("k", "v"), "k")
    val row = empty.head
    assert(row.getLong(0) === 0L && row.isNullAt(4) && row.isNullAt(5))
    // pageRank: empty edge set yields an empty rank table, not / by zero
    assert(LinkGraph.pageRank(Seq.empty[(String, String, Long)].toDF("src", "dst", "w"))
      .count() === 0L)
  }

  test("entityResolution: best match per left, boundary recall, prefix-typo trade") {
    import graft.operators.EntityResolution
    val l = Seq((1L, "martinez"), (2L, "anderson"), (3L, "chen")).toDF("id", "name")
    val r = Seq(
      (10L, "martinez_"),   // dist 1, length 9 vs 8 — crosses the /4 bucket edge
      (11L, "martinez__"),  // dist 2 — outranked by 10
      (20L, "andersen"),    // dist 1
      (30L, "xhen"),        // dist 1 BUT prefix block differs -> unmatched (trade)
      (40L, "zzzzz")).toDF("id", "name")
    val m = EntityResolution.resolve(l, r, "id", "id", "name", "name")
      .as[(Long, Long, Long)].collect.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m === Map(1L -> ((10L, 1L)), 2L -> ((20L, 1L))))
    assert(!m.contains(3L)) // documented prefix-blocking miss
  }

  test("dataQuality checks: dup keys, orphans, range violations incl. nulls") {
    import graft.operators.DataQuality
    val t = Seq((1L, Some(10L)), (1L, Some(20L)), (2L, Some(999L)), (3L, Option.empty[Long]))
      .toDF("k", "v")
    val u = DataQuality.checkUnique(t, Seq("k")).head
    assert(u.getLong(1) === 1L && u.getLong(2) === 2L && u.getString(3) === "1"
      && !u.getBoolean(4))
    val parent = Seq(1L, 2L).toDF("pk")
    val ri = DataQuality.checkRefIntegrity(t, "k", parent, "pk").head
    assert(ri.getLong(1) === 1L && ri.getString(2) === "3" && !ri.getBoolean(3))
    val rng = DataQuality.checkRange(t, "v", 0L, 100L).head
    // 999 out of range + NULL counts as a violation
    assert(rng.getLong(1) === 2L && !rng.getBoolean(3))
    val prof = DataQuality.profile(t, Seq("k", "v")).orderBy("col_name")
      .collect.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(prof.toSeq === Seq(("k", 4L, 0L, 3L), ("v", 4L, 1L, 3L)))
    // NULL semantics: a duplicated NULL key samples as '<null>', a NULL
    // child FK is satisfied (SQL FK semantics), NULL parent keys never match
    val tn = Seq(Option.empty[Long], Option.empty[Long], Some(7L)).toDF("k")
    val un = DataQuality.checkUnique(tn, Seq("k")).head
    assert(un.getLong(1) === 1L && un.getString(3) === "<null>")
    val rin = DataQuality.checkRefIntegrity(tn, "k",
      Seq(Option.empty[Long]).toDF("pk"), "pk").head
    assert(rin.getLong(1) === 1L && rin.getString(2) === "7" && !rin.getBoolean(3))
    intercept[IllegalArgumentException](DataQuality.profile(tn, Seq.empty))
  }

  test("wordPiece: greedy longest-match-first with ##continuations, full coverage") {
    import graft.operators.WordPiece
    val vocab = Seq(
      ("a", true), ("b", true), ("c", true), ("ab", true), ("abc", true),
      ("a", false), ("b", false), ("c", false), ("bc", false))
    val docs = Seq((1L, "abcab cba b")).toDF("doc_id", "text")
    val got = WordPiece.encode(docs, "doc_id", "text", vocab)
      .select("pieces").as[Seq[String]].head
    // abcab -> abc + ##ab? 'ab' is initial-only; continuation set has a,b,c,bc
    //   abc (longest initial), then ##a, ##b; cba -> c, ##b, ##a; b -> b
    assert(got === Seq("abc", "##a", "##b", "c", "##b", "##a", "b"))
    // derived vocab covers every char both ways -> n_pieces is always > 0
    val d2 = graft.engine.Tables.table(spark, sfDir, "documents")
    val v = WordPiece.vocab(d2, "text").as[(String, Boolean)].collect().toSeq
    val enc = WordPiece.encode(d2, "doc_id", "text", v)
    assert(enc.filter(col("n_pieces") === 0 || col("pieces").isNull).count() === 0L)
    // lossless-encode structural check: piece char mass equals text char mass
    val mass = enc.select(expr(
      "AGGREGATE(pieces, 0L, (acc, p) -> acc + LENGTH(regexp_replace(p, '^##', '')))").as("m"))
      .agg(sum("m")).head.getLong(0)
    val charMass = d2.select(sum(expr("LENGTH(REPLACE(text, ' ', ''))"))).head.getLong(0)
    assert(mass === charMass, "encode must consume every character exactly once")
  }

  test("distinctTokensBySource matches exact distinct counts on testdata") {
    val docs = graft.engine.Tables.table(spark, sfDir, "documents")
    val got = Sketches.distinctTokensBySource(docs, "doc_id", "text")
      .as[(String, Long)].collect.toMap
    val toks = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val exact = toks.groupBy("source").agg(countDistinct("tok").as("n"))
      .as[(String, Long)].collect.toMap +
      ("~all~" -> toks.select("tok").distinct.count())
    assert(got === exact)
  }
}
