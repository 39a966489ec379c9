package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization, URL-level dedup, and domain-graph centrality —
  * the crawl-side half of a pretraining pipeline (reference scope: Tajo's
  * text functions stop at substr/regexp, `tajo-core/src/main/java/org/
  * apache/tajo/engine/function/string/RegexpReplace.java:40`; the crawl
  * operators are pipeline extensions, same status as Dedup/TextAnalysis).
  *
  * Canonical-URL dedup is the FIRST dedup stage of every web-corpus
  * pipeline (cheaper than any text hash: two crawls of the same page have
  * different fetch bytes but the same canonical URL), and link-graph
  * centrality is the standard page-quality prior (harmonic centrality /
  * PageRank over the host graph).
  *
  * Everything here is expressed with engine-portable regex + integer
  * arithmetic so the DuckDB oracle replays results bit-for-bit: the SAME
  * canonicalization SQL is emitted for both dialects by [[canonicalUrlSql]]
  * (only `regexp_replace`'s global-flag spelling differs), and PageRank
  * runs in fixed-point BIGINT with per-edge `DIV`, so no float ever enters
  * a result.
  */
object LinkGraph {

  /** True = Spark SQL spelling, false = DuckDB. The only differences:
    * DuckDB's regexp_replace replaces the FIRST match unless passed the
    * 'g' flag (Spark is always global), and integer division spells `//`
    * instead of `DIV`. Regexes stay inside the Java∩RE2 common subset
    * (no lookaround, no backreferences — RE2 has neither), and avoid
    * backslashes entirely (`[.]` / `[?]` character classes instead):
    * Spark SQL string literals process backslash escapes, DuckDB's do
    * not, so any backslash would need per-dialect escaping. */
  private def rr(spark: Boolean)(s: String, pat: String, rep: String): String =
    if (spark) s"regexp_replace($s, '$pat', '$rep')"
    else s"regexp_replace($s, '$pat', '$rep', 'g')"

  /** SQL expression canonicalizing one URL column, identical semantics in
    * both dialects:
    *   1. drop the fragment (`#...`);
    *   2. lowercase scheme and host;
    *   3. strip the scheme's default port (`:80` http, `:443` https);
    *   4. strip a leading `www.`;
    *   5. drop tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`);
    *   6. strip trailing slashes from the path.
    * Query-param ORDER is preserved (sorting params can change semantics
    * for picky servers, and neither engine sorts a delimited list without
    * a higher-order function — documented non-goal). Non-URL input yields
    * scheme '' and is passed through unchanged by callers that filter on
    * `scheme <> ''`. */
  def canonicalUrlSql(urlCol: String, spark: Boolean): String = {
    val r = rr(spark) _
    val noFrag   = r(urlCol, "#.*", "")
    val scheme   = s"lower(regexp_extract($noFrag, '^([A-Za-z]+)://', 1))"
    val hostport = s"lower(regexp_extract($noFrag, '^[A-Za-z]+://([^/?#]+)', 1))"
    val host =
      s"""CASE WHEN $scheme = 'http'  THEN ${r(hostport, ":80$", "")}
         |     WHEN $scheme = 'https' THEN ${r(hostport, ":443$", "")}
         |     ELSE $hostport END""".stripMargin
    val hostNoWww = r(s"($host)", "^www[.]", "")
    val pathq  = r(noFrag, "^[A-Za-z]+://[^/?#]*", "")
    val path   = s"regexp_extract($pathq, '^([^?]*)', 1)"
    val query  = s"regexp_extract($pathq, '[?](.*)', 1)"
    // drop tracking params: each match consumes its leading '&' (or start),
    // then collapse a leftover leading '&' from a dropped first param
    val query2 = r(r(query, "(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&]*", ""),
      "^&+", "")
    val path2  = r(path, "/+$", "")
    s"""CASE WHEN $scheme = '' THEN $urlCol
       |     ELSE $scheme || '://' || $hostNoWww || $path2 ||
       |          CASE WHEN $query2 = '' THEN '' ELSE '?' || $query2 END
       |END""".stripMargin
  }

  /** Canonical form of `urlCol` as a Column (Spark side). */
  def canonicalUrl(urlCol: String): Column = expr(canonicalUrlSql(urlCol, spark = true))

  /** URL-level dedup: one row per canonical URL with the keeper (min id)
    * and the duplicate count. The cheapest dedup pass of a crawl pipeline —
    * runs before any text hashing, collapsing recrawls/trackers/mirror-case
    * variants of the same page.
    *
    * Scale: canonicalization is a per-row projection at scan speed; the
    * only shuffle is ONE partial+final hash aggregation on the canonical
    * URL (uniform keys — a canonical URL names one page). Nothing reaches
    * the driver. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol), canonicalUrl(urlCol).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))

  /** Host-graph edges from page outlinks: src = the page's own canonical
    * host, dst = host of every `http(s)://` URL mentioned in `textCol`,
    * weighted by mention count (self-loops kept — the damping term bounds
    * their influence, and dropping them would desync rank mass from the
    * oracle for no modeling gain).
    *
    * Scale: link extraction is a map-side explode (one row per mention,
    * NOT per doc pair); the weight aggregation is the only shuffle, on
    * (src, dst) — bounded by the number of distinct host pairs, which is
    * dimension-sized relative to the corpus. */
  def domainEdges(pages: DataFrame, urlCol: String, textCol: String): DataFrame = {
    val srcHost = s"lower(regexp_extract(${canonicalUrlSql(urlCol, spark = true)}, '^[A-Za-z]+://([^/?#:]+)', 1))"
    pages
      .select(expr(srcHost).as("src"),
        explode(expr(s"regexp_extract_all($textCol, 'https?://[^ ]+', 0)")).as("u"))
      .select(col("src"),
        expr("lower(regexp_extract(u, '^[A-Za-z]+://([^/?#:]+)', 1))").as("dst"))
      .filter(col("src") =!= "" && col("dst") =!= "")
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Fixed-iteration weighted PageRank over a host graph, in fixed-point
    * BIGINT so the result is bit-exact across engines:
    *
    *   rank_0(v)   = SCALE DIV n
    *   contrib(v)  = Σ_{(u,v,w)} rank_i(u) * w DIV wout(u)
    *   rank_{i+1}(v) = base + damping * contrib(v) DIV 1000000
    *   base        = (1000000 - damping) * (SCALE DIV n) DIV 1000000
    *
    * Dangling mass (nodes with no outlinks) evaporates rather than being
    * redistributed — the standard simplification; ranking ORDER is
    * unaffected for connected crawl graphs and the oracle replays the same
    * rule. Overflow bound: rank ≤ SCALE, so rank * w needs
    * SCALE * max(w) < 2^63 — at the default SCALE=1e12 that allows nine
    * million mentions of one host pair; pass a smaller `scale` for heavier
    * graphs.
    *
    * Scale: the graph is HOST-sized (millions of rows for a full crawl,
    * not billions) — each iteration is one join on src (rank table is
    * node-sized, AQE broadcasts it under big-edge/small-node shapes) and
    * one partial+final sum on dst. The rank table is localCheckpoint'd per
    * round so the loop's lineage stays flat (same discipline as
    * Dedup.duplicateClusters); the ONLY driver value is the node count n.
    * Iterations are a fixed constant — no convergence test, no
    * driver-side data. */
  def pageRank(edges: DataFrame, iterations: Int = 5, dampingPpm: Long = 850000L,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingPpm >= 0 && dampingPpm <= 1000000)
    val nodes = edges.select(col("src").as("d"))
      .union(edges.select(col("dst").as("d"))).distinct().localCheckpoint()
    val n = nodes.count()
    if (n == 0) // empty graph: empty rank table, not a driver-side / by zero
      return nodes.select(col("d").as("domain"), lit(0L).as("rank_fp"))
    val base = (1000000L - dampingPpm) * (scale / n) / 1000000L
    val edgesW = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("wout")), "src")
      .localCheckpoint()
    var rank = nodes.select(col("d"), lit(scale / n).as("r"))
    var prevRoundCk: DataFrame = null // round N-1's checkpoint, freeable once round N lands
    for (_ <- 1 to iterations) {
      val contrib = edgesW.join(rank, edgesW("src") === rank("d"))
        .select(col("dst"), expr("r * w DIV wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      rank = nodes.join(contrib, nodes("d") === contrib("dst"), "left")
        .select(nodes("d"),
          (lit(base) + expr(s"($dampingPpm * coalesce(contrib, 0L)) DIV 1000000")).as("r"))
        .localCheckpoint()
      // the new round is materialized — the superseded round's node-sized
      // blocks are dead (round 0 is a projection of `nodes`, not freeable)
      if (prevRoundCk != null) Checkpoints.free(prevRoundCk)
      prevRoundCk = rank
    }
    // the returned plan references only the final round's checkpoint
    Checkpoints.free(nodes, edgesW)
    rank.select(col("d").as("domain"), col("r").as("rank_fp"))
  }

  /** Parse robots.txt bodies into per-host allow/disallow prefix rules for
    * one crawler agent, per RFC 9309's group semantics:
    *   - comments (`#...`) stripped, blank/other lines ignored;
    *   - consecutive `User-agent:` lines open ONE group that owns the
    *     `Allow:`/`Disallow:` lines after them;
    *   - a crawler obeys the most specific matching group set: groups
    *     naming it exactly (case-insensitive) if any exist, else the `*`
    *     groups; ALL groups at that specificity merge;
    *   - an empty `Disallow:` value means "no restriction" — such rules
    *     (and empty `Allow:`) drop out here, leaving default-allow.
    * Simplification vs the RFC (documented): rule values are treated as
    * literal path PREFIXES — the `*` wildcard / `$` anchor extensions are
    * not interpreted (the overwhelming majority of real rules are plain
    * prefixes).
    *
    * Everything is line-window arithmetic (lag + running sum over
    * (host, line#)) and string ops that replay verbatim in DuckDB.
    * Output: (host, allow: boolean, prefix).
    *
    * Scale: robots bodies are host-sized (one small text per host) — the
    * whole parse is dimension-sized next to a corpus, and the window
    * partitions by host, so no global ordering exists anywhere. */
  def robotsRules(robots: DataFrame, agent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("host").orderBy("ln")
    val typed = robots
      .select(col("host"), posexplode(split(col("txt"), "\n")).as(Seq("ln", "raw")))
      .select(col("host"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("host"), col("ln"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))).as("kind"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)", 1)).as("value"))
      .filter(col("kind").isin("user-agent", "allow", "disallow"))
    val grouped = typed
      .withColumn("prev_kind", lag(col("kind"), 1).over(w))
      .withColumn("grp_start",
        (col("kind") === "user-agent" &&
          (col("prev_kind").isNull || col("prev_kind") =!= "user-agent")).cast("int"))
      .withColumn("grp", sum(col("grp_start")).over(w))
    val groupSpec = grouped.filter(col("kind") === "user-agent")
      .groupBy("host", "grp")
      .agg(max(when(lower(col("value")) === agent.toLowerCase, 2)
        .when(col("value") === "*", 1).otherwise(0)).as("spec"))
    val bestSpec = groupSpec.groupBy("host").agg(max(col("spec")).as("best_spec"))
    grouped.filter(col("kind").isin("allow", "disallow") && col("value") =!= "")
      .join(groupSpec, Seq("host", "grp"))
      .join(bestSpec, Seq("host"))
      .filter(col("spec") === col("best_spec") && col("spec") > 0)
      .select(col("host"), (col("kind") === "allow").as("allow"),
        col("value").as("prefix"))
  }

  /** Apply [[robotsRules]] to a URL table: per URL, the LONGEST matching
    * prefix rule decides (allow wins a length tie — the RFC's ordering);
    * no matching rule, or no robots for the host, means allowed. Matching
    * is on the URL's path ('' normalizes to '/'), host without port.
    *
    * Scale: rules are dimension-sized (a few rules per crawled host) and
    * broadcast; the winning rule is selected by ONE partial+final
    * aggregation with an ordering-encoded max struct (match flag, prefix
    * length, allow-wins, prefix), so each URL's candidates combine
    * map-side and only one row per URL crosses the single shuffle — the
    * corpus never joins itself. Output: (id, host, path, allowed). */
  def robotsGate(urls: DataFrame, rules: DataFrame, idCol: String,
                 urlCol: String): DataFrame = {
    val parts = urls.select(col(idCol),
      expr(s"lower(regexp_extract($urlCol, '^[A-Za-z]+://([^/?#:]+)', 1))").as("host"),
      expr(s"CASE WHEN regexp_extract(regexp_replace($urlCol, '^[A-Za-z]+://[^/?#]*', ''), '^([^?#]*)', 1) = '' THEN '/' " +
        s"ELSE regexp_extract(regexp_replace($urlCol, '^[A-Za-z]+://[^/?#]*', ''), '^([^?#]*)', 1) END").as("path"))
    // left join keeps rule-less hosts (one null-rule row); the best struct
    // orders by (matched, prefix length, allow, prefix) so max() picks the
    // RFC winner, and a tie at (length, allow) is verdict-identical
    parts.join(broadcast(rules), Seq("host"), "left")
      .withColumn("__m",
        col("prefix").isNotNull && expr("substr(path, 1, length(prefix)) = prefix"))
      .groupBy(col(idCol), col("host"), col("path"))
      .agg(max(struct(col("__m").as("m"),
        coalesce(length(col("prefix")), lit(-1)).as("len"),
        coalesce(col("allow"), lit(false)).as("allow"))).as("__best"))
      .select(col(idCol), col("host"), col("path"),
        when(col("__best.m"), col("__best.allow")).otherwise(lit(true)).as("allowed"))
  }

  /** DuckDB replay of [[pageRank]] over `edges` (a CTE named `edges` with
    * columns src, dst, w must be in scope): unrolled iterations, `//` for
    * DIV, same integer arithmetic. Returns the chain of CTE bodies after
    * `edges`, ending in a `rank$iterations` CTE with columns (d, r). */
  def pageRankOracleCtes(iterations: Int, dampingPpm: Long, scale: Long): String = {
    val iters = (1 to iterations).map { i =>
      s"""rank$i AS (
         |  SELECT n.d,
         |    ((1000000 - $dampingPpm) * ($scale // (SELECT COUNT(*) FROM nodes))) // 1000000
         |      + ($dampingPpm * COALESCE(c.contrib, 0)) // 1000000 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, CAST(SUM(r.r * e.w // e.wout) AS BIGINT) AS contrib
         |    FROM edgesw e JOIN rank${i - 1} r ON e.src = r.d GROUP BY e.dst
         |  ) c ON n.d = c.dst
         |)""".stripMargin
    }.mkString(",\n")
    s"""nodes AS (SELECT DISTINCT d FROM (SELECT src AS d FROM edges UNION SELECT dst FROM edges)),
       |edgesw AS (
       |  SELECT e.src, e.dst, e.w, o.wout FROM edges e
       |  JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY src) o ON e.src = o.src
       |),
       |rank0 AS (SELECT d, $scale // (SELECT COUNT(*) FROM nodes) AS r FROM nodes),
       |$iters""".stripMargin
  }
}
