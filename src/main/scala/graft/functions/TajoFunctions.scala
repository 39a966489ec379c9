package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}
import org.apache.spark.sql.{Encoder, Encoders}

/** Tajo-compatible function layer.
  *
  * The reference registers ~180 annotated functions at startup (reference:
  * tajo-core/src/main/java/org/apache/tajo/engine/function/FunctionLoader.java:60-140).
  * Almost all of them exist natively in Spark (SURVEY.md §2.7); this object
  * registers only the names that are missing or semantically different, so a
  * Tajo query keeps running under `spark.sql` unchanged.
  *
  * Scale note: these are Scala UDFs, which break whole-stage codegen for the
  * single projection that calls them; none sit on a shuffle or join hot path.
  * The hot-path pipeline primitives (hashing, minhash, similarity) use
  * built-in codegen'd expressions instead — see graft.operators.
  */
object TajoFunctions {

  private val registered = ConcurrentHashMap.newKeySet[Integer]()

  private val fmtCache = new ConcurrentHashMap[String, DateTimeFormatter]()
  private def formatter(pg: String): DateTimeFormatter =
    fmtCache.computeIfAbsent(pg,
      p => DateTimeFormatter.ofPattern(PgDateFormat.translate(p), java.util.Locale.US))

  private def utc(ts: java.sql.Timestamp): LocalDateTime =
    LocalDateTime.ofInstant(Instant.ofEpochMilli(ts.getTime)
      .plusNanos(ts.getNanos % 1000000L), ZoneOffset.UTC)

  /** string_agg(expr, sep): deterministic (sorted) variant of the reference's
    * string_agg (reference: tajo-core/src/main/java/org/apache/tajo/engine/
    * function/builtin/StringAgg.java:43). Sorting makes the result
    * well-defined under distributed (partial/merge) aggregation. */
  private object StringAggSorted extends Aggregator[(String, String), (List[String], String), String] {
    def zero: (List[String], String) = (Nil, ",")
    def reduce(b: (List[String], String), a: (String, String)): (List[String], String) =
      (if (a._1 == null) b._1 else a._1 :: b._1, if (a._2 == null) b._2 else a._2)
    def merge(x: (List[String], String), y: (List[String], String)): (List[String], String) =
      (x._1 ::: y._1, if (y._1.nonEmpty || x._1.isEmpty) y._2 else x._2)
    def finish(r: (List[String], String)): String = r._1.sorted.mkString(r._2)
    def bufferEncoder: Encoder[(List[String], String)] = Encoders.product
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  def register(spark: SparkSession): Unit = {
    val key = Integer.valueOf(System.identityHashCode(spark))
    if (!registered.add(key)) return
    val u = spark.udf

    // -- Postgres-style datetime formatting (reference: engine/function/
    //    datetime/ToCharTimestamp.java, ToTimestampText.java, DateTimeFormat)
    u.register("to_char", (ts: java.sql.Timestamp, fmt: String) =>
      if (ts == null || fmt == null) null else utc(ts).format(formatter(fmt)))
    u.register("to_date_pg", (s: String, fmt: String) =>
      if (s == null || fmt == null) null
      else java.sql.Date.valueOf(java.time.LocalDate.parse(s, formatter(fmt))))
    u.register("to_timestamp_pg", (s: String, fmt: String) =>
      if (s == null || fmt == null) null
      else java.sql.Timestamp.valueOf(LocalDateTime.parse(s, formatter(fmt))))
    // add_days (reference: engine/function/datetime/AddDays.java)
    u.register("add_days", (ts: java.sql.Timestamp, n: Int) =>
      if (ts == null) null
      else java.sql.Timestamp.valueOf(utc(ts).plusDays(n.toLong)))
    // utc_usec_to(unit, usec): truncate a UTC epoch-microsecond value to
    // day/hour/minute/second (fixed-step modulo) or month/year/week
    // (calendar truncation; week = the ISO week's Monday) — reference:
    // engine/function/datetime/DateTimePartFromUnixTimestamp.java:74-90 +
    // DateTimeUtil.java:2252-2296. The reference's optional 3rd argument
    // (week anchored to weekday 1-7, Monday=1) is the separate
    // utc_usec_to_week: the UDF registry has no overloads on one name.
    def epochUsec(d: java.time.LocalDate): Long =
      d.atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    def usecDate(usec: Long): java.time.LocalDate =
      java.time.LocalDateTime.ofEpochSecond(
        java.lang.Math.floorDiv(usec, 1000000L), 0, java.time.ZoneOffset.UTC).toLocalDate
    def usecTrunc(unit: String, usec: Long, weekday: Int): Long =
      unit.toLowerCase match {
        case "day" => usec - java.lang.Math.floorMod(usec, 86400000000L)
        case "hour" => usec - java.lang.Math.floorMod(usec, 3600000000L)
        case "minute" => usec - java.lang.Math.floorMod(usec, 60000000L)
        case "second" => usec - java.lang.Math.floorMod(usec, 1000000L)
        case "month" => epochUsec(usecDate(usec).withDayOfMonth(1))
        case "year" => epochUsec(usecDate(usec).withDayOfYear(1))
        case "week" =>
          require(weekday >= 1 && weekday <= 7, s"weekday out of range: $weekday")
          // day `weekday` (Monday=1) of the value's ISO week
          epochUsec(usecDate(usec)
            .`with`(java.time.temporal.ChronoField.DAY_OF_WEEK, 1L).plusDays(weekday - 1L))
        case other => throw new IllegalArgumentException(s"utc_usec_to: $other")
      }
    u.register("utc_usec_to", (unit: String, usec: Long) => usecTrunc(unit, usec, 1))
    u.register("utc_usec_to_week", (usec: Long, weekday: Int) => usecTrunc("week", usec, weekday))

    // current_time (reference: engine/function/datetime/CurrentTime.java) —
    // Spark has current_date/current_timestamp but no time-of-day function;
    // TIME maps to STRING in this engine (SURVEY §1), so this returns
    // 'HH:mm:ss' in the engine's fixed-UTC semantics. Non-deterministic by
    // nature — never used in oracle-compared queries.
    // registered asNondeterministic so the optimizer can neither
    // constant-fold nor duplicate it across subexpressions (each row would
    // otherwise be able to observe different values within one query)
    u.register("current_time", udf(() =>
      java.time.LocalTime.now(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss")))
      .asNondeterministic())

    // Tajo names for Spark's bin/hex (reference: engine/function/math/
    // ToBin.java, engine/function/string/ToHex.java)
    u.register("to_bin", (v: Long) => java.lang.Long.toBinaryString(v))
    u.register("to_hex", (v: Long) => java.lang.Long.toHexString(v))

    // date_part with POSTGRES field semantics (reference: engine/function/
    // datetime/DatePartFromTimestamp.java) — deliberately SHADOWS Spark's
    // builtin in registered sessions: Spark's dow is Sunday=1..7 while
    // PG/Tajo's is Sunday=0..6, a silent off-by-one for ported queries.
    // Returns FLOAT8 like the reference.
    u.register("date_part", (field: String, ts: java.sql.Timestamp) => {
      if (field == null || ts == null) null
      else {
        val d = utc(ts)
        val v: Double = field.toLowerCase match {
          case "year" => d.getYear.toDouble
          case "quarter" => ((d.getMonthValue + 2) / 3).toDouble
          case "month" => d.getMonthValue.toDouble
          case "day" => d.getDayOfMonth.toDouble
          case "hour" => d.getHour.toDouble
          case "minute" => d.getMinute.toDouble
          case "second" => d.getSecond + d.getNano / 1e9
          case "dow" => (d.getDayOfWeek.getValue % 7).toDouble // PG: Sunday=0
          case "isodow" => d.getDayOfWeek.getValue.toDouble    // Monday=1
          case "doy" => d.getDayOfYear.toDouble
          case "week" => d.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR).toDouble
          case "epoch" => d.toEpochSecond(ZoneOffset.UTC) + d.getNano / 1e9
          case other => throw new IllegalArgumentException(s"date_part: unsupported field $other")
        }
        java.lang.Double.valueOf(v)
      }
    })

    // -- string / binary (reference: engine/function/string/)
    // strpos: CHARACTER offset of substring, 1-based, 0 when absent
    // (reference: engine/function/string/StrPos.java)
    u.register("strpos", (str: String, sub: String) => {
      if (str == null || sub == null) null
      else Integer.valueOf(str.indexOf(sub) + 1)
    })
    // strposb: byte offset of substring, 1-based, 0 when absent
    // (reference: engine/function/string/StrPosb.java)
    u.register("strposb", (str: String, sub: String) => {
      if (str == null || sub == null) null
      else {
        val h = str.getBytes(StandardCharsets.UTF_8)
        val n = sub.getBytes(StandardCharsets.UTF_8)
        if (n.isEmpty) Integer.valueOf(1)
        else {
          var i = 0; var found = 0
          while (found == 0 && i <= h.length - n.length) {
            if (java.util.Arrays.equals(h, i, i + n.length, n, 0, n.length)) found = i + 1
            i += 1
          }
          Integer.valueOf(found)
        }
      }
    })
    // digest(input, algo) -> lowercase hex (reference: engine/function/string/Digest.java)
    u.register("digest", (s: String, algo: String) => {
      if (s == null || algo == null) null
      else {
        val jalgo = algo.toLowerCase match {
          case "sha1" => "SHA-1"; case "sha256" => "SHA-256"
          case "sha512" => "SHA-512"; case "md5" => "MD5"; case a => a
        }
        MessageDigest.getInstance(jalgo)
          .digest(s.getBytes(StandardCharsets.UTF_8))
          .map(b => f"$b%02x").mkString
      }
    })
    // Always quotes, matching the reference's actual behavior (reference:
    // engine/function/string/QuoteIdent.java eval() wraps unconditionally —
    // its javadoc describes PG's quote-only-if-needed, the code doesn't).
    // We additionally double embedded quotes, which the reference's own
    // doc promises.
    u.register("quote_ident", (s: String) =>
      if (s == null) null else "\"" + s.replace("\"", "\"\"") + "\"")

    // -- network (reference: engine/function/string/HexStringConverter.java + geoip pkg)
    u.register("int_to_ipstr", (v: Long) => {
      val x = v & 0xffffffffL
      s"${(x >> 24) & 255}.${(x >> 16) & 255}.${(x >> 8) & 255}.${x & 255}"
    })
    u.register("ipstr_to_int", (s: String) =>
      if (s == null) null
      else {
        val p = s.split("\\.")
        java.lang.Long.valueOf((p(0).toLong << 24) | (p(1).toLong << 16) | (p(2).toLong << 8) | p(3).toLong)
      })
    u.register("ipstr_to_blob", (s: String) =>
      if (s == null) null
      else s.split("\\.").map(x => x.toInt.toByte))
    u.register("bin_to_ipstr", (b: Array[Byte]) =>
      if (b == null) null else b.map(x => (x & 255).toString).mkString("."))

    // -- json helpers beyond Spark built-ins (reference: engine/function/json/)
    // json_extract_path_text(js, 'a', 'b', ...) == get_json_object(js, '$.a.b')
    u.register("json_extract_path_text", (js: String, path: String) => {
      if (js == null || path == null) null
      else {
        val expr = org.apache.spark.sql.catalyst.expressions.GetJsonObject(
          org.apache.spark.sql.catalyst.expressions.Literal(org.apache.spark.unsafe.types.UTF8String.fromString(js)),
          org.apache.spark.sql.catalyst.expressions.Literal(org.apache.spark.unsafe.types.UTF8String.fromString("$." + path)))
        val r = expr.eval(null)
        if (r == null) null else r.toString
      }
    })

    // json_array_contains / json_array_get (reference: engine/function/json/
    // JsonArrayContains.java, JsonArrayGet.java) — Jackson ships with Spark.
    u.register("json_array_contains", (js: String, v: Long) => {
      if (js == null) null
      else try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
        if (!node.isArray) java.lang.Boolean.FALSE
        else {
          var found = false
          val it = node.elements()
          while (!found && it.hasNext) {
            val e = it.next()
            found = e.isNumber && !e.isFloatingPointNumber && e.asLong() == v
          }
          java.lang.Boolean.valueOf(found)
        }
      } catch { case _: Exception => null }
    })
    u.register("json_array_get", (js: String, i: Int) => {
      if (js == null) null
      else try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
        if (!node.isArray || i < 0 || i >= node.size()) null
        else {
          val e = node.get(i)
          if (e.isValueNode) e.asText() else e.toString
        }
      } catch { case _: Exception => null }
    })

    // -- geoip (reference: engine/function/geoip/ — see GeoIp scaladoc)
    GeoIp.register(spark)

    // -- aggregates
    u.register("string_agg", udaf(StringAggSorted))

    // -- native Catalyst expressions (codegen'd hot-path primitives);
    // builders shared with graft.GraftExtensions (spark.sql.extensions)
    NativeExprs.builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }

    // div(a, b): integer division (reference: engine/function/math/Div.java);
    // null on zero divisor rather than an error, matching Spark's non-ANSI mode.
    u.register("div", (a: Long, b: Long) =>
      if (b == 0L) null else java.lang.Long.valueOf(a / b))

    // -- test helpers (reference: engine/function/builtin/SleepFloat8.java, FailFunction)
    u.register("sleep", (sec: Int) => { Thread.sleep(sec * 1000L); sec })
    u.register("fail", (msg: String) => { throw new RuntimeException(msg); "" })
    ()
  }

  /** Column-API sugar for the registered names. */
  def to_char(c: Column, fmt: String): Column =
    org.apache.spark.sql.functions.call_udf("to_char", c, org.apache.spark.sql.functions.lit(fmt))
}
