package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PgDateFormat, TajoFunctions}

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def one(sql: String): Any = {
    TajoFunctions.register(spark)
    spark.sql(sql).collect()(0).get(0)
  }

  test("PG pattern translation") {
    assert(PgDateFormat.translate("YYYY-MM-DD") == "yyyy-MM-dd")
    assert(PgDateFormat.translate("HH24:MI:SS") == "HH:mm:ss")
    assert(PgDateFormat.translate("Mon DD, YYYY") == "MMM dd, yyyy")
    // PG double-quoted literal: quotes stripped, text protected verbatim
    assert(PgDateFormat.translate("YYYY \"week\" WW") == "yyyy 'week' ww")
    assert(PgDateFormat.translate("\"Year:\" YYYY") == "'Year:' yyyy")
    // FM fill mode drops the zero padding
    assert(PgDateFormat.translate("FMMM/FMDD/YYYY") == "M/d/yyyy")
    assert(PgDateFormat.translate("FMHH24:MI") == "H:mm")
  }

  test("to_char formats timestamps with PG patterns") {
    assert(one("SELECT to_char(TIMESTAMP '1996-03-13 11:42:05', 'YYYY-MM-DD HH24:MI:SS')")
      == "1996-03-13 11:42:05")
    assert(one("SELECT to_char(TIMESTAMP '1996-03-13 00:00:00', 'DD/MM/YY')") == "13/03/96")
    // TZ prints the engine's fixed-UTC zone instead of throwing on the
    // zoneless LocalDateTime the UDF formats
    assert(one("SELECT to_char(TIMESTAMP '1996-03-13 11:42:05', 'HH24:MI TZ')") == "11:42 UTC")
  }

  test("add_days / utc_usec_to") {
    assert(one("SELECT CAST(add_days(TIMESTAMP '2000-02-28 01:02:03', 2) AS STRING)")
      == "2000-03-01 01:02:03")
    assert(one("SELECT utc_usec_to('day', 86400000000 + 123)") == 86400000000L)
    assert(one("SELECT utc_usec_to('hour', 7200000000 + 999)") == 7200000000L)
    // 2024-06-15 (Saturday) 10:30 UTC = 1718447400000000 usec
    val sat = 1718447400000000L
    assert(one(s"SELECT utc_usec_to('month', $sat)") == 1717200000000000L) // 2024-06-01
    assert(one(s"SELECT utc_usec_to('year', $sat)") == 1704067200000000L)  // 2024-01-01
    assert(one(s"SELECT utc_usec_to('week', $sat)") == 1717977600000000L)  // Mon 2024-06-10
    assert(one(s"SELECT utc_usec_to_week($sat, 6)") == 1718409600000000L)  // Sat 2024-06-15
  }

  test("date_part uses Postgres field semantics (dow Sunday=0)") {
    // 2024-06-16 is a Sunday
    assert(one("SELECT date_part('dow', TIMESTAMP '2024-06-16 10:00:00')") == 0.0)
    assert(one("SELECT date_part('isodow', TIMESTAMP '2024-06-16 10:00:00')") == 7.0)
    assert(one("SELECT date_part('dow', TIMESTAMP '2024-06-17 10:00:00')") == 1.0) // Monday
    assert(one("SELECT date_part('doy', TIMESTAMP '2024-02-01 00:00:00')") == 32.0)
    assert(one("SELECT date_part('quarter', TIMESTAMP '2024-06-16 00:00:00')") == 2.0)
    assert(one("SELECT date_part('epoch', TIMESTAMP '1970-01-01 00:01:00')") == 60.0)
  }

  test("to_bin / to_hex / current_time") {
    assert(one("SELECT to_bin(10)") == "1010")
    assert(one("SELECT to_hex(255)") == "ff")
    assert(one("SELECT current_time()").asInstanceOf[String]
      .matches("\\d{2}:\\d{2}:\\d{2}"))
  }

  test("strpos returns 1-based character positions") {
    assert(one("SELECT strpos('hello', 'llo')") == 3)
    assert(one("SELECT strpos('hello', 'zz')") == 0)
    assert(one("SELECT strpos('héllo', 'llo')") == 3) // chars, not bytes
  }

  test("strposb returns byte positions") {
    assert(one("SELECT strposb('hello', 'llo')") == 3)
    assert(one("SELECT strposb('hello', 'zz')") == 0)
    assert(one("SELECT strposb('héllo', 'llo')") == 4) // é is 2 bytes in UTF-8
  }

  test("digest computes hex digests") {
    assert(one("SELECT digest('abc', 'sha1')") == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one("SELECT digest('abc', 'md5')") == "900150983cd24fb0d6963f7d28e17f72")
  }

  // Trig parity lives here with a tolerance, NOT in a hash-compared oracle
  // query: ATAN/ASIN/ACOS/TAN are libm functions with no IEEE-mandated
  // exact result, so two libm builds can differ by 1 ulp (reference:
  // engine/function/math/Atan.java, Asin.java, Acos.java, Tan.java).
  test("inverse trig and tan match java.lang.Math within 1e-12") {
    for (x <- Seq(0.0, 0.01, 0.05, 0.09, 0.5, 0.99, -0.7)) {
      assert(math.abs(one(s"SELECT ATAN(CAST($x AS DOUBLE))").asInstanceOf[Double] - math.atan(x)) < 1e-12)
      assert(math.abs(one(s"SELECT ASIN(CAST($x AS DOUBLE))").asInstanceOf[Double] - math.asin(x)) < 1e-12)
      assert(math.abs(one(s"SELECT ACOS(CAST($x AS DOUBLE))").asInstanceOf[Double] - math.acos(x)) < 1e-12)
      assert(math.abs(one(s"SELECT TAN(CAST($x AS DOUBLE))").asInstanceOf[Double] - math.tan(x)) < 1e-12)
    }
  }

  // Decimal ROUND of a division lives here with a tolerance, NOT in a
  // hash-compared oracle query: DuckDB routes DECIMAL/int division through
  // DOUBLE on some builds (half-even), while Spark divides exactly and
  // rounds half-up — boundary rows flip (reference:
  // engine/function/math/RoundFloat8.java). The oracle query q_func_math2
  // carries the same quotient as BIGINT floor division instead.
  test("decimal ROUND of a division matches BigDecimal half-up within 0.01") {
    for (x <- Seq(1.0, 904.00, 100.005, 35706.70, 999999.99)) {
      val got = one(s"SELECT ROUND(CAST($x AS DECIMAL(28,6)) / 7, 2)")
        .asInstanceOf[java.math.BigDecimal]
      val want = new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .divide(new java.math.BigDecimal(7), 2, java.math.RoundingMode.HALF_UP)
      assert(got.subtract(want).abs.doubleValue <= 0.01, s"x=$x got=$got want=$want")
    }
  }

  test("ip conversions round-trip") {
    assert(one("SELECT int_to_ipstr(3232235777)") == "192.168.1.1")
    assert(one("SELECT ipstr_to_int('192.168.1.1')") == 3232235777L)
    assert(one("SELECT bin_to_ipstr(ipstr_to_blob('10.0.0.255'))") == "10.0.0.255")
  }

  test("json_extract_path_text") {
    assert(one("""SELECT json_extract_path_text('{"a": {"b": 7}}', 'a.b')""") == "7")
  }

  test("string_agg sorts deterministically") {
    assert(one("SELECT string_agg(x, ',') FROM VALUES ('b'), ('a'), ('c') AS t(x)") == "a,b,c")
  }

  test("geoip lookup against the default table, and a custom table reload") {
    import graft.functions.GeoIp
    assert(one("SELECT geoip_country_code('1.2.3.4')") == "US")
    assert(one("SELECT geoip_country_code('200.0.0.1')") == "KR")
    assert(one("SELECT geoip_in_country('40.0.0.1', 'CA')") == true)
    assert(one("SELECT geoip_country_code(NULL)") == null)
    try {
      GeoIp.load(Seq(GeoIp.IpRange(0L, 255L, "AQ")))
      GeoIp.register(spark) // re-bind to the new snapshot
      assert(one("SELECT geoip_country_code('0.0.0.9')") == "AQ")
      assert(one("SELECT geoip_country_code('9.9.9.9')") == null)
    } finally {
      GeoIp.reset()
      GeoIp.register(spark)
    }
  }

  test("Tajo encode/decode(base64|hex) map to Spark's native codecs") {
    // reference encode/decode (engine/function/string/Encode.java) are the
    // PG base64/hex codecs; Spark's base64/unbase64/hex/unhex are the
    // direct equivalents (Spark's own encode(str, charset) keeps its
    // builtin meaning — see q_func_string2).
    assert(one("SELECT base64(CAST('tajo' AS BINARY))") == "dGFqbw==")
    assert(one("SELECT CAST(unbase64('dGFqbw==') AS STRING)") == "tajo")
    assert(one("SELECT hex(CAST('AB' AS BINARY))") == "4142")
    assert(one("SELECT CAST(unhex('4142') AS STRING)") == "AB")
  }

  test("simhash32: identical token arrays hash equal, disjoint differ") {
    val a = one("SELECT simhash32(ARRAY('spark', 'query', 'engine'))")
    val b = one("SELECT simhash32(ARRAY('spark', 'query', 'engine'))")
    val c = one("SELECT simhash32(ARRAY('totally', 'different', 'words'))")
    assert(a == b)
    assert(a != c)
    assert(a.asInstanceOf[Long] >= 0 && a.asInstanceOf[Long] < (1L << 32))
  }
}
