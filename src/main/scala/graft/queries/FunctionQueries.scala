package graft.queries

import graft.QueryDef
import graft.QueryDef.{df, shared, split}

/** Function-library surface (SURVEY.md §2.7): string / math / datetime /
  * JSON / network functions plus string_agg, exercised over the testdata
  * tables and cross-checked against DuckDB spellings of the same semantics.
  *
  * Reference function inventory: annotation-scanned registration in
  * tajo-core/src/main/java/org/apache/tajo/engine/function/FunctionLoader.java:60-140
  * with per-function classes under engine/function/{string,math,datetime,json}.
  */
object FunctionQueries {

  // Spark regexp_replace replaces all matches; DuckDB needs the 'g' flag.
  private val qString = split("q_func_string",
    """SELECT c_custkey,
      |  LOWER(c_name) AS lo, UPPER(c_name) AS up, INITCAP(LOWER(c_name)) AS ini,
      |  CAST(LENGTH(c_name) AS BIGINT) AS len,
      |  CAST(CHAR_LENGTH(c_name) AS BIGINT) AS clen,
      |  CAST(OCTET_LENGTH(c_name) AS BIGINT) AS olen,
      |  SUBSTR(c_name, 1, 8) AS sub,
      |  LPAD(c_name, 25, '*') AS lp, RPAD(c_name, 25, '*') AS rp,
      |  TRIM('C' FROM c_name) AS trimmed,
      |  REVERSE(c_name) AS rev,
      |  REPEAT(c_mktsegment, 2) AS rep,
      |  REPLACE(c_name, 'Customer', 'Cust') AS repl,
      |  REGEXP_REPLACE(c_name, '[0-9]+', '#') AS rex,
      |  SPLIT_PART(c_name, '#', 2) AS sp2,
      |  CAST(POSITION('#' IN c_name) AS BIGINT) AS pos,
      |  CONCAT(c_name, '/', c_mktsegment) AS cc,
      |  CONCAT_WS('-', c_name, c_mktsegment) AS cw,
      |  CAST(ASCII(c_name) AS BIGINT) AS asc_c,
      |  CHR(65 + CAST(c_custkey % 26 AS INT)) AS chr_c,
      |  MD5(c_name) AS md5h,
      |  LEFT(c_name, 4) AS l4, RIGHT(c_name, 4) AS r4
      |FROM customer ORDER BY c_custkey""".stripMargin,
    """SELECT c_custkey,
      |  LOWER(c_name) AS lo, UPPER(c_name) AS up,
      |  CONCAT(UPPER(SUBSTR(LOWER(c_name), 1, 1)), SUBSTR(LOWER(c_name), 2)) AS ini,
      |  CAST(LENGTH(c_name) AS BIGINT) AS len,
      |  CAST(LENGTH(c_name) AS BIGINT) AS clen,
      |  CAST(OCTET_LENGTH(CAST(c_name AS BLOB)) AS BIGINT) AS olen,
      |  SUBSTR(c_name, 1, 8) AS sub,
      |  LPAD(c_name, 25, '*') AS lp, RPAD(c_name, 25, '*') AS rp,
      |  TRIM(c_name, 'C') AS trimmed,
      |  REVERSE(c_name) AS rev,
      |  REPEAT(c_mktsegment, 2) AS rep,
      |  REPLACE(c_name, 'Customer', 'Cust') AS repl,
      |  REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS rex,
      |  SPLIT_PART(c_name, '#', 2) AS sp2,
      |  CAST(POSITION('#' IN c_name) AS BIGINT) AS pos,
      |  CONCAT(c_name, '/', c_mktsegment) AS cc,
      |  CONCAT_WS('-', c_name, c_mktsegment) AS cw,
      |  CAST(ASCII(c_name) AS BIGINT) AS asc_c,
      |  CHR(65 + CAST(c_custkey % 26 AS INT)) AS chr_c,
      |  MD5(c_name) AS md5h,
      |  LEFT(c_name, 4) AS l4, RIGHT(c_name, 4) AS r4
      |FROM customer ORDER BY c_custkey""".stripMargin)

  // Math: libm last-ulp differences between JVM and C++ are masked by the
  // DECIMAL rounding; sqrt/abs/floor/ceil/mod are exact.
  private val qMath = shared("q_func_math",
    """SELECT l_orderkey, l_linenumber,
      |  ABS(-l_quantity) AS abs_q,
      |  CAST(CEIL(l_extendedprice) AS DOUBLE) AS ceil_p,
      |  CAST(FLOOR(l_extendedprice) AS DOUBLE) AS floor_p,
      |  CAST(MOD(CAST(l_partkey AS BIGINT), 97) AS BIGINT) AS mod_p,
      |  CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn,
      |  SQRT(l_quantity) AS sqrt_q,
      |  CAST(CAST(EXP(l_discount) AS DECIMAL(20,8)) AS DOUBLE) AS exp_d,
      |  CAST(CAST(LN(l_quantity + 1) AS DECIMAL(20,8)) AS DOUBLE) AS ln_q,
      |  CAST(CAST(POW(l_quantity, 2) AS DECIMAL(28,4)) AS DOUBLE) AS pow_q,
      |  CAST(CAST(SIN(l_discount) AS DECIMAL(20,8)) AS DOUBLE) AS sin_d,
      |  CAST(CAST(COS(l_discount) AS DECIMAL(20,8)) AS DOUBLE) AS cos_d,
      |  CAST(CAST(ATAN2(l_quantity, 7) AS DECIMAL(20,8)) AS DOUBLE) AS at2,
      |  CAST(CAST(DEGREES(l_discount) AS DECIMAL(20,8)) AS DOUBLE) AS deg,
      |  CAST(CAST(RADIANS(l_quantity) AS DECIMAL(20,8)) AS DOUBLE) AS rad,
      |  CAST(CAST(CBRT(l_quantity) AS DECIMAL(20,8)) AS DOUBLE) AS cb,
      |  CAST(CAST(PI() AS DECIMAL(20,8)) AS DOUBLE) AS pi_v,
      |  ROUND(CAST(l_extendedprice AS DECIMAL(28,4)), 1) AS rnd
      |FROM lineitem WHERE l_orderkey % 50 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // Datetime: Tajo/PG to_char via our compat UDF; DuckDB strftime.
  private val qDatetime = split("q_func_datetime",
    """SELECT o_orderkey,
      |  to_char(o_orderdate, 'YYYY-MM-DD') AS d_str,
      |  to_char(o_orderdate, 'YYYY/MM') AS ym,
      |  CAST(DATE_PART('year', o_orderdate) AS BIGINT) AS yr,
      |  CAST(DATE_PART('month', o_orderdate) AS BIGINT) AS mon,
      |  CAST(DATE_PART('day', o_orderdate) AS BIGINT) AS dom,
      |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
      |  DATE_TRUNC('MONTH', o_orderdate) AS mstart,
      |  add_days(o_orderdate, 30) AS plus30,
      |  ADD_MONTHS(o_orderdate, 2) AS plus2m,
      |  o_orderdate + INTERVAL 1 DAY AS plus1d,
      |  CAST(o_orderdate AS DATE) AS as_date
      |FROM orders WHERE o_orderkey % 20 = 0
      |ORDER BY o_orderkey""".stripMargin,
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
      |  strftime(o_orderdate, '%Y/%m') AS ym,
      |  CAST(DATE_PART('year', o_orderdate) AS BIGINT) AS yr,
      |  CAST(DATE_PART('month', o_orderdate) AS BIGINT) AS mon,
      |  CAST(DATE_PART('day', o_orderdate) AS BIGINT) AS dom,
      |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
      |  DATE_TRUNC('MONTH', o_orderdate) AS mstart,
      |  o_orderdate + INTERVAL 30 DAY AS plus30,
      |  CAST(o_orderdate + INTERVAL 2 MONTH AS TIMESTAMP) AS plus2m,
      |  o_orderdate + INTERVAL 1 DAY AS plus1d,
      |  CAST(o_orderdate AS DATE) AS as_date
      |FROM orders WHERE o_orderkey % 20 = 0
      |ORDER BY o_orderkey""".stripMargin)

  // JSON path + array functions over events.props
  // (reference: engine/function/json/Json*.java)
  private val qJson = split("q_func_json",
    """SELECT event_id,
      |  CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS k,
      |  json_extract_path_text(props, 'k') AS k_text,
      |  CAST(JSON_ARRAY_LENGTH(CONCAT('[', GET_JSON_OBJECT(props, '$.k'), ',1,2]')) AS BIGINT) AS arr_len
      |FROM events
      |ORDER BY event_id""".stripMargin,
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  json_extract_string(props, '$.k') AS k_text,
      |  CAST(json_array_length(CONCAT('[', json_extract_string(props, '$.k'), ',1,2]')) AS BIGINT) AS arr_len
      |FROM events
      |ORDER BY event_id""".stripMargin)

  // JSON array functions (reference: engine/function/json/JsonArrayContains
  // .java, JsonArrayGet.java) over synthesized arrays.
  private val qJson2 = split("q_func_json2",
    """SELECT event_id,
      |  json_array_contains(arr, CAST(event_id % 3 AS BIGINT)) AS has_k,
      |  json_array_get(arr, 1) AS second,
      |  CAST(JSON_ARRAY_LENGTH(arr) AS BIGINT) AS alen
      |FROM (SELECT event_id,
      |        CONCAT('[', CAST(event_id % 5 AS STRING), ',', CAST(event_id % 7 AS STRING), ',9]') AS arr
      |      FROM events) t
      |ORDER BY event_id""".stripMargin,
    """SELECT event_id,
      |  json_contains(arr, CAST(event_id % 3 AS VARCHAR)) AS has_k,
      |  json_extract_string(arr, '$[1]') AS second,
      |  CAST(json_array_length(arr) AS BIGINT) AS alen
      |FROM (SELECT event_id,
      |        CONCAT('[', CAST(event_id % 5 AS VARCHAR), ',', CAST(event_id % 7 AS VARCHAR), ',9]') AS arr
      |      FROM events) t
      |ORDER BY event_id""".stripMargin)

  // PG-pattern parse round trips + dow/doy/week + utc_usec_to truncation
  // (reference: engine/function/datetime/ToDateText.java, ToTimestampText
  // .java, DatePartFromTimestamp.java, DateTimePartFromUnixTimestamp).
  private val qDatetime2 = split("q_func_datetime2",
    """SELECT o_orderkey,
      |  to_date_pg(to_char(o_orderdate, 'YYYY-MM-DD'), 'YYYY-MM-DD') AS rt_date,
      |  to_timestamp_pg(to_char(o_orderdate, 'YYYY-MM-DD HH24:MI:SS'), 'YYYY-MM-DD HH24:MI:SS') AS rt_ts,
      |  CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) - 1 AS dow,
      |  CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS doy,
      |  CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS wk,
      |  utc_usec_to('day', o_orderkey * 86400000000 + 12345678901) AS day_usec,
      |  utc_usec_to('hour', o_orderkey * 3600000000 + 987654321) AS hr_usec
      |FROM orders WHERE o_orderkey % 25 = 0
      |ORDER BY o_orderkey""".stripMargin,
    """SELECT o_orderkey,
      |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS rt_date,
      |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS rt_ts,
      |  CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow,
      |  CAST(date_part('doy', o_orderdate) AS BIGINT) AS doy,
      |  CAST(date_part('week', o_orderdate) AS BIGINT) AS wk,
      |  (o_orderkey * 86400000000 + 12345678901) - (o_orderkey * 86400000000 + 12345678901) % 86400000000 AS day_usec,
      |  (o_orderkey * 3600000000 + 987654321) - (o_orderkey * 3600000000 + 987654321) % 3600000000 AS hr_usec
      |FROM orders WHERE o_orderkey % 25 = 0
      |ORDER BY o_orderkey""".stripMargin)

  // string_agg: deterministic sorted variant (our UDAF) vs DuckDB ORDER BY.
  private val qStringAgg = split("q_func_string_agg",
    """SELECT n_regionkey, string_agg(n_name, ',') AS names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)

  // Network functions: synthesize deterministic IPv4s from keys.
  private val qIp = split("q_func_ip",
    """SELECT c_custkey,
      |  int_to_ipstr(c_custkey * 2654435761) AS ip,
      |  ipstr_to_int(int_to_ipstr(c_custkey * 2654435761)) AS ip_int
      |FROM customer ORDER BY c_custkey""".stripMargin,
    """SELECT c_custkey,
      |  CONCAT(CAST((c_custkey * 2654435761 % 4294967296) // 16777216 AS BIGINT), '.',
      |         CAST((c_custkey * 2654435761 % 16777216) // 65536 AS BIGINT), '.',
      |         CAST((c_custkey * 2654435761 % 65536) // 256 AS BIGINT), '.',
      |         CAST(c_custkey * 2654435761 % 256 AS BIGINT)) AS ip,
      |  CAST(c_custkey * 2654435761 % 4294967296 AS BIGINT) AS ip_int
      |FROM customer ORDER BY c_custkey""".stripMargin)

  // geoip over the pluggable range table (reference: engine/function/geoip/
  // GeoIPCountryInet4.java); the oracle mirrors GeoIp.defaultTable's 8
  // first-octet blocks arithmetically.
  private val qGeoip = split("q_func_geoip",
    """SELECT c_custkey,
      |  geoip_country_code(int_to_ipstr(c_custkey * 2654435761)) AS cc,
      |  geoip_in_country(int_to_ipstr(c_custkey * 2654435761), 'US') AS in_us
      |FROM customer ORDER BY c_custkey""".stripMargin,
    """SELECT c_custkey,
      |  ['US','CA','GB','DE','FR','JP','KR','AU'][
      |    CAST((c_custkey * 2654435761 % 4294967296) // 16777216 // 32 AS INT) + 1] AS cc,
      |  ((c_custkey * 2654435761 % 4294967296) // 16777216 // 32) = 0 AS in_us
      |FROM customer ORDER BY c_custkey""".stripMargin)

  // digest / hashing (reference: engine/function/string/Digest.java)
  private val qDigest = split("q_func_digest",
    """SELECT s_suppkey, MD5(s_name) AS h_md5, digest(s_name, 'sha256') AS h_sha256,
      |  strposb(s_name, 'er') AS bpos
      |FROM supplier ORDER BY s_suppkey""".stripMargin,
    """SELECT s_suppkey, MD5(s_name) AS h_md5, sha256(s_name) AS h_sha256,
      |  CAST(strpos(s_name, 'er') AS INT) AS bpos
      |FROM supplier ORDER BY s_suppkey""".stripMargin)

  // Second string/misc batch: find_in_set, locate, to_hex/to_bin,
  // bit_length, encode, translate, greatest/least, nullif/coalesce
  // (reference: engine/function/string/FindInSet.java, Locate.java,
  // ToBin.java, ToHex.java, BitLength.java, math/RoundFloat8.java).
  private val qString2 = split("q_func_string2",
    """SELECT p_partkey,
      |  CAST(FIND_IN_SET(p_brand, 'Brand#1,Brand#2,Brand#3') AS BIGINT) AS fis,
      |  CAST(LOCATE('#', p_name) AS BIGINT) AS loc,
      |  HEX(p_partkey) AS hx,
      |  BIN(p_partkey) AS bn,
      |  CAST(BIT_LENGTH(p_brand) AS BIGINT) AS bl,
      |  CAST(OCTET_LENGTH(ENCODE(p_name, 'utf-8')) AS BIGINT) AS enc_len,
      |  TRANSLATE(p_type, 'AEO', 'aeo') AS tr,
      |  GREATEST(p_size, 25) AS gr,
      |  LEAST(p_size, 25) AS le,
      |  NULLIF(p_size, 10) AS nif,
      |  COALESCE(NULLIF(p_size, 10), -1) AS coal,
      |  LTRIM(RTRIM(CONCAT('  ', p_brand, '  '))) AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin,
    """SELECT p_partkey,
      |  CAST(COALESCE(list_position(string_split('Brand#1,Brand#2,Brand#3', ','), p_brand), 0) AS BIGINT) AS fis,
      |  CAST(strpos(p_name, '#') AS BIGINT) AS loc,
      |  to_hex(p_partkey) AS hx,
      |  bin(p_partkey) AS bn,
      |  CAST(BIT_LENGTH(p_brand) AS BIGINT) AS bl,
      |  CAST(OCTET_LENGTH(encode(p_name)) AS BIGINT) AS enc_len,
      |  TRANSLATE(p_type, 'AEO', 'aeo') AS tr,
      |  GREATEST(p_size, 25) AS gr,
      |  LEAST(p_size, 25) AS le,
      |  NULLIF(p_size, 10) AS nif,
      |  COALESCE(NULLIF(p_size, 10), -1) AS coal,
      |  LTRIM(RTRIM(CONCAT('  ', p_brand, '  '))) AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin)

  // ---- python UDF bridge (reference: PythonScriptEngine + controller.py;
  // our bridge: functions/PythonUdf.scala). The script is authored here,
  // registered through the same decorator-parsing path a user script takes,
  // and each python function is replayed as exact DuckDB SQL: integer sums
  // stay exact in python (arbitrary precision) and each double is produced
  // by ONE division, so results are bit-identical.
  private val pyScriptSrc =
    """from tajo_util import output_type
      |
      |@output_type('text')
      |def py_sig(name):
      |    if name is None:
      |        return None
      |    return name.upper() + '#' + str(len(name))
      |
      |@output_type('int8')
      |def py_keysum(a, b):
      |    if a is None or b is None:
      |        return None
      |    return a + b
      |
      |@output_type('float8')
      |def py_frac(num, total):
      |    return num * 100 / float(total)
      |
      |@output_type('int8')
      |def py_count_e(s):
      |    if s is None:
      |        return None
      |    return s.count('e')
      |
      |class SumCountPy:
      |    def __init__(self):
      |        self.reset()
      |    def reset(self):
      |        self.s = 0
      |        self.n = 0
      |    def eval(self, x):
      |        if x is not None:
      |            self.s += x
      |            self.n += 1
      |    def get_partial_result(self):
      |        return [self.s, self.n]
      |    def merge(self, p):
      |        if p:
      |            self.s += p[0]
      |            self.n += p[1]
      |    @output_type('float8')
      |    def get_final_result(self):
      |        if self.n == 0:
      |            return None
      |        return self.s / float(self.n)
      |""".stripMargin

  private lazy val pyScriptPath: String = {
    val f = java.nio.file.Files.createTempFile("graft-pyudf-queries", ".py")
    java.nio.file.Files.write(f, pyScriptSrc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  private val qPythonUdf = df("q_func_python_udf",
    (spark, dir) => {
      graft.functions.PythonUdf.registerScript(spark, pyScriptPath)
      spark.sql(
        """SELECT n_nationkey,
          |  py_sig(n_name) AS sig,
          |  py_keysum(n_nationkey, n_regionkey) AS ks,
          |  py_frac(n_nationkey, 25) AS fr
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    },
    Some("""SELECT n_nationkey,
      |  UPPER(n_name) || '#' || CAST(LENGTH(n_name) AS VARCHAR) AS sig,
      |  CAST(n_nationkey + n_regionkey AS BIGINT) AS ks,
      |  n_nationkey * 100 / CAST(25 AS DOUBLE) AS fr
      |FROM nation ORDER BY n_nationkey""".stripMargin))

  private val qPythonUdaf = df("q_func_python_udaf",
    (spark, dir) => {
      val nation = graft.engine.Tables.table(spark, dir, "nation")
      graft.functions.PythonUdf.aggregate(nation, pyScriptPath,
          graft.functions.PythonUdf.PyAgg("SumCountPy", 1,
            org.apache.spark.sql.types.DoubleType),
          groupCols = Seq("n_regionkey"), inputCols = Seq("n_nationkey"),
          resultCol = "avg_key")
        .orderBy("n_regionkey")
    },
    Some("""SELECT n_regionkey,
      |  CAST(SUM(n_nationkey) AS DOUBLE) / COUNT(n_nationkey) AS avg_key
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin))

  // ---- hive UDF bridge (reference: HiveFunctionLoader scanning classic
  // org.apache.hadoop.hive.ql.exec.UDF subclasses; our bridge:
  // functions/HiveUdf.scala over the in-container hive-exec jar). Each
  // bridged function has an exact DuckDB spelling: reverse/repeat/bin/hex/
  // ascii are byte-identical across Hive and DuckDB on ASCII input.
  // Registered under hv_* names so reference-parity names (@Description)
  // can't shadow Spark builtins for later queries in the same session.
  private val qHiveUdf = df("q_func_hive_udf",
    (spark, dir) => {
      graft.functions.HiveUdf.register(spark, "hv_reverse", "org.apache.hadoop.hive.ql.udf.UDFReverse")
      graft.functions.HiveUdf.register(spark, "hv_repeat", "org.apache.hadoop.hive.ql.udf.UDFRepeat")
      graft.functions.HiveUdf.register(spark, "hv_space", "org.apache.hadoop.hive.ql.udf.UDFSpace")
      graft.functions.HiveUdf.register(spark, "hv_bin", "org.apache.hadoop.hive.ql.udf.UDFBin")
      graft.functions.HiveUdf.register(spark, "hv_hex", "org.apache.hadoop.hive.ql.udf.UDFHex")
      graft.functions.HiveUdf.register(spark, "hv_ascii", "org.apache.hadoop.hive.ql.udf.UDFAscii")
      // GenericUDFs (beyond the reference, which only loads classic UDFs)
      graft.functions.HiveUdf.registerGeneric(spark, "hv_upper_gen",
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper",
        Seq(org.apache.spark.sql.types.StringType))
      graft.functions.HiveUdf.registerGeneric(spark, "hv_instr_gen",
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFInstr",
        Seq(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
      spark.sql(
        """SELECT n_nationkey,
          |  hv_reverse(n_name) AS rev,
          |  hv_repeat(n_name, 2) AS rep,
          |  hv_space(CAST(n_nationkey % 4 AS INT)) AS sp,
          |  hv_bin(CAST(n_nationkey AS BIGINT)) AS bn,
          |  hv_hex(n_name) AS hx,
          |  hv_ascii(n_name) AS asc_c,
          |  hv_upper_gen(n_name) AS upg,
          |  hv_instr_gen(n_name, '1') AS ins
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    },
    Some("""SELECT n_nationkey,
      |  REVERSE(n_name) AS rev,
      |  REPEAT(n_name, 2) AS rep,
      |  REPEAT(' ', n_nationkey % 4) AS sp,
      |  BIN(n_nationkey) AS bn,
      |  HEX(n_name) AS hx,
      |  ASCII(n_name) AS asc_c,
      |  UPPER(n_name) AS upg,
      |  CAST(STRPOS(n_name, '1') AS INT) AS ins
      |FROM nation ORDER BY n_nationkey""".stripMargin))

  // The batched bridge path over a corpus-scale column: mapColumn pushes
  // 1024 rows per pipe round trip through mapPartitions — the design that
  // holds at 100 TB (pipe latency amortizes; workers are per-thread and
  // long-lived; nothing reaches the driver). Occurrence counting has an
  // exact DuckDB spelling, so the oracle is bit-exact.
  private val qPythonBatch = df("q_func_python_batch",
    (spark, dir) => {
      val docs = graft.engine.Tables.table(spark, dir, "documents")
        .select("doc_id", "text")
      graft.functions.PythonUdf.mapColumn(docs, pyScriptPath, "py_count_e",
          org.apache.spark.sql.types.LongType, Seq("text"), "e_count")
        .select(org.apache.spark.sql.functions.col("doc_id").cast("bigint").as("doc_id"),
          org.apache.spark.sql.functions.col("e_count"))
        .orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(LENGTH(text) - LENGTH(REPLACE(text, 'e', '')) AS BIGINT) AS e_count
      |FROM documents ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    qString, qString2, qMath, qDatetime, qDatetime2, qJson, qJson2,
    qStringAgg, qIp, qGeoip, qDigest, qPythonUdf, qPythonUdaf, qHiveUdf,
    qPythonBatch)
}
