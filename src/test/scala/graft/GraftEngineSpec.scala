package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftEngine

class GraftEngineSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = new GraftEngine(spark)
  private val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_engine_test"
  // Drop leftovers from a previous JVM: CTAS refuses non-empty LOCATION dirs.
  org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))

  test("CREATE DATABASE / DROP DATABASE") {
    engine.sql("CREATE DATABASE IF NOT EXISTS graft_test_db")
    assert(spark.catalog.databaseExists("graft_test_db"))
    engine.sql("DROP DATABASE graft_test_db")
    assert(!spark.catalog.databaseExists("graft_test_db"))
  }

  test("Tajo CREATE EXTERNAL TABLE USING text WITH props maps to csv options") {
    val dir = s"$tmp/csv_table"
    engine.mount(sfDir)
    engine.sql("DROP TABLE IF EXISTS nation_csv")
    spark.table("nation").write.mode("overwrite")
      .option("sep", "|").csv(dir)
    engine.sql(
      s"""CREATE EXTERNAL TABLE nation_csv (n_nationkey INT, n_name STRING, n_regionkey INT)
         |USING TEXT WITH ('text.delimiter'='|') LOCATION '$dir'""".stripMargin)
    assert(spark.table("nation_csv").count() == 25)
    val names = spark.sql("SELECT n_name FROM nation_csv ORDER BY n_nationkey LIMIT 1").collect()
    assert(names(0).getString(0) == spark.sql("SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 1").collect()(0).getString(0))
    engine.sql("DROP TABLE nation_csv")
  }

  test("CTAS + TRUNCATE-equivalent + DROP") {
    engine.mount(sfDir)
    engine.sql("DROP TABLE IF EXISTS region_copy")
    engine.sql(s"CREATE TABLE region_copy USING PARQUET LOCATION '$tmp/region_copy' AS SELECT * FROM region")
    assert(spark.table("region_copy").count() == 5)
    engine.sql("DROP TABLE region_copy")
  }

  test("SET TIME ZONE and SET SESSION update the session config") {
    engine.sql("SET TIME ZONE 'UTC'")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    engine.sql("SET SESSION my_flag TO 'on'")
    assert(spark.conf.get("graft.session.my_flag") == "on")
    engine.sql("RESET my_flag")
    assert(spark.conf.getOption("graft.session.my_flag").isEmpty)
  }

  test("SET CATALOG switches the current database") {
    engine.sql("CREATE DATABASE IF NOT EXISTS graft_cat_db")
    engine.sql("SET CATALOG graft_cat_db")
    assert(spark.catalog.currentDatabase == "graft_cat_db")
    engine.sql("SET CATALOG default")
    engine.sql("DROP DATABASE graft_cat_db")
  }

  test("INSERT INTO VALUES, INSERT OVERWRITE INTO, TRUNCATE, ALTER RENAME") {
    engine.sql("DROP TABLE IF EXISTS graft_dml")
    engine.sql("DROP TABLE IF EXISTS graft_dml2")
    // managed table: Spark (like the reference) only TRUNCATEs tables it owns
    engine.sql("CREATE TABLE graft_dml (a INT, b STRING) USING PARQUET")
    engine.sql("INSERT INTO graft_dml VALUES (1, 'x'), (2, 'y')")
    assert(spark.table("graft_dml").count() == 2)
    engine.sql("INSERT OVERWRITE INTO graft_dml SELECT 3, 'z'")
    assert(spark.table("graft_dml").collect().map(_.getInt(0)).toSeq == Seq(3))
    engine.sql("ALTER TABLE graft_dml RENAME TO graft_dml2")
    assert(spark.catalog.tableExists("graft_dml2"))
    engine.sql("TRUNCATE TABLE graft_dml2")
    assert(spark.table("graft_dml2").count() == 0)
    engine.sql("DROP TABLE graft_dml2")
  }

  test("ALTER TABLE partition & property management (Tajo forms)") {
    engine.sql("DROP TABLE IF EXISTS graft_alter")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$tmp/graft_alter"))
    engine.sql(
      s"""CREATE TABLE graft_alter (v INT8) USING PARQUET
         |PARTITION BY COLUMN (p TEXT) LOCATION '$tmp/graft_alter'""".stripMargin)
    engine.sql("INSERT INTO graft_alter PARTITION (p='a') VALUES (1)")
    // SET/UNSET PROPERTY -> TBLPROPERTIES
    engine.sql("ALTER TABLE graft_alter SET PROPERTY 'note'='hello'")
    def props = spark.sql("SHOW TBLPROPERTIES graft_alter").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("note").contains("hello"))
    engine.sql("ALTER TABLE graft_alter UNSET PROPERTY 'note'")
    assert(!props.contains("note"))
    // ADD PARTITION with LOCATION: external data becomes visible under p='b'
    val extDir = s"$tmp/graft_alter_p_b"
    spark.sql("SELECT CAST(2 AS BIGINT) AS v").write.mode("overwrite").parquet(extDir)
    engine.sql(s"ALTER TABLE graft_alter ADD IF NOT EXISTS PARTITION (p = 'b') LOCATION '$extDir'")
    assert(spark.sql("SELECT v FROM graft_alter WHERE p = 'b'").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // DROP PARTITION
    engine.sql("ALTER TABLE graft_alter DROP IF EXISTS PARTITION (p = 'a')")
    assert(spark.sql("SELECT count(*) FROM graft_alter WHERE p = 'a'").collect()(0).getLong(0) == 0)
    // REPAIR PARTITION -> MSCK: files dropped straight into the table dir
    spark.sql("SELECT CAST(3 AS BIGINT) AS v").write.mode("overwrite")
      .parquet(s"$tmp/graft_alter/p=c")
    engine.sql("ALTER TABLE graft_alter REPAIR PARTITION")
    assert(spark.sql("SELECT v FROM graft_alter WHERE p = 'c'").collect().map(_.getLong(0)).toSeq == Seq(3L))
    engine.sql("DROP TABLE graft_alter")
  }

  test("ALTER TABLE RENAME COLUMN renames in the catalog; positional formats read through") {
    engine.sql("DROP TABLE IF EXISTS graft_ren")
    val dir = s"$tmp/graft_ren_csv"
    spark.sql("SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'")
      .write.mode("overwrite").option("sep", "|").csv(dir)
    engine.sql(
      s"""CREATE EXTERNAL TABLE graft_ren (a INT4, b TEXT)
         |USING TEXT WITH ('text.delimiter'='|') LOCATION '$dir'""".stripMargin)
    engine.sql("ALTER TABLE graft_ren RENAME COLUMN b TO label")
    assert(spark.table("graft_ren").columns.toSeq == Seq("a", "label"))
    assert(spark.sql("SELECT label FROM graft_ren ORDER BY a").collect().map(_.getString(0)).toSeq
      == Seq("x", "y"))
    // renaming onto an existing name or a missing column fails loudly
    intercept[IllegalArgumentException](engine.sql("ALTER TABLE graft_ren RENAME COLUMN a TO label"))
    intercept[IllegalArgumentException](engine.sql("ALTER TABLE graft_ren RENAME COLUMN nope TO x"))
    engine.sql("DROP TABLE graft_ren")
  }

  test("ALTER TABLE RENAME COLUMN on a parquet table keeps the data readable") {
    // parquet binds columns by name, so the rename must rewrite the data
    // files — a metadata-only rename would read the column as all-NULL.
    engine.sql("DROP TABLE IF EXISTS graft_ren_pq")
    engine.sql("CREATE TABLE graft_ren_pq AS SELECT r_regionkey, r_name FROM region")
    engine.sql("ALTER TABLE graft_ren_pq RENAME COLUMN r_name TO region_name")
    assert(spark.table("graft_ren_pq").columns.toSeq == Seq("r_regionkey", "region_name"))
    val names = spark.sql("SELECT region_name FROM graft_ren_pq ORDER BY r_regionkey")
      .collect().map(_.getString(0)).toSeq
    assert(names.nonEmpty && names.forall(_ != null), s"rename lost data: $names")
    engine.sql("DROP TABLE graft_ren_pq")
  }

  test("Tajo-typed DDL: PARTITION BY COLUMN with TEXT/INT8 outside the schema") {
    engine.sql("DROP TABLE IF EXISTS graft_part_ddl")
    engine.sql(
      s"""CREATE TABLE graft_part_ddl (a INT8, b TEXT) USING PARQUET
         |PARTITION BY COLUMN (dt TEXT) LOCATION '$tmp/graft_part_ddl'""".stripMargin)
    val cols = spark.table("graft_part_ddl").schema
    assert(cols.fieldNames.toSeq == Seq("a", "b", "dt"))
    assert(cols("a").dataType.typeName == "long")
    assert(cols("dt").dataType.typeName == "string")
    engine.sql("INSERT INTO graft_part_ddl VALUES (1, 'x', 'd1'), (2, 'y', 'd2')")
    assert(spark.table("graft_part_ddl").count() == 2)
    // partition pruning works on the Tajo-declared partition column
    assert(new java.io.File(s"$tmp/graft_part_ddl/dt=d1").exists())
    engine.sql("DROP TABLE graft_part_ddl")
  }

  test("RECORD nested-type DDL maps to STRUCT (recursive) and dot-paths resolve") {
    val dir = s"$tmp/record_ddl_json"
    spark.range(3).selectExpr("id",
      "named_struct('first_name', concat('f', id), 'last_name', concat('l', id), " +
        "'address', named_struct('city', concat('c', id), 'zip', id * 100)) AS name")
      .write.mode("overwrite").json(dir)
    engine.sql("DROP TABLE IF EXISTS graft_record_ddl")
    engine.sql(
      s"""CREATE EXTERNAL TABLE graft_record_ddl (
         |  id INT8,
         |  name RECORD (first_name TEXT, last_name TEXT,
         |               address RECORD (city TEXT, zip INT8))
         |) USING JSON LOCATION '$dir'""".stripMargin)
    val schema = spark.table("graft_record_ddl").schema
    assert(schema("name").dataType.typeName == "struct")
    val r = engine.sql(
      """SELECT id, name.first_name, name.address.city, name.address.zip
        |FROM graft_record_ddl ORDER BY id""".stripMargin).collect()
    assert(r.map(_.getString(1)).toSeq == Seq("f0", "f1", "f2"))
    assert(r.map(_.getString(2)).toSeq == Seq("c0", "c1", "c2"))
    assert(r.map(_.getLong(3)).toSeq == Seq(0L, 100L, 200L))
    engine.sql("DROP TABLE graft_record_ddl")
  }

  test("type keywords rewrite only in type position: a column named text survives") {
    engine.sql("DROP TABLE IF EXISTS graft_colname_ddl")
    engine.sql(
      s"""CREATE TABLE graft_colname_ddl (text TEXT, int8 INT8, f FLOAT4)
         |USING PARQUET LOCATION '$tmp/graft_colname_ddl'""".stripMargin)
    val schema = spark.table("graft_colname_ddl").schema
    assert(schema.fieldNames.toSeq == Seq("text", "int8", "f"))
    assert(schema("text").dataType.typeName == "string")
    assert(schema("int8").dataType.typeName == "long")
    assert(schema("f").dataType.typeName == "float")
    engine.sql("DROP TABLE graft_colname_ddl")
  }

  test("Tajo type keywords rewrite inside CAST, not in aliases") {
    engine.mount(sfDir)
    val r = engine.sql(
      """SELECT CAST(n_nationkey AS INT8) AS k,
        |  CAST(n_regionkey AS TEXT) AS text,
        |  CAST(CAST(n_nationkey AS FLOAT8) AS INT4) AS rt
        |FROM nation WHERE n_nationkey = 7""".stripMargin).collect()(0)
    assert(r.getLong(0) == 7L)      // INT8 -> BIGINT
    assert(r.getString(1) == "2")   // TEXT -> STRING; alias `text` untouched
    assert(r.getInt(2) == 7)        // nested cast FLOAT8 -> DOUBLE, INT4 -> INT
    val schema = engine.sql(
      "SELECT CAST(1 AS INT2) AS a, CAST(1.5 AS DECIMAL(10,2)) AS b").schema
    assert(schema("a").dataType.typeName == "short")
    assert(schema("b").dataType.typeName == "decimal(10,2)") // parameterized types pass through
  }

  test("quote-aware rewrite: parens and AS inside string literals don't confuse CAST mapping") {
    val r = engine.sql("SELECT CAST(concat('x', ')', ' AS ') AS TEXT) AS v").collect()
    assert(r(0).getString(0) == "x) AS ")
    // a literal containing '(' before the cast's AS
    val r2 = engine.sql("SELECT CAST(concat('((', 'y') AS VARCHAR) AS v").collect()
    assert(r2(0).getString(0) == "((y")
  }

  test("type modifiers survive mapping: INT4 NOT NULL, DOUBLE PRECISION") {
    engine.sql("DROP TABLE IF EXISTS graft_mods")
    engine.sql("CREATE TABLE graft_mods (a INT4 NOT NULL, b DOUBLE PRECISION, c BOOL) USING PARQUET")
    val sch = spark.table("graft_mods").schema
    // NOT NULL parses (the point: the INT4 keyword got mapped with the
    // modifier preserved); v1 datasource tables don't persist nullability
    assert(sch("a").dataType.typeName == "integer")
    assert(sch("b").dataType.typeName == "double")
    assert(sch("c").dataType.typeName == "boolean")
    engine.sql("DROP TABLE graft_mods")
  }

  test("ALTER TABLE ADD COLUMN with a Tajo type maps to Spark ADD COLUMNS") {
    engine.sql("DROP TABLE IF EXISTS graft_alter_ddl")
    engine.sql("CREATE TABLE graft_alter_ddl (id INT4) USING PARQUET")
    engine.sql("INSERT INTO graft_alter_ddl VALUES (1)")
    engine.sql("ALTER TABLE graft_alter_ddl ADD COLUMN note TEXT")
    val schema = spark.table("graft_alter_ddl").schema
    assert(schema.fieldNames.toSeq == Seq("id", "note"))
    assert(schema("note").dataType.typeName == "string")
    // pre-existing rows read NULL for the added column
    val r = engine.sql("SELECT id, note FROM graft_alter_ddl").collect()(0)
    assert(r.getInt(0) == 1 && r.isNullAt(1))
    engine.sql("DROP TABLE graft_alter_ddl")
  }

  test("Tajo TIME type is a real TIME column (literal, parquet, comparison)") {
    engine.sql("DROP TABLE IF EXISTS graft_time_ddl")
    engine.sql(
      s"""CREATE TABLE graft_time_ddl (id INT4, t TIME)
         |USING PARQUET LOCATION '$tmp/graft_time_ddl'""".stripMargin)
    assert(spark.table("graft_time_ddl").schema("t").dataType.typeName.startsWith("time"))
    engine.sql("INSERT INTO graft_time_ddl VALUES (1, TIME '12:34:56'), (2, TIME '01:02:03')")
    val r = engine.sql(
      "SELECT id FROM graft_time_ddl WHERE t > TIME '10:00:00' ORDER BY id").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1))
    engine.sql("DROP TABLE graft_time_ddl")
  }

  test("CTAS with PARTITION BY COLUMN (names-only) partitions the output") {
    engine.mount(sfDir)
    engine.sql("DROP TABLE IF EXISTS graft_ctas_part")
    engine.sql(
      s"""CREATE TABLE graft_ctas_part USING PARQUET
         |PARTITION BY COLUMN (o_orderstatus) LOCATION '$tmp/graft_ctas_part'
         |AS SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders""".stripMargin)
    assert(spark.table("graft_ctas_part").count() == spark.table("orders").count())
    assert(new java.io.File(s"$tmp/graft_ctas_part/o_orderstatus=F").exists())
    engine.sql("DROP TABLE graft_ctas_part")
  }

  test("self-describing table: CREATE EXTERNAL TABLE USING JSON without schema") {
    val dir = s"$tmp/selfdesc_json"
    engine.mount(sfDir)
    engine.sql("DROP TABLE IF EXISTS region_json")
    spark.table("region").write.mode("overwrite").json(dir)
    engine.sql(s"CREATE EXTERNAL TABLE region_json USING JSON LOCATION '$dir'")
    assert(spark.table("region_json").count() == 5)
    assert(spark.table("region_json").columns.toSet == Set("r_regionkey", "r_name"))
    engine.sql("DROP TABLE region_json")
  }

  test("EXPLAIN returns a plan and EXPLAIN GLOBAL an extended plan") {
    engine.mount(sfDir)
    val p = engine.sql("EXPLAIN SELECT COUNT(*) FROM nation").collect().map(_.getString(0)).mkString("\n")
    assert(p.contains("Physical Plan"))
    val g = engine.sql("EXPLAIN GLOBAL SELECT COUNT(*) FROM nation").collect().map(_.getString(0)).mkString("\n")
    assert(g.contains("Optimized Logical Plan"))
  }

  test("CREATE INDEX re-lays the table sorted; DROP INDEX unsets it") {
    engine.mount(sfDir)
    engine.sql("DROP TABLE IF EXISTS graft_idx_t")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$tmp/graft_idx_t"))
    engine.sql(
      s"""CREATE TABLE graft_idx_t USING PARQUET LOCATION '$tmp/graft_idx_t'
         |AS SELECT o_orderkey, o_custkey, o_totalprice FROM orders""".stripMargin)
    val before = spark.table("graft_idx_t").orderBy("o_orderkey").collect()
    engine.sql("CREATE INDEX idx_custkey ON graft_idx_t (o_custkey ASC)")
    // data unchanged by the rebuild
    val after = spark.table("graft_idx_t").orderBy("o_orderkey").collect()
    assert(after.toSeq == before.toSeq)
    // index recorded as a table property
    val props = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier("graft_idx_t"))
      .properties
    assert(props.get("graft.index.idx_custkey").contains("o_custkey"))
    // files are now range-clustered on the key: a selective range predicate
    // skips non-matching row groups, so the scan emits far fewer rows than
    // the table holds (the BSTIndexScan effect)
    val q = spark.table("graft_idx_t").filter("o_custkey < 20")
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val scanned = scan.metrics("numOutputRows").value
    val total = spark.table("graft_idx_t").count()
    assert(scanned < total / 2, s"expected row-group skipping: scanned=$scanned total=$total")
    engine.sql("DROP INDEX idx_custkey")
    val props2 = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier("graft_idx_t"))
      .properties
    assert(!props2.contains("graft.index.idx_custkey"))
    engine.sql("DROP INDEX IF EXISTS idx_custkey") // no-op, must not throw
    val e = intercept[IllegalArgumentException](engine.sql("DROP INDEX idx_custkey"))
    assert(e.getMessage.contains("does not exist"))
    engine.sql("DROP TABLE graft_idx_t")
  }

  test("unsupported storage formats fail loudly") {
    val e = intercept[UnsupportedOperationException] {
      engine.sql("CREATE TABLE t1 (a INT) USING RAWFILE")
    }
    assert(e.getMessage.contains("rawfile"))
  }

  test("qualified db.table names work across databases") {
    engine.mount(sfDir)
    engine.sql("CREATE DATABASE IF NOT EXISTS graft_db2")
    engine.sql("DROP TABLE IF EXISTS graft_db2.r2")
    engine.sql(s"CREATE TABLE graft_db2.r2 USING PARQUET LOCATION '$tmp/db2_r2' AS SELECT * FROM region")
    assert(engine.sql("SELECT COUNT(*) AS c FROM graft_db2.r2").collect()(0).getLong(0) == 5)
    engine.sql("DROP TABLE graft_db2.r2")
    engine.sql("DROP DATABASE graft_db2")
  }

  test("plain queries pass through") {
    engine.mount(sfDir)
    assert(engine.sql("SELECT COUNT(*) AS c FROM region").collect()(0).getLong(0) == 5)
  }

  // The reference rejects malformed statements at plan time
  // (reference: tajo-core-tests/src/test/resources/queries/
  // TestQueryValidation/*.sql — error_groupby, invalid_limit,
  // invalid_store_format cases); the facade must fail as loudly.
  test("query validation: invalid statements fail loudly, valid ones run") {
    engine.mount(sfDir)
    intercept[Exception](engine.sql("SELECT * FROM lineitem GROUP BY l_orderkey").collect())
    intercept[Exception](engine.sql("SELECT l_orderkey FROM lineitem GROUP BY l_paerkey").collect())
    intercept[Exception](engine.sql("SELECT * FROM lineitem LIMIT l_orderkey").collect())
    intercept[UnsupportedOperationException](
      engine.sql("CREATE TABLE bad_store (name TEXT, age INT4) USING RAW"))
    assert(engine.sql("SELECT l_orderkey FROM lineitem GROUP BY l_orderkey").collect().nonEmpty)
    assert(engine.sql("SELECT * FROM lineitem LIMIT 3").collect().length == 3)
  }

  // Formats with no Spark datasource jar in this deployment mount as
  // session views over the graft.sources readers (reference storage:
  // avro/AvroScanner, sequencefile/SequenceFileScanner,
  // regex/RegexLineDeserializer).
  test("CREATE EXTERNAL TABLE USING avro/sequencefile/regex mounts reader views") {
    engine.mount(sfDir)
    val base = s"$tmp/reader_tables"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val nation = spark.table("nation")
    graft.sources.AvroSource.write(nation, s"$base/avro")
    graft.sources.SequenceFileSource.write(nation, s"$base/seq", delimiter = "\t")
    nation.selectExpr("concat_ws('|', n_nationkey, n_name, n_regionkey)")
      .write.text(s"$base/rx")

    engine.sql(s"CREATE EXTERNAL TABLE nation_avro USING avro LOCATION '$base/avro'")
    assert(engine.sql("SELECT COUNT(*) AS c FROM nation_avro").collect()(0).getLong(0) == 25)

    engine.sql(
      s"""CREATE EXTERNAL TABLE nation_seq (n_nationkey INT8, n_name TEXT, n_regionkey INT4)
         |USING sequencefile WITH ('text.delimiter'='\t') LOCATION '$base/seq'""".stripMargin)
    assert(engine.sql("SELECT SUM(n_regionkey) AS s FROM nation_seq").collect()(0).getLong(0) ==
      nation.selectExpr("SUM(n_regionkey)").collect()(0).getLong(0))

    engine.sql(
      s"""CREATE EXTERNAL TABLE nation_rx (n_nationkey INT8, n_name TEXT, n_regionkey INT4)
         |USING regex WITH ('text.regex'='^(\\d+)\\|([^|]*)\\|(\\d+)$$') LOCATION '$base/rx'""".stripMargin)
    assert(engine.sql("SELECT COUNT(*) AS c FROM nation_rx WHERE n_name IS NOT NULL")
      .collect()(0).getLong(0) == 25)

    // DROP TABLE on a reader view drops the view, not the data
    engine.sql("DROP TABLE nation_avro")
    engine.sql("DROP TABLE nation_seq")
    engine.sql("DROP TABLE nation_rx")
    assert(!spark.catalog.tableExists("nation_avro"))
    assert(new java.io.File(s"$base/avro").listFiles().nonEmpty)
  }

  // Tajo interval literals accept compact unit tokens
  // (IntervalDatum.java:44-56); Spark needs the spelled-out multi-unit form.
  test("Tajo interval literals rewrite: compact units, colon form, typed passthrough") {
    engine.mount(sfDir)
    def ts(sql: String) = engine.sql(sql).collect()(0).get(0).toString
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1d 2h 30m' AS t")
      == "2024-01-02 02:30:00.0")
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '12h' AS t")
      == "2024-01-01 12:00:00.0")
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1:30:15' AS t")
      == "2024-01-01 01:30:15.0")
    assert(ts("SELECT DATE '2024-01-01' + INTERVAL '2 yrs' AS t").startsWith("2026-01-01"))
    // Spark-typed form (bare number inside quotes) passes through untouched
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '3' DAY AS t")
      == "2024-01-04 00:00:00.0")
  }

  test("PG-style :: casts map Tajo type keywords; literals untouched") {
    engine.mount(sfDir)
    val r = engine.sql("SELECT 42::text AS s, 3.9::int4 AS i, '12::text' AS lit").collect()(0)
    assert(r.getString(0) == "42" && r.getInt(1) == 3 && r.getString(2) == "12::text")
  }

  // SIMILAR TO (SQLParser.g4 negativable_matcher) — full-string SQL-regex
  // match, rewritten onto Spark's RLIKE with anchoring.
  test("SIMILAR TO rewrites to anchored RLIKE; NOT SIMILAR TO negates") {
    engine.mount(sfDir)
    val m = engine.sql(
      "SELECT n_nationkey FROM nation WHERE n_name SIMILAR TO 'NATION[_](1|2)' ORDER BY n_nationkey")
      .collect().map(_.getInt(0)).toSeq
    assert(m == Seq(1, 2))
    // % spans, full-string anchoring: 'NATION%' matches all, '%TION_2%' too
    assert(engine.sql("SELECT COUNT(*) AS c FROM nation WHERE n_name SIMILAR TO 'NATION%'")
      .collect()(0).getLong(0) == 25)
    // names containing '1': NATION_1, NATION_10..19, NATION_21 = 12 of 25
    assert(engine.sql("SELECT COUNT(*) AS c FROM nation WHERE n_name NOT SIMILAR TO '%1%'")
      .collect()(0).getLong(0) == 25 - 12)
    // '.' is literal in SQL regex: no nation name contains a dot
    assert(engine.sql("SELECT COUNT(*) AS c FROM nation WHERE n_name SIMILAR TO 'NATION.%'")
      .collect()(0).getLong(0) == 0)
  }

  // Tajo treats double-quoted tokens as identifiers (SQL standard,
  // SQLParser.g4 identifier rule; e.g. queries/TestCaseByCases/
  // testTAJO718Case.sql uses "lineitem"). Spark wants backticks.
  test("double-quoted identifiers rewrite to backticks; quoted strings survive") {
    engine.mount(sfDir)
    val r = engine.sql(
      """SELECT "nation".n_name FROM "nation" WHERE "nation".n_nationkey = 3""").collect()
    assert(r.length == 1)
    val lit = engine.sql("""SELECT '{"a": 1}' AS j""").collect()
    assert(lit(0).getString(0) == """{"a": 1}""")
  }

  // MAP<k, v> / ARRAY<t> DDL types (SQLParser.g4 map_type/array_type;
  // TestSQLAnalyzer create_table_maptype_*.sql, positive/
  // create_table_with_array_type.sql) map recursively to Spark MAP/ARRAY.
  test("MAP and ARRAY DDL types map recursively, including nested RECORD") {
    engine.sql("DROP TABLE IF EXISTS graft_maptype_ddl")
    engine.sql(
      """CREATE TABLE graft_maptype_ddl (
        |  a TEXT, b INT4, c MAP<TEXT, RECORD (name TEXT, age INT4)>,
        |  d ARRAY<INT8>, f FLOAT8) USING PARQUET""".stripMargin)
    val sch = spark.table("graft_maptype_ddl").schema
    assert(sch("c").dataType.sql == "MAP<STRING, STRUCT<name: STRING, age: INT>>")
    assert(sch("d").dataType.sql == "ARRAY<BIGINT>")
    engine.sql(
      "INSERT INTO graft_maptype_ddl VALUES ('x', 1, map('k', named_struct('name', 'n', 'age', 9)), array(1, 2), 0.5)")
    val row = engine.sql(
      "SELECT c['k'].age AS age, d[1] AS d1 FROM graft_maptype_ddl").collect()(0)
    assert(row.getInt(0) == 9 && row.getLong(1) == 2L)
    engine.sql("DROP TABLE graft_maptype_ddl")
  }

  // Only COLUMN partitions are implemented by the reference; HASH/LIST/
  // RANGE parse but die unimplemented (SQLParser.g4
  // table_partitioning_clauses) — the engine rejects them loudly.
  test("PARTITION BY HASH/LIST/RANGE rejected; window PARTITION BY untouched") {
    intercept[UnsupportedOperationException] {
      engine.sql("CREATE TABLE g_hash (c1 INT4) PARTITION BY HASH (c1) PARTITIONS 2")
    }
    intercept[UnsupportedOperationException] {
      engine.sql("CREATE TABLE g_range (c1 INT4) PARTITION BY RANGE (c1) " +
        "(PARTITION p VALUES LESS THAN (2))")
    }
    // a window PARTITION BY over a column named `list` must not trip it
    engine.mount(sfDir)
    assert(engine.sql(
      "SELECT r_regionkey, row_number() OVER (PARTITION BY r_name ORDER BY r_regionkey) rn " +
        "FROM region").count() == 5)
  }

  test("SET TIME ZONE accepts PG numeric offsets") {
    engine.sql("SET TIME ZONE -7")
    assert(spark.conf.get("spark.sql.session.timeZone") == "GMT-7")
    engine.sql("SET TIME ZONE 9")
    assert(spark.conf.get("spark.sql.session.timeZone") == "GMT+9")
    engine.sql("SET TIME ZONE 'UTC'")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  // SET TIME ZONE DEFAULT/LOCAL restores the session's startup zone
  // (SQLParser.g4 set_statement; TestSQLAnalyzer settimezone3.sql).
  test("SET TIME ZONE DEFAULT restores the startup zone") {
    val startup = spark.conf.get("spark.sql.session.timeZone")
    engine.sql("SET TIME ZONE 'Asia/Seoul'")
    assert(spark.conf.get("spark.sql.session.timeZone") == "Asia/Seoul")
    engine.sql("SET TIME ZONE DEFAULT")
    assert(spark.conf.get("spark.sql.session.timeZone") == startup)
    engine.sql("SET TIME ZONE 'GMT+3'")
    engine.sql("SET TIME ZONE LOCAL")
    assert(spark.conf.get("spark.sql.session.timeZone") == startup)
  }

  // Bit-string / binary-string / zoned-time spellings from the reference
  // grammar (SQLParser.g4 data_type; TestSQLAnalyzer positive/
  // create_table_8.sql) map onto Spark's BINARY / TIME / TIMESTAMP.
  test("BIT/VARBINARY/TIMETZ type family maps to BINARY/TIME/TIMESTAMP") {
    engine.sql("DROP TABLE IF EXISTS graft_bit_ddl")
    engine.sql(
      """CREATE TABLE graft_bit_ddl (
        |  b0 bit, b1 BIT(10), b2 bit varying, b3 bit VARYING(10),
        |  b4 binary(10), b5 varbinary(10), b6 binary Varying(10), b7 blob,
        |  t0 timetz, t1 time With time zone,
        |  ts0 timesTamptz, ts1 timestamp with time zone) USING PARQUET""".stripMargin)
    val sch = spark.table("graft_bit_ddl").schema
    Seq("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7")
      .foreach(c => assert(sch(c).dataType.sql == "BINARY", c))
    Seq("t0", "t1").foreach { c =>
      val sql = sch(c).dataType.sql
      assert(sql.startsWith("TIME") && !sql.startsWith("TIMESTAMP"), s"$c: $sql")
    }
    assert(sch("ts0").dataType.sql == "TIMESTAMP" && sch("ts1").dataType.sql == "TIMESTAMP")
    engine.sql("DROP TABLE graft_bit_ddl")
  }

  // INSERT [OVERWRITE] INTO reader-backed tables (avro/sequencefile/
  // rcfile): the reference's InsertRowsExec writes through any registered
  // tablespace serializer; the engine writes through the graft.sources
  // writers into the table directory (staged, unique-per-insert prefix).
  test("INSERT INTO reader-format tables: append, overwrite, column list") {
    engine.sql("DROP TABLE IF EXISTS rc_ins")
    engine.sql("CREATE TABLE rc_ins (id INT4, name TEXT) USING rcfile")
    engine.sql("INSERT INTO rc_ins VALUES (1, 'ann'), (2, 'bob')")
    engine.sql("INSERT INTO rc_ins SELECT 3, 'cho'")
    assert(engine.sql("SELECT id, name FROM rc_ins ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "ann"), (2, "bob"), (3, "cho")))
    // explicit column list: missing columns pad NULL (the engine's
    // documented smaller-columns semantics)
    engine.sql("INSERT INTO rc_ins (id) VALUES (4)")
    val r4 = engine.sql("SELECT name FROM rc_ins WHERE id = 4").collect()
    assert(r4.length == 1 && r4(0).isNullAt(0))
    engine.sql("INSERT OVERWRITE INTO rc_ins VALUES (9, 'zed')")
    assert(engine.sql("SELECT id, name FROM rc_ins").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((9, "zed")))
    engine.sql("DROP TABLE rc_ins")
  }

  test("INSERT INTO sequencefile and avro reader tables round-trips") {
    engine.sql("DROP TABLE IF EXISTS seq_ins")
    engine.sql(
      "CREATE TABLE seq_ins (k INT4, v TEXT) USING sequencefile WITH ('text.delimiter'='|')")
    engine.sql("INSERT INTO seq_ins VALUES (7, 'stale')")
    engine.sql("INSERT OVERWRITE INTO seq_ins VALUES (1, 'xy'), (2, 'zz')")
    engine.sql("INSERT INTO seq_ins SELECT 3, 'ww'")
    assert(engine.sql("SELECT k, v FROM seq_ins ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "xy"), (2, "zz"), (3, "ww")))
    engine.sql("DROP TABLE seq_ins")

    engine.sql("DROP TABLE IF EXISTS avro_ins")
    engine.sql("CREATE TABLE avro_ins (k INT8, v TEXT) USING avro")
    engine.sql("INSERT INTO avro_ins VALUES (10, 'a')")
    engine.sql("INSERT INTO avro_ins VALUES (20, 'b')")
    assert(engine.sql("SELECT k, v FROM avro_ins ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((10L, "a"), (20L, "b")))
    engine.sql("DROP TABLE avro_ins")
  }

  test("TRUNCATE a reader-format table clears data, keeps schema") {
    engine.sql("DROP TABLE IF EXISTS rc_trunc")
    engine.sql("CREATE TABLE rc_trunc (id INT4, name TEXT) USING rcfile")
    engine.sql("INSERT INTO rc_trunc VALUES (1, 'a'), (2, 'b')")
    assert(engine.sql("SELECT * FROM rc_trunc").count() == 2)
    engine.sql("TRUNCATE rc_trunc")
    assert(engine.sql("SELECT * FROM rc_trunc").count() == 0)
    engine.sql("INSERT INTO rc_trunc VALUES (3, 'c')")
    assert(engine.sql("SELECT id FROM rc_trunc").collect()(0).getInt(0) == 3)
    engine.sql("DROP TABLE rc_trunc")
  }

  test("INSERT INTO LOCATION USING a reader format writes the directory") {
    val dir = s"$tmp/loc_avro"
    engine.mount(sfDir)
    engine.sql(s"INSERT OVERWRITE INTO LOCATION '$dir' USING avro SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5")
    val back = graft.sources.AvroSource.read(spark, dir)
    assert(back.count() == 5)
    engine.sql("DROP TABLE IF EXISTS loc_avro_read")
    engine.sql(s"CREATE EXTERNAL TABLE loc_avro_read (n_nationkey INT8, n_name TEXT) USING avro LOCATION '$dir'")
    assert(engine.sql("SELECT n_name FROM loc_avro_read ORDER BY n_nationkey LIMIT 1")
      .collect()(0).getString(0) == "NATION_0")
    engine.sql("DROP TABLE loc_avro_read")
  }

  // The reference resolves TABLESPACE names against registered tablespaces
  // and rejects unknown ones (TestCreateTable/negative/
  // create_table_on_absent_tablespace.sql); this deployment has one
  // warehouse, so every TABLESPACE clause is an absent tablespace.
  test("CREATE TABLE ... TABLESPACE rejected loudly") {
    val e = intercept[UnsupportedOperationException] {
      engine.sql("CREATE TABLE g_ts (x TEXT) TABLESPACE unknown")
    }
    assert(e.getMessage.contains("tablespace 'unknown'"))
  }
}
