package graft.queries

import graft.QueryDef
import graft.QueryDef.df
import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layer parity: CTAS / INSERT / column-partitioned writes /
  * text (CSV) serde options / self-describing JSON — the reference's
  * StoreTableExec, InsertRowsExec, ColPartitionStoreExec and
  * DelimitedTextFile/JSON scanners (reference: tajo-core/src/main/java/org/
  * apache/tajo/engine/planner/physical/StoreTableExec.java,
  * ColPartitionStoreExec.java; tajo-storage/tajo-storage-hdfs/src/main/java/
  * org/apache/tajo/storage/text/DelimitedTextFile.java, json/).
  *
  * Each query writes to a scratch dir and reads the result back, so the
  * DuckDB oracle (which sees only the source tables) verifies the full
  * write→read round trip. Writes are tiny aggregates or sf-bounded tables.
  */
object StorageQueries {

  // per-JVM namespace: two concurrent sessions (bench + verify on one box)
  // must not clobber each other's staged tables mid-read — the same
  // defect class the RENAME COLUMN staging fix closed with a UUID suffix.
  // Stable within the JVM so write-then-read inside one query holds; the
  // shutdown hook reclaims the whole tree so repeated runs can't fill
  // /tmp with one parquet forest per JVM.
  private val jvmId = java.util.UUID.randomUUID().toString.take(8)
  private val scratchRoot =
    s"${System.getProperty("java.io.tmpdir")}/graft_store-$jvmId"
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratchRoot))))
  private def scratch(name: String): String = s"$scratchRoot/$name"

  // CTAS (CREATE TABLE AS SELECT ... USING PARQUET) + read back.
  private val qCtas = df("q_store_ctas",
    (spark, dir) => {
      val out = scratch("ctas_parquet")
      spark.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
          |FROM orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin)
        .write.mode(SaveMode.Overwrite).parquet(out)
      spark.read.parquet(out).orderBy("o_orderstatus", "o_orderpriority")
    },
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
           |FROM orders GROUP BY o_orderstatus, o_orderpriority
           |ORDER BY o_orderstatus, o_orderpriority""".stripMargin))

  // INSERT INTO (append) semantics: overwrite with slice A, append slice B,
  // read back the union.
  private val qInsert = df("q_store_insert_append",
    (spark, dir) => {
      val out = scratch("insert_parquet")
      val nation = Tables.table(spark, dir, "nation")
      nation.filter(col("n_nationkey") < 10)
        .write.mode(SaveMode.Overwrite).parquet(out)
      nation.filter(col("n_nationkey") >= 10)
        .write.mode(SaveMode.Append).parquet(out)
      spark.read.parquet(out).orderBy("n_nationkey")
    },
    Some("SELECT * FROM nation ORDER BY n_nationkey"))

  // Hive-style column-partitioned write + partition-pruned read
  // (ColPartitionStoreExec + PartitionedTableRewriter equivalent; the read
  // back scans only event_type=click/purchase directories).
  private val qPartitioned = df("q_store_partitioned",
    (spark, dir) => {
      val out = scratch("events_by_type")
      Tables.table(spark, dir, "events")
        .write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(out)
      spark.read.parquet(out)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(count("*").as("cnt"),
          sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
           |FROM events WHERE event_type IN ('click', 'purchase')
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  // Dynamic partition pruning: the selective filter lives on the DIM side,
  // so only runtime pruning (Spark's DPP — broadcast the filtered dim keys
  // into the fact scan's partition filter) can skip the fact's partition
  // directories; static pruning can't see through the join. THE 100 TB
  // star-join discipline — at scale this is the difference between
  // scanning 2 partitions and scanning all of them. Plan pinned in
  // PlanAuditSpec (dynamicpruning expression present in the fact scan).
  private val qDpp = df("q_store_dpp",
    (spark, dir) => {
      import spark.implicits._
      val out = scratch("orders_by_priority")
      Tables.table(spark, dir, "orders")
        .write.mode(SaveMode.Overwrite).partitionBy("o_orderpriority").parquet(out)
      val fact = spark.read.parquet(out)
      // the dim must be a REAL scan (not a constant-folded LocalRelation),
      // or the selective filter disappears before DPP's heuristic sees it
      val dimOut = scratch("priority_dim")
      Seq(("1-URGENT", 1L), ("2-HIGH", 1L), ("3-MEDIUM", 0L),
        ("4-NOT SPECIFIED", 0L), ("5-LOW", 0L)).toDF("pri", "flag")
        .write.mode(SaveMode.Overwrite).parquet(dimOut)
      val dim = spark.read.parquet(dimOut)
      fact.join(dim.filter(col("flag") === 1L), col("o_orderpriority") === col("pri"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(38,6)")).cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH dim(pri, flag) AS (VALUES
           |  ('1-URGENT', 1), ('2-HIGH', 1), ('3-MEDIUM', 0),
           |  ('4-NOT SPECIFIED', 0), ('5-LOW', 0))
           |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
           |FROM orders JOIN dim ON o_orderpriority = pri
           |WHERE flag = 1
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // Delimited-text serde with Tajo's text.delimiter / text.null options
  // (StorageConstants.java:45-46) → Spark csv sep/nullValue round trip.
  private val qCsv = df("q_store_csv_text",
    (spark, dir) => {
      val out = scratch("csv_pipe")
      Tables.table(spark, dir, "customer")
        .withColumn("c_mktsegment",
          when(col("c_mktsegment") === "BUILDING", lit(null: String))
            .otherwise(col("c_mktsegment")))
        .write.mode(SaveMode.Overwrite)
        .option("sep", "|").option("nullValue", "\\N")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(out)
      spark.read
        .schema(Tables.table(spark, dir, "customer").schema)
        .option("sep", "|").option("nullValue", "\\N")
        .csv(out)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal").cast("decimal(28,6)").cast("double").as("acctbal"),
          col("c_mktsegment"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_nationkey,
           |  CAST(CAST(c_acctbal AS DECIMAL(28,6)) AS DOUBLE) AS acctbal,
           |  CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS c_mktsegment
           |FROM customer ORDER BY c_custkey""".stripMargin))

  // Multi-char text delimiter + non-default null token THROUGH THE DDL
  // PATH: the reference's DelimitedTextFile accepts multibyte delimiters
  // and a configurable null literal (tajo-storage/tajo-storage-hdfs/src/
  // main/java/org/apache/tajo/storage/text/DelimitedTextFile.java; props
  // StorageConstants.java:45-46). q_store_csv_text covers the single-char
  // round trip via DataFrame options; this one proves the Tajo DDL
  // spelling (`USING TEXT WITH ('text.delimiter'='~|~', 'text.null'=
  // '@NULL@')`) maps onto Spark's uniVocity multi-char `sep` and
  // `nullValue`, and that the catalog read-back restores the NULLs.
  // WRITE leg (VERDICT r6 #6 — DelimitedTextFile also WRITES multibyte
  // text): an engine-level INSERT INTO the table serializes new rows
  // through the catalog's multi-char delimiter + null token, and the
  // final read-back parses the engine-written files alongside the
  // original ones — the null token round-trips both directions.
  private val qCsvMultichar = df("q_store_csv_multichar",
    (spark, dir) => {
      val out = scratch("csv_multichar")
      Tables.table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"),
          when(col("s_nationkey") % 5 === 0, lit(null: String))
            .otherwise(col("s_name")).as("alt_name"),
          col("s_nationkey"))
        .write.mode(SaveMode.Overwrite)
        .option("sep", "~|~").option("nullValue", "@NULL@")
        .csv(out)
      val engine = new graft.engine.GraftEngine(spark)
      engine.sql("DROP TABLE IF EXISTS graft_csv_multichar")
      engine.sql(
        s"""CREATE EXTERNAL TABLE graft_csv_multichar (
           |  s_suppkey INT8, s_name TEXT, alt_name TEXT, s_nationkey INT4
           |) USING TEXT WITH ('text.delimiter'='~|~', 'text.null'='@NULL@')
           |LOCATION '$out'""".stripMargin)
      Tables.table(spark, dir, "supplier")
        .filter(col("s_suppkey") < 50)
        .createOrReplaceTempView("graft_mc_src")
      engine.sql(
        """INSERT INTO graft_csv_multichar
          |SELECT s_suppkey + 1000000, s_name,
          |  CASE WHEN s_nationkey % 5 = 0 THEN NULL ELSE s_name END,
          |  s_nationkey
          |FROM graft_mc_src""".stripMargin)
      engine.sql(
        """SELECT s_suppkey, s_name, alt_name, s_nationkey
          |FROM graft_csv_multichar ORDER BY s_suppkey""".stripMargin)
    },
    Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           |  CASE WHEN s_nationkey % 5 = 0 THEN NULL ELSE s_name END AS alt_name,
           |  s_nationkey
           |FROM supplier
           |UNION ALL
           |SELECT CAST(s_suppkey + 1000000 AS BIGINT), s_name,
           |  CASE WHEN s_nationkey % 5 = 0 THEN NULL ELSE s_name END,
           |  s_nationkey
           |FROM supplier WHERE s_suppkey < 50
           |ORDER BY s_suppkey""".stripMargin))

  // Self-describing JSON: write line-JSON without a schema, read back with
  // inference (TableDesc.schema optional, reference:
  // tajo-catalog/tajo-catalog-common/src/main/java/org/apache/tajo/catalog/TableDesc.java:40).
  private val qJsonSelfDesc = df("q_store_json_selfdesc",
    (spark, dir) => {
      val out = scratch("json_supplier")
      Tables.table(spark, dir, "supplier")
        .write.mode(SaveMode.Overwrite).json(out)
      spark.read.json(out)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal").cast("decimal(28,6)").cast("double").as("acctbal"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, s_nationkey,
           |  CAST(CAST(s_acctbal AS DECIMAL(28,6)) AS DOUBLE) AS acctbal
           |FROM supplier ORDER BY s_suppkey""".stripMargin))

  // ORC round trip (reference tajo-storage-hdfs orc/).
  private val qOrc = df("q_store_orc",
    (spark, dir) => {
      val out = scratch("orc_part")
      Tables.table(spark, dir, "part")
        .write.mode(SaveMode.Overwrite).orc(out)
      spark.read.orc(out)
        .groupBy("p_brand")
        .agg(count("*").as("cnt"),
          sum(col("p_retailprice").cast("decimal(38,4)")).cast("double").as("retail"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(p_retailprice AS DECIMAL(38,4))) AS DOUBLE) AS retail
           |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  // Nested RECORD round trip: build a struct column, write parquet, read
  // back with dot-path projection (LogicalPlanner path projection,
  // reference: tajo-plan/src/main/java/org/apache/tajo/plan/LogicalPlanner.java:579).
  private val qNested = df("q_store_nested_record",
    (spark, dir) => {
      val out = scratch("nested_events")
      Tables.table(spark, dir, "events")
        .select(col("event_id"),
          struct(col("user_id").as("uid"), col("event_type").as("etype"),
            struct(col("value").as("v"), col("props").as("raw")).as("payload")).as("rec"))
        .write.mode(SaveMode.Overwrite).parquet(out)
      spark.read.parquet(out)
        .select(col("event_id"), col("rec.uid").as("uid"),
          col("rec.payload.v").as("v"),
          get_json_object(col("rec.payload.raw"), "$.k").cast("bigint").as("k"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id AS uid, value AS v,
           |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  // RECORD nested-type DDL front door: the Tajo dialect declares nested
  // schemas as RECORD (a TEXT, b RECORD (...)) (reference:
  // tajo-core-tests/src/test/resources/queries/TestSelectNestedRecord/
  // sample0_ddl.sql, sample2_ddl.sql; planner path tajo-plan/src/main/java/
  // org/apache/tajo/plan/LogicalPlanner.java:579). GraftEngine.rewriteDdl
  // maps it to Spark STRUCT<...>; this query proves the whole path: Tajo
  // DDL text -> CREATE EXTERNAL TABLE over line-JSON -> dot-path SELECT.
  private val qNestedDdl = df("q_ddl_nested_record",
    (spark, dir) => {
      val out = scratch("nested_ddl_json")
      Tables.table(spark, dir, "events")
        .select(col("event_id"),
          struct(col("user_id").as("uid"), col("event_type").as("etype"),
            struct(col("value").as("v"), col("props").as("raw")).as("payload")).as("rec"))
        .write.mode(SaveMode.Overwrite).json(out)
      val engine = new graft.engine.GraftEngine(spark)
      engine.sql("DROP TABLE IF EXISTS graft_nested_ddl")
      engine.sql(
        s"""CREATE EXTERNAL TABLE graft_nested_ddl (
           |  event_id INT8,
           |  rec RECORD (uid INT8, etype TEXT, payload RECORD (v FLOAT8, raw TEXT))
           |) USING JSON LOCATION '$out'""".stripMargin)
      engine.sql(
        """SELECT event_id, rec.uid AS uid, rec.etype AS etype,
          |  CAST(CAST(rec.payload.v AS DECIMAL(28,6)) AS DOUBLE) AS v,
          |  CAST(get_json_object(rec.payload.raw, '$.k') AS BIGINT) AS k
          |FROM graft_nested_ddl ORDER BY event_id""".stripMargin)
    },
    Some("""SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS uid,
           |  event_type AS etype,
           |  CAST(CAST(value AS DECIMAL(28,6)) AS DOUBLE) AS v,
           |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  // Partition lifecycle management through the Tajo ALTER TABLE dialect
  // (reference grammar SQLParser.g4:1628-1632, executed by master/exec/
  // DDLExecutor.java): INSERT into one partition, ADD PARTITION pointing at
  // external data, REPAIR PARTITION to discover files dropped into the
  // table dir, DROP PARTITION to retire one — then read back through the
  // catalog, which must see exactly {click, purchase, view}. The DuckDB
  // oracle sees only the source table, so the compare proves every
  // metadata operation actually routed the right files.
  private val qPartitionMgmt = df("q_store_partition_mgmt",
    (spark, dir) => {
      val engine = new graft.engine.GraftEngine(spark)
      val tableDir = scratch("part_mgmt")
      val extDir = scratch("part_mgmt_ext")
      engine.sql("DROP TABLE IF EXISTS graft_part_mgmt")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      new java.io.File(tableDir).mkdirs() // CREATE TABLE scans LOCATION
      val events = Tables.table(spark, dir, "events")
        .select("user_id", "value", "event_type")
      engine.sql(
        s"""CREATE TABLE graft_part_mgmt (user_id INT8, value FLOAT8)
           |USING PARQUET PARTITION BY COLUMN (event_type TEXT)
           |LOCATION '$tableDir'""".stripMargin)
      // 1. regular dynamic-partition INSERT ('click' and a doomed 'error')
      events.filter(col("event_type").isin("click", "error"))
        .createOrReplaceTempView("graft_pm_src")
      engine.sql("INSERT INTO graft_part_mgmt SELECT user_id, value, event_type FROM graft_pm_src")
      // 2. ADD PARTITION over external data written elsewhere
      events.filter(col("event_type") === "purchase").drop("event_type")
        .write.mode(SaveMode.Overwrite).parquet(extDir)
      engine.sql(s"ALTER TABLE graft_part_mgmt ADD IF NOT EXISTS PARTITION (event_type = 'purchase') LOCATION '$extDir'")
      // 3. files dropped straight into the table dir -> REPAIR PARTITION
      events.filter(col("event_type") === "view").drop("event_type")
        .write.mode(SaveMode.Overwrite).parquet(s"$tableDir/event_type=view")
      engine.sql("ALTER TABLE graft_part_mgmt REPAIR PARTITION")
      // 4. retire the 'error' partition
      engine.sql("ALTER TABLE graft_part_mgmt DROP IF EXISTS PARTITION (event_type = 'error')")
      spark.table("graft_part_mgmt")
        .groupBy("event_type")
        .agg(count("*").as("cnt"),
          sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
           |FROM events WHERE event_type IN ('click', 'purchase', 'view')
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  // JDBC tablespace equivalent (reference: tajo-storage/tajo-storage-jdbc/
  // .../JdbcTablespace.java): write to an embedded Derby database via
  // df.write.jdbc, read back via spark.read.jdbc — Catalyst pushes filters
  // to the remote SQL on read. The oracle sees only the source table, so
  // the compare proves the full RDBMS round trip.
  private val qJdbc = df("q_store_jdbc",
    (spark, dir) => {
      val url = "jdbc:derby:memory:graftdb;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      Tables.table(spark, dir, "nation")
        .write.mode(SaveMode.Overwrite).jdbc(url, "nation_jdbc", props)
      spark.read.jdbc(url, "nation_jdbc", props)
        .filter(col("n_nationkey") >= 5) // pushed into the remote query
        .orderBy("n_nationkey")
    },
    Some("SELECT * FROM nation WHERE n_nationkey >= 5 ORDER BY n_nationkey"))

  // JDBC DSv2 pushdown: aggregate + top-N composed into the REMOTE SQL —
  // the reference's SQLBuilder discipline (tajo-storage/tajo-storage-jdbc/
  // .../SQLBuilder.java builds projection/predicate/groupby/limit remote
  // statements). Spark's V1 jdbc() path pushes only filters; the DSv2
  // JDBCTableCatalog with pushDownAggregate/pushDownLimit pushes the
  // GROUP BY aggregation and the ORDER BY+LIMIT into Derby itself —
  // at scale, the difference between moving |groups| rows and moving the
  // whole remote table through a single JDBC pipe. GraftDerbyDialect
  // supplies the FETCH FIRST clause Derby needs for the limit half.
  // PlanAuditSpec pins PushedAggregates/PushedGroupByExpressions in the
  // v2 scan so a silent fallback to full-table pull fails CI.
  private val qJdbcAgg = df("q_store_jdbc_agg",
    (spark, dir) => {
      org.apache.spark.sql.jdbc.GraftDerbyDialect.register()
      val url = "jdbc:derby:memory:graftdb_agg;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      // bounded slice regardless of sf: the Derby side is the fixture, the
      // pushdown plan shape is the subject
      Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .filter(col("o_orderkey") <= 2000)
        .write.mode(SaveMode.Overwrite)
        // Spark's default Derby mapping for StringType is CLOB, which Derby
        // refuses in GROUP BY — the remote aggregate would silently fall
        // back to a full-table pull; VARCHAR keeps the pushdown eligible
        .option("createTableColumnTypes", "o_orderstatus VARCHAR(16)")
        .jdbc(url, "orders_jdbc", props)
      spark.conf.set("spark.sql.catalog.graftderby",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
      spark.conf.set("spark.sql.catalog.graftderby.url", url)
      spark.conf.set("spark.sql.catalog.graftderby.driver",
        "org.apache.derby.jdbc.EmbeddedDriver")
      spark.conf.set("spark.sql.catalog.graftderby.pushDownAggregate", "true")
      spark.conf.set("spark.sql.catalog.graftderby.pushDownLimit", "true")
      // Derby stores the unquoted created name upper-cased; the V2 catalog
      // quotes identifiers, so the Spark-side name must match that case
      val agg = spark.sql(
        """SELECT o_orderstatus, COUNT(*) AS cnt, MAX(o_orderkey) AS max_key
          |FROM graftderby.`ORDERS_JDBC`
          |GROUP BY o_orderstatus""".stripMargin)
      val topn = spark.sql(
        """SELECT o_orderkey, o_orderstatus
          |FROM graftderby.`ORDERS_JDBC` ORDER BY o_orderkey LIMIT 10""".stripMargin)
      // one result set proving both pushdowns end-to-end: the aggregate
      // rows plus the top-N rows re-aggregated into a comparable shape
      agg.unionAll(
          topn.groupBy("o_orderstatus")
            .agg(count(lit(1)).as("cnt"), max(col("o_orderkey")).as("max_key")))
        .orderBy("o_orderstatus", "cnt")
    },
    Some("""WITH bounded AS (
           |  SELECT * FROM orders WHERE o_orderkey <= 2000
           |), agg AS (
           |  SELECT o_orderstatus, COUNT(*) AS cnt, MAX(o_orderkey) AS max_key
           |  FROM bounded GROUP BY o_orderstatus
           |), topn AS (
           |  SELECT o_orderkey, o_orderstatus FROM bounded
           |  ORDER BY o_orderkey LIMIT 10
           |), tagg AS (
           |  SELECT o_orderstatus, COUNT(*) AS cnt, MAX(o_orderkey) AS max_key
           |  FROM topn GROUP BY o_orderstatus
           |)
           |SELECT * FROM (SELECT * FROM agg UNION ALL SELECT * FROM tagg)
           |ORDER BY o_orderstatus, cnt""".stripMargin))

  // Bucketed co-located join: both sides written bucketBy(8) on the join
  // key, so the sort-merge join reads bucket-aligned files with NO shuffle
  // exchange on either input (BucketingSpec asserts the plan). This is the
  // Spark counterpart of pre-partitioned co-located joins at 100 TB scale:
  // the expensive fact-fact shuffle is paid once at write time and
  // amortized over every subsequent join on the key.
  private val qBucketedJoin = df("q_store_bucketed_join",
    (spark, dir) => {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
      // repartition on the bucket key first: the source is a single row
      // group (one scan task), so without it the bucketed write runs
      // single-threaded and emits one file per bucket per task; aligned
      // repartitioning gives 8 parallel writers and one file per bucket.
      Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_orderstatus") // prune before the write
        .repartition(8, col("o_orderkey"))
        .write.mode(SaveMode.Overwrite)
        .option("path", scratch("bucketed_orders"))
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_b")
      Tables.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .repartition(8, col("l_orderkey"))
        .write.mode(SaveMode.Overwrite)
        .option("path", scratch("bucketed_lineitem"))
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_b")
      spark.table("graft_orders_b").hint("merge")
        .join(spark.table("graft_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count("*").as("cnt"),
          sum(col("l_extendedprice").cast("decimal(38,4)")).cast("double").as("volume"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS volume
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  // CREATE INDEX / indexed range scan (the reference's StoreIndexExec +
  // BSTIndexScanExec pair, reference: tajo-core/.../physical/
  // BSTIndexScanExec.java): the engine rewrites the table range-sorted on
  // the key so row-group min/max stats satisfy the range predicate with
  // data skipping. The DuckDB oracle sees only the source table, so the
  // compare proves the sorted rebuild lost and duplicated nothing.
  private val qIndex = df("q_store_index",
    (spark, dir) => {
      val engine = new graft.engine.GraftEngine(spark)
      val tableDir = scratch("idx_orders")
      engine.sql("DROP TABLE IF EXISTS graft_idx_orders")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      engine.sql(
        s"""CREATE TABLE graft_idx_orders USING PARQUET LOCATION '$tableDir'
           |AS SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders""".stripMargin)
      engine.sql("CREATE INDEX idx_orders_cust ON graft_idx_orders (o_custkey)")
      engine.sql(
        """SELECT o_custkey, COUNT(*) AS cnt,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
          |FROM graft_idx_orders WHERE o_custkey BETWEEN 100 AND 200
          |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
    },
    Some("""SELECT o_custkey, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
           |FROM orders WHERE o_custkey BETWEEN 100 AND 200
           |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin))

  // Avro round trip through graft.sources.AvroSource (avro-core jars only —
  // the spark-avro connector is absent from this container; reference:
  // tajo-storage-hdfs/.../avro/AvroScanner.java, AvroAppender.java). The
  // oracle sees only the source table, so the compare proves the container
  // files lost and duplicated nothing, including the timestamp-free
  // numeric columns' exact values.
  private val qAvro = df("q_store_avro",
    (spark, dir) => {
      val out = scratch("avro_supplier")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      graft.sources.AvroSource.write(Tables.table(spark, dir, "supplier"), out)
      graft.sources.AvroSource.read(spark, out)
        .groupBy("s_nationkey")
        .agg(count("*").as("cnt"),
          sum(col("s_acctbal").cast("decimal(38,4)")).cast("double").as("total"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT s_nationkey, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(s_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS total
           |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin))

  // SequenceFile round trip (rows as delimited Text values, the
  // reference's sequencefile tablespace text serde).
  private val qSeqFile = df("q_store_seqfile",
    (spark, dir) => {
      val out = scratch("seqfile_supplier")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val src = Tables.table(spark, dir, "supplier")
      graft.sources.SequenceFileSource.write(src, out)
      graft.sources.SequenceFileSource.read(spark, out, src.schema)
        .groupBy("s_nationkey")
        .agg(count("*").as("cnt"),
          sum(col("s_acctbal").cast("decimal(38,4)")).cast("double").as("total"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT s_nationkey, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(s_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS total
           |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin))

  // RCFile round trip (record-columnar container, text serde — the
  // reference bundles this format; hive-exec jars carry the same
  // reader/writer here).
  private val qRcFile = df("q_store_rcfile",
    (spark, dir) => {
      val out = scratch("rcfile_supplier")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val src = Tables.table(spark, dir, "supplier")
      graft.sources.RCFileSource.write(src, out)
      graft.sources.RCFileSource.read(spark, out, src.schema)
        .groupBy("s_nationkey")
        .agg(count("*").as("cnt"), min("s_name").as("min_name"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT s_nationkey, COUNT(*) AS cnt, MIN(s_name) AS min_name
           |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin))

  // Regex-projected text scan (the reference's regex tablespace): parse a
  // pipe-delimited text export back through capture groups.
  private val qRegex = df("q_store_regex",
    (spark, dir) => {
      val out = scratch("regex_supplier")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val src = Tables.table(spark, dir, "supplier")
      src.select(concat_ws("|", src.columns.map(c => col(c).cast("string")): _*))
        .write.text(out)
      graft.sources.RegexTextSource.read(spark, out,
        "^([^|]*)\\|([^|]*)\\|([^|]*)\\|([^|]*)$", src.schema)
        .groupBy("s_nationkey")
        .agg(count("*").as("cnt"), max("s_name").as("max_name"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT s_nationkey, COUNT(*) AS cnt, MAX(s_name) AS max_name
           |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin))

  // INSERT INTO a reader-backed table (rcfile) — the reference's
  // InsertRowsExec writes through any registered tablespace serializer
  // (reference: tajo-core/.../physical/InsertRowsExec.java); here the
  // engine runs the query distributed, writes container files through the
  // graft.sources writer into a staged dir, and promotes them under a
  // unique per-insert prefix (append never rewrites existing files). Two
  // appends re-read as the full union.
  private val qInsertReader = df("q_store_insert_reader",
    (spark, dir) => {
      val engine = new graft.engine.GraftEngine(spark)
      engine.sql("DROP TABLE IF EXISTS graft_rc_insert")
      Tables.table(spark, dir, "nation").createOrReplaceTempView("graft_rc_src")
      engine.sql("CREATE TABLE graft_rc_insert (n_nationkey INT4, n_name TEXT) USING rcfile")
      engine.sql("INSERT INTO graft_rc_insert SELECT n_nationkey, n_name FROM graft_rc_src WHERE n_nationkey < 10")
      engine.sql("INSERT INTO graft_rc_insert SELECT n_nationkey, n_name FROM graft_rc_src WHERE n_nationkey >= 10")
      engine.sql("SELECT n_nationkey, n_name FROM graft_rc_insert ORDER BY n_nationkey")
    },
    Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"))

  // RawFile round trip — the reference's binary row format
  // (tajo-storage-hdfs rawfile/DirectRawFileWriter.java). The reference
  // REJECTS `USING RAW` in user DDL (PreLogicalPlanVerifier.java:196 —
  // it's the internal local/intermediate representation), and so does
  // GraftEngine; the format itself round-trips through the
  // graft.sources.RawFileSource API, including dates (julian days) and
  // timestamps (julian micros). Orders exercises int8/text/float8/date.
  private val qRawFile = df("q_store_rawfile",
    (spark, dir) => {
      val out = scratch("rawfile_orders")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val src = Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority")
      graft.sources.RawFileSource.write(src, out)
      graft.sources.RawFileSource.read(spark, out, src.schema)
        .groupBy("o_orderpriority")
        .agg(count("*").as("cnt"),
          sum(col("o_totalprice").cast("decimal(38,4)")).cast("double").as("total"),
          min("o_orderdate").as("first_date"),
          max(col("o_orderkey").cast("bigint")).as("max_key"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS cnt,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total,
           |  MIN(o_orderdate) AS first_date,
           |  CAST(MAX(o_orderkey) AS BIGINT) AS max_key
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // WebDataset-style tar shards (graft.sources.TarShards): write the
  // documents table into 8 ustar archives, read them back through the
  // binaryFile source with checksum-verified header parsing, and compare
  // every member byte-for-byte (md5 of the text) plus the deterministic
  // pmod shard assignment against the source table.
  private val qTarShards = df("q_store_tar_shards",
    (spark, dir) => {
      val out = scratch("tar_shards")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val docs = Tables.table(spark, dir, "documents")
      graft.sources.TarShards.write(docs, "doc_id", "text", out, shards = 8)
      graft.sources.TarShards.read(spark, out)
        .select(col("doc_id"), col("shard").cast("bigint").as("shard"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, doc_id % 8 AS shard, md5(text) AS text_md5
           |FROM documents ORDER BY doc_id""".stripMargin))

  // Z-order clustering (Layout.zorderWrite): lineitem range-laid by the
  // (l_partkey, l_suppkey) morton code. The oracle recomputes the SAME
  // pure-integer morton arithmetic from the source table and aggregates
  // per code bucket — a single interleave-term deviation, or any row lost
  // in the rewrite, hash-mismatches. The two-dimensional row-group
  // skipping payoff is pinned in LayoutSpec.
  private val qZorder = df("q_store_zorder",
    (spark, dir) => {
      import graft.operators.Layout
      val li = Tables.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      val back = Layout.zorderWrite(li, "l_partkey", "l_suppkey",
        scratch("zorder_lineitem"), files = 8)
      // recompute the code from the READ-BACK data (content-preserving
      // rewrite => identical stats); the oracle spells the same arithmetic
      // with scalar subqueries over the source table
      val stats = Layout.zStats(back, "l_partkey", "l_suppkey")
      back.select(expr(Layout.scaledMortonSql("l_partkey", "l_suppkey", stats)).as("z"),
          col("l_orderkey"))
        .groupBy(expr("z DIV 4096").as("zb"))
        .agg(count(lit(1)).as("n"), sum(col("z")).as("sum_z"),
          sum(col("l_orderkey")).as("sum_ok"))
        .orderBy("zb")
    },
    Some {
      def mm(f: String, c: String) = s"(SELECT CAST($f($c) AS BIGINT) FROM lineitem)"
      def scaled(c: String) =
        s"((($c - ${mm("MIN", c)}) * 255) // GREATEST(1, ${mm("MAX", c)} - ${mm("MIN", c)}))"
      val z = graft.operators.Layout.mortonSql(
        scaled("l_partkey"), scaled("l_suppkey"), bits = 8, spark = false)
      s"""WITH coded AS (
         |  SELECT $z AS z, l_orderkey FROM lineitem
         |)
         |SELECT z // 4096 AS zb, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(z) AS BIGINT) AS sum_z, CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok
         |FROM coded GROUP BY 1 ORDER BY zb""".stripMargin
    })

  // 3-dim Z-order (Layout.zorderWriteN): the same morton discipline over
  // (l_partkey, l_suppkey, l_quantity) — each added key dilutes the
  // per-dimension resolution (3 dims x 8 bits = 24-bit codes) but every
  // key prunes; LayoutSpec measures the per-dimension skip ratios. The
  // oracle replays the scaled interleave with scalar-subquery stats.
  private val qZorder3 = df("q_store_zorder3",
    (spark, dir) => {
      import graft.operators.Layout
      val li = Tables.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("bigint").as("l_qty"))
      val cols = Seq("l_partkey", "l_suppkey", "l_qty")
      val back = Layout.zorderWriteN(li, cols, scratch("zorder3_lineitem"), files = 8)
      val stats = Layout.zStatsN(back, cols)
      back.select(expr(Layout.scaledMortonSqlN(cols, stats)).as("z"),
          col("l_orderkey"))
        .groupBy(expr("z DIV 262144").as("zb"))
        .agg(count(lit(1)).as("n"), sum(col("z")).as("sum_z"),
          sum(col("l_orderkey")).as("sum_ok"))
        .orderBy("zb")
    },
    Some {
      def mm(f: String, c: String) = s"(SELECT CAST($f($c) AS BIGINT) FROM src)"
      def scaled(c: String) =
        s"((($c - ${mm("MIN", c)}) * 255) // GREATEST(1, ${mm("MAX", c)} - ${mm("MIN", c)}))"
      val z = graft.operators.Layout.mortonSqlN(
        Seq(scaled("l_partkey"), scaled("l_suppkey"), scaled("l_qty")),
        bits = 8, spark = false)
      s"""WITH src AS (
         |  SELECT l_orderkey, l_partkey, l_suppkey,
         |    CAST(l_quantity AS BIGINT) AS l_qty
         |  FROM lineitem
         |), coded AS (
         |  SELECT $z AS z, l_orderkey FROM src
         |)
         |SELECT z // 262144 AS zb, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(z) AS BIGINT) AS sum_z, CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok
         |FROM coded GROUP BY 1 ORDER BY zb""".stripMargin
    })

  // Small-file compaction (Layout.compact): 64 scattered files rewritten
  // to target-sized ones; the oracle checks content preservation against
  // the source table, LayoutSpec checks the file arithmetic.
  private val qCompact = df("q_store_compact",
    (spark, dir) => {
      import graft.operators.Layout
      val smallDir = scratch("compact_small")
      val outDir = scratch("compact_out")
      Tables.table(spark, dir, "orders").repartition(64)
        .write.mode(SaveMode.Overwrite).parquet(smallDir)
      val back = Layout.compact(spark, smallDir, outDir, targetBytes = 512L * 1024)
      back.agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          countDistinct(col("o_orderstatus")).as("n_status"))
        .select(col("n_rows"), col("sum_key"), col("n_status"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
           |FROM orders""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    qCtas, qInsert, qPartitioned, qCsv, qCsvMultichar, qJsonSelfDesc, qOrc, qNested,
    qNestedDdl, qBucketedJoin, qJdbc, qJdbcAgg, qPartitionMgmt, qIndex, qAvro,
    qSeqFile, qRegex, qRcFile, qInsertReader, qRawFile, qTarShards,
    qZorder, qZorder3, qCompact, qDpp)
}
