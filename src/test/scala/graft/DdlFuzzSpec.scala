package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftEngine

/** Seeded randomized round trips through the Tajo dialect layer: random
  * schemas (type spellings x identifier quoting) are created in each
  * storage format, filled through `INSERT INTO ... VALUES`, and read back
  * through a plain SELECT — every cell must equal the value the generator
  * intended. Deterministic seeds, so CI failures reproduce exactly.
  *
  * The per-format type pools encode real storage semantics, not test
  * convenience: text (csv) cannot distinguish NULL from '' so string
  * columns stay non-null there, and CHAR(n) padding is only pinned on
  * formats whose readers honor it.
  */
class DdlFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = new GraftEngine(spark)

  /** One fuzzable column type: Tajo DDL spelling, SQL literal generator,
    * expected read-back value (given the literal's draw), format gates. */
  private case class FuzzType(
      spelling: String,
      gen: scala.util.Random => (String, Any),
      okJsonText: Boolean = true,
      nullableInText: Boolean = true,
      okAvro: Boolean = true)

  private val types: Seq[FuzzType] = Seq(
    FuzzType("INT4", r => { val v = r.nextInt(100000) - 50000; (v.toString, v) }),
    FuzzType("INT8", r => { val v = r.nextLong() % 1000000000L; (s"CAST($v AS BIGINT)", v) }),
    FuzzType("INT2", r => { val v = (r.nextInt(60000) - 30000).toShort; (s"CAST($v AS SMALLINT)", v) }),
    FuzzType("FLOAT8", r => { val v = r.nextInt(1000) + 0.25; (v.toString, v) }),
    FuzzType("DOUBLE PRECISION", r => { val v = r.nextInt(1000) + 0.5; (v.toString, v) }),
    FuzzType("FLOAT4", r => { val v = (r.nextInt(100) + 0.5).toFloat; (s"CAST($v AS FLOAT)", v) }),
    FuzzType("TEXT", r => {
      val words = Seq("alpha", "bravo", "o''brien", "x y z", "UPPER", "émile")
      val w = words(r.nextInt(words.length))
      (s"'$w'", w.replace("''", "'"))
    }, nullableInText = false),
    FuzzType("BOOL", r => { val v = r.nextBoolean(); (v.toString, v) }),
    FuzzType("DATE", r => {
      val d = java.time.LocalDate.of(2020 + r.nextInt(6), 1 + r.nextInt(12), 1 + r.nextInt(28))
      (s"DATE '$d'", java.sql.Date.valueOf(d))
    }),
    FuzzType("TIMESTAMP", r => {
      val t = java.time.LocalDateTime.of(2022, 1 + r.nextInt(12), 1 + r.nextInt(28),
        r.nextInt(24), r.nextInt(60), r.nextInt(60))
      (s"TIMESTAMP '${t.toString.replace('T', ' ')}'", java.sql.Timestamp.valueOf(t))
    }),
    // CHAR padding is only pinned on formats whose readers honor it —
    // avro stores plain strings (see GraftEngine.readerSchemaFromDDL)
    FuzzType("CHAR(5)", r => {
      val w = Seq("ab", "abcde", "x")(r.nextInt(3))
      (s"'$w'", w.padTo(5, ' ').mkString)
    }, okJsonText = false, okAvro = false),
    FuzzType("VARCHAR(20)", r => {
      val w = Seq("short", "twenty-char-maximum!")(r.nextInt(2))
      (s"'$w'", w)
    }, nullableInText = false),
    FuzzType("TIMESTAMPTZ", r => {
      val t = java.time.LocalDateTime.of(2023, 1 + r.nextInt(12), 1 + r.nextInt(28),
        r.nextInt(24), r.nextInt(60), 0)
      (s"TIMESTAMP '${t.toString.replace('T', ' ')}'", java.sql.Timestamp.valueOf(t))
    }),
    FuzzType("BYTEA", r => {
      val bytes = Array.fill(2 + r.nextInt(4))(r.nextInt(256).toByte)
      (s"X'${bytes.map(b => f"${b & 0xff}%02X").mkString}'", bytes)
    }, okJsonText = false))

  /** Identifier styles: plain, double-quoted mixed case, double-quoted
    * reserved word — the dialect must carry all three through DDL, the
    * insert, and the read. */
  private def colName(r: scala.util.Random, i: Int): (String, String) =
    r.nextInt(3) match {
      case 0 => (s"c$i", s"c$i")
      case 1 => (s""""Col${i}Mixed"""", s"Col${i}Mixed")
      case 2 => (s""""order$i"""", s"order$i")
    }

  private def runSeed(seed: Int, format: String): Unit = {
    val r = new scala.util.Random(seed)
    val jsonOrText = format == "JSON" || format == "TEXT"
    val pool = types.filter(t => (!jsonOrText || t.okJsonText) &&
      (format != "AVRO" || t.okAvro))
    val nCols = 3 + r.nextInt(3)
    val cols = (0 until nCols).map { i =>
      val t = pool(r.nextInt(pool.length))
      val (ddlName, readName) = colName(r, i)
      (ddlName, readName, t)
    }
    val table = s"tf_fuzz_${format.toLowerCase}_$seed"
    engine.sql(s"DROP TABLE IF EXISTS $table")
    val ddlCols = (s""""id" INT4""" +: cols.map { case (n, _, t) => s"$n ${t.spelling}" }).mkString(", ")
    engine.sql(s"CREATE TABLE $table ($ddlCols) USING $format")
    val rows = (0 until 3).map { rowId =>
      val cells = cols.map { case (_, _, t) =>
        val mayNull = !(format == "TEXT" && !t.nullableInText)
        if (mayNull && r.nextInt(5) == 0) ("NULL", null)
        else t.gen(r)
      }
      (rowId, cells)
    }
    val valuesSql = rows.map { case (id, cs) => s"($id, ${cs.map(_._1).mkString(", ")})" }
      .mkString(", ")
    engine.sql(s"INSERT INTO $table VALUES $valuesSql")
    val got = engine.sql(s"""SELECT * FROM $table ORDER BY "id"""").collect()
    assert(got.length == 3, s"[$table] expected 3 rows, got ${got.length}")
    rows.foreach { case (id, cs) =>
      val row = got(id)
      assert(row.getAs[Int]("id") == id)
      cs.zipWithIndex.foreach { case ((_, expected), i) =>
        val actual = row.get(i + 1)
        val name = cols(i)._2
        (expected, actual) match {
          case (null, a) => assert(a == null, s"[$table.$name row $id] expected NULL, got $a")
          case (e: java.sql.Timestamp, a: java.sql.Timestamp) =>
            assert(a.getTime == e.getTime, s"[$table.$name row $id] $a != $e")
          case (e: Array[Byte], a: Array[Byte]) =>
            assert(a.sameElements(e),
              s"[$table.$name row $id] ${a.toSeq} != ${e.toSeq}")
          case (e, a) => assert(a == e, s"[$table.$name row $id] $a != $e (${cols(i)._3.spelling})")
        }
      }
    }
    engine.sql(s"DROP TABLE $table")
  }

  for (format <- Seq("PARQUET", "ORC", "JSON", "TEXT", "AVRO"); seed <- 1 to 10)
    test(s"fuzz round trip: $format seed $seed") { runSeed(seed, format) }
}
