package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftEngine

/** Seeded schema-evolution fuzz: random sequences of ALTER TABLE ADD
  * COLUMN / RENAME COLUMN / RENAME TO interleaved with inserts, replayed
  * against a plain Scala model of the expected table state. This is the
  * code path the golden corpus caught the round-4 RENAME COLUMN data-loss
  * bug in — the fuzz walks many more orderings than the hand-written
  * cases. Deterministic seeds so failures reproduce.
  *
  * Semantics pinned by the model (same for name-binding parquet/json and
  * position-binding text):
  *   - ADD COLUMN: pre-existing rows read NULL for the new column;
  *   - RENAME COLUMN: values survive under the new name;
  *   - RENAME TO: data and schema survive under the new table name.
  */
class AlterFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val engine = new GraftEngine(spark)

  private def runSeed(seed: Int, format: String): Unit = {
    val r = new scala.util.Random(seed)
    var table = s"af_${format.toLowerCase}_$seed"
    engine.sql(s"DROP TABLE IF EXISTS $table")
    engine.sql(s"DROP TABLE IF EXISTS ${table}_rn")
    // schema model: ordered column (name, isText); id is always first
    var cols = Vector(("a", true), ("b", false))
    var nextId = 0
    var nextCol = 0
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]

    def insert(n: Int): Unit = (1 to n).foreach { _ =>
      val vals = cols.map { case (name, isText) =>
        if (r.nextInt(5) == 0) name -> null
        else if (isText) name -> s"w${r.nextInt(100)}"
        else name -> r.nextInt(10000)
      }.toMap
      val lit = cols.map { case (name, isText) =>
        vals(name) match {
          case null => "NULL"
          case s: String => s"'$s'"
          case i => i.toString
        }
      }.mkString(", ")
      engine.sql(s"INSERT INTO $table VALUES ($nextId, $lit)")
      rows += (vals + ("id" -> nextId))
      nextId += 1
    }

    engine.sql(s"CREATE TABLE $table (id INT4, a TEXT, b INT4) USING $format")
    insert(3)

    (1 to 5).foreach { _ =>
      r.nextInt(4) match {
        case 0 => // ADD COLUMN
          val isText = r.nextBoolean()
          val name = s"n$nextCol"; nextCol += 1
          engine.sql(s"ALTER TABLE $table ADD COLUMN $name ${if (isText) "TEXT" else "INT4"}")
          cols = cols :+ (name, isText)
          // pre-existing rows read NULL for the new column
          rows.indices.foreach(i => rows(i) = rows(i) + (name -> null))
        case 1 => // RENAME COLUMN (never id)
          val i = r.nextInt(cols.length)
          val (old, isText) = cols(i)
          val neu = s"r$nextCol"; nextCol += 1
          engine.sql(s"ALTER TABLE $table RENAME COLUMN $old TO $neu")
          cols = cols.updated(i, (neu, isText))
          rows.indices.foreach { j =>
            rows(j) = rows(j) - old + (neu -> rows(j)(old))
          }
        case 2 => // RENAME TABLE (round trip back so names stay bounded)
          engine.sql(s"ALTER TABLE $table RENAME TO ${table}_rn")
          engine.sql(s"ALTER TABLE ${table}_rn RENAME TO $table")
        case 3 =>
          insert(2)
      }
    }

    val got = engine.sql(s"SELECT * FROM $table ORDER BY id").collect()
    assert(got.length == rows.length, s"[$table] ${got.length} != ${rows.length} rows")
    got.zipWithIndex.foreach { case (row, i) =>
      val want = rows(i)
      assert(row.getAs[Int]("id") == want("id"), s"[$table row $i] id")
      cols.foreach { case (name, _) =>
        val a = row.getAs[Any](name)
        val e = want(name)
        assert((a == null && e == null) || a == e,
          s"[$table row $i col $name] got $a want $e (cols=$cols)")
      }
    }
    engine.sql(s"DROP TABLE $table")
  }

  for (format <- Seq("PARQUET", "JSON", "TEXT"); seed <- 1 to 10)
    test(s"alter fuzz: $format seed $seed") { runSeed(seed, format) }
}
