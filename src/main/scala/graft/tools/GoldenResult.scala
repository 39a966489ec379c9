package graft.tools

import org.apache.spark.sql.DataFrame

/** Renders a DataFrame in the reference's golden-result format, so result
  * files diff directly against the reference's 615-file corpus convention
  * (reference: tajo-cluster-tests/src/test/java/org/apache/tajo/
  * QueryTestCaseBase.java:734-760 assertResultSet; format = comma-joined
  * header, a 31-dash separator, comma-joined rows):
  *
  *   col1,col2
  *   -------------------------------
  *   1,foo
  *
  * Value conventions mirror the reference's Datum.asChars: NULL renders as
  * `null` (NullDatum), booleans as `t`/`f` (BooleanDatum.TRUE_STRING,
  * tajo-common/src/main/java/org/apache/tajo/datum/BooleanDatum.java:29-30),
  * timestamps/dates in ISO form.
  *
  * Driver-side by design — golden comparison is a test-harness step over
  * small results, not a data path (use df.write for data).
  */
object GoldenResult {

  val Separator = "-------------------------------"

  private def cell(v: Any): String = v match {
    case null => "null"
    case b: Boolean => if (b) "t" else "f"
    case ts: java.sql.Timestamp => ts.toString.stripSuffix(".0")
    case ld: java.time.LocalDateTime =>
      ld.toString.replace('T', ' ')
    case lt: java.time.LocalTime =>
      // LocalTime.toString drops ":00" seconds; the reference always
      // renders HH:mm:ss
      lt.format(java.time.format.DateTimeFormatter.ofPattern(
        if (lt.getNano == 0) "HH:mm:ss" else "HH:mm:ss.SSSSSS"))
    case arr: scala.collection.Seq[_] => arr.map(cell).mkString("[", ",", "]")
    case b: Array[Byte] =>
      // BLOB renders as its character data (reference: BlobDatum.asChars —
      // the python-UDF blob default prints "11" for concat_py('1'))
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case other => other.toString
  }

  def render(df: DataFrame, limit: Int = 10000): String = {
    val header = df.columns.mkString(",")
    val rows = df.limit(limit).collect().map(_.toSeq.map(cell).mkString(","))
    (Seq(header, Separator) ++ rows).mkString("", "\n", "\n")
  }

  /** Compare two rendered result texts, returning a diff description or
    * None. */
  def diffText(rendered: String, golden: String): Option[String] = {
    val got = rendered.trim.split("\n").toSeq
    val want = golden.trim.split("\n").toSeq
    if (got == want) None
    else Some(got.zipAll(want, "<missing>", "<missing>").zipWithIndex
      .collect { case ((g, w), i) if g != w => s"line ${i + 1}: got '$g' want '$w'" }
      .take(5).mkString("; "))
  }

  /** Compare against golden text, returning a diff description or None. */
  def diff(df: DataFrame, golden: String): Option[String] = {
    val got = render(df).trim.split("\n").toSeq
    val want = golden.trim.split("\n").toSeq
    if (got == want) None
    else Some(got.zipAll(want, "<missing>", "<missing>").zipWithIndex
      .collect { case ((g, w), i) if g != w => s"line ${i + 1}: got '$g' want '$w'" }
      .take(5).mkString("; "))
  }
}
