package graft.functions

/** Postgres-style datetime format pattern → java.time pattern translation.
  *
  * The reference implements Postgres `to_char`/`to_date`/`to_timestamp`
  * pattern semantics (reference: tajo-core/src/main/java/org/apache/tajo/
  * engine/function/datetime/ToCharTimestamp.java and
  * tajo-common/src/main/java/org/apache/tajo/util/datetime/DateTimeFormat.java),
  * which differ from Spark's Java-style `date_format` patterns. We translate
  * the common subset of PG tokens to `java.time.format.DateTimeFormatter`
  * patterns once per literal and delegate the actual formatting to Spark's
  * built-in (codegen'd) machinery where possible.
  */
object PgDateFormat {

  // Longest-match-first token table (PG token -> java.time token).
  private val tokens: Seq[(String, String)] = Seq(
    // FM (fill mode) suppresses zero-padding: single-letter java.time
    // patterns (DateTimeFormat.java FM_* flag handling)
    "FMHH24" -> "H",
    "FMHH12" -> "h",
    "FMYYYY" -> "yyyy",
    "FMMM"   -> "M",
    "FMDD"   -> "d",
    "FMHH"   -> "h",
    "FMMI"   -> "m",
    "FMSS"   -> "s",
    "HH24" -> "HH",
    "HH12" -> "hh",
    "YYYY" -> "yyyy",
    "YYY"  -> "yyy",
    "YY"   -> "yy",
    "MONTH"-> "MMMM",
    "Month"-> "MMMM",
    "month"-> "MMMM",
    "MON"  -> "MMM",
    "Mon"  -> "MMM",
    "mon"  -> "MMM",
    "MM"   -> "MM",
    "DDD"  -> "DDD",
    "DD"   -> "dd",
    "DAY"  -> "EEEE",
    "Day"  -> "EEEE",
    "day"  -> "EEEE",
    "DY"   -> "EEE",
    "Dy"   -> "EEE",
    "dy"   -> "EEE",
    "HH"   -> "hh",
    "MI"   -> "mm",
    "SS"   -> "ss",
    "MS"   -> "SSS",
    "US"   -> "SSSSSS",
    "AM"   -> "a",
    "PM"   -> "a",
    "am"   -> "a",
    "pm"   -> "a",
    // to_char formats a zoneless LocalDateTime in the engine's fixed-UTC
    // semantics (TajoFunctions.utc) — a zone pattern like `zz` would throw
    // UnsupportedTemporalTypeException there, so TZ becomes the literal
    // zone name the engine guarantees.
    "TZ"   -> "'UTC'",
    "J"    -> "g",      // julian day approximation
    "Q"    -> "Q",
    "WW"   -> "ww",
    "W"    -> "W",
    "IW"   -> "ww"
  )

  /** Translate a PG pattern into a java.time pattern. A double-quoted
    * region is PG's literal-text escape (`"week"` prints `week`,
    * DateTimeFormat.java's quoted-string handling) — it maps to a
    * java.time single-quoted literal with the quotes stripped. Other
    * unknown characters pass through quoted so literal text survives. */
  def translate(pg: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pg.length) {
      if (pg.charAt(i) == '"') {
        val end = pg.indexOf('"', i + 1)
        val lit = if (end < 0) pg.substring(i + 1) else pg.substring(i + 1, end)
        if (lit.nonEmpty)
          sb.append('\'').append(lit.replace("'", "''")).append('\'')
        i = if (end < 0) pg.length else end + 1
      } else tokens.find { case (t, _) => pg.startsWith(t, i) } match {
        case Some((t, j)) =>
          sb.append(j); i += t.length
        case None =>
          val c = pg.charAt(i)
          if (c.isLetter) sb.append('\'').append(c).append('\'')
          else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }
}
