package graft.functions

/** Transform-dialect shims: translate the reference's expression dialect
  * (`runtime/parser/metadata/TransformSqlOperatorTable.java:90-385`, impls
  * `runtime/functions/SystemFunctionUtils.java`) into Spark SQL with exact
  * semantics. Most functions map 1:1; the deliberate differences:
  *
  *  - `LIKE` is implemented as Java-regex `find()` in the reference
  *    (`SystemFunctionUtils.like:458`), which is Spark's `RLIKE`, NOT SQL LIKE.
  *  - `NOW()` / `CURRENT_TIMESTAMP` / `LOCALTIMESTAMP` are evaluated against a
  *    per-record epoch captured in `__epoch_time__` (`JaninoCompiler.java:83-84`),
  *    not the wall clock at expression eval time.
  *  - Cast overflow must throw (reference `castToByte:799` etc.) — run the
  *    session with `spark.sql.ansi.enabled=true` for the CAST matrix.
  *  - `TRIM(sym, target, str)` ignores symbol/target and trims whitespace
  *    (`SystemFunctionUtils.trim:429`).
  */
object Dialect {

  /** Rewrites performed on a dialect expression before handing it to Catalyst.
    * Conservative token-level rewrites outside of string literals.
    */
  def translate(sql: String, epochTimeColumn: Option[String] = None): String = {
    // split into string-literal and non-literal segments; rewrite only outside
    val out = new StringBuilder
    var i = 0
    var inStr = false
    val seg = new StringBuilder
    def flush(): Unit = { out.append(rewriteSegment(seg.toString, epochTimeColumn)); seg.clear() }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '\'') { flush(); inStr = true; out.append(c) }
      else if (inStr && c == '\'') {
        // handle escaped '' inside literal
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') { out.append("''"); i += 1 }
        else { inStr = false; out.append(c) }
      } else if (inStr) out.append(c)
      else seg.append(c)
      i += 1
    }
    flush()
    out.toString
  }

  private def rewriteSegment(s: String, epochCol: Option[String]): String = {
    var r = s
    // LIKE-as-regex quirk: reference compiles the pattern as a Java regex
    r = r.replaceAll("(?i)\\bNOT\\s+LIKE\\b", "NOT RLIKE")
    r = r.replaceAll("(?i)(?<!R)\\bLIKE\\b", "RLIKE")
    // epoch-time binding for now-ish functions
    epochCol.foreach { ec =>
      r = r.replaceAll("(?i)\\bNOW\\s*\\(\\s*\\)", s"timestamp_millis($ec)")
      r = r.replaceAll("(?i)\\bCURRENT_TIMESTAMP\\b", s"timestamp_millis($ec)")
      r = r.replaceAll("(?i)\\bLOCALTIMESTAMP\\b", s"timestamp_millis($ec)")
      r = r.replaceAll("(?i)\\bCURRENT_DATE\\b", s"to_date(timestamp_millis($ec))")
      r = r.replaceAll(
        "(?i)\\bCURRENT_TIME\\b",
        s"date_format(timestamp_millis($ec), 'HH:mm:ss')")
      r = r.replaceAll(
        "(?i)\\bLOCALTIME\\b",
        s"date_format(timestamp_millis($ec), 'HH:mm:ss')")
    }
    // TIMESTAMP_DIFF alias (reference registers both spellings)
    r = r.replaceAll("(?i)\\bTIMESTAMP_DIFF\\s*\\(", "TIMESTAMPDIFF(")
    r
  }

  /** SimpleDateFormat → DateTimeFormatter pattern translation for the letters
    * whose meaning differs (`DateTimeUtils.java` in the reference uses
    * SimpleDateFormat). Identical for y/M/d/H/m/s/S; differences handled here.
    */
  def translateDatePattern(simpleDateFormat: String): String = {
    val sb = new StringBuilder
    var i = 0
    var quoted = false
    while (i < simpleDateFormat.length) {
      val c = simpleDateFormat.charAt(i)
      c match {
        case '\'' => quoted = !quoted; sb.append(c)
        case 'u' if !quoted => sb.append('e') // SDF u = day number of week
        case 'E' if !quoted => sb.append('E')
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
