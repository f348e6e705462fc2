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
  def translate(sql0: String, epochTimeColumn: Option[String] = None): String = {
    // pre-pass: LIKE <literal> ESCAPE '<c>' needs the pattern literal, so it
    // resolves BEFORE literal segmentation (see foldLikeEscape)
    val sql = foldLikeEscape(sql0)
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

  /** `LIKE <literal> ESCAPE '<c>'`: consume the escape clause by folding the
    * escape character into the pattern — the escaped character becomes a
    * regex-literal (backslash-quoted when it is a regex metacharacter),
    * consistent with the LIKE-as-regex dialect. Spark RLIKE has no ESCAPE
    * form, so this must resolve at translate time, on the raw SQL (the
    * pattern literal is needed).
    */
  private def foldLikeEscape(sql: String): String = {
    val likeEscape =
      "(?i)\\b(NOT\\s+)?LIKE\\s+('(?:[^']|'')*')\\s+ESCAPE\\s+'(.)'".r
    likeEscape.replaceAllIn(sql, m => {
      val not = Option(m.group(1)).fold("")(_ => "NOT ")
      val inner = m.group(2).drop(1).dropRight(1)
      val esc = m.group(3).charAt(0)
      val sb = new StringBuilder
      var i = 0
      while (i < inner.length) {
        val c = inner.charAt(i)
        if (c == esc && i + 1 < inner.length) {
          val nxt = inner.charAt(i + 1)
          // double backslash: one level consumed by the SQL string literal,
          // leaving a regex \X escape
          if ("\\^$.|?*+()[]{}".indexOf(nxt) >= 0) sb.append("\\\\").append(nxt)
          else sb.append(nxt)
          i += 2
        } else { sb.append(c); i += 1 }
      }
      scala.util.matching.Regex.quoteReplacement(s"${not}RLIKE '${sb.toString}'")
    })
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
