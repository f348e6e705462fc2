package graft.core

import java.util.regex.Pattern

/** Table-pattern matching: comma-separated list of dotted selectors, one regex per
  * TableId component, matched case-insensitively with full-string semantics.
  *
  * Mirrors `flink-cdc-common/.../schema/Selectors.java:30-140` +
  * `common/utils/Predicates.java` (comma/dot tokenizers honour `\,` and `\.`
  * escapes — a `.` separates components; `\.` is a regex literal dot inside one).
  */
final class Selectors private (selectors: Seq[Selectors.Selector]) {
  def isMatch(tableId: TableId): Boolean = selectors.exists(_.isMatch(tableId))
}

object Selectors {

  private[core] final case class Selector(
      namespace: Option[Pattern],
      schemaName: Option[Pattern],
      tableName: Option[Pattern]) {

    private def test(p: Option[Pattern], s: String): Boolean =
      p.exists(_.matcher(if (s == null) "" else s).matches())

    /** Match semantics of `Selectors.Selector.isMatch` (reference :57-72): components
      * absent from the TableId are skipped, so a 1-part selector matches any table
      * name regardless of namespace/schema on the id when the id has no ns/schema.
      */
    def isMatch(tableId: TableId): Boolean = {
      val ns = Option(tableId.namespace).getOrElse("")
      val sc = Option(tableId.schemaName).getOrElse("")
      if (ns.isEmpty) {
        if (sc.isEmpty) test(tableName, tableId.tableName)
        else test(schemaName, sc) && test(tableName, tableId.tableName)
      } else {
        test(namespace, ns) && test(schemaName, sc) && test(tableName, tableId.tableName)
      }
    }
  }

  /** Split on `sep` except when preceded by a backslash escape; afterwards the
    * escape is stripped so `\.` becomes the regex any-char `.` and empty parts
    * are dropped — exactly `Predicates.RegExSplitterByDot.split` (reference
    * :164-200, the `.replace("\\\\.", ".")` + isEmpty-skip).
    */
  private[core] def splitUnescaped(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        cur.append(c).append(s.charAt(i + 1))
        i += 2
      } else if (c == sep) {
        out += cur.toString; cur.clear(); i += 1
      } else {
        cur.append(c); i += 1
      }
    }
    out += cur.toString
    out.toSeq.map(_.trim.replace(s"\\$sep", sep.toString)).filter(_.nonEmpty)
  }

  private def compile(part: String): Pattern =
    Pattern.compile(part.trim, Pattern.CASE_INSENSITIVE)

  def parse(tableInclusions: String): Selectors = {
    require(tableInclusions != null && tableInclusions.nonEmpty, "empty table inclusion pattern")
    val sels = splitUnescaped(tableInclusions, ',').filter(_.trim.nonEmpty).map { one =>
      val parts = splitUnescaped(one.trim, '.')
      parts.length match {
        case 1 => Selector(None, None, Some(compile(parts(0))))
        case 2 => Selector(None, Some(compile(parts(0))), Some(compile(parts(1))))
        case 3 =>
          Selector(Some(compile(parts(0))), Some(compile(parts(1))), Some(compile(parts(2))))
        case _ => throw new IllegalArgumentException(s"Invalid table inclusion pattern: $one")
      }
    }
    new Selectors(sels)
  }
}
