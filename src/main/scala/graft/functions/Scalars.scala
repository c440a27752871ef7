package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small scalar helpers completing the reference's SQL surface where Spark
  * has no single built-in (SURVEY.md §2.9).
  */
object Scalars {

  /** SQL `(s1, e1) OVERLAPS (s2, e2)` — period intersection test.
    * Reference semantics: the periods share at least one instant. */
  def overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 <= e2 && s2 <= e1

  /** COT(x) = 1/tan(x) (native `cot` exists since Spark 3.3; kept as the
    * composable definition used by the expression tests). */
  def cot(c: Column): Column = lit(1.0) / tan(c)

  /** ASCII-only INITCAP with simple first-letter capitalization (whole
    * string), oracle-replicable: upper(first char) || rest. */
  def initcapAscii(c: Column): Column =
    concat(upper(substring(c, 1, 1)), substring(c, 2, 1000000))

  /** SQL ELEMENT(arr): the single element of a 1-element array, else null. */
  def element(arr: Column): Column =
    when(size(arr) === 1, element_at(arr, 1))

  /** SQL `s SIMILAR TO pattern` (reference: Calcite's SIMILAR TO operator,
    * validated by flink-table's expression layer): SQL-regex → Java-regex
    * translation, then `rlike` anchored to the full string. SQL regex
    * keeps `| * + ? ( ) [ ]` semantics but uses `%`/`_` as wildcards;
    * literal `%`/`_` escape via the `\` escape char. */
  def similarTo(s: Column, pattern: String): Column =
    s.rlike("^" + translateSimilar(pattern) + "$")

  private[graft] def translateSimilar(p: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < p.length) {
      p.charAt(i) match {
        case '\\' if i + 1 < p.length =>
          out.append(java.util.regex.Pattern.quote(p.charAt(i + 1).toString)); i += 1
        case '%' => out.append(".*")
        case '_' => out.append('.')
        case '.' => out.append("\\.")
        case c => out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
