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
}
