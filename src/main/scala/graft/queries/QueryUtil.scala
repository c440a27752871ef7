package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object QueryUtil {
  /** A driver-contract query: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Money column → exact integer cents. Summing exact longs is
    * order-independent, so Spark results hash-match any external SQL oracle
    * bit-for-bit — unlike double sums, whose value depends on partial-agg
    * order. Divide once at the end to present currency again. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact long-cents sum presented as currency (one exact double division). */
  def moneySum(c: Column): Column = (sum(cents(c)) / 100.0)

  /** SQL fragment mirroring [[cents]] for the DuckDB oracle. */
  def centsSql(col: String): String = s"CAST(round($col*100) AS BIGINT)"

  def moneySumSql(col: String): String = s"(CAST(sum(${centsSql(col)}) AS BIGINT)/100.0)"
}
