package graft.queries

import graft.queries.QueryUtil.Q

/** One named, oracle-checked query exposed through SparkEntry.
  *
  * `prepare` is an optional UNTIMED setup step for the benchmark harness:
  * Bench runs it before opening the query's timing window (model fitting,
  * index builds — anything a production deployment amortizes across many
  * queries and a bench must not charge to the per-query number). Verify
  * ignores it — the query itself must still produce correct results
  * standalone, falling back to doing the setup work inline. */
final case class Entry(name: String, q: Q, oracle: Option[String],
                       prepare: Option[(org.apache.spark.sql.SparkSession, String) => Unit] = None)

object Registry {
  def entries: Seq[Entry] =
    BatchQueries.entries ++ ExprQueries.entries ++ WindowQueries.entries ++
      ExtensionQueries.entries ++ StreamQueries.entries ++
      StatefulStreamQueries.entries ++ GraphQueries.entries ++ MiscQueries.entries ++
      TpchExtraQueries.entries ++ PipelineQueries.entries ++ MLQueries.entries

  def queries: Map[String, Q] = entries.map(e => e.name -> e.q).toMap
  def oracles: Map[String, String] =
    entries.flatMap(e => e.oracle.map(e.name -> _)).toMap
  def prepares: Map[String, (org.apache.spark.sql.SparkSession, String) => Unit] =
    entries.flatMap(e => e.prepare.map(e.name -> _)).toMap
}
