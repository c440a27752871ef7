package graft.queries

import graft.queries.QueryUtil.Q

/** One named, oracle-checked query exposed through SparkEntry. */
final case class Entry(name: String, q: Q, oracle: Option[String])

object Registry {
  def entries: Seq[Entry] =
    BatchQueries.entries ++ ExprQueries.entries ++ WindowQueries.entries ++
      ExtensionQueries.entries ++ StreamQueries.entries ++
      StatefulStreamQueries.entries ++ GraphQueries.entries ++ MiscQueries.entries ++
      TpchExtraQueries.entries ++ PipelineQueries.entries ++ MLQueries.entries

  def queries: Map[String, Q] = entries.map(e => e.name -> e.q).toMap
  def oracles: Map[String, String] =
    entries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
