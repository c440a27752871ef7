package graft.queries

import graft.Tables
import graft.functions.Aggregators
import graft.operators.Multimodal
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** UDAGG surface, lateral table-function analogue, and multimodal binary
  * plumbing (SURVEY.md §2.4 UDAGG, §2.9 TableFunction, extensions). */
object MiscQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val twoLongs = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  def entries: Seq[Entry] = Seq(

    // UDAGG (AggregateFunction parity): weighted average as typed Aggregator,
    // map-side partial agg via udaf registration.
    Entry("q36_udagg_weighted_avg",
      (s, dir) => {
        val wavg = udaf(Aggregators.WeightedAvgCents, twoLongs)
        t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_quantity").cast("long").as("qty"))
          .groupBy("l_returnflag")
          .agg(wavg(col("cents"), col("qty")).as("wavg_cents"))
      },
      Some("""SELECT l_returnflag,
          sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT))
            // sum(CAST(l_quantity AS BIGINT)) AS wavg_cents
        FROM lineitem GROUP BY l_returnflag""")),

    // The same Aggregator as an incremental window aggregate
    // (reference: AggregateFunction under WindowedStream.aggregate).
    Entry("q74_window_udagg",
      (s, dir) => {
        val wavg = udaf(Aggregators.WeightedAvgCents, twoLongs)
        t(s, dir, "events")
          .select(col("ts"),
            round(col("value") * 1000).cast("long").as("vm"),
            (pmod(col("user_id"), lit(5)) + 1).cast("long").as("w"))
          .groupBy(window(col("ts"), "6 hours"))
          .agg(wavg(col("vm"), col("w")).as("wavg_millis"))
          .select(unix_micros(col("window.start")).as("win_start_us"), col("wavg_millis"))
      },
      Some(s"""SELECT (epoch_us(ts) // ${6L * 3600000000L}) * ${6L * 3600000000L} AS win_start_us,
          sum(CAST(round(value * 1000) AS BIGINT) * (user_id % 5 + 1))
            // sum(user_id % 5 + 1) AS wavg_millis
        FROM events GROUP BY 1""")),

    // TableFunction / LATERAL analogue (reference: functions/TableFunction
    // .scala via DataSetCorrelate): one row per part-name word.
    Entry("q45_lateral_explode",
      (s, dir) =>
        t(s, dir, "part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n")),
      Some("""SELECT w.word, count(*) AS n
        FROM part, UNNEST(string_split(p_name, ' ')) AS w(word)
        GROUP BY w.word""")),

    // Multimodal: binary payload column + partition-local stubbed decode —
    // metadata is a pure function of the payload bytes, so the oracle
    // reproduces it from the source text.
    Entry("qa4_multimodal_meta",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"), "doc_id", "text")
        Multimodal.decodeMeta(media)
      },
      Some("""SELECT doc_id,
          ['image','audio','video'][(doc_id % 3) + 1] AS media_type,
          CAST(octet_length(encode(text)) AS INT) AS n_bytes,
          CAST(CASE WHEN doc_id % 3 = 0 THEN 64 + octet_length(encode(text)) % 192
               WHEN doc_id % 3 = 1 THEN 8000 + (octet_length(encode(text)) % 5) * 8000
               ELSE 64 + octet_length(encode(text)) % 192 END AS INT) AS dim1,
          CAST(CASE WHEN doc_id % 3 = 1 THEN 0
               ELSE 64 + ascii(substr(text, 1, 1)) % 192 END AS INT) AS dim2,
          CAST(CASE WHEN doc_id % 3 = 0 THEN 1
               WHEN doc_id % 3 = 1 THEN 1 + octet_length(encode(text)) % 30
               ELSE 1 + octet_length(encode(text)) % 24 END AS INT) AS n_frames
        FROM documents""")),

    // Frame sampling: per-video stride-4 frame indexes as rows.
    Entry("qa5_frame_sample",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"), "doc_id", "text")
        Multimodal.sampleFrames(Multimodal.decodeMeta(media), stride = 4)
      },
      Some("""SELECT doc_id, CAST(f.g AS INT) AS frame_idx
        FROM documents
        CROSS JOIN UNNEST(generate_series(0, octet_length(encode(text)) % 24, 4)) AS f(g)
        WHERE doc_id % 3 = 2""")),
  )
}
