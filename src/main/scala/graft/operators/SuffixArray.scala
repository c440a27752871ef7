package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth distributed SUFFIX ARRAY by prefix doubling — the core
  * data structure of the published exact-substring dedup pipeline
  * (Lee et al. 2022 build one, single-node, to ENUMERATE maximal
  * duplicates; [[Dedup.exactSubstrRemove]] showed removal needs no SA —
  * this supplies the enumeration half: ordered suffixes + LCPs answer
  * "what IS duplicated and how long does it run").
  *
  * Distributed construction is the classic prefix-doubling scheme
  * (Manber-Myers order; the sort-based doubling that pDCX-family MPI
  * constructions and every MapReduce/Spark SA paper use): rank every
  * suffix by its first `base` characters, then repeatedly re-rank by
  * the PAIR (rank of first k chars, rank of the suffix k further on)
  * — each round doubles the compared depth, so `depth` is reached in
  * log2(depth/base) rounds. Every round is two corpus-linear shuffles
  * (a distinct + range-sort to dense-rank the pairs, and a join to map
  * ranks back) — there is no comparison-sort of long strings anywhere;
  * strings longer than `base` never shuffle at all.
  *
  * BOUNDED DEPTH: suffixes are ordered by their first `depth`
  * characters only, ties broken by (doc, pos) — the bounded relation is
  * total, deterministic, and exactly replayable by any engine as
  * `ORDER BY substring(text, pos+1, depth), doc, pos`. For duplicate
  * enumeration the bound is the span cap (the same role minLen/maxLen
  * play across the dedup family), not an approximation: every repeated
  * run up to `depth` chars is ordered exactly as the unbounded SA would.
  * Suffixes are PER-DOCUMENT (no cross-doc concatenation, so no
  * sentinel alphabet games); shorter-prefix-first string order is
  * preserved through the doubling by ranking an absent continuation as
  * -1 (sorts before every real rank, exactly like "ab" < "abc").
  *
  * Output: one row per character position, (idCol, pos, rank) with
  * rank a 1..N total order. Scale: O(log depth) rounds, each a
  * fixed number of 8-byte-keyed corpus-linear shuffles; the global
  * orders run through range partition + the two-phase zipWithIndex
  * scan ([[Partitioning.zipWithIndex]]), NEVER a one-task window. */
object SuffixArray {

  /** Dense rank (1-based) of `dfIn` rows by `keyCols`, appended as
    * `rankCol`: distinct keys range-sort globally, the two-phase scan
    * indexes them, ranks join back. Ties (equal keys) share a rank —
    * the equality-preserving property doubling depends on. */
  private def denseRankBy(dfIn: DataFrame, keyCols: Seq[String],
                          rankCol: String): DataFrame = {
    val keys = dfIn.select(keyCols.map(col): _*).distinct()
      .repartitionByRange(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.head, keyCols.tail: _*)
    val ranked = Partitioning.zipWithIndex(keys, rankCol)
      .withColumn(rankCol, col(rankCol) + 1L)
    dfIn.join(ranked, keyCols)
  }

  def suffixArray(df: DataFrame, idCol: String, textCol: String,
                  depth: Int = 64, base: Int = 4): DataFrame = {
    require(base >= 1 && depth >= base && depth % base == 0 &&
      Integer.bitCount(depth / base) == 1,
      s"depth ($depth) must be base ($base) times a power of two")
    val docs = df.select(col(idCol).as("_d"), col(textCol).as("_t"),
        length(col(textCol)).cast("long").as("_len"))
      .filter(col("_len") > 0)
    // round 0: rank by the first `base` characters (SQL substring
    // truncates at the string end; a shorter actual prefix sorts first
    // in byte order, which is exactly the string-order contract)
    var cur = denseRankBy(
      docs.select(col("_d"),
          explode(sequence(lit(0L), col("_len") - 1)).as("pos"), col("_t"))
        .select(col("_d"), col("pos"),
          col("_t").substr((col("pos") + 1).cast("int"), lit(base)).as("_key")),
      Seq("_key"), "r")
      .select("_d", "pos", "r")
      .localCheckpoint() // truncate the per-round lineage
    var k = base.toLong
    while (k < depth) {
      // rank of the suffix k positions further on; absent (the suffix
      // ends within k chars) ranks as -1 = before every real rank
      val shifted = cur.select(col("_d"), (col("pos") - k).as("pos"),
        col("r").as("r2"))
      val paired = cur.join(shifted, Seq("_d", "pos"), "left")
        .withColumn("r2", coalesce(col("r2"), lit(-1L)))
      cur = denseRankBy(paired, Seq("r", "r2"), "rn")
        .select(col("_d"), col("pos"), col("rn").as("r"))
        .localCheckpoint()
      k *= 2
    }
    // total order: dense depth-rank, ties by (doc, pos)
    val ordered = cur
      .repartitionByRange(col("r"), col("_d"), col("pos"))
      .sortWithinPartitions("r", "_d", "pos")
    Partitioning.zipWithIndex(ordered, "rank")
      .select(col("_d").as(idCol), col("pos"), (col("rank") + 1L).as("rank"))
  }

  /** The enumeration query the SA exists for: the `k` LONGEST repeated
    * substrings (bounded at `depth`), from the longest-common-prefix of
    * ADJACENT suffixes in SA order — the classic reduction (any repeat
    * is witnessed by some adjacent pair; a repeat of length L puts two
    * suffixes sharing L chars next to each other). Output one row per
    * adjacent pair with lcp >= minLen, top-k by (lcp DESC, repeat text,
    * doc1, pos1): (lcp, rep_text, id1, pos1, id2, pos2), where (1) is the
    * SA-earlier suffix. LCPs cap at `depth` by construction — repeats
    * longer than the bound report depth (the bound is the span cap).
    *
    * Scale: the SA's O(log depth) rounds plus ONE adjacency self-join
    * on rank (8-byte key) moving `depth`-char prefixes, an LCP HOF per
    * pair, and a TakeOrdered top-k. */
  /** The LCP array to [[suffixArray]]'s SA — together they are the
    * complete duplicate-enumeration structure (every repeated run of
    * length ℓ ≤ depth appears as an adjacent pair with lcp ≥ ℓ): one
    * row per suffix, (idCol, pos, rank, lcp), lcp = bounded common
    * prefix with the rank-predecessor, lcp(rank 1) = 0. Same adjacency
    * join + guarded LCP fold as [[longestRepeats]], without the top-k
    * cut. */
  def lcpArray(df: DataFrame, idCol: String, textCol: String,
               depth: Int = 64, base: Int = 4): DataFrame = {
    val sa = suffixArray(df, idCol, textCol, depth, base)
    val docs = df.select(col(idCol).as("_d"), col(textCol).as("_t"))
    val withPrefix = sa.join(docs, sa(idCol) === docs("_d"))
      .select(col("rank"), col(idCol).as("_id"), col("pos"),
        col("_t").substr((col("pos") + 1).cast("int"), lit(depth)).as("p1"))
    val prev = withPrefix.select((col("rank") + 1L).as("rank"),
      col("p1").as("p2"))
    withPrefix.join(prev, Seq("rank"), "left")
      .withColumn("lcp", when(col("p2").isNull, lit(0L)).otherwise(expr(
        s"""aggregate(sequence(1, $depth), 0, (acc, i) ->
           CASE WHEN acc = i - 1 AND i <= length(p1) AND i <= length(p2)
                 AND substring(p1, i, 1) = substring(p2, i, 1)
             THEN i ELSE acc END)""").cast("long")))
      .select(col("_id").as(idCol), col("pos"), col("rank"), col("lcp"))
  }

  def longestRepeats(df: DataFrame, idCol: String, textCol: String,
                     depth: Int = 64, base: Int = 4, minLen: Int = 8,
                     k: Int = 50): DataFrame = {
    require(minLen >= 1 && k >= 1)
    val sa = suffixArray(df, idCol, textCol, depth, base)
    val docs = df.select(col(idCol).as("_d"), col(textCol).as("_t"))
    val withPrefix = sa.join(docs, sa(idCol) === docs("_d"))
      .select(col("rank"), col(idCol).as("_id"), col("pos"),
        col("_t").substr((col("pos") + 1).cast("int"), lit(depth)).as("_p"))
    val a = withPrefix.select(col("rank"), col("_id").as("id1"),
      col("pos").as("pos1"), col("_p").as("p1"))
    val b = withPrefix.select((col("rank") - 1L).as("rank"),
      col("_id").as("id2"), col("pos").as("pos2"), col("_p").as("p2"))
    a.join(b, Seq("rank"))
      // contiguous-prefix fold: lcp grows only while every prior
      // character matched
      .withColumn("lcp", expr(
        s"""aggregate(sequence(1, $depth), 0, (acc, i) ->
           CASE WHEN acc = i - 1 AND i <= length(p1) AND i <= length(p2)
                 AND substring(p1, i, 1) = substring(p2, i, 1)
             THEN i ELSE acc END)""").cast("long"))
      .filter(col("lcp") >= minLen)
      .withColumn("rep_text", col("p1").substr(lit(1), col("lcp").cast("int")))
      .orderBy(col("lcp").desc, col("rep_text"), col("id1"), col("pos1"))
      .limit(k)
      .select("lcp", "rep_text", "id1", "pos1", "id2", "pos2")
  }
}
