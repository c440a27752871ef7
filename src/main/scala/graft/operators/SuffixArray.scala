package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The doubling products one construction yields: per-doc inputs, the
    * tie-broken total order, and every intermediate rank table — the
    * depth-d rank tables ([[lcpOfAdjacent]]'s descent reuses them; each
    * is localCheckpointed so retention is free). */
  private final case class Built(docs: DataFrame, sa: DataFrame,
                                 rankTables: List[(Long, DataFrame)],
                                 // the direct route's sort already carried
                                 // each suffix's depth-char prefix; keeping
                                 // (rank, _d, pos, _len, _p) lets the
                                 // prefix-fold LCP skip its docs re-join
                                 saPrefixed: Option[DataFrame] = None)

  /** Pick the construction by the SAME shuffle-width model that routes
    * [[lcpOfAdjacent]]: below [[RankCompareMinDepth]] a suffix's whole
    * bounded prefix (≤ depth bytes/row, shuffled ONCE through a single
    * range sort) is cheaper than the doubling's log2(depth/base) rounds
    * of ~16-byte keys × 2 shuffles each (+ per-round job fixed costs —
    * the dominant term on small inputs); at or past the crossover the
    * doubling's depth-independent row width wins. Both produce the
    * identical total order (same comparator: Spark's binary string
    * compare on truncated prefixes, ties by (doc, pos)) — A/B'd
    * bit-exact in SuffixArraySpec and against the DuckDB oracle.
    * `needRankTables` forces the doubling (the rank-compare LCP descent
    * and its differential spec consume the intermediate rank tables). */
  private def build(df: DataFrame, idCol: String, textCol: String,
                    depth: Int, base: Int,
                    needRankTables: Boolean = false): Built =
    if (!needRankTables && depth < RankCompareMinDepth)
      buildDirect(df, idCol, textCol, depth, base)
    else buildDoubling(df, idCol, textCol, depth, base)

  /** Direct bounded-prefix construction: ONE range sort on the
    * depth-char prefix (ties (doc, pos)) + the two-phase global scan.
    * Shuffle width is depth bytes/row ONCE — under the doubling's
    * summed round width whenever depth < [[RankCompareMinDepth]] (the
    * measured crossover model in [[lcpOfAdjacent]]'s doc). Carries no
    * rank tables; [[lcpOfAdjacent]] below the same threshold uses the
    * prefix-fold path, which needs none. */
  private def buildDirect(df: DataFrame, idCol: String, textCol: String,
                          depth: Int, base: Int): Built = {
    require(base >= 1 && depth >= base && depth % base == 0 &&
      Integer.bitCount(depth / base) == 1,
      s"depth ($depth) must be base ($base) times a power of two")
    // the suffix explode + prefix slice below (and the range sort's
    // sampling pass over it) is per-character compute — fan a
    // single-split scan out before it, not after
    val docs = Partitioning.fanOutForCompute(
      df.select(col(idCol).as("_d"), col(textCol).as("_t"),
          length(col(textCol)).cast("long").as("_len"))
        .filter(col("_len") > 0), col("_d"))
    val prefixes = docs
      .select(col("_d"), explode(sequence(lit(0L), col("_len") - 1)).as("pos"),
        col("_t"), col("_len"))
      .select(col("_d"), col("pos"), col("_len"),
        col("_t").substr((col("pos") + 1).cast("int"), lit(depth)).as("_p"))
    val ordered = prefixes
      .repartitionByRange(col("_p"), col("_d"), col("pos"))
      .sortWithinPartitions("_p", "_d", "pos")
    val zipped = Partitioning.zipWithIndex(ordered, "rank")
      .withColumn("rank", col("rank") + 1L)
    val sa = zipped.select(col("_d"), col("pos"), col("rank"))
    Built(docs, sa, Nil, saPrefixed = Some(zipped))
  }

  /** Run the doubling once; rankTables holds (d, (_d, pos, r)) for every
    * compared depth d ∈ {base, 2·base, …, depth}, DESCENDING. */
  private def buildDoubling(df: DataFrame, idCol: String, textCol: String,
                            depth: Int, base: Int): Built = {
    require(base >= 1 && depth >= base && depth % base == 0 &&
      Integer.bitCount(depth / base) == 1,
      s"depth ($depth) must be base ($base) times a power of two")
    val docs = Partitioning.fanOutForCompute(
      df.select(col(idCol).as("_d"), col(textCol).as("_t"),
          length(col(textCol)).cast("long").as("_len"))
        .filter(col("_len") > 0), col("_d"))
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
    var tables = List(base.toLong -> cur)
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
      tables ::= k -> cur
    }
    // total order: dense depth-rank, ties by (doc, pos)
    val ordered = cur
      .repartitionByRange(col("r"), col("_d"), col("pos"))
      .sortWithinPartitions("r", "_d", "pos")
    val sa = Partitioning.zipWithIndex(ordered, "rank")
      .select(col("_d"), col("pos"), (col("rank") + 1L).as("rank"))
    Built(docs, sa, tables)
  }

  def suffixArray(df: DataFrame, idCol: String, textCol: String,
                  depth: Int = 64, base: Int = 4): DataFrame =
    build(df, idCol, textCol, depth, base).sa
      .select(col("_d").as(idCol), col("pos"), col("rank"))

  /** Spec hook: force one construction to differentially pin the direct
    * sort and the doubling against each other on the same corpus. */
  private[graft] def suffixArrayForTest(df: DataFrame, idCol: String,
                                        textCol: String, depth: Int, base: Int,
                                        forceDoubling: Boolean): DataFrame = {
    val b = if (forceDoubling) buildDoubling(df, idCol, textCol, depth, base)
            else buildDirect(df, idCol, textCol, depth, base)
    b.sa.select(col("_d").as(idCol), col("pos"), col("rank"))
  }

  /** The adjacency-LCP path picker: per-row shuffle volume is ~depth
    * bytes ONCE for the prefix-carry join vs ~16 bytes × 2 sides ×
    * (log2(depth/base)+1) rounds (+ the base-char tails) for the
    * rank-compare descent, so the descent only wins past depth ≈
    * 32·log2(depth/base)+32 — and IterBench confirms the model's sign
    * at the default depth 64 (descent 1.25–1.8× SLOWER at 1×/10×
    * corpus). Below the crossover the single wide join is the cheaper
    * plan; above it the descent's bounded-width joins win and keep
    * per-row shuffle width independent of depth. */
  private def lcpOfAdjacent(built: Built, depth: Int, base: Int): DataFrame =
    if (depth >= RankCompareMinDepth) lcpByRankCompare(built, depth, base)
    else lcpByPrefixFold(built, depth)

  /** Measured/modeled crossover for [[lcpOfAdjacent]] (see its doc). */
  private[graft] val RankCompareMinDepth = 256

  /** Spec hook: force one LCP path to differentially pin the two
    * implementations against each other on the same corpus. */
  private[graft] def lcpPairsForTest(df: DataFrame, idCol: String,
                                     textCol: String, depth: Int, base: Int,
                                     rankCompare: Boolean): DataFrame = {
    val built = build(df, idCol, textCol, depth, base,
      needRankTables = rankCompare)
    val p = if (rankCompare) lcpByRankCompare(built, depth, base)
            else lcpByPrefixFold(built, depth)
    p.select(col("rank"), col("_d1"), col("_pos1"), col("_d2"),
      col("_pos2"), col("_lcp"))
  }

  /** Prefix-carry adjacency LCP — ONE self-join on rank moving a
    * depth-char prefix per row, then a bounded char fold. The cheaper
    * plan below the [[RankCompareMinDepth]] crossover, where depth
    * bytes/row undercut the descent's join rounds. */
  private def lcpByPrefixFold(built: Built, depth: Int): DataFrame = {
    // the direct build already sorted (and therefore carries) each
    // suffix's depth-char prefix — reuse it instead of re-joining the
    // full document text onto every suffix row (that join shuffled the
    // whole corpus a second time and re-sliced every prefix)
    val withPrefix = built.saPrefixed.getOrElse {
      built.sa.join(built.docs, Seq("_d"))
        .select(col("rank"), col("_d"), col("pos"), col("_len"),
          col("_t").substr((col("pos") + 1).cast("int"), lit(depth)).as("_p"))
    }
    val a = withPrefix.select((col("rank") + 1L).as("rank"),
      col("_d").as("_d1"), col("pos").as("_pos1"), col("_len").as("_len1"),
      col("_p").as("_p1"))
    val b = withPrefix.select(col("rank"), col("_d").as("_d2"),
      col("pos").as("_pos2"), col("_p").as("_p2"))
    withBoundedLcp(a.join(b, Seq("rank")), "_p1", "_p2", depth, "_lcp")
      .select(col("rank"), col("_d1"), col("_pos1"), col("_len1"),
        col("_d2"), col("_pos2"), col("_lcp"))
  }

  /** Bounded common-prefix length of two (≤ depth char) strings as a
    * CODEGEN-FRIENDLY unrolled expression — binary lifting: log2(depth)+1
    * chained block-equality steps (each a plain substring compare Spark
    * whole-stage-compiles), replacing the interpreted `aggregate`
    * higher-order fold that evaluated a lambda per character per row.
    *
    * Step soundness: a step advances `acc` by `step` when the next
    * `step`-char blocks compare equal. SQL substring truncates at the
    * string end, so a TRUNCATED-equal block can over-advance — but only
    * when BOTH strings end inside the block with identical tails, in
    * which case the strings are entirely equal from `acc` on and the
    * true bounded lcp is exactly min(length(p1), length(p2)); the final
    * least() cap restores it. Greedy powers-of-two reach any value up to
    * 2·highestOneBit(depth)−1 ≥ depth. Differentially pinned against the
    * brute char fold in SuffixArraySpec (handcrafted + fuzz). */
  private def withBoundedLcp(df: DataFrame, p1: String, p2: String,
                             depth: Int, out: String): DataFrame = {
    // LINEARIZED lift (round 20): each step materializes `acc` as a named
    // column before the next references it. A single nested Column
    // referenced acc 4× per step, growing the expression tree ~4^(log2
    // depth + 1) (~16k nodes at depth 64) — Catalyst analysis time blew
    // up with depth and the generated method risked the 64KB JVM limit.
    // CollapseProject cannot re-inline the chain: each layer's CaseWhen
    // is non-cheap and referenced more than once by the next. Plan depth
    // stays O(log depth), one whole-stage-codegen span.
    var cur = df.withColumn(out, lit(0L))
    var step = Integer.highestOneBit(depth)
    while (step >= 1) {
      cur = cur.withColumn(out,
        when(col(p1).substr((col(out) + 1L).cast("int"), lit(step)) ===
            col(p2).substr((col(out) + 1L).cast("int"), lit(step)),
          col(out) + step.toLong).otherwise(col(out)))
      step /= 2
    }
    cur.withColumn(out, least(col(out), length(col(p1)).cast("long"),
      length(col(p2)).cast("long"), lit(depth.toLong)))
  }

  /** Bounded LCP of every ADJACENT suffix pair in SA order, by the
    * classic RANK-COMPARE binary descent (Manber-Myers): the doubling
    * already ranked every position at each power-of-two depth, and
    * rank_d(x) = rank_d(y) ⟺ the d-bounded prefixes from x and y are
    * identical (truncation included). So descend d = depth, depth/2, …,
    * base: whenever the ranks at offset `lcp` agree, the next
    * min(d, chars left) characters match — advance lcp; any bounded
    * lcp value is reachable because the level sizes are the binary
    * digits. The final `base-1` characters (below the coarsest table)
    * resolve against a (base-1)-char tail column — the ONLY string that
    * moves, and it is capped by `base`, never `depth`: every descent
    * join is keyed and valued in 8-byte columns, where a prefix-carry
    * formulation would shuffle depth bytes per position.
    *
    * Output: one row per adjacent pair, (rank, _d1, pos1, _len1, _d2,
    * pos2, _lcp) with rank = the LATER suffix's rank and (1) the
    * SA-earlier suffix. Cost: log2(depth/base)+1 join rounds, each two
    * corpus-linear 8-byte-keyed lookups. */
  private def lcpByRankCompare(built: Built, depth: Int, base: Int): DataFrame = {
    val sa = built.sa
    val a = sa.select((col("rank") + 1L).as("rank"), col("_d").as("_d1"),
      col("pos").as("_pos1"))
    val b = sa.select(col("rank"), col("_d").as("_d2"), col("pos").as("_pos2"))
    val lens = built.docs.select(col("_d").as("_d1"), col("_len").as("_len1"))
    var p = a.join(b, Seq("rank")).join(lens, Seq("_d1"))
      .withColumn("_lcp", lit(0L))
    for ((d, rtab) <- built.rankTables) {
      val r1 = rtab.select(col("_d").as("_d1"), col("pos").as("_k1"),
        col("r").as("_r1"))
      val r2 = rtab.select(col("_d").as("_d2"), col("pos").as("_k2"),
        col("r").as("_r2"))
      p = p.withColumn("_k1", col("_pos1") + col("_lcp"))
        .withColumn("_k2", col("_pos2") + col("_lcp"))
        .join(r1, Seq("_d1", "_k1"), "left")
        .join(r2, Seq("_d2", "_k2"), "left")
        // equal ranks ⇒ the next characters match; the advance is capped
        // by the depth bound and by the suffix's remaining length (a
        // truncated-equal key means BOTH suffixes end there)
        .withColumn("_lcp", when(col("_r1").isNotNull && col("_r1") === col("_r2"),
          col("_lcp") + greatest(lit(0L), least(lit(d),
            lit(depth.toLong) - col("_lcp"), col("_len1") - col("_k1"))))
          .otherwise(col("_lcp")))
        .drop("_r1", "_r2", "_k1", "_k2")
    }
    if (base > 1) {
      // sub-base residue: at most base-1 more characters can match; a
      // bounded char fold over (base-1)-char tails resolves them
      val tails = built.docs.select(col("_d"),
          explode(sequence(lit(0L), col("_len") - 1)).as("pos"), col("_t"))
        .select(col("_d"), col("pos"),
          col("_t").substr((col("pos") + 1).cast("int"), lit(base - 1)).as("_tl"))
      val t1 = tails.select(col("_d").as("_d1"), col("pos").as("_k1"),
        col("_tl").as("_tl1"))
      val t2 = tails.select(col("_d").as("_d2"), col("pos").as("_k2"),
        col("_tl").as("_tl2"))
      p = p.withColumn("_k1", col("_pos1") + col("_lcp"))
        .withColumn("_k2", col("_pos2") + col("_lcp"))
        .join(t1, Seq("_d1", "_k1"), "left")
        .join(t2, Seq("_d2", "_k2"), "left")
        .withColumn("_lcp", when(col("_tl1").isNotNull && col("_tl2").isNotNull,
          col("_lcp") + greatest(lit(0L), least(
            expr(s"""aggregate(sequence(1, ${base - 1}), 0, (acc, i) ->
              CASE WHEN acc = i - 1 AND i <= length(_tl1) AND i <= length(_tl2)
                    AND substring(_tl1, i, 1) = substring(_tl2, i, 1)
                THEN i ELSE acc END)""").cast("long"),
            lit(depth.toLong) - col("_lcp"))))
          .otherwise(col("_lcp")))
        .drop("_tl1", "_tl2", "_k1", "_k2")
    }
    p.select(col("rank"), col("_d1"), col("_pos1"), col("_len1"),
      col("_d2"), col("_pos2"), col("_lcp"))
  }

  /** The LCP array to [[suffixArray]]'s SA — together they are the
    * complete duplicate-enumeration structure (every repeated run of
    * length ℓ ≤ depth appears as an adjacent pair with lcp ≥ ℓ): one
    * row per suffix, (idCol, pos, rank, lcp), lcp = bounded common
    * prefix with the rank-predecessor, lcp(rank 1) = 0. Rank-compare
    * descent ([[lcpOfAdjacent]]) — no depth-char column shuffles. */
  def lcpArray(df: DataFrame, idCol: String, textCol: String,
               depth: Int = 64, base: Int = 4): DataFrame = {
    val built = build(df, idCol, textCol, depth, base)
    val pairLcp = lcpOfAdjacent(built, depth, base)
      .select(col("rank"), col("_lcp"))
    built.sa.join(pairLcp, Seq("rank"), "left")
      .select(col("_d").as(idCol), col("pos"), col("rank"),
        coalesce(col("_lcp"), lit(0L)).as("lcp"))
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
    * Scale: the SA's O(log depth) rounds plus the rank-compare descent
    * ([[lcpOfAdjacent]], 8-byte columns only); document text joins back
    * ONLY for pairs already past the minLen filter — the duplicated
    * subset — to render rep_text for the TakeOrdered top-k. */
  def longestRepeats(df: DataFrame, idCol: String, textCol: String,
                     depth: Int = 64, base: Int = 4, minLen: Int = 8,
                     k: Int = 50): DataFrame = {
    require(minLen >= 1 && k >= 1)
    val built = build(df, idCol, textCol, depth, base)
    val hits = lcpOfAdjacent(built, depth, base)
      .filter(col("_lcp") >= minLen)
    hits.join(built.docs.select(col("_d").as("_d1"), col("_t")), Seq("_d1"))
      .withColumn("rep_text",
        col("_t").substr((col("_pos1") + 1).cast("int"), col("_lcp").cast("int")))
      .orderBy(col("_lcp").desc, col("rep_text"), col("_d1"), col("_pos1"))
      .limit(k)
      .select(col("_lcp").as("lcp"), col("rep_text"), col("_d1").as("id1"),
        col("_pos1").as("pos1"), col("_d2").as("id2"), col("_pos2").as("pos2"))
  }
}
