package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-to-training-example transforms: chunking, context packing,
  * PII scrubbing, corpus-statistics scoring.
  *
  * All declarative (built-in array/window functions — whole-stage codegen,
  * no UDF in the hot path) and deterministic, so every transform is
  * oracle-replayable and retry-stable.
  */
object TextPipeline {

  /** Split each document into overlapping fixed-size token windows
    * ("chunks") — the standard long-document → context-window transform.
    * Emits (id, chunk_idx, chunk_text, n_tokens). `stride = size - overlap`
    * tokens between chunk starts; the final partial chunk is kept iff it
    * adds unseen tokens.
    *
    * Pure per-row array work (split → slice loop via transform) — no
    * shuffle, no UDF; at 100 TB this runs fused into the scan. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize)
    val stride = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    // Chunk k starts at token k*stride and covers previously-unseen tokens
    // iff k*stride + overlap < n, so #chunks = ceil((n-overlap)/stride) —
    // floored at 1 for any non-empty doc (a doc shorter than the overlap
    // still yields its one chunk). Empty docs emit nothing.
    val nChunks = when(size(toks) > 0,
      greatest(ceil((size(toks).cast("double") - overlap) / stride), lit(1))
        .cast("int")).otherwise(0)
    df.select(col(idCol), toks.as("_toks"), nChunks.as("_nc"))
      // guard BEFORE explode: sequence(0, -1) is a DESCENDING [0,-1] in
      // Spark, so an unguarded empty doc would emit two phantom chunks
      .filter(col("_nc") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0), col("_nc") - 1)))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_toks"), col("chunk_idx") * stride + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(size(col("_toks")) - col("chunk_idx") * stride, lit(chunkSize))
          .as("n_tokens"))
  }

  /** CONTENT-DEFINED chunking (Rabin-style CDC; public: Muthitacharoen
    * et al., "A Low-Bandwidth Network File System", SOSP 2001 — the
    * chunking storage and dataset dedup systems use for SHIFT-ROBUST
    * duplicate detection): a chunk boundary falls AFTER character
    * position i (1-based, i ≥ window) whenever the rolling hash of the
    * `window` chars ending at i satisfies
    *
    *   (fnv1a64(text[i−window+1 .. i]) >>> 11) % divisor == remainder
    *
    * so boundaries depend only on LOCAL content: inserting or deleting
    * text early in a document perturbs only the chunks it touches, and
    * every later chunk keeps its content identity — the property
    * [[chunk]]'s aligned windows lack (one inserted char shifts every
    * aligned chunk). That is what makes CDC-chunk dedup catch duplicated
    * content at ARBITRARY offsets with a plain hash-aggregate.
    *
    * This is the PURE hash-gated form — no min/max chunk-size smoothing.
    * Smoothing is a per-doc sequential fold (each boundary's eligibility
    * depends on the previous accepted boundary) trivially added inside
    * the same HOF; the pure form keeps every boundary decision
    * position-independent, which is what the dedup semantics need and
    * what keeps the oracle plain SQL. Expected chunk length is
    * `divisor` chars (geometric); the >>> 11 keeps the draw non-negative
    * in a signed engine so two's-complement and unsigned `%` agree (the
    * BPE-dropout device).
    *
    * Character-level and raw-text (CDC is a content transform, not a
    * token one — [[graft.operators.Dedup.dedupCdcKeepFirst]] rides it).
    * Emits (idCol, chunk_idx 0-based, start 1-based, chunk_text); chunks
    * tile the raw text exactly (concat in idx order == text; spec-pinned).
    * Empty docs emit nothing. Pure per-row array work — no shuffle, no
    * UDF; at 100 TB this runs fused into the scan. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                window: Int, divisor: Long, remainder: Long,
                forceNative: Option[Boolean] = None): DataFrame = {
    require(window >= 1 && divisor >= 1 && remainder >= 0 && remainder < divisor)
    graft.functions.GraftExtensions.register(df.sparkSession)
    // default: the codegen'd CdcCutsExpr (one JVM loop per doc); the SQL
    // HOF form is retained as the differential-spec reference — Spark
    // runs HOF lambdas INTERPRETED, one tree walk per char position
    // (measured 5.5× the aligned sibling at sf0.1 before the promotion).
    // guard: Spark's sequence(a, b) DESCENDS when b < a, so a doc shorter
    // than the window must short-circuit to "no boundaries" explicitly
    val boundarySql =
      s"""CASE WHEN length($textCol) >= $window THEN
         filter(sequence(${window}L, CAST(length($textCol) AS BIGINT)),
           i -> i < CAST(length($textCol) AS BIGINT) AND
             (shiftrightunsigned(fnv1a64(substring($textCol,
                CAST(i - ${window}L + 1L AS INT), $window)), 11)
              % ${divisor}L) = ${remainder}L)
         ELSE CAST(array() AS ARRAY<BIGINT>) END"""
    val cutsSql =
      s"""concat(array(0L), $boundarySql,
         array(CAST(length($textCol) AS BIGINT)))"""
    val cuts =
      if (forceNative.getOrElse(true))
        graft.functions.CdcCutsExpr(col(textCol), window, divisor, remainder)
      else expr(cutsSql)
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol), cuts.as("_cuts"))
      .select(col(idCol), col(textCol),
        posexplode(expr(
          s"""transform(sequence(1, size(_cuts) - 1),
             j -> named_struct(
               'start', element_at(_cuts, j) + 1L,
               'len', element_at(_cuts, j + 1) - element_at(_cuts, j)))""")))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col.start").as("start"),
        expr(s"substring($textCol, CAST(col.start AS INT), CAST(col.len AS INT))")
          .as("chunk_text"))
  }

  /** Token-budget packing: assign documents, in a deterministic order, to
    * consecutive bins of ≈`budget` tokens — the scalable form of
    * context-window packing. Bin id = which budget-multiple the doc's last
    * token (on the capped cumulative-token axis) falls in, so each bin's
    * capped token mass deviates from `budget` by at most the largest
    * capped doc — bounded waste, like next-fit, but expressible as ONE
    * window cumsum (one sort shuffle, no sequential scan: exact next-fit
    * needs a running reset that no prefix aggregate can express).
    * Oversized docs (> budget) count as exactly `budget` toward the
    * cumulative axis: they always start a fresh bin, and they cannot
    * inflate later docs' bin indices past one boundary. */
  def packBudget(df: DataFrame, orderCol: String, tokenCol: String,
                 budget: Long, partCol: Column = lit(0),
                 binCol: String = "bin"): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(partCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIncl = sum(least(col(tokenCol), lit(budget))).over(w)
    df.withColumn(binCol, floor((cumIncl - 1) / budget).cast("long"))
  }

  /** PII scrubbing: mask emails, long digit runs (phone/account numbers),
    * and IPv4 addresses; count replacements per category for audit.
    * RE2-compatible patterns (no backrefs/lookahead) so the same regexes
    * run identically in Spark (Java regex) and the DuckDB oracle (RE2). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val DigitRunRe = "\\b[0-9][0-9 -]{6,}[0-9]\\b"

  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, DigitRunRe, "<NUMBER>")
    df.withColumn("n_emails", size(regexp_extract_all(t0, lit(EmailRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t1, lit(Ipv4Re), lit(0))))
      .withColumn("n_numbers", size(regexp_extract_all(t2, lit(DigitRunRe), lit(0))))
      .withColumn("clean_text", t3)
  }

  /** Corpus-wide span-level exact dedup (the C4 duplicate-line /
    * Lee-et-al duplicated-substring removal, at fixed token-span
    * granularity): split each doc into consecutive `spanTokens`-token
    * spans, keep only each distinct span's FIRST occurrence in corpus
    * order (doc id, then position), and rebuild documents from their
    * surviving spans. Boilerplate repeated across documents vanishes
    * everywhere but its first appearance.
    *
    * One window pass over the exploded spans (shuffle keyed on span text —
    * hot boilerplate spans are exactly the skew candidates; the window is
    * a running min, so AQE skew-split applies) and one per-doc
    * re-aggregation. Deterministic: "first" is a total order, so the
    * output is reproducible under any partitioning. */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String,
                 spanTokens: Int): DataFrame = {
    require(spanTokens > 0)
    val toks = TextFunctions.tokens(col(textCol))
    val spans = df
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), ceil(size(toks).cast("double") / spanTokens).cast("int") - 1),
        i => array_join(slice(toks, i * spanTokens + 1, lit(spanTokens)), " "))))
      .toDF(idCol, "span_idx", "span")
      .filter(col("span") =!= "") // empty doc → single empty span, drop
    val w = Window.partitionBy(col("span"))
      .orderBy(col(idCol), col("span_idx"))
    val marked = spans.withColumn("_rn", row_number().over(w))
    marked.groupBy(col(idCol)).agg(
      array_join(transform(array_sort(collect_list(
        when(col("_rn") === 1, struct(col("span_idx"), col("span"))))),
        s => s.getField("span")), " ").as("clean_text"),
      sum(when(col("_rn") === 1, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("_rn") =!= 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** RefinedWeb-style frequency span removal (Penedo et al. 2023 §G.2
    * line-level deduplication; MassiveText's repeated-line filter): a
    * span occurring MORE than `maxOcc` times across the corpus is
    * boilerplate (navigation chrome, license headers, templated prose)
    * and is removed from EVERY document — including the first occurrence,
    * the semantic difference from [[dedupSpans]]' keep-first rule — and a
    * document that loses more than `maxRemovedFrac` of its spans is
    * flagged dropped outright (RefinedWeb's document-removal correction:
    * a doc that was mostly boilerplate is not worth the residue). Spans
    * are consecutive `spanTokens`-token units, the corpus's line analogue
    * (the synthetic corpus has no newlines; on real crawl text pass the
    * text pre-split on newlines through the same rule).
    *
    * Output: (idCol, n_spans, n_removed, text_clean, doc_dropped), one
    * row per input doc with at least one span.
    *
    * Scale: one exploded-span aggregate keyed on the span text for the
    * corpus-wide counts (map-side partial aggregation absorbs in-doc
    * repeats), one join back on the same key — partitioning reuse, no
    * second shuffle genre — and one per-doc reassembly. Linear end to
    * end; no pairwise work at any corpus size. At 100 TB group on an
    * 8-byte span fingerprint ((h, h2) like the chunk family) instead of
    * the span string to keep shuffle rows narrow. */
  def dropFrequentSpans(df: DataFrame, idCol: String, textCol: String,
                        spanTokens: Int, maxOcc: Long,
                        maxRemovedFrac: Double): DataFrame = {
    require(spanTokens > 0 && maxOcc >= 1)
    val toks = TextFunctions.tokens(col(textCol))
    val spans = df
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), ceil(size(toks).cast("double") / spanTokens).cast("int") - 1),
        i => array_join(slice(toks, i * spanTokens + 1, lit(spanTokens)), " "))))
      .toDF(idCol, "span_idx", "span")
      .filter(col("span") =!= "")
    val freq = spans.groupBy(col("span")).agg(count(lit(1)).as("_f"))
    spans.join(freq, Seq("span"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("_f") > maxOcc, 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(array_sort(collect_list(
          when(col("_f") <= maxOcc, struct(col("span_idx"), col("span"))))),
          s => s.getField("span")), " ").as("text_clean"))
      .withColumn("doc_dropped",
        col("n_removed").cast("double") / col("n_spans") > maxRemovedFrac)
  }

  /** Unigram log-probability scoring — the cheap stand-in for the CCNet/
    * KenLM perplexity filter: score(doc) = mean over tokens of
    * ln P(token | corpus), with add-one smoothing over the corpus vocab.
    * Low (very negative) scores = rare-token soup (boilerplate, garbled
    * encodings); high = common fluent text.
    *
    * Two aggregations over the exploded token stream (corpus counts, then
    * per-doc mean of broadcast-joined log-probs). The unigram table is
    * vocab-sized — orders smaller than the corpus — and broadcasts; at
    * 100 TB cap it with a min-count cutoff so it stays broadcastable. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
                     minCount: Long = 1L): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val totals = counts.agg(sum("cnt").as("total"), count(lit(1)).as("vocab"))
    val probs = counts.crossJoin(broadcast(totals))
      .select(col("tok"),
        log((col("cnt") + 1).cast("double") / (col("total") + col("vocab")))
          .as("logp"))
    toks.join(broadcast(probs), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(avg(col("logp")).as("logprob"), count(lit(1)).as("n_toks"))
  }

  /** Per-document average bigram conditional log-probability — the CCNet /
    * Wikipedia-LM perplexity-filtering signal one order up from
    * [[unigramLogProb]]: P(b|a) = (C(a,b) + 1) / (C(a) + V) (add-one over
    * the observed vocabulary), doc score = avg ln P over its bigrams.
    * Deterministic and oracle-replayable (integer counts; ln-ulp drift
    * absorbed by 6-decimal rounding at the call site — the qb9 device).
    *
    * Shape at scale: bigram pairs come from an in-row `transform` over
    * the token array (NO shuffle, no self-join on position); the two
    * model aggregates (bigram counts keyed (a, b), unigram counts keyed
    * a) are vocabulary²-bounded in theory but observed-bigram-bounded in
    * practice — at 100 TB apply `minCount` to cap the model the same way
    * CCNet prunes its LM, and the score join keys on (a, b) with the
    * model side read pre-aggregated. Docs with < 2 tokens score null
    * with n_bigrams = 0 (no bigram evidence — callers decide the policy). */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    minCount: Long = 1L): DataFrame = {
    val withToks = df.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("t"))
    val bigrams = withToks.select(col(idCol),
      explode(when(size(col("t")) > 1,
        expr("transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS a, t[i] AS b))"))
        .otherwise(expr("array()::array<struct<a:string,b:string>>"))).as("bg"))
      .select(col(idCol), col("bg.a").as("a"), col("bg.b").as("b"))
    val bgCounts = bigrams.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minCount)
    val uniCounts = withToks.select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ca"))
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val probs = bgCounts
      .join(uniCounts.select(col("tok").as("a"), col("ca")), Seq("a"))
      .crossJoin(broadcast(vocab))
      .select(col("a"), col("b"),
        log((col("cab") + 1).cast("double") / (col("ca") + col("v"))).as("logp"))
    val scored = bigrams.join(probs, Seq("a", "b"), "left")
      .groupBy(col(idCol))
      .agg(avg(col("logp")).as("logprob"), count(lit(1)).as("n_bigrams"))
    // docs that produced no bigrams (< 2 tokens) still get a row
    df.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col("logprob"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** Per-document average INTERPOLATED KNESER-NEY bigram conditional
    * log-probability — the LM-perplexity filter signal with the smoothing
    * actually used by n-gram LMs (public: Kneser & Ney 1995; Chen &
    * Goodman 1999), one modeling step past [[bigramLogProb]]'s add-one:
    *
    *   P(b|a) = max(C(a,b) − D, 0)/C(a·) + D·N1+(a·)/C(a·) · N1+(·b)/N1+(··)
    *
    * with discount D = 3/4. Every ingredient is an integer (bigram count,
    * left-context token count, distinct right/left continuation counts,
    * total bigram types), so with D as the rational 3/4 the probability
    * is the exact ratio
    *
    *   [(4·C(a,b) − 3)·N + 3·N1+(a·)·N1+(·b)] / (4·C(a·)·N),  N = N1+(··)
    *
    * computed identically by any engine; only the final ln is float, and
    * 6-decimal rounding at the call site absorbs libm ulp drift (the qb9
    * device, same as [[bigramLogProb]]). Scoring the model's own corpus
    * means every bigram is seen, so the max(·,0) clamp never binds and no
    * OOV backoff path is needed.
    *
    * Shape at scale: identical to [[bigramLogProb]] — in-row bigram
    * expansion (no shuffle), observed-bigram-bounded model aggregates
    * (the N1+ columns are BY-PRODUCTs of the (a,b) count — one extra
    * grouped count each, no new corpus pass), score join keyed (a, b).
    * Docs with < 2 tokens: null score, n_bigrams = 0. */
  def kneserNeyBigramLogProb(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val withToks = df.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("t"))
    val bigrams = withToks.select(col(idCol),
      explode(when(size(col("t")) > 1,
        expr("transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS a, t[i] AS b))"))
        .otherwise(expr("array()::array<struct<a:string,b:string>>"))).as("bg"))
      .select(col(idCol), col("bg.a").as("a"), col("bg.b").as("b"))
    val cab = bigrams.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val left = cab.groupBy("a")
      .agg(sum("cab").as("ca"), count(lit(1)).as("n1a"))
    val right = cab.groupBy("b").agg(count(lit(1)).as("n1b"))
    val types = cab.agg(count(lit(1)).as("nn"))
    val probs = cab
      .join(left, Seq("a")).join(right, Seq("b"))
      .crossJoin(broadcast(types))
      .select(col("a"), col("b"),
        log(((greatest(lit(4) * col("cab") - 3, lit(0)) * col("nn") +
            lit(3) * col("n1a") * col("n1b")).cast("double")) /
          ((lit(4) * col("ca") * col("nn")).cast("double"))).as("logp"))
    val scored = bigrams.join(probs, Seq("a", "b"), "left")
      .groupBy(col(idCol))
      .agg(avg(col("logp")).as("logprob"), count(lit(1)).as("n_bigrams"))
    df.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col("logprob"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020 §4.4):
    * per-language head/middle/tail thirds by language-model score — the
    * standard curation split where "head" (lowest perplexity = highest
    * mean log-probability) feeds high-quality training mixes, "middle"
    * is kept with caution, and "tail" is dropped or down-weighted. The
    * LM is [[kneserNeyBigramLogProb]] (the corpus-trained interpolated
    * Kneser-Ney bigram — the KenLM stand-in this module uses throughout);
    * CCNet's per-language thirds are exact ntile(3) over the
    * 6-decimal-rounded score (engine-portable ordering — the qb9 device)
    * with id tie-breaks, docs without bigrams sorting last (sentinel).
    *
    * Output: (idCol, langCol, logprob, n_bigrams, ppl_bucket) with
    * ppl_bucket ∈ head|middle|tail, one row per input doc.
    *
    * Scale: the LM tables are vocab-sized broadcasts (inherited). The
    * tertile is NOT a language-keyed `ntile` window — a one-language
    * corpus (the common CCNet deployment) would funnel 100 TB through
    * ONE task. Instead each language is ranked by
    * [[Partitioning.groupedRankAdaptive]] — a language key routes to
    * [[Partitioning.groupedRank]] verbatim (range-partition on
    * (lang, score, id) so a dominant language SPANS partitions, then
    * the two-phase counts-then-offsets scan), while a web-scale group
    * key fed through the same report keeps driver state O(P) — and the
    * bucket
    * is derived from (rank, language count) by exact ntile arithmetic:
    * with q = N div 3, rem = N mod 3, the first `rem` buckets take
    * q + 1 rows — bit-identical to SQL `ntile(3)`, which both engines'
    * oracles still use. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        langCol: String): DataFrame = {
    val scored = kneserNeyBigramLogProb(df, idCol, textCol)
    val base = df.select(col(idCol), col(langCol)).join(scored, Seq(idCol))
    // adaptive route: a language key is small-G/dominant-group (takes
    // groupedRank verbatim, zero behavior change), but nothing stops a
    // caller feeding a web-scale key through the same report — the route
    // keeps driver state O(P) there instead of O(G)
    val ranked = Partitioning.groupedRankAdaptive(base, langCol,
      Seq(coalesce(round(col("logprob"), 6), lit(-1e18)).desc, col(idCol).asc),
      "_rk")
    val totals = ranked.groupBy(col(langCol)).agg(count(lit(1)).as("_N"))
    ranked.join(broadcast(totals), Seq(langCol))
      .withColumn("_q", expr("_N DIV 3"))
      .withColumn("_rem", expr("_N % 3"))
      // exact ntile(3) from (rank, N); the q = 0 divisor never evaluates
      // (N < 3 implies every rank sits in the first `rem` buckets), the
      // greatest() only keeps ANSI div-by-zero out of the branch
      .withColumn("_nt", when(col("_rk") <= col("_rem") * (col("_q") + 1),
          expr("(_rk - 1) DIV (_q + 1) + 1"))
        .otherwise(expr("_rem + (_rk - _rem * (_q + 1) - 1) DIV greatest(_q, 1L) + 1")))
      .select(col(idCol), col(langCol), col("logprob"), col("n_bigrams"),
        when(col("_nt") === 1, "head").when(col("_nt") === 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Per-document top-`k` terms by smoothed TF-IDF — the classic keyword /
    * topic-signal extractor (tf · (ln((N+1)/(df+1)) + 1), the smooth-idf
    * variant that never zeroes a term appearing in every doc).
    *
    * Rank is taken over the 6-decimal-rounded score with a term-ascending
    * tie-break, so the ordering is engine-portable (ln may differ by 1 ulp
    * between libm implementations; 6 decimals absorbs it — the qb9 device).
    *
    * Shape at scale: one exploded-token aggregate for per-doc tf (keyed on
    * (doc, term) — partial aggregation absorbs in-doc repeats map-side),
    * one vocab-sized df aggregate whose result BROADCASTS back (vocab ≪
    * corpus; cap with a min-df cutoff at 100 TB like unigramLogProb), and
    * one per-doc window for the top-k — the window repartitions on doc id,
    * the same key the tf aggregate already produced, so AQE/EnsureRequirements
    * reuses the partitioning instead of a second full shuffle. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfCounts = toks.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.select(col(idCol)).distinct().count()
    val scored = tf.join(broadcast(dfCounts), Seq("term"))
      .withColumn("tfidf", round(col("tf") *
        (log((lit(nDocs) + 1).cast("double") / (col("df") + 1)) + 1), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Okapi BM25 document ranking for a fixed term set — the standard
    * lexical retrieval scorer:
    *
    *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    *   idf(t)   = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
    *
    * Returns every document matching ≥1 query term with its rounded score
    * (order by score desc, id asc downstream for a stable top-k). All
    * inputs to the floating math are exact integers (tf, df, N, doc
    * lengths), divisions are IEEE-exact, and ln sits under a 6-decimal
    * round — engine-portable like [[tfidfTopTerms]].
    *
    * Shape at scale: doc lengths fuse into the token scan; the query-term
    * df/idf table is |terms| rows and BROADCASTS, as does the 1-row
    * (N, avgdl) frame; the only shuffle is the per-doc score aggregate
    * keyed on doc id. The corpus is never joined against itself. */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k1: Double = 1.2,
               b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Rank needs at least one query term")
    // two scan-fused passes over the corpus (doc lengths; query-term tf)
    // rather than caching the exploded token stream — the explode output
    // is LARGER than the input text, so at 100 TB a second columnar scan
    // beats pinning it in storage memory
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_toks"))
    val qset = queryTerms.map(_.toLowerCase)
    val qtf = toks.filter(col("term").isin(qset: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val qdf = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = qdf.crossJoin(broadcast(stats))
      .select(col("term"),
        log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          .as("idf"))
    qtf.join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .join(broadcast(idf), Seq("term"))
      .withColumn("avgdl", col("total_toks").cast("double") / col("n_docs"))
      .withColumn("contrib", col("idf") * col("tf") * (k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum("contrib"), 6).as("bm25"),
        count(lit(1)).as("n_matched"))
  }

  /** Corpus-frequency boilerplate removal (the CCNet / RefinedWeb
    * "frequent paragraph" filter, at fixed token-span granularity): drop
    * EVERY occurrence of any span that appears in more than `maxDf`
    * distinct documents — nav bars, cookie banners, license headers.
    * Complementary to [[dedupSpans]], which keeps first occurrences:
    * boilerplate is noise in all its copies, so none survives.
    *
    * Emits (id, clean_text, n_spans, n_removed).
    *
    * Shape at scale: one df-count aggregate keyed on span text, whose
    * OUTPUT after the `> maxDf` filter is only the frequency head — tiny
    * by Zipf, so it broadcasts and the removal is a map-side hash-lookup
    * join against the re-scanned spans; the corpus itself never shuffles
    * except the final per-doc rebuild keyed on doc id. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        spanTokens: Int, maxDf: Long): DataFrame = {
    require(spanTokens > 0 && maxDf >= 1)
    val toks = TextFunctions.tokens(col(textCol))
    val spans = df
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), ceil(size(toks).cast("double") / spanTokens).cast("int") - 1),
        i => array_join(slice(toks, i * spanTokens + 1, lit(spanTokens)), " "))))
      .toDF(idCol, "span_idx", "span")
      .filter(col("span") =!= "")
    val hot = spans.groupBy(col("span"))
      .agg(countDistinct(col(idCol)).as("span_df"))
      .filter(col("span_df") > maxDf)
      .select(col("span"), lit(true).as("_hot"))
    spans.join(broadcast(hot), Seq("span"), "left")
      .groupBy(col(idCol)).agg(
        array_join(transform(array_sort(collect_list(
          when(col("_hot").isNull, struct(col("span_idx"), col("span"))))),
          s => s.getField("span")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"),
        sum(when(col("_hot").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Collapse period-`k` token repetition WITHIN a document — the removal
    * counterpart of the Gopher repetition SIGNALS (qcg measures duplicate
    * n-gram fractions; this actually trims the runs). A position `s` is a
    * redundant gram start iff the k-gram starting at `s` equals the
    * k-gram starting at `s − k` (one period earlier); every token covered
    * by a redundant gram is dropped, so "buy now buy now buy now" at
    * k = 2 collapses to one "buy now" and "a a a a" collapses to "a a"
    * (period 2 sees the overlapping pair repeat). Trailing partial
    * repeats shorter than a full gram are kept — the rule is purely
    * local, which is what makes it exactly replayable by a SQL oracle
    * (and what bounds its cost: each position does one k-token compare
    * against its left neighborhood, no global state).
    *
    * The kernel is the native codegen expression
    * [[graft.functions.PeriodicTrimExpr]] (one byte-span pass per row —
    * the equivalent HOF-lambda formulation measured ~3.5 ms/doc
    * interpreted): no explode, no shuffle, no UDF — a narrow map over
    * the corpus that composes with any scan and stays inside whole-stage
    * codegen. Output: (idCol, text_trimmed, n_dropped). */
  def trimPeriodicRepeats(df: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame = {
    require(k >= 1)
    df.withColumn("text_trimmed", graft.functions.PeriodicTrimExpr(col(textCol), k))
      .select(col(idCol), col("text_trimmed"),
        (size(TextFunctions.tokens(col(textCol))) -
          size(TextFunctions.tokens(col("text_trimmed"))))
          .cast("long").as("n_dropped"))
  }

  /** Pack the tokenized corpus into FIXED-length training sequences that
    * span document boundaries — the final-mile layout step of an LLM data
    * pipeline ([[packBudget]] bins whole documents under a budget; this
    * splits the token stream itself at exact multiples of `seqLen`, the
    * "concat-and-chunk" regime every causal-LM trainer consumes). Token
    * order is document order (ascending idCol) then position; global
    * token offsets come from [[Partitioning.prefixSum]] (two-phase scan,
    * never a one-task window), so sequence `g` holds exactly tokens
    * [g·seqLen, (g+1)·seqLen) of the concatenated corpus — a
    * deterministic function of the data that an external oracle replays.
    *
    * Output: (seq_id, n_toks, n_docs, seq_text) — n_toks = seqLen except
    * for the final partial sequence; n_docs counts the documents a
    * sequence spans. Shape at 100 TB: the prefix sum is two linear
    * passes + P driver longs; the explode is corpus-token rows but
    * map-local; the only wide state is the groupBy on seq_id, whose
    * groups are bounded at seqLen tokens — no skew by construction. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int): DataFrame = {
    require(seqLen >= 1)
    // the prefix scan CARRIES the token arrays (round 20): one lineage
    // execution, offsets attached in the scan itself — the previous shape
    // checkpointed a token frame and paid a corpus-wide join (two more
    // exchanges) to reattach the offsets it had just computed. Trade (as
    // with any localCheckpoint): the truncated lineage is not recomputable
    // on executor loss — the job fails and the caller re-runs.
    val docs = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .withColumn("_n", size(col("w")))
    Partitioning.prefixSum(docs, idCol, "_n", "_off")
      .select(col(idCol), col("_off"), posexplode(col("w")))
      .select(col(idCol), (col("_off") + col("pos")).as("gpos"), col("col").as("tok"))
      .select(col(idCol), col("tok"),
        expr(s"gpos DIV ${seqLen}L").as("seq_id"), // integral div: exact past 2^53
        pmod(col("gpos"), lit(seqLen.toLong)).as("pos_in_seq"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_toks"),
        countDistinct(col(idCol)).as("n_docs"),
        array_join(transform(array_sort(collect_list(
          struct(col("pos_in_seq"), col("tok")))),
          x => x.getField("tok")), " ").as("seq_text"))
  }

  /** [[packSequences]] plus the DOC-BOUNDARY metadata a trainer needs to
    * keep packed documents independent: per sequence, the sorted
    * `pos:doc_id` list of where each contributing document's tokens begin
    * — exactly what attention-separator masks and per-doc loss masking
    * consume (packing without boundaries silently lets documents attend
    * across the concat seam). Boundary extraction is one more aggregate
    * on the ALREADY seq-keyed rows (per-(seq,doc) min position, then a
    * seq-level re-aggregate over ≤docs-per-seq rows), so the scale shape
    * of the packer is unchanged. */
  def packSequencesWithBoundaries(df: DataFrame, idCol: String,
                                  textCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1)
    // the prefix scan carries the token arrays — see packSequences; the
    // scan's materialized result feeds both downstream consumers (seqs,
    // bounds) with no join-back
    val docs = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .withColumn("_n", size(col("w")))
    val toks = Partitioning.prefixSum(docs, idCol, "_n", "_off")
      .select(col(idCol), col("_off"), posexplode(col("w")))
      .select(col(idCol), (col("_off") + col("pos")).as("gpos"), col("col").as("tok"))
      .select(col(idCol), col("tok"),
        expr(s"gpos DIV ${seqLen}L").as("seq_id"),
        pmod(col("gpos"), lit(seqLen.toLong)).as("pos_in_seq"))
    val seqs = toks.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_toks"),
        countDistinct(col(idCol)).as("n_docs"),
        array_join(transform(array_sort(collect_list(
          struct(col("pos_in_seq"), col("tok")))),
          x => x.getField("tok")), " ").as("seq_text"))
    val bounds = toks.groupBy(col("seq_id"), col(idCol))
      .agg(min(col("pos_in_seq")).as("p"))
      .groupBy(col("seq_id"))
      .agg(array_join(transform(array_sort(collect_list(
          struct(col("p"), col(idCol).as("d")))),
          x => concat(x.getField("p").cast("string"), lit(":"),
            x.getField("d").cast("string"))), " ").as("boundaries"))
    seqs.join(bounds, Seq("seq_id"))
  }

  /** Byte-pair-encoding pair statistics — the inner step of tokenizer
    * training: corpus word counts, words as character-symbol sequences
    * with an end-of-word marker, and the frequency of every adjacent
    * symbol pair (the quantity BPE takes the argmax of to pick the next
    * merge). Returns the top `k` pairs as (rnk, left, right, pair_count),
    * ranked by count desc with a (left, right) lexicographic tie-break so
    * the "next merge" is deterministic and engine-portable.
    *
    * Shape at scale: the corpus collapses to a VOCAB-sized word-count
    * frame in the first aggregate (map-side partial absorbs in-doc
    * repeats); everything after — char splitting, pair explosion, the
    * pair aggregate — runs on the vocabulary, orders of magnitude smaller
    * than the corpus. Top-k is TakeOrdered, no global sort. */
  def bpePairStats(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val words = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val syms = symSeed(col("word"))
    val pairs = words
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("lhs"),
          element_at(syms, i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))
    pairs.orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
      .limit(k)
      .withColumn("rnk", row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))))
      .select("rnk", "lhs", "rhs", "pair_count")
  }

  /** Full BPE merge-table training for `nMerges` rounds — repeatedly take
    * the most frequent adjacent symbol pair ([[bpePairStats]]'s argmax),
    * record it, and rewrite every word's symbol sequence with the pair
    * fused (greedy leftmost application, the reference BPE semantics).
    * Returns the merge table (round, left, right, pair_count).
    *
    * The merge application is a pure higher-order `aggregate` over each
    * word's symbol array (carry = (rebuilt prefix, pending symbol); a
    * pending==left && next==right fuses) — no UDF, and greedy-leftmost
    * falls out of the left fold ("aaa" + merge a+a → [aa, a]).
    *
    * Driver loop like [[graft.operators.GraphOps]] iterations: each round
    * is ONE vocabulary-sized aggregate (the corpus is only read once, in
    * the initial word count) plus a driver-held argmax — the same
    * O(rounds) driver state any BPE trainer keeps. The vocab frame is
    * cached and replaced each round. */
  /** Greedy-leftmost single-merge fold over a symbol-array column: fuse
    * every adjacent (l, r) into l+r, scanning left to right with a
    * one-symbol pending carry (a fused token never re-merges in the same
    * pass). SQL-literal-escapes the symbols — they come from corpus text. */
  private def mergeFoldSql(symsCol: String, l0: String, r0: String): String =
    mergeFoldBatchSql(symsCol, Seq((l0, r0)))

  /** [[mergeFoldSql]] over a symbol-DISJOINT merge BATCH: one pass fuses
    * every member pair ([[bpeTrainBatched]]'s rewrite, reused for encode)
    * — with no symbol shared across members' lefts, rights, and fused
    * outputs, a single pending-carry pass equals applying the members as
    * sequential passes in any order (fusing two symbols into one never
    * changes the adjacency of OTHER symbols, and a member's fused output
    * can never be another member's input). At most one member matches a
    * given (pending, next) pair, so branch order is immaterial. */
  private def mergeFoldBatchSql(symsCol: String,
                                pairs: Seq[(String, String)]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val branches = pairs.map { case (l0, r0) =>
      val (l, r) = (esc(l0), esc(r0))
      s"""WHEN acc.pending = '${l}' AND x = '${r}'
           THEN named_struct('out', array_append(acc.out, '${l}${r}'), 'pending', '')"""
    }.mkString("\n         ")
    s"""aggregate($symsCol,
       named_struct('out', array()::array<string>, 'pending', ''),
       (acc, x) -> CASE
         WHEN acc.pending = '' THEN named_struct('out', acc.out, 'pending', x)
         $branches
         ELSE named_struct('out', array_append(acc.out, acc.pending), 'pending', x)
       END,
       acc -> CASE WHEN acc.pending = '' THEN acc.out
                   ELSE array_append(acc.out, acc.pending) END)"""
  }

  /** Group a rank-ordered merge list into maximal CONTIGUOUS symbol-
    * disjoint batches for [[mergeFoldBatchSql]] / the dropout batch fold:
    * walking in rank order, a merge joins the current batch unless its
    * left, right, or fused output collides with any symbol already used
    * by the batch (lefts, rights, AND outputs — [[bpeTrainBatched]]'s
    * string-level non-overlap rule, which is what makes simultaneous
    * application order-free); a collision or the 64-member codegen CASE
    * cap closes the batch. Only contiguous ranks batch — encode must
    * apply merges in rank order, so reordering across a conflicting rank
    * is not available here (unlike the trainer's candidate selection).
    * Members carry their GLOBAL 1-based rank (the dropout draw key needs
    * it). */
  private[graft] def batchMerges(merges: Seq[(String, String)],
                                 maxBatch: Int = 64)
      : Seq[Seq[(Int, String, String)]] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, String, String)]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    val used = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      if (cur.size == maxBatch || used(l) || used(r) || used(l + r)) {
        groups += cur.toSeq
        cur.clear()
        used.clear()
      }
      cur += ((i + 1, l, r))
      used += l; used += r; used += (l + r)
    }
    if (cur.nonEmpty) groups += cur.toSeq
    groups.toSeq
  }

  /** Lineage-truncation cadence for the LITERAL encode fold chains: 512
    * nested aggregate folds overflow the JVM stack at TASK SERIALIZATION
    * (measured — IterBench `bpedrop`, sf0.1, java.lang.StackOverflowError
    * inside ObjectOutputStream; the failure is plan-depth, not data), so
    * every this-many folds the chain eagerly localCheckpoints —
    * [[bpeTrain]]'s every-16-rounds device applied to encode. Values do
    * not change (truncation only cuts lineage); the kernel path has no
    * chain and never needs it. */
  private val LiteralFoldCheckpointEvery = 48

  /** The BPE family's symbol seed: the word's Unicode CODE POINTS plus
    * the '</w>' end marker — one place, one contract. `split(word, '')`
    * IS code-point exact on Spark 4: `UTF8String.split` special-cases
    * the empty pattern to one piece per UTF-8 character (= code point;
    * no trailing empty, surrogate-pair-safe), unlike Java's
    * `String.split("", -1)` which both splits surrogate pairs and emits
    * a trailing "" — so a non-BMP character is ONE symbol, matching the
    * DuckDB oracles' `word[i]` indexing and the kernels' `codePoints()`
    * walks (spec-pinned: PipelineOpsSpec's "split('') sees code-point
    * symbols" and the non-BMP encode spec). */
  private def symSeed(word: Column): Column =
    concat(split(word, ""), array(lit("</w>")))

  /** Tokenize a corpus with a TRAINED merge list — the apply half of the
    * BPE tokenizer ([[bpeTrain]] learns the merges; this encodes with
    * them). Merges are applied in rank order, each as a greedy-leftmost
    * fold within the word — the standard merges.txt-driven encoder
    * (reference: the tokenizer side of the pipeline; public BPE per
    * Sennrich et al. 2016).
    *
    * Emits (idCol, n_words, n_tokens): the per-document token count under
    * the trained vocabulary — the number a packing / budget stage consumes.
    *
    * Shape at scale: encoding runs over the DISTINCT-word vocabulary
    * (Zipf-bounded, ≪ corpus); the corpus itself is touched twice — the
    * word-instance scan, and a broadcast join of word → token-length —
    * and shuffles once, on the final per-doc aggregate. The DEFAULT
    * per-word pass is [[graft.functions.BpeDropoutEncodeExpr]]'s kernel
    * at dropMille = 0 (every drop draw is statically false and elided,
    * so the kernel degenerates to plain rank-ordered greedy encoding —
    * merge-count-FLAT plans; IterBench `bpedrop` has the slopes).
    * `forceLiteral = Some(true)` retains the interpreted fold chains:
    * one [[mergeFoldBatchSql]] pass per contiguous symbol-disjoint
    * merge batch ([[batchMerges]]), or with `literalBatched = false`
    * one [[mergeFoldSql]] per merge — the oracle-reference path. All
    * three are bit-identical (spec-pinned differentially). */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)],
                forceLiteral: Option[Boolean] = None,
                literalBatched: Boolean = true): DataFrame = {
    val words = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val distinctWords = words.select("word").distinct()
    var enc = distinctWords
      .select(col("word"), symSeed(col("word")).as("syms"))
    if (!forceLiteral.getOrElse(false)) {
      enc = distinctWords.select(col("word"),
        graft.functions.BpeDropoutEncodeExpr(lit(""), lit(0L), col("word"),
          merges, dropMille = 0L, salt = "").as("syms"))
    } else {
      var folds = 0
      def step(next: DataFrame): DataFrame = {
        folds += 1 // see LiteralFoldCheckpointEvery — deep chains overflow
        if (folds % LiteralFoldCheckpointEvery == 0) next.localCheckpoint(true)
        else next
      }
      if (literalBatched) batchMerges(merges).foreach { group =>
        enc = step(enc.select(col("word"),
          expr(mergeFoldBatchSql("syms", group.map(m => (m._2, m._3)))).as("syms")))
      } else merges.foreach { case (l, r) =>
        enc = step(enc.select(col("word"), expr(mergeFoldSql("syms", l, r)).as("syms")))
      }
    }
    val wlen = enc.select(col("word"), size(col("syms")).cast("long").as("w_toks"))
    words.join(broadcast(wlen), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("w_toks").as("n_tokens"))
  }

  /** Per-WORD-TYPE token counts under a trained merge list — the
    * distinct-word frame [[bpeEncode]] aggregates away, exposed for
    * tokenizer-evaluation reports that need word-granular statistics
    * (continued-word share, per-type fertility): (word, w_toks), one
    * row per distinct word, encoded through the same
    * [[graft.functions.BpeDropoutEncodeExpr]] kernel at dropMille = 0.
    * Vocab-bounded output — broadcast it back onto occurrences. */
  def bpeWordTokenCounts(df: DataFrame, textCol: String,
                         merges: Seq[(String, String)]): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .distinct()
      .select(col("word"),
        size(graft.functions.BpeDropoutEncodeExpr(lit(""), lit(0L),
          col("word"), merges, dropMille = 0L, salt = ""))
          .cast("long").as("w_toks"))

  /** BPE-DROPOUT encoding (Provilkov et al. 2020) — [[bpeEncode]] with
    * each merge OPPORTUNITY independently dropped with probability
    * `dropMille`/1000: the BPE family's subword regularization, the
    * exact counterpart of the unigram family's FFBS sampler
    * ([[unigramSampleEncode]]) — a word tokenizes differently across its
    * occurrences, so the trainer sees multiple segmentations of the same
    * text (Provilkov's robustness device; dropMille = 0 degenerates to
    * [[bpeEncode]] bit-exactly, 1000 drops every merge and emits raw
    * symbols).
    *
    * Dropout granularity is the fold OPPORTUNITY: merges apply in rank
    * order as the same greedy-leftmost pending-carry fold as
    * [[bpeEncode]], and at each would-fuse step the fuse is suppressed
    * when the draw says drop — the pending symbol emits and the right
    * symbol becomes the new carry (which can then fuse at the NEXT
    * opportunity, exactly how reference BPE-dropout re-exposes dropped
    * boundaries within the pass).
    *
    * Randomness is the house replay device, keyed
    * (len(doc) : doc : word-index : merge-rank : fold-step : salt) —
    * the doc id is LENGTH-PREFIXED so an id containing ':' cannot alias
    * another (doc, widx, rank, step) tuple (every other component is an
    * integer; the salt is a code-level constant, documented trusted):
    * deterministic, distinct per occurrence AND per opportunity,
    * byte-identical on rerun, and engine-replayable as an integer —
    * drop ⇔ (fnv1a64(key) >>> 11) % 1000 < dropMille (the >>> 11 keeps
    * the value non-negative in a signed engine, so two's-complement and
    * unsigned `%` agree; no doubles anywhere). The fold-step component
    * is always the step within that merge's OWN sequential pass, no
    * matter which execution path runs (the batched fold re-derives it —
    * see below).
    *
    * Output: one row per document — (idCol, n_words, n_tokens,
    * enc_text) with enc_text the per-word symbol lists U+001F-joined
    * within a word, space-joined across words in word order (the qfp
    * rendering contract — every draw decision is pinned by the text).
    *
    * Scale: the chain runs per word OCCURRENCE (regularization is
    * per-occurrence by definition — same regime as the FFBS walk), so
    * unlike [[bpeEncode]]'s distinct-word frame nothing bounds the row
    * count but the corpus. Three bit-identical execution paths
    * (IterBench `bpedrop` has the measured slopes):
    *
    *  - DEFAULT: [[graft.functions.BpeDropoutEncodeExpr]] — the merge
    *    table compiles once into a codegen'd kernel running the same
    *    rank-ordered greedy passes as the SQL folds with the same draw
    *    keys; merge-count-FLAT plan, O(merges + len·passes) per
    *    occurrence. Identical by construction (same algorithm, same
    *    [[graft.functions.Fnv1a64Expr.hash]] bytes).
    *  - `forceLiteral = Some(true)`: one interpreted `aggregate` fold
    *    per contiguous symbol-disjoint merge BATCH ([[batchMerges]]),
    *    each branch re-deriving its member's sequential fold step as
    *    j − (accepted fuses of lower-ranked batch members so far) — a
    *    prefix-sum array in the fold carry — which equals the step the
    *    member's own pass would see (fusing two symbols into one shifts
    *    later positions left by exactly one, and only ACCEPTED fuses
    *    shrink the array).
    *  - `forceLiteral = Some(true), literalBatched = false`: the
    *    per-merge fold chain, one aggregate per merge — the reference
    *    path every oracle replays. */
  def bpeEncodeDropout(df: DataFrame, idCol: String, textCol: String,
                       merges: Seq[(String, String)], dropMille: Long,
                       salt: String = "bpedrop",
                       forceLiteral: Option[Boolean] = None,
                       literalBatched: Boolean = true): DataFrame = {
    require(dropMille >= 0 && dropMille <= 1000,
      s"dropMille must be in [0, 1000], got $dropMille")
    graft.functions.GraftExtensions.register(df.sparkSession)
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    // the A-fixed draw key: length-prefixed doc id, then integers only;
    // `jSql` is the merge's own-pass fold step as a SQL fragment
    def dropSql(k: Int, jSql: String): String =
      s"""(shiftrightunsigned(fnv1a64(concat(
         CAST(length(CAST(_doc AS STRING)) AS STRING), ':',
         CAST(_doc AS STRING), ':',
         CAST(widx AS STRING), ':', '$k', ':', CAST($jSql AS STRING),
         ':${esc(salt)}')), 11) % 1000L) < ${dropMille}L"""
    def dropFoldSql(k: Int, l0: String, r0: String): String = {
      val (l, r) = (esc(l0), esc(r0))
      val drop = dropSql(k, "j")
      s"""aggregate(sequence(1, size(syms)),
         named_struct('out', CAST(array() AS ARRAY<STRING>), 'pending', ''),
         (acc, j) -> CASE
           WHEN acc.pending = ''
             THEN named_struct('out', acc.out, 'pending', element_at(syms, j))
           WHEN acc.pending = '${l}' AND element_at(syms, j) = '${r}'
                AND NOT ($drop)
             THEN named_struct('out', array_append(acc.out, '${l}${r}'),
               'pending', '')
           ELSE named_struct('out', array_append(acc.out, acc.pending),
             'pending', element_at(syms, j))
         END,
         acc -> CASE WHEN acc.pending = '' THEN acc.out
                     ELSE array_append(acc.out, acc.pending) END)"""
    }
    // batch fold: carry 'f' = per-member PREFIX-SUM of accepted fuses
    // (f[m] = fuses by members 1..m so far); member m's own-pass step is
    // j - f[m-1], because each lower-ranked accepted fuse at an earlier
    // step merged two of its pass-input elements into one
    def dropFoldBatchSql(group: Seq[(Int, String, String)]): String = {
      val b = group.size
      val branches = group.zipWithIndex.map { case ((k, l0, r0), m0) =>
        val (l, r) = (esc(l0), esc(r0))
        val jSql = if (m0 == 0) "j" else s"j - element_at(acc.f, $m0)"
        val drop = dropSql(k, jSql)
        s"""WHEN acc.pending = '${l}' AND element_at(syms, j) = '${r}'
              AND NOT ($drop)
            THEN named_struct('out', array_append(acc.out, '${l}${r}'),
              'pending', '',
              'f', transform(acc.f, (fv, fi) -> IF(fi >= $m0, fv + 1, fv)))"""
      }.mkString("\n           ")
      s"""aggregate(sequence(1, size(syms)),
         named_struct('out', CAST(array() AS ARRAY<STRING>), 'pending', '',
           'f', array_repeat(0, $b)),
         (acc, j) -> CASE
           WHEN acc.pending = ''
             THEN named_struct('out', acc.out,
               'pending', element_at(syms, j), 'f', acc.f)
           $branches
           ELSE named_struct('out', array_append(acc.out, acc.pending),
             'pending', element_at(syms, j), 'f', acc.f)
         END,
         acc -> CASE WHEN acc.pending = '' THEN acc.out
                     ELSE array_append(acc.out, acc.pending) END)"""
    }
    val occ0 = df
      .select(col(idCol).as("_doc"),
        posexplode(TextFunctions.tokens(lower(col(textCol)))))
      .select(col("_doc"), (col("pos") + 1).cast("long").as("widx"),
        col("col").as("_w"))
    val occ =
      if (!forceLiteral.getOrElse(false)) {
        occ0.select(col("_doc"), col("widx"),
          graft.functions.BpeDropoutEncodeExpr(col("_doc").cast("string"),
            col("widx"), col("_w"), merges, dropMille, salt).as("syms"))
      } else {
        var o = occ0.select(col("_doc"), col("widx"),
          symSeed(col("_w")).as("syms"))
        var folds = 0
        def step(next: DataFrame): DataFrame = {
          folds += 1 // see LiteralFoldCheckpointEvery — deep chains overflow
          if (folds % LiteralFoldCheckpointEvery == 0) next.localCheckpoint(true)
          else next
        }
        if (literalBatched) batchMerges(merges).foreach { group =>
          o = step(o.select(col("_doc"), col("widx"),
            expr(if (group.size == 1)
              dropFoldSql(group.head._1, group.head._2, group.head._3)
            else dropFoldBatchSql(group)).as("syms")))
        } else merges.zipWithIndex.foreach { case ((l, r), i) =>
          o = step(o.select(col("_doc"), col("widx"),
            expr(dropFoldSql(i + 1, l, r)).as("syms")))
        }
        o
      }
    occ
      .select(col("_doc"), col("widx"),
        array_join(col("syms"), "\u001f").as("wseg"),
        size(col("syms")).cast("long").as("np"))
      .groupBy(col("_doc"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("np")).as("n_tokens"),
        array_join(transform(array_sort(collect_list(
          struct(col("widx"), col("wseg")))),
          x => x.getField("wseg")), " ").as("enc_text"))
      .withColumnRenamed("_doc", idCol)
  }

  /** C4's LINE-level cleaning rules (Raffel et al. 2020 §2.2 — the stage
    * BEFORE C4's span dedup, which [[dedupSpans]]/q8h's doc rules cover
    * at their granularities): per line, keep iff it (a) ends in a
    * terminal punctuation mark (period, exclamation, question, or end
    * quotation — the published list), (b) carries at least
    * `minLineWords` words (C4 uses 5 — their "at least 3 words" appears
    * with the 5-word line rule in the released code), and (c) does not
    * mention "javascript" (case-insensitive). Per page: dropped iff the
    * RAW text contains "lorem ipsum" or a curly brace, or fewer than 3
    * sentences survive (sentence proxy: terminal-mark count in the kept
    * text — C4 counts sentences; the mark count is the deterministic
    * engine-portable stand-in). C4's bad-words list is licensing-bound
    * and not replicated; compose with q8h's Gopher rules for the
    * vocabulary-based screens.
    *
    * Output: (idCol, text_clean, n_lines, n_kept_lines, n_sentences,
    * doc_dropped) — text_clean the kept lines rejoined with newlines.
    *
    * Shape at 100 TB: pure per-row HOF expressions fused into the scan
    * — zero shuffle at any corpus size (plan-pinned like qej/qeu). */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
                   minLineWords: Int = 5): DataFrame = {
    require(minLineWords >= 1, s"minLineWords must be >= 1, got $minLineWords")
    val lines = split(col(textCol), "\n")
    val keepLine = (l: Column) =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = filter(lines, keepLine)
    df.select(col(idCol), col(textCol),
        lines.as("_lines"), kept.as("_kept"))
      .withColumn("text_clean", array_join(col("_kept"), "\n"))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("n_kept_lines", size(col("_kept")).cast("long"))
      .withColumn("n_sentences",
        (length(col("text_clean")) -
          length(regexp_replace(col("text_clean"), "[.!?]", ""))).cast("long"))
      .withColumn("doc_dropped",
        lower(col(textCol)).contains("lorem ipsum") ||
          col(textCol).contains("{") || col("n_sentences") < 3)
      .select(col(idCol), col("text_clean"), col("n_lines"),
        col("n_kept_lines"), col("n_sentences"), col("doc_dropped"))
  }

  /** Byte-level staging for the BPE family (Radford et al. 2019 — GPT-2/
    * RoBERTa/GPT-3 run BPE over UTF-8 BYTES remapped to printable units,
    * so the vocabulary covers every input with zero unknowns): lowercase
    * (the family's normalization), whitespace-pretokenize, remap each
    * word's UTF-8 bytes through the caseless byte→unit bijection
    * ([[graft.functions.ByteUnitsExpr]] — U+2800+b; see its scaladoc for
    * why GPT-2's mixed-case page cannot survive a lowercasing family),
    * and rejoin with single spaces. Feed the result to [[bpeTrain]] /
    * [[bpeEncode]] unchanged: their symbol seeding then operates on
    * byte units exactly as published byte-level BPE does. The space
    * byte never enters a unit (whitespace pretokenization — the Ġ
    * space-marker is a pretokenizer convention, not BPE structure).
    *
    * The transform lambda is a CodegenFallback HOF (trap-list #14) —
    * acceptable here because this is trainer STAGING, one pass before
    * the merge loop, not a per-query hot path. */
  def byteLevelText(textCol: Column): Column =
    concat_ws(" ", transform(TextFunctions.tokens(lower(textCol)),
      w => graft.functions.ByteUnitsExpr(w)))

  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 1)
    val spark = df.sparkSession
    var vocab = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(symSeed(col("word")).as("syms"),
        col("cnt"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      for (round <- 1 to nMerges) {
        // guard: a word that has collapsed to ONE symbol (e.g. 'a' after
        // merge (a, </w>)) contributes no pairs — without the filter,
        // sequence(1, 0) yields the DESCENDING [1, 0] and element_at(syms, 0)
        // throws; the DuckDB oracle's generate_series(1, 0) is empty
        val top = vocab
          .filter(size(col("syms")) > 1)
          .select(col("cnt"), explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("left"),
              element_at(col("syms"), i + 1).as("right")))).as("p"))
          .groupBy(col("p.left").as("left"), col("p.right").as("right"))
          .agg(sum(col("cnt")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("left"), col("right"))
          .limit(1).collect()
        if (top.isEmpty) return merges.toSeq
        val (l0, r0, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round, l0, r0, c))
        // rewrite: fold each symbol array, fusing pending==l && x==r
        val merged = vocab.select(
          expr(mergeFoldSql("syms", l0, r0)).as("syms"), col("cnt"))
          .cache()
        merged.count() // materialize before dropping the parent
        vocab.unpersist()
        // vocab-scale lineage truncation: each round's plan nests the
        // previous round's, so at hundreds of merges analyzer work grows
        // O(rounds^2) and plan-tree recursion risks the stack; an eager
        // localCheckpoint every 16 rounds (reads the fresh cache, no
        // recompute) keeps plans shallow with O(1) amortized cost
        vocab = if (round % 16 == 0) {
          val t = merged.localCheckpoint(true); merged.unpersist(); t
        } else merged
      }
      merges.toSeq
    } finally vocab.unpersist()
  }

  /** WordPiece merge-table training — the likelihood-scored sibling of
    * [[bpeTrain]] (public algorithm: Schuster & Nakajima 2012; the
    * BERT-family tokenizer trainer). Each round fuses the adjacent pair
    * maximizing count(l,r) / (count(l) · count(r)) — the corpus
    * log-likelihood gain of merging l+r under a unigram segment model —
    * instead of BPE's raw count(l,r) argmax.
    *
    * Exactness device (house style — qa2/qcj family): the score is the
    * SCALED INTEGER floor(count(l,r) · scale / (count(l) · count(r))),
    * ranked (score DESC, pair_count DESC, left, right) — every round is
    * engine-portable and the whole trajectory hash-oracles. Quantization
    * collisions fall to the deterministic tie-break; magnitude bound:
    * pair_count · scale < 2^63, i.e. ~9.2e9 corpus tokens at the default
    * scale 1e9 — past that, drop scale (the ranking only needs resolution
    * below the smallest true score gap). The denominator carries no bound
    * of its own: the division runs as ((pair_count·scale) div cl) div cr
    * — exactly floor(pair_count·scale / (cl·cr)) by the nested
    * floor-division identity — so cl·cr (which would overflow Long at
    * ~3e9 tokens per symbol) is never materialized.
    *
    * Per round: ONE pair-stat aggregate + ONE symbol-count aggregate over
    * the vocabulary frame (distinct words, Zipf-bounded ≪ corpus), a
    * driver-held argmax, and the shared greedy-leftmost rewrite fold
    * ([[mergeFoldSql]] — identical application semantics to BPE, so the
    * merge list drives [[bpeEncode]] unchanged; BERT's longest-match-first
    * WordPiece ENCODER is a different, vocab-driven algorithm and not
    * modeled here).
    *
    * Returns (round, left, right, pair_count, score). */
  def wordpieceTrain(df: DataFrame, textCol: String, nMerges: Int,
                     scale: Long = 1000000000L): Seq[(Int, String, String, Long, Long)] = {
    require(nMerges >= 1)
    require(scale >= 1)
    var vocab = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(symSeed(col("word")).as("syms"),
        col("cnt"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    try {
      for (round <- 1 to nMerges) {
        // symbol occurrence counts over the CURRENT segmentation (single-
        // symbol words still count — their symbol is a merge candidate's
        // unit); pair stats skip them (see bpeTrain's sequence guard)
        val symCounts = vocab
          .select(explode(col("syms")).as("sym"), col("cnt"))
          .groupBy("sym").agg(sum(col("cnt")).as("c"))
        val top = vocab
          .filter(size(col("syms")) > 1)
          .select(col("cnt"), explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("left"),
              element_at(col("syms"), i + 1).as("right")))).as("p"))
          .groupBy(col("p.left").as("left"), col("p.right").as("right"))
          .agg(sum(col("cnt")).as("pair_count"))
          .join(symCounts.select(col("sym").as("left"), col("c").as("cl")), "left")
          .join(symCounts.select(col("sym").as("right"), col("c").as("cr")), "right")
          .select(col("left"), col("right"), col("pair_count"),
            // floor(p·s / (cl·cr)) computed as ((p·s) div cl) div cr — the
            // nested floor-division identity keeps the value EXACT while
            // never forming cl·cr, which overflows Long at ~3e9 tokens
            // per symbol (well inside the corpus envelope the numerator
            // bound allows)
            expr(s"((pair_count * ${scale}L) div cl) div cr").as("score"))
          .orderBy(col("score").desc, col("pair_count").desc,
            col("left"), col("right"))
          .limit(1).collect()
        if (top.isEmpty) return merges.toSeq
        val (l0, r0, c, sc) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getLong(3))
        merges += ((round, l0, r0, c, sc))
        val merged = vocab.select(
          expr(mergeFoldSql("syms", l0, r0)).as("syms"), col("cnt"))
          .cache()
        merged.count() // materialize before dropping the parent
        vocab.unpersist()
        // same vocab-scale lineage truncation as bpeTrain (see there)
        vocab = if (round % 16 == 0) {
          val t = merged.localCheckpoint(true); merged.unpersist(); t
        } else merged
      }
      merges.toSeq
    } finally vocab.unpersist()
  }

  /** WordPiece ENCODING — BERT's greedy longest-match-first tokenizer
    * (public algorithm: Devlin et al. 2019 / the original Schuster &
    * Nakajima decoder): per word, repeatedly take the LONGEST vocabulary
    * piece matching at the cursor — word-initial pieces at position 1,
    * `##`-prefixed continuation pieces after — and emit the whole word as
    * a single UNK token when some position matches nothing. This is a
    * different algorithm from [[bpeEncode]]'s merge-driven fold (a merge
    * list replays training; a piece vocabulary segments directly), which
    * is why both exist.
    *
    * Pure higher-order expression, no UDF: one `aggregate` over the
    * word's character positions with a (cursor, count, ok) carry — a step
    * whose index isn't the cursor is a no-op, so the fold touches each
    * position once and the inner `filter`+`aggregate` picks the longest
    * match from the vocabulary literal. Vocabulary size bounds the inner
    * expression, so this is for tokenizer-scale vocabs a driver can
    * inline — the 30k+-piece production regime is [[wordpieceEncodeTrie]]
    * (same algorithm, trie-compiled vocabulary, |vocab|-independent
    * per-position cost).
    *
    * Emits (idCol, n_words, n_tokens, n_unk_words); UNK words count 1
    * token. Same scale shape as [[bpeEncode]]: segmentation runs on the
    * DISTINCT-word vocabulary, the corpus pays one scan + broadcast join.
    *
    * `vocab`: word-initial pieces plain, continuations `##`-prefixed. */
  def wordpieceEncode(df: DataFrame, idCol: String, textCol: String,
                      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    def arr(ps: Seq[String]) =
      if (ps.isEmpty) "array()::array<string>"
      else ps.map(p => s"'${esc(p)}'").mkString("array(", ", ", ")")
    val init = arr(vocab.filterNot(_.startsWith("##")))
    val cont = arr(vocab.filter(_.startsWith("##")).map(_.stripPrefix("##")))
    // longest piece matching `word` at 1-based cursor `pos`; 0 = no match
    def best(pieces: String) =
      s"""aggregate($pieces, 0,
         (m, p) -> CASE WHEN p = substring(word, acc.pos, length(p))
                        THEN greatest(m, length(p)) ELSE m END)"""
    val segSql =
      s"""aggregate(sequence(1, length(word)),
         named_struct('pos', 1, 'n', 0, 'ok', true),
         (acc, i) -> CASE WHEN NOT acc.ok OR i <> acc.pos THEN acc ELSE
           CASE WHEN (CASE WHEN acc.pos = 1 THEN ${best(init)}
                           ELSE ${best(cont)} END) = 0
                THEN named_struct('pos', acc.pos, 'n', acc.n, 'ok', false)
                ELSE named_struct(
                  'pos', acc.pos + (CASE WHEN acc.pos = 1 THEN ${best(init)}
                                         ELSE ${best(cont)} END),
                  'n', acc.n + 1, 'ok', true) END END,
         acc -> named_struct('n_toks',
             CASE WHEN acc.ok THEN acc.n ELSE 1 END,
           'unk', NOT acc.ok))"""
    val words = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val seg = words.select("word").distinct()
      .select(col("word"), expr(segSql).as("s"))
      .select(col("word"), col("s.n_toks").cast("long").as("w_toks"),
        col("s.unk").as("unk"))
    words.join(broadcast(seg), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("w_toks").as("n_tokens"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk_words"))
  }

  /** [[wordpieceEncode]] at PRODUCTION vocabulary scale: identical greedy
    * longest-match-first semantics and output (law-spec'd equal), with
    * the vocabulary compiled once into a code-point trie that ships with
    * the plan ([[graft.functions.WordpieceEncodeExpr]]) instead of being
    * inlined as an expression literal. The inline fold pays
    * O(positions · |vocab|) per word — measured at 30k pieces: ~6 s
    * plan/codegen latency for the megabyte expression plus ~2.5× warm
    * runtime (IterBench `wpencode`) — while the trie pays O(longest
    * piece) per position, measured flat from 100 to 30k pieces. Same
    * distinct-word + broadcast-join corpus shape. */
  def wordpieceEncodeTrie(df: DataFrame, idCol: String, textCol: String,
                          vocab: Seq[String]): DataFrame = {
    val words = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val seg = words.select("word").distinct()
      .select(col("word"), org.apache.spark.sql.GraftExprBridge.column(
        graft.functions.WordpieceEncodeExpr(
          org.apache.spark.sql.GraftExprBridge.expression(col("word")),
          vocab)).as("s"))
      .select(col("word"), col("s.w_toks").as("w_toks"), col("s.unk").as("unk"))
    words.join(broadcast(seg), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("w_toks").as("n_tokens"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk_words"))
  }

  /** OPTIMAL (minimal-token) segmentation against the same piece
    * vocabulary [[wordpieceEncode]] consumes greedily — shortest-path
    * tokenization, the uniform-score special case of the unigram-LM /
    * SentencePiece Viterbi decoder (public: Kudo 2018). Where greedy
    * longest-match can dead-end into UNK or over-fragment, the DP finds
    * any valid segmentation and the fewest pieces; comparing qdw/qdx
    * output is the standard tokenizer-quality diagnostic.
    *
    * Per distinct word, one `aggregate` over the positions carrying the
    * DP cost array (costs[i] = fewest pieces covering the i-char prefix,
    * INF when unreachable): position i relaxes over the word-initial
    * piece equal to the whole prefix and every `##`-continuation piece
    * ending at i. UNK contract matches [[wordpieceEncode]]: an
    * unsegmentable word is 1 UNK token. Same distinct-word + broadcast
    * join scale shape; vocabulary literal bounds the inner expression. */
  def minTokenEncode(df: DataFrame, idCol: String, textCol: String,
                     vocab: Seq[String]): DataFrame =
    minCostEncode(df, idCol, textCol, vocab.map(_ -> 1L), unkCost = 1L)
      .withColumnRenamed("total_cost", "n_tokens")

  /** WEIGHTED Viterbi segmentation — [[minTokenEncode]]'s DP with a cost
    * per piece: the segmentation minimizing total cost is the unigram-LM
    * decode when costs are quantized −log p(piece) (SentencePiece's
    * Viterbi step with the house scaled-integer device; uniform cost 1
    * degenerates to fewest-tokens). Output is (idCol, n_words,
    * total_cost, n_unk_words): the MINIMUM summed cost is unique by
    * definition even when distinct segmentations tie, so the result is
    * engine-portable without a tie-break protocol over paths.
    * Unsegmentable words contribute `unkCost`. Same distinct-word +
    * broadcast-join shape as the whole encode family. The DP defaults
    * to the hash-indexed [[graft.functions.MinCostEncodeKernel]] (one
    * full-prefix probe + ≤ maxContLen ending-substring probes per
    * position, |vocab|-independent, bit-identical to the literal fold
    * by min's order-insensitivity; `forceIndexed = Some(false)` is the
    * differential-spec reference path). */
  def minCostEncode(df: DataFrame, idCol: String, textCol: String,
                    vocab: Seq[(String, Long)], unkCost: Long,
                    forceIndexed: Option[Boolean] = None): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(vocab.forall(_._2 >= 0), "piece costs must be non-negative")
    // The UNK sentinel must exceed any genuine path cost, or a
    // legitimately segmentable expensive word (plausible with -log-prob
    // costs at scale 1e9) silently misreports as UNK. A path sums at most
    // one piece cost per character, so INF > maxCost · maxWordLen
    // suffices: derive it for words up to 65536 chars (tokens() words are
    // whitespace-delimited; longer ones are not natural language). The
    // 1e9 floor keeps small-cost vocabs (all gates) on the historical
    // sentinel. Unreachable DP cells can sit up to maxCost above a
    // neighboring cell's INF, hence the headroom requirement on maxCost.
    val maxCost = (vocab.map(_._2) :+ unkCost :+ 0L).max
    require(maxCost <= (1L << 44),
      s"piece costs must be <= 2^44 (INF derivation headroom), got $maxCost")
    val INF = math.max(1000000000L, (maxCost + 1L) * 65536L)
    if (forceIndexed.getOrElse(vocab.size >= IndexedEStepMinVocab)) {
      val words = df.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      val seg = words.select("word").distinct()
        .select(col("word"), graft.functions.MinCostEncodeExpr(
          col("word"), vocab, INF, unkCost).as("s"))
        .select(col("word"), col("s.cost").cast("long").as("w_cost"),
          col("s.unk").as("unk"))
      return words.join(broadcast(seg), Seq("word"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_words"), sum("w_cost").as("total_cost"),
          sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk_words"))
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    def arr(ps: Seq[(String, Long)]) =
      if (ps.isEmpty) "array()::array<struct<p:string,c:bigint>>"
      else ps.map { case (p, c) => s"named_struct('p', '${esc(p)}', 'c', ${c}L)" }
        .mkString("array(", ", ", ")")
    val init = arr(vocab.filterNot(_._1.startsWith("##")))
    val cont = arr(vocab.collect { case (p, c) if p.startsWith("##") =>
      (p.stripPrefix("##"), c)
    })
    val dpSql =
      s"""aggregate(sequence(1, length(word)), array(0L),
         (acc, i) -> array_append(acc, least(
           aggregate($init, ${INF}L,
             (m, e) -> CASE WHEN e.p = substring(word, 1, i)
               THEN least(m, e.c) ELSE m END),
           aggregate($cont, ${INF}L,
             (m, e) -> CASE WHEN length(e.p) < i
                 AND e.p = substring(word, i - length(e.p) + 1, length(e.p))
               THEN least(m, element_at(acc, i - length(e.p) + 1) + e.c)
               ELSE m END))),
         acc -> named_struct(
           'cost', CASE WHEN element_at(acc, length(word) + 1) >= ${INF}L
                        THEN ${unkCost}L
                        ELSE element_at(acc, length(word) + 1) END,
           'unk', element_at(acc, length(word) + 1) >= ${INF}L))"""
    val words = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val seg = words.select("word").distinct()
      .select(col("word"), expr(dpSql).as("s"))
      .select(col("word"), col("s.cost").cast("long").as("w_cost"),
        col("s.unk").as("unk"))
    words.join(broadcast(seg), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("w_cost").as("total_cost"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk_words"))
  }

  /** [[bpeTrain]] with BATCHED merges — the vocab-size-scale variant: each
    * driver round selects up to `batch` pairs (count-desc, (left, right)
    * tie-break) that are mutually NON-OVERLAPPING (no symbol appears in two
    * selected pairs) and applies them in ONE distributed rewrite pass, so
    * a 32k-vocab training run costs ~vocabSize/batch driver round-trips
    * instead of vocabSize (the top-1 loop's Achilles heel past a few
    * hundred merges; fast BPE trainers batch exactly this way).
    *
    * Non-overlap is STRING-level: a candidate is rejected when its left,
    * right, or fused output `l+r` collides with any already-selected
    * pair's left, right, or output — so (a,b) and ('ab',c) can never both
    * be in one batch (the second's input is the first's output), making
    * the simultaneous application well-defined and equal to applying the
    * selected pairs in any order. Counts of LATER batch members are still
    * the pre-batch counts (standard batched-BPE approximation — with
    * batch=1 the result is identical to [[bpeTrain]], spec-pinned).
    * Greedy-leftmost per word is preserved: the fold's pending/next test
    * matches at most one selected pair (pairs share no symbols), and a
    * fused token never re-merges within the same pass. */
  def bpeTrainBatched(df: DataFrame, textCol: String, nMerges: Int,
                      batch: Int): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 1 && batch >= 1)
    require(batch <= 64, s"batch must be <= 64 (codegen CASE width), got $batch")
    var round = 0
    var vocab = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(symSeed(col("word")).as("syms"),
        col("cnt"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      while (merges.size < nMerges) {
        val want = math.min(batch, nMerges - merges.size)
        // over-fetch 4×: greedy non-overlap selection drops conflicting
        // candidates, and count-order must be preserved among survivors
        val top = vocab
          .filter(size(col("syms")) > 1)
          .select(col("cnt"), explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("left"),
              element_at(col("syms"), i + 1).as("right")))).as("p"))
          .groupBy(col("p.left").as("left"), col("p.right").as("right"))
          .agg(sum(col("cnt")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("left"), col("right"))
          .limit(4 * want).collect()
        if (top.isEmpty) return merges.toSeq
        // non-overlap set holds each selected pair's left, right AND fused
        // output l+r: without the concat, (a,b) and ('ab',c) could both be
        // selected — the second's left symbol equals the first's output,
        // violating the "no symbol appears in two selected pairs" contract
        // (round-9 ADVICE fix; the used(l+r) test also rejects a LATER
        // candidate whose own output collides with a selected input)
        val used = scala.collection.mutable.Set.empty[String]
        val sel = top.iterator
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .filter { case (l, r, _) =>
            if (used(l) || used(r) || used(l + r)) false
            else { used += l; used += r; used += (l + r); true }
          }
          .take(want).toSeq
        // first tuple slot = ROUND (shared by every merge of one batch;
        // with batch = 1 it is bpeTrain's sequential numbering); the Seq
        // order remains the merge-priority order a tokenizer applies
        round += 1
        sel.foreach { case (l, r, c) => merges += ((round, l, r, c)) }
        def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
        val fuseBranches = sel.map { case (l0, r0, _) =>
          val (l, r) = (esc(l0), esc(r0))
          s"""WHEN acc.pending = '$l' AND x = '$r'
             THEN named_struct('out', array_append(acc.out, '$l$r'), 'pending', '')"""
        }.mkString("\n")
        val merged = vocab.select(
          expr(
            s"""aggregate(syms,
               named_struct('out', array()::array<string>, 'pending', ''),
               (acc, x) -> CASE
                 WHEN acc.pending = '' THEN named_struct('out', acc.out, 'pending', x)
                 $fuseBranches
                 ELSE named_struct('out', array_append(acc.out, acc.pending), 'pending', x)
               END,
               acc -> CASE WHEN acc.pending = '' THEN acc.out
                           ELSE array_append(acc.out, acc.pending) END)""")
            .as("syms"),
          col("cnt"))
          .cache()
        merged.count() // materialize before dropping the parent
        vocab.unpersist()
        // same vocab-scale lineage truncation as [[bpeTrain]] (see there)
        vocab = if (round % 16 == 0) {
          val t = merged.localCheckpoint(true); merged.unpersist(); t
        } else merged
      }
      merges.toSeq
    } finally vocab.unpersist()
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): rewrite a
    * deterministic `rate` fraction of documents into the PSM layout
    * `<PRE> prefix <SUF> suffix <MID> middle`, leaving the rest untouched
    * — the standard data-level augmentation that teaches a causal LM to
    * infill. Token-boundary cut points lo ≤ hi are drawn per document as
    * the min/max of two independent salted content hashes mod (n+1) — so
    * an off-diagonal span (lo < hi) carries probability 2/(n+1)² and a
    * diagonal one (lo = hi) 1/(n+1)², NOT the uniform triangular draw —
    * deterministic, reproducible across runs/layouts, and replayable as
    * plain SQL (the selection gate is the same unitHash Bernoulli device
    * as [[Sampling.sample]]).
    *
    * Output: (id, fim_applied, n_toks, cut_lo, cut_hi, text_fim); cut
    * columns carry the draw for every row (audit/debug), text only changes
    * where `fim_applied`. At 100 TB: a pure narrow map over the scan —
    * every column is a codegen builtin over the token array (no UDF, no
    * shuffle, no state), so it runs at scan speed and composes with any
    * downstream packing stage. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   rate: Double = 0.5, salt: String = "fim"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    val toks = TextFunctions.tokens(col(textCol))
    val m = (size(toks) + lit(1)).cast("long")
    def cut(tag: String): Column = pmod(graft.functions.Fnv1a64Expr(
      concat(col(idCol).cast("string"), lit(s":$salt$tag"))), m)
    df.withColumn("_toks", toks)
      .withColumn("n_toks", size(col("_toks")).cast("long"))
      .withColumn("fim_applied",
        graft.operators.Sampling.unitHash(col(idCol), salt) < rate)
      .withColumn("cut_lo", least(cut("a"), cut("b")))
      .withColumn("cut_hi", greatest(cut("a"), cut("b")))
      .withColumn("text_fim", when(col("fim_applied"), concat(
          lit("<PRE> "),
          array_join(slice(col("_toks"), lit(1), col("cut_lo").cast("int")), " "),
          lit(" <SUF> "),
          array_join(slice(col("_toks"), (col("cut_hi") + 1).cast("int"),
            (col("n_toks") - col("cut_hi")).cast("int")), " "),
          lit(" <MID> "),
          array_join(slice(col("_toks"), (col("cut_lo") + 1).cast("int"),
            (col("cut_hi") - col("cut_lo")).cast("int")), " ")))
        .otherwise(array_join(col("_toks"), " ")))
      .select(col(idCol), col("fim_applied"), col("n_toks"),
        col("cut_lo"), col("cut_hi"), col("text_fim"))
  }

  /** Length-bucketed batch assignment — the padding-minimizing batcher a
    * finetuning pipeline runs when sequences are NOT packed: documents
    * group into fixed-width token-length buckets (bucket = n DIV
    * `bucketWidth`), and within each bucket consecutive runs of
    * `batchSize` docs (in deterministic content-hash order — the
    * shuffled-but-reproducible order trainers want) form batches. Batch
    * members differ by < bucketWidth tokens, so per-batch padding waste is
    * bounded by construction; integer division everywhere keeps the
    * assignment bit-replayable in SQL.
    *
    * Output: (id, n_toks, bucket, batch_id, pos_in_batch). One window
    * shuffle keyed on the bucket; token-length distributions put bounded
    * mass in each fixed-width bucket, and a 100-TB run that still
    * overfills one bucket swaps the window for the per-bucket two-phase
    * prefix scan ([[graft.operators.Partitioning.prefixSum]], the qel
    * device) — the assignment rule is unchanged. */
  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): fixed-length
    * token blocks are masked with probability 1/`modDenom` (a salted hash
    * decides, so the draw is reproducible and SQL-replayable), masked
    * blocks collapse to numbered sentinels in the INPUT, and the TARGET
    * is the sentinel-prefixed masked content plus the closing sentinel —
    * the denoising objective's data layout, produced at the data layer.
    *
    * Deterministic twin of the paper's i.i.d. span draw: block b of doc d
    * is masked iff fnv(d:span·b) ≡ 0 (mod modDenom); with blockLen 4 and
    * modDenom 4 that is the canonical ~25%-of-tokens, mean-span-4 regime.
    * Sentinel numbering is the masked block's rank within the doc.
    *
    * Pure narrow map — every column is codegen HOFs over the token array
    * (the per-block rank is an O(B²) lambda scan; B = n/blockLen stays
    * small for any real document), no UDF, no shuffle, composes with
    * packing downstream exactly like [[fimTransform]]. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  blockLen: Int = 4, modDenom: Int = 4): DataFrame = {
    require(blockLen > 0 && modDenom > 1)
    val toks = TextFunctions.tokens(col(textCol))
    def masked(b: Column): Column =
      pmod(graft.functions.Fnv1a64Expr(concat(col(idCol).cast("string"),
        lit(":span"), b.cast("string"))), lit(modDenom.toLong)) === 0L
    def sentinel(k: Column): Column =
      concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    def blockText(b: Column): Column =
      array_join(slice(col("_toks"), b * blockLen + lit(1), lit(blockLen)), " ")
    def rank(b: Column): Column =
      size(filter(col("_blocks"), x => x < b && masked(x)))
    df.withColumn("_toks", toks)
      .withColumn("n_toks", size(col("_toks")).cast("long"))
      .withColumn("_nb",
        expr(s"CAST((n_toks + ${blockLen - 1}) DIV $blockLen AS INT)"))
      .withColumn("_blocks", when(col("_nb") === 0,
          array().cast("array<int>"))
        .otherwise(sequence(lit(0), col("_nb") - 1)))
      .withColumn("_mb", filter(col("_blocks"), b => masked(b)))
      .withColumn("n_masked", size(col("_mb")).cast("long"))
      .withColumn("input_text", array_join(
        transform(col("_blocks"), b =>
          when(masked(b), sentinel(rank(b))).otherwise(blockText(b))), " "))
      .withColumn("target_text", when(col("n_masked") === 0,
          sentinel(lit(0)))
        .otherwise(concat(array_join(
          transform(col("_mb"), b =>
            concat(sentinel(rank(b)), lit(" "), blockText(b))), " "),
          lit(" "), sentinel(col("n_masked")))))
      .select(col(idCol), col("n_toks"), col("n_masked"),
        col("input_text"), col("target_text"))
  }

  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
                          bucketWidth: Int = 16, batchSize: Int = 8,
                          salt: String = "lenbatch"): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(graft.operators.Sampling.unitHash(col(idCol), salt), col(idCol))
    df.withColumn("n_toks",
        size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("bucket", expr(s"n_toks DIV $bucketWidth"))
      .withColumn("rk", row_number().over(win).cast("long"))
      .withColumn("batch_id", expr(s"(rk - 1L) DIV $batchSize"))
      .withColumn("pos_in_batch", expr(s"(rk - 1L) % $batchSize"))
      .select(col(idCol), col("n_toks"), col("bucket"), col("batch_id"),
        col("pos_in_batch"))
  }

  /** Unigram-LM tokenizer training by hard EM (the Viterbi-decode
    * variant of Kudo 2018 / SentencePiece) — the THIRD published trainer
    * next to [[bpeTrain]] (merge-greedy) and [[wordpieceTrain]]
    * (likelihood-scored merges), completing the family:
    *
    *  - SEED: every single character of the corpus's words (guaranteeing
    *    all words segment — no UNK path) plus the `seedMulti` most
    *    frequent substrings of length 2..`maxPieceLen`, frequency
    *    weighted by word corpus count, ties to the lexicographically
    *    smaller piece (SentencePiece seeds from frequent substrings the
    *    same way, via its suffix array);
    *  - E-step: each distinct word segments by the min-cost DP
    *    ([[minCostEncode]]'s device, position-free pieces) under costs
    *    cost(p) = scale // (1 + cnt(p)) — the qe1 exact-integer rarity
    *    proxy for -log p, engine-replayable where floats are not — and
    *    the argmin path is recovered by a deterministic backtrack
    *    (LONGEST piece achieving dp[i] = dp[i-|p|] + c(p), walking from
    *    the word end; equal-length candidates are the same string, so
    *    the path is unique);
    *  - M-step: cnt(p) := corpus-weighted usage of p across the argmin
    *    segmentations. No pruning schedule (Kudo's likelihood-loss prune
    *    is a vocab-size control, orthogonal to the re-estimation this
    *    implements); unused pieces simply decay to cnt 0.
    *
    * Returns the full trajectory, one row per (iteration, piece):
    * (iter, piece, cost, cnt) — iter 0 is the seed (cnt = weighted
    * substring frequency, cost derived from it), iter k >= 1 carries the
    * cost USED by E-step k and the usage counts it produced.
    *
    * Scale: the corpus-sized work per iteration is one distinct-word
    * aggregate (cached once) and one segmentation pass over DISTINCT
    * words (the whole encode family's shape); piece counts come back
    * through a |vocab|-bounded aggregate, and the vocabulary lives on
    * the driver between rounds exactly like [[bpeTrain]]'s merge list.
    * The E-step DP defaults to the hash-indexed
    * [[graft.functions.UnigramViterbiKernel]] — O(maxPieceLen) probes
    * per char position, |vocab|-independent, bit-identical to the
    * vocab-literal fold (retained as the differential-spec reference
    * via `forceIndexed = Some(false)`); IterBench `unigram` has the
    * measured slopes at 1k/5k/10k pieces. */
  def unigramTrain(df: DataFrame, textCol: String, maxPieceLen: Int,
                   seedMulti: Int, iters: Int,
                   scale: Long = 1000000L,
                   forceIndexed: Option[Boolean] = None)
      : Seq[(Int, String, Long, Long)] = {
    require(maxPieceLen >= 2 && seedMulti >= 0 && iters >= 1 && scale >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("wcnt"))
      .cache()
    // seed frequencies: all substrings of length 1..maxPieceLen, word-
    // count weighted
    val subs = words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("wcnt"), explode(transform(
        sequence(lit(1), lit(maxPieceLen)), l =>
          when(col("i") + l - 1 <= length(col("word")),
            col("word").substr(col("i"), l)))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy("p").agg(sum(col("wcnt")).as("cnt"))
      .cache()
    val chars = subs.filter(length(col("p")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    val multi = subs.filter(length(col("p")) >= 2)
      .orderBy(col("cnt").desc, col("p")).limit(seedMulti)
      .as[(String, Long)].collect()
    subs.unpersist()
    var vocab: Seq[(String, Long)] = (chars ++ multi).toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    out ++= vocab.map { case (p, c) => (0, p, scale / (1L + c), c) }
    for (it <- 1 to iters) {
      val costs = vocab.map { case (p, c) => (p, scale / (1L + c)) }
      val counts = emCounts(words, costs, scale, forceIndexed)
      vocab = vocab.map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      out ++= vocab.zip(costs).map { case ((p, c), (_, used)) => (it, p, used, c) }
    }
    words.unpersist()
    out.toSeq
  }

  /** Kudo's prune score, shared by [[unigramTrainPruned]] and
    * [[unigramTrainSoftPruned]]: altCost(p) = the min-cost segmentation
    * of p's OWN text from the rest of the vocabulary. The DP PROBES
    * each position's ≤ maxPieceLen ending substrings against the cost
    * map — O(|pieces|·maxPieceLen²) hash lookups for a whole round
    * (the E-step kernels' inversion, applied driver-side) — instead of
    * iterating the full map per position (O(|vocab|²·maxPieceLen):
    * 10¹⁰+ substring compares at a 100k-piece seed). Score-identical:
    * both compute min over the same relaxation set
    * {dp(i−|q|) + cost(q) : q ∈ vocab \ {p} ends at i}, and min over
    * exact integers is enumeration-order-insensitive. */
  private[graft] def altCostFn(costMap: Map[String, Long]): String => Long = {
    val probe = new java.util.HashMap[String, java.lang.Long](costMap.size * 2)
    var maxPl = 1
    costMap.foreach { case (q, qc) =>
      probe.put(q, qc)
      if (q.length > maxPl) maxPl = q.length
    }
    (p: String) => {
      val n = p.length
      val dp = Array.fill(n + 1)(Long.MaxValue / 4); dp(0) = 0L
      var i = 1
      while (i <= n) {
        var l = 1
        val lim = math.min(maxPl, i)
        while (l <= lim) {
          val q = p.substring(i - l, i)
          if (q != p) {
            val qc = probe.get(q)
            if (qc != null && dp(i - l) + qc < dp(i)) dp(i) = dp(i - l) + qc
          }
          l += 1
        }
        i += 1
      }
      dp(n)
    }
  }

  /** The hard-EM E-step shared by [[unigramTrain]] and
    * [[unigramTrainPruned]]: segment every distinct word by the min-cost
    * DP under `costs`, recover the argmin path with the deterministic
    * longest-piece backtrack, and return corpus-weighted piece usage.
    * `words` is the cached (word, wcnt) frame. Picks the literal or
    * indexed DP by [[IndexedEStepMinVocab]] (`forceIndexed` is the
    * spec/bench override) — same bits either way: min and the
    * longest-attaining-piece backtrack are enumeration-order-insensitive
    * (the argument in [[graft.functions.UnigramViterbiKernel]]'s
    * scaladoc), so probing only the matching substrings replays the
    * full-vocab fold exactly. */
  private[graft] def emCounts(words: DataFrame, costs: Seq[(String, Long)],
                              scale: Long,
                              forceIndexed: Option[Boolean] = None)
      : Map[String, Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val INF = math.max(1000000000L, (scale + 1L) * 65536L)
    if (forceIndexed.getOrElse(costs.size >= IndexedEStepMinVocab)) {
      return words
        .select(col("wcnt"), explode(
          graft.functions.UnigramViterbiSegExpr(col("word"), costs, INF)).as("p"))
        .groupBy("p").agg(sum(col("wcnt")).as("cnt"))
        .as[(String, Long)].collect().toMap
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val lst = costs.map { case (p, c) =>
      s"named_struct('p', '${esc(p)}', 'c', ${c}L)"
    }.mkString("array(", ", ", ")")
    val dpSql =
      s"""aggregate(sequence(1, length(word)), array(0L),
         (acc, i) -> array_append(acc,
           aggregate($lst, ${INF}L,
             (m, e) -> CASE WHEN length(e.p) <= i
                 AND e.p = substring(word, i - length(e.p) + 1, length(e.p))
               THEN least(m, element_at(acc, i - length(e.p) + 1) + e.c)
               ELSE m END)))"""
    // deterministic backtrack: longest piece attaining the optimum at
    // each position, walking from the word end (each step consumes >= 1
    // character, so length(word) steps always suffice)
    val btSql =
      s"""aggregate(sequence(1, length(word)),
         named_struct('pos', length(word), 'ps', array()::array<string>),
         (st, x) -> CASE WHEN st.pos <= 0 THEN st ELSE
           aggregate($lst,
             named_struct('pos', st.pos, 'ps', st.ps, 'bl', 0),
             (b, e) -> CASE WHEN length(e.p) <= b.pos
                 AND length(e.p) > b.bl
                 AND e.p = substring(word, b.pos - length(e.p) + 1, length(e.p))
                 AND element_at(dp, b.pos + 1)
                   = element_at(dp, b.pos - length(e.p) + 1) + e.c
               THEN named_struct('pos', b.pos, 'ps', b.ps, 'bl', length(e.p))
               ELSE b END,
             b -> named_struct('pos', b.pos - b.bl,
               'ps', CASE WHEN b.bl > 0 THEN array_append(b.ps,
                 substring(word, b.pos - b.bl + 1, b.bl)) ELSE b.ps END))
           END,
         st -> st.ps)"""
    words
      .select(col("word"), col("wcnt"), expr(dpSql).as("dp"))
      .select(col("wcnt"), explode(expr(btSql)).as("p"))
      .groupBy("p").agg(sum(col("wcnt")).as("cnt"))
      .as[(String, Long)].collect().toMap
  }

  /** [[unigramTrain]] WITH Kudo's vocabulary-size control — the pruning
    * schedule that makes unigram-LM training converge to a target vocab:
    * after each E-step, every multi-character piece is scored by the
    * FIRST-ORDER likelihood loss its removal would cost,
    *
    *   loss(p) = cnt(p) · (altCost(p) − cost(p))
    *
    * where altCost(p) is the min-cost segmentation of p's OWN text from
    * the rest of the vocabulary (each of p's occurrences would be
    * replaced by exactly that decomposition — the same
    * independent-replacement first-order assumption Kudo's prune makes;
    * altCost ≥ cost(p) whenever p is used, by DP optimality, so losses
    * are non-negative), and the `pruneCount` smallest-loss pieces drop
    * (ties to the lexicographically smaller piece; unused pieces have
    * loss 0 and go first). Single characters never prune — they are the
    * segmentability floor. altCost is a driver-side DP over ≤
    * maxPieceLen characters per piece that PROBES each position's
    * ending substrings against the cost map — O(|vocab|·maxPieceLen²)
    * hash lookups total (the same inversion as the E-step kernels;
    * iterating the full cost map per position instead is
    * O(|vocab|²·maxPieceLen), 10¹⁰+ substring compares at a real
    * 100k-piece SentencePiece seed) — same driver locality as the BPE
    * merge selection, and the same min over the same relaxation set, so
    * the scores are exactly the integers the quadratic loop produced.
    *
    * Returns one row per (round, piece) alive in that round:
    * (round, piece, cost, cnt, loss, pruned) — cost as used by the
    * round's E-step, cnt the usage it produced, loss the prune score
    * (−1 sentinel for unprunable single chars). */
  def unigramTrainPruned(df: DataFrame, textCol: String, maxPieceLen: Int,
                         seedMulti: Int, rounds: Int, pruneCount: Int,
                         scale: Long = 1000000L,
                         forceIndexed: Option[Boolean] = None)
      : Seq[(Int, String, Long, Long, Long, Boolean)] = {
    require(maxPieceLen >= 2 && seedMulti >= 0 && rounds >= 1 &&
      pruneCount >= 0 && scale >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("wcnt"))
      .cache()
    val subs = words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("wcnt"), explode(transform(
        sequence(lit(1), lit(maxPieceLen)), l =>
          when(col("i") + l - 1 <= length(col("word")),
            col("word").substr(col("i"), l)))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy("p").agg(sum(col("wcnt")).as("cnt"))
      .cache()
    val chars = subs.filter(length(col("p")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    val multi = subs.filter(length(col("p")) >= 2)
      .orderBy(col("cnt").desc, col("p")).limit(seedMulti)
      .as[(String, Long)].collect()
    subs.unpersist()
    var vocab: Seq[(String, Long)] = (chars ++ multi).toSeq
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, Long, Long, Long, Boolean)]
    for (r <- 1 to rounds) {
      val costs = vocab.map { case (p, c) => (p, scale / (1L + c)) }
      val costMap = costs.toMap
      val counts = emCounts(words, costs, scale, forceIndexed)
      val altCost = altCostFn(costMap)
      val scored = vocab.map { case (p, _) =>
        val cnt = counts.getOrElse(p, 0L)
        val loss = if (p.length == 1) -1L
                   else cnt * (altCost(p) - costMap(p))
        (p, cnt, costMap(p), loss)
      }
      val pruned = scored.filter(_._4 >= 0)
        .sortBy { case (p, _, _, l) => (l, p) }
        .take(pruneCount).map(_._1).toSet
      out ++= scored.map { case (p, cnt, c, l) => (r, p, c, cnt, l, pruned(p)) }
      vocab = scored.filterNot(t => pruned(t._1)).map(t => (t._1, t._2))
    }
    words.unpersist()
    out.toSeq
  }

  /** Unigram-LM training by SOFT EM — Kudo (2018)'s actual E-step, the
    * expected-count forward-backward over each word's segmentation
    * lattice, where [[unigramTrain]] is the hard (Viterbi) approximation:
    * instead of crediting only the single best segmentation, every
    * segmentation contributes its posterior probability, so a piece's
    * new count is E[uses] = Σ_paths P(path | word) · uses(path), computed
    * in O(|word| · maxPieceLen) by the classic α/β decomposition
    * (P(piece at [i-l, i)) = α(i-l) · w(piece) · β(i) / α(n)).
    *
    * ENGINE-EXACT REPLAY, the family's gate discipline, holds through
    * floating point by construction rather than by avoiding it:
    *
    *  - all within-word arithmetic is IEEE-754 double ops in ONE FIXED
    *    fold order (the vocabulary literal's order: single chars sorted,
    *    then seed multis by weighted frequency) — +, ×, / are correctly
    *    rounded in every IEEE engine, so identical operand order gives
    *    bit-identical α, β, and posteriors (non-matching vocab entries
    *    add exactly 0.0, which is an identity);
    *  - weights enter as the quotient of two exact integers < 2^53
    *    ((cnt + scale) / Σ(cnt + scale), the +1-count smoothing in
    *    scaled units), so both engines derive the SAME doubles from the
    *    SAME integers — no decimal-literal round-trip in the contract;
    *  - each occurrence posterior is fixed-pointed to an integer
    *    (⌊γ·scale + 0.5⌋) BEFORE any cross-row aggregation — integer
    *    sums commute, so shuffle/partition order cannot perturb counts
    *    (a double sum across words would not be replayable).
    *
    * No underflow guard is needed: a word of n chars has lattice mass
    * ≥ (1/Σw)ⁿ-ish and doubles reach 1e-308 — a word would need
    * hundreds of characters of pathological pieces to underflow, far
    * past any whitespace token.
    *
    * Returns the trajectory, one row per (iteration, piece):
    * (iter, piece, ecnt) with ecnt in `scale`-fixed-point count units —
    * iter 0 is the seed (exact counts × scale), iter k ≥ 1 the round's
    * expected counts. Scale: identical shape to [[unigramTrain]] — one
    * cached distinct-word aggregate, one compiled lattice pass over
    * DISTINCT words per round, |vocab|-bounded aggregates back to the
    * driver. */
  def unigramTrainSoft(df: DataFrame, textCol: String, maxPieceLen: Int,
                       seedMulti: Int, iters: Int,
                       scale: Long = 1000000L): Seq[(Int, String, Long)] = {
    require(maxPieceLen >= 2 && seedMulti >= 0 && iters >= 1 && scale >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("wcnt"))
      .cache()
    val subs = words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("wcnt"), explode(transform(
        sequence(lit(1), lit(maxPieceLen)), l =>
          when(col("i") + l - 1 <= length(col("word")),
            col("word").substr(col("i"), l)))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy("p").agg(sum(col("wcnt")).as("cnt"))
      .cache()
    val chars = subs.filter(length(col("p")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    val multi = subs.filter(length(col("p")) >= 2)
      .orderBy(col("cnt").desc, col("p")).limit(seedMulti)
      .as[(String, Long)].collect()
    subs.unpersist()
    // counts live in scale-fixed-point units from the start so every
    // round's smoothing and normalization are the same integer formula
    var vocab: Seq[(String, Long)] = (chars ++ multi).toSeq
      .map { case (p, c) => (p, c * scale) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    out ++= vocab.map { case (p, c) => (0, p, c) }
    for (it <- 1 to iters) {
      val counts = softEmCounts(words, vocab, scale)
      vocab = vocab.map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      out ++= vocab.map { case (p, e) => (it, p, e) }
    }
    words.unpersist()
    out.toSeq
  }

  /** N-BEST segmentation (Kudo 2018 §3's deterministic alternative to
    * sampling): for every distinct word, the `n` cheapest segmentations
    * under integer piece costs, by the classic n-best DP — each position
    * keeps its n best (cost, segmentation) pairs, a transition extends
    * every predecessor entry by every piece ending here, and the merged
    * candidates re-sort and truncate to n. Ties break by the rendered
    * segmentation string (piece list '/'-joined), so the order is total
    * and engine-replayable: integer costs, binary string comparison, and
    * the same sort both sides — no floating point anywhere.
    *
    * `vocab` carries (piece, integer cost) — [[unigramTrain]]'s rarity
    * costs are the natural source. Output: one row per (word, rank),
    * (word, rank, cost, seg) with rank 1..≤n (fewer if the word admits
    * fewer segmentations). Scale: one compiled DP pass over DISTINCT
    * words, state O(n · |word|) per word; the DP defaults to the
    * hash-indexed [[graft.functions.UnigramViterbiKernel]] — the total
    * (cost, binary seg) candidate order makes the sorted first-n slice
    * enumeration-order-insensitive, so the kernel is bit-identical to
    * the vocab-literal fold (spec-pinned differentially;
    * `forceIndexed = Some(false)` is the reference path). */
  def nbestSegment(df: DataFrame, textCol: String,
                   vocab: Seq[(String, Long)], n: Int,
                   forceIndexed: Option[Boolean] = None): DataFrame = {
    require(n >= 1 && vocab.nonEmpty)
    val spark = df.sparkSession
    if (forceIndexed.getOrElse(vocab.size >= IndexedEStepMinVocab)) {
      return df
        .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
        .distinct()
        .select(col("word"), posexplode(
          graft.functions.UnigramNbestExpr(col("word"), vocab, n)))
        .select(col("word"), (col("pos") + 1).cast("long").as("rank"),
          col("col.c").as("cost"), col("col.s").as("seg"))
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val lst = vocab.map { case (p, c) =>
      s"named_struct('p', '${esc(p)}', 'c', ${c}L)"
    }.mkString("array(", ", ", ")")
    // acc[i+1] = the n best (cost, seg) reaching position i; the empty
    // seg sentinel at position 0 renders as the bare first piece
    val nbSql =
      s"""aggregate(sequence(1, length(word)),
         array(array(named_struct('c', 0L, 's', ''))),
         (acc, i) -> array_append(acc,
           slice(array_sort(flatten(transform(
             filter($lst, e -> length(e.p) <= i
               AND e.p = substring(word, i - length(e.p) + 1, length(e.p))),
             e -> transform(element_at(acc, i - length(e.p) + 1),
               b -> named_struct('c', b.c + e.c,
                 's', CASE WHEN b.s = '' THEN e.p
                      ELSE concat(b.s, '/', e.p) END))))), 1, $n)),
         acc -> element_at(acc, length(word) + 1))"""
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .distinct()
      .select(col("word"), posexplode(expr(nbSql)))
      .select(col("word"), (col("pos") + 1).cast("long").as("rank"),
        col("col.c").as("cost"), col("col.s").as("seg"))
  }

  /** Kudo (2018)'s COMPLETE trainer: the soft-EM expected-count E-step
    * ([[unigramTrainSoft]]) WITH the vocabulary-size pruning schedule
    * ([[unigramTrainPruned]]'s control) — expected counts drive both the
    * re-estimation and the prune scores, which is exactly the published
    * algorithm's structure (hard-EM + prune and soft-EM alone are each
    * one half). Per round:
    *
    *  - soft E-step under weights (c + scale)/Σ(c + scale) from the
    *    previous round's counts → expected counts e(p) (fixed-point,
    *    [[unigramTrainSoft]]'s replay contract);
    *  - integer rarity costs from the PREVIOUS counts,
    *    cost(p) = scale² DIV (scale + c_prev) — the scaled-units
    *    form of the family's scale DIV (1 + cnt) proxy for −log p;
    *  - first-order loss of removing p: its occurrences re-segment as
    *    p's own text from the REST of the vocabulary (the same
    *    independent-replacement assumption as [[unigramTrainPruned]]),
    *    loss(p) = (e(p) DIV scale) · (altCost(p) − cost(p)) — the
    *    leading DIV keeps the product in long range (e is scaled);
    *  - the `pruneCount` smallest-loss MULTI-CHAR pieces drop (ties to
    *    the smaller piece). Eligibility is by LENGTH, not loss sign:
    *    soft losses can be legitimately negative (a piece whose
    *    replacement decomposition is CHEAPER under current costs), and
    *    those prune first — unlike the hard variant, where DP
    *    optimality keeps used pieces' losses non-negative. Single
    *    characters never prune (segmentability floor).
    *
    * Returns one row per (round, piece) alive in that round:
    * (round, piece, cost, ecnt, loss, pruned) — cost as used for the
    * round's prune scoring, ecnt the soft counts it produced, loss −1
    * sentinel for unprunable single chars. Same scale shape as the
    * parents: corpus work is one lattice pass per round; the alt-cost
    * DP probes the cost map — O(|vocab|·maxPieceLen²) driver hash
    * lookups (see [[unigramTrainPruned]]). */
  def unigramTrainSoftPruned(df: DataFrame, textCol: String,
                             maxPieceLen: Int, seedMulti: Int, rounds: Int,
                             pruneCount: Int, scale: Long = 1000000L,
                             forceIndexed: Option[Boolean] = None)
      : Seq[(Int, String, Long, Long, Long, Boolean)] = {
    require(maxPieceLen >= 2 && seedMulti >= 0 && rounds >= 1 &&
      pruneCount >= 0 && scale >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("wcnt"))
      .cache()
    val subs = words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("wcnt"), explode(transform(
        sequence(lit(1), lit(maxPieceLen)), l =>
          when(col("i") + l - 1 <= length(col("word")),
            col("word").substr(col("i"), l)))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy("p").agg(sum(col("wcnt")).as("cnt"))
      .cache()
    val chars = subs.filter(length(col("p")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    val multi = subs.filter(length(col("p")) >= 2)
      .orderBy(col("cnt").desc, col("p")).limit(seedMulti)
      .as[(String, Long)].collect()
    subs.unpersist()
    var vocab: Seq[(String, Long)] = (chars ++ multi).toSeq
      .map { case (p, c) => (p, c * scale) }
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, Long, Long, Long, Boolean)]
    for (r <- 1 to rounds) {
      val costMap = vocab.map { case (p, c) =>
        p -> (scale * scale) / (scale + c) }.toMap
      val counts = softEmCounts(words, vocab, scale, forceIndexed)
      val altCost = altCostFn(costMap)
      val scored = vocab.map { case (p, _) =>
        val e = counts.getOrElse(p, 0L)
        val loss = if (p.length == 1) -1L
                   else (e / scale) * (altCost(p) - costMap(p))
        (p, e, costMap(p), loss)
      }
      val pruned = scored.filter(_._1.length >= 2)
        .sortBy { case (p, _, _, l) => (l, p) }
        .take(pruneCount).map(_._1).toSet
      out ++= scored.map { case (p, e, c, l) => (r, p, c, e, l, pruned(p)) }
      vocab = scored.filterNot(t => pruned(t._1)).map(t => (t._1, t._2))
    }
    words.unpersist()
    out.toSeq
  }

  /** Subword-regularization SAMPLING (Kudo 2018 §3) — the third face of
    * the unigram family after training ([[unigramTrainSoft]]) and
    * deterministic encoding (qfj's min-cost path): draw each word
    * occurrence's segmentation FROM the lattice posterior, the data
    * augmentation Kudo shows improves NMT robustness (a word tokenizes
    * differently across its occurrences, in proportion to how plausible
    * each tokenization is). The sampler is the classic
    * forward-filtering backward-sampling walk: with the forward masses
    * α of [[unigramTrainSoft]]'s lattice, start at the word end and
    * repeatedly choose the piece `p` ending at the current position
    * with probability α(pos−|p|)·w(p) / α(pos) — the exact lattice
    * posterior, sampled in O(|word|·maxPieceLen) without enumerating
    * segmentations. Temperature is fixed at 1 (Kudo's α-smoothing
    * exponent needs `pow`, which is NOT correctly-rounded across
    * engines and would break bit replay — documented trade).
    *
    * Randomness is the house unitHash device, keyed
    * (doc, word-index, position): deterministic, replayable as SQL,
    * distinct per occurrence AND per walk step, so two occurrences of
    * one word sample independently while reruns are byte-identical.
    * The choice rule shares [[unigramTrainSoft]]'s replay contract —
    * the cumulative-mass scan folds the vocab literal in canonical
    * order with IEEE doubles, and the draw threshold u·α(pos) uses the
    * same exact-integer-derived weights — so an engine replaying the
    * fold makes bit-identical choices.
    *
    * `vocab` is the trained (piece, scale-fixed-point count) list in
    * canonical order — pass [[unigramTrainSoft]]'s final iteration
    * verbatim. Output: one row per document, (idCol, n_words,
    * n_pieces, seg_text) with seg_text the words' sampled pieces
    * U+001F-joined within a word, space-joined across words (U+001F,
    * the unit-separator control char, cannot appear in a piece unless
    * the raw token itself carries it — unlike '/', which slash-bearing
    * tokens would make ambiguous to invert). Scale: one
    * lattice pass over DISTINCT words (α), one walk over word
    * OCCURRENCES (narrow after a word-keyed join), one doc-keyed
    * aggregate. */
  def unigramSampleEncode(df: DataFrame, idCol: String, textCol: String,
                          vocab: Seq[(String, Long)],
                          scale: Long = 1000000L,
                          salt: String = "sseg",
                          forceIndexed: Option[Boolean] = None): DataFrame = {
    require(vocab.nonEmpty && scale >= 1)
    // literal fold vs indexed kernel — bit-identical; see IndexedEStepMinVocab
    val useIndexed = forceIndexed.getOrElse(vocab.size >= IndexedEStepMinVocab)
    // the walk's SQL text calls fnv1a64 — ensure the native expression is
    // registered on this session (idempotent)
    graft.functions.GraftExtensions.register(df.sparkSession)
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    // lazy: the indexed path must not render the (|V|-proportional)
    // literal SQL text at all
    lazy val lst = vocab.map { case (p, c) =>
      s"named_struct('p', '${esc(p)}', 'c', ${c}L)"
    }.mkString("array(", ", ", ")")
    val total = vocab.map(_._2 + scale).sum
    require(total < (1L << 53) && total > 0,
      s"weight denominator $total must be an exact double (< 2^53)")
    def w(c: String) =
      s"(CAST($c + ${scale}L AS DOUBLE) / CAST(${total}L AS DOUBLE))"
    lazy val alSql =
      s"""aggregate(sequence(1, length(word)), array(CAST(1.0 AS DOUBLE)),
         (acc, i) -> array_append(acc,
           aggregate($lst, CAST(0.0 AS DOUBLE),
             (s, e) -> s + CASE WHEN length(e.p) <= i
                 AND e.p = substring(word, i - length(e.p) + 1, length(e.p))
               THEN element_at(acc, i - length(e.p) + 1) * ${w("e.c")}
               ELSE CAST(0.0 AS DOUBLE) END)))"""
    // the per-step uniform draw: unitHash(doc:widx:pos, salt) — fnv1a64's
    // top 53 bits as a double in [0, 1)
    lazy val u =
      s"""(CAST(shiftrightunsigned(fnv1a64(concat(CAST(_doc AS STRING), ':',
         CAST(widx AS STRING), ':', CAST(b.pos AS STRING), ':$salt')), 11)
         AS DOUBLE) / 9007199254740992.0D)"""
    // backward walk: at each boundary fold the vocab in canonical order
    // accumulating candidate mass; the FIRST candidate pushing the
    // cumulative past u·α(pos) is the sampled piece (the exact lattice
    // posterior: each candidate's selection probability is its mass
    // share of α(pos))
    lazy val walkSql =
      s"""aggregate(sequence(1, length(word)),
         named_struct('pos', length(word), 'ps', CAST(array() AS ARRAY<STRING>)),
         (st, x) -> CASE WHEN st.pos <= 0 THEN st ELSE
           aggregate($lst,
             named_struct('pos', st.pos, 'ps', st.ps,
               'cum', CAST(0.0 AS DOUBLE), 'bl', 0),
             (b, e) -> named_struct('pos', b.pos, 'ps', b.ps,
               'cum', b.cum + CASE WHEN length(e.p) <= b.pos
                   AND e.p = substring(word, b.pos - length(e.p) + 1, length(e.p))
                 THEN element_at(al, b.pos - length(e.p) + 1) * ${w("e.c")}
                 ELSE CAST(0.0 AS DOUBLE) END,
               'bl', CASE WHEN b.bl > 0 THEN b.bl
                 WHEN length(e.p) <= b.pos
                   AND e.p = substring(word, b.pos - length(e.p) + 1, length(e.p))
                   AND b.cum + element_at(al, b.pos - length(e.p) + 1) * ${w("e.c")}
                     > $u * element_at(al, b.pos + 1)
                 THEN length(e.p) ELSE 0 END),
             b -> named_struct('pos', b.pos - b.bl,
               'ps', CASE WHEN b.bl > 0 THEN array_append(b.ps,
                 substring(word, b.pos - b.bl + 1, b.bl)) ELSE b.ps END))
           END,
         st -> reverse(st.ps))"""
    val occ = df.select(col(idCol).as("_doc"),
        posexplode(TextFunctions.tokens(lower(col(textCol)))))
      .select(col("_doc"), (col("pos") + 1).cast("long").as("widx"),
        col("col").as("word"))
    val words = occ.select("word").distinct()
    // a word no vocab tiling covers has α(n) = 0 — the walk would stall
    // and silently emit a seg that does not tile the word. Guard IN the
    // plan on the exact condition (α at the word's end is positive),
    // evaluated per distinct word at action time: composing the pipeline
    // stays job-free, and a vocab that tiles every word with multi-char
    // pieces alone is (correctly) accepted. α(n) = 0 is also precisely
    // the "walk stalls" condition when a long word's mass underflows
    // IEEE doubles — the same throw is right there too, since the
    // sampler's thresholds ride the same masses. assert_true returns
    // null when the guard holds, so the `when` keeps `al` unchanged.
    def guarded(alCol: Column): Column = when(
      assert_true(element_at(alCol, length(col("word")) + 1) > 0.0,
        concat(lit("word '"), col("word"),
          lit("' has an empty segmentation lattice (α(n) = 0) — no vocab" +
            " tiling covers it; seed the vocab with every corpus" +
            " character (the trainers do)"))).isNull,
      alCol)
    val alw =
      if (useIndexed)
        words.withColumn("al", guarded(
          graft.functions.UnigramAlphaExpr(col("word"), vocab, scale)))
      else words.withColumn("al", guarded(expr(alSql)))
    val joined = occ.join(alw, Seq("word"))
    val seged =
      if (useIndexed)
        joined.withColumn("seg", graft.functions.UnigramSampleSegExpr(
          col("word"), col("al"), col("_doc").cast("string"), col("widx"),
          vocab, scale, salt))
      else joined.withColumn("seg", expr(walkSql))
    seged
      .select(col("_doc"), col("widx"),
        array_join(col("seg"), "\u001f").as("wseg"), size(col("seg")).as("np"))
      .groupBy(col("_doc"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("np")).cast("long").as("n_pieces"),
        array_join(transform(array_sort(collect_list(
          struct(col("widx"), col("wseg")))),
          x => x.getField("wseg")), " ").as("seg_text"))
      .withColumnRenamed("_doc", idCol)
  }

  /** Vocab-size threshold above which the soft-EM/FFBS family uses the
    * hash-indexed kernel ([[graft.functions.UnigramLatticeKernel]])
    * instead of the inline vocab-literal fold — the [[SuffixArray]]
    * measured-hybrid device, except the measurement found NO regime
    * where the literal wins, so the threshold is 0 (indexed always; the
    * literal fold is retained as the differential-spec reference via
    * `forceIndexed = Some(false)`). The literal fold costs O(|V|)
    * comparisons per char position plus |V|-proportional parse/codegen
    * of the embedded literal (three copies); the kernel costs
    * O(maxPieceLen) hash lookups per position, |V|-independent.
    * Measured (IterBench `unigram`, sf0.01 pseudo-corpus, 48k distinct
    * words, steady-state round; BASELINE.md round-14): E-step
    * literal/indexed = 0.87/0.31 s at the ~50-piece gate vocab (the
    * literal's plan-parse alone exceeds the kernel's total), 7.6/0.46 s
    * at 1k, 33.7/0.50 s at 5k; sampler parity at 50 pieces
    * (0.75/0.78 s), 1.6× at 1k, 3.7× at 5k. Indexed is vocab-FLAT
    * through 10k and corpus-linear (0.45 s → 0.65 s for 48k → 190k
    * words). Both paths are BIT-IDENTICAL by construction (the literal
    * fold's non-matching entries add exactly 0.0, and x + 0.0 == x for
    * the non-negative partial sums involved; the kernel folds the
    * matching entries in the same canonical rank order) — spec-pinned
    * at gate and several-hundred-piece vocabs. */
  private[graft] val IndexedEStepMinVocab = 0

  /** The soft-EM E-step shared by [[unigramTrainSoft]] and its spec
    * replica: forward/backward over every distinct word's lattice under
    * weights (c + scale)/Σ(c + scale), per-occurrence posteriors
    * fixed-pointed to ⌊γ·scale + 0.5⌋, corpus-weighted integer sums
    * back. `vocab` carries scale-fixed-point counts in the canonical
    * (chars-then-multis) order the fold contract depends on. Picks the
    * literal or indexed lattice by [[IndexedEStepMinVocab]]
    * (`forceIndexed` is the spec/bench override) — same bits either way. */
  private[graft] def softEmCounts(words: DataFrame, vocab: Seq[(String, Long)],
                                  scale: Long,
                                  forceIndexed: Option[Boolean] = None)
      : Map[String, Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    if (forceIndexed.getOrElse(vocab.size >= IndexedEStepMinVocab)) {
      return words
        .select(col("wcnt"), explode(
          graft.functions.UnigramPosteriorsExpr(col("word"), vocab, scale)).as("o"))
        .select(col("o.p").as("p"), (col("wcnt") * col("o.f")).as("e"))
        .groupBy("p").agg(sum(col("e")).as("ecnt"))
        .as[(String, Long)].collect().toMap
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val lst = vocab.map { case (p, c) =>
      s"named_struct('p', '${esc(p)}', 'c', ${c}L)"
    }.mkString("array(", ", ", ")")
    val total = vocab.map(_._2 + scale).sum
    require(total < (1L << 53) && total > 0,
      s"weight denominator $total must be an exact double (< 2^53)")
    def w(c: String) =
      s"(CAST($c + ${scale}L AS DOUBLE) / CAST(${total}L AS DOUBLE))"
    // forward: al[i+1] = α(i) = Σ_pieces-ending-at-i α(i-l) · w(piece)
    val alSql =
      s"""aggregate(sequence(1, length(word)), array(CAST(1.0 AS DOUBLE)),
         (acc, i) -> array_append(acc,
           aggregate($lst, CAST(0.0 AS DOUBLE),
             (s, e) -> s + CASE WHEN length(e.p) <= i
                 AND e.p = substring(word, i - length(e.p) + 1, length(e.p))
               THEN element_at(acc, i - length(e.p) + 1) * ${w("e.c")}
               ELSE CAST(0.0 AS DOUBLE) END)))"""
    // backward, reversed: be[j+1] = β(n-j) = Σ_pieces-starting-at-n-j+1
    // w(piece) · β(n-j+l)
    val beSql =
      s"""aggregate(sequence(1, length(word)), array(CAST(1.0 AS DOUBLE)),
         (acc, j) -> array_append(acc,
           aggregate($lst, CAST(0.0 AS DOUBLE),
             (s, e) -> s + CASE WHEN length(e.p) <= j
                 AND e.p = substring(word, length(word) - j + 1, length(e.p))
               THEN element_at(acc, j - length(e.p) + 1) * ${w("e.c")}
               ELSE CAST(0.0 AS DOUBLE) END)))"""
    // per-occurrence posterior, fixed-pointed: the multiplication order
    // ((α·w)·β)/Z·scale is part of the replay contract
    val poSql =
      s"""flatten(transform(sequence(1, length(word)), i ->
         transform(filter($lst, e -> length(e.p) <= i
             AND e.p = substring(word, i - length(e.p) + 1, length(e.p))),
           e -> named_struct('p', e.p, 'f',
             CAST(floor(element_at(al, i - length(e.p) + 1) * ${w("e.c")}
               * element_at(be, length(word) - i + 1)
               / element_at(al, length(word) + 1)
               * CAST(${scale}L AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)))))"""
    words
      .select(col("word"), col("wcnt"), expr(alSql).as("al"))
      .withColumn("be", expr(beSql))
      .select(col("wcnt"), explode(expr(poSql)).as("o"))
      .select(col("o.p").as("p"), (col("wcnt") * col("o.f")).as("e"))
      .groupBy("p").agg(sum(col("e")).as("ecnt"))
      .as[(String, Long)].collect().toMap
  }
}
