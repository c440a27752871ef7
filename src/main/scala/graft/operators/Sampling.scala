package graft.operators

import graft.functions.Fnv1a64Expr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling and dataset splitting.
  *
  * Training pipelines need splits that are (a) stable across reruns and
  * cluster layouts, (b) disjoint and exhaustive, (c) auditable — "which
  * split is doc 12345 in?" must have one answer forever. `rand(seed)` gives
  * none of these under retries/repartitioning (SPARK-23207 class:
  * per-partition seeding depends on layout); `TABLESAMPLE` none by design.
  *
  * The primitive here is a content hash of the id column mapped to [0, 1):
  * a pure function of the row, so membership is layout-independent,
  * retry-stable, and replayable anywhere (the DuckDB oracle replays the
  * same FNV-1a arithmetic — sampling is oracle-EXACT, which no
  * rand()-based sample can be). Different `salt` values give independent
  * samples from the same ids.
  *
  * At 100 TB: a sample/split is a map-side filter fused into the scan —
  * no shuffle, no driver round-trip, prunable columns untouched.
  */
object Sampling {

  /** hash(id, salt) → uniform double in [0, 1), deterministic. */
  def unitHash(id: Column, salt: String): Column =
    // FNV-1a (native codegen expr) over the decimal rendering of the id plus
    // the salt tag; >>> 11 keeps the top 53 bits — exact in a double.
    shiftrightunsigned(Fnv1a64Expr(concat(id.cast("string"), lit(":" + salt))), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Bernoulli sample: keep rows with unitHash < fraction. */
  def sample(df: DataFrame, idCol: String, fraction: Double,
             salt: String = "sample"): DataFrame =
    df.filter(unitHash(col(idCol), salt) < fraction)

  /** Disjoint-exhaustive split: adds `splitCol` ∈ names(i) with
    * P(names(i)) = weights(i)/Σweights. Every id lands in exactly one
    * split, forever. */
  def split(df: DataFrame, idCol: String, weights: Seq[Double],
            names: Seq[String], splitCol: String = "split",
            salt: String = "split"): DataFrame = {
    require(weights.length == names.length && weights.nonEmpty)
    require(weights.forall(_ > 0))
    val total = weights.sum
    val cums = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = unitHash(col(idCol), salt)
    // last bucket catches u in [cum_{n-1}, 1) exactly
    val expr0 = cums.init.zip(names.init).foldRight(lit(names.last): Column) {
      case ((cum, name), elseExpr) => when(u < cum, name).otherwise(elseExpr)
    }
    df.withColumn(splitCol, expr0)
  }

  /** Deterministic k-fold assignment (reference: flink-ml/.../
    * preprocessing/Splitter.scala — kFoldSplit): adds `foldCol` =
    * floor(unitHash·k) ∈ [0, k). Content-hashed, so the assignment is
    * stable across runs and partitionings and replayable in plain SQL —
    * the reference's random folds are neither. Map-side only: no shuffle,
    * no state, works identically on a 100 TB frame. */
  def kFold(df: DataFrame, idCol: String, k: Int, foldCol: String = "fold",
            salt: String = "kfold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn(foldCol,
      floor(unitHash(col(idCol), salt) * k).cast("int"))
  }

  /** The i-th cross-validation pair: (train = every other fold, test =
    * fold i). Both are filters over the same deterministic assignment —
    * disjoint and exhaustive by construction. */
  def kFoldSplit(df: DataFrame, idCol: String, k: Int, i: Int,
                 salt: String = "kfold"): (DataFrame, DataFrame) = {
    require(i >= 0 && i < k, s"fold index $i outside [0, $k)")
    val withFold = kFold(df, idCol, k, salt = salt)
    (withFold.filter(col("fold") =!= i).drop("fold"),
      withFold.filter(col("fold") === i).drop("fold"))
  }

  /** Per-stratum Bernoulli sample: fractions(stratum) of each stratum's
    * rows, deterministic. Strata absent from the map are dropped —
    * the `sampleBy` contract. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double],
                 salt: String = "strat"): DataFrame = {
    val fracExpr = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, f).otherwise(acc)
    }
    df.filter(unitHash(col(idCol), salt) < fracExpr)
  }

  /** Temperature-scaled per-group sample budgets: budget_g =
    * totalBudget * n_g^alpha / Σ n_g^alpha (integer floor division).
    * This is the multilingual-training mixture rule ("sampling with
    * temperature", alpha = 1/T): alpha < 1 upweights small groups so the
    * head domain/language doesn't drown the tail. alpha is fixed at 0.5
    * here because n^0.5 = sqrt(n) is correctly rounded IEEE in both the
    * JVM and any SQL engine, which keeps budgets integer-exact and
    * oracle-replayable; other exponents would introduce pow() rounding
    * drift across engines.
    *
    * Returns one row per group: (group, n, weight, budget). The group
    * count frame is tiny (one row per domain/language), so everything
    * after the first count aggregate is driver-scale; the window-sum of
    * weights runs on that tiny frame, not the corpus.
    */
  def mixtureBudgets(df: DataFrame, groupCol: String,
                     totalBudget: Long): DataFrame = {
    require(totalBudget > 0)
    val counts = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n"))
    val w = counts.withColumn("weight", floor(sqrt(col("n").cast("double"))).cast("long"))
    // one-partition window over the tiny per-group frame (not the corpus);
    // DIV keeps the budget integer-exact (no double rounding to replay)
    val sumW = sum(col("weight")).over(org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)))
    w.withColumn("budget", expr(s"${totalBudget}L * weight") .cast("long"))
      .withColumn("sum_w", sumW)
      .withColumn("budget", expr("budget DIV sum_w"))
      .select(col("g").as(groupCol), col("n"), col("weight"), col("budget"))
  }

  /** Draw exactly budget_g rows per group under [[mixtureBudgets]]:
    * rank rows within each group by content hash (ties broken by id) and
    * keep rank <= budget. Deterministic, layout-independent, and
    * SQL-replayable.
    *
    * At 100 TB: the exact-budget variant is one window shuffle keyed on
    * the group column. When groups are few and huge that shuffle is
    * skew-prone — use the fractional variant instead (filter
    * unitHash < budget/n, map-side only, budget hit in expectation with
    * O(sqrt) deviation), which is what a production mixture does anyway.
    */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    totalBudget: Long, salt: String = "mixture",
                    exact: Boolean = true): DataFrame = {
    val budgets = mixtureBudgets(df, groupCol, totalBudget)
      .select(col(groupCol), col("n"), col("budget"))
    if (exact) {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
        .orderBy(unitHash(col(idCol), salt), col(idCol))
      df.withColumn("rk", row_number().over(win))
        .join(broadcast(budgets.drop("n")), Seq(groupCol))
        .filter(col("rk") <= col("budget"))
        .drop("rk", "budget")
    } else {
      // map-side: no window, no sort; budgets broadcast against the scan
      df.join(broadcast(budgets), Seq(groupCol))
        .filter(unitHash(col(idCol), salt) < col("budget").cast("double") / col("n"))
        .drop("budget", "n")
    }
  }

  /** Weighted priority sample (Duffield–Lund–Thorup): priority =
    * weight / u with u = unitHash ∈ (0,1); the global top-k by priority is
    * a weighted-without-replacement sample where inclusion probability is
    * proportional to weight (for weights small vs the threshold). The
    * standard one-pass scheme for "keep k rows, long docs proportionally
    * more likely" importance subsampling.
    *
    * Deterministic: u is the content hash, so the sample is stable across
    * reruns and layouts, and the oracle replays it exactly.
    *
    * At 100 TB: top-k is TakeOrdered — per-partition heaps of size k, one
    * driver merge of k·P candidates, no global sort, no shuffle of the
    * corpus. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "priority"): DataFrame = {
    require(k > 0)
    val u = unitHash(col(idCol), salt)
    // u is in [0,1); guard the (measure-zero, hash-possible) u = 0 case so
    // priority stays finite and both engines agree
    val prio = col(weightCol).cast("double") /
      when(u === 0.0, lit(1.0) / lit(9007199254740992.0)).otherwise(u)
    df.withColumn("priority", prio)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** UniMax-style capped waterfill budget allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling"): distribute
    * `totalBudget` examples as equally as possible across groups, subject
    * to a per-group cap of `maxEpochs` passes over that group's data —
    * the published successor to temperature sampling for multilingual
    * mixtures (no exponent to tune; low-resource groups are protected
    * from over-repetition by the epoch cap, high-resource groups share
    * the remainder equally).
    *
    * Integer-exact waterfill: groups ordered by (cap, group); each step
    * takes `min(cap, remaining DIV groupsLeft)`. Floor division makes the
    * recurrence replay bit-for-bit in SQL (recursive CTE); any floor
    * leftover goes to later (larger) groups, so an all-uncapped
    * allocation still sums to exactly `totalBudget`.
    *
    * The per-group frame is collected to the driver (G rows, the same
    * bounded-collect contract as dsirIlrTable): the corpus-scale work is
    * ONE map-side-combined count shuffle; the waterfill itself is O(G).
    * Group column must be string-typed. Returns (group, n, cap, budget). */
  def unimaxBudgets(df: DataFrame, groupCol: String,
                    totalBudget: Long, maxEpochs: Long): DataFrame = {
    require(totalBudget > 0 && maxEpochs > 0)
    val counts = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (g, n) => (n * maxEpochs, g) }
    var rem = totalBudget
    val rows = counts.zipWithIndex.map { case ((g, n), i) =>
      val share = rem / (counts.length - i)
      val cap = n * maxEpochs
      val alloc = math.min(cap, share)
      rem -= alloc
      (g, n, cap, alloc)
    }
    df.sparkSession.createDataFrame(rows.toSeq)
      .toDF(groupCol, "n", "cap", "budget")
  }

  /** Realize a [[unimaxBudgets]] allocation at document level: every doc
    * of a group with budget b repeats `b DIV n` times (whole epochs), and
    * the first `b % n` docs by content-hash rank repeat once more — the
    * deterministic partial epoch. Emits `n_copies` rather than exploding
    * rows (the trainer's repetition schedule; `explode(sequence(...))` it
    * if materialized copies are wanted). One window shuffle keyed on the
    * group column, budgets broadcast. */
  def unimaxSample(df: DataFrame, idCol: String, groupCol: String,
                   totalBudget: Long, maxEpochs: Long,
                   salt: String = "unimax"): DataFrame = {
    val budgets = unimaxBudgets(df, groupCol, totalBudget, maxEpochs)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(unitHash(col(idCol), salt), col(idCol))
    df.withColumn("rk", row_number().over(win))
      .join(broadcast(budgets), Seq(groupCol))
      .withColumn("n_copies", expr("budget DIV n") +
        when(col("rk") <= expr("budget % n"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col(groupCol), col("n_copies"))
  }

  /** Competence-based curriculum scheduling (Platanios et al. 2019):
    * rank documents by difficulty (here token count — the standard
    * sentence-length difficulty) and give each the FIRST training step at
    * which the model's competence admits it, under the square-root
    * competence schedule c(t) = sqrt(t/T): a doc at difficulty quantile
    * q becomes available at t = ceil(T·q²). Integer-exact:
    * first_step = (rank²·T + N² − 1) DIV N², so the schedule replays as
    * plain SQL. (The rank²·T product needs BIGINT headroom — exact up to
    * N ≈ 3·10⁶ docs at T=1000; past that switch the formula to doubles,
    * where a one-ulp step boundary wobble is irrelevant to training.)
    *
    * The global difficulty rank comes from a RANGE partition + the
    * two-phase zipWithIndex scan ([[strideInterleave]]'s device), never a
    * one-task window; N is one count job. Output:
    * (id, n_toks, rank, first_step). */
  def competenceCurriculum(df: DataFrame, idCol: String, textCol: String,
                           totalSteps: Long): DataFrame = {
    require(totalSteps > 0)
    val base = df.select(col(idCol),
      size(graft.functions.TextFunctions.tokens(col(textCol)))
        .cast("long").as("n_toks"))
    val n = base.count()
    require(n > 0, "empty corpus")
    // the scaladoc's BIGINT-headroom note, enforced: rank²·T + n² − 1 ≤
    // n²·(T + 1) − 1 must fit a Long or first_step wraps negative
    require(BigInt(n) * BigInt(n) * (BigInt(totalSteps) + 1) - 1 <= BigInt(Long.MaxValue),
      s"first_step = rank²·totalSteps overflows Long at n=$n docs, " +
        s"totalSteps=$totalSteps — rescale totalSteps or shard the corpus")
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ordered = base
      .repartitionByRange(p, col("n_toks"), col(idCol))
      .sortWithinPartitions(col("n_toks"), col(idCol))
    Partitioning.zipWithIndex(ordered, "pos")
      .withColumn("rank", col("pos") + 1L)
      .withColumn("first_step",
        expr(s"(rank * rank * ${totalSteps}L + ${n}L * ${n}L - 1L) DIV (${n}L * ${n}L)"))
      .select(col(idCol), col("n_toks"), col("rank"), col("first_step"))
  }

  /** Incremental mixture TOP-UP across deliveries — the steady-state
    * counterpart of [[unimaxBudgets]]: an existing corpus already has
    * `current_g` documents per group, a new delivery OFFERS `avail_g`
    * more, and `totalBudget` admissions should move the composition
    * toward `targetPerGroup` — so each group's admission cap is its
    * remaining DEFICIT (max(0, target − current)) bounded by what the
    * delivery actually contains, and the budget waterfills over those
    * caps with the exact integer recurrence of [[unimaxBudgets]]
    * (ascending caps, share = remaining DIV groupsLeft, replayable as a
    * recursive CTE). Admitting by deficit is what keeps a pipeline's
    * mixture on target when deliveries arrive skewed.
    *
    * `current` and `avail` are (group, count) frames — G rows each, the
    * same bounded-collect contract as unimaxBudgets; corpus-scale work
    * stays in the count aggregations the caller runs. Returns
    * (group, current, avail, cap, admit). */
  def topupBudgets(current: DataFrame, avail: DataFrame,
                   targetPerGroup: Long, totalBudget: Long): DataFrame = {
    require(targetPerGroup > 0 && totalBudget > 0)
    val cur = current.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val av = avail.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val groups = (cur.keySet ++ av.keySet).toSeq
    val capped = groups.map { g =>
      val c = cur.getOrElse(g, 0L); val a = av.getOrElse(g, 0L)
      (g, c, a, math.min(math.max(0L, targetPerGroup - c), a))
    }.sortBy { case (g, _, _, cap) => (cap, g) }
    var rem = totalBudget
    val rows = capped.zipWithIndex.map { case ((g, c, a, cap), i) =>
      val share = rem / (capped.length - i)
      val admit = math.min(cap, share)
      rem -= admit
      (g, c, a, cap, admit)
    }
    current.sparkSession.createDataFrame(rows)
      .toDF(current.columns.head, "current", "avail", "cap", "admit")
  }

  /** Realize a [[topupBudgets]] allocation against the delivery frame:
    * the first `admit_g` delivery docs of each group by content-hash rank
    * are admitted (same deterministic partial-prefix device as
    * [[unimaxSample]]). One window shuffle keyed on the group column,
    * budgets broadcast. */
  def topupAdmit(delivery: DataFrame, idCol: String, groupCol: String,
                 current: DataFrame, targetPerGroup: Long, totalBudget: Long,
                 salt: String = "topup"): DataFrame = {
    val avail = delivery.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val budgets = topupBudgets(current, avail, targetPerGroup, totalBudget)
      .select(col(groupCol), col("admit"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(unitHash(col(idCol), salt), col(idCol))
    delivery.withColumn("rk", row_number().over(win).cast("long"))
      .join(broadcast(budgets), Seq(groupCol))
      .filter(col("rk") <= col("admit"))
      .select(col(idCol), col(groupCol), col("rk"))
  }

  /** Token-budget cutoff selection — take documents in deterministic
    * content-hash order until a TOKEN budget (not a doc count) is
    * exhausted: the way a training corpus is actually sized ("the first
    * 500B tokens of the shuffled corpus"), with no doc ever straddling
    * the budget (a doc is kept iff it fits entirely:
    * cum_before + n_toks ≤ budget).
    *
    * The cumulative count is the two-phase distributed prefix scan
    * ([[Partitioning.prefixSum]] — range partition + per-partition sums +
    * offset map), NOT a one-task `sum() OVER (ORDER BY …)`; the oracle IS
    * that single-node window. Order key is the salted 64-bit content hash
    * of the id (ties broken by id in the oracle; a 64-bit collision
    * between distinct ids is the usual ~2^-64-per-pair accepted regime —
    * prefixSum's unique-order contract holds with overwhelming
    * probability at any corpus size).
    *
    * Output: the kept rows as (id, n_toks, cum_before). */
  def tokenBudgetSelect(df: DataFrame, idCol: String, textCol: String,
                        budget: Long, salt: String = "budget"): DataFrame = {
    require(budget > 0)
    val base = df.select(col(idCol),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("n_toks"))
      .withColumn("ord", graft.functions.Fnv1a64Expr(
        concat(col(idCol).cast("string"), lit(s":$salt"))))
    // the scan carries (id, n_toks) — no join-back (round 20)
    Partitioning.prefixSum(base, "ord", "n_toks", "cum_before")
      .filter(col("cum_before") + col("n_toks") <= budget)
      .select(col(idCol), col("n_toks"), col("cum_before"))
  }

  /** Token-budgeted SHARD layout — the dataloader-shard packing step
    * (WebDataset tar shards / streaming-dataset index files: the corpus
    * laid out in one deterministic order and cut into ~fixed-token
    * shards so a 1000-worker job reads balanced files): documents in
    * salted-content-hash order ([[tokenBudgetSelect]]'s order, same
    * collision regime), token counts accumulated by the two-phase
    * distributed prefix scan ([[Partitioning.prefixSum]] — never a
    * one-task `sum() OVER (ORDER BY …)`), and
    * `shard_id = cum_before DIV targetTokens`: a document straddling a
    * boundary belongs to the shard where it STARTS, so shards hold
    * whole documents and overshoot by less than one document — the
    * greedy layout every shard writer uses. Feed the result to a
    * partitionBy(shard_id) writer; shard sizes are balanced to
    * ±max-doc-tokens by construction.
    *
    * Output: (id, n_toks, cum_before, shard_id), one row per doc. */
  def tokenShardAssign(df: DataFrame, idCol: String, textCol: String,
                       targetTokens: Long, salt: String = "shard"): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    val base = df.select(col(idCol),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("n_toks"))
      .withColumn("ord", graft.functions.Fnv1a64Expr(
        concat(col(idCol).cast("string"), lit(s":$salt"))))
    // the scan carries (id, n_toks) — no join-back (round 20)
    Partitioning.prefixSum(base, "ord", "n_toks", "cum_before")
      .select(col(idCol), col("n_toks"), col("cum_before"),
        expr(s"cum_before DIV ${targetTokens}L").as("shard_id"))
  }

  /** Stride-scheduled domain interleave — the deterministic "blendable
    * dataset" ordering: emit the whole corpus in ONE global sequence where
    * at every prefix each group's share tracks its mixture weight (the
    * curriculum/data-loader ordering Megatron-style trainers consume,
    * scheduled like stride scheduling in OS schedulers: group g's i-th
    * document sits at virtual time (2i-1)/(2·w_g), all groups merged by
    * virtual time).
    *
    * Weights are the τ=2 temperature weights of [[mixtureBudgets]]
    * (w = floor(sqrt(n))), so rare groups are up-weighted relative to
    * proportional and every group spreads evenly until it runs out of
    * documents (stride scheduling degrades gracefully: an exhausted
    * group simply stops emitting, the rest re-normalize by construction).
    *
    * Integer-exact: virtual time vt = ((2·rk−1)·10^6) DIV (2·w) on longs
    * (rk is the deterministic content-hash rank within the group), ties
    * broken by (group, rk) — totally ordered, layout-independent, and
    * replayable as plain SQL. 10^6 scaling keeps vt collision-sparse while
    * leaving 10^12 rank headroom before overflow.
    *
    * Output: (id, group, vt, pos) with pos the global 0-based position.
    * At 100 TB: one window shuffle keyed on the group column for rk (same
    * skew caveat as exact [[mixtureSample]]), then the global order is a
    * RANGE partition + local sort on (vt, group, rk) — pos comes from the
    * two-phase zipWithIndex scan, NOT a one-task `row_number() OVER ()`.
    * The oracle IS that single-node window; the plan is the distributed
    * twin. */
  def strideInterleave(df: DataFrame, idCol: String, groupCol: String,
                       salt: String = "stride"): DataFrame =
    Partitioning.zipWithIndex(strideOrder(df, idCol, groupCol, salt), "pos")

  /** DoReMi domain reweighting (Xie et al., "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023) in
    * the house integer-exact device: the Group-DRO proxy loop that turns
    * per-example EXCESS LOSS (proxy − reference, caller-supplied as a
    * nonnegative integer column — milli-nats by convention) into domain
    * mixture weights. Per step t (minibatch = rows whose `stepCol` == t,
    * the caller's deterministic shard):
    *
    *   λ_t(k)  = clamp(Σ excess / n, 1e6)        per-domain mean excess
    *   α'(k)   = α(k) · (1000 + η·λ_t(k) DIV 1000) DIV 1000
    *                                              multiplicative-weights
    *                                              ascent (the linearized
    *                                              exp(η·λ) update — exact
    *                                              integers, no libm)
    *   α(k)    = (1−c)·norm(α') + c·uniform       DoReMi's smoothed
    *                                              renormalization
    *
    * and the returned mixture is DoReMi's ACROSS-STEP AVERAGE ᾱ plus the
    * final α. Weights are held in nano-units (Σ ≈ 1e9); every division
    * is a floor of nonnegative integers, so an external SQL oracle
    * replays the whole trajectory bit-for-bit (Spark BigInt ≡ DuckDB
    * HUGEINT).
    *
    * Output: (domainCol, avg_weight_nanos, final_weight_nanos), one row
    * per domain, the training-mix allocation [[mixtureSample]] consumes.
    *
    * Shape at 100 TB: ONE corpus pass — a (step, domain) grouped
    * aggregate with map-side partials (steps × domains rows to the
    * driver, model-scale like the vocab/budget collects this repo
    * bounds); the T-step loop is pure driver arithmetic on K-row state.
    * No per-step corpus scan, no shuffle beyond the one aggregate. */
  def doremiWeightsScaled(df: DataFrame, domainCol: String, excessCol: String,
                          stepCol: String, steps: Int, etaMilli: Long,
                          smoothMilli: Long): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(etaMilli >= 0 && etaMilli <= 10000, s"etaMilli=$etaMilli out of [0,10000]")
    require(smoothMilli >= 0 && smoothMilli <= 1000,
      s"smoothMilli=$smoothMilli out of [0,1000]")
    val spark = df.sparkSession
    val stats = df.groupBy(col(stepCol).cast("long").as("_t"),
        col(domainCol).cast("string").as("_g"))
      .agg(sum(greatest(col(excessCol).cast("long"), lit(0L))).as("_s"),
        count(lit(1)).as("_n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    import spark.implicits._
    doremiTrajectory(stats, steps, etaMilli, smoothMilli)
      .toDF(domainCol, "avg_weight_nanos", "final_weight_nanos")
  }

  /** The DoReMi driver arithmetic shared by [[doremiWeightsScaled]] and
    * the streaming face (StreamingMixture.startDoremiIngest): given the
    * additive per-(step, domain) (Σ excess, count) statistics — the only
    * corpus-derived state, mergeable across deliveries — replay the full
    * T-step trajectory and return (domain, avg_weight_nanos,
    * final_weight_nanos) in sorted domain order. All floors of
    * nonnegative integers; BigInt ≡ the oracle's HUGEINT. */
  private[graft] def doremiTrajectory(stats: Map[(Long, String), (Long, Long)],
                                      steps: Int, etaMilli: Long,
                                      smoothMilli: Long): Seq[(String, Long, Long)] = {
    val S = 1000000000L
    val lam = stats.map { case (k, (s, n)) => k -> math.min(s / n, 1000000L) }
    val domains = stats.keysIterator.map(_._2).toSeq.distinct.sorted
    require(domains.nonEmpty, "doremi needs at least one domain")
    val k = domains.length
    val uniform = S / k
    var w: Map[String, BigInt] = domains.map(_ -> BigInt(uniform)).toMap
    val acc = scala.collection.mutable.Map(domains.map(_ -> BigInt(0)): _*)
    (0L until steps).foreach { t =>
      val wp = domains.map { g =>
        val factor = 1000L + etaMilli * lam.getOrElse((t, g), 0L) / 1000L
        g -> w(g) * factor / 1000
      }
      val tot = wp.map(_._2).sum
      w = wp.map { case (g, v) =>
        val norm = v * S / tot
        g -> (BigInt(1000 - smoothMilli) * norm / 1000 +
          BigInt(smoothMilli) * uniform / 1000)
      }.toMap
      domains.foreach(g => acc(g) += w(g))
    }
    domains.map(g => (g, (acc(g) / steps).toLong, w(g).toLong))
  }

  /** Realize a learned domain mixture as per-document COPY COUNTS — the
    * consumption half of DoReMi (the paper trains the production model
    * on data RESAMPLED to the learned weights): each domain gets budget
    * ⌊totalBudget · w_nanos / 1e9⌋ slots, distributed over its documents
    * as ⌊b/n⌋ copies each plus one extra for the first (b mod n) by
    * salted-hash rank — the [[unimaxSample]] copy-realization law under
    * externally supplied weights instead of waterfilled caps. Domains
    * absent from `weights` get nothing (a mixture cannot realize a
    * domain it never weighted).
    *
    * Output: (idCol, domainCol, n_copies), rows with n_copies > 0.
    *
    * Shape at 100 TB: ranks ride [[Partitioning.groupedRankAdaptive]] —
    * a heavily-weighted domain is exactly the dominant group the
    * two-phase scan exists for, while a web-scale domain key (~1e8
    * registered domains) routes to the hash-partitioned window so the
    * driver never holds O(G) state; weights and per-domain counts
    * BROADCAST (model-scale), the copy law is a map-side expression. */
  def doremiRealize(df: DataFrame, idCol: String, domainCol: String,
                    weights: DataFrame, weightCol: String, totalBudget: Long,
                    salt: String = "doremi"): DataFrame = {
    require(totalBudget >= 1 && totalBudget <= 1000000000L,
      s"totalBudget=$totalBudget out of [1, 1e9] (budget·nanos must fit a long)")
    val bud = weights.select(col(domainCol),
      expr(s"(${totalBudget}L * $weightCol) DIV 1000000000L").as("_b"))
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_n"))
    val ranked = Partitioning.groupedRankAdaptive(
      df.select(col(idCol), col(domainCol)), domainCol,
      Seq(unitHash(col(idCol), salt).asc, col(idCol).asc), "_rk",
      groupCounts = Some(counts)) // already computed for the copy law below
    ranked
      .join(broadcast(bud), Seq(domainCol))
      .join(broadcast(counts), Seq(domainCol))
      .withColumn("n_copies",
        expr("_b DIV _n") + when(col("_rk") <= expr("_b % _n"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col(domainCol), col("n_copies"))
  }

  /** Per-domain quota cap — the MassiveWeb/RefinedWeb guard against one
    * host dominating the mix (Rae et al. 2021 §A.1.2 cap the documents
    * any single domain contributes): keep at most `perDomain` documents
    * per domain, chosen by the salted content hash (deterministic,
    * layout-independent, ties to the lower id). Output: (idCol,
    * domainCol, rk) for the kept rows.
    *
    * Shape at 100 TB: the rank is [[Partitioning.groupedRankAdaptive]]
    * — a dominant domain (the exact case a cap exists for) takes the
    * two-phase range-partitioned scan so it spans partitions instead of
    * funneling a domain-keyed window through one task, while a
    * web-scale domain key (~1e8 registered hosts, each holding a tiny
    * corpus share) hash-partitions through the window with zero driver
    * state. */
  def domainQuotaCap(df: DataFrame, idCol: String, domainCol: String,
                     perDomain: Int, salt: String = "quota"): DataFrame = {
    require(perDomain >= 1, s"perDomain must be >= 1, got $perDomain")
    val keyed = df.select(col(idCol), col(domainCol))
    Partitioning.groupedRankAdaptive(keyed, domainCol,
        Seq(unitHash(col(idCol), salt).asc, col(idCol).asc), "rk")
      .filter(col("rk") <= perDomain)
      .select(col(idCol), col(domainCol), col("rk"))
  }

  /** The DataFrame half of [[strideInterleave]] — everything up to the
    * global RANGE-partitioned sort, before the two-phase index scan turns
    * it into an RDD (which hides the plan). Split out so PlanQualitySpec
    * can pin the shape: group-keyed window, broadcast weights, range
    * partition — never a single-partition corpus window. */
  private[graft] def strideOrder(df: DataFrame, idCol: String,
                                 groupCol: String, salt: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val w = counts.withColumn("weight",
      floor(sqrt(col("n").cast("double"))).cast("long")).drop("n")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(unitHash(col(idCol), salt), col(idCol))
    val keyed = df.withColumn("rk", row_number().over(win).cast("long"))
      .join(broadcast(w), Seq(groupCol))
      .withColumn("vt", expr("((2L * rk - 1L) * 1000000L) DIV (2L * weight)"))
      .select(col(idCol), col(groupCol), col("rk"), col("vt"))
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    keyed
      .repartitionByRange(p, col("vt"), col(groupCol), col("rk"))
      .sortWithinPartitions(col("vt"), col(groupCol), col("rk"))
  }
}
