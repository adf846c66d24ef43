package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting by content hash.
  *
  * Train/val/test assignment must be a pure function of the example (not
  * of row order, partitioning, or a sampling seed), or re-running the
  * pipeline reshuffles the split and leaks val/test into training.
  * Bucketing on the first md5 byte of the content gives 256 stable
  * buckets; the split is a string-range comparison on the hex bucket, so
  * any engine that can md5 reproduces the assignment exactly.
  *
  * Defaults: bucket < "cc" -> train (204/256 = 79.7%), < "e6" -> val
  * (26/256 = 10.2%), else test (10.2%). A pure map stage - no shuffle,
  * no sampling, no driver state.
  */
object Splitting {

  def assignSplit(df: DataFrame, contentCol: String = "text",
                  trainUpperHex: String = "cc",
                  valUpperHex: String = "e6"): DataFrame = {
    val bucket = substring(md5(col(contentCol).cast("binary")), 1, 2)
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(bucket < trainUpperHex, "train")
          .when(bucket < valUpperHex, "val")
          .otherwise("test"))
  }

  /** Greedy token-budget selection - the data-mixing primitive "take
    * the best documents until the token budget is spent": rank every
    * document by (scoreCol DESC, idCol ASC) - a total order - and keep
    * exactly the documents whose cumulative token count BEFORE them is
    * < `budget` (the greedy prefix; the straddling document is kept,
    * its predecessor sum is still under budget). Output keeps the
    * input id/token/score columns plus `cum_before`.
    *
    * Scale shape: the global greedy order is NOT a single-task global
    * window - it runs through [[graft.operators.ShardedPrefixSum]]
    * (range partition on the order key, parallel within-shard cumsums,
    * broadcast shard offsets), so a 100 TB corpus ranks and
    * prefix-sums fully parallel. The descending score component rides
    * as a negated column (ShardedPrefixSum orders ascending), and ties
    * break by id on both engines, keeping the selection deterministic
    * and SQL-replayable. A null score or token count FAILS the job
    * (raise_error): a null score would otherwise sort first under the
    * negated ascending order - silently "best" - and a null token
    * count would vanish from the running sum. */
  def tokenBudgetSelect(df: DataFrame, budget: Long, scoreCol: String,
                        tokenCol: String, idCol: String = "doc_id",
                        numShards: Int = 0): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    // fail loud on null score/tokens: a null score would otherwise sort
    // FIRST under the negated ascending order (silently "best"), and a
    // null token count would vanish from the running sum
    val keyed = df.select(col(idCol), col(tokenCol), col(scoreCol))
      .withColumn("__tb_neg", when(
          col(scoreCol).isNull || col(tokenCol).isNull,
          raise_error(concat(lit("tokenBudgetSelect: null score/tokens at "),
            lit(s"$idCol="), col(idCol).cast("string"))))
        .otherwise(negate(col(scoreCol).cast("double"))))
      .withColumn("__tb_all", lit(0))
    graft.operators.ShardedPrefixSum
      .cumBefore(keyed, tokenCol, "__tb_all", Seq("__tb_neg", idCol),
        numShards, "cum_before")
      .filter(col("cum_before") < budget)
      .drop("__tb_neg", "__tb_all")
  }

  /** PER-STRATUM greedy token-budget selection - the real data-mixing
    * primitive ("30 B code tokens, 20 B web tokens"): within each
    * stratum, rank by (scoreCol DESC, idCol ASC) and keep the greedy
    * prefix whose cumulative tokens BEFORE each document stay under
    * that stratum's budget (the straddler is kept, exactly the
    * [[tokenBudgetSelect]] rule applied per stratum). Strata missing
    * from `budgets` fall back to `defaultBudget`; 0 drops them
    * entirely (out of the recipe, the [[mixtureSample]] convention).
    *
    * Scale shape: ONE [[graft.operators.ShardedPrefixSum]] pass keyed
    * on the stratum - all strata rank and prefix-sum in the same
    * range-partitioned topology, a hot stratum ("web" = most of the
    * corpus) splits across shards instead of serializing through one
    * window task, and the budget cut is a per-row literal when-chain
    * (budgets are driver-side CONFIGURATION, config-sized). Null
    * score/tokens FAIL LOUD exactly as in [[tokenBudgetSelect]]. */
  def tokenBudgetSelectPerStratum(df: DataFrame, budgets: Map[String, Long],
                                  scoreCol: String, tokenCol: String,
                                  strataCol: String = "source",
                                  idCol: String = "doc_id",
                                  defaultBudget: Long = 0L,
                                  numShards: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "per-stratum budgets must name at least one stratum")
    require(budgets.values.forall(_ > 0),
      s"every named budget must be positive: $budgets")
    require(defaultBudget >= 0, s"defaultBudget $defaultBudget must be >= 0")
    val keyed = df
      .select(col(idCol), col(strataCol), col(tokenCol), col(scoreCol))
      .withColumn("__tb_neg", when(
          col(scoreCol).isNull || col(tokenCol).isNull,
          raise_error(concat(
            lit("tokenBudgetSelectPerStratum: null score/tokens at "),
            lit(s"$idCol="), col(idCol).cast("string"))))
        .otherwise(negate(col(scoreCol).cast("double"))))
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) {
      case (rest, (stratum, b)) =>
        when(col(strataCol) === stratum, lit(b)).otherwise(rest)
    }
    graft.operators.ShardedPrefixSum
      .cumBefore(keyed, tokenCol, strataCol, Seq("__tb_neg", idCol),
        numShards, "cum_before")
      .filter(col("cum_before") < budgetCol)
      .drop("__tb_neg")
  }

  /** 8-hex-digit (32-bit) cutoff for a keep rate: a row survives when
    * its hash prefix compares below this string. */
  private[llm] def rateCutoffHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    // a keep-all rate must keep EVERY row including bucket "ffffffff":
    // "g" sorts above every hex digit, so `bucket < "g"` is always
    // true. The rounding boundary needs the same sentinel: a rate just
    // below 1.0 (>= 1 - 2^-33) rounds to 2^32, whose f"%08x" is the
    // NINE-char "100000000" - lexicographically below "2...", which
    // would invert the keep decision for most buckets.
    val rounded = math.round(rate * 4294967296.0)
    if (rounded >= 4294967296L) "g"
    else f"$rounded%08x"
  }

  /** Deterministic per-stratum down-sampling (the data-mixing step:
    * web crawl at 5%, books at 100%): keep a row iff the first 8 hex
    * chars of md5(salt || content) fall under its stratum's rate
    * cutoff. Like [[assignSplit]], survival is a pure function of the
    * content - no seed, no row order, re-runs reproduce the mixture
    * exactly. The salt decorrelates the sampling decision from the
    * split assignment (both read md5 prefixes; with no salt the kept
    * set would be a prefix-biased subset of the train split).
    *
    * Adds `sample_bucket` (the hex prefix) and `kept` (1/0); callers
    * filter on `kept`. Strata missing from `rates` fall back to
    * `defaultRate`. Pure map stage over a tiny when-chain - the rate
    * map is driver-side CONFIGURATION with config-sized cardinality;
    * data-driven strata go through [[temperatureSample]]'s join path
    * instead. */
  def sampleStratified(df: DataFrame, rates: Map[String, Double],
                       strataCol: String = "source",
                       contentCol: String = "text",
                       salt: String = "sample-v1",
                       defaultRate: Double = 1.0): DataFrame = {
    val bucket = substring(
      md5(concat(lit(salt), col(contentCol)).cast("binary")), 1, 8)
    val cutoff = rates.foldLeft(lit(rateCutoffHex(defaultRate))) {
      case (rest, (stratum, rate)) =>
        when(col(strataCol) === stratum, rateCutoffHex(rate)).otherwise(rest)
    }
    df.withColumn("sample_bucket", bucket)
      .withColumn("kept", (bucket < cutoff).cast("int"))
  }

  /** Temperature-based mixture resampling: keep rates proportional to
    * n_s^(alpha-1), normalized so the SMALLEST non-null stratum keeps
    * everything - the standard multilingual/source re-weighting (q_s
    * proportional to n_s^alpha realized by downsampling only; alpha=1
    * keeps the natural mixture, alpha->0 approaches uniform). Rates are
    * quantized to 6 decimals so the engine-recomputed oracle agrees
    * (pow differs in the last ulp across engines; the quantized rate
    * does not, outside a ~1e-10 boundary measure). Survival is the same
    * salted content-hash cutoff as [[sampleStratified]].
    *
    * Null strata neither receive a rate nor participate in n_min; their
    * rows are kept (rate 1), mirroring the oracle's LEFT JOIN +
    * coalesce('g'). Unlike sampleStratified's config-sized when-chain,
    * the per-stratum cutoffs attach via a BROADCAST JOIN of the
    * (stratum, cutoff) frame - strata here are data-driven and may
    * number in the thousands (per-language mixtures), and a
    * thousands-deep CASE chain blows up Catalyst analysis.
    *
    * Fully in-plan (one job): n_min is a `min(n) OVER ()` window over
    * the per-stratum count frame - |strata| rows through one window
    * partition, the same boundedness the old driver collect had, minus
    * the extra job and the driver round-trip. The cutoff arithmetic
    * (6-decimal rate quantization, 32-bit rounding, the "g" overflow
    * sentinel for rates at 1.0 - see [[rateCutoffHex]]) runs as Catalyst
    * expressions that mirror the DuckDB oracle text operation-for-
    * operation. Works for any stratum column type (the join key is the
    * column itself, never a driver-side string). */
  def temperatureSample(df: DataFrame, alpha: Double = 0.5,
                        strataCol: String = "source",
                        contentCol: String = "text",
                        salt: String = "temp-v1"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val rate = round(
      pow(col("__n").cast("double") / col("__nmin").cast("double"),
        alpha - 1.0), 6)
    val rounded = round(rate * 4294967296.0)
    val cutDf = counts
      .withColumn("__nmin",
        min(col("__n")).over(Window.partitionBy()))
      .withColumn("__cutoff",
        when(rounded >= 4294967296.0, lit("g"))
          .otherwise(lower(lpad(hex(rounded.cast("long")), 8, "0"))))
      .select(col("__stratum"), col("__cutoff"))
    val bucket = substring(
      md5(concat(lit(salt), col(contentCol)).cast("binary")), 1, 8)
    df.join(broadcast(cutDf), col(strataCol) === col("__stratum"), "left")
      .withColumn("sample_bucket", bucket)
      .withColumn("kept",
        (bucket < coalesce(col("__cutoff"), lit("g"))).cast("int"))
      .drop("__stratum", "__cutoff")
  }

  /** Explicit target-weight mixture construction: realize target
    * proportions `weights` (web 30%, books 60%, code 10%) by
    * DOWNSAMPLING only - rate_s = (w_s / n_s) / max_t(w_t / n_t), so
    * the stratum whose natural share falls furthest below its target
    * keeps everything and every other stratum downsamples toward the
    * recipe (upsampling is a repetition policy, out of scope here).
    * The complement of [[temperatureSample]]: temperature derives the
    * weights from the counts; this takes them as explicit
    * configuration. Strata absent from `weights` - and null strata -
    * get weight 0 and are dropped entirely ("not in the recipe" is an
    * exclusion, unlike temperatureSample's keep-nulls contract).
    *
    * Same determinism contract and scale shape as temperatureSample:
    * rates quantized to 6 decimals, the 32-bit hex cutoff of
    * [[rateCutoffHex]] mirrored in-plan, survival a pure function of
    * salted content hash, cutoffs attached by broadcast join (one
    * count aggregate + one map pass over the data). */
  def mixtureSample(df: DataFrame, weights: Map[String, Double],
                    strataCol: String = "source",
                    contentCol: String = "text",
                    salt: String = "mix-v1"): DataFrame = {
    require(weights.values.forall(_ >= 0.0),
      s"negative mixture weight in $weights")
    require(weights.values.exists(_ > 0.0),
      "mixture needs at least one positive weight")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val wcol = weights.foldLeft(lit(0.0)) {
      case (rest, (stratum, wgt)) =>
        when(col("__stratum") === stratum, lit(wgt)).otherwise(rest)
    }
    val rate = round(col("__ratio") / col("__rmax"), 6)
    val rounded = round(rate * 4294967296.0)
    val cutDf = counts
      .withColumn("__ratio", wcol / col("__n").cast("double"))
      .withColumn("__rmax",
        max(col("__ratio")).over(Window.partitionBy()))
      .withColumn("__cutoff",
        // every in-recipe stratum missing from the data: __rmax can be
        // 0 only when NO weighted stratum has rows - then nothing
        // survives (rate would be 0/0)
        when(col("__rmax") === 0, lit("00000000"))
          .when(rounded >= 4294967296.0, lit("g"))
          .otherwise(lower(lpad(hex(rounded.cast("long")), 8, "0"))))
      .select(col("__stratum"), col("__cutoff"))
    val bucket = substring(
      md5(concat(lit(salt), col(contentCol)).cast("binary")), 1, 8)
    df.join(broadcast(cutDf), col(strataCol) === col("__stratum"), "left")
      .withColumn("sample_bucket", bucket)
      .withColumn("kept",
        (bucket < coalesce(col("__cutoff"), lit("00000000"))).cast("int"))
      .drop("__stratum", "__cutoff")
  }

  /** Repetition/upsampling mixture policy - the complement of
    * [[mixtureSample]]: realize target proportions whose weight sits
    * ABOVE a stratum's natural share by integer repetition. Rates are
    * normalized so the most over-represented in-recipe stratum keeps
    * exactly one copy - rate_s = (w_s / n_s) / min_t>0(w_t / n_t) >= 1
    * - and every other stratum repeats toward the recipe:
    * `copies = floor(rate) + (1 if hash-fraction else 0)`, where the
    * fractional extra copy reuses the [[rateCutoffHex]] 32-bit cutoff
    * against the salted content hash, so expected copies equal the rate
    * and the decision is a pure content function (re-runs, row order,
    * and partitioning reproduce the mixture exactly). Strata absent
    * from `weights` - and null strata - get 0 copies ("not in the
    * recipe" is an exclusion, as in mixtureSample).
    *
    * Adds `sample_bucket` and integer `copies`; callers realize the
    * repetition with `filter(col("copies") > 0)` THEN
    * `explode(sequence(lit(1), col("copies")))` - the filter is load-
    * bearing, because Spark infers a NEGATIVE step for sequence(1, 0)
    * and an unguarded explode would emit TWO rows ([1, 0]) for every
    * excluded document. Expansion is bounded by ceil(max rate) <=
    * ceil(`maxRate`) - the clamp keeps a pathological recipe (2-row
    * stratum targeted at 50%) from exploding a stratum by millions.
    * Null content cannot be hashed, so a null-`contentCol` row in an
    * in-recipe stratum gets its base copies with no fractional extra
    * (never a null `copies`). Rates quantized to 6 decimals like
    * mixtureSample, so any md5-capable engine replays the copy counts
    * bit-for-bit. One count aggregate + broadcast cutoff join + map
    * pass - no data-sized shuffle. */
  def mixtureRepeat(df: DataFrame, weights: Map[String, Double],
                    strataCol: String = "source",
                    contentCol: String = "text",
                    salt: String = "mixrep-v1",
                    maxRate: Double = 64.0): DataFrame = {
    require(weights.values.forall(_ >= 0.0),
      s"negative mixture weight in $weights")
    require(weights.values.exists(_ > 0.0),
      "mixture needs at least one positive weight")
    require(maxRate >= 1.0, s"maxRate $maxRate < 1")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val wcol = weights.foldLeft(lit(0.0)) {
      case (rest, (stratum, wgt)) =>
        when(col("__stratum") === stratum, lit(wgt)).otherwise(rest)
    }
    val frac = col("__rate") - floor(col("__rate"))
    val rounded = round(frac * 4294967296.0)
    val cutDf = counts
      .withColumn("__ratio", wcol / col("__n").cast("double"))
      .withColumn("__rmin",
        min(when(col("__ratio") > 0, col("__ratio")))
          .over(Window.partitionBy()))
      // __rmin null only when NO in-recipe stratum has rows - then
      // nothing repeats (rate 0 for every stratum)
      .withColumn("__rate",
        when(col("__ratio") === 0 || col("__rmin").isNull, lit(0.0))
          .otherwise(round(least(col("__ratio") / col("__rmin"),
            lit(maxRate)), 6)))
      .withColumn("__base", floor(col("__rate")).cast("int"))
      .withColumn("__fcut",
        // unreachable at 6-decimal quantization (max frac 0.999999
        // rounds below 2^32) but kept symmetric with rateCutoffHex
        when(rounded >= 4294967296.0, lit("g"))
          .otherwise(lower(lpad(hex(rounded.cast("long")), 8, "0"))))
      .select(col("__stratum"), col("__base"), col("__fcut"))
    val bucket = substring(
      md5(concat(lit(salt), col(contentCol)).cast("binary")), 1, 8)
    df.join(broadcast(cutDf), col(strataCol) === col("__stratum"), "left")
      .withColumn("sample_bucket", bucket)
      .withColumn("copies",
        coalesce(col("__base"), lit(0)) +
          coalesce((bucket < coalesce(col("__fcut"), lit("00000000")))
            .cast("int"), lit(0)))
      .drop("__stratum", "__base", "__fcut")
  }

  /** Materialize [[mixtureRepeat]]'s copy counts into physical rows:
    * one output row per (row, 1..copies), indexed by `idxCol`. The
    * copies>0 filter is load-bearing (Spark's sequence(1, 0) infers a
    * NEGATIVE step and would emit [1, 0] - two rows - for every
    * excluded document); this helper exists so callers cannot hand-roll
    * that trap. Expansion is bounded by the mixtureRepeat maxRate
    * clamp; a pure flatMap stage, no shuffle. */
  def realizeCopies(df: DataFrame, copiesCol: String = "copies",
                    idxCol: String = "copy_idx"): DataFrame =
    df.filter(col(copiesCol) > 0)
      .withColumn(idxCol, explode(sequence(lit(1), col(copiesCol))))

  /** Deterministic global "shuffle" for training order: every row gets
    * a (shard, pos) coordinate that is a pure function of its content -
    * shard = first `shardHexChars` of md5(salt || content) (16^c
    * shards), pos = rank of the full hash (ties to idCol) within the
    * shard. Reading shards in order, positions in order, is a
    * reproducible pseudorandom permutation of the corpus: re-runs,
    * repartitioning, and insertion order cannot change it, and a new
    * salt is a fresh permutation (epoch reshuffle without a seed
    * store).
    *
    * Scale shape: ONE shuffle (hash partition on shard), then a
    * per-shard sort of n/16^c rows - no global total-order exchange.
    * Size shardHexChars so a shard fits an executor's sort budget
    * (c=4 -> 65536 shards, ~1.5M rows/shard at 1e11 rows). Null
    * content hashes to a null shard whose rows rank by idCol - they
    * stay addressable, flagged by shard IS NULL. */
  def shuffleOrder(df: DataFrame, idCol: String = "doc_id",
                   contentCol: String = "text",
                   salt: String = "shuffle-v1",
                   shardHexChars: Int = 1): DataFrame = {
    require(shardHexChars >= 1 && shardHexChars <= 8,
      s"shardHexChars $shardHexChars outside [1, 8]")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h",
        md5(concat(lit(salt), col(contentCol)).cast("binary")))
      .withColumn("shard", substring(col("__h"), 1, shardHexChars))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Leakage-safe split: [[assignSplit]] keyed by the near-duplicate
    * CLUSTER rather than the document, so every member of a connected
    * near-dup component receives the SAME train/val/test assignment -
    * closing the split-leakage hole a per-doc hash split has on a
    * near-dup corpus (a training doc's near-copy lands in val/test and
    * inflates eval). `pairs` is any near-dup pair frame (minhash LSH,
    * SimHash, embedding cosine); the split key is the cluster's MINIMUM
    * per-doc content hash, a pure function of the cluster's content -
    * ids, row order, and partitioning never influence the assignment,
    * and docs in no pair reduce exactly to assignSplit's per-doc
    * content-hash bucket. Docs with null content in a cluster defer to
    * the cluster's non-null minimum; an all-null cluster (or null-text
    * singleton) has a null bucket and lands in "test", as in
    * assignSplit.
    *
    * Scale shape: one connected-components run over the pair graph
    * (log-round pointer jumping; the pair frame is the expensive input
    * and is typically shared/memoized upstream), one left join of docs
    * to labels, one per-cluster window min. */
  def leakageSafeSplit(df: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id", contentCol: String = "text",
                       trainUpperHex: String = "cc",
                       valUpperHex: String = "e6"): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
    val withCluster = df
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("__cluster", coalesce(col("component"), col(idCol)))
    val w = Window.partitionBy(col("__cluster"))
    val bucket = substring(
      min(md5(col(contentCol).cast("binary"))).over(w), 1, 2)
    withCluster
      .withColumn("split_bucket", bucket)
      .withColumn("split",
        when(bucket < trainUpperHex, "train")
          .when(bucket < valUpperHex, "val")
          .otherwise("test"))
      .drop("component", "__cluster")
  }
}
