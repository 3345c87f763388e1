package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skip-gram-with-negative-sampling (SGNS) embedding training over a
  * (center, context, n) co-occurrence table — the step that completes
  * the DeepWalk chain (Perozzi et al. KDD'14; Mikolov et al. NIPS'13
  * §2.2): walks → skip-gram pairs (`graph_walk_skipgram`) → vectors.
  * Extension surface beyond the reference (its notebook trains
  * nothing).
  *
  * ONE full-batch epoch against FROZEN context vectors (the
  * alternating-optimization half-step): input vectors u move toward
  * their contexts' output vectors v and away from a sampled negative,
  * v stays fixed for the epoch. Full-batch (not per-pair sequential
  * SGD) is what makes the epoch order-free and therefore
  * oracle-checkable — the same reformulation [[LogReg.fit]] uses.
  *
  * Determinism contract (the LogReg operand-pinning pattern):
  *  - u/v INIT are closed-form integer formulas of (node, dim) —
  *    both engines rebuild them bit-exactly;
  *  - the pair dot products u_c·v are d explicit products added
  *    LEFT-TO-RIGHT (no distributed reassociation);
  *  - the link is [[LogReg.fastSigmoid]] (rational — IEEE-exact in
  *    both engines, unlike libm exp);
  *  - the per-(node, dim) gradient SUM — the one order-dependent
  *    reduction — is pinned to 6 dp, and so is the updated weight.
  *  - the negative for a pair is the node ranked
  *    md5-fold(center#context) mod |nodes| in the id-sorted node list
  *    — seeded, replayable, no RNG state (the random-walk convention).
  *
  * Scale: the pair table is walk-bounded; candidate work is
  * |pairs|·d gradient addends through ONE map-side-combined hash
  * aggregate on (node, dim) — never |V|² and never E. The ranked node
  * list is a window over walk-visited nodes (walk-bounded); |nodes|
  * is one scalar count (S4).
  *
  * Output: (node, dim, value) — the UPDATED input vectors of every
  * center node, 6 dp.
  */
object SkipGram {

  /** Input-vector init: u(node, i) = ((node·31 + i·17) mod 13 − 6)/10
    * ∈ [−0.6, 0.6] — small signed values, mirrored verbatim in SQL.
    */
  def uInit(node: Column, i: Column): Column =
    ((node * 31 + i * 17) % 13 - 6).cast("double") / 10.0

  /** Frozen context-vector init: v(node, i) =
    * ((node·29 + i·23) mod 11 − 5)/10 — a DIFFERENT lattice than
    * [[uInit]] so u·v is not degenerately self-correlated at init.
    */
  def vInit(node: Column, i: Column): Column =
    ((node * 29 + i * 23) % 11 - 5).cast("double") / 10.0

  /** One frozen-context SGNS epoch over `pairs` (center, context,
    * n ≥ 1). Minimizes Σ n·[−log σ(u_c·v_o) − log σ(−u_c·v_neg)] in u
    * by one full-batch gradient step:
    * ∂/∂u_c = Σ n·[(σ(u_c·v_o) − 1)·v_o + σ(u_c·v_neg)·v_neg].
    *
    * Oracle-safety note on `lr`: the update rounds u₀ − lr·g to 6 dp
    * with g already 6dp-pinned. An lr whose product with a 6-decimal
    * value can carry MORE than 6 decimals (e.g. 0.5 → a 7th decimal
    * that is always 0 or 5) parks the update EXACTLY on the rounding
    * half-boundary, where Spark (shortest-decimal BigDecimal HALF_UP)
    * and DuckDB (binary scale-and-round) systematically disagree —
    * measured on the gate fixture before the default moved to 1.0.
    * Cross-engine-checked callers must keep lr·(6dp) within 6 dp
    * (integer lr, or rescale the init lattice instead).
    */
  def trainEpoch(pairs: DataFrame, dim: Int = 4, lr: Double = 1.0): DataFrame = {
    require(dim >= 1 && dim <= 16, "dim in [1,16] — unrolled per-dim columns")
    val p = graft.Caches.persist(
      pairs.select(col("center"), col("context"), col("n")))
    // id-sorted rank over every walk-visited node — the negative-sample
    // universe. Global rank via the PrefixSum two-phase scan (rank =
    // running count of 1s over ascending node id), NOT an
    // unpartitioned window (banned repo-wide — PlanSmellSpec): node
    // ids are distinct post-distinct, so cum_one IS the 1-based rank.
    // 64k-id buckets keep the carry ledger broadcast-small up to
    // multi-billion-id spaces.
    val nodes = p.select(col("center").as("node"))
      .unionAll(p.select(col("context").as("node")))
      .distinct()
    val ranked = graft.Caches.persist(
      PrefixSum.scan(nodes.withColumn("__one", lit(1L)), "node",
          Seq("__one"), bucketSize = 1L << 16)
        .select(col("node"), col("cum___one").as("rnk")))
    val nn = ranked.count() // S4 scalar — the mod base, a literal below
    // false-negative guard (Mikolov's sampler re-draws when the
    // negative hits the target pair): a draw equal to the pair's
    // center or its TRUE context would push the embedding exactly
    // against the signal it just learned — such draws contribute a
    // ZERO negative term instead (deterministically mirrored in SQL)
    val withNeg = p
      .withColumn("rnk",
        Dedup.md5Hash60(concat_ws("#", col("center"), col("context")))
          % lit(nn) + 1)
      .join(ranked, Seq("rnk"))
      .withColumn("negw",
        when(col("node") === col("center") || col("node") === col("context"),
          lit(0.0)).otherwise(lit(1.0)))
      .select(col("center"), col("context"), col("n"),
        col("node").as("neg"), col("negw"))
    // fixed left-to-right dot products over the closed-form inits
    def dotUV(target: Column): Column =
      (0 until dim).map(i =>
        uInit(col("center"), lit(i)) * vInit(target, lit(i)))
        .reduce(_ + _)
    val scored = withNeg
      .withColumn("spos", LogReg.fastSigmoid(dotUV(col("context"))))
      .withColumn("sneg", LogReg.fastSigmoid(dotUV(col("neg"))))
    // per-dim gradient addends, each pinned 9dp UNDER the 6dp sum pin
    // (the search_lm_dirichlet double-pin convention: identical addend
    // multisets on both engines keep association-order ulps from ever
    // straddling a 6dp half-boundary); ONE (node, dim)-keyed hash agg
    val grads = (0 until dim).map { i =>
      scored.select(
        col("center").as("node"),
        lit(i.toLong).as("dim"),
        round(col("n").cast("double") *
          ((col("spos") - 1.0) * vInit(col("context"), lit(i)) +
            col("negw") * col("sneg") * vInit(col("neg"), lit(i))), 9).as("g"))
    }.reduce(_ unionAll _)
      .groupBy("node", "dim")
      .agg(round(sum("g"), 6).as("g")) // the one order-dependent sum: pin
    // update against the formula init, pin the weight
    grads.select(col("node"), col("dim"),
      round(uInit(col("node"), col("dim")) - lit(lr) * col("g"), 6)
        .as("value"))
  }
}
