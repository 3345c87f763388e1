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

  /** One frozen-context SGNS epoch — [[train]] with `epochs = 1`. */
  def trainEpoch(pairs: DataFrame, dim: Int = 4, lr: Double = 0.1): DataFrame =
    train(pairs, dim, lr, epochs = 1)

  /** `epochs` frozen-context SGNS epochs over `pairs` (center, context,
    * n ≥ 1). Each epoch minimizes
    * Σ n·[−log σ(u_c·v_o) − log σ(−u_c·v_neg)] in u by one full-batch
    * gradient step from the PREVIOUS epoch's pinned weights:
    * ∂/∂u_c = Σ n·[(σ(u_c·v_o) − 1)·v_o + σ(u_c·v_neg)·v_neg].
    * Context vectors v and the per-pair negative draw stay FIXED across
    * epochs (the seeded sampler is a pure pair function), so every
    * epoch is the same aggregate shape reading the previous epoch's
    * node-bounded weight table — epoch i+1's dots consume epoch i's
    * 6dp-pinned u values, which both engines hold bit-identically.
    *
    * Oracle-safety note on `lr`: lr multiplies the gradient sum
    * INSIDE the 6 dp pin — g = round(lr·Σ addends, 6) — so the update
    * u_prev − g is a difference of ≤6-decimal values and never lands
    * on a rounding half-boundary. (The first build pinned g BEFORE
    * scaling; any lr whose product with a 6-decimal value carries a
    * 7th decimal — 0.5 makes it always 0 or 5 — then parked updates
    * EXACTLY on the half-boundary, where Spark's shortest-decimal
    * BigDecimal HALF_UP and DuckDB's binary scale-and-round
    * systematically disagree. Measured on the gate fixture; hence
    * this ordering.)
    */
  /** The seeded negative draw for every pair — shared by the u-epochs
    * ([[train]]) and the v half-step ([[trainContextEpoch]]): both
    * sides of the alternation must see the SAME pair+negative table.
    *
    * Id-sorted rank over every walk-visited node (the negative-sample
    * universe) via the PrefixSum two-phase scan (rank = running count
    * of 1s over ascending node id), NOT an unpartitioned window
    * (banned repo-wide — PlanSmellSpec): node ids are distinct
    * post-distinct, so cum_one IS the 1-based rank. 64k-id buckets
    * keep the carry ledger broadcast-small up to multi-billion-id
    * spaces. False-negative guard (Mikolov's sampler re-draws when the
    * negative hits the target pair): a draw equal to the pair's center
    * or its TRUE context would push the embedding exactly against the
    * signal it just learned — such draws contribute a ZERO negative
    * term instead (deterministically mirrored in SQL).
    */
  private def negSampled(p: DataFrame): DataFrame = {
    val nodes = p.select(col("center").as("node"))
      .unionAll(p.select(col("context").as("node")))
      .distinct()
    val ranked = graft.Caches.persist(
      PrefixSum.scan(nodes.withColumn("__one", lit(1L)), "node",
          Seq("__one"), bucketSize = 1L << 16)
        .select(col("node"), col("cum___one").as("rnk")))
    val nn = ranked.count() // S4 scalar — the mod base, a literal below
    p.withColumn("rnk",
        Dedup.md5Hash60(concat_ws("#", col("center"), col("context")))
          % lit(nn) + 1)
      .join(ranked, Seq("rnk"))
      .withColumn("negw",
        when(col("node") === col("center") || col("node") === col("context"),
          lit(0.0)).otherwise(lit(1.0)))
      .select(col("center"), col("context"), col("n"),
        col("node").as("neg"), col("negw"))
  }

  def train(pairs: DataFrame, dim: Int = 4, lr: Double = 0.1,
      epochs: Int = 1): DataFrame = {
    require(dim >= 1 && dim <= 16, "dim in [1,16] — unrolled per-dim columns")
    require(epochs >= 1 && epochs <= 8, "epochs in [1,8] — fixed unrolled loop")
    val p = graft.Caches.persist(
      pairs.select(col("center"), col("context"), col("n")))
    val withNeg = graft.Caches.persist(negSampled(p))

    // u state across epochs: None → the closed-form init; Some(w) →
    // the previous epoch's node-bounded WIDE weight table (node,
    // u0..u{d-1}) — every center node is present (the gradient agg
    // covers each center every epoch, the pair set being fixed)
    var uWide: Option[DataFrame] = None
    for (_ <- 1 to epochs) {
      def uCol(i: Int): Column = uWide match {
        case None => uInit(col("center"), lit(i))
        case Some(_) => col(s"u$i")
      }
      val base = uWide match {
        case None => withNeg
        case Some(w) =>
          withNeg.join(w.withColumnRenamed("node", "center"), Seq("center"))
      }
      // fixed left-to-right dot products; v stays the frozen formula
      def dotUV(target: Column): Column =
        (0 until dim).map(i => uCol(i) * vInit(target, lit(i)))
          .reduce(_ + _)
      val scored = base
        .withColumn("spos", LogReg.fastSigmoid(dotUV(col("context"))))
        .withColumn("sneg", LogReg.fastSigmoid(dotUV(col("neg"))))
      // ALL d per-dim gradient sums in ONE map-side-combined hash
      // aggregate over one scan of `scored` (the first build unioned d
      // per-dim selects, recomputing the un-persisted join d times —
      // the r12 closing bench's worst query until this rewrite). Each
      // addend pinned 9dp UNDER the 6dp sum pin (the
      // search_lm_dirichlet double-pin convention: identical addend
      // multisets on both engines keep association-order ulps from
      // ever straddling a 6dp half-boundary); lr scales INSIDE the pin
      // (see the lr note above). Identical per-dim sums either way —
      // the oracle's per-dim GROUP BY mirrors are unchanged.
      val gAggs = (0 until dim).map { i =>
        round(lit(lr) * sum(round(col("n").cast("double") *
          ((col("spos") - 1.0) * vInit(col("context"), lit(i)) +
            col("negw") * col("sneg") * vInit(col("neg"), lit(i))), 9)), 6)
          .as(s"g$i")
      }
      val gw = scored.groupBy(col("center").as("node"))
        .agg(gAggs.head, gAggs.tail: _*)
      // update = (≤6-decimal) − (6-decimal): never a rounding boundary;
      // the updated WIDE table feeds the next epoch directly (no pivot)
      val newWide = uWide match {
        case None =>
          gw.select(col("node") +: (0 until dim).map(i =>
            round(uInit(col("node"), lit(i)) - col(s"g$i"), 6).as(s"u$i")): _*)
        case Some(w) =>
          gw.join(w, Seq("node"))
            .select(col("node") +: (0 until dim).map(i =>
              round(col(s"u$i") - col(s"g$i"), 6).as(s"u$i")): _*)
      }
      uWide = Some(graft.Caches.persist(newWide))
    }
    // long output: (node, dim, value) in ONE scan of the final wide
    // table via posexplode over the dim array
    uWide.get.select(col("node"),
        posexplode(array((0 until dim).map(i => col(s"u$i")): _*))
          .as(Seq("dim", "value")))
      .select(col("node"), col("dim").cast("long").as("dim"), col("value"))
  }

  /** One CONTEXT-vector (v) half-step from PINNED u — the alternating
    * step that completes [[train]]'s frozen-v epochs (r12 VERDICT #8):
    * u comes from `train(pairs, dim, lr, uEpochs)` (6dp-pinned, held
    * bit-identically by both engines), v starts at the [[vInit]]
    * lattice and takes ONE full-batch gradient step
    *
    *   ∂/∂v_m = Σ_{(c,o): o=m} n·(σ(u_c·v_o) − 1)·u_c
    *          + Σ_{(c,o): neg=m} n·negw·σ(u_c·v_neg)·u_c
    *
    * — the u-step's (node, dim) hash aggregate TRANSPOSED: each scored
    * pair emits TWO keyed contributions (its context node and its
    * drawn negative) through one explode, then ONE map-side-combined
    * aggregate. The pair+negative table is the SAME [[negSampled]]
    * draw the u-epochs trained against. Addends are 9dp-pinned under
    * the 6dp sum pin (the train convention); update = vInit − g, 6dp.
    * Output: (node, dim, value) for every node occurring as a context
    * or drawn negative (all other nodes keep the init lattice).
    */
  def trainContextEpoch(pairs: DataFrame, dim: Int = 4, lr: Double = 0.1,
      uEpochs: Int = 1): DataFrame = {
    require(dim >= 1 && dim <= 16, "dim in [1,16] — unrolled per-dim columns")
    val p = graft.Caches.persist(
      pairs.select(col("center"), col("context"), col("n")))
    val withNeg = graft.Caches.persist(negSampled(p))
    // pinned u after uEpochs, pivoted wide (node-bounded — the
    // oracle's max-CASE pivot, mirrored)
    val uAggs = (0 until dim).map(i =>
      max(when(col("dim") === i, col("value"))).as(s"u$i"))
    val uw = train(pairs, dim, lr, uEpochs)
      .groupBy(col("node").as("center"))
      .agg(uAggs.head, uAggs.tail: _*)
    val base = withNeg.join(uw, Seq("center"))
    def dotUV(target: Column): Column =
      (0 until dim).map(i => col(s"u$i") * vInit(target, lit(i)))
        .reduce(_ + _)
    val scored = base
      .withColumn("spos", LogReg.fastSigmoid(dotUV(col("context"))))
      .withColumn("sneg", LogReg.fastSigmoid(dotUV(col("neg"))))
    val contrib = scored.select(
      (0 until dim).map(i => col(s"u$i")) :+
        explode(array(
          struct(col("context").as("node"),
            (col("n").cast("double") * (col("spos") - lit(1.0))).as("f")),
          struct(col("neg").as("node"),
            (col("n").cast("double") * col("negw") * col("sneg")).as("f"))))
          .as("t"): _*)
    val gAggs = (0 until dim).map { i =>
      round(lit(lr) * sum(round(col("t.f") * col(s"u$i"), 9)), 6).as(s"g$i")
    }
    val gw = contrib.groupBy(col("t.node").as("node"))
      .agg(gAggs.head, gAggs.tail: _*)
    gw.select(col("node") +: (0 until dim).map(i =>
        round(vInit(col("node"), lit(i)) - col(s"g$i"), 6).as(s"v$i")): _*)
      .select(col("node"),
        posexplode(array((0 until dim).map(i => col(s"v$i")): _*))
          .as(Seq("dim", "value")))
      .select(col("node"), col("dim").cast("long").as("dim"), col("value"))
  }
}
