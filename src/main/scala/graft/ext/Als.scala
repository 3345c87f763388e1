package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alternating-least-squares matrix factorization (Zhou et al.,
  * AAIM'08 — the implicit/explicit recommender workhorse): one EXACT
  * user-side half-step at rank 2, the closed-form normal-equation
  * solve every ALS sweep is made of. Item factors are deterministic
  * integer seeds (the md5-bucket convention, mirrorable in SQL), so
  * the user solve is fully oracle-checkable:
  *
  *   u_c = (Vᵀ V + λI)⁻¹ Vᵀ r_c   per user c, V = item factors.
  *
  * Determinism (operand pinning): factors are INTEGER-scaled —
  * v = (1000, md5(item) mod 2001 − 1000), real value v/1000 — so the
  * per-user normal-equation sums (m11, m12, m22, c1, c2) are exact
  * BIGINT hash aggregates (no float accumulation order anywhere), and
  * the scaled system (A_int + 10⁵λ̃ I) u = 10³ b_int is solved by the
  * 2×2 determinant formula on exact integers; the ONLY float ops are
  * the two final divisions (fixed shape, engine-identical). λ = 0.1 in
  * real units ⇒ the integer ridge 10⁵ (λ·10⁶ from the v²-scale).
  *
  * Scale (100 TB story): ONE equi-join-free pass — ratings carry their
  * item factor as a codegen'd hash expression (no item-table join), and
  * the solve is ONE map-side-combined aggregate to (user, 5 longs),
  * then narrow per-row arithmetic. This is exactly how a full ALS sweep
  * distributes: the item half-step is the same shape transposed.
  */
object Als {

  /** Integer item-factor components (scaled ×1000): v1 = 1000,
    * v2 = md5₆₀("als|item") mod 2001 − 1000 ∈ [−1000, 1000].
    */
  def itemV2(item: Column): Column =
    Dedup.md5Hash60(concat_ws("|", lit("als"), item)) % 2001L - 1000L

  /** One user-side half-step. Input `ratings`: (user_id, item, r) with r
    * an exact integer rating. Output per user: (user_id, n_items, u1, u2,
    * pred_probe) — u 6dp-pinned, pred_probe = û·v_probe/1000 from the
    * PINNED u (6dp operands, fixed shape).
    */
  def userHalfStep(ratings: DataFrame, probeItem: Long = 1L,
      ridgeScaled: Long = 100000L): DataFrame = {
    val v2 = itemV2(col("item"))
    val agg = ratings
      .select(col("user_id"), col("r"), v2.as("v2"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_items"),
        sum(lit(1000L) * lit(1000L)).as("m11"),
        sum(lit(1000L) * col("v2")).as("m12"),
        sum(col("v2") * col("v2")).as("m22"),
        sum(col("r") * lit(1000L)).as("b1"),
        sum(col("r") * col("v2")).as("b2"))
    val det = (col("m11") + lit(ridgeScaled)) * (col("m22") + lit(ridgeScaled)) -
      col("m12") * col("m12")
    val c1 = lit(1000L) * col("b1")
    val c2 = lit(1000L) * col("b2")
    val u1 = round(((col("m22") + lit(ridgeScaled)) * c1 - col("m12") * c2)
      .cast("double") / det.cast("double"), 6)
    val u2 = round(((col("m11") + lit(ridgeScaled)) * c2 - col("m12") * c1)
      .cast("double") / det.cast("double"), 6)
    val probeV2 = Dedup.md5Hash60(concat_ws("|", lit("als"),
      lit(probeItem))) % 2001L - 1000L
    agg.select(col("user_id"), col("n_items"), u1.as("u1"), u2.as("u2"))
      .withColumn("pred_probe",
        round((col("u1") * lit(1000.0) +
          col("u2") * probeV2.cast("double")) / lit(1000.0), 6))
      .orderBy("user_id")
  }

  /** The ITEM half-step from PINNED user factors — the alternating
    * sweep's second side (r12 VERDICT #8):
    *
    *   v_i = (Uᵀ U + λI)⁻¹ Uᵀ r_i   per item i, U = learned user rows.
    *
    * The learned u's are 6dp-pinned doubles; to keep the per-item
    * normal-equation sums EXACT integers (the user step's determinism
    * contract) each factor is quantized to the SAME ×1000 integer
    * scale the item seeds live on — q = floor(u·1000 + 0.5), standard
    * factor quantization, mirrored verbatim in SQL. Unlike the user
    * step, the 2×2 solve runs in fixed-shape DOUBLE arithmetic: the
    * BIGINT moments (≤ ~10¹¹ ≪ 2⁵³) are exactly representable, but
    * their pure-integer determinant products would overflow 2⁶³ at
    * learned-factor magnitudes — the double solve is bit-identical on
    * both engines (same operand shapes) with no overflow cliff.
    * Same ridge: λ = 0.1 real ⇒ 10⁵ at the ×10⁶ moment scale.
    *
    * Scale: ONE join of ratings to the user-bounded factor table (a
    * broadcast at any realistic user-factor size — or a co-partitioned
    * shuffle at extreme scale), one map-side-combined aggregate to
    * (item, 5 longs), narrow per-row arithmetic. Output per item:
    * (item, n_users, v1, v2), 6dp-pinned.
    */
  def itemHalfStep(ratings: DataFrame, userFactors: DataFrame,
      ridgeScaled: Long = 100000L): DataFrame = {
    val j = ratings
      .join(userFactors.select(col("user_id"), col("u1"), col("u2")),
        Seq("user_id"))
      .select(col("item"), col("r"),
        floor(col("u1") * lit(1000.0) + lit(0.5)).cast("long").as("q1"),
        floor(col("u2") * lit(1000.0) + lit(0.5)).cast("long").as("q2"))
    val agg = j.groupBy("item")
      .agg(count(lit(1)).as("n_users"),
        sum(col("q1") * col("q1")).as("m11"),
        sum(col("q1") * col("q2")).as("m12"),
        sum(col("q2") * col("q2")).as("m22"),
        sum(col("r") * col("q1")).as("b1"),
        sum(col("r") * col("q2")).as("b2"))
    val rd = lit(ridgeScaled.toDouble)
    val m11d = col("m11").cast("double"); val m12d = col("m12").cast("double")
    val m22d = col("m22").cast("double")
    val det = (m11d + rd) * (m22d + rd) - m12d * m12d
    val c1 = lit(1000.0) * col("b1").cast("double")
    val c2 = lit(1000.0) * col("b2").cast("double")
    agg.select(col("item"), col("n_users"),
        round(((m22d + rd) * c1 - m12d * c2) / det, 6).as("v1"),
        round(((m11d + rd) * c2 - m12d * c1) / det, 6).as("v2"))
      .orderBy("item")
  }
}
