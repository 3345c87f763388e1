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
}
