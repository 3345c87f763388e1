package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** AdaBoost over decision stumps (Freund & Schapire, JCSS'97) — the
  * boosting face of the training family, built on the
  * `ml_decision_stump` machinery's central scale idea taken one step
  * further: ALL of AdaBoost's state lives in a DOMAIN-BOUNDED joint
  * table. A stump's prediction depends only on a row's (feature-bin)
  * coordinates, so example weights after any number of rounds are a
  * function of (bin-coordinates, label) alone — the 100 TB corpus
  * collapses in ONE hash aggregate to ≤ |bins₁|·|bins₂|·2 cells with
  * exact integer counts, and every boosting round is arithmetic over
  * that bounded table (the S4 driver-materialization pattern; nothing
  * further ever rescans the data).
  *
  * Determinism (the oracle-pinning discipline): weights are exact
  * integer MICRO-UNITS (w₀ = n·10⁶). Per round, ε = err/tot is one
  * fixed-shape double division of exact integers; α = round(½·ln((tot−
  * err)/err), 6); the reweight factors round(e^{∓α}, 6) multiply each
  * integer weight in ONE double product, re-pinned to an integer via
  * floor(w·f + 0.5) — so weight sums never see float accumulation
  * order, and a SQL mirror reproduces every round bit-for-bit.
  */
object Boosting {

  /** One cell of the bounded joint table: price-bin, month-bin,
    * label y ∈ {−1, +1}, exact example count.
    */
  final case class Cell(pb: Long, mb: Long, y: Long, n: Long)

  /** One trained round: the chosen stump (feature, cut, polarity —
    * h(x) = pol if bin ≤ cut else −pol), its weighted error and α, and
    * the ensemble's training error after this round.
    */
  final case class RoundResult(round: Long, feature: String, cut: Long,
      polarity: Long, weightedErr: Double, alpha: Double, ensembleErr: Double)

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train `rounds` boosted stumps over the bounded joint table.
    *
    * @param cells     (pb, mb, y, n) — y ∈ {−1, +1}; the caller's ONE
    *                  aggregate over the corpus. Guarded bounded: this
    *                  is driver-side state (S4), not data.
    * @param priceCuts candidate cuts on pb (h tests pb ≤ cut)
    * @param monthCuts candidate cuts on mb
    */
  def adaboostStumps(spark: SparkSession, cells: DataFrame, rounds: Int,
      priceCuts: Range = 0 until 15, monthCuts: Range = 1 until 12,
      maxCells: Int = 4096): DataFrame = {
    require(rounds >= 1, s"adaboost needs rounds >= 1, got $rounds")
    val collected = cells.select("pb", "mb", "y", "n").collect()
    require(collected.length <= maxCells,
      s"joint table has ${collected.length} cells > $maxCells — " +
        "bin the features before boosting (the table must be domain-bounded)")
    val cs = collected.map(r => Cell(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = scala.collection.mutable.ArrayBuffer.from(cs.map(_.n * 1000000L))
    // candidates ordered exactly as the oracle's ORDER BY
    // (err, feature, cut, polarity): 'month' < 'totalprice' (ASCII)
    val candidates: Seq[(String, Long, Long)] =
      (for (c <- monthCuts; pol <- Seq(-1L, 1L)) yield ("month", c.toLong, pol)) ++
        (for (c <- priceCuts; pol <- Seq(-1L, 1L)) yield ("totalprice", c.toLong, pol))
    def h(f: String, cut: Long, pol: Long, c: Cell): Long =
      if ((if (f == "totalprice") c.pb else c.mb) <= cut) pol else -pol
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Double)]
    val results = scala.collection.mutable.ArrayBuffer.empty[RoundResult]
    val nTotal = cs.map(_.n).sum
    for (r <- 1 to rounds) {
      val tot = w.sum
      val best = candidates.map { case (f, cut, pol) =>
        val err = cs.indices.iterator
          .filter(i => h(f, cut, pol, cs(i)) != cs(i).y).map(w).sum
        (err, f, cut, pol)
      }.min
      val (err, f, cut, pol) = best
      // perfectly-separating stump: raw α = ½·ln(tot/0) diverges —
      // clamp err to one micro-unit (ε-smoothed α, standard practice)
      // so the engine RETURNS on separable data exactly like the SQL
      // mirror instead of throwing where the oracle emits rows
      // (r12 ADVICE); the reported weighted_err stays the true value
      val errC = math.max(err, 1L)
      val alpha = round6(0.5 * math.log((tot - errC).toDouble / errC.toDouble))
      val fc = round6(math.exp(-alpha))
      val fw = round6(math.exp(alpha))
      cs.indices.foreach { i =>
        val factor = if (h(f, cut, pol, cs(i)) == cs(i).y) fc else fw
        w(i) = math.floor(w(i) * factor + 0.5).toLong
      }
      picked += ((f, cut, pol, alpha))
      // ensemble training error with stumps 1..r: sign(Σ αₜhₜ) vs y,
      // margin 0 counted as wrong (deterministic tie rule)
      val wrong = cs.indices.iterator.filter { i =>
        val margin = picked.foldLeft(0.0) { case (m, (pf, pc, pp, pa)) =>
          m + pa * h(pf, pc, pp, cs(i))
        }
        cs(i).y * margin <= 0.0
      }.map(i => cs(i).n).sum
      results += RoundResult(r.toLong, f, cut, pol,
        round6(err.toDouble / tot.toDouble), alpha,
        round6(wrong.toDouble / nTotal.toDouble))
    }
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("feature", StringType, nullable = false),
      StructField("cut", LongType, nullable = false),
      StructField("polarity", LongType, nullable = false),
      StructField("weighted_err", DoubleType, nullable = false),
      StructField("alpha", DoubleType, nullable = false),
      StructField("ensemble_err", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(results.map(x => Row(x.round, x.feature, x.cut,
        x.polarity, x.weightedErr, x.alpha, x.ensembleErr)).toArray: _*),
      schema)
  }
}
