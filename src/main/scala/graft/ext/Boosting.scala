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

  /** One cell of the GBDT sufficient-statistics table: month bin,
    * priority ordinal, exact example count, exact target sum (integer
    * cents) and exact target square-sum (cents², DECIMAL — cents² × N
    * overflows BIGINT at sf ≥ 0.1).
    */
  final case class GbdtCell(mb: Long, pr: Long, n: Long, sy: Long,
      syy: java.math.BigDecimal)

  /** Two rounds of L2 gradient boosting over depth-1 trees (Friedman,
    * Annals of Statistics 29(5) 2001 §4, LS_Boost with ν = 1) — the
    * regression-boosting face beside [[adaboostStumps]]'s
    * classification face, and the same central scale idea: a stump
    * sequence on binned features is a function of the bin coordinates
    * alone, so the WHOLE training run needs only the (month, priority)
    * joint table with exact per-cell (n, Σy, Σy²) — one corpus scan,
    * then pure driver arithmetic (S4).
    *
    * Determinism (why nothing is rounded): squared-loss boosting needs
    * NO transcendentals — every quantity below is reached from exact
    * BIGINT sums by a FIXED-SHAPE chain of IEEE +,−,×,÷ (and one final
    * sqrt, which IEEE-754 rounds correctly), so a SQL mirror spelling
    * the same expressions reproduces every bit. The one trap is float
    * ACCUMULATION order — avoided by never summing doubles over cells:
    * residual sums decompose as Σ_leaf (SY_leaf − F_leaf·N_leaf) over
    * the ≤ 2^round leaves in fixed leaf order, with SY/N exact
    * BIGINTs. Split argmax is (gain DESC, feature ASC, cut ASC) —
    * candidates with an empty side score −1 (real gains are ≥ 0).
    *
    * Output: one row per round (0 = the constant-mean model), with the
    * chosen split, leaf increments γ, and train RMSE in dollars —
    * rmse_r = √(SSE_r/N)/100 via SSE = ΣY² − Σ_leaf (2·F·SY − F²·N).
    */
  /** The fitted 2-round model plus the exact train-side sufficient
    * sums every downstream readout re-derives from (see [[gbdtStumps]]
    * for the arithmetic-determinism contract — every double below is a
    * fixed-shape function of exact BIGINT sums).
    */
  private final case class GbdtFit(nn: Long, t: Long, yyD: Double,
      f0: Double, f1: String, c1: Long, n1l: Long, sy1l: Long,
      g1l: Double, g1r: Double, f2: String, c2: Long,
      nll: Long, syll: Long, nlr: Long, sylr: Long,
      g2l: Double, g2r: Double) {
    def n1r: Long = nn - n1l
    def sy1r: Long = t - sy1l
    def fL: Double = f0 + g1l
    def fR: Double = f0 + g1r
  }

  private def bin(f: String, c: GbdtCell): Long =
    if (f == "month") c.mb else c.pr

  // candidate order = the oracle's ORDER BY tiebreak ('month' < 'priority')
  private val GbdtCandidates: Seq[(String, Long)] =
    (1L to 11L).map(("month", _)) ++ (1L to 4L).map(("priority", _))

  private def leafTerm(f: Double, sy: Long, n: Long): Double =
    2.0 * f * sy - f * f * n

  private def fitGbdt(cs: Array[GbdtCell]): GbdtFit = {
    val nn = cs.map(_.n).sum
    val t = cs.map(_.sy).sum
    val yyD = cs.foldLeft(java.math.BigDecimal.ZERO)((a, c) => a.add(c.syy))
      .doubleValue
    val f0 = t.toDouble / nn.toDouble
    // first strictly-greater gain wins ⟺ ORDER BY gain DESC, f, cut LIMIT 1
    def argmax[A](xs: Seq[(A, Double)]): A =
      xs.reduceLeft((a, b) => if (b._2 > a._2) b else a)._1
    // ---- round 1 over the root leaf ----
    val (f1, c1, n1l, sy1l) = argmax(GbdtCandidates.map { case (f, cut) =>
      var nl = 0L; var syl = 0L
      cs.foreach { c => if (bin(f, c) <= cut) { nl += c.n; syl += c.sy } }
      val gain =
        if (nl == 0L || nn - nl == 0L) -1.0
        else {
          val srl = syl - f0 * nl
          val srr = (t - syl) - f0 * (nn - nl)
          srl * srl / nl + srr * srr / (nn - nl)
        }
      ((f, cut, nl, syl), gain)
    })
    // a table where NO candidate splits (one distinct feature cell)
    // elects a gain = −1 winner whose empty side makes γ = 0/0 — fail
    // loudly instead of emitting NaNs (the oracle would NaN the same
    // way, but a silently-NaN model is a broken readout, not a result)
    require(n1l > 0L && nn - n1l > 0L,
      "gbdt: no candidate split separates the cells — need ≥ 2 distinct " +
        "feature values across (month, priority)")
    val n1r = nn - n1l; val sy1r = t - sy1l
    val g1l = (sy1l - f0 * n1l) / n1l
    val g1r = (sy1r - f0 * n1r) / n1r
    val fL = f0 + g1l; val fR = f0 + g1r
    // ---- round 2 over the two round-1 leaves ----
    val (f2, c2, nll, syll, nlr, sylr) = argmax(GbdtCandidates.map {
      case (f, cut) =>
        var nll = 0L; var syll = 0L; var nlr = 0L; var sylr = 0L
        cs.foreach { c =>
          if (bin(f, c) <= cut) {
            if (bin(f1, c) <= c1) { nll += c.n; syll += c.sy }
            else { nlr += c.n; sylr += c.sy }
          }
        }
        val nl = nll + nlr
        val gain =
          if (nl == 0L || nn - nl == 0L) -1.0
          else {
            val srl = (syll - fL * nll) + (sylr - fR * nlr)
            val srr = ((sy1l - syll) - fL * (n1l - nll)) +
              ((sy1r - sylr) - fR * (n1r - nlr))
            srl * srl / nl + srr * srr / (nn - nl)
          }
        ((f, cut, nll, syll, nlr, sylr), gain)
    })
    val srl2 = (syll - fL * nll) + (sylr - fR * nlr)
    val srr2 = ((sy1l - syll) - fL * (n1l - nll)) +
      ((sy1r - sylr) - fR * (n1r - nlr))
    val g2l = srl2 / (nll + nlr); val g2r = srr2 / (nn - (nll + nlr))
    GbdtFit(nn, t, yyD, f0, f1, c1, n1l, sy1l, g1l, g1r,
      f2, c2, nll, syll, nlr, sylr, g2l, g2r)
  }

  private def collectGbdtCells(cells: DataFrame,
      maxCells: Int): Array[GbdtCell] = {
    val collected = cells.select("mb", "pr", "n", "sy", "syy").collect()
    require(collected.nonEmpty, "gbdt needs a non-empty cell table")
    require(collected.length <= maxCells,
      s"joint table has ${collected.length} cells > $maxCells — " +
        "bin the features before boosting (the table must be domain-bounded)")
    collected.map(r => GbdtCell(r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDecimal(4)))
  }

  private val GbdtSchema = StructType(Seq(
    StructField("round", LongType, nullable = false),
    StructField("feature", StringType, nullable = false),
    StructField("cut", LongType, nullable = false),
    StructField("n_left", LongType, nullable = false),
    StructField("n_right", LongType, nullable = false),
    StructField("gamma_l", DoubleType, nullable = false),
    StructField("gamma_r", DoubleType, nullable = false),
    StructField("rmse", DoubleType, nullable = false)))

  def gbdtStumps(spark: SparkSession, cells: DataFrame,
      maxCells: Int = 4096): DataFrame = {
    val cs = collectGbdtCells(cells, maxCells)
    val m = fitGbdt(cs)
    import m._
    val sse0 = yyD - leafTerm(f0, t, nn)
    val sse1 = yyD - leafTerm(fL, sy1l, n1l) - leafTerm(fR, sy1r, n1r)
    // four leaves (side-of-cut1 × side-of-cut2) in fixed LL, LR, RL, RR order
    val sse2 = yyD -
      leafTerm(fL + g2l, syll, nll) -
      leafTerm(fL + g2r, sy1l - syll, n1l - nll) -
      leafTerm(fR + g2l, sylr, nlr) -
      leafTerm(fR + g2r, sy1r - sylr, n1r - nlr)
    def rmse(sse: Double): Double = math.sqrt(sse / nn) / 100.0
    val nl2 = nll + nlr; val nr2 = nn - nl2
    spark.createDataFrame(java.util.Arrays.asList(
      Row(0L, "const", -1L, nn, 0L, 0.0, 0.0, rmse(sse0)),
      Row(1L, f1, c1, n1l, n1r, g1l, g1r, rmse(sse1)),
      Row(2L, f2, c2, nl2, nr2, g2l, g2r, rmse(sse2))), GbdtSchema)
  }

  /** [[gbdtStumps]] with an md5-fold HOLDOUT: fit on the train cells,
    * then report train AND test RMSE per round — the generalization
    * readout (does the season/urgency split carry beyond its fit?).
    * The test side never touches the fit; its per-leaf exact sums are
    * computed over the test cell table with the SAME leaf-decomposed
    * SSE identity, so both columns stay fixed-shape doubles a SQL
    * mirror reproduces bit-for-bit. Output: (round, feature, cut,
    * rmse_train, rmse_test).
    */
  def gbdtEval(spark: SparkSession, trainCells: DataFrame,
      testCells: DataFrame, maxCells: Int = 4096): DataFrame = {
    val tr = collectGbdtCells(trainCells, maxCells)
    val te = collectGbdtCells(testCells, maxCells)
    val m = fitGbdt(tr)
    import m._
    // exact test-side sums at the fitted-leaf grain
    val nnT = te.map(_.n).sum
    val tT = te.map(_.sy).sum
    val yyT = te.foldLeft(java.math.BigDecimal.ZERO)((a, c) => a.add(c.syy))
      .doubleValue
    var ntl = 0L; var sytl = 0L
    te.foreach { c => if (bin(f1, c) <= c1) { ntl += c.n; sytl += c.sy } }
    var ntll = 0L; var sytll = 0L; var ntlr = 0L; var sytlr = 0L
    te.foreach { c =>
      if (bin(f2, c) <= c2) {
        if (bin(f1, c) <= c1) { ntll += c.n; sytll += c.sy }
        else { ntlr += c.n; sytlr += c.sy }
      }
    }
    val sse0 = yyD - leafTerm(f0, t, nn)
    val sse1 = yyD - leafTerm(fL, sy1l, n1l) - leafTerm(fR, sy1r, n1r)
    val sse2 = yyD -
      leafTerm(fL + g2l, syll, nll) -
      leafTerm(fL + g2r, sy1l - syll, n1l - nll) -
      leafTerm(fR + g2l, sylr, nlr) -
      leafTerm(fR + g2r, sy1r - sylr, n1r - nlr)
    val sse0T = yyT - leafTerm(f0, tT, nnT)
    val sse1T = yyT - leafTerm(fL, sytl, ntl) -
      leafTerm(fR, tT - sytl, nnT - ntl)
    val sse2T = yyT -
      leafTerm(fL + g2l, sytll, ntll) -
      leafTerm(fL + g2r, sytl - sytll, ntl - ntll) -
      leafTerm(fR + g2l, sytlr, ntlr) -
      leafTerm(fR + g2r, (tT - sytl) - sytlr, (nnT - ntl) - ntlr)
    def rmseTr(sse: Double): Double = math.sqrt(sse / nn) / 100.0
    def rmseTe(sse: Double): Double = math.sqrt(sse / nnT) / 100.0
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("feature", StringType, nullable = false),
      StructField("cut", LongType, nullable = false),
      StructField("rmse_train", DoubleType, nullable = false),
      StructField("rmse_test", DoubleType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(0L, "const", -1L, rmseTr(sse0), rmseTe(sse0T)),
      Row(1L, f1, c1, rmseTr(sse1), rmseTe(sse1T)),
      Row(2L, f2, c2, rmseTr(sse2), rmseTe(sse2T))), schema)
  }
}
