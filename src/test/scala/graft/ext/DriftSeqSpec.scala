package graft.ext

import graft.SparkSpec

/** Invariant specs for the monitoring/sequential-stats wave
  * (`quality_drift_psi`, `stats_chisq_independence`,
  * `events_ab_sequential`) on the sf0.001 gate tables — value-exact
  * checks live in the DuckDB oracle; these lock the mathematical
  * properties that must hold on ANY input.
  */
class DriftSeqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    graft.Caches.clearPersisted()
    super.afterAll()
  }

  test("quality_drift_psi: terms are non-negative and sum to the total") {
    val rows = graft.SparkEntry.queries("quality_drift_psi")(spark, dir).collect()
    assert(rows.length == 10)
    // (p-q)·ln(p/q) >= 0 for any positive p, q — a negative term means
    // the formula (not the data) broke
    rows.foreach(r => assert(r.getDouble(5) >= 0.0, r.toString))
    val total = rows.head.getDouble(6)
    val summed = rows.map(_.getDouble(5)).sum
    assert(math.abs(summed - total) < 1e-6, s"$summed vs $total")
  }

  test("stats_chisq_independence: statistic and effect size are well-formed") {
    val r = graft.SparkEntry.queries("stats_chisq_independence")(spark, dir).head()
    val (nl, ns, dof) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(dof == (nl - 1) * (ns - 1))
    assert(r.getDouble(4) >= 0.0) // chi2
    val v = r.getDouble(5)
    assert(v >= 0.0 && v <= 1.0 + 1e-9, v.toString)
  }

  test("emb_quantize_int8: reconstruction error is bounded by half a quantization step") {
    val rows = graft.SparkEntry.queries("emb_quantize_int8")(spark, dir).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (scale, mse, maxErr) = (r.getDouble(2), r.getDouble(4), r.getDouble(5))
      assert(scale > 0.0, r.toString)
      // round-to-nearest gives |err| <= scale/2; the 9dp scale pin can
      // push the extreme value at most one clamp step past that
      assert(maxErr <= scale / 2.0 + 1e-6, s"maxErr $maxErr vs scale $scale")
      assert(mse <= maxErr * maxErr + 1e-12, r.toString)
    }
  }

  test("events_ab_sequential: always-valid p is monotone non-increasing in [0,1]") {
    val p = graft.SparkEntry.queries("events_ab_sequential")(spark, dir)
      .orderBy("day").collect().map(_.getDouble(5))
    assert(p.nonEmpty)
    p.foreach(x => assert(x > 0.0 && x <= 1.0, x.toString))
    p.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"p must never rise: $a then $b")
    }
  }
}
