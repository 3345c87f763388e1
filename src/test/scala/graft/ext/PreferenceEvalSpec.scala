package graft.ext

import graft.{SparkEntry, SparkSpec}

/** Invariant pins for the two r17 driver-composed rerank/fit operators
  * (both are oracle-gated end-to-end at sf0.01; these specs pin the
  * algebraic invariants a refactor could silently break).
  */
class PreferenceEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("eval_bradley_terry: strengths normalize and wins bound matches") {
    val rows = SparkEntry.queries("eval_bradley_terry")(spark, dir).collect()
    assert(rows.nonEmpty)
    val strengths = rows.map(_.getDouble(3))
    assert(math.abs(strengths.sum - 1.0) < 1e-9,
      s"strengths must sum to 1, got ${strengths.sum}")
    assert(strengths.forall(s => s >= 0.0 && s <= 1.0))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"wins ${r.getLong(2)} > matches ${r.getLong(1)} for ${r.getString(0)}")
    }
    // output is ordered by strength desc
    assert(strengths.toSeq == strengths.toSeq.sorted.reverse)
  }

  test("search_mmr_diversify: emitted mmr is exactly the 0.7/0.3 objective") {
    val rows = SparkEntry.queries("search_mmr_diversify")(spark, dir).collect()
    assert(rows.length > 0 && rows.length <= 10)
    val maxScore = rows.map(_.getDouble(2)).max
    rows.foreach { r =>
      val (score, maxSim, mmr) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(maxSim >= 0.0 && maxSim <= 1.0)
      // every emitted mmr must be reconstructible from the emitted
      // score and max_sim with the exact published arithmetic
      assert(mmr == 0.7 * (score / maxScore) - 0.3 * maxSim,
        s"mmr mismatch at doc ${r.getLong(1)}")
    }
    // rank 1 is the pure-relevance argmax: max_sim is 0 there
    assert(rows.head.getLong(0) == 1L && rows.head.getDouble(3) == 0.0)
    // ranks are 1..k in order
    assert(rows.map(_.getLong(0)).toSeq == (1 to rows.length).map(_.toLong))
  }
}
