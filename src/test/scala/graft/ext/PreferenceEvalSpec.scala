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

  test("search_mmr_rerank: rank-1 is the pure-relevance argmax at mmr 0.7") {
    val rows = SparkEntry.queries("search_mmr_rerank")(spark, dir).collect()
    assert(rows.length > 0 && rows.length <= 10)
    // first pick has empty selected set: mmr = 0.7·(max/max) − 0.3·0
    assert(rows.head.getLong(0) == 1L && rows.head.getDouble(2) == 0.7)
    // ranks are 1..k in order; every objective value is in (−0.3, 0.7]
    assert(rows.map(_.getLong(0)).toSeq == (1 to rows.length).map(_.toLong))
    rows.foreach { r =>
      val m = r.getDouble(2)
      assert(m > -0.3 && m <= 0.7, s"mmr $m out of range at rank ${r.getLong(0)}")
    }
  }
}
