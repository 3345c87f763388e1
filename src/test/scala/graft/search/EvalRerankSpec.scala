package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant specs for the retrieval-quality harness
  * (`search_eval_ndcg`) and the MMR diversification rerank
  * (`search_mmr_rerank`), run on the sf0.001 gate tables — the
  * value-exact check is the DuckDB oracle; these lock the properties
  * the metrics must satisfy on ANY corpus.
  */
class EvalRerankSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    graft.Caches.clearPersisted()
    super.afterAll()
  }

  test("search_eval_ndcg: metrics are well-formed and bounded") {
    val m = graft.SparkEntry.queries("search_eval_ndcg")(spark, dir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (n, ndcg, mrr, p10) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n >= 1 && n <= 10, r.toString)
      // ideal DCG dominates any ranking's DCG, and a nonempty result
      // set has positive gain somewhere
      assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9, r.toString)
      // MRR is 0 (no rel>=2 hit) or a reciprocal rank 1/1..1/10
      assert(mrr == 0.0 || (mrr >= 0.1 - 1e-9 && mrr <= 1.0), r.toString)
      assert(p10 >= 0.0 && p10 <= 1.0, r.toString)
    }
  }

  test("search_lm_dirichlet: log-likelihood scores are negative and candidates matched a term") {
    val rows = graft.SparkEntry.queries("search_lm_dirichlet")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, r.toString) // candidate ⇒ ≥1 matched term
      assert(r.getDouble(2) < 0.0, r.toString) // sums of ln of probabilities < 1
    }
  }

  test("search_ltr_features: one feature row per candidate, lexical features consistent") {
    val rows = graft.SparkEntry.queries("search_ltr_features")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val (nm, stf, dl) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(nm >= 1 && nm <= 4, r.toString)
      assert(stf >= nm, r.toString) // each matched term contributes ≥1 occurrence
      assert(dl >= stf, r.toString) // matched occurrences are a subset of the doc
      val cos = r.getDouble(6)
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9, r.toString)
    }
  }

  test("stats_bh_fdr: thresholds rise with rank and discoveries form a prefix") {
    val rows = graft.SparkEntry.queries("stats_bh_fdr")(spark, dir)
      .orderBy("rank").collect()
    assert(rows.nonEmpty)
    val ps = rows.map(_.getDouble(2))
    ps.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-12) }
    val th = rows.map(_.getDouble(4))
    th.sliding(2).foreach { case Array(a, b) => assert(a < b) }
    val disc = rows.map(_.getBoolean(5))
    // BH discoveries are exactly ranks 1..k for some k — no gaps
    assert(!disc.dropWhile(identity).contains(true), disc.mkString(","))
  }

  test("search_mmr_rerank: greedy invariants (distinct picks, argmax first, non-increasing marginals)") {
    val rows = graft.SparkEntry.queries("search_mmr_rerank")(spark, dir)
      .orderBy("rank").collect()
    assert(rows.length == 10)
    val docs = rows.map(_.getLong(1))
    assert(docs.distinct.length == 10, "picks must be distinct")
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "ranks must be 1..10")
    // every candidate's marginal score weakly decreases as the
    // selected set grows (max-sim can only grow), so the chosen
    // maxima are non-increasing — the MMR submodularity face
    val scores = rows.map(_.getDouble(2))
    scores.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"marginals must be non-increasing: $a then $b")
    }
    // pick 1 is the pure-relevance argmax: mmr_score = 0.7 * 1.0
    assert(math.abs(scores.head - 0.7) < 1e-9, scores.head.toString)
  }
}
