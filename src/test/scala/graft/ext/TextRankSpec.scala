package graft.ext

import graft.SparkSpec

/** [[TextRank.keywords]] on a hand-checkable path graph: alpha—beta—gamma
  * (unit weights). The hub (beta) must outrank the symmetric leaves,
  * which must tie exactly (identical arithmetic on mirrored rows).
  */
class TextRankSpec extends SparkSpec {

  test("hub outranks leaves; symmetric leaves tie exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "beta gamma")).toDF("doc_id", "text")
    val got = TextRank.keywords(docs, iters = 3, topK = 10)
      .as[(String, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("beta", "alpha", "gamma"))
    val byWord = got.toMap
    assert(byWord("alpha") == byWord("gamma")) // exact tie by symmetry
    assert(byWord("beta") > byWord("alpha"))
    // rank mass is conserved by PageRank up to the damping leak: with
    // every node having edges, Σpr = (1-d) + d·Σprₜ₋₁ = 1 at every step
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-5)
    graft.Caches.clearPersisted()
  }

  test("deterministic across runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "gamma delta epsilon alpha"),
      (3L, "epsilon alpha beta")).toDF("doc_id", "text")
    val a = TextRank.keywords(docs, iters = 3, topK = 10).collect().toSeq
    graft.Caches.clearPersisted()
    val b = TextRank.keywords(docs, iters = 3, topK = 10).collect().toSeq
    graft.Caches.clearPersisted()
    assert(a == b)
  }
}
