package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.index.Indexer

/** MaxScore-pruned top-k ([[Search.prunedTopK]]): exact equality with
  * the unpruned plan on every query shape, plus the pruning receipt —
  * fewer postings scored on a selective query (r11 VERDICT "Next
  * round" #1's done-criteria).
  */
class SearchPrunedSpec extends SparkSpec {

  // corpus engineered for skewed term bounds: "zebra" is rare and
  // high-idf (high upper bound), "the"-like term "data" is everywhere
  // and low-idf (low bound) — the MaxScore sweet spot
  private lazy val corpus = {
    import spark.implicits._
    // "data" is common but NOT universal (docs 36-40 lack it), so its
    // idf — and hence its upper bound — is small but strictly positive
    val common = (1L to 35L).map(i =>
      (i, s"data system data pipeline row${i} data store"))
    val filler = (36L to 40L).map(i => (i, s"alpha beta gamma row${i}"))
    val rare = Seq(
      (41L, "zebra data index zebra fast"),
      (42L, "zebra merge data"),
      (43L, "zebra zebra data scan"))
    (common ++ filler ++ rare).toDF("doc_id", "text")
  }

  private lazy val t = Indexer.build(corpus, stem = false)
  private lazy val bounds = Search.termBounds(t)

  private def topUnpruned(terms: Seq[String], k: Int) =
    Search.scoreTerms(t, terms)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def topPruned(terms: Seq[String], k: Int) =
    Search.prunedTopK(t, bounds, terms, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("pruned equals unpruned on a selective mixed query") {
    val terms = Seq("zebra", "data")
    assert(topPruned(terms, 3) == topUnpruned(terms, 3))
  }

  test("pruned equals unpruned when every term is common (no pruning possible)") {
    val terms = Seq("data", "system")
    assert(topPruned(terms, 5) == topUnpruned(terms, 5))
  }

  test("pruned equals unpruned at k larger than the match set (seed fallback)") {
    val terms = Seq("zebra", "merge")
    // only 4 docs match either term; k=10 > |docs(t*)| triggers the
    // unpruned fallback — results must still be identical
    assert(topPruned(terms, 10) == topUnpruned(terms, 10))
  }

  test("absent terms are dropped; all-absent query returns empty") {
    assert(topPruned(Seq("zzz", "qqq"), 5).isEmpty)
    assert(topPruned(Seq("zebra", "zzz"), 2) == topUnpruned(Seq("zebra"), 2))
  }

  test("essentialTerms drops the low-bound prefix and keeps the max-bound term") {
    val ubs = Map("low" -> 0.1, "mid" -> 0.5, "high" -> 3.0)
    // theta = 1.0: cum(low)=0.1 < 1, cum(low,mid)=0.6 < 1 -> both
    // non-essential; "high" always survives
    assert(Search.essentialTerms(ubs, theta = 1.0) == Seq("high"))
    // theta small: everything is essential
    assert(Search.essentialTerms(ubs, theta = 0.05).toSet == ubs.keySet)
    // a doc matching only non-essential terms cannot reach theta:
    // sum of dropped bounds < theta - slack by construction
    val dropped = ubs.keySet -- Search.essentialTerms(ubs, theta = 1.0).toSet
    assert(dropped.toSeq.map(ubs).sum < 1.0 - Search.PruneSlack)
  }

  test("pruning receipt: fewer postings scored on the selective query") {
    val terms = Seq("zebra", "data")
    val tfq = t.termFrequencies.filter(col("word").isin(terms: _*))
    val unprunedPostings = tfq.count()
    // the pruned path's posting reads: seed pass scores postings of
    // docs containing t* (= zebra, the max-bound term); the final pass
    // scores postings of docs matching an essential term. With theta
    // from the zebra docs, "data" is non-essential -> candidates are
    // exactly the zebra docs on both passes.
    val ubs = bounds.filter(col("word").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ubs("data") > 0.0 && ubs("zebra") > ubs("data")) // planted skew
    val seedDocs = t.termFrequencies.filter(col("word") === "zebra")
      .select("doc_id")
    val seedPostings = tfq.join(seedDocs, Seq("doc_id"), "left_semi").count()
    val theta = Search.prunedTopK(t, bounds, terms, 3) // k-th score floor
      .collect().map(_.getDouble(1)).min
    val essential = Search.essentialTerms(ubs, theta)
    assert(essential == Seq("zebra")) // "data" pruned from candidate gen
    val candDocs = t.termFrequencies.filter(col("word").isin(essential: _*))
      .select("doc_id").distinct()
    val finalPostings = tfq.join(candDocs, Seq("doc_id"), "left_semi").count()
    // total postings the pruned path scores (both passes) < unpruned
    assert(seedPostings + finalPostings < unprunedPostings,
      s"pruned=${seedPostings + finalPostings} unpruned=$unprunedPostings")
  }
}
