package graft.ext

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {

  private def tokens(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "label", "w")
  }

  test("disjoint vocabularies classify perfectly; OOV-only docs drop") {
    // train: class a speaks {aaa,bbb}, class b speaks {xxx,yyy};
    // held-out docs reuse their class's vocabulary → diagonal confusion.
    // doc 102 is entirely out-of-vocabulary → excluded by the inner
    // join, not misclassified into an arbitrary class
    val rows =
      Seq(1L -> "aaa", 1L -> "bbb", 2L -> "aaa", 3L -> "bbb")
        .map { case (d, w) => (d, "a", w) } ++
      Seq(4L -> "xxx", 4L -> "yyy", 5L -> "xxx", 6L -> "yyy")
        .map { case (d, w) => (d, "b", w) } ++
      Seq((100L, "a", "aaa"), (100L, "a", "aaa"), (100L, "a", "bbb"),
        (101L, "b", "xxx"), (102L, "a", "zzz"))
    val got = NaiveBayes.confusion(tokens(rows), col("doc_id") >= 100L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", "a", 1L), ("b", "b", 1L)))
  }

  test("repeated tokens weigh multinomially, not as a set") {
    // train: both classes know both words, but class a is dominated by
    // "hot" (4 of 5 tokens) and class b by "ice". A held-out doc
    // saying "hot hot hot ice" must go to a — a Bernoulli/set model
    // would see {hot, ice} and fall back to the prior tie-break
    val rows =
      Seq.fill(4)((1L, "a", "hot")) ++ Seq((1L, "a", "ice")) ++
      Seq.fill(4)((2L, "b", "ice")) ++ Seq((2L, "b", "hot")) ++
      Seq.fill(3)((200L, "a", "hot")) ++ Seq((200L, "a", "ice"))
    val got = NaiveBayes.confusion(tokens(rows), col("doc_id") >= 200L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", "a", 1L)))
  }

  test("argmax tie-break is deterministic: score tie goes to the lexicographically first class") {
    // perfectly symmetric training data: the held-out doc's word is
    // equally likely under both classes and the priors are equal —
    // the (score desc, class asc) tie-break must pick "a" every time
    val rows = Seq((1L, "a", "zap"), (2L, "b", "zap"),
      (300L, "b", "zap"))
    val got = NaiveBayes.confusion(tokens(rows), col("doc_id") >= 300L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("b", "a", 1L)))
  }
}
