package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Contamination.ngramOverlap]] on a planted fixture: known shared and
  * disjoint 3-grams between candidate and benchmark corpora.
  */
class ContaminationSpec extends SparkSpec {

  test("counts distinct candidate 3-grams present in the benchmark") {
    import spark.implicits._
    // stopword-free vocabulary (shingleRows drops stopwords)
    val cands = Seq(
      // doc 1: 3 distinct 3-grams, two of them inside the benchmark doc
      (1L, "alpha beta gamma delta epsilon"),
      // doc 2: no overlap at all
      (2L, "zeta eta theta iota"),
      // doc 3: too short for a 3-gram → no output row
      (3L, "alpha beta")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(cands, bench, k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 grams: {alpha beta gamma, beta gamma delta, gamma delta epsilon};
    // bench grams: {alpha beta gamma, beta gamma delta} → 2 hits
    assert(got == Seq((1L, 3L, 2L), (2L, 2L, 0L)))
    graft.Caches.clearPersisted()
  }

  test("duplicated candidate docs count each distinct gram once (distinct semantics)") {
    import spark.implicits._
    val cands = Seq(
      (1L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val bench = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(cands, bench, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    // distinct 3-grams of doc 1: {alpha beta gamma, beta gamma alpha,
    // gamma alpha beta, alpha beta gamma(dup)} → 3 distinct; 1 in bench
    assert(got == Seq((1L, 3L, 1L)))
    graft.Caches.clearPersisted()
  }
}
