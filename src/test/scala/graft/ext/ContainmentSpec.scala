package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.containmentPairs]]: asymmetric C(A→B) = |A∩B|/|A| over hashed
  * k-shingles — a doc wholly contained in a longer one scores 1.0 in the
  * contained→container direction (the case Jaccard misses), and the df
  * cap drops boilerplate shingles from both numerator and denominator.
  */
class ContainmentSpec extends SparkSpec {

  // doc 1 is a verbatim excerpt of doc 2; doc 3 shares nothing
  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "merge join table scan index vector"),
      (2L, "merge join table scan index vector batch stream filter group agg sort"),
      (3L, "window partition shuffle broadcast cache spill")).toDF("doc_id", "text")
  }

  test("excerpt scores 1.0 toward its container; container scores < 1 back") {
    import spark.implicits._
    val got = Dedup.containmentPairs(corpus, k = 3, threshold = 0.0, maxDf = 100)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 1.0) // all 4 of doc 1's 3-shingles appear in doc 2
    assert(got((2L, 1L)) < 1.0 && got((2L, 1L)) > 0.0)
    assert(!got.contains((1L, 3L)) && !got.contains((3L, 1L)))
    // while exact Jaccard on the same pair is well below a dedup threshold
    val j = Dedup.jaccardForPairs(corpus,
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), 3).as[(Long, Long, Double)].head()._3
    assert(j < 0.5)
  }

  test("df cap drops boilerplate shingles from candidates and denominators") {
    // every shingle of doc 1 also occurs in doc 2 → each has df = 2;
    // maxDf = 1 empties the capped index of shared shingles → no pairs
    val capped = Dedup.containmentPairs(corpus, k = 3, threshold = 0.0, maxDf = 1)
    assert(capped.count() == 0)
  }

  test("preShingleRows tag must match (k, hashed=true)") {
    val rows = Dedup.shingleRows(corpus, k = 2, hashed = true)
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(corpus, k = 3,
        preShingleRows = Some(Dedup.ShingledRows(rows, k = 2, hashed = true)))
    }
  }
}
