package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.index.Indexer
import graft.search.{BM25, Search}

/** Property-based invariants from SURVEY.md §5.3 over random corpora
  * (ScalaCheck generators sampled directly — the scalatest bridge artifact
  * is not on the offline classpath).
  */
class PropertySpec extends SparkSpec {

  private val wordGen = Gen.oneOf(
    "merge", "join", "table", "scan", "sort", "hash", "batch", "the",
    "query", "row", "data", "key", "filter", "stream")
  private val docGen = Gen.chooseNum(1, 30)
    .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen = Gen.chooseNum(2, 12)
    .flatMap(n => Gen.listOfN(n, docGen))

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def toDf(texts: List[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("sum of term frequencies per doc equals doc length (random corpora)") {
    (1 to 5).foreach { i =>
      val flat = Indexer.flatWords(toDf(sample(corpusGen, i)), stem = false)
      val bad = Indexer.docLengths(flat)
        .join(
          Indexer.termFrequencies(flat).groupBy("doc_id")
            .agg(sum("term_freq").as("s")),
          "doc_id")
        .filter(col("doc_length") =!= col("s"))
      assert(bad.count() == 0, s"seed $i")
    }
  }

  test("posting-list size equals doc_freq; doc_freq within [1, N]") {
    (10 to 14).foreach { i =>
      val flat = Indexer.flatWords(toDf(sample(corpusGen, i)), stem = false)
      val n = math.max(Indexer.docLengths(flat).count(), 1)
      val joined = Indexer.invertedIndex(flat)
        .join(Indexer.docFreqIdf(flat, n), "word")
      assert(joined.filter(size(col("doc_ids")) =!= col("doc_freq")).count() == 0, s"seed $i")
      assert(joined.filter(col("doc_freq") < 1 || col("doc_freq") > n).count() == 0, s"seed $i")
    }
  }

  test("BM25 monotonically increases in tf (fixed dl, idf, avgdl)") {
    import spark.implicits._
    val scores = (1L to 50L).toList.toDF("tf")
      .orderBy("tf")
      .select(BM25.score(col("tf"), lit(100L), lit(0.7), lit(120.0)).as("s"))
      .as[Double].collect()
    assert(scores.sliding(2).forall { case Array(a, b) => b > a })
  }

  test("top-k(n) is a prefix of top-k(n+3) for search results") {
    (20 to 22).foreach { i =>
      import spark.implicits._
      val texts = sample(corpusGen, i)
      val t = Indexer.build(toDf(texts), stem = false)
      def ids(k: Int): Seq[Long] =
        Search.scoreTerms(t, Seq("merge", "join")).limit(k)
          .select("doc_id").as[Long].collect().toSeq
      val a = ids(3)
      assert(ids(6).take(a.length) == a, s"seed $i")
    }
  }
}
