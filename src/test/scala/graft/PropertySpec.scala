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

  test("as-of join matches a brute-force scan on random tables") {
    import spark.implicits._
    val rowGen = for {
      k <- Gen.chooseNum(0L, 4L); t <- Gen.chooseNum(0L, 50L)
    } yield (k, t)
    (30 to 32).foreach { i =>
      val ls = sample(Gen.listOfN(60, rowGen), i).zipWithIndex
        .map { case ((k, t), id) => (k, t, id.toLong) }
      val rsRaw = sample(Gen.listOfN(25, rowGen), i + 100).zipWithIndex
        .map { case ((k, t), id) => (k, t, (1000 + id).toLong) }
      // contract: one right row per (key, time) — keep max id
      val rs = rsRaw.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val got = graft.ext.AsOfJoin.backward(
        ls.toDF("k", "lt", "id"), rs.toDF("k", "rt", "v"),
        "k", "lt", "rt", Seq("v"))
        .select("id", "v").as[(Long, Long)].collect().toMap
      val want = ls.flatMap { case (k, lt, id) =>
        val m = rs.filter(r => r._1 == k && r._2 <= lt)
        if (m.isEmpty) None else Some(id -> m.maxBy(r => (r._2, r._3))._3)
      }.toMap
      assert(got == want, s"seed $i")
    }
  }

  test("TopKPerKey equals the window idiom on random tables (incl. k > group size)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rowGen = for {
      k <- Gen.chooseNum(0L, 5L); v <- Gen.chooseNum(-100, 100)
    } yield (k, v.toDouble)
    (40 to 42).foreach { i =>
      val rows = sample(Gen.listOfN(80, rowGen), i).zipWithIndex
        .map { case ((k, v), id) => (k, id.toLong, v) }
      val df = rows.toDF("k", "id", "v").repartition(5)
      val got = graft.ops.TopK.perKey(df, Seq("k"), Seq(("v", true), ("id", false)), 4)
        .select("k", "id").as[(Long, Long)].collect().toSet
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
        .select("k", "id").as[(Long, Long)].collect().toSet
      assert(got == want, s"seed $i")
    }
  }

  test("hashed and unhashed shingle Jaccard agree on random corpora") {
    import spark.implicits._
    (50 to 51).foreach { i =>
      val d = toDf(sample(corpusGen, i))
      val pairs = d.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
      def jac(hashed: Boolean): Map[(Long, Long), Double] =
        graft.ext.Dedup.jaccardForPairs(d, pairs, 3, hashed = hashed)
          .as[(Long, Long, Double)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
      assert(jac(true) == jac(false), s"seed $i")
    }
  }
}
