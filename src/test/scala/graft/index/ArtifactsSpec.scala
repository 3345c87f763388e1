package graft.index

import java.nio.file.Files
import graft.SparkSpec

/** S3 sink path: persist all reference-shaped index artifacts
  * (SURVEY.md §1.1) and read them back.
  */
class ArtifactsSpec extends SparkSpec {

  test("writeArtifacts round-trips the seven artifact tables") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "merge sort merge"),
      (2L, "hash join sort")).toDF("doc_id", "text")
    val t = Indexer.build(corpus, stem = false)
    val dir = Files.createTempDirectory("graft-artifacts").toString
    Indexer.writeArtifacts(spark, t, dir)

    def n(name: String): Long = spark.read.parquet(s"$dir/$name.parquet").count()
    assert(n("flat_words") == 6)
    assert(n("doc_lengths") == 2)
    assert(n("term_frequencies") == 5)
    assert(n("idf_values") == 4)
    assert(n("inverted_index") == 4)
    val params = spark.read.parquet(s"$dir/scoring_params.parquet")
      .as[Double].collect()
    assert(params.toSeq == Seq(3.0)) // avgdl = (3 + 3) / 2
  }
}
