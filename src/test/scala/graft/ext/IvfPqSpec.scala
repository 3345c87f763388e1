package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.ivfPqTopK]] invariants against its two parents on real
  * fixture embeddings: candidates come ONLY from the query's IVF
  * cluster, and the ADC distance of any returned pair equals what the
  * cluster-free [[Similarity.pqTopK]] scan computes for that pair.
  */
class IvfPqSpec extends SparkSpec {

  private lazy val e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  test("results are cluster-mates of their query") {
    val q = e.filter(col("vec_id") < 8)
    val res = Similarity.ivfPqTopK(e, q, topK = 5)
    val assign = Similarity.ivfAssign(e, nCentroids = 8)
    val joined = res
      .join(assign.select(col("vec_id"), col("cluster").as("c_cl")), Seq("vec_id"))
      .join(assign.select(col("vec_id").as("query_id"), col("cluster").as("q_cl")),
        Seq("query_id"))
    assert(joined.filter(col("c_cl") =!= col("q_cl")).count() == 0)
    assert(res.count() > 0)
  }

  test("ADC distances agree with the unclustered PQ scan") {
    val q = e.filter(col("vec_id") < 8)
    // pqTopK over the whole corpus with a huge k = every (query, vec) ADC
    val full = Similarity.pqTopK(e, q, topK = Int.MaxValue)
      .select(col("query_id"), col("vec_id"), col("adist").as("full_adist"))
    val sub = Similarity.ivfPqTopK(e, q, topK = 5)
    val mism = sub.join(full, Seq("query_id", "vec_id"))
      .filter(col("adist") =!= col("full_adist"))
    assert(mism.count() == 0)
  }
}
