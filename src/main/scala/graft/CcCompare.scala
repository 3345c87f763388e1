package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the two connected-components formulations (Pregel
  * min-label + pointer jumping vs Kiveris alternating stars) on the real
  * near-dup graph at sf0.1 and on a 10× disjoint blow-up of it. Informs
  * which formulation the gate's shared CC memo uses; results recorded in
  * docs/SCALE.md.
  */
object CcCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.local(GraftSession.coresFromEnv())

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.ext.Dedup.minhashPairs(docs, k = 3, numHashes = 32,
        bands = 16, threshold = 0.8)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint(true) // edges materialized once; CC timed alone
    Caches.clearPersisted()
    val reps10 = spark.range(10).select(col("id").as("__r"))
    val pairs10 = pairs.crossJoin(reps10)
      .select((col("src") + col("__r") * 10000000L).as("src"),
        (col("dst") + col("__r") * 10000000L).as("dst"))
      .localCheckpoint(true)
    println(s"[cc] edges 1x=${pairs.count()} 10x=${pairs10.count()}")

    def time(label: String, f: () => Long): Unit = {
      var rows = 0L
      val med = BenchUtil.medianTimeSec(reps)(() => rows = f())
      println(f"[cc] $label%-26s median=$med%6.2fs rows=$rows")
    }
    for ((elabel, e) <- Seq("1x" -> pairs, "10x" -> pairs10)) {
      time(s"minlabel_$elabel", () => graft.ext.Graph.connectedComponents(e).count())
      time(s"stars_$elabel", () => graft.ext.Graph.connectedComponentsStars(e).count())
    }
    spark.stop()
  }
}
