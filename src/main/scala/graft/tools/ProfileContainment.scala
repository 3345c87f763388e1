package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Phase profiler for the containment-dedup pipeline: times each stage
  * of Dedup.containmentPairs separately (shingling, df-capped postings,
  * predicted pair mass sum df², pair join) at a given sfDir so scale
  * growth can be attributed to a stage instead of guessed at. This is
  * the tool that exposed the r7 synth vocabulary leak (docs/SCALE.md
  * round-8 section): predicted pairs measured 115M at 10× where a
  * disjoint blow-up implies ~29M. Diagnostic main — not part of the
  * driver contract.
  */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(graft.GraftSession.coresFromEnv())

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // phase 1: shingle rows (tokenize + window + distinct), materialized
    val shr = graft.Caches.persist(Dedup.shingleRows(docs, 3, hashed = true))
    val nShr = t("shingleRows count")(shr.count())
    println(s"[prof]   shingle rows = $nShr")

    // phase 2: capped postings (df agg + join back), materialized
    val rare = Dedup.cappedPostings(shr, 100)
    val nRare = t("cappedPostings count")(rare.count())
    println(s"[prof]   capped posting rows = $nRare")

    // phase 2b: pair fan-out prediction: sum df^2 over kept shingles
    t("sum df^2 (predicted pairs)") {
      val s = rare.groupBy("shingle").agg(count(lit(1)).as("d"))
        .agg(sum(col("d") * col("d"))).collect()(0).getLong(0)
      println(s"[prof]   sum df^2 = $s")
    }

    // phase 3: sizes
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    t("sizes count")(sizes.count())

    // phase 4: pair join + agg
    val shared = rare.select(col("shingle"), col("doc_id").as("doc_a"))
      .join(rare.select(col("shingle"), col("doc_id").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
    val nPairs = t("shared pair agg count")(shared.count())
    println(s"[prof]   directed candidate pairs = $nPairs")

    // phase 5: full query
    t("full containmentPairs") {
      Dedup.containmentPairs(docs, 3, 0.5, 100,
        preShingleRows = Some(Dedup.ShingledRows(shr, 3, hashed = true))).count()
    }

    graft.Caches.clearPersisted()
    spark.stop()
  }
}
