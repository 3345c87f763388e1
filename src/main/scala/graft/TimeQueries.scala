package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a SUBSET of gate queries without paying for the full
  * [[Bench]] sweep — `runMain graft.TimeQueries <sfDir> <name> [<name>…]`.
  * Same session shape and cache hygiene as Bench (median of
  * SPARK_GRAFT_BENCH_REPS reps, default 3, after one warmup pass).
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <query> [<query>…]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.local(GraftSession.coresFromEnv(default = 32))
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"no such query: $n"))
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      Caches.clearPersisted()
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Caches.clearPersisted()
        (dt, rows)
      }
      val med = samples.map(_._1).sorted.apply(samples.size / 2)
      println(f"TIMED $n%-28s ${med}%8.3f s   (${samples.head._2} rows)")
    }
    spark.stop()
  }
}
