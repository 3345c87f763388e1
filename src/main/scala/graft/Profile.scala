package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run named SparkEntry queries twice each and print both
  * timings — separates fixed cost (planning, codegen, first-read) from
  * marginal cost. Args: sfDir queryName...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val spark = GraftSession.local(GraftSession.coresFromEnv())
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once(); val t2 = once()
      println(f"[profile] $n%-28s first=$t1%7.2fs second=$t2%7.2fs")
    }
    spark.stop()
  }
}
