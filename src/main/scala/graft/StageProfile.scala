package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool (guide §1.1 empirical loop with the UI disabled): run named
  * SparkEntry queries once warm + once timed and print a per-JOB /
  * per-STAGE breakdown — wall span, task count, task-time sum, shuffle
  * bytes — from a SparkListener. This is where "which stage is slow"
  * comes from on a headless harness: jobs ≈ driver actions, stages ≈
  * shuffle boundaries, so the printout localizes whether a query's cost
  * is many small jobs (driver round-trips), one shuffle-heavy stage, or
  * task-count overhead (tiny data fanned over `shuffle.partitions`).
  * Args: sfDir queryName...
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProfile <sfDir> <query> [<query>…]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.local(GraftSession.coresFromEnv(default = 32))
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageRec(id: Int, name: String, var tasks: Int = 0,
      var taskTimeMs: Long = 0L, var shufReadB: Long = 0L,
      var shufWriteB: Long = 0L, var launched: Long = 0L, var done: Long = 0L)
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, Seq[Int])]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collecting) jobs(js.jobId) = (js.time, 0L, js.stageIds)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (collecting) jobs.get(je.jobId).foreach { case (t0, _, sids) =>
          jobs(je.jobId) = (t0, je.time, sids)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val r = stages.getOrElseUpdate(si.stageId,
            StageRec(si.stageId, si.name.takeWhile(_ != '\n')))
          r.tasks += si.numTasks
          r.taskTimeMs += si.taskMetrics.executorRunTime
          r.shufReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          r.shufWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          r.launched = si.submissionTime.getOrElse(0L)
          r.done = si.completionTime.getOrElse(0L)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"no such query: $n"))
      // warm pass (small sf): codegen + JIT, same as Bench
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      Caches.clearPersisted()
      stages.clear(); jobs.clear()
      collecting = true
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(800) // let the listener bus drain (private API otherwise)
      Caches.clearPersisted()
      println(f"\n==== $n wall=$wall%.3f s rows=$rows jobs=${jobs.size} stages=${stages.size} ====")
      val totalTaskMs = stages.values.map(_.taskTimeMs).sum
      val totalTasks = stages.values.map(_.tasks).sum
      println(f"  total tasks=$totalTasks taskTime=${totalTaskMs / 1000.0}%.2f s")
      jobs.toSeq.sortBy(_._1).foreach { case (jid, (s, e, sids)) =>
        println(f"  job $jid%4d span=${(e - s) / 1000.0}%7.3f s stages=${sids.mkString(",")}")
      }
      stages.values.toSeq.sortBy(-_.taskTimeMs).take(25).foreach { r =>
        println(f"  stage ${r.id}%4d span=${(r.done - r.launched) / 1000.0}%7.3f s tasks=${r.tasks}%4d taskTime=${r.taskTimeMs / 1000.0}%7.2f s shufR=${r.shufReadB / 1024}%8d KiB shufW=${r.shufWriteB / 1024}%8d KiB  ${r.name.take(80)}")
      }
    }
    spark.stop()
  }
}
