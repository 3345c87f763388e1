package graft.tools

/** Per-rep query timing probe — Bench's exact per-query procedure
  * (sf0.001 warmup pass, calibration probe, timed reps at the target
  * SF with `Caches.clearPersisted()` between reps) applied to a NAMED
  * SUBSET of gate queries, printing every raw sample instead of the
  * median. This is the receipts tool the r12 bench anomalies asked
  * for: "is the swing the memo lifecycle, the rep ordering, or box
  * noise" is only answerable from per-rep samples. Diagnostic main —
  * not part of the driver contract.
  *
  * Usage: runMain graft.tools.ProbeQueries <sfDir> <reps> <query>…
  */
object ProbeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeQueries <sfDir> <reps> <query>…")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.GraftSession.local(graft.GraftSession.coresFromEnv(default = 32))

    // Bench's warmup: one pass at the smallest SF per probed query
    names.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      graft.Caches.clearPersisted()
    }
    spark.catalog.clearCache()
    // Bench's calibration probe (the u4 leg — the one the ledger keys on)
    val probe = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("u4_concat_opinions")(spark, "/root/testdata/sf0.001").count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Caches.clearPersisted()
      dt
    }.sorted.apply(2)
    println(f"[probe] calibration u4=$probe%.4f s")

    names.foreach { q =>
      // a rep that throws is excluded from the samples — timing the
      // exception path would report a misleadingly fast median for a
      // consistently failing query (it would look like the FASTEST one)
      val samples = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { graft.SparkEntry.queries(q)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[probe] $q failed: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Caches.clearPersisted()
        if (ok) Some(dt) else None
      }
      if (samples.isEmpty)
        println(f"[probe] $q%-28s ALL $reps%d reps FAILED — no samples")
      else {
        val med = samples.sorted.apply(samples.size / 2)
        val failed = reps - samples.size
        val tag = if (failed > 0) s"  ($failed failed rep(s) excluded)" else ""
        println(f"[probe] $q%-28s median=$med%7.3f s  samples=${samples.map(s => f"$s%.3f").mkString(", ")}$tag")
      }
    }
    spark.stop()
  }
}
