package graft

/** Shared timing protocol for the evidence harnesses ([[ScaleBench]],
  * [[CcCompare]]): median of `reps` wall-clock samples, with an
  * untimed `after` hook per rep (cache hygiene between samples). One
  * definition so the tools cannot silently drift apart; [[Bench]] keeps
  * its own loop — it is the frozen driver contract with its own
  * error-swallowing semantics.
  */
object BenchUtil {
  def medianTimeSec(reps: Int, after: () => Unit = () => ())(run: () => Unit): Double = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      after()
      dt
    }.sorted
    ts(ts.size / 2)
  }
}
