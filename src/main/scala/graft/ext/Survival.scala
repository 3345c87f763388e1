package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation (the product-limit estimator,
  * Kaplan & Meier JASA 1958) — the churn/retention face a curation or
  * growth pipeline runs over inter-event gaps: "what fraction of
  * customers have NOT yet reordered by day t", with subjects whose
  * follow-up ended (no later order to observe) correctly treated as
  * CENSORED at their last observation instead of silently dropped or
  * counted as never-returning — the two classic biases the estimator
  * exists to avoid.
  *
  * Spark-first split: the DISTRIBUTED work is reducing N subject rows
  * to the per-duration event/censor table (one hash aggregate; distinct
  * durations are CALENDAR-bounded — days between orders — regardless of
  * N), and the sequential product-limit recursion then runs driver-side
  * over that bounded table: the ts_holt_forecast S4-vector pattern. At
  * 100 TB the aggregate is the only N-sized stage.
  *
  * Determinism contract: risk sets are EXACT integer arithmetic
  * (n_{i+1} = n_i − d_i − c_i); each survival step multiplies by
  * (1 − d_i/n_i) — two correctly-rounded IEEE ops on integer-derived
  * operands — in strictly ascending duration order, so the driver-side
  * fold is bit-identical to the oracle's recursive CTE computing the
  * same expression order. Output pinned to 6dp.
  */
object Survival {

  /** Product-limit estimate over a subject table (t, event): `t` the
    * observed duration in integer units, `event` true if the terminal
    * event was observed at t, false if the subject was censored at t.
    * Standard convention: subjects censored AT t are still in the risk
    * set for events AT t.
    *
    * Output, one row per distinct duration, ascending: (t, n_risk,
    * d_events, n_censored, s 6dp) where s is S(t) AFTER the events at t.
    */
  def kaplanMeier(subjects: DataFrame): DataFrame = {
    val perT = subjects
      .groupBy(col("t"))
      .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
        sum(when(col("event"), 0L).otherwise(1L)).as("c"))
      .orderBy("t")
      .collect()
    var n = perT.iterator.map(r => r.getLong(1) + r.getLong(2)).sum
    var s = 1.0
    val out = perT.map { r =>
      val (t, d, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val nRisk = n
      s = s * (1.0 - d.toDouble / nRisk.toDouble)
      n -= d + c
      (t, nRisk, d, c,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val spark = subjects.sparkSession
    import spark.implicits._
    out.toSeq.toDF("t", "n_risk", "d_events", "n_censored", "s")
      .orderBy("t")
  }
}
