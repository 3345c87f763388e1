package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact interpolated quantiles (percentile_cont semantics) with BOUNDED
  * memory everywhere — the scale-safe replacement for Spark's exact
  * `percentile` aggregate (r4 VERDICT #3).
  *
  * Why: `percentile` is a `TypedImperativeAggregate` whose buffer holds
  * every distinct (value, count) pair; the final merge lands on ONE task
  * with O(distinct values) memory — at 100× the customers it is a
  * single-task memory cliff (the same class of smell as the unpartitioned
  * window the gate already banned). `approx_percentile` bounds memory but
  * loses the exact answer the DuckDB `quantile_cont` oracle checks.
  *
  * This helper computes the EXACT order statistics with the classic
  * iterative-histogram selection algorithm (multi-pass distributed
  * selection; cf. Blum et al. selection at scale and the BigQuery/Hive
  * `width_bucket` narrowing idiom):
  *
  *  1. one pass: per-group count/min/max;
  *  2. per level: ONE distributed scan histograms every unresolved
  *     (group, rank) state into `buckets` equi-width buckets over its
  *     current value range (a broadcast-joined state table; hash
  *     aggregate on (state, bucket) — map-side combined, O(states ×
  *     buckets) driver rows, O(1) per-task memory); the bucket containing
  *     the target rank becomes the state's new range. A bucket whose
  *     min == max resolves immediately (duplicate-heavy data), so ranges
  *     shrink 4096× per level — 3 levels cover 10¹² rows;
  *  3. when a state's range holds ≤ `gatherThreshold` rows, ONE gather
  *     scan collects those values; the k-th smallest is read off locally.
  *
  * Every executor task does pure codegen arithmetic; the driver holds at
  * most max(states × buckets, states × gatherThreshold) doubles — both
  * independent of input row count. Total scans: 2 + levels (shared by ALL
  * groups and probs — states advance in lockstep).
  *
  * Numeric contract: order statistics are exact data values, and the
  * interpolation `lo + frac·(hi − lo)` at position `p·(n−1)` matches
  * DuckDB `quantile_cont` / Spark `percentile` (callers round to 6dp on
  * both engine sides, absorbing last-ulp formula differences, exactly as
  * the previous exact-`percentile` gate entries did).
  *
  * Consistency note: bucket membership across levels reuses the SAME
  * clamped-floor expression `min(buckets−1, floor((v − lo) / width))`
  * with the level's recorded (lo, width, j) — never a recomputed range
  * predicate — so floating-point boundary rows can never drift between
  * the counting pass and the narrowing pass.
  */
object Quantiles {

  /** Per-group result: non-null row count + one quantile per requested prob. */
  case class GroupResult(n: Long, quantiles: Seq[Double])

  private case class State(
      groupKey: Seq[Any],          // group column values
      k: Long,                     // target order statistic, 1-based, within group
      var chain: List[(Double, Double, Int)], // (lo, width, bucket) membership per level
      var cnt: Long,               // rows inside current chain range
      var kOff: Long,              // rank of target within current range, 1-based
      var lo: Double,              // current range bounds (for next subdivision)
      var hi: Double,
      var resolved: Option[Double] = None)

  /** Exact per-group interpolated quantiles.
    *
    * @param df        input
    * @param valueCol  numeric column (cast to double; nulls ignored)
    * @param probs     quantile probabilities in [0, 1]
    * @param groupCols grouping columns (empty → one global group); group
    *                  count must be result-set-bounded (it is the output)
    * @return map: group-key values → (n, quantile per prob in probs
    *         order); groups with zero non-null rows are absent
    */
  def exact(df: DataFrame, valueCol: String, probs: Seq[Double],
      groupCols: Seq[String] = Nil, buckets: Int = 4096,
      gatherThreshold: Long = 8192, maxLevels: Int = 8): Map[Seq[Any], GroupResult] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val v = col(valueCol).cast("double")
    // constant key keeps the grouped and global paths on one code shape
    val gcols = if (groupCols.nonEmpty) groupCols else Seq("__g")
    val base0 = if (groupCols.nonEmpty) df else df.withColumn("__g", lit(0))
    val base = base0.select(gcols.map(col) :+ v.as("__v"): _*).filter(col("__v").isNotNull)

    // pass 1: per-group count / min / max
    val stats = base.groupBy(gcols.map(col): _*)
      .agg(count(lit(1)).as("__n"), min("__v").as("__lo"), max("__v").as("__hi"))
      .collect()

    // ranks needed per group: floor and ceil order statistics per prob
    def pos(n: Long, p: Double): Double = p * (n - 1)
    val states = scala.collection.mutable.ListBuffer.empty[State]
    val groupN = scala.collection.mutable.Map.empty[Seq[Any], Long]
    stats.foreach { r =>
      val key = gcols.indices.map(r.get)
      val n = r.getLong(gcols.length)
      val (glo, ghi) = (r.getDouble(gcols.length + 1), r.getDouble(gcols.length + 2))
      groupN(key) = n
      val ks = probs.flatMap { p =>
        val q = pos(n, p)
        val kLo = math.floor(q).toLong + 1
        if (q > math.floor(q)) Seq(kLo, kLo + 1) else Seq(kLo)
      }.distinct
      ks.foreach { k =>
        val st = State(key, k, Nil, n, k, glo, ghi)
        if (glo == ghi) st.resolved = Some(glo)
        states += st
      }
    }

    val spark = df.sparkSession
    val keySchema = StructType(gcols.map(n => base.schema(n)))

    // membership/bucket expression: clamped floor, reused verbatim at
    // every level so boundary rows never drift between passes
    def bkt(lo: Column, w: Column): Column =
      least(lit(buckets - 1), floor((col("__v") - lo) / w)).cast("int")
    def memberChain(depth: Int): Column =
      (0 until depth).map { i =>
        val (lo, w, j) = (col(s"__lo$i"), col(s"__w$i"), col(s"__j$i"))
        j.isNull || (bkt(lo, w) === j)
      }.foldLeft(lit(true))(_ && _)

    // state tables carry the group key under renamed columns (__k0…) and
    // join back NULL-SAFELY: groupBy keeps a NULL group-key as a group of
    // its own, so the histogram/gather joins must match it too — a
    // null-unsafe equi-join would strand the NULL group's states
    def joinStates(sdf: DataFrame): DataFrame =
      base.join(broadcast(sdf),
        gcols.zipWithIndex.map { case (g, i) => col(g) <=> col(s"__k$i") }
          .reduce(_ && _))

    def statesDf(ss: Seq[State], withHist: Boolean): (DataFrame, Int) = {
      val depth = ss.map(_.chain.length).max
      val fields = keySchema.fields.toSeq.zipWithIndex
        .map { case (f, i) => StructField(s"__k$i", f.dataType, f.nullable) } ++
        Seq(StructField("__sid", IntegerType)) ++
        (0 until depth).flatMap(i => Seq(
          StructField(s"__lo$i", DoubleType), StructField(s"__w$i", DoubleType),
          StructField(s"__j$i", IntegerType, nullable = true))) ++
        (if (withHist) Seq(StructField("__hlo", DoubleType), StructField("__hw", DoubleType))
         else Nil)
      val rows = ss.zipWithIndex.map { case (st, sid) =>
        val chainCols = (0 until depth).flatMap { i =>
          st.chain.lift(i) match {
            case Some((lo, w, j)) => Seq[Any](lo, w, j)
            case None => Seq[Any](null, null, null)
          }
        }
        val hist = if (withHist) {
          val w = (st.hi - st.lo) / buckets
          Seq[Any](st.lo, w)
        } else Nil
        Row.fromSeq(st.groupKey ++ Seq(sid) ++ chainCols ++ hist)
      }
      (spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toList, 1), StructType(fields.toArray)), depth)
    }

    var level = 0
    var active = states.filter(st => st.resolved.isEmpty && st.cnt > gatherThreshold).toList
    while (active.nonEmpty) {
      require(level < maxLevels,
        s"quantile histogram did not resolve in $maxLevels levels — " +
          "pathological value distribution; raise maxLevels")
      // degenerate range → every remaining row holds the same double
      active.foreach { st =>
        val w = (st.hi - st.lo) / buckets
        if (!(w > 0)) st.resolved = Some(st.lo)
      }
      val live = active.filter(_.resolved.isEmpty)
      if (live.nonEmpty) {
        val (sdf, depth) = statesDf(live, withHist = true)
        val hist = joinStates(sdf)
          .filter(memberChain(depth))
          .groupBy(col("__sid"), bkt(col("__hlo"), col("__hw")).as("__b"))
          .agg(count(lit(1)).as("__c"), min("__v").as("__bmin"), max("__v").as("__bmax"))
          .collect()
          .groupBy(_.getInt(0))
        live.zipWithIndex.foreach { case (st, sid) =>
          val bs = hist.getOrElse(sid, Array.empty[Row]).sortBy(_.getInt(1))
          var remaining = st.kOff
          var done = false
          for (b <- bs if !done) {
            val c = b.getLong(2)
            if (remaining <= c) {
              val (bmin, bmax) = (b.getDouble(3), b.getDouble(4))
              if (bmin == bmax) st.resolved = Some(bmin)
              else {
                val w = (st.hi - st.lo) / buckets
                st.chain = st.chain :+ ((st.lo, w, b.getInt(1)))
                st.kOff = remaining
                st.cnt = c
                st.lo = bmin   // tightest correct bounds for the next split
                st.hi = bmax
              }
              done = true
            } else remaining -= c
          }
          assert(done, s"rank ${st.kOff} not found in histogram of ${st.cnt} rows")
        }
      }
      level += 1
      active = states.filter(st => st.resolved.isEmpty && st.cnt > gatherThreshold).toList
    }

    // gather pass: all small-range states in one scan
    val toGather = states.filter(_.resolved.isEmpty).toList
    if (toGather.nonEmpty) {
      val (sdf, depth) = statesDf(toGather, withHist = false)
      val vals = joinStates(sdf)
        .filter(memberChain(depth))
        .select(col("__sid"), col("__v"))
        .collect()
        .groupBy(_.getInt(0))
      toGather.zipWithIndex.foreach { case (st, sid) =>
        val sorted = vals.getOrElse(sid, Array.empty[Row]).map(_.getDouble(1)).sorted
        assert(sorted.length == st.cnt,
          s"gather saw ${sorted.length} rows, expected ${st.cnt}")
        st.resolved = Some(sorted((st.kOff - 1).toInt))
      }
    }

    val byGroupRank: Map[(Seq[Any], Long), Double] =
      states.map(st => (st.groupKey, st.k) -> st.resolved.get).toMap
    groupN.map { case (key, n) =>
      // the synthetic global-group key stays internal
      (if (groupCols.isEmpty) Seq.empty[Any] else key) -> GroupResult(n, probs.map { p =>
        val q = pos(n, p)
        val kLo = math.floor(q).toLong + 1
        val f = q - math.floor(q)
        val a = byGroupRank((key, kLo))
        if (f > 0) a + f * (byGroupRank((key, kLo + 1)) - a) else a
      })
    }.toMap
  }
}
