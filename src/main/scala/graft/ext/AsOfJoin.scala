package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no built-in for
  * (builder brief: "when the reference has an operator Spark lacks …
  * compose existing ops if semantics allow"). For every left row, attach
  * the single most recent right row with the same key and
  * `rightTime <= leftTime` (the "backward" as-of of kdb/pandas/DuckDB).
  *
  * Implementation — the scalable composition, NOT a range cross-join:
  * tag both inputs, UNION them, and run one window pass per key ordered
  * by (time, side): `last(..., ignoreNulls)` carries the most recent
  * right-side attributes forward onto each left row. Cost is ONE shuffle
  * on the key plus a codegen'd window sort — the same shape as a sessionize,
  * and the standard big-data as-of plan (a banded/range join would shuffle
  * twice and still need per-band sorts). At equal timestamps the right row
  * is visible to the left row (ties sort right-before-left), matching the
  * `>=` as-of convention.
  *
  * Determinism: callers must ensure at most one right row per
  * (key, rightTime) — pre-aggregate otherwise (see the asof_latest_order
  * query in [[graft.SparkEntry]]) — because every as-of implementation
  * (DuckDB included) picks arbitrarily among equal-time matches.
  *
  * Scale notes (100 TB): the shuffle moves (key, time, carried-cols) only;
  * heavily hot keys (one user with millions of events) skew the window
  * sort — the salt-by-(key, day) precondition documented for
  * [[Sessions.sessionize]] applies identically here.
  */
object AsOfJoin {

  /** @param left       left rows; all its columns are preserved
    * @param right      right rows; only `key`, `rightTime`, `carry` move
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   epoch-comparable (numeric) time column on `left`
    * @param rightTime  epoch-comparable (numeric) time column on `right`
    * @param carry      right columns to attach to each left row
    * @return left rows (inner: only those with a match) plus, per carried
    *         column `c`, `c` from the latest right row at-or-before
    *         `leftTime`, and `asof_time` = that row's `rightTime`
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // fail fast: a carried column shadowing a left column would silently
    // null the left values during union padding
    val clash = carry.filter(leftCols.contains)
    require(clash.isEmpty,
      s"carry columns ${clash.mkString(", ")} collide with left columns — rename first")
    require(!carry.contains("asof_time") && !leftCols.contains("asof_time"),
      "asof_time is a reserved output column")
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("asof_time", lit(null).cast("long"))
    val lPadded = carry.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumnRenamed(rightTime, "__rt")
      .withColumn("__t", col("__rt").cast("long"))
      .withColumn("__side", lit(0))
      .withColumn("asof_time", col("__t"))
      .select((key +: "__t" +: "__side" +: "asof_time" +: carry).map(col): _*)
    val rPadded = leftCols.filterNot(c => c == key || carry.contains(c))
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = (leftCols :+ "__t" :+ "__side" :+ "asof_time").distinct ++
      carry.filterNot(leftCols.contains)
    val unioned = lPadded.select(cols.map(col): _*)
      .unionByName(rPadded.select(cols.map(col): _*))

    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (carry :+ "asof_time").foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    carried
      .filter(col("__side") === 1 && col("asof_time").isNotNull)
      .select((leftCols ++ carry :+ "asof_time").map(col): _*)
  }
}
