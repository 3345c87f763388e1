package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustering for multi-dimensional data skipping —
  * extension surface beyond the reference (its corpus is 1-D doc_id;
  * a 100 TB lakehouse table is queried on several dimensions at once).
  *
  * Why this matters at scale: parquet data skipping prunes files by
  * per-file min/max. A table sorted on ONE column has tight stats on
  * that column only — a predicate on a second column scans everything.
  * Sorting by the interleaved-bit Morton code gives every file a tight
  * bounding BOX over both dimensions, so 2-D predicates prune files
  * multiplicatively. Production shape: `df.repartitionByRange(n,
  * zorderKey(x, y)).sortWithinPartitions(...)` before the parquet sink
  * — the z computation is pure per-row arithmetic (codegen, no
  * shuffle); only the range partitioning moves data, exactly like any
  * other sorted write.
  *
  * All bit math uses the classic "interleave by binary magic numbers"
  * spreading (public-domain bit hack), expressed as shiftleft/AND/OR
  * Column arithmetic — identically computable in DuckDB (`<<`, `&`,
  * `|` over BIGINT), which is what makes the gate query exactly
  * oracle-checkable.
  */
object ZOrder {

  /** Insert a zero bit between each of the low 16 bits of `v`:
    * 0xFFFF → 0x55555555. Five shift/mask rounds, all codegen.
    */
  def spread16(c: Column): Column = {
    val v0 = c.cast(LongType).bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates: x in even bits,
    * y in odd bits.
    */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Scale a value into [0, 65535] given its global min/max (driver
    * scalars — the S4 pattern; four fixed-size values). floor of a
    * single double multiply+divide: IEEE-identical in DuckDB.
    */
  def scale16(c: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0L)
    else floor((c - lit(lo)).cast("double") * lit(65535.0) /
      lit((hi - lo).toDouble)).cast(LongType)

  /** Per-z-range-bucket 2-D bounding-box stats: the data-skipping
    * demonstration. Buckets are the top `bucketBits` bits of the Morton
    * code — pure arithmetic, no global sort, no window — so the query
    * is one scan + one hash aggregate at any scale, and each bucket is
    * the set of rows a z-ordered writer would co-locate. Output:
    * (bucket, n, x_min, x_max, y_min, y_max) ordered by bucket; tight
    * per-bucket spans on BOTH columns are what file-level min/max
    * pruning sees after a z-ordered write.
    */
  def clusterStats(df: DataFrame, xCol: String, yCol: String,
      bucketBits: Int = 5): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16, "bucketBits in [1,16]")
    val r = df.agg(
      min(col(xCol)).cast(LongType), max(col(xCol)).cast(LongType),
      min(col(yCol)).cast(LongType), max(col(yCol)).cast(LongType)).head()
    val (xlo, xhi, ylo, yhi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val z = morton2(scale16(col(xCol), xlo, xhi), scale16(col(yCol), ylo, yhi))
    df.select(col(xCol).as("x"), col(yCol).as("y"),
        shiftright(z, 32 - bucketBits).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .orderBy("bucket")
  }
}
