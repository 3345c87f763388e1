package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.graftshim.ColumnShim

import graft.plans.{TopKPerKey, TopKPerKeyStrategy}

/** Public face of the [[graft.plans.TopKPerKey]] custom operator. */
object TopK {

  /** k best rows per key group.
    *
    * @param df       input
    * @param keys     grouping column names
    * @param ordering (column, descending?) pairs defining "best"; make it
    *                 a total order (add a tiebreak) for determinism
    * @param k        rows kept per key
    */
  def perKey(df: DataFrame, keys: Seq[String], ordering: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ColumnShim.addStrategy(spark, TopKPerKeyStrategy)
    val lp = ColumnShim.logicalPlan(df)
    def attr(n: String) = lp.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    val order = ordering.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    ColumnShim.ofRows(spark, TopKPerKey(keys.map(attr), order, k, lp))
  }
}
