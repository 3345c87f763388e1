package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.PorterStem

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions so `spark.sql("SELECT porter_stem(w) …")`
  * works next to the Column API. Activate with:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("porter_stem"),
      new ExpressionInfo(classOf[PorterStem].getName, "porter_stem"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "porter_stem takes exactly one argument")
        PorterStem(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "jaro_winkler takes exactly two arguments")
        graft.functions.JaroWinkler(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vec_dot takes exactly two arguments")
        graft.functions.DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_quantize_i8"),
      new ExpressionInfo(classOf[graft.functions.QuantizeInt8].getName, "vec_quantize_i8"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "vec_quantize_i8 takes exactly one argument")
        graft.functions.QuantizeInt8(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("byte_mean"),
      new ExpressionInfo(classOf[graft.functions.ByteMean].getName, "byte_mean"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "byte_mean takes exactly one argument")
        graft.functions.ByteMean(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_sketch"),
      new ExpressionInfo(classOf[graft.functions.SpaceSavingTopK].getName, "topk_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SpaceSavingTopK.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("bottomk_sketch"),
      new ExpressionInfo(classOf[graft.functions.KmvBottomK].getName, "bottomk_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.KmvBottomK.fromChildren(children)))
    // custom optimizer rule (builder brief path (c)): cheap length guard
    // in front of levenshtein threshold filters
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
    // custom whole-operator path (c): top-k per key without a full sort
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
