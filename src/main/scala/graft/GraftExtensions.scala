package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.PolyHash64

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions with the SQL function registry, so `spark.sql` and `expr(...)`
  * can call them by name.
  *
  * Install with:
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * or spark.sql.extensions=graft.GraftExtensions on spark-submit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("polyhash64"),
      new ExpressionInfo(classOf[PolyHash64].getName, "polyhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSim(children(0), children(1))))
    // automatic bucket pruning for key-equality scans of TableFormat tables
    // (reads the bucket layout from the table manifest — see plans.BucketPrune)
    ext.injectOptimizerRule(_ => graft.plans.BucketPrune)
  }
}
