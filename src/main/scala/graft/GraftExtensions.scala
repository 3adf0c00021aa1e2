package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.ops.SqlFunctions

/** Session extension injecting the st_* SQL functions and the spatial
  * optimizer rules for every session:
  * `spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...`
  * (SparkSessionExtensions is the public plug-in point; SNIPPETS.md [1]
  * shows the same pattern for strategies.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    SqlFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.ops.SqlFunctions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.ops.SpatialFilterPushdown)
  }
}
