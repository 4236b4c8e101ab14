package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point, so a cluster deployment can
  * enable the graft SQL functions with config alone:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (the runtime alternative is GraftFunctions.register(spark)). The
  * function set is [[graft.functions.GraftFunctions.sqlBuilders]] —
  * one shared table drives both paths, so a /fetch user sees the same
  * surface (hashing, shingling, MinHash/SimHash signatures, vector
  * dot/norm, sorted-fingerprint Jaccard/intersection, bounded-heap
  * top-k and SpaceSaving heavy-hitter aggregates) however the session
  * was configured. Literal parameters are validated at analysis time
  * (AnalysisException, not execution-time Arithmetic errors).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.sqlBuilders.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
}
