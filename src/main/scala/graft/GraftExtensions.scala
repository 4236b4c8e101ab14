package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftglue.{CharEntropy, Fnv1a64, HashEmbed, SimHash64}

/** SparkSessionExtensions entry point, so a cluster deployment can
  * enable the graft SQL functions with config alone:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (the runtime alternative is GraftFunctions.register(spark)).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def unary(name: String, usage: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      es => {
        require(es.length == 1, s"$name expects exactly 1 argument, got ${es.length}")
        f(es.head)
      })

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(unary("fnv1a64",
      "fnv1a64(str) - 64-bit FNV-1a fingerprint of a string", Fnv1a64.apply))
    e.injectFunction(unary("simhash64",
      "simhash64(str) - 64-bit token-level SimHash of a string", SimHash64.apply))
    e.injectFunction(unary("char_entropy",
      "char_entropy(str) - code-point Shannon entropy (nats)", CharEntropy.apply))
    e.injectFunction((FunctionIdentifier("hash_embed"),
      new ExpressionInfo("graft", "hash_embed",
        "hash_embed(str, dim) - feature-hashing bag-of-words float vector"),
      es => {
        require(es.length == 2, s"hash_embed expects 2 arguments, got ${es.length}")
        // Validate at injection (= analysis) time so bad dims surface as a
        // clear AnalysisException, not an ArithmeticException (dim=0) or
        // NegativeArraySizeException (dim<0) at execution time.
        val dim = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v >= 1 => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            throw new org.apache.spark.sql.AnalysisException(
              "INVALID_PARAMETER_VALUE.INTEGER",
              Map("parameter" -> "dim", "functionName" -> "hash_embed",
                "invalidValue" -> s"$v (dim must be >= 1)"))
          case _ =>
            throw new org.apache.spark.sql.AnalysisException(
              "NON_FOLDABLE_ARGUMENT",
              Map("funcName" -> "hash_embed", "paramName" -> "dim",
                "paramType" -> "positive INT literal"))
        }
        HashEmbed(es.head, dim)
      }))
  }
}
