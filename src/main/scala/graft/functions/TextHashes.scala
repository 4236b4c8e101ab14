package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.{Bridge, Fnv1a64, SimHash64}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by eval and generated code. Called from
  * whole-stage-codegen'd Java, so keep them allocation-light.
  */
object TextHashes {

  /** 64-bit FNV-1a over raw bytes — a fast, stable document
    * fingerprint primitive.
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: UTF8String): Long = fnv1a64(s.getBytes)

  /** 64-bit SimHash over whitespace-separated tokens: each token's
    * fnv1a64 votes ±1 on every bit; the sign of each bit-sum is the
    * fingerprint bit. Near-identical texts land within a small
    * hamming distance.
    */
  def simhash64(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val str = s.toString
    var start = 0
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) {
          val h = fnv1a64(str.substring(start, i).getBytes("UTF-8"))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Column API + per-session SQL registration for the graft functions
  * (expressions themselves live in org.apache.spark.sql.graftglue).
  */
object GraftFunctions {
  def fnv1a64(c: Column): Column = Bridge.column(Fnv1a64(Bridge.expression(c)))
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))

  /** Make `fnv1a64(...)` / `simhash64(...)` usable from SQL text. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    def unary(name: String, f: org.apache.spark.sql.catalyst.expressions.Expression => org.apache.spark.sql.catalyst.expressions.Expression)(
        es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
      require(es.length == 1, s"$name expects exactly 1 argument, got ${es.length}")
      f(es.head)
    }
    Bridge.registerFunction(spark, "fnv1a64", unary("fnv1a64", Fnv1a64.apply))
    Bridge.registerFunction(spark, "simhash64", unary("simhash64", SimHash64.apply))
  }
}
