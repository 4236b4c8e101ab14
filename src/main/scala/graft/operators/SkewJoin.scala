package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join splitting handles most skew at runtime; this is the
  * explicit, planner-independent tool for the pathological case (one
  * key holding a double-digit share of a 100 TB fact table): the
  * skewed (left) side gets a random salt in [0, salts), the small/
  * uniform (right) side is replicated `salts` times, and the join key
  * becomes (key, salt) — spreading each hot key over `salts` reducers.
  *
  * Cost model: right side is replicated `salts`× (choose it small and
  * the side small), left shuffle unchanged in volume but uniform in
  * distribution. Result is row-identical to the unsalted join.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      salts: Int = 8): DataFrame = {
    // rand() is fine for the salt: any distribution works, correctness
    // does not depend on it (every left row joins its key's replicas).
    val saltedLeft = left.withColumn("_salt", (rand(42) * salts).cast("int"))
    val saltedRight = right
      .withColumn("_salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedLeft.join(saltedRight,
      leftKey === rightKey && saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
