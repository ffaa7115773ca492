package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-handling levers (SURVEY §7.4: "skewed keys -> salting or
  * AQE skew-join"). AQE's OptimizeSkewedJoin splits oversized shuffle
  * partitions automatically for moderate skew; salting is the explicit
  * lever for extreme single-key skew (one key = half the table), where
  * even a split partition leaves one reducer with one un-splittable key
  * group in a sort-merge join.
  */
object Skew {

  /** Inner equi-join with the LEFT side's key skew neutralized: every left
    * row gets a deterministic per-row salt (hash of the whole row — NOT of
    * the key, which would re-concentrate hot keys), the right side is
    * replicated across all salt values, and the join key becomes
    * (key, salt). Hot keys now spread over `salts` reducers at the cost of
    * replicating the right side `salts` times — use when right is the
    * smaller side but too big to broadcast.
    */
  /** Deterministic per-ROW salt: hash of the whole row, never of the key
    * (key-hashing would re-concentrate hot keys onto one salt). Exposed so
    * tests assert the spread of the exact expression the join uses.
    */
  def rowSalt(df: DataFrame, salts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong))

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("__salt", rowSalt(left, salts))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    // Keys resolved against their own side: an unqualified col(key) would be
    // AMBIGUOUS_REFERENCE whenever both sides share the key name.
    saltedLeft
      .join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey)
          && saltedLeft("__salt") === replicatedRight("__salt"),
        "inner")
      .drop("__salt")
  }
}
