package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The shared LSH candidate-generation idiom: self-join banded/chunked rows
  * on their bucket key, keep ordered id pairs, dedupe pairs that collide in
  * more than one bucket. Used by MinHash (band, bh) and the sign-LSH cosine
  * dedup (chunk, cv) so skew/dedup fixes land in one place.
  */
object LshJoin {
  /** Distinct (a_id, b_id) with a_id < b_id sharing >= 1 bucket. */
  def bucketedPairs(buckets: DataFrame, bucketCols: Seq[String],
                    idCol: String): DataFrame = {
    val keyCols = bucketCols.map(col)
    val a = buckets.select(keyCols :+ col(idCol).as("a_id"): _*)
    val b = buckets.select(keyCols :+ col(idCol).as("b_id"): _*)
    a.join(b, bucketCols)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }
}
