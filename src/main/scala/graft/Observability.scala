package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight pipeline telemetry — `Dataset.observe` wired as a reusable
  * data-quality layer.
  *
  * At 100 TB the naive way to report a batch's row count / null rate /
  * value range is a SECOND aggregation job over the same input — i.e. the
  * whole scan again. `observe` attaches aggregate metrics to the plan the
  * job already runs: every task accumulates the partial aggregates beside
  * its real work and the driver merges them when the action finishes —
  * zero extra scans, zero extra shuffles (metrics ride the existing
  * exchange as accumulator-style partials).
  *
  * Two pieces:
  *   - [[qualityObserved]]: the standard per-batch metric set (rows, null
  *     keys, key range, short/empty text) attached to any frame on its way
  *     into a sink;
  *   - [[requireQuality]]: the circuit-breaker — read the harvested
  *     metrics AFTER the action and fail the pipeline step when the batch
  *     is malformed, instead of publishing a bad partition and finding out
  *     a training run later.
  *
  * Constraints designed around (Spark's contract for observed metrics):
  * expressions must be aggregates over the row stream with no DISTINCT —
  * everything below is a plain conditional count/min/max, which also keeps
  * the merge order-independent (determinism policy §7.3: no cross-row FP).
  */
object Observability {

  /** The standard ingest-quality metric set over a key column and an
    * optional text column. All counters are exact integers; `key_min`/
    * `key_max` bound the batch's key range (partition-pruning sanity:
    * a batch that claims date=D but spans other keys shows immediately).
    */
  def qualityMetrics(keyCol: String, textCol: Option[String]): Seq[Column] = {
    val base = Seq(
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("null_keys"),
      min(col(keyCol)).as("key_min"),
      max(col(keyCol)).as("key_max"))
    val text = textCol.toSeq.flatMap { t =>
      Seq(
        sum(when(col(t).isNull || length(col(t)) === 0, 1L).otherwise(0L)).as("empty_text"),
        sum(when(length(col(t)) < 20, 1L).otherwise(0L)).as("short_text"))
    }
    base ++ text
  }

  /** Attach the standard metric set under `obs`; the caller runs its own
    * action (write/count/collect) and then reads `obs.get`.
    */
  def qualityObserved(df: DataFrame, obs: Observation, keyCol: String,
                      textCol: Option[String] = None): DataFrame = {
    val ms = qualityMetrics(keyCol, textCol)
    df.observe(obs, ms.head, ms.tail: _*)
  }

  /** Circuit-breaker over a harvested observation: empty batches and
    * null-key rates above `maxNullFrac` abort the step with a message the
    * operator can act on. Call strictly AFTER the action that consumed the
    * observed frame (Observation.get blocks until the action completes).
    */
  def requireQuality(obs: Observation, maxNullFrac: Double = 0.01): Map[String, Any] = {
    val m = obs.get
    val rows = m("n_rows").asInstanceOf[Long]
    val nullKeys = m("null_keys").asInstanceOf[Long]
    require(rows > 0L, s"quality gate: observed batch is empty ($m)")
    require(nullKeys <= (maxNullFrac * rows).toLong,
      s"quality gate: $nullKeys/$rows null keys exceeds $maxNullFrac ($m)")
    m
  }
}
