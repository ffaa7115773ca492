package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterated min-label propagation with
  * pointer jumping — the piece that turns one-hop dedup ASSIGNMENTS into
  * transitive dedup CLUSTERS (a chain A~B~C where A≁C must still collapse
  * to one canonical id).
  *
  * Each pass is two bounded steps, both plain shuffled joins/aggregations:
  *   1. edge propagation: label(x) <- min(label(x), min over neighbors of
  *      label(n)) — the step that actually merges components (a min-parent
  *      FOREST alone under-merges: with edges 1-3, 2-4, 3-4 node 4 keeps
  *      parent 2 and the {1,3} / {2,4} trees never join).
  *   2. pointer jumping: label(x) <- label(label(x)) — halves the remaining
  *      chain depth, so convergence is O(log diameter) passes, not
  *      O(diameter).
  *
  * Iteration is driver-CONTROLLED but not driver-COMPUTED: the only action
  * per pass is the changed-row count for early exit (the same shape as an
  * MLlib iteration), and each pass's labels are persisted so lineage stays
  * bounded. maxPasses bounds worst-case work; 5 passes cover any component
  * whose min-label tree is < 2^5 hops deep after propagation — beyond any
  * real dedup graph. If the bound is ever hit un-converged the labels are
  * still a valid PARTIAL merge (every label is some component member's id,
  * monotonically improved from the one-hop artifact).
  */
object Components {

  /** (id, label) per node, label = min node id reachable in the undirected
    * edge graph (within the pass bound). `nodes` must have `idCol`; `edges`
    * must have a_id/b_id (any orientation, self-loops and duplicates fine).
    *
    * `checkpointDir`: None (default) = localCheckpoint — fastest, executor
    * loss loses partitions; right for short local/interactive runs. Some(dir)
    * = RELIABLE checkpoint() to that directory (HDFS/object store on a
    * cluster) at the same three truncation sites — the mode a multi-hour
    * 100 TB dedup job runs in, where recomputing a lost lineage-truncated
    * partition is impossible and a re-run from pass 0 unacceptable.
    *
    * `initLabels`: restart seed for DRIVER-death recovery (reliable
    * checkpoints cover executor loss within a run; they are not readable
    * across drivers through any public API). A long job persists `labels`
    * to parquet after each pass; on restart, pass the last committed
    * labels frame here and propagation continues from that state instead
    * of pass 0. Sound because min-label propagation is monotone and
    * order-free: any frame where each label is a reachable node's id and
    * label <= id (true of every pass's output, converged or not) converges
    * to the same fixpoint as a fresh run — asserted in MinHashSpec.
    */
  def minLabel(nodes: DataFrame, edges: DataFrame, idCol: String,
               maxPasses: Int = 5,
               checkpointDir: Option[String] = None,
               initLabels: Option[DataFrame] = None): DataFrame = {
    // Checkpoint (eager), NOT persist: an iterative loop over persisted
    // frames caches the DATA but the logical plan still nests one level per
    // pass, and Catalyst re-analyzes the ever-growing plan each iteration —
    // measured pass times of 1.8 s / 3.8 s / 13.2 s at sf0.001 (500 docs).
    // Truncating lineage per pass (the same reason MLlib checkpoints its
    // iterations) makes every pass plan O(1): edges + two small joins.
    // Checkpointing the edges also strips the entire upstream pipeline
    // (banding + window + verify joins) from the per-pass plans.
    checkpointDir.foreach(nodes.sparkSession.sparkContext.setCheckpointDir)
    def cp(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val sym = cp(edges.select(col("a_id"), col("b_id"))
      .union(edges.select(col("b_id").as("a_id"), col("a_id").as("b_id"))))
    var labels = cp(initLabels.map(_.select(col("id"), col("label")))
      .getOrElse(nodes.select(col(idCol).as("id"), col(idCol).as("label"))))
    // One propagate+jump round as a plain plan transform (no action).
    def round(l: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(l.select(col("id").as("b_id"), col("label").as("b_lab")), Seq("b_id"))
        .groupBy(col("a_id")).agg(min(col("b_lab")).as("nmin"))
        .select(col("a_id").as("id"), col("nmin"))
      val prop = l.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // Pointer jump. Every label is a node id (labels start as ids and only
      // min over ids), so the lookup always resolves; left_outer + coalesce
      // is belt-and-braces, not a semantic choice.
      val mapping = prop.select(col("id").as("l_id"), col("label").as("l_lab"))
      prop.as("p")
        .join(mapping, col("p.label") === col("l_id"), "left_outer")
        .select(col("p.id").as("id"),
          coalesce(col("l_lab"), col("p.label")).as("label"))
    }
    var pass = 0
    var converged = false
    while (pass < maxPasses && !converged) {
      // TWO rounds composed into one checkpointed job (the plan is still
      // O(1) — two copies of the round subtree over checkpointed inputs),
      // and the previous label rides along so the convergence count below
      // is a filter over the just-materialized cache, not a join job.
      // Locally this measures neutral (the edge pipeline dominates); the
      // point is the halved job/barrier count on a real cluster, where
      // every job pays scheduling + stage-commit latency.
      val rounds = math.min(2, maxPasses - pass)
      val stepped = if (rounds == 2) round(round(labels)) else round(labels)
      val next = cp(stepped
        .join(labels.select(col("id"), col("label").as("prev")), Seq("id")))
      val changed = next.filter(col("label") =!= col("prev")).count()
      labels = next.select(col("id"), col("label"))
      converged = changed == 0
      pass += rounds
    }
    labels
  }
}
