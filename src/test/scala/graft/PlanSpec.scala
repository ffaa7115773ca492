package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.functions.col

/** SURVEY §5 plan-shape assertions — the 100 TB posture checks:
  * predicate/column pushdown reaches the parquet scan, global top-k fuses
  * into TakeOrderedAndProject (no global sort), aggregation is two-phase,
  * and broadcast hints exist ONLY on bounded dimension tables
  * (nation/region) — never on fact-scaling tables.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("q_scan_pushdown pushes predicates into the parquet scan") {
    val p = plan("q_scan_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("scans prune columns (q_scan_project reads only 4 columns)") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_discount"), "unreferenced column read: " + p)
  }

  test("q_topk fuses into TakeOrderedAndProject (no global sort)") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("q_agg_q1 aggregates in two phases (partial + final)") {
    val p = plan("q_agg_q1")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("broadcast hints only on bounded dims (nation/region), never customer/orders/lineitem") {
    val factCols = Seq("c_custkey", "o_orderkey", "l_orderkey")
    for (name <- Seq("q_join_5way", "q_agg_rollup", "q_join_inner_broadcast",
      "q_agg_distinct_having", "q_agg_grouping_sets", "q_agg_topk_group")) {
      val analyzed = SparkEntry.queries(name)(spark, TestSpark.sf0001)
        .queryExecution.analyzed
      analyzed.foreach {
        case h: ResolvedHint =>
          val hinted = h.child.toString
          factCols.foreach(c => assert(!hinted.contains(c),
            s"$name: broadcast hint wraps a fact-scaling table ($c): $hinted"))
        case _ =>
      }
    }
  }

  test("q_text_tfidf reranks through WindowGroupLimit (partial top-k before the window exchange)") {
    assert(plan("q_text_tfidf").contains("WindowGroupLimit"))
  }

  test("q_sample_stratified prunes to the referenced columns and keeps one codegen stage pre-sort") {
    val p = plan("q_sample_stratified")
    assert(!p.contains("c_acctbal") && !p.contains("c_name"),
      "sampling must not read unreferenced columns: " + p)
    // the only exchange is the final determinism ORDER BY — the sample
    // itself is scan+filter (the "no shuffle" claim in SURVEY §2.14)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("theta-range and interval joins have an equi bucket key (no pure cartesian)") {
    for (name <- Seq("q_join_theta_range", "q_join_interval")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested-loop join:\n$p")
    }
  }

  /** Queries whose design intentionally broadcasts a bounded probe set and
    * cross-joins it against the candidate stream (constant-size build side).
    * q_agg_approx: the exact-distinct branch joins the sketch branch as a
    * 1-row x 1-row crossJoin (splitting them avoids the Expand x HLL-buffer
    * blowup — see AggOps) — a nested loop over exactly one pair of rows.
    * q_text_tfidf: the broadcast corpus doc count (1 row) crossJoins onto
    * the tf rows — a nested loop whose build side is a single row.
    */
  private val bnljAllowed =
    Set("q_sim_dot_topk", "ml_knn_cosine", "ml_ann_ivf", "ml_ann_join",
      // ml_ann_join_pq: the same designed probe descent as ml_ann_join —
      // probes crossJoin the BROADCAST super-centroid table (ksup ≈
      // sqrt(nlist) rows by construction, never data-sized).
      "ml_ann_join_pq",
      "q_agg_approx", "q_text_tfidf", "q_profile",
      // q_text_unigram_ppl: the 1-row corpus-total crossJoins onto the
      // vocab-sized count table — single-row build side, the tfidf/bm25
      // pattern.
      "q_text_unigram_ppl",
      // exactNtile (pre-r16 shape): the numPartitions-row count table
      // self-joined for its prefix sum and crossJoined its 1-row total —
      // r16 folded both into the single-partition window below, so no
      // BNLJ should remain; kept on the allowlist only because the shape
      // was config-bounded either way. Since r9 q_rfm_segment runs the
      // SAME scalable plan (the global-NTILE-window form is demoted to
      // spec-only rfmNtileReference).
      "q_rfm_segment", "q_rfm_segment_scalable",
      // q_text_bm25: the 1-row corpus stats (n_docs, total) crossJoin onto
      // the per-(doc, term) tf rows — a nested loop whose build side is a
      // single broadcast row.
      "q_text_bm25",
      // ml_pq_knn: the bounded probe set (each probe carrying its KB-sized
      // ADC LUT) broadcast-crossJoins the 16-byte/row compressed stream —
      // the same probe-bounded shape as ml_knn_cosine, at 1/16 the
      // streamed bytes.
      "ml_pq_knn",
      // q_sample_temperature: the 1-row integer normalizer crossJoins the
      // source-cardinality quota rows — a single-broadcast-row nested
      // loop (q_text_tfidf precedent).
      "q_sample_temperature")

  test("q_text_bigrams: two-phase agg, top-20 via TakeOrderedAndProject (no global sort)") {
    val p = plan("q_text_bigrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_text_decontam broadcasts the bounded eval-gram side") {
    assert(plan("q_text_decontam").contains("BroadcastHashJoin"))
  }

  test("q_dedup_keep_best shuffles on the 32-char norm hash, never the text") {
    val p = plan("q_dedup_keep_best")
    assert(p.contains("hashpartitioning(norm_md5"), p)
    // The invariant is "text never shuffles": every exchange must be the
    // norm-hash window partition or the final range ORDER BY — an upper
    // bound, not an exact count, so a semantics-preserving planner change
    // (reuse node, AQE shift, Spark upgrade) can't fail it spuriously.
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("hashpartitioning(text"), "text column shuffled: " + p)
  }

  test("q_shard_pack: one hash exchange (source window) + the determinism sort only") {
    val p = plan("q_shard_pack")
    assert(p.contains("hashpartitioning(source"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("hashpartitioning(text"), "text column shuffled: " + p)
  }

  test("q_dedup_cross_source tokenizes the corpus ONCE (no self-join double scan)") {
    val p = plan("q_dedup_cross_source")
    // The self-join formulation scans+tokenizes documents twice (the
    // planner does not reuse the identical subtrees); the grouped
    // source-set shape must keep a single parquet scan.
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q_upsert_latest prunes to rank-1 BEFORE the key shuffle (WindowGroupLimit)") {
    val p = plan("q_upsert_latest")
    // Partial WindowGroupLimit + final: the exchange carries at most one
    // candidate row per (key, input partition), not every version.
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("q_subq_double_exists decorrelates to semi + anti joins (no per-row rescan)") {
    val p = plan("q_subq_double_exists")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // The returnflag predicate must reach the scans, not sit above a join.
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q_subq_having_corr decorrelates both HAVING scalars (semi join into supplier, all aggs two-phase)") {
    val p = plan("q_subq_having_corr")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_join_q7: both nation roles broadcast; the fact side shuffles only for the final agg") {
    val p = plan("q_join_q7")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    // One hash shuffle (the agg) + one range shuffle (the determinism
    // sort) — upper bounds (the q_dedup_keep_best lesson), not exact
    // counts; BroadcastExchange deliberately not counted.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("q_rfm_segment_scalable: no global (empty-partition) window over data-sized input") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val qe = SparkEntry.queries("q_rfm_segment_scalable")(spark, TestSpark.sf0001)
      .queryExecution
    qe.optimizedPlan.foreach {
      case w: LWindow if w.partitionSpec.isEmpty =>
        // The ONE allowed empty-partition window is exactNtile's r16
        // prefix-sum over the per-range-partition COUNT table: its input
        // must be the numPartitions-row aggregate grouped on the
        // spark_partition_id column (config-bounded, never data-sized).
        val boundedInput = w.child.collectFirst {
          case a: Aggregate
            if a.groupingExpressions.size == 1 &&
              a.groupingExpressions.head.references.toSeq
                .exists(_.name == "_pid") => a
        }.isDefined
        assert(boundedInput,
          s"data-sized single-partition global window in the scalable RFM plan: $w")
      case _ =>
    }
    // The parallel sort is there: each metric's rank rides a RANGE exchange.
    assert("Exchange rangepartitioning".r
      .findAllIn(qe.executedPlan.toString).size >= 3, qe.executedPlan.toString)
  }

  test("q_having_corr_grouped: ONE lineitem aggregation (vs three in the subquery form), windows per-part only") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("q_having_corr_grouped")(spark, TestSpark.sf0001)
      .queryExecution
    qe.optimizedPlan.foreach {
      case w: LWindow => assert(w.partitionSpec.nonEmpty, s"global window: $w")
      case _ =>
    }
    // One grouped aggregate over lineitem = exactly one two-phase pair of
    // HashAggregates mentioning l_partkey (the subquery form has three).
    val p = qe.executedPlan.toString
    val lineitemScans = "Scan parquet".r.findAllIn(p).size
    assert(lineitemScans <= 2, s"expected supplier + ONE lineitem scan, got $lineitemScans:\n$p")
  }

  test("q_agg_multi_distinct: Expand-based multi-distinct rewrite, all aggregation two-phase") {
    val p = plan("q_agg_multi_distinct")
    assert(p.contains("Expand"), s"expected the multi-distinct Expand rewrite:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("q_join_q19: OR-of-ANDs join factors out the common equi-key (hash join, bands pushed to BOTH scans)") {
    val p = plan("q_join_q19")
    // Catalyst must extract p_partkey = l_partkey from the disjunction —
    // a failure here degenerates to BNLJ/cartesian over the fact table.
    assert(p.contains("HashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // Each side's per-disjunct band union is pushed into its parquet scan.
    assert("PushedFilters: \\[[^\\]]*Or\\(".r.findAllIn(p).size >= 2,
      s"OR bands not pushed to both scans:\n$p")
  }

  test("q_join_q3: date predicates reach both fact scans; top-10 fuses into TakeOrderedAndProject") {
    val p = plan("q_join_q3")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("q_join_q13: ON-clause predicate keeps the join LEFT OUTER (not silently inner)") {
    val p = plan("q_join_q13")
    assert(p.contains("LeftOuter"), p)
    // distribution-of-counts: both aggregates two-phase.
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("q_subq_q15: shipdate filter pushed; the MAX over the CTE is a one-row scalar subquery") {
    val p = plan("q_subq_q15")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("Subquery"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_text_chunk: no token explode — sequence+slice over the split array, ONE exchange (the final sort)") {
    val p = plan("q_text_chunk")
    assert(p.contains("Generate"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q_agg_q6: date range + quantity cap pushed into the lineitem scan") {
    // toString truncates the PushedFilters list — use formatted explain.
    val p = SparkEntry.queries("q_agg_q6")(spark, TestSpark.sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"), p)
    assert(p.contains("LessThan(l_quantity,24"), p)
  }

  test("q_join_q10: LIMIT over the aggregate fuses into TakeOrderedAndProject") {
    val p = plan("q_join_q10")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "aggregation must be two-phase: " + p)
  }

  test("q_subq_q21: EXISTS/NOT EXISTS decorrelate to semi + anti hash joins on the orderkey") {
    val p = plan("q_subq_q21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_subq_q2: twice-consumed derived partsupp decorrelates (scalar MAX becomes an agg-join, no rescan loop)") {
    val p = plan("q_subq_q2")
    assert(!p.contains("CartesianProduct"), p)
    // The correlated MAX survives as a grouped aggregate joined on l_partkey.
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_graph_triangles: wedge and closing joins are all equi joins (degree orientation, no BNL)") {
    val tri = operators.Triangles.partEdges(spark, TestSpark.sf0001)
    val p = operators.Triangles.closedWedges(tri).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_join_null_safe: EqualNullSafe keeps a hash join (null-safe equality is hashable, no BNL)") {
    val p = plan("q_join_null_safe")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), p)
  }

  test("q_cdc_scd2: both windows share ONE key exchange (filter preserves partitioning+sort)") {
    val p = plan("q_cdc_scd2")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange (user_id, shared by lag and lead windows), got $hashExchanges:\n$p")
  }

  test("q_er_fuzzy_parts: blocked match is a hash/broadcast equi join, never all-pairs") {
    val p = plan("q_er_fuzzy_parts")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), p)
  }

  test("q_rec_date_spine: recursive CTE plans as UnionLoop; orders scan prunes to date+price") {
    val p = plan("q_rec_date_spine")
    assert(p.contains("UnionLoop"), p)
    // The only data-sized work is the month aggregate of orders — its scan
    // must prune to the two referenced columns.
    assert(!p.contains("o_custkey") && !p.contains("o_orderstatus"),
      "unreferenced orders column read: " + p)
  }

  test("q_fn_variant: VARIANT extract stays map-only into a two-phase aggregate") {
    val p = plan("q_fn_variant")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // One parse per row, typed gets after — no join, no second events scan.
    assert(!p.contains("Join"), p)
  }

  test("q_text_unigram_ppl: corpus tokenized ONCE at runtime (AQE reuses the tf and cnts exchanges)") {
    // The logical plan references the tf subtree three times (doc join,
    // word counts, corpus total); physical dedup happens at execution via
    // AQE exchange reuse — so the gate runs the query and inspects the
    // FINAL adaptive plan (the leading section of toString; the trailing
    // "Initial Plan" echo still shows the un-deduped tree).
    val df = SparkEntry.queries("q_text_unigram_ppl")(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert("Generate explode".r.findAllIn(p).size == 1,
      "expected a single tokenize pass in the executed plan:\n" + p)
    assert("ReusedExchange".r.findAllIn(p).size == 2,
      "expected the tf and cnts exchanges to be reused:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("join strategy hints steer the planner: BROADCAST / MERGE / SHUFFLE_HASH each picked on demand") {
    // The planner-control levers a tuning pass reaches for when stats
    // mislead AQE at 100 TB: the same customer⋈orders equi-join planned
    // three ways purely via hints. (No hint on fact-fact joins in the
    // registry itself — the broadcast-hint audit above polices that; this
    // gate just proves the levers work in this build.)
    val c = Tables.customer(spark, TestSpark.sf0001).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, TestSpark.sf0001).select(col("o_orderkey"), col("o_custkey"))
    def planOf(hint: String): String =
      o.join(c.hint(hint), col("o_custkey") === col("c_custkey"))
        .queryExecution.executedPlan.toString
    assert(planOf("broadcast").contains("BroadcastHashJoin"), planOf("broadcast"))
    assert(planOf("merge").contains("SortMergeJoin"), planOf("merge"))
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"), planOf("shuffle_hash"))
  }

  /** Queries whose plan legitimately contains a window with an EMPTY
    * partition spec — every entry must be over provably bounded input
    * (config-sized counts, calendar spines, sorted-sample quantile rows),
    * never data-sized rows; the comment is the proof obligation for
    * adding one.
    */
  private val globalWindowAllowed = Set(
    // exactNtile's prefix-sum over the numPartitions-row per-partition
    // count table (config-bounded, ~32 rows) — the very mechanism that
    // REMOVES the data-sized global window from the NTILE twin.
    "q_rfm_segment", "q_rfm_segment_scalable",
    // date spine: a row_number over the calendar-bounded recursive spine
    // (hundreds of month rows, corpus-size-independent).
    "q_rec_date_spine")

  test("whole-registry sweep: no cartesians; BNLJ and global windows only where designed") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val qe = fn(spark, TestSpark.sf0001).queryExecution
      val p = qe.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!bnljAllowed(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected nested-loop join")
      // A window with no PARTITION BY serializes its whole input through
      // one reducer — the single-executor bottleneck at 100 TB. Gate it
      // registry-wide so a future operator can't regress silently.
      if (!globalWindowAllowed(name))
        qe.optimizedPlan.foreach {
          case w: LWindow if w.partitionSpec.isEmpty =>
            fail(s"$name plans a global single-partition window: " +
              w.windowExpressions.mkString(", "))
          case _ =>
        }
    }
  }
}
