package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.4 q_agg_approx error-bound gate (no DuckDB oracle: HLL and
  * quantile-sketch algorithms are engine-specific by design).
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // one aggregation job, both tests read fields of the same single row
  private lazy val row = SparkEntry.queries("q_agg_approx")(spark, TestSpark.sf001).head()

  test("approx_count_distinct within 2% of exact (rsd=0.01)") {
    val r = row
    val approx = r.getLong(r.fieldIndex("approx_parts"))
    val exact = r.getLong(r.fieldIndex("exact_parts"))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.02, s"HLL error $err (approx=$approx exact=$exact)")
  }

  test("q_profile_approx: every NDV within 2% of exact q_profile; single-scan plan, no Expand") {
    val approx = SparkEntry.queries("q_profile_approx")(spark, TestSpark.sf001)
    val exact = SparkEntry.queries("q_profile")(spark, TestSpark.sf001)
    val a = approx.collect().map(r => r.getString(0) -> r).toMap
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    assert(a.keySet == e.keySet)
    e.foreach { case (col, er) =>
      val ar = a(col)
      // non-NDV stats (counts, min/max strings) must be EXACTLY equal
      assert(ar.getLong(ar.fieldIndex("n_nonnull")) == er.getLong(er.fieldIndex("n_nonnull")))
      assert(ar.getString(ar.fieldIndex("min_s")) == er.getString(er.fieldIndex("min_s")))
      assert(ar.getString(ar.fieldIndex("max_s")) == er.getString(er.fieldIndex("max_s")))
      val ad = ar.getLong(ar.fieldIndex("n_distinct"))
      val ed = er.getLong(er.fieldIndex("n_distinct"))
      val err = math.abs(ad - ed).toDouble / ed
      assert(err <= 0.02, s"$col: HLL NDV error $err (approx=$ad exact=$ed)")
    }
    // the point of the variant: one aggregate, no Expand, no distinct shuffle
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "q_profile_approx must not plan an Expand")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "q_profile_approx must be a single aggregate, not stacked crossJoins")
  }

  test("q_agg_hll_merge: merged partials track the single global sketch within estimator resolution; both within 5% of exact") {
    val rows = SparkEntry.queries("q_agg_hll_merge")(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val merged = r.getLong(r.fieldIndex("merged_est"))
      val global = r.getLong(r.fieldIndex("global_est"))
      val exact = r.getLong(r.fieldIndex("exact_d"))
      // NOT asserted bit-equal, deliberately: register-wise max is
      // lossless only once both sides are dense HLL. At this corpus's
      // cardinality the union gadget promotes the monthly coupon-mode
      // partials to dense while the directly-built sketch stays in its
      // exact coupon mode — so the merged side carries full estimator
      // noise and the direct side almost none (measured drifts 0.2% and
      // 1.3% across groups). The bound that IS sound for persisted
      // per-batch sketches at any merge-tree shape: agreement within
      // ~2 sigma of lgK=12's RSE (1.04/sqrt(4096) = 1.63%/sigma).
      val drift = math.abs(merged - global).toDouble / math.max(global, 1L)
      assert(drift <= 0.033, s"${r.getString(0)}: merged $merged vs global $global drift $drift")
      val err = math.abs(merged - exact).toDouble / exact
      assert(err <= 0.05, s"${r.getString(0)}: HLL error $err (est=$merged exact=$exact)")
    }
  }

  test("q_agg_hll_intersect: inclusion-exclusion overlap tracks the exact intersection; identity holds") {
    val r = SparkEntry.queries("q_agg_hll_intersect")(spark, TestSpark.sf001).head()
    val estA = r.getLong(r.fieldIndex("est_click"))
    val estB = r.getLong(r.fieldIndex("est_purchase"))
    val estU = r.getLong(r.fieldIndex("est_union"))
    val estI = r.getLong(r.fieldIndex("est_intersect"))
    // The output column IS the inclusion-exclusion of the other three —
    // pinned so a refactor cannot silently decouple them.
    assert(estI == estA + estB - estU, s"identity broke: $estA + $estB - $estU != $estI")
    import spark.implicits._
    val byType = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(count_distinct(col("event_type")).as("nt"))
    val exactI = byType.filter(col("nt") === 2).count()
    // Differencing three lgK=12 estimates: each carries ~1.63%/sigma RSE,
    // and the error on the DIFFERENCE is relative to |A∪B|, not |A∩B| —
    // at this corpus's ~85% overlap that still bounds well under 10%.
    val err = math.abs(estI - exactI).toDouble / math.max(exactI, 1L)
    assert(err <= 0.10, s"overlap error $err (est=$estI exact=$exactI)")
  }

  test("percentile_approx(0.5) is between the exact p40 and p60") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val r = row
    val approxP50 = r.getDouble(r.fieldIndex("approx_p50"))
    val Array(p40, p60) =
      li.stat.approxQuantile("l_extendedprice", Array(0.4, 0.6), 0.0)
    assert(approxP50 >= p40 && approxP50 <= p60,
      s"approx p50 $approxP50 outside exact [$p40, $p60]")
  }

  test("count-min union: per-day partials merge BITWISE to the single global sketch") {
    import graft.functions.CmsSketch
    val ev = Tables.events(spark, TestSpark.sf001)
    val build = "count_min_sketch(user_id, 0.01d, 0.99d, 42)"
    val unioned = ev
      .groupBy(to_date(col("ts")).as("day")).agg(expr(build).as("sk"))
      .agg(CmsSketch.cmsUnion(col("sk"))).head().getAs[Array[Byte]](0)
    val global = ev.agg(expr(build)).head().getAs[Array[Byte]](0)
    // Counters are additive and geometry/seed identical, so the union is
    // not merely close — it is the SAME sketch, byte for byte.
    assert(java.util.Arrays.equals(unioned, global),
      s"union of partials diverges from the global sketch (${unioned.length} vs ${global.length} bytes)")
  }

  test("count-min estimates: never undercount any user; overestimate bounded by eps*N") {
    import graft.functions.CmsSketch
    val ev = Tables.events(spark, TestSpark.sf001)
    val sk = CmsSketch.fromBytes(
      ev.agg(expr("count_min_sketch(user_id, 0.01d, 0.99d, 42)")).head().getAs[Array[Byte]](0))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = exact.map(_._2).sum
    exact.foreach { case (u, x) =>
      val est = sk.estimateCount(u)
      assert(est >= x, s"CMS undercounts user $u: $est < $x — structurally impossible")
      assert(est - x <= (0.01 * n).toLong,
        s"user $u overestimate ${est - x} exceeds eps*N = ${(0.01 * n).toLong}")
    }
  }
}
