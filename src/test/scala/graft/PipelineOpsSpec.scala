package graft

import java.nio.charset.StandardCharsets
import java.time.ZoneOffset
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent plain-Scala recomputation of the round-5 pipeline queries
  * (keep-best dedup, shard packing, mixture sampling, bigrams,
  * decontamination, retention) on sf0.001 — the same double-entry
  * bookkeeping GoldenSpec does for helpers, applied to whole queries: the
  * expected values below share NO code with the DataFrame implementations.
  * (The DuckDB oracle is the driver's gate; this one runs in sbt.)
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def norm(text: String): String =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim

  /** (doc_id, text, lang, source, n_chars) rows collected once. */
  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    Tables.documents(spark, d)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("q_dedup_keep_best: kept doc is (max n_chars, min doc_id) per norm group") {
    val expected = docs.groupBy { case (_, text, _, _, _) => md5hex(norm(text)) }
      .map { case (h, grp) =>
        val best = grp.minBy { case (id, _, _, _, nc) => (-nc, id) }
        (h, best._1, best._5, grp.size.toLong)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_dedup_keep_best")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q_shard_pack: shard id = pre-doc running tokens div 800, per source in doc_id order") {
    val expected = docs.groupBy(_._4).flatMap { case (src, grp) =>
      var cum = 0L
      grp.sortBy(_._1).map { case (id, text, _, _, _) =>
        val n = text.split(" ", -1).length.toLong
        val shard = cum / 800
        cum += n
        (id, src, n, shard)
      }
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_shard_pack")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q_sample_mixture: exactly the 60 smallest (md5(text), doc_id) per language") {
    val expected = docs.groupBy(_._3).toSeq.flatMap { case (lang, grp) =>
      grp.map { case (id, text, _, _, _) => (md5hex(text), id) }
        .sorted.take(60).zipWithIndex
        .map { case ((_, id), i) => (lang, i + 1L, id) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_sample_mixture")(spark, d)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0))).toSeq
    assert(got == expected)
  }

  test("q_text_bigrams: top-20 adjacent pairs by (count desc, bigram asc)") {
    val counts = docs.flatMap { case (_, text, _, _, _) =>
      text.split(" ", -1).toSeq.sliding(2).collect { case Seq(a, b) => s"$a $b" }
    }.groupBy(identity).map { case (bg, occ) => (bg, occ.size.toLong) }
    val expected = counts.toSeq.sortBy { case (bg, n) => (-n, bg) }.take(20)
    val got = SparkEntry.queries("q_text_bigrams")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q_text_decontam: training docs sharing any distinct 5-gram with eval set") {
    def grams(text: String): Set[String] =
      text.split(" ", -1).toSeq.sliding(5).collect {
        case s if s.size == 5 => s.mkString(" ")
      }.toSet
    val evalGrams = docs.filter(_._1 < 100).flatMap(t => grams(t._2)).toSet
    val expected = docs.filter(_._1 >= 100).map { case (id, text, _, _, _) =>
      (id, grams(text).count(evalGrams.contains).toLong)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = SparkEntry.queries("q_text_decontam")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "corpus has heavy near-duplication; decontam must fire")
  }

  test("q_text_dup_ngrams: cross-doc duplicate 5-gram share, plain-Scala recompute") {
    def grams(text: String): Set[String] =
      text.split(" ", -1).toSeq.sliding(5).collect {
        case s if s.size == 5 => s.mkString(" ")
      }.toSet
    val perDoc = docs.map { case (id, text, _, _, _) => (id, grams(text)) }
      .filter(_._2.nonEmpty)
    val dfreq = perDoc.flatMap(_._2).groupBy(identity)
      .map { case (g, occ) => (g, occ.size) }
    val expected = perDoc.map { case (id, gs) =>
      val n = gs.size.toLong
      val dup = gs.count(g => dfreq(g) >= 2).toLong
      (id, n, dup, dup * 1000 / n)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_text_dup_ngrams")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 0),
      "corpus has exact dups; the cross-doc dup-ngram signal must fire")
  }

  test("q_text_dedup_spans: span removal matches a plain-Scala recompute; dup spans genuinely removed") {
    // Reference: positions covered by a 5-gram occurring in >= 2 DISTINCT
    // docs are dropped everywhere; survivors rejoin in order.
    val tokSeqs = docs.map { case (id, text, _, _, _) => (id, text.split(" ", -1).toSeq) }
    val startGrams = tokSeqs.map { case (id, toks) =>
      (id, toks.sliding(5).zipWithIndex.collect {
        case (s, i) if s.size == 5 => (i, s.mkString(" "))
      }.toSeq)
    }
    val docFreq = startGrams
      .flatMap { case (id, gs) => gs.map { case (_, g) => (g, id) } }
      .distinct.groupBy(_._1).map { case (g, occ) => (g, occ.size) }
    val expected = tokSeqs.map { case (id, toks) =>
      val covered = startGrams.find(_._1 == id).get._2
        .collect { case (i, g) if docFreq(g) >= 2 => i to (i + 4) }
        .flatten.toSet
      val kept = toks.zipWithIndex.collect { case (t, p) if !covered(p) => t }
      (id, toks.size.toLong, kept.size.toLong,
        (toks.size - kept.size).toLong, kept.mkString(" "))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_text_dedup_spans")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got == expected)
    assert(expected.exists(_._4 > 0), "corpus has cross-doc dup 5-grams; removal must fire")
    assert(expected.forall { case (_, n, k, r, text) =>
      k + r == n && (k == 0 || text.split(" ", -1).length.toLong == k)
    }, "kept + removed must partition the doc; text_clean must carry exactly the kept tokens")
  }

  test("q_text_rarity: mean corpus token frequency per doc, plain-Scala recompute") {
    val all = docs.flatMap { case (id, text, _, _, _) =>
      text.split(" ", -1).toSeq.map(t => (id, t)) }
    val cf = all.groupBy(_._2).map { case (t, occ) => (t, occ.size.toLong) }
    val expected = all.groupBy(_._1).map { case (id, toks) =>
      val n = toks.size.toLong
      val s = toks.map(t => cf(t._2)).sum
      (id, n, s, s / n)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_text_rarity")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q_text_vocab_stats: per-lang vocab/hapax/ttr, plain-Scala recompute") {
    val expected = docs.groupBy(_._3).map { case (lang, grp) =>
      val toks = grp.flatMap(t => t._2.split(" ", -1).toSeq)
      val counts = toks.groupBy(identity).map { case (_, occ) => occ.size.toLong }
      val vocab = counts.size.toLong
      val hapax = counts.count(_ == 1L)
      val n = toks.size.toLong
      (lang, vocab, hapax.toLong, n, vocab * 1000 / n)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_text_vocab_stats")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q_pipeline_curate ≡ its standalone stages (set algebra over the registered queries)") {
    val spark2 = spark
    import org.apache.spark.sql.functions.col
    def ids(name: String, pick: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      pick(SparkEntry.queries(name)(spark2, TestSpark.sf0001))
        .collect().map(_.getLong(0)).toSet
    val curated = ids("q_pipeline_curate", _.select(col("doc_id")))
    val gopherKeep = ids("q_text_gopher", _.filter(col("keep")).select(col("doc_id")))
    val keptBest = ids("q_dedup_keep_best", _.select(col("doc_id")))
    val contaminated = ids("q_text_decontam", _.select(col("doc_id")))
    // Every curated doc passed the quality gate, is a training doc, and is
    // not contaminated.
    assert(curated.subsetOf(gopherKeep), (curated -- gopherKeep).take(5).toString)
    assert(curated.forall(_ >= 100L))
    assert((curated & contaminated).isEmpty, (curated & contaminated).take(5).toString)
    // Keep-best note: the composite dedups AMONG quality survivors, so its
    // group winners can differ from the all-docs q_dedup_keep_best when a
    // group's best doc failed the quality gate. The direct property: for
    // each curated doc whose norm-dup group's STANDALONE winner passed the
    // gopher gate, the curated doc must BE that standalone winner (same
    // ordering rule over the same surviving candidates ⇒ same pick).
    val groupOf = docs.map { case (id, text, _, _, _) => id -> md5hex(norm(text)) }.toMap
    val winnerOf = docs.groupBy { case (id, text, _, _, _) => md5hex(norm(text)) }
      .map { case (h, grp) => h -> grp.minBy { case (id, _, _, _, nc) => (-nc, id) }._1 }
    assert(winnerOf.values.toSet == keptBest) // cross-check the recompute
    val mismatched = curated.filter { id =>
      val w = winnerOf(groupOf(id)); gopherKeep.contains(w) && id != w
    }
    assert(mismatched.isEmpty,
      s"curated docs that lost to a gate-surviving standalone winner: ${mismatched.take(5)}")
    // and the property is non-vacuous: some curated doc's group winner
    // really did pass the gate (so the branch above was exercised).
    assert(curated.exists(id => gopherKeep.contains(winnerOf(groupOf(id)))))
    // And the pipeline genuinely filtered: strictly fewer docs than the
    // training slice of the corpus.
    val trainTotal = Tables.documents(spark2, TestSpark.sf0001)
      .filter(col("doc_id") >= 100).count()
    assert(curated.nonEmpty && curated.size < trainTotal)
  }

  test("q_events_retention: distinct (cohort, offset) user counts from first signup") {
    val ev = Tables.events(spark, d).select("user_id", "ts").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.atZone(ZoneOffset.UTC).toLocalDate))
    val types = Tables.events(spark, d).select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.atZone(ZoneOffset.UTC).toLocalDate,
        r.getString(2)))
    val cohort = types.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, rows) => (u, rows.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))) }
    val expected = ev.toSeq.distinct
      .flatMap { case (u, day) => cohort.get(u).map(cd => (u, cd, day)) }
      .filter { case (_, cd, day) => !day.isBefore(cd) }
      .map { case (_, cd, day) => (cd.toString, day.toEpochDay - cd.toEpochDay) }
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_events_retention")(spark, d)
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_users"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q_text_gopher: keep/drop matches a plain-Scala recomputation of all three rules") {
    val stops = graft.functions.TextAnalysis.EnStopwords.toSet
    val expected = docs.map { case (id, text, _, _, _) =>
      val toks = text.split(" ", -1)
      val n = toks.length.toLong
      val maxTf = toks.groupBy(identity).values.map(_.length).max.toLong
      val nStop = toks.count(stops).toLong
      val rep = maxTf * 1000 / n
      val stop = nStop * 1000 / n
      (id, n, rep, stop, n >= 20 && rep <= 150 && stop >= 30)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_text_gopher")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == expected)
    assert(got.exists(_._5) && got.exists(!_._5),
      "thresholds must split the corpus into both keep and drop")
  }

  test("q_rfm_segment: quintile scores match a plain-Scala recomputation") {
    val rows = Tables.orders(spark, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).cast("string"),
        Tables.cents(col("o_totalprice")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val agg = rows.groupBy(_._1).map { case (c, rs) =>
      (c, rs.map(_._2).max, rs.size.toLong, rs.map(_._3).sum)
    }.toSeq
    def ntile5[K: Ordering](xs: Seq[(Long, K)]): Map[Long, Long] = {
      // SQL NTILE(5): first (n mod 5) tiles get ceil(n/5) rows, rest floor.
      val sorted = xs.sortBy(x => (x._2, x._1)).map(_._1)
      val n = sorted.size; val q = n / 5; val r = n % 5
      sorted.zipWithIndex.map { case (c, i) =>
        val big = (q + 1) * r
        val tile = if (i < big) i / (q + 1) else r + (i - big) / q
        c -> (tile + 1).toLong
      }.toMap
    }
    val rS = ntile5(agg.map(a => a._1 -> a._2))
    val fS = ntile5(agg.map(a => a._1 -> a._3))
    val mS = ntile5(agg.map(a => a._1 -> a._4))
    val expected = agg.map(a => (a._1, a._2, a._3, a._4, rS(a._1), fS(a._1), mS(a._1)))
      .sortBy(_._1)
    val got = SparkEntry.queries("q_rfm_segment")(spark, d)
      .select(col("o_custkey"), col("last_od").cast("string"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("q_rfm_segment_scalable ≡ NTILE-window reference: the range-partitioned rank form is row-identical") {
    // The global-NTILE-window form is demoted out of the registry (it is a
    // single-partition global sort); it survives here as the oracle-identity
    // anchor proving the exact-NTILE reconstruction bit-exact.
    val cols = Seq("o_custkey", "last_od", "frequency", "monetary_cents",
      "r_score", "f_score", "m_score")
    val ntileForm = operators.WinOps.rfmNtileReference(spark, d)
      .selectExpr(cols: _*).collect().map(_.toSeq).toSeq
    val scalableForm = SparkEntry.queries("q_rfm_segment_scalable")(spark, d)
      .selectExpr(cols: _*).collect().map(_.toSeq).toSeq
    assert(scalableForm == ntileForm,
      s"forms diverge: ntile=${ntileForm.size} rows scalable=${scalableForm.size} rows")
  }

  test("q_having_corr_grouped ≡ q_subq_having_corr: the grouped+window rewrite is row-identical to the subquery form") {
    val subqForm = SparkEntry.queries("q_subq_having_corr")(spark, d)
      .collect().map(_.toSeq).toSeq
    val groupedForm = SparkEntry.queries("q_having_corr_grouped")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(groupedForm == subqForm,
      s"forms diverge: subq=${subqForm.size} rows grouped=${groupedForm.size} rows")
  }

  /** (user_id, epoch-day) pairs collected once for the events recomputes. */
  private lazy val userDays: Seq[(Long, Long)] =
    Tables.events(spark, d)
      .select(col("user_id"), datediff(to_date(col("ts")),
        to_date(lit("1970-01-01"))).cast("long").as("dayno"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q_events_streaks: longest run / active days / streak count per user") {
    val expected = userDays.distinct.groupBy(_._1).map { case (u, pairs) =>
      val days = pairs.map(_._2).sorted
      var lens = List.empty[Long]
      var runLen = 0L
      var prev = Long.MinValue
      for (day <- days) {
        if (day == prev + 1) runLen += 1
        else { if (runLen > 0) lens ::= runLen; runLen = 1 }
        prev = day
      }
      if (runLen > 0) lens ::= runLen
      (u, lens.max, days.size.toLong, lens.size.toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_events_streaks")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q_events_spike: flag = n*trail_d*2 > trail_n*5 over the previous 7 daynos") {
    val counts = userDays.groupBy(identity).map { case ((u, day), occ) =>
      ((u, day), occ.size.toLong) }
    val expected = counts.toSeq.map { case ((u, day), n) =>
      val trail = counts.collect {
        case ((u2, d2), n2) if u2 == u && d2 >= day - 7 && d2 <= day - 1 => n2 }
      val trailN = trail.sum
      val trailD = trail.size.toLong
      (u, day, n, trailN, trailD, trailD > 0 && n * trailD * 2 > trailN * 5)
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_events_spike")(spark, d)
      .select(col("user_id"),
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"),
        col("n"), col("trail_n"), col("trail_d"), col("spike"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
  }

  test("q_join_skew_salted: identical to the plain (unsalted) join aggregate") {
    val plain = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.cents(col("c_acctbal"))).as("sum_bal_cents"))
      .orderBy(col("c_mktsegment").asc)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = SparkEntry.queries("q_join_skew_salted")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == plain)
  }
}
