package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing registration of the native expressions. */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions expose parse_bytes / log_line_parse / regex_groups to SQL") {
    val base = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      assert(s2.sql("SELECT parse_bytes('1 GiB')").head().getLong(0) == 1073741824L)
      assert(s2.sql("SELECT parse_bytes('nonsense')").head().isNullAt(0))
      val line = "2024.03.01 12:00:01.123456 [ 1 ] {x} <Debug> MemoryTracker: " +
        "Peak memory usage (for query): 2 MiB."
      assert(s2.sql(s"SELECT log_line_parse('$line').kind").head().getInt(0) == 3)
      assert(s2.sql("""SELECT regex_groups('ab12', '([a-z]+)(\\d+)', 2)[1]""")
        .head().getString(0) == "12")
      assert(s2.sql("SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L))")
        .head().getLong(0) == 32L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("optimizer rule: a keyless trailing-window theta join rewrites to a bucketed equi join") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-rule-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 2)
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      import s2.implicits._
      val H = 100L
      val probes = (0 until 400).map(i => (i.toLong, (i * 37 % 1000).toLong))
      val events = (0 until 400).map(i => ((i * 53 % 1000).toLong, i.toLong))
      val p = probes.toDF("pid", "p_t")
      val c = events.toDF("c_t", "cid")
      val joined = p.join(c, $"c_t" >= $"p_t" - H && $"c_t" <= $"p_t")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"the rule must manufacture the equi key:\n${plan.take(1500)}")
      assert(plan.contains("graft_bucket"),
        s"expected the manufactured bucket columns in the join:\n${plan.take(1500)}")
      // values: identical to the quadratic ground truth
      val got = joined.select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, pt) <- probes
        (ct, cid) <- events
        if ct >= pt - H && ct <= pt
      } yield (pid, cid)).toSet
      assert(got == want && want.nonEmpty)
      // output schema untouched (the restoring Project)
      assert(joined.columns.toSeq == Seq("pid", "p_t", "c_t", "cid"))

      // negative 1: an equi-keyed join must NOT be rewritten (bucketing
      // would only add work on top of the existing hash key)
      val equi = p.join(c, $"p_t" === $"c_t" && $"c_t" >= $"p_t" - H)
      assert(!equi.queryExecution.executedPlan.toString.contains("graft_bucket"))

      // negative 2: left outer keeps its semantics (the exploded probe
      // side would emit spurious null rows) — the rule must not fire
      val outer = p.join(c, $"c_t" >= $"p_t" - H && $"c_t" <= $"p_t", "left")
      assert(!outer.queryExecution.executedPlan.toString.contains("graft_bucket"))
      val outerGot = outer.select("pid", "cid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val outerWant = probes.flatMap { case (pid, pt) =>
        val ms = events.filter { case (ct, _) => ct >= pt - H && ct <= pt }
        if (ms.isEmpty) Seq((pid, -1L)) else ms.map { case (_, cid) => (pid, cid) }
      }.toSet
      assert(outerGot == outerWant)

      // negative 3: a non-literal window width cannot bucket
      val dyn = p.join(c, $"c_t" >= $"p_t" - $"pid" && $"c_t" <= $"p_t")
      assert(!dyn.queryExecution.executedPlan.toString.contains("graft_bucket"))

      // positive 2: the two-sided BAND form `|a-b| <= K` rewrites too, and
      // the floor-division buckets stay exact for NEGATIVE values (truncating
      // division under-covers below zero — the crafted ids straddle 0)
      val bp = (-200 until 200).map(i => (i.toLong, (i * 31 % 500 - 250).toLong))
        .toDF("pid", "p_t")
      val bc = (-200 until 200).map(i => ((i * 43 % 500 - 250).toLong, i.toLong))
        .toDF("c_t", "cid")
      val B = 60L
      val band = bp.join(bc, $"c_t" >= $"p_t" - B && $"c_t" <= $"p_t" + B)
      val bandPlan = band.queryExecution.executedPlan.toString
      assert(!bandPlan.contains("BroadcastNestedLoopJoin") && bandPlan.contains("graft_bucket"),
        s"band join must rewrite:\n${bandPlan.take(1200)}")
      val bandGot = band.select("pid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bandWant = (for {
        (pid, pt) <- (-200 until 200).map(i => (i.toLong, (i * 31 % 500 - 250).toLong))
        (ct, cid) <- (-200 until 200).map(i => ((i * 43 % 500 - 250).toLong, i.toLong))
        if ct >= pt - B && ct <= pt + B
      } yield (pid, cid)).toSet
      assert(bandGot == bandWant && bandWant.nonEmpty,
        s"missing: ${(bandWant -- bandGot).take(5)}; extra: ${(bandGot -- bandWant).take(5)}")

      // positive 3: the one-conjunct `abs(a - b) <= K` spelling rewrites to
      // the same symmetric band and matches the quadratic ground truth
      val absBand = bp.join(bc, org.apache.spark.sql.functions.abs($"p_t" - $"c_t") <= B)
      val absPlan = absBand.queryExecution.executedPlan.toString
      assert(!absPlan.contains("BroadcastNestedLoopJoin") && absPlan.contains("graft_bucket"),
        s"abs band join must rewrite:\n${absPlan.take(1200)}")
      val absGot = absBand.select("pid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(absGot == bandWant,
        s"abs missing: ${(bandWant -- absGot).take(5)}; extra: ${(absGot -- bandWant).take(5)}")

      // negative 4: the rule is BATCH-ONLY — a stream-stream join's range
      // condition feeds state-watermark derivation, and the rewrite would
      // silently change cleanup; applied directly to the analyzed streaming
      // plan, the rule must be the identity
      val ms1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)](s2)
      val ms2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)](s2)
      val sj = ms1.toDF().toDF("pid", "p_t")
        .join(ms2.toDF().toDF("c_t", "cid"), $"c_t" >= $"p_t" - H && $"c_t" <= $"p_t")
      val analyzed = sj.queryExecution.analyzed
      assert(analyzed.isStreaming)
      val applied = graft.plans.BucketedIntervalJoinRule(analyzed)
      assert(applied.fastEquals(analyzed),
        "the interval-join rewrite must not fire on streaming plans")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
