package graft

import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Error bounds for the deterministic sketch aggregates (the agg_approx
  * registry row is ALSO oracle-checked hash-exact — these specs bound the
  * estimates against the exact twin, which the oracle cannot do). */
class ApproxAggSpec extends SparkSpec {

  test("KMV distinct within its k=64 error envelope; sampled quantiles sane; cnt exact") {
    val approx = RelationalQueries.approxAgg(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r).toMap
    // the oracle-checked exact twin is the ground truth (agg_exact query)
    val exact = RelationalQueries.exactAgg(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r).toMap

    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val exactParts = e.getAs[Long]("exact_parts").toDouble
      // KMV k=64: sd ≈ 1/sqrt(k-2) ≈ 12.7%; 3 groups at ~2.5 sigma
      assert(math.abs(a.getAs[Long]("approx_parts") - exactParts) / exactParts <= 0.32,
        s"KMV error too large for $flag: ${a.getAs[Long]("approx_parts")} vs $exactParts")
      val p50 = e.getAs[Double]("p50_price") // cents-quantized exact median
      assert(math.abs(a.getAs[Double]("p50_price") - p50) / p50 <= 0.02,
        s"sampled p50 error too large for $flag")
      assert(a.getAs[Double]("p95_price") >= a.getAs[Double]("p50_price"))
      assert(e.getAs[Double]("p25_price") <= p50 && p50 <= e.getAs[Double]("p75_price"))
      assert(a.getAs[Long]("cnt") == e.getAs[Long]("cnt"))
    }
  }

  test("sampled discrete quantiles land inside the exact rank bracket") {
    // a 25% sample of n rows has quantile rank error sd = sqrt(p(1-p)/m)
    // (m = sample size, ~5k per flag at sf0.01); ±0.02 rank units is ~3
    // sigma for p50 and generous for p95
    val eps = 0.02
    val li = Tables.load(spark, sf("sf0.01"), "lineitem")
    val approx = RelationalQueries.approxAgg(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r).toMap
    val brackets = li.groupBy("l_returnflag")
      .agg(
        expr(s"percentile(l_extendedprice, ${0.5 - eps})").as("p50_lo"),
        expr(s"percentile(l_extendedprice, ${0.5 + eps})").as("p50_hi"),
        expr(s"percentile(l_extendedprice, ${0.95 - eps})").as("p95_lo"),
        expr(s"percentile(l_extendedprice, ${0.95 + eps})").as("p95_hi"))
      .collect().map(r => r.getString(0) -> r).toMap
    brackets.foreach { case (flag, b) =>
      val a = approx(flag)
      val p50 = a.getAs[Double]("p50_price")
      val p95 = a.getAs[Double]("p95_price")
      assert(p50 >= b.getAs[Double]("p50_lo") && p50 <= b.getAs[Double]("p50_hi"),
        s"p50 outside sampling bracket for $flag")
      assert(p95 >= b.getAs[Double]("p95_lo") && p95 <= b.getAs[Double]("p95_hi"),
        s"p95 outside sampling bracket for $flag")
    }
  }

  test("KMV register pruning selects the exact bottom-k: estimate equals the unpruned definition") {
    // replay the oracle's definition (k-th smallest DISTINCT hash, no
    // register pass) in Spark and compare — proves tau >= h_(k) end to end
    val li = Tables.load(spark, sf("sf0.01"), "lineitem")
    val h = conv(substring(md5(col("l_partkey").cast("string").cast("binary")), 1, 12),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("h")
    val direct = li.select(col("l_returnflag"), h.as("h")).distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 64)
      .select(col("l_returnflag"), expr(s"${63L * 281474976710656L} DIV h").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = RelationalQueries.approxAgg(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_parts")).toMap
    direct.foreach { case (flag, d) => assert(sketch(flag) == d, s"flag $flag") }
  }

  test("CMS heavy hitters: estimate dominates exact; no truly frequent key missed; flag honest") {
    val support = 40L // sf0.001: well below the ~67-event mean, many frequents
    val out = RelationalQueries.heavyHitters(spark, sf(), minSupport = support).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.nonEmpty)
    // CMS one-sided error: the min-of-counters estimate NEVER undercounts
    out.foreach { case (u, (est, exact, confirmed)) =>
      assert(est >= exact, s"user $u: CMS est $est under exact $exact")
      assert(confirmed == (exact >= support), s"user $u flag")
    }
    // completeness: every truly frequent user survives the sketch filter
    // (est >= exact >= support) and is confirmed
    val trulyFrequent = Tables.events(spark, sf()).groupBy("user_id")
      .agg(count(lit(1)).as("n")).filter(col("n") >= support)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    trulyFrequent.foreach { case (u, n) =>
      assert(out.contains(u) && out(u)._3, s"frequent user $u ($n events) missed")
      assert(out(u)._2 == n, s"exact count mismatch for $u")
    }
    // false-positive candidates (sketch overcount) are visible but unflagged
    out.foreach { case (u, (_, _, confirmed)) =>
      assert(confirmed == trulyFrequent.contains(u))
    }
  }

  test("histogram-sketch quantiles land inside the true rank's power-of-two bucket") {
    val est = RelationalQueries.histQuantile(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = Tables.load(spark, sf("sf0.01"), "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
    est.foreach { case (flag, r) =>
      val cs = li.filter(col("l_returnflag") === flag)
        .collect().map(_.getLong(1)).sorted
      assert(r.getAs[Long]("n_rows") == cs.length)
      Seq(50 -> r.getAs[Double]("p50_est"), 95 -> r.getAs[Double]("p95_est"))
        .foreach { case (q, e) =>
          // the discrete-rank exact value (the estimate's own convention)
          val exact = cs((cs.length * q + 99) / 100 - 1).toDouble / 100.0
          // the estimate interpolates INSIDE the exact value's bucket
          // [2^(b-1), 2^b - 1], so it can never be off by more than the
          // bucket span: ratio within [1/2, 2) by construction
          assert(e >= exact / 2.0 && e < exact * 2.0,
            s"$flag p$q: est $e vs exact $exact outside the bucket envelope")
          val bucket = java.lang.Long.toBinaryString(math.round(exact * 100)).length
          val lo = 1L << (bucket - 1)
          val estC = math.round(e * 100)
          assert(estC >= lo && estC < 2 * lo,
            s"$flag p$q: est cents $estC outside bucket [$lo, ${2 * lo})")
        }
    }
    // monotone: p95 >= p50 per group
    est.values.foreach(r =>
      assert(r.getAs[Double]("p95_est") >= r.getAs[Double]("p50_est")))
  }
}
