package graft

import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Error bounds for the sketch-based aggregates (no SQL oracle). */
class ApproxAggSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact; percentiles bracket the exact quantiles") {
    val approx = RelationalQueries.approxAgg(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r).toMap
    // the oracle-checked exact twin is the ground truth (agg_exact query)
    val exact = RelationalQueries.exactAgg(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r).toMap

    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val exactParts = e.getAs[Long]("exact_parts").toDouble
      assert(math.abs(a.getAs[Long]("approx_parts") - exactParts) / exactParts <= 0.05,
        s"HLL error too large for $flag")
      val p50 = e.getAs[Double]("p50_price") // cents-quantized exact median
      assert(math.abs(a.getAs[Double]("p50_price") - p50) / p50 <= 0.02,
        s"p50 sketch error too large for $flag")
      assert(a.getAs[Double]("p95_price") >= a.getAs[Double]("p50_price"))
      assert(e.getAs[Double]("p25_price") <= p50 && p50 <= e.getAs[Double]("p75_price"))
      assert(a.getAs[Long]("cnt") == e.getAs[Long]("cnt"))
    }
  }

  test("percentile_approx honors its documented rank-error bound (±1/accuracy)") {
    // GK guarantee: with `accuracy` a, the returned element's rank is within
    // ±n/a of the target rank — equivalently the value lies inside the exact
    // [q - eps, q + eps] quantile bracket (eps = 1/a, doubled for the
    // interpolation the exact percentile applies between elements).
    val eps = 2.0 / 10000
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
        s"p50 outside rank-error bracket for $flag")
      assert(p95 >= b.getAs[Double]("p95_lo") && p95 <= b.getAs[Double]("p95_hi"),
        s"p95 outside rank-error bracket for $flag")
    }
  }
}
