package graft

import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Error bounds for the sketch-based aggregates (no SQL oracle). */
class ApproxAggSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact; percentiles bracket the exact quantiles") {
    val li = Tables.load(spark, sf("sf0.01"), "lineitem")
    val approx = RelationalQueries.approxAgg(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap

    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val exactParts = e.getAs[Long]("parts").toDouble
      assert(math.abs(a.getAs[Long]("approx_parts") - exactParts) / exactParts <= 0.05,
        s"HLL error too large for $flag")
      val p50 = e.getAs[Double]("p50")
      assert(math.abs(a.getAs[Double]("p50_price") - p50) / p50 <= 0.02,
        s"p50 sketch error too large for $flag")
      assert(a.getAs[Double]("p95_price") >= a.getAs[Double]("p50_price"))
    }
  }
}
