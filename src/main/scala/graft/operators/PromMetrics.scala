package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's nine Prometheus aggregations (/root/reference/metrics.go)
  * as DataFrame transforms. Histograms follow Prometheus semantics exactly:
  * fixed explicit buckets, an observation lands in every bucket with
  * `le >= v` (cumulative), all buckets (including +Inf) are always exposed,
  * plus exact `_sum`/`_count`.
  *
  * Scale: observations reduce via map-side partial aggregation to
  * |labels| × |buckets| rows before the single shuffle; the bucket grid is
  * broadcast. The cumulative window runs over ≤ 13 rows per label — trivial
  * at any input scale.
  */
object PromMetrics {

  // Bucket boundaries, verbatim from /root/reference/metrics.go:42,50,56,62,68.
  val QueryTimeBuckets: Seq[Double] =
    Seq(1, 5, 10, 20, 30, 40, 50, 60, 120, 180, 300, 1800).map(_.toDouble)
  val RowsReadBuckets: Seq[Double] =
    Seq(1000000L, 10000000L, 50000000L, 100000000L, 500000000L, 1000000000L,
      2000000000L, 3000000000L, 10000000000L).map(_.toDouble)
  val BytesReadBuckets: Seq[Double] =
    Seq(5368709120L, 10737418240L, 53687091200L, 107374182400L, 536870912000L,
      1073741824000L).map(_.toDouble)
  val RpsBuckets: Seq[Double] =
    Seq(50000L, 100000L, 500000L, 1000000L, 2000000L, 5000000L, 10000000L,
      50000000L, 100000000L, 1000000000L).map(_.toDouble)
  val BpsBuckets: Seq[Double] =
    Seq(104857600L, 524288000L, 1073741824L, 5368709120L, 21474836480L,
      53687091200L).map(_.toDouble)

  /** Prometheus cumulative histogram: labels..., le (double, +Inf last),
    * cum_count. All (observed-label × bucket) cells present, zero-filled.
    */
  def histogram(obs: DataFrame, valueCol: Column, labels: Seq[String],
      buckets: Seq[Double]): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._

    val v = valueCol.cast("double")
    // v's smallest containing bucket; +Inf otherwise
    val leAssign = buckets.foldRight(lit(Double.PositiveInfinity): Column) {
      (b, acc) => when(v <= lit(b), lit(b)).otherwise(acc)
    }
    val labelCols = labels.map(col)
    val raw = obs
      .withColumn("le", leAssign)
      .groupBy(labelCols :+ col("le"): _*).agg(count("*").as("bucket_count"))

    val bucketDf = (buckets :+ Double.PositiveInfinity).toDF("le")
    val grid =
      if (labels.isEmpty) bucketDf
      else obs.select(labelCols: _*).distinct().crossJoin(broadcast(bucketDf))

    val joined = grid.join(raw, labels :+ "le", "left")
      .withColumn("bucket_count", coalesce(col("bucket_count"), lit(0L)))
    if (labels.isEmpty) {
      // Cumulative sum over the ≤14-row post-aggregation bucket grid via a
      // broadcast θ-self-join (count of y.le <= x.le) instead of a
      // partition-less window — WindowExec would move "all" data (the 14
      // rows) to one partition and log a scary degradation warning that
      // misreads as a bottleneck at scale review. A constant partition key
      // doesn't help: Catalyst folds it away before planning.
      val bc = joined.select(col("le"), col("bucket_count"))
      bc.as("x").join(broadcast(bc.as("y")), col("y.le") <= col("x.le"))
        .groupBy(col("x.le").as("le"))
        .agg(sum(col("y.bucket_count")).as("cum_count"))
    } else {
      val w = Window.partitionBy(labelCols: _*).orderBy("le")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined
        .withColumn("cum_count", sum("bucket_count").over(w))
        .select(labelCols :+ col("le") :+ col("cum_count"): _*)
    }
  }

  /** The `_sum`/`_count` series. `exactSumCol` must be an integer-typed
    * column (e.g. microseconds instead of fractional seconds) so the sum is
    * order-independent and exactly reproducible by the oracle.
    */
  def histogramSumCount(obs: DataFrame, exactSumCol: Column,
      labels: Seq[String]): DataFrame = {
    val labelCols = labels.map(col)
    obs.groupBy(labelCols: _*)
      .agg(sum(exactSumCol).as("sum"), count("*").as("count"))
  }

  /** A3 `clickhouse_query_count{type}` — one increment per inserted state
    * record (query.go:127), including re-inserted lifecycles of a re-used
    * id. */
  def queryCount(parsed: DataFrame): DataFrame =
    QueryMerge.stateInserts(parsed)
      .groupBy(col("stmt_type")).agg(count("*").as("count"))

  /** A4 `clickhouse_query_errors{type, code}` — per live error line
    * (query.go:262). */
  def queryErrors(parsed: DataFrame): DataFrame =
    QueryMerge.liveEvents(parsed, "error")
      .groupBy(col("base_stmt_type").as("stmt_type"), col("error_code"))
      .agg(count("*").as("count"))

  /** Per-live-memory-line elapsed observations feeding A5 (query.go:225-228):
    * stmt_type, elapsed (double seconds), elapsed_us (exact). */
  def elapsedObservations(parsed: DataFrame): DataFrame =
    QueryMerge.liveEvents(parsed, "memory")
      .withColumn("elapsed_us", unix_micros(col("ts")) - unix_micros(col("start_time")))
      .withColumn("elapsed", col("elapsed_us").cast("double") / lit(1000000.0))
      .select(col("base_stmt_type").as("stmt_type"), col("elapsed"), col("elapsed_us"))

  /** A5 `clickhouse_query_time{type}` histogram. */
  def queryTimeHistogram(parsed: DataFrame): DataFrame = {
    val obs = elapsedObservations(parsed)
    histogram(obs, col("elapsed"), Seq("stmt_type"), QueryTimeBuckets)
  }

  /** A5 `_sum`/`_count` (sum carried as exact microseconds). */
  def queryTimeSumCount(parsed: DataFrame): DataFrame =
    histogramSumCount(elapsedObservations(parsed), col("elapsed_us"), Seq("stmt_type"))

  /** A6-A9: observed per live stats line regardless of statement type — the
    * reference's `select_`-named histograms have no type filter
    * (query.go:183-186). */
  private def statsObs(parsed: DataFrame): DataFrame =
    QueryMerge.liveEvents(parsed, "stats")

  def rowsReadHistogram(parsed: DataFrame): DataFrame =
    histogram(statsObs(parsed), col("rows_read"), Nil, RowsReadBuckets)

  def bytesReadHistogram(parsed: DataFrame): DataFrame =
    histogram(statsObs(parsed), col("bytes_read"), Nil, BytesReadBuckets)

  def rpsHistogram(parsed: DataFrame): DataFrame =
    histogram(statsObs(parsed), col("rps"), Nil, RpsBuckets)

  def bpsHistogram(parsed: DataFrame): DataFrame =
    histogram(statsObs(parsed), col("speed"), Nil, BpsBuckets)

  def statsSumCounts(parsed: DataFrame): DataFrame = {
    val obs = statsObs(parsed)
    obs.agg(
      sum("rows_read").as("rows_read_sum"),
      sum("bytes_read").as("bytes_read_sum"),
      sum("rps").as("rps_sum"),
      sum("speed").as("speed_sum"),
      count("*").as("count"))
  }
}
