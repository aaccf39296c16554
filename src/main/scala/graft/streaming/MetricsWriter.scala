package graft.streaming

import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, when}

/** Pluggable landing seam for the registry table (the BASELINE north-star
  * "Structured Streaming + ClickHouse sink" shape): each micro-batch of
  * [[MetricsServing.serveWith]] hands the writer one registry snapshot
  * (schema `metric string, labels string, le double, value double`) and the
  * writer lands it wherever the deployment scrapes/queries it. Both
  * implementations below are plain distributed `DataFrameWriter` paths — no
  * driver-side collection, so they hold at any registry size (and the
  * registry is post-aggregation tiny anyway).
  */
trait MetricsWriter {
  /** Land one micro-batch's registry snapshot. Implementations replace the
    * previous snapshot (the registry is cumulative, not append-only —
    * readers always want the latest totals, like a scrape). */
  def write(registry: DataFrame, batchId: Long): Unit
}

/** Snapshot the registry into a parquet table — the warehouse-native sink
  * (readers: any engine that speaks parquet). */
final class ParquetMetricsWriter(path: String) extends MetricsWriter {
  override def write(registry: DataFrame, batchId: Long): Unit =
    registry.write.mode("overwrite").parquet(path)
}

/** Snapshot the registry through JDBC — the ClickHouse-shaped sink: with the
  * ClickHouse JDBC driver on the classpath this lands the registry in a
  * ClickHouse table (`url = "jdbc:clickhouse://host:8123/db"`), closing the
  * loop the reference's README sketches (ClickHouse logs → metrics →
  * ClickHouse). Spec'd against embedded Derby (this sandbox has no network),
  * but the writer is driver-agnostic: Spark's JDBC dialect layer handles
  * DDL quoting/type mapping per database.
  *
  * `infinitySentinel`: the `+Inf` histogram bucket is a non-finite DOUBLE;
  * ClickHouse (and Postgres) store it natively, so the default passes it
  * through — backends without non-finite doubles (Derby, MySQL) get the
  * sentinel substituted in `le`.
  */
final class JdbcMetricsWriter(url: String, table: String,
    properties: Properties = new Properties,
    infinitySentinel: Option[Double] = None) extends MetricsWriter {
  override def write(registry: DataFrame, batchId: Long): Unit = {
    val out = infinitySentinel match {
      case Some(s) => registry.withColumn("le",
        when(col("le") === lit(Double.PositiveInfinity), lit(s)).otherwise(col("le")))
      case None => registry
    }
    out.write.mode("overwrite").jdbc(url, table, properties)
  }
}
