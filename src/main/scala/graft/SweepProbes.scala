package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev sweep for the embed-gate multi-probe knobs: measures gate recall
  * (the `embed_gate_recall` monitor) across probe counts × thresholds on
  * the real sf corpus — the evidence behind [[Similarity.EmbedGateProbes]].
  * Not part of the driver contract (EmbedGateRecallSpec pins the shipped
  * point and the monotone sweep). */
object SweepProbes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    for (threshold <- Seq(0.35); t <- Seq(4, 6, 8, 10); p <- Seq(1, 4, 8, 16)) {
      val r = Similarity.embedGateRecall(emb, threshold = threshold, nProbes = p, tables = t)
        .select("hits", "possible", "recall").head()
      println(f"[sweep] threshold=$threshold tables=$t probes=$p hits=${r.getLong(0)} possible=${r.getLong(1)} recall=${r.getDouble(2)}%.4f")
    }
    spark.stop()
  }
}
