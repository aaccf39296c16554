package graft

import org.apache.spark.sql.SparkSession

/** Dev-only nProbe sweep for the learned IVF-PQ query (r8 VERDICT #8):
  * recall@5 vs brute force and warm query time at nProbe 2 vs 4.
  * Not part of the driver contract. */
object Sweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.operators.Tables.load(spark, sfDir, "embeddings")
    graft.operators.Similarity.warmPins(emb)
    val brute = graft.operators.Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // r9: rerank × residual-Lloyd-iters sweep at nProbe=4 (the r8 knee) —
    // the non-monotonicity note: extra probes add candidates that can
    // displace true neighbors from a too-small ADC top-`rerank`
    for (iters <- Seq(2, 3); rerank <- Seq(32, 64, 128)) {
      val df = graft.operators.Similarity.ivfpqTopKLearned(emb,
        rerank = rerank, iters = iters)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val warm0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - warm0) / 1e9
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = brute.count(got).toDouble / brute.size
      println(f"[sweep] iters=$iters rerank=$rerank recall@5=$recall%.3f first=${(warm0 - t0) / 1e9}%.2f s warm=$warm%.2f s")
    }
    spark.stop()
  }
}
