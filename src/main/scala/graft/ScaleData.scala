package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Render a ~10× corpus (sf1-equivalent `events` / `documents` /
  * `embeddings`) from sf0.1 — the input for the scale-curve bench
  * ([[BenchScale]]): the brief demands plans that survive 100×, and a
  * two-point curve (sf0.1 → sf1) is the cheapest empirical check that a
  * row's cost is ~linear in the data rather than in some quadratic
  * candidate structure.
  *
  * Each copy is id-shifted AND content-perturbed — exact replication
  * would fabricate 10-member duplicate groups for every document/vector
  * and bench a degenerate dedup workload instead of a grown corpus:
  *
  *   - `documents`: a fixed-width ` c<NN>` suffix per copy (n_chars kept
  *     consistent — the classifier derives mean word length from it);
  *   - `embeddings`: component 0 nudged by copy-scaled 1e-2 steps (keeps
  *     near-dup geometry realistic, breaks exact equality);
  *   - `events`: ids shifted, users/timestamps kept (a grown corpus has
  *     more events per user, not 10× disjoint universes).
  *
  * The small relational tables copy through unchanged. Output stays under
  * target/ (git-ignored); usage: `runMain graft.ScaleData [src] [dst]`. */
object ScaleData {
  val Factor = 10

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/testdata/sf1x")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Factor).map(i => f(df, i)).reduce(_ unionByName _)

    val ev = spark.read.parquet(s"$src/events.parquet")
    val evMax = ev.agg(max("event_id")).head().getLong(0) + 1
    copies(ev)((d, i) => d.withColumn("event_id", col("event_id") + lit(i * evMax)))
      .repartition(32).write.mode("overwrite").parquet(s"$dst/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docMax = docs.agg(max("doc_id")).head().getLong(0) + 1
    copies(docs) { (d, i) =>
      val suffix = f" c$i%02d" // fixed width: n_chars stays one formula
      d.withColumn("doc_id", col("doc_id") + lit(i * docMax))
        .withColumn("text", concat(col("text"), lit(suffix)))
        .withColumn("n_chars", col("n_chars") + lit(suffix.length.toLong))
    }.repartition(16).write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embMax = emb.agg(max("vec_id")).head().getLong(0) + 1
    copies(emb) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * embMax))
        .withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> IF(j = 0, x + CAST(0.01 * $i AS FLOAT), x))"))
    }.repartition(16).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"[scaledata] wrote ${Factor}x events/documents/embeddings to $dst")
    spark.stop()
  }
}
