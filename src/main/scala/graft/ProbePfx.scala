package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tables

/** Dev-only probe for the prefix-join variants: stage-by-stage cardinality
  * and wall time at a given sf dir — symmetric vs asymmetric index prefix,
  * and the extended c-prefix + grouped count(cp >= c) filter (AdaptJoin-
  * style; sound for c <= 9 at tau = 0.9 because a non-identical qualifying
  * pair has overlap >= 9 and the k-th smallest shared token sits within
  * position (k-1) + |unique side tokens| of each array, hence inside both
  * extended prefixes for k <= c). Measured on the 10x corpus (sf1x,
  * 48.8k reps, 17.8M candidates, 31k true pairs): the asymmetric index
  * prefix cuts raw join volume 428M -> 286M rows and wins every
  * alternating A/B verify round by ~5-10%; the c=3 grouped filter only
  * trims candidates to 14.2M — this corpus has no rare tokens (every
  * prefix posting list is dense), so the count filter cannot bind and its
  * extra aggregation cancels the saving. Verify of the ~17.8M candidate
  * pairs dominates end-to-end time; that density is a property of the
  * synthetic near-dup-heavy corpus, not of the plan (the MinHash rows are
  * the probabilistic scale path when a corpus behaves this way). Kept as
  * the measurement record for the shipped asymmetric design.
  * Not part of the driver contract. */
object ProbePfx {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/testdata/sf1x")
    val c = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val threshold = 0.9

    val t = Tables.fanOut(docs)
      .select(col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .groupBy("toks").agg(min("doc_id").as("doc_id"))
      .withColumn("n", size(col("toks")).cast("long"))
      .cache()
    println(s"[probe] reps=${t.count()}")

    val dfreq = t.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    def postings(ext: Int) = t
      .select(col("doc_id"), col("n"), explode(col("toks")).as("tok"))
      .join(dfreq, Seq("tok"))
      .groupBy("doc_id", "n")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ordered"))
      .withColumn("p", expr(s"n - (9L * n + 9L) div 10L + ${ext}L"))
      .withColumn("pi", expr(s"n - (18L * n + 18L) div 19L + ${ext}L"))
      .select(col("doc_id"), col("n"), col("pi"),
        posexplode(expr("transform(slice(ordered, 1, cast(p as int)), s -> s.tok)")))
      .withColumnRenamed("col", "tok").withColumnRenamed("pos", "i")

    val prefix1 = postings(1).cache()
    val prefixC = postings(c).cache()
    println(s"[probe] postings1=${prefix1.count()} postingsC=${prefixC.count()}")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = f
      println(f"[probe] $label count=$v time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def sides(prefix: DataFrame) = {
      val a = prefix.select(col("tok"), col("doc_id").as("doc_a"),
        col("n").as("n_a"), col("i").as("i_a"))
      val b = prefix.filter(col("i") < col("pi"))
        .select(col("tok"), col("doc_id").as("doc_b"),
          col("n").as("n_b"), col("i").as("i_b"))
      (a, b)
    }
    val posBound = lit(1L) + least(col("n_a") - col("i_a") - 1L,
      col("n_b") - col("i_b") - 1L) >= expr("(9L * (n_a + n_b) + 18L) div 19L")

    // current asymmetric single-token variant
    val (a1, b1) = sides(prefix1)
    val cand1 = a1.join(b1, Seq("tok"))
      .filter((col("n_b") < col("n_a")) ||
        (col("n_b") === col("n_a") && col("doc_b") < col("doc_a")))
      .filter(col("n_b").cast("double") / col("n_a").cast("double") >= threshold && posBound)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()

    // extended-prefix grouped variant: require >= c shared prefix tokens
    val (ac, bc) = sides(prefixC)
    val candC = ac.join(bc, Seq("tok"))
      .filter((col("n_b") < col("n_a")) ||
        (col("n_b") === col("n_a") && col("doc_b") < col("doc_a")))
      .filter(col("n_b").cast("double") / col("n_a").cast("double") >= threshold)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("cp"),
        max(lit(1L) + least(col("n_a") - col("i_a") - 1L,
          col("n_b") - col("i_b") - 1L) -
          expr("(9L * (n_a + n_b) + 18L) div 19L")).as("slack"))
      .filter(col("cp") >= c && col("slack") >= 0L)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))

    timed("cand1")(cand1.count())
    timed(s"candC(c=$c)")(candC.count())

    def verify(cand: DataFrame): Long =
      cand
        .join(t.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
          col("n").as("n_a")), Seq("doc_a"))
        .join(t.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
          col("n").as("n_b")), Seq("doc_b"))
        .withColumn("inter", graft.functions.SortedIntersectCount.sorted_intersect_count(
          col("toks_a"), col("toks_b")))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .count()
    // symmetric (pre-change) candidate set for the A/B
    val bSym = prefix1.select(col("tok"), col("doc_id").as("doc_b"),
      col("n").as("n_b"), col("i").as("i_b"))
    val candSym = a1.join(bSym, Seq("tok"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("n_a"), col("n_b")).cast("double") /
          greatest(col("n_a"), col("n_b")).cast("double") >= threshold && posBound)
      .select("doc_a", "doc_b").distinct()
    timed("warmup")(verify(cand1))
    timed("sym_1")(verify(candSym))
    timed("asym_1")(verify(cand1))
    timed("sym_2")(verify(candSym))
    timed("asym_2")(verify(cand1))
    timed("sym_3")(verify(candSym))
    timed("asym_3")(verify(cand1))
    spark.stop()
  }
}
