package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decode / feature-extraction as batched
  * per-partition functions.
  *
  * This container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[fakeDecode]]); everything around it
  * — the binary column, the metadata struct, the mapPartitions batch shape,
  * the output schema — is the real Spark plumbing a codec would plug into.
  * Payloads are synthesized from `documents.text` (UTF-8 bytes) so the
  * pipeline has real binary data to move.
  */
object Multimodal {

  /** Binary payload + typed metadata (size, sha256, stub media dims derived
    * deterministically from the payload size — stand-ins for width/height/
    * frame-count a real decoder would emit). Fully oracle-checkable. */
  def metadata(docs: DataFrame): DataFrame =
    Tables.fanOut(docs).select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("byte_size", octet_length(col("payload")).cast("long"))
      .select(
        col("doc_id"),
        col("payload"),
        col("byte_size"),
        sha2(col("payload"), 256).as("sha256"),
        (lit(1L) + col("byte_size") % 64).as("width"),
        (lit(1L) + (col("byte_size") * 7) % 64).as("height"),
        (lit(1L) + col("byte_size") % 10).as("n_frames"))
      .orderBy("doc_id")

  val metadataSql: String =
    """SELECT doc_id,
      |  encode(text) AS payload,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_size,
      |  sha256(text) AS sha256,
      |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width,
      |  1 + (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 64 AS height,
      |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 10 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Double])

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio frame) and emit embeddings; this deterministic fake maps
    * the first 8 bytes to [0,1) floats. The mapPartitions shape — batched,
    * no per-row JVM setup, codec instantiated once per partition — is the
    * real design. */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    // ??? <- real codec goes here; deterministic fake below
    val n = math.min(8, payload.length)
    Array.tabulate(n)(i => (payload(i) & 0xff) / 255.0)
  }

  /** Batched feature extraction over the binary column. */
  def features(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition setup (where a codec would be initialized once)
      rows.map(r => MediaFeatures(r.doc_id, r.payload.length.toLong, fakeDecode(r.payload)))
    }.toDF().orderBy("doc_id")
  }

  /** Frame sampling stub: every k-th 16-byte "frame" of the payload —
    * the partition-parallel slicing pattern for video columns. */
  def frameSample(docs: DataFrame, everyK: Int = 4): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        expr("transform(sequence(0, (octet_length(payload) - 1) div 16), " +
          "i -> substring(payload, i * 16 + 1, 16))").as("frames"))
      .select(col("doc_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"))
      .orderBy("doc_id", "frame_idx")
}
