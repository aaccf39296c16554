package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decode / feature-extraction as batched
  * per-partition functions.
  *
  * The ORACLE-checked queries use a deterministic stand-in decoder
  * ([[fakeDecode]], DuckDB-replayable); a REAL image decoder over the JDK's
  * built-in `javax.imageio` codecs ([[imageDecode]] — PNG/JPEG/BMP/GIF, no
  * external dependency) drops into the same seam, spec-proven on actual PNG
  * bytes. Everything around the seam — the binary column, the metadata
  * struct, the mapPartitions batch shape, the output schema — is identical
  * for both. Oracle payloads are synthesized from `documents.text` (UTF-8
  * bytes) so the hash-checked pipeline has real binary data to move.
  */
object Multimodal {

  /** Binary payload + typed metadata (size, sha256, stub media dims derived
    * deterministically from the payload size — stand-ins for width/height/
    * frame-count a real decoder would emit). Fully oracle-checkable.
    *
    * The payload stays `binary` inside the pipeline; the emitted row carries
    * `hex(payload)` because the driver's pandas compare can't sort raw byte
    * columns (round-1 CORRECTNESS failure). */
  def metadata(docs: DataFrame): DataFrame =
    Tables.fanOut(docs).select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("byte_size", octet_length(col("payload")).cast("long"))
      .select(
        col("doc_id"),
        hex(col("payload")).as("payload_hex"),
        col("byte_size"),
        sha2(col("payload"), 256).as("sha256"),
        (lit(1L) + col("byte_size") % 64).as("width"),
        (lit(1L) + (col("byte_size") * 7) % 64).as("height"),
        (lit(1L) + col("byte_size") % 10).as("n_frames"))
      .orderBy("doc_id")

  val metadataSql: String =
    """SELECT doc_id,
      |  hex(encode(text)) AS payload_hex,
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
    // CODEC SEAM: swap a real model/codec in here; deterministic fake below
    val n = math.min(8, payload.length)
    Array.tabulate(n)(i => (payload(i) & 0xff) / 255.0)
  }

  /** The codec seam: payload bytes → feature vector. A decoder returning
    * an empty array contributes no feature rows for that payload (the
    * "couldn't decode" convention — the row is droppable, not null-ridden). */
  type MediaCodec = Array[Byte] => Array[Double]

  /** REAL image decoder through the seam: `javax.imageio` ships in the JDK
    * with PNG/JPEG/BMP/GIF readers, so this needs no external dependency.
    * Emits `[width, height, meanR, meanG, meanB]` — dimensions plus exact
    * per-channel means (PNG is lossless, so the means are deterministic
    * integerized-sum divisions). Unreadable bytes → empty vector (no rows).
    * Not the oracle default only because DuckDB cannot replay a PNG decode;
    * MultimodalCodecSpec pins it on real PNG bytes. */
  /** `[width, height, meanR, meanG, meanB]` of one decoded image —
    * integerized channel sums, so the means are exact divisions. Shared by
    * [[imageDecode]] and the per-frame [[gifFrames]] decoder. */
  private def imageStats(img: java.awt.image.BufferedImage): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (r, g, b) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Array(w.toDouble, h.toDouble, r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  val imageDecode: MediaCodec = { payload =>
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) Array.empty[Double] else imageStats(img)
    } catch { case _: Throwable => Array.empty[Double] }
  }

  /** Factory form of [[imageDecode]] for [[features]]/[[featuresOf]] —
    * ImageIO's readers are stateless here, so the "once per partition"
    * instantiation is just the closure itself. */
  val imageFactory: () => MediaCodec = () => imageDecode

  /** REAL audio decoder through the SAME seam — the second modality that
    * proves the seam's claim ("a real decoder drops in without touching
    * the operator"): `javax.sound.sampled` ships a WAV (RIFF) reader in
    * the JDK, no external dependency. Emits
    * `[n_channels, sample_rate, n_frames, duration_sec, rms_ch0, …]` —
    * format metadata, duration, and per-channel RMS amplitude. The RMS is
    * an exact integer sum of squares (16-bit samples square to ≤ 2³⁰, so
    * the Long accumulator is exact past 10¹² frames) with one division and
    * one `sqrt` — both correctly rounded under IEEE 754, so the output is
    * bit-deterministic. PCM 16-bit signed (either endianness) and 8-bit
    * unsigned payloads decode; anything else — including undecodable
    * bytes — yields the empty vector (no rows), same convention as
    * [[imageDecode]]. */
  val audioDecode: MediaCodec = { payload =>
    try {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      // COMPRESSED encodings ride the JDK's own codec SPI: G.711 µ-law and
      // A-law payloads (AU's native encoding; also legal in WAV) transcode
      // to linear PCM16 through AudioSystem's format-conversion providers,
      // then flow through the SAME stats loop — the seam's drop-in claim
      // for a second, companded audio codec (MultimodalCodecSpec pins the
      // decode against an independent pure-Scala G.711 expansion).
      val in = {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        import javax.sound.sampled.AudioFormat.Encoding
        val f = src.getFormat
        if (f.getEncoding == Encoding.ULAW || f.getEncoding == Encoding.ALAW)
          AudioSystem.getAudioInputStream(new AudioFormat(
            Encoding.PCM_SIGNED, f.getSampleRate, 16, f.getChannels,
            2 * f.getChannels, f.getSampleRate, false), src)
        else src
      }
      try {
        import javax.sound.sampled.AudioFormat.Encoding
        val fmt = in.getFormat
        val ch = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        val supported = (fmt.getEncoding == Encoding.PCM_SIGNED && bits == 16) ||
          (fmt.getEncoding == Encoding.PCM_UNSIGNED && bits == 8)
        if (!supported || ch <= 0) Array.empty[Double]
        else {
          val bytes = in.readAllBytes()
          val bytesPerSample = bits / 8
          val frameBytes = bytesPerSample * ch
          val nFrames = bytes.length / frameBytes
          val sumSq = new Array[Long](ch)
          var f = 0
          while (f < nFrames) {
            var c = 0
            while (c < ch) {
              val off = f * frameBytes + c * bytesPerSample
              val s: Long =
                if (bits == 16) {
                  val b0 = bytes(off); val b1 = bytes(off + 1)
                  val v = if (fmt.isBigEndian) (b0 << 8) | (b1 & 0xff)
                  else (b1 << 8) | (b0 & 0xff)
                  v.toShort.toLong
                } else (bytes(off) & 0xff) - 128L // 8-bit PCM is unsigned-biased
              sumSq(c) += s * s
              c += 1
            }
            f += 1
          }
          val rate = fmt.getSampleRate.toDouble
          Array(ch.toDouble, rate, nFrames.toDouble,
            if (rate > 0) nFrames / rate else 0.0) ++
            sumSq.map(ss => if (nFrames == 0) 0.0 else math.sqrt(ss.toDouble / nFrames))
        }
      } finally in.close()
    } catch { case _: Throwable => Array.empty[Double] }
  }

  /** Factory form of [[audioDecode]] (stateless, like [[imageFactory]]). */
  val audioFactory: () => MediaCodec = () => audioDecode

  /** The FRAME-codec seam — the video-shaped sibling of [[MediaCodec]]:
    * one payload decodes to one feature vector PER FRAME. Empty result =
    * undecodable (no rows), same convention as the scalar seam. */
  type FrameCodec = Array[Byte] => Seq[Array[Double]]

  /** REAL multi-frame decoder through the frame seam: animated GIF via the
    * JDK's ImageIO readers — one `[w, h, meanR, meanG, meanB]` vector per
    * frame, shared stats with [[imageDecode]]. Container-GENERIC in
    * practice: `getImageReaders` sniffs the payload's magic, so any
    * multi-image format with a JDK reader decodes through this same codec
    * (spec'd for animated GIF and multi-page TIFF — the JDK's two
    * multi-image containers). The reader is instantiated per payload and
    * disposed; heavyweight video codecs would hold JNI state in the
    * per-partition factory instead. This makes the
    * frame ops' claim real for one container: [[frameSample]]'s byte
    * slicing is the oracle-checkable stand-in, and a true container
    * decoder drops into [[frameFeaturesOf]] without touching the
    * operator.
    *
    * RAW-frame semantics, deliberately: `reader.read(i)` yields each frame
    * AS STORED — for size-optimized GIFs (inter-frame delta rects +
    * disposal metadata) later frames are the changed sub-rectangles, not
    * the composited screen, so their dims/means describe the delta region.
    * Compositing against the logical screen (apply per-frame offsets and
    * disposal from the image metadata) is codec-side work that belongs in
    * a richer FrameCodec, not in the operator; the spec's full-size solid
    * frames pin the raw contract. */
  val gifFrames: FrameCodec = { payload =>
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false)
            (0 until reader.getNumImages(true)).map(i => imageStats(reader.read(i)))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Throwable => Seq.empty }
  }

  /** Factory form of [[gifFrames]] (stateless). */
  val gifFrameFactory: () => FrameCodec = () => gifFrames

  /** COMPOSITED-frame GIF decoder — the richer FrameCodec [[gifFrames]]'s
    * scaladoc names: each emitted vector describes the LOGICAL SCREEN
    * after applying the frame's stored delta rect at its
    * `(imageLeftPosition, imageTopPosition)` offset and honoring the
    * previous frame's disposal method (`doNotDispose` keeps the canvas,
    * `restoreToBackgroundColor` clears the frame's rect,
    * `restoreToPrevious` rolls the canvas back) — so size-optimized GIFs
    * yield full-frame `[w, h, meanR, meanG, meanB]` stats with
    * `w × h` = the logical screen for EVERY frame, what a video pipeline
    * means by "frame". The raw codec stays the documented default (delta
    * rects as stored, the honest cheap form); this one proves the seam
    * composes — both drop into [[frameFeaturesOf]] unchanged. */
  val gifFramesComposited: FrameCodec = { payload =>
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false)
            val n = reader.getNumImages(true)
            def imageMeta(i: Int): (Int, Int, String) = {
              val tree = reader.getImageMetadata(i)
                .getAsTree("javax_imageio_gif_image_1.0")
                .asInstanceOf[org.w3c.dom.Element]
              def node(name: String): Option[org.w3c.dom.Element] = {
                val ns = tree.getElementsByTagName(name)
                if (ns.getLength > 0) Some(ns.item(0).asInstanceOf[org.w3c.dom.Element])
                else None
              }
              val desc = node("ImageDescriptor")
              val left = desc.map(_.getAttribute("imageLeftPosition").toInt).getOrElse(0)
              val top = desc.map(_.getAttribute("imageTopPosition").toInt).getOrElse(0)
              val disposal = node("GraphicControlExtension")
                .map(_.getAttribute("disposalMethod")).getOrElse("none")
              (left, top, disposal)
            }
            // logical screen from the stream metadata; fall back to the
            // frames' bounding box when a stream omits it
            val screen: Option[(Int, Int)] = for {
              sm <- Option(reader.getStreamMetadata)
              tree = sm.getAsTree("javax_imageio_gif_stream_1.0")
                .asInstanceOf[org.w3c.dom.Element]
              ns = tree.getElementsByTagName("LogicalScreenDescriptor")
              if ns.getLength > 0
              d = ns.item(0).asInstanceOf[org.w3c.dom.Element]
            } yield (d.getAttribute("logicalScreenWidth").toInt,
              d.getAttribute("logicalScreenHeight").toInt)
            val metas = (0 until n).map(imageMeta)
            val frames = (0 until n).map(reader.read)
            val (sw, sh) = screen.getOrElse((
              metas.zip(frames).map { case ((l, _, _), f) => l + f.getWidth }.max,
              metas.zip(frames).map { case ((_, t, _), f) => t + f.getHeight }.max))
            val canvas = new java.awt.image.BufferedImage(sw, sh,
              java.awt.image.BufferedImage.TYPE_INT_ARGB)
            val g = canvas.createGraphics()
            try {
              metas.zip(frames).map { case ((left, top, disposal), frame) =>
                val before =
                  if (disposal == "restoreToPrevious")
                    canvas.getData(new java.awt.Rectangle(0, 0, sw, sh))
                  else null
                g.drawImage(frame, left, top, null)
                val stats = imageStats(canvas)
                disposal match {
                  case "restoreToBackgroundColor" =>
                    // GIF background ≈ cleared-to-transparent region
                    val prev = g.getComposite
                    g.setComposite(java.awt.AlphaComposite.Clear)
                    g.fillRect(left, top, frame.getWidth, frame.getHeight)
                    g.setComposite(prev)
                  case "restoreToPrevious" => canvas.setData(before)
                  case _ => () // none / doNotDispose: canvas persists
                }
                stats
              }
            } finally g.dispose()
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Throwable => Seq.empty }
  }

  /** Factory form of [[gifFramesComposited]] (stateless). */
  val gifCompositedFactory: () => FrameCodec = () => gifFramesComposited

  final case class FrameFeatures(doc_id: Long, n_bytes: Long,
      features: Seq[Array[Double]])

  /** Deterministic fake FRAME decoder — the frame seam's oracle twin of
    * [[fakeDecode]]: 16-byte slices as frames, each frame's vector
    * `[frame_len, first_byte, last_byte]`. DuckDB-replayable, so the frame
    * seam itself is hash-checked (`mm_frame_features`), not just spec-green
    * with the real GIF decoder. */
  def fakeFrameDecode(payload: Array[Byte]): Seq[Array[Double]] =
    payload.grouped(16).map(f => Array(f.length.toDouble,
      (f.head & 0xff).toDouble, (f.last & 0xff).toDouble)).toSeq

  /** [[frameFeaturesOf]] over the documents table's synthesized payloads
    * with the oracle-checkable fake frame decoder as default. */
  def frameFeatures(docs: DataFrame,
      codecFactory: () => FrameCodec = () => fakeFrameDecode _): DataFrame =
    frameFeaturesOf(Tables.fanOut(docs)
      .select(col("doc_id"), col("text").cast("binary").as("payload")), codecFactory)

  /** DuckDB oracle for [[frameFeatures]] (ASCII corpus: byte = character,
    * as in [[featuresSql]]). */
  val frameFeaturesSql: String =
    """WITH d AS (
      |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents WHERE octet_length(encode(text)) > 0),
      |f AS (SELECT doc_id, text, n_bytes,
      |        unnest(range(0, (n_bytes - 1) // 16 + 1)) AS frame_idx FROM d),
      |x AS (SELECT doc_id, n_bytes, CAST(frame_idx AS BIGINT) AS frame_idx,
      |        CAST(least(16, n_bytes - frame_idx * 16) AS BIGINT) AS flen,
      |        CAST(ascii(substr(text, CAST(frame_idx * 16 AS INT) + 1, 1)) AS BIGINT) AS fb,
      |        CAST(ascii(substr(text,
      |          CAST(frame_idx * 16 + least(16, n_bytes - frame_idx * 16) AS INT), 1)) AS BIGINT) AS lb
      |      FROM f),
      |e AS (SELECT doc_id, n_bytes, frame_idx, unnest(range(0, 3)) AS feat_idx,
      |        flen, fb, lb FROM x)
      |SELECT doc_id, n_bytes, frame_idx, CAST(feat_idx AS BIGINT) AS feat_idx,
      |  CAST(CASE feat_idx WHEN 0 THEN flen WHEN 1 THEN fb ELSE lb END AS DOUBLE) AS feature_value
      |FROM e ORDER BY doc_id, frame_idx, feat_idx""".stripMargin

  /** Per-FRAME feature extraction over a `(doc_id, payload: binary)` frame
    * — the video twin of [[featuresOf]]: same injected-factory seam, same
    * batched mapPartitions shape, output flattened to
    * `(doc_id, n_bytes, frame_idx, feat_idx, feature_value)` rows. Frame
    * sampling composes downstream (`filter(frame_idx % k === 0)`) — the
    * decode is the expensive part and happens once either way. */
  def frameFeaturesOf(mediaDf: DataFrame,
      codecFactory: () => FrameCodec): DataFrame = {
    val spark = mediaDf.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] =
      mediaDf.select(col("doc_id"), col("payload")).as[MediaRow]
    media.mapPartitions { rows =>
      val codec = codecFactory() // per-partition codec init
      rows.map(r => FrameFeatures(r.doc_id, r.payload.length.toLong, codec(r.payload)))
    }.toDF()
      .select(col("doc_id"), col("n_bytes"),
        posexplode(col("features")).as(Seq("frame_idx", "f")))
      .select(col("doc_id"), col("n_bytes"), col("frame_idx").cast("long").as("frame_idx"),
        posexplode(col("f")).as(Seq("feat_idx", "feature_value")))
      .select(col("doc_id"), col("n_bytes"), col("frame_idx"),
        col("feat_idx").cast("long").as("feat_idx"), col("feature_value"))
      .orderBy("doc_id", "frame_idx", "feat_idx")
  }

  /** Batched feature extraction over the binary column. The feature vector
    * is flattened to `(doc_id, n_bytes, feat_idx, feature_value)` rows for
    * the driver compare (raw `array<double>` columns are unsortable there);
    * the default [[fakeDecode]] is exactly `(byte & 0xff)/255.0`, so the
    * default query is DuckDB-expressible and hash-checked.
    *
    * The codec is INJECTED as a factory: heavyweight decoder state (JNI
    * handles, model weights) is instantiated once per partition inside the
    * executor — only the factory closure ships from the driver. A real
    * decoder drops in without touching this operator; MultimodalCodecSpec
    * proves the seam by running an actual PPM-header parser through it. */
  def features(docs: DataFrame,
      codecFactory: () => MediaCodec = () => fakeDecode): DataFrame =
    featuresOf(Tables.fanOut(docs)
      .select(col("doc_id"), col("text").cast("binary").as("payload")), codecFactory)

  /** The same extraction over an arbitrary `(doc_id, payload: binary)`
    * frame — the entry point for REAL media bytes, which cannot ride a
    * UTF-8 `text` column (PNG streams are not valid UTF-8). The caller owns
    * the input partitioning; the codec still instantiates once per
    * partition. */
  def featuresOf(mediaDf: DataFrame,
      codecFactory: () => MediaCodec): DataFrame = {
    val spark = mediaDf.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] =
      mediaDf.select(col("doc_id"), col("payload")).as[MediaRow]
    media.mapPartitions { rows =>
      val codec = codecFactory() // per-partition codec init happens HERE
      rows.map(r => MediaFeatures(r.doc_id, r.payload.length.toLong, codec(r.payload)))
    }.toDF()
      .select(col("doc_id"), col("n_bytes"),
        posexplode(col("features")).as(Seq("feat_idx", "feature_value")))
      .select(col("doc_id"), col("n_bytes"),
        col("feat_idx").cast("long").as("feat_idx"), col("feature_value"))
      .orderBy("doc_id", "feat_idx")
  }

  /** DuckDB oracle for [[features]]: documents.text is ASCII, so byte i of
    * the UTF-8 payload is `ascii(substr(text, i+1, 1))`. */
  val featuresSql: String =
    """WITH d AS (
      |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text, n_bytes,
      |         unnest(range(0, least(8, n_bytes))) AS feat_idx
      |  FROM d)
      |SELECT doc_id, n_bytes, feat_idx,
      |       ascii(substr(text, CAST(feat_idx AS INT) + 1, 1)) / 255.0 AS feature_value
      |FROM f ORDER BY doc_id, feat_idx""".stripMargin

  /** Resize stub: nearest-neighbor downsample of the payload to a fixed
    * `r`-byte "thumbnail" (sample offset `(i*n) div r`) — the shape of an
    * image-resize kernel over the binary column: fixed output size per row,
    * pure per-row map work, exact integer offsets → DuckDB-oracle checkable.
    * A real codec would replace the byte sampler with pixel interpolation;
    * the schema/partitioning contract is identical. */
  def resize(docs: DataFrame, r: Int = 16): DataFrame =
    Tables.fanOut(docs)
      .select(col("doc_id"), octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        posexplode(expr(
          s"transform(sequence(0, ${r - 1}), i -> ascii(substring(text, CAST((i * length(text)) DIV $r AS INT) + 1, 1)))"))
          .as(Seq("idx", "sample_byte")))
      .select(col("doc_id"), col("n_bytes"), col("idx").cast("long").as("idx"),
        col("sample_byte").cast("long").as("sample_byte"))
      .orderBy("doc_id", "idx")

  val resizeSql: String =
    """WITH d AS (
      |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |f AS (SELECT doc_id, text, n_bytes, unnest(range(0, 16)) AS idx FROM d)
      |SELECT doc_id, n_bytes, idx,
      |  CAST(ascii(substr(text, CAST((idx * length(text)) // 16 AS INT) + 1, 1)) AS BIGINT) AS sample_byte
      |FROM f ORDER BY doc_id, idx""".stripMargin

  /** Frame-level exact dedup across the corpus — the video-pipeline
    * "identical frame removal" stage: payloads slice into 16-byte frames
    * (the same slicing as [[frameSample]]), each frame fingerprints by
    * md5, and fingerprints occurring more than once report occurrence
    * count, document spread, and the canonical keeper (lowest (doc, idx)
    * occurrence, via one `min(struct(...))` — no per-group ranking
    * window). The aggregation shuffles 16-byte hashes, map-side combined —
    * never frame bytes; at 100 TB this is the frame-dedup shape exactly
    * like [[graft.operators.Dedup.exact]] is the document one.
    *
    * Empty payloads are filtered on BOTH engines: Spark's
    * `sequence(0, (octet_length-1) div 16)` would yield one empty frame for
    * a zero-length payload while the oracle's `range(0, (n-1)//16 + 1)`
    * yields none — an explicit `octet_length > 0` guard keeps the
    * engines (and the semantics: no bytes, no frames) aligned. */
  def dupFrames(docs: DataFrame): DataFrame =
    Tables.fanOut(docs).select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, (octet_length(payload) - 1) div 16), " +
          "i -> substring(payload, i * 16 + 1, 16))"))
        .as(Seq("frame_idx", "frame")))
      .groupBy(md5(col("frame")).as("frame_md5"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("frame_idx").cast("long").as("fi"))).as("k"))
      .filter(col("n_occurrences") > 1)
      .select(col("frame_md5"), col("n_occurrences"), col("n_docs"),
        col("k.doc_id").as("keep_doc"), col("k.fi").as("keep_idx"))
      .orderBy("frame_md5")

  /** DuckDB oracle for [[dupFrames]] (byte = character: ASCII corpus, and
    * md5 consumes the same UTF-8 bytes in both engines). */
  val dupFramesSql: String =
    """WITH d AS (
      |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents WHERE octet_length(encode(text)) > 0),
      |f AS (SELECT doc_id, unnest(range(0, (n - 1) // 16 + 1)) AS i, text FROM d),
      |fr AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
      |         md5(substr(text, CAST(i * 16 AS INT) + 1, 16)) AS frame_md5 FROM f),
      |g AS (SELECT frame_md5, CAST(count(*) AS BIGINT) AS n_occurrences,
      |        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |      FROM fr GROUP BY 1 HAVING count(*) > 1),
      |k AS (SELECT frame_md5, doc_id AS keep_doc, i AS keep_idx FROM (
      |        SELECT frame_md5, doc_id, i,
      |          ROW_NUMBER() OVER (PARTITION BY frame_md5 ORDER BY doc_id, i) AS rn
      |        FROM fr) WHERE rn = 1)
      |SELECT g.frame_md5, n_occurrences, n_docs, keep_doc, keep_idx
      |FROM g JOIN k USING (frame_md5) ORDER BY frame_md5""".stripMargin

  // ───────────────────── MP4 CONTAINER METADATA ─────────────────────
  // The dominant real-world video container through the codec seam,
  // metadata tier: pure-JDK ISO-BMFF (MP4) box parsing — no codec, no
  // external dependency — reading what a curation pipeline needs before it
  // ever decodes a frame: track count, movie timescale/duration, and the
  // video track's presentation dimensions from the moov/mvhd/trak/tkhd
  // boxes. Frame DECODE stays out of scope by design (H.264 entropy
  // decoding has no JDK codec); the metadata tier is the real, drop-in
  // part, and the parser handles both 32-bit (version 0) and 64-bit
  // (version 1) headers plus `largesize`/to-end-of-file box sizes and
  // mdat-before-moov ordering (spec-pinned).

  /** Parsed MP4 movie metadata: track count, mvhd timescale/duration, and
    * the first visual track's 16.16-fixed presentation dimensions. */
  final case class Mp4Meta(nTracks: Int, timescale: Long, duration: Long,
      width: Double, height: Double)

  /** Parse the moov metadata out of an MP4/ISO-BMFF payload. Undecodable,
    * truncated, or moov-less bytes → None — the droppable-row convention of
    * every codec in this file. */
  def mp4Metadata(payload: Array[Byte]): Option[Mp4Meta] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload) // ISO-BMFF is big-endian
      def u32(off: Long): Long = bb.getInt(off.toInt) & 0xffffffffL
      def u64(off: Long): Long = bb.getLong(off.toInt)
      def boxType(off: Long): String =
        new String(payload, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // children of [start, end) as (type, payloadStart, payloadEnd);
      // malformed sizes throw → the outer catch returns None
      def boxes(start: Long, end: Long): Seq[(String, Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var p = start
        while (p + 8 <= end) {
          val sz0 = u32(p)
          val tpe = boxType(p + 4)
          val (hdr, sz) =
            if (sz0 == 1L) (16L, u64(p + 8)) // largesize
            else if (sz0 == 0L) (8L, end - p) // box extends to end
            else (8L, sz0)
          require(sz >= hdr && p + sz <= end, s"malformed box $tpe")
          out += ((tpe, p + hdr, p + sz))
          p += sz
        }
        out.toSeq
      }
      val inMoov = boxes(0, payload.length).find(_._1 == "moov")
        .map { case (_, s, e) => boxes(s, e) }
      inMoov.flatMap { children =>
        children.find(_._1 == "mvhd").map { case (_, m, _) =>
          val v = payload(m.toInt) & 0xff
          // v0: ver/flags(4) ctime(4) mtime(4) ts(4) dur(4)
          // v1: ver/flags(4) ctime(8) mtime(8) ts(4) dur(8)
          val (ts, dur) =
            if (v == 1) (u32(m + 20), u64(m + 24)) else (u32(m + 12), u32(m + 16))
          val traks = children.filter(_._1 == "trak")
          // the video track = first trak whose tkhd carries nonzero
          // presentation dims (audio/hint tracks store 0×0)
          val dims = traks.iterator.flatMap { case (_, s, e) =>
            boxes(s, e).find(_._1 == "tkhd").flatMap { case (_, k, _) =>
              val kv = payload(k.toInt) & 0xff
              // ver/flags + times/id/reserved/duration, then
              // reserved(8) layer(2) alt(2) volume(2) reserved(2) matrix(36)
              val base = k + 4 + (if (kv == 1) 32L else 20L) + 8 + 2 + 2 + 2 + 2 + 36
              val w = u32(base) / 65536.0
              val h = u32(base + 4) / 65536.0
              if (w > 0 && h > 0) Some((w, h)) else None
            }
          }.nextOption().getOrElse((0.0, 0.0))
          Mp4Meta(traks.size, ts, dur, dims._1, dims._2)
        }
      }
    } catch { case _: Throwable => None }

  /** Build a minimal VALID MP4 (ftyp + mdat + moov[mvhd, traks]) — the
    * synthetic-fixture writer the oracle rows and the spec drive the REAL
    * parser with. The LAST track carries the video dims (leading 0×0
    * audio/hint tracks force the parser's skip-nonvisual path on every
    * multi-track fixture); `version` selects 32- vs 64-bit mvhd/tkhd
    * headers; mdat deliberately precedes moov (the common
    * progressive-upload layout parsers must not assume away). With
    * `sampleDeltas` nonempty the video track also gains a real sample
    * table (`mdia/mdhd` media timescale + `stbl/stts` time-to-sample runs
    * + `stbl/stss` sync samples) for the keyframe parser. */
  private[graft] def buildMp4(timescale: Long, duration: Long, width: Double,
      height: Double, nTracks: Int, version: Int = 0,
      mediaTimescale: Long = 0L, sampleDeltas: Seq[(Long, Long)] = Seq.empty,
      syncSamples: Seq[Long] = Seq.empty): Array[Byte] = {
    def be(n: Int, v: Long): Array[Byte] =
      (1 to n).map(i => ((v >>> (8 * (n - i))) & 0xff).toByte).toArray
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be(4, 8L + payload.length) ++
        tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload
    val unityMatrix = be(4, 0x00010000L) ++ be(4, 0) ++ be(4, 0) ++
      be(4, 0) ++ be(4, 0x00010000L) ++ be(4, 0) ++
      be(4, 0) ++ be(4, 0) ++ be(4, 0x40000000L)
    val timeW = if (version == 1) 8 else 4
    val mvhd = box("mvhd", be(1, version) ++ be(3, 0) ++ // version + flags
      be(timeW, 0) ++ be(timeW, 0) ++ // ctime, mtime
      be(4, timescale) ++ be(timeW, duration) ++
      be(4, 0x00010000L) ++ be(2, 0x0100) ++ be(10, 0) ++ // rate, volume, reserved
      unityMatrix ++ Array.fill(24)(0.toByte) ++ be(4, nTracks + 1L))
    def fixed(v: Double): Long = Math.round(v * 65536.0)
    // the video track's media hierarchy: mdia[mdhd, minf[stbl[stts, stss]]]
    val mdia: Array[Byte] =
      if (sampleDeltas.isEmpty) Array.empty[Byte]
      else {
        val mdhd = box("mdhd", be(1, version) ++ be(3, 0) ++
          be(timeW, 0) ++ be(timeW, 0) ++
          be(4, mediaTimescale) ++ be(timeW, duration) ++ be(2, 0x55c4) ++ be(2, 0))
        val stts = box("stts", be(4, 0) ++ be(4, sampleDeltas.size.toLong) ++
          sampleDeltas.flatMap { case (cnt, d) => be(4, cnt) ++ be(4, d) }.toArray)
        val stss = box("stss", be(4, 0) ++ be(4, syncSamples.size.toLong) ++
          syncSamples.flatMap(be(4, _)).toArray)
        box("mdia", mdhd ++ box("minf", box("stbl", stts ++ stss)))
      }
    def trak(id: Int, w: Double, h: Double, media: Array[Byte]): Array[Byte] =
      box("trak", box("tkhd", be(1, version) ++ be(3, 7) ++
        be(timeW, 0) ++ be(timeW, 0) ++ be(4, id.toLong) ++ be(4, 0) ++
        be(timeW, duration) ++ be(8, 0) ++ be(2, 0) ++ be(2, 0) ++
        be(2, 0) ++ be(2, 0) ++ unityMatrix ++
        be(4, fixed(w)) ++ be(4, fixed(h))) ++ media)
    val traks = (1 to nTracks).map(i =>
      if (i == nTracks) trak(i, width, height, mdia)
      else trak(i, 0.0, 0.0, Array.empty[Byte]))
    box("ftyp", "isom".getBytes ++ be(4, 0x200) ++ "isomiso2".getBytes) ++
      box("mdat", Array.fill(16)(0x55.toByte)) ++
      box("moov", mvhd ++ traks.flatten.toArray)
  }

  /** KEYFRAME extraction from the MP4 sample tables — the second tier of
    * the container story (what a frame-sampling pipeline seeks to before
    * decoding anything): the VIDEO track's sync samples (`stbl/stss`) with
    * their decode times from the time-to-sample runs (`stbl/stts`) on the
    * media timescale (`mdia/mdhd`). Returns `(sample_no, time_sec)` per
    * keyframe, empty when the payload is undecodable or the video track
    * carries no stss (per ISO-BMFF an ABSENT stss means every sample is a
    * sync sample — a degenerate answer a caller should not mistake for a
    * keyframe list, so it is reported as empty rather than materialized).
    * Handles multi-run stts (the cumulative walk) and v0/v1 mdhd. */
  def mp4Keyframes(payload: Array[Byte]): Seq[(Long, Double)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
      def u32(off: Long): Long = bb.getInt(off.toInt) & 0xffffffffL
      def u64(off: Long): Long = bb.getLong(off.toInt)
      def boxType(off: Long): String =
        new String(payload, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def boxes(start: Long, end: Long): Seq[(String, Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var p = start
        while (p + 8 <= end) {
          val sz0 = u32(p)
          val tpe = boxType(p + 4)
          val (hdr, sz) =
            if (sz0 == 1L) (16L, u64(p + 8))
            else if (sz0 == 0L) (8L, end - p)
            else (8L, sz0)
          require(sz >= hdr && p + sz <= end, s"malformed box $tpe")
          out += ((tpe, p + hdr, p + sz))
          p += sz
        }
        out.toSeq
      }
      def child(parent: (String, Long, Long), tpe: String): Option[(String, Long, Long)] =
        boxes(parent._2, parent._3).find(_._1 == tpe)

      val result = for {
        moov <- boxes(0, payload.length).find(_._1 == "moov")
        trak <- boxes(moov._2, moov._3).filter(_._1 == "trak").find { t =>
          // the video track: nonzero tkhd dims (same rule as mp4Metadata)
          child(t, "tkhd").exists { case (_, k, _) =>
            val kv = payload(k.toInt) & 0xff
            val base = k + 4 + (if (kv == 1) 32L else 20L) + 8 + 2 + 2 + 2 + 2 + 36
            u32(base) > 0 && u32(base + 4) > 0
          }
        }
        mdia <- child(trak, "mdia")
        mdhd <- child(mdia, "mdhd")
        stbl <- child(mdia, "minf").flatMap(child(_, "stbl"))
        stts <- child(stbl, "stts")
        stss <- child(stbl, "stss")
      } yield {
        val mv = payload(mdhd._2.toInt) & 0xff
        val mts = if (mv == 1) u32(mdhd._2 + 20) else u32(mdhd._2 + 12)
        // stts runs: (sample_count, sample_delta)*
        val nRuns = u32(stts._2 + 4)
        val runs = (0L until nRuns).map(i =>
          (u32(stts._2 + 8 + i * 8), u32(stts._2 + 12 + i * 8)))
        // decode-time ticks at the START of 1-based sample n
        def ticksOf(n: Long): Long = {
          var remaining = n - 1
          var ticks = 0L
          runs.foreach { case (cnt, delta) =>
            val take = math.min(remaining, cnt)
            ticks += take * delta
            remaining -= take
          }
          ticks
        }
        val nSync = u32(stss._2 + 4)
        (0L until nSync).map { i =>
          val sample = u32(stss._2 + 8 + i * 4)
          (sample, ticksOf(sample).toDouble / mts)
        }
      }
      result.getOrElse(Seq.empty)
    } catch { case _: Throwable => Seq.empty }

  /** The `mm_video_keyframes` operator — [[videoMetadata]]'s second tier:
    * per document, synthesize an MP4 whose video track carries a real
    * sample table from a deterministic rule, extract keyframes through
    * [[mp4Keyframes]], emit the PARSED `(kf_idx, sample_no, time_sec)`
    * rows. The oracle replays the rule, so the hash gate proves the
    * stts/stss writer+parser round-trip (single-run stts here; the
    * multi-run cumulative walk is spec-pinned on hand-built tables). */
  def videoKeyframes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Tables.fanOut(docs)
      .select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("nb"))
      .as[(Long, Long)]
      .flatMap { case (id, nb) =>
        val mts = 600L * (1 + id % 4)
        val nSamples = 10 + (nb % 41)
        val delta = 400L + (id % 7) * 25
        val keyEvery = 1 + (id % 5)
        val sync = 1L.to(nSamples, keyEvery)
        val m = buildMp4(1000L, nSamples * delta, 320.0, 240.0,
          nTracks = (1 + id % 2).toInt, version = (id % 2).toInt,
          mediaTimescale = mts, sampleDeltas = Seq((nSamples, delta)),
          syncSamples = sync)
        mp4Keyframes(m).zipWithIndex.map { case ((sample, t), i) =>
          (id, i.toLong, sample, t)
        }
      }
      .toDF("doc_id", "kf_idx", "sample_no", "time_sec")
      .orderBy("doc_id", "kf_idx")
  }

  /** DuckDB oracle for [[videoKeyframes]] — the generation rule replayed
    * (sample `1 + i·ke` starts at `i·ke·delta` ticks on the media
    * timescale). */
  val videoKeyframesSql: String =
    """WITH d AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents),
      |p AS (SELECT doc_id,
      |        600 * (1 + doc_id % 4) AS mts,
      |        10 + (nb % 41) AS ns,
      |        400 + (doc_id % 7) * 25 AS delta,
      |        1 + (doc_id % 5) AS ke FROM d),
      |k AS (SELECT doc_id, mts, delta, ke,
      |        unnest(range(0, (ns - 1) // ke + 1)) AS i FROM p)
      |SELECT doc_id, CAST(i AS BIGINT) AS kf_idx,
      |  CAST(1 + i * ke AS BIGINT) AS sample_no,
      |  CAST(i * ke * delta AS DOUBLE) / mts AS time_sec
      |FROM k ORDER BY doc_id, kf_idx""".stripMargin

  /** The `mm_video_metadata` operator: synthesize a real MP4 per document
    * from a deterministic rule of `(doc_id, byte_size)`, parse it back
    * through [[mp4Metadata]], and emit the PARSED values. The oracle
    * recomputes the same rule directly, so the hash gate proves the
    * container writer+parser round-trip bit-exactly — the same
    * synthesize-then-really-process discipline as the fake decoders, but
    * with genuine ISO-BMFF bytes in the middle. mapPartitions batch shape,
    * like every codec path here. */
  def videoMetadata(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Tables.fanOut(docs)
      .select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("nb"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nb) =>
          val ts = 600 + (id % 5) * 100
          val dur = nb * 25
          val w = 16.0 * (1 + id % 40)
          val h = 16.0 * (1 + id % 23)
          val nT = (1 + id % 3).toInt
          val m = mp4Metadata(buildMp4(ts, dur, w, h, nT, version = (id % 2).toInt))
            .getOrElse(sys.error(s"synthetic mp4 failed to parse for doc $id"))
          (id, m.nTracks.toLong, m.timescale, m.duration,
            m.duration.toDouble / m.timescale, m.width, m.height)
        }
      }
      .toDF("doc_id", "n_tracks", "timescale", "duration", "duration_sec",
        "width", "height")
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[videoMetadata]]: the generation rule replayed
    * directly (the oracle never parses MP4 — equality proves the Spark
    * side's writer+parser round-trip). */
  val videoMetadataSql: String =
    """SELECT doc_id,
      |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
      |  CAST(600 + (doc_id % 5) * 100 AS BIGINT) AS timescale,
      |  CAST(octet_length(encode(text)) * 25 AS BIGINT) AS duration,
      |  CAST(octet_length(encode(text)) * 25 AS DOUBLE)
      |    / (600 + (doc_id % 5) * 100) AS duration_sec,
      |  CAST(16 * (1 + doc_id % 40) AS DOUBLE) AS width,
      |  CAST(16 * (1 + doc_id % 23) AS DOUBLE) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

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
