package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The codec injection seam: [[Multimodal.features]] must accept a REAL
  * decoder without any operator change — proven here with an actual PPM
  * (P6) header parser, the one image format parseable with zero codec
  * libraries. Also pins the per-partition-instantiation contract and the
  * empty-array = "no feature rows" convention. */
class MultimodalCodecSpec extends SparkSpec {

  import MultimodalCodecSpec.ppmHeader

  test("a real PPM header parser drops into the features seam unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "P6\n12 34\n255\nRGBRGB"), // valid header + pixel bytes
      (2L, "P6\n640 480\n255\n"),     // valid header, no pixels
      (3L, "not an image")            // undecodable -> zero feature rows
    ).toDF("doc_id", "text")

    val out = Multimodal.features(docs, MultimodalCodecSpec.ppmFactory)
    // the seam changes the codec, not the contract: same schema as default
    assert(out.schema == Multimodal.features(docs).schema)

    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(rows == Map(
      (1L, 0L) -> 12.0, (1L, 1L) -> 34.0, (1L, 2L) -> 255.0,
      (2L, 0L) -> 640.0, (2L, 1L) -> 480.0, (2L, 2L) -> 255.0))
    assert(!rows.keys.exists(_._1 == 3L), "undecodable payload must emit no rows")
  }

  test("the JDK image codec decodes REAL PNG bytes through the unchanged seam") {
    import spark.implicits._
    // actual PNG streams, written by the same JDK codec family that reads
    // them — arbitrary binary, so they ride featuresOf's payload column
    // (PNG bytes are not valid UTF-8 and cannot pose as a text column)
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(3, 2, 0x336699)),
      (2L, png(1, 1, 0xffffff)),
      (3L, "not an image".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .toDF("doc_id", "payload")
    val out = Multimodal.featuresOf(media, Multimodal.imageFactory).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // [width, height, meanR, meanG, meanB]; PNG is lossless so the solid
    // fills decode to exact channel constants
    assert(out == Map(
      (1L, 0L) -> 3.0, (1L, 1L) -> 2.0,
      (1L, 2L) -> 0x33.toDouble, (1L, 3L) -> 0x66.toDouble, (1L, 4L) -> 0x99.toDouble,
      (2L, 0L) -> 1.0, (2L, 1L) -> 1.0,
      (2L, 2L) -> 255.0, (2L, 3L) -> 255.0, (2L, 4L) -> 255.0), out.toString)
    assert(!out.keys.exists(_._1 == 3L), "non-image bytes must emit no rows")
  }

  test("the same seam decodes JPEG (second JDK codec family; lossy, so dims-only asserts)") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, 0x804020)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val media = Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.featuresOf(media, Multimodal.imageFactory).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // width/height are exact for any codec; JPEG quantizes the channel
    // means, so bound them instead of pinning
    assert(out(0L) == 5.0 && out(1L) == 4.0, out.toString)
    for (i <- 2L to 4L) assert(out(i) >= 0.0 && out(i) <= 255.0)
  }

  test("the JDK audio codec decodes REAL WAV bytes through the unchanged seam (second modality)") {
    import spark.implicits._
    // real RIFF/WAVE streams written by the same JDK family that reads
    // them: 16-bit PCM with CONSTANT per-channel amplitude, so the RMS is
    // exactly |amp| (sqrt of a perfect square) and every assert is exact
    def wav(frames: Int, rate: Float, amps: Seq[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, rate, 16, amps.size,
        2 * amps.size, rate, false)
      val data = new Array[Byte](frames * 2 * amps.size)
      for (f <- 0 until frames; c <- amps.indices) {
        val off = (f * amps.size + c) * 2
        data(off) = (amps(c) & 0xff).toByte
        data(off + 1) = ((amps(c) >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, wav(8000, 8000f, Seq(1000.toShort, (-2000).toShort))), // 1 s stereo
      (2L, wav(4000, 16000f, Seq(512.toShort))),                  // 0.25 s mono
      (3L, "definitely not audio".getBytes)                       // no rows
    ).toDF("doc_id", "payload")
    val out = Multimodal.featuresOf(media, Multimodal.audioFactory).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // [n_channels, sample_rate, n_frames, duration_sec, rms per channel]
    assert(out((1L, 0L)) == 2.0 && out((1L, 1L)) == 8000.0, out.toString)
    assert(out((1L, 2L)) == 8000.0 && out((1L, 3L)) == 1.0)
    assert(out((1L, 4L)) == 1000.0 && out((1L, 5L)) == 2000.0,
      "per-channel RMS must be exact for constant amplitudes")
    assert(out((2L, 0L)) == 1.0 && out((2L, 1L)) == 16000.0)
    assert(out((2L, 2L)) == 4000.0 && out((2L, 3L)) == 0.25)
    assert(out((2L, 4L)) == 512.0)
    assert(!out.keys.exists(_._1 == 3L), "undecodable payload must emit no rows")
  }

  test("compressed audio (G.711 u-law AU) rides the same seam via the JDK codec SPI") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import javax.sound.sampled.AudioFormat.Encoding
    // fixture: a deterministic 16-bit PCM ramp, transcoded to 8-bit u-law
    // by the JDK's OWN encoder and containerized as AU (u-law's native
    // container). The EXPECTED stats come from an INDEPENDENT pure-Scala
    // G.711 expansion of the u-law payload bytes — so the test pins the
    // JDK decode path against the published standard, not against itself.
    val rate = 8000f
    val frames = 4000
    val pcm = new Array[Byte](frames * 2)
    for (f <- 0 until frames) {
      val v = (((f * 17) % 16384) - 8192).toShort // deterministic ramp
      pcm(2 * f) = (v & 0xff).toByte
      pcm(2 * f + 1) = ((v >> 8) & 0xff).toByte
    }
    val pcmFmt = new AudioFormat(Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val ulawFmt = new AudioFormat(Encoding.ULAW, rate, 8, 1, 1, rate, false)
    val ulawStream = AudioSystem.getAudioInputStream(ulawFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), pcmFmt, frames.toLong))
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawStream, AudioFileFormat.Type.AU, bos)
    val au = bos.toByteArray

    // independent G.711 u-law expansion (CCITT standard formula) over the
    // AU payload (data offset = big-endian int at bytes 4..7)
    def ulaw2linear(u0: Byte): Int = {
      val u = ~u0 & 0xff
      val sign = u & 0x80
      val exp = (u >> 4) & 0x07
      val mant = u & 0x0f
      val mag = (((mant << 3) + 0x84) << exp) - 0x84
      if (sign != 0) -mag else mag
    }
    val dataOff = java.nio.ByteBuffer.wrap(au, 4, 4).getInt
    val samples = au.drop(dataOff).map(ulaw2linear)
    assert(samples.length == frames)
    val expectedRms = math.sqrt(
      samples.map(v => v.toLong * v).sum.toDouble / frames)

    val media = Seq((1L, au)).toDF("doc_id", "payload")
    val out = Multimodal.featuresOf(media, Multimodal.audioFactory).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(out(0L) == 1.0 && out(1L) == 8000.0, out.toString)
    assert(out(2L) == frames.toDouble && out(3L) == 0.5)
    assert(out(4L) == expectedRms,
      s"JDK u-law expansion must equal the G.711 standard: got ${out(4L)}, want $expectedRms")
  }

  test("a third PCM container (AIFF, big-endian) decodes through the unchanged stats loop") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import javax.sound.sampled.AudioFormat.Encoding
    val rate = 11025f
    val frames = 2205
    val amp = 700.toShort
    val fmt = new AudioFormat(Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, true) // big-endian
    val data = new Array[Byte](frames * 2)
    for (f <- 0 until frames) {
      data(2 * f) = ((amp >> 8) & 0xff).toByte
      data(2 * f + 1) = (amp & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    val media = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.featuresOf(media, Multimodal.audioFactory).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(out(0L) == 1.0 && out(1L) == 11025.0 && out(2L) == frames.toDouble)
    assert(out(3L) == 0.2 && out(4L) == 700.0,
      "constant-amplitude AIFF must yield exact duration and RMS")
  }

  test("the frame seam decodes a REAL animated GIF: one feature vector per frame") {
    import spark.implicits._
    // a true multi-frame container written by the JDK's own GIF sequence
    // writer; solid-color frames survive GIF's palette quantization
    // exactly, so dims AND channel means assert exactly per frame
    def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val gif = animatedGif(Seq(
      solid(4, 3, 0xff0000), solid(4, 3, 0x00ff00), solid(4, 3, 0x0000ff)))
    val media = Seq(
      (1L, gif),
      (2L, "not a container".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.frameFeaturesOf(media, Multimodal.gifFrameFactory).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)) -> r.getDouble(4)).toMap
    val frames = out.keys.filter(_._1 == 1L).map(_._2).toSet
    assert(frames == Set(0L, 1L, 2L), s"3 frames expected, got $frames")
    for (f <- 0L to 2L) {
      assert(out((1L, f, 0L)) == 4.0 && out((1L, f, 1L)) == 3.0, s"frame $f dims")
    }
    // frame 0 pure red, 1 pure green, 2 pure blue — means exact
    assert(out((1L, 0L, 2L)) == 255.0 && out((1L, 0L, 3L)) == 0.0 && out((1L, 0L, 4L)) == 0.0)
    assert(out((1L, 1L, 2L)) == 0.0 && out((1L, 1L, 3L)) == 255.0 && out((1L, 1L, 4L)) == 0.0)
    assert(out((1L, 2L, 2L)) == 0.0 && out((1L, 2L, 3L)) == 0.0 && out((1L, 2L, 4L)) == 255.0)
    assert(!out.keys.exists(_._1 == 2L), "undecodable payload must emit no rows")
  }

  test("the SAME frame codec decodes a multi-page TIFF: ImageIO picks the reader by magic") {
    // the codec never names GIF: getImageReaders() sniffs the container, so
    // any multi-image format with a JDK reader flows through the unchanged
    // seam — this pins that generality claim with the JDK's second
    // multi-image container (multi-page TIFF, lossless, exact asserts;
    // pages may differ in dims, unlike GIF frames sharing a screen)
    import spark.implicits._
    def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    def multiPageTiff(pages: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      pages.foreach(p =>
        writer.writeToSequence(new javax.imageio.IIOImage(p, null, null), null))
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val tiff = multiPageTiff(Seq(
      solid(4, 3, 0xff0000), solid(6, 5, 0x0a141e), solid(2, 2, 0xffffff)))
    val media = Seq((7L, tiff)).toDF("doc_id", "payload")
    val out = Multimodal.frameFeaturesOf(media, Multimodal.gifFrameFactory).collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getDouble(4)).toMap
    assert(out.keys.map(_._1).toSet == Set(0L, 1L, 2L), s"3 pages: ${out.keys}")
    // page 0: 4x3 red; page 1: 6x5 rgb(10,20,30); page 2: 2x2 white
    assert(out((0L, 0L)) == 4.0 && out((0L, 1L)) == 3.0 && out((0L, 2L)) == 255.0)
    assert(out((1L, 0L)) == 6.0 && out((1L, 1L)) == 5.0 &&
      out((1L, 2L)) == 10.0 && out((1L, 3L)) == 20.0 && out((1L, 4L)) == 30.0)
    assert(out((2L, 0L)) == 2.0 && out((2L, 1L)) == 2.0 &&
      out((2L, 2L)) == 255.0 && out((2L, 3L)) == 255.0 && out((2L, 4L)) == 255.0)
  }

  test("composited FrameCodec: delta-rect GIF frames yield full logical-screen stats") {
    import spark.implicits._
    import javax.imageio.metadata.IIOMetadataNode

    def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      img
    }

    /** A SIZE-OPTIMIZED animated GIF: later frames are small delta rects
      * placed at explicit (left, top) offsets with doNotDispose — the
      * inter-frame-compression shape real optimizers emit. */
    def deltaGif(frames: Seq[(java.awt.image.BufferedImage, Int, Int)]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (img, left, top) =>
        val param = writer.getDefaultWriteParam
        val md = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), param)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[IIOMetadataNode]
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        val gce = {
          val l = tree.getElementsByTagName("GraphicControlExtension")
          if (l.getLength > 0) l.item(0).asInstanceOf[IIOMetadataNode]
          else { val n = new IIOMetadataNode("GraphicControlExtension"); tree.appendChild(n); n }
        }
        gce.setAttribute("disposalMethod", "doNotDispose")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        md.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), param)
      }
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      bos.toByteArray
    }

    // frame 0: full 8×6 red screen; frame 1: 2×2 green delta at (3,2);
    // frame 2: 2×2 blue delta at (0,0) — 48 screen pixels throughout
    val gif = deltaGif(Seq(
      (solid(8, 6, 0xff0000), 0, 0),
      (solid(2, 2, 0x00ff00), 3, 2),
      (solid(2, 2, 0x0000ff), 0, 0)))
    val media = Seq((1L, gif)).toDF("doc_id", "payload")

    def grab(factory: () => Multimodal.FrameCodec): Map[(Long, Long), Double] =
      Multimodal.frameFeaturesOf(media, factory).collect()
        .map(r => (r.getLong(2), r.getLong(3)) -> r.getDouble(4)).toMap

    // raw codec: frames come back AS STORED — the deltas are 2×2
    val raw = grab(Multimodal.gifFrameFactory)
    assert(raw((1L, 0L)) == 2.0 && raw((1L, 1L)) == 2.0, "raw = stored delta rect")

    // composited codec: EVERY frame describes the 8×6 logical screen
    val comp = grab(Multimodal.gifCompositedFactory)
    for (f <- 0L to 2L)
      assert(comp((f, 0L)) == 8.0 && comp((f, 1L)) == 6.0,
        s"composited frame $f must have logical-screen dims, " +
          s"got ${comp((f, 0L))}x${comp((f, 1L))}")
    // exact composited means over the 48-pixel screen:
    // f0 all red; f1 44 red + 4 green; f2 40 red + 4 green + 4 blue
    assert(comp((0L, 2L)) == 255.0 && comp((0L, 3L)) == 0.0)
    assert(comp((1L, 2L)) == 255.0 * 44 / 48 && comp((1L, 3L)) == 255.0 * 4 / 48)
    assert(comp((2L, 2L)) == 255.0 * 40 / 48 &&
      comp((2L, 3L)) == 255.0 * 4 / 48 && comp((2L, 4L)) == 255.0 * 4 / 48)
  }

  test("codec factory runs per partition, not per row, and not on the driver") {
    import spark.implicits._
    val docs = (1L to 64L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // count instantiations via an accumulator (executor-side increments).
    // features fans the input out to defaultParallelism partitions
    // (Tables.fanOut), so THAT is the expected instantiation count — not
    // any repartitioning done here
    val expected = spark.sparkContext.defaultParallelism.toLong
    val inits = spark.sparkContext.longAccumulator("codec-inits")
    val n = Multimodal.features(docs, MultimodalCodecSpec.countingFactory(inits)).count()
    assert(n == 64L, "one feature row per doc from the one-element vectors")
    assert(inits.value == expected,
      s"codec must instantiate once per partition ($expected), got ${inits.value}")
  }

  test("MP4 box parser: v0/v1 headers, largesize, to-EOF boxes, mdat-first, garbage") {
    import graft.operators.Multimodal.{buildMp4, mp4Metadata, Mp4Meta}
    // round trip at both header versions (the builder writes mdat BEFORE
    // moov — the progressive-upload layout — so ordering is covered too)
    assert(mp4Metadata(buildMp4(1000L, 90000L, 1920.0, 1080.0, 3, version = 0))
      .contains(Mp4Meta(3, 1000L, 90000L, 1920.0, 1080.0)))
    // v1 = 64-bit times: a duration past 2^32 must survive
    assert(mp4Metadata(buildMp4(600L, 5000000000L, 640.0, 480.0, 1, version = 1))
      .contains(Mp4Meta(1, 600L, 5000000000L, 640.0, 480.0)))
    // the video track is found by nonzero dims even when audio-shaped 0×0
    // tracks PRECEDE it (the builder deliberately puts the dimensioned
    // track last on multi-track fixtures)
    val bytes = buildMp4(1000L, 1L, 320.0, 240.0, 2)
    assert(mp4Metadata(bytes).exists(m => m.width == 320.0 && m.height == 240.0))

    // a LARGESIZE (size==1 + 64-bit size) top-level box before moov must
    // be skipped correctly; a trailing size==0 box extends to EOF
    def be(n: Int, v: Long): Array[Byte] =
      (1 to n).map(i => ((v >>> (8 * (n - i))) & 0xff).toByte).toArray
    val pad = Array.fill(24)(0x77.toByte)
    val largeFree = be(4, 1L) ++ "free".getBytes ++ be(8, 16L + pad.length) ++ pad
    val base = buildMp4(48000L, 96000L, 128.0, 72.0, 1)
    val toEof = be(4, 0L) ++ "skip".getBytes ++ Array.fill(7)(0x11.toByte)
    assert(mp4Metadata(largeFree ++ base ++ toEof)
      .contains(Mp4Meta(1, 48000L, 96000L, 128.0, 72.0)))

    // undecodable conventions: garbage, empty, truncated mid-box → None
    assert(mp4Metadata("not an mp4 at all".getBytes).isEmpty)
    assert(mp4Metadata(Array.empty[Byte]).isEmpty)
    assert(mp4Metadata(base.dropRight(10)).isEmpty,
      "a truncated moov must refuse to parse, not misread")
    // a file with boxes but no moov → None
    assert(mp4Metadata(be(4, 16L) ++ "ftyp".getBytes ++ "isomisom".getBytes).isEmpty)
  }

  test("MP4 keyframes: multi-run stts cumulative walk, v1 mdhd, stss-absent convention") {
    import graft.operators.Multimodal.{buildMp4, mp4Keyframes, mp4Metadata}
    // three stts runs: 4 samples @100 ticks, 2 @250, 5 @40 — keyframes at
    // samples straddling all three runs; media timescale 600
    val m = buildMp4(1000L, 1100L, 640.0, 480.0, nTracks = 2, version = 0,
      mediaTimescale = 600L,
      sampleDeltas = Seq((4L, 100L), (2L, 250L), (5L, 40L)),
      syncSamples = Seq(1L, 5L, 7L, 11L))
    val kf = mp4Keyframes(m)
    // decode-time ticks: s1=0, s5=4·100=400, s7=400+2·250=900,
    // s11=900+4·40=1060 — each divided by mts 600
    assert(kf == Seq((1L, 0.0), (5L, 400.0 / 600), (7L, 900.0 / 600),
      (11L, 1060.0 / 600)), s"cumulative stts walk: $kf")
    // v1 (64-bit) mdhd parses the timescale from the shifted offset
    val m1 = buildMp4(1000L, 300L, 320.0, 240.0, nTracks = 1, version = 1,
      mediaTimescale = 90000L, sampleDeltas = Seq((3L, 3000L)),
      syncSamples = Seq(1L, 3L))
    assert(mp4Keyframes(m1) == Seq((1L, 0.0), (3L, 6000.0 / 90000)))
    // a sample-table-less video track (the metadata-only fixtures) and an
    // stss-less one both report NO keyframes — never a fabricated list
    val noTables = buildMp4(1000L, 1L, 128.0, 72.0, 1)
    assert(mp4Keyframes(noTables).isEmpty)
    assert(mp4Metadata(noTables).nonEmpty, "metadata still parses without sample tables")
    assert(mp4Keyframes("garbage".getBytes).isEmpty)
  }
}

/** Codec factories live on the companion OBJECT: a factory closing over the
  * spec instance would drag the (non-serializable) ScalaTest engine into
  * the task closure — the exact driver-state-in-closure mistake the
  * factory seam exists to avoid. */
object MultimodalCodecSpec {
  /** A real (if minimal) codec: parse a binary PPM "P6\n<w> <h>\n<maxval>\n"
    * header and emit (width, height, maxval) as the feature vector;
    * undecodable payloads yield the empty vector. */
  val ppmHeader: Multimodal.MediaCodec = { payload =>
    val s = new String(payload, java.nio.charset.StandardCharsets.US_ASCII)
    "(?s)^P6\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s".r.findFirstMatchIn(s)
      .map(m => Array(m.group(1).toDouble, m.group(2).toDouble, m.group(3).toDouble))
      .getOrElse(Array.empty[Double])
  }

  val ppmFactory: () => Multimodal.MediaCodec = () => ppmHeader

  def countingFactory(
      inits: org.apache.spark.util.LongAccumulator): () => Multimodal.MediaCodec =
    () => { inits.add(1); (p: Array[Byte]) => Array(p.length.toDouble) }
}
