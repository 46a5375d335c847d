package graft

import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.functions._

/** mm01–mm03 — multimodal binary-column plumbing (SURVEY §2.10). */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, sf)

  test("mm01: media schema is binary payload + typed metadata, metadata queries never touch payload") {
    assert(media.schema.map(f => (f.name, f.dataType)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    val byKind = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet === Set("image", "audio", "video"))
    assert(byKind.values.sum === media.count())
    // metadata-only plan must prune the payload column at the scan
    val plan = media.toDF().select("media_id", "kind", "width").queryExecution
      .executedPlan.toString
    assert(!plan.contains("payload"), "payload column not pruned from metadata-only scan")
  }

  test("mm02: stubbed per-partition decode yields deterministic fixed-size features") {
    val feats = Multimodal.decodeFeatures(media, dim = 16)
    val rows = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.feature.length === 16))
    // deterministic: same input → bit-identical features
    val again = Multimodal.decodeFeatures(media, dim = 16).collect()
    val a = rows.sortBy(_.media_id).map(_.feature.toSeq)
    val b = again.sortBy(_.media_id).map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
    // distributed: runs as one decode pass per partition, no repartition
    assert(feats.rdd.getNumPartitions === media.rdd.getNumPartitions)
  }

  test("mm04: decoded features feed the ANN path end-to-end") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    // media → stub decode → featureEmbeddings bridge → cosine top-3 of
    // one image + LSH bucketing: the full multimodal-similarity
    // composition on the §2.8 schema contract
    // zero-norm rows are dropped by the bridge itself (NaN-cosine guard)
    val feats = Multimodal.featureEmbeddings(Multimodal.decodeFeatures(media, dim = 16))
    val q = feats.filter(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qf"), col("nrm").as("qn"))
    val top = feats.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("vec_id"), cosine(col("qf"), col("embedding"), col("qn"), col("nrm")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(3)
      .collect()
    assert(top.length === 3)
    assert(top.forall(r => r.getDouble(1) <= 1.0 + 1e-9 && r.getDouble(1) >= -1.0 - 1e-9))
    // and the same frame drops into the LSH index unchanged: every
    // vector lands in exactly `tables` buckets
    val buckets = graft.ann.Knn.lshTables(feats, tables = 4, planes = 3)
    assert(buckets.count() === feats.count() * 4)
  }

  // -- real-decode path: JDK-builtin PNG codec, no external libraries

  private def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("mm02: real PNG payloads decode to pooled pixel features; non-image kinds keep the stub") {
    val spark0 = spark
    import spark0.implicits._
    val grey = png(32, 24, (_, _) => 0x808080)
    val half = png(32, 24, (x, _) => if (x < 16) 0x000000 else 0xffffff)
    val noise = "definitely not an image".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "image", 32, 24, 1, 0, grey),
      MediaRow(2L, "image", 32, 24, 1, 0, half),
      MediaRow(3L, "audio", 0, 0, 1, 16000, noise),
      // an image-kind payload ImageIO cannot read must fall back, not throw
      MediaRow(4L, "image", 0, 0, 1, 0, noise)).toDS()
    val feats = Multimodal.decodeFeatures(rows, dim = 16).collect()
      .map(f => f.media_id -> f.feature).toMap
    // solid mid-grey: every pooled cell is exactly 128/255
    assert(feats(1L).forall(v => math.abs(v - 128f / 255f) < 1e-6))
    // half black / half white, 4x4 row-major grid: left two columns 0, right two 1
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val want = if (cx < 2) 0f else 1f
      assert(math.abs(feats(2L)(cy * 4 + cx) - want) < 1e-6,
        s"cell ($cy,$cx) = ${feats(2L)(cy * 4 + cx)}, want $want")
    }
    // non-image kind and undecodable image bytes: bit-identical stub fallback
    assert(feats(3L).toSeq === Multimodal.stubDecode(noise, 16).toSeq)
    assert(feats(4L).toSeq === Multimodal.stubDecode(noise, 16).toSeq)
  }

  test("mm02: a corrupt payload behind a valid PNG magic falls back to the stub, never throws") {
    val spark0 = spark
    import spark0.implicits._
    // valid 8-byte PNG signature + garbage body — the shape a crawled
    // corpus actually contains; plugin parse errors must not fail the task
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)
    val truncated = png(16, 16, (_, _) => 0x336699).take(40) // headers cut mid-chunk
    val rows = Seq(
      MediaRow(10L, "image", 16, 16, 1, 0, corrupt),
      MediaRow(11L, "image", 16, 16, 1, 0, truncated)).toDS()
    val feats = Multimodal.decodeFeatures(rows, dim = 16).collect()
      .map(f => f.media_id -> f.feature).toMap
    assert(feats(10L).toSeq === Multimodal.stubDecode(corrupt, 16).toSeq)
    assert(feats(11L).toSeq === Multimodal.stubDecode(truncated, 16).toSeq)
  }

  // -- real-decode path: JDK-builtin WAV codec, no external libraries

  private def wav(samples: Array[Short], channels: Int, rate: Float): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, channels, 2 * channels, rate, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("mm02: real WAV payloads decode to per-window RMS features; stereo mixes to mono") {
    val spark0 = spark
    import spark0.implicits._
    // 16 time windows of 100 mono frames each; window k holds the
    // constant amplitude k*2048, so its RMS is exactly k*2048/32768
    val mono = Array.tabulate[Short](1600)(i => ((i / 100) * 2048).toShort)
    // interleaved stereo with L = -R: the mono mix is exactly 0 everywhere
    val stereo = Array.tabulate[Short](3200)(i => if (i % 2 == 0) 8192 else -8192)
    val corrupt = "RIFF".getBytes("US-ASCII") ++
      Array.tabulate[Byte](64)(i => (i * 53 + 7).toByte)
    val rows = Seq(
      MediaRow(1L, "audio", 0, 0, 1, 8000, wav(mono, 1, 8000f)),
      MediaRow(2L, "audio", 0, 0, 1, 8000, wav(stereo, 2, 8000f)),
      // valid RIFF magic, garbage body — must fall back, not throw
      MediaRow(3L, "audio", 0, 0, 1, 8000, corrupt)).toDS()
    val feats = Multimodal.decodeFeatures(rows, dim = 16).collect()
      .map(f => f.media_id -> f.feature).toMap
    for (k <- 0 until 16)
      assert(math.abs(feats(1L)(k) - k * 2048 / 32768.0) < 1e-6,
        s"window $k = ${feats(1L)(k)}, want ${k * 2048 / 32768.0}")
    assert(feats(2L).forall(_ == 0f))
    assert(feats(3L).toSeq === Multimodal.stubDecode(corrupt, 16).toSeq)
  }

  // -- real-decode path: JDK-builtin multi-frame GIF codec

  private def animatedGif(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val im = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, c)
        writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("mm03: animated GIF payloads sample REAL decoded frames; raw video bytes keep the slicing stub") {
    val spark0 = spark
    import spark0.implicits._
    // palette-exact colors (primaries/black/white survive GIF quantization)
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000, 0xff0000,
      0x00ff00, 0x0000ff, 0xffffff, 0x000000, 0xff0000, 0x00ff00)
    val gif = animatedGif(colors, 8, 8)
    val rawVideo = Array.tabulate[Byte](120)(i => (i * 31 + 5).toByte)
    val rows = Seq(
      MediaRow(1L, "video", 8, 8, colors.length, 0, gif),
      MediaRow(2L, "video", 0, 0, 12, 0, rawVideo)).toDS()
    val frames = Multimodal.sampleFrames(rows, stride = 5).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_index)).toMap
    // real path: stored frames 0, 5, 10 decode back to the planted colors
    assert(frames(1L).map(_.frame_index).toSeq === Seq(0, 5, 10))
    frames(1L).foreach { fr =>
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.frame_bytes))
      assert((im.getRGB(4, 4) & 0xffffff) === colors(fr.frame_index),
        s"frame ${fr.frame_index} decodes to ${(im.getRGB(4, 4) & 0xffffff).toHexString}")
    }
    // stub path: ceil(12/5) = 3 rows of even 10-byte slices, unchanged
    assert(frames(2L).map(_.frame_index).toSeq === Seq(0, 5, 10))
    assert(frames(2L).forall(_.frame_bytes.length === 10))
  }

  test("mm02: 24-bit PCM WAV decodes through the direct sample parser (JDK can't narrow it)") {
    // hand-built canonical RIFF header: the JDK WAV reader parses
    // 24-bit PCM but its converter cannot narrow it to 16-bit — the
    // direct path must decode it, not stub it as hash noise
    def wav24(samples: Array[Int], rate: Int): Array[Byte] = {
      val data = new Array[Byte](samples.length * 3)
      samples.indices.foreach { i =>
        data(3 * i) = (samples(i) & 0xff).toByte
        data(3 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        data(3 * i + 2) = ((samples(i) >> 16) & 0xff).toByte
      }
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 3).putShort(3).putShort(24)
        .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    // 16 windows of 25 frames; window k at constant amplitude k*2^19,
    // so its RMS is exactly k*2^19/2^23 = k/16
    val samples = Array.tabulate(400)(i => (i / 25) * (1 << 19))
    val feat = Multimodal.decodeAudio(wav24(samples, 8000), dim = 16)
    assert(feat.isDefined, "24-bit PCM WAV fell back to the stub")
    for (k <- 0 until 16)
      assert(math.abs(feat.get(k) - k / 16.0) < 1e-6,
        s"window $k = ${feat.get(k)}, want ${k / 16.0}")
  }

  test("mm02: video payloads with a JDK codec decode to temporal-mean features") {
    val spark0 = spark
    import spark0.implicits._
    // four solid-grey frames: every pooled cell of every frame is its
    // luminance exactly, so the temporal mean is (32+96+160+224)/4/255
    val greys = Seq(0x202020, 0x606060, 0xa0a0a0, 0xe0e0e0)
    val gif = animatedGif(greys, 8, 8)
    val raw = "not a container".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "video", 8, 8, 4, 0, gif),
      MediaRow(2L, "video", 0, 0, 4, 0, raw)).toDS()
    val feats = Multimodal.decodeFeatures(rows, dim = 16).collect()
      .map(f => f.media_id -> f.feature).toMap
    val want = greys.map(c => (c & 0xff) / 255.0).sum / greys.length
    assert(feats(1L).forall(v => math.abs(v - want) < 1e-6),
      s"temporal mean ${feats(1L).head}, want $want")
    assert(feats(2L).toSeq === Multimodal.stubDecode(raw, 16).toSeq)
  }

  test("mm02: partial delta frames stay out of the temporal mean; bad maxFrames fails fast") {
    // optimized GIFs store later frames as changed-rect deltas —
    // pooling a small rect over the full grid would mix regions, so
    // only full-canvas frames may enter the mean
    val full = Seq(0x202020, 0xe0e0e0).map { c =>
      val im = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) im.setRGB(x, y, c)
      im
    }
    val delta = { // a 4x4 white patch posing as frame 1
      val im = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) im.setRGB(x, y, 0xffffff)
      im
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      Seq(full.head, delta, full(1)).foreach(im =>
        writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    val gif = bos.toByteArray
    val feat = Multimodal.decodeVideo(gif, dim = 16)
    assert(feat.isDefined)
    // mean of the two full frames only: (32 + 224) / 2 / 255
    val want = (0x20 + 0xe0) / 2.0 / 255.0
    assert(feat.get.forall(v => math.abs(v - want) < 1e-6),
      s"mean ${feat.get.head}, want $want — the 4x4 delta leaked into the pooling")
    intercept[IllegalArgumentException] { Multimodal.decodeVideo(gif, 16, maxFrames = 0) }
  }

  test("mm05: nearest-neighbor resize is pixel-exact; non-decodable and non-image rows pass through") {
    val spark0 = spark
    import spark0.implicits._
    // gradient keyed on source coordinates so the expected target
    // pixel is computable: nearest-neighbor at 2x downscale reads
    // src(2x, 2y)
    def rgb(x: Int, y: Int): Int = ((x * 8) << 16) | ((y * 10) << 8) | 0x33
    val src = png(32, 24, rgb)
    val noise = "not an image".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "image", 32, 24, 1, 0, src),
      MediaRow(2L, "image", 0, 0, 1, 0, noise),
      MediaRow(3L, "audio", 0, 0, 1, 8000, noise)).toDS()
    val out = Multimodal.resizeMedia(rows, 16, 12).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).width === 16 && out(1L).height === 12)
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(1L).payload))
    assert(im.getWidth === 16 && im.getHeight === 12)
    for (y <- 0 until 12; x <- 0 until 16)
      assert((im.getRGB(x, y) & 0xffffff) === rgb(2 * x, 2 * y),
        s"pixel ($x,$y) not the nearest-neighbor source pixel")
    // pass-through rows are byte-identical, metadata untouched
    assert(out(2L).payload.toSeq === noise.toSeq && out(2L).width === 0)
    assert(out(3L).payload.toSeq === noise.toSeq && out(3L).kind === "audio")
  }

  test("mm04: real decoded pixel features drive the ANN bridge — planted twin is top-1") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions.VectorFunctions._
    // patterned gradients keyed by a seed: distinct seeds → distinct
    // features; media 1 and 99 share a pattern → bit-identical
    // features → cosine exactly 1, so brute top-1 must find the twin
    def patterned(seed: Int) = png(32, 32, (x, y) => {
      val l = (x * (seed + 2) + y * 7) % 256
      (l << 16) | (l << 8) | l
    })
    val rows = (Seq(1L -> 1, 99L -> 1) ++ (2L to 8L).map(i => i -> i.toInt))
      .map { case (id, seed) => MediaRow(id, "image", 32, 32, 1, 0, patterned(seed)) }
      .toDS()
    val feats = Multimodal.featureEmbeddings(Multimodal.decodeFeatures(rows, dim = 16))
    val q = feats.filter(col("vec_id") === 1L)
      .select(col("embedding").as("qf"), col("nrm").as("qn"))
    val top = feats.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 1L)
      .select(col("vec_id"), cosine(col("qf"), col("embedding"), col("qn"), col("nrm")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(1).collect()
    assert(top.head.getLong(0) === 99L, s"twin not top-1: ${top.head}")
    assert(top.head.getDouble(1) >= 1.0 - 1e-9)
  }

  test("mm04: real decoded audio features drive the ANN bridge — planted twin is top-1") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions.VectorFunctions._
    // seed-keyed amplitude envelopes: distinct seeds → distinct RMS
    // window profiles; media 1 and 99 share one → bit-identical
    // features → cosine exactly 1 through the same bridge as images
    def tone(seed: Int) = wav(
      Array.tabulate[Short](1600)(i => (((i / 100) * 931 * seed + 1024) % 24000).toShort), 1, 8000f)
    val rows = (Seq(1L -> 1, 99L -> 1) ++ (2L to 8L).map(i => i -> i.toInt))
      .map { case (id, seed) => MediaRow(id, "audio", 0, 0, 1, 8000, tone(seed)) }
      .toDS()
    val feats = Multimodal.featureEmbeddings(Multimodal.decodeFeatures(rows, dim = 16))
    val q = feats.filter(col("vec_id") === 1L)
      .select(col("embedding").as("qf"), col("nrm").as("qn"))
    val top = feats.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 1L)
      .select(col("vec_id"), cosine(col("qf"), col("embedding"), col("qn"), col("nrm")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(1).collect()
    assert(top.head.getLong(0) === 99L, s"audio twin not top-1: ${top.head}")
    assert(top.head.getDouble(1) >= 1.0 - 1e-9)
  }

  test("mm03: frame sampling fans out ceil(n_frames/stride) rows per video, payload sliced") {
    val stride = 10
    val frames = Multimodal.sampleFrames(media, stride)
    val perVideo = frames.toDF().groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.filter(_.kind == "video").collect()
      .map(r => r.media_id -> ((math.max(r.n_frames, 1) + stride - 1) / stride).toLong).toMap
    assert(perVideo === expected)
    // frame bytes must come from within the payload
    val m0 = media.filter(_.kind == "video").orderBy("media_id").head()
    val f0 = frames.filter(_.media_id == m0.media_id).orderBy("frame_index").head()
    assert(f0.frame_index === 0)
    // byte-level compare: a UTF-8 decode would break spuriously if a
    // slice boundary ever split a multi-byte character
    assert(java.util.Arrays.equals(
      m0.payload.slice(0, f0.frame_bytes.length), f0.frame_bytes))
  }
}
