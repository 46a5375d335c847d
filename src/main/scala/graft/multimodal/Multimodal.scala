package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One media row: the payload is an opaque binary column; everything
  * the engine needs to plan (kind, dimensions, frame count, sample
  * rate) lives in typed metadata columns, so partition pruning and
  * predicate pushdown work without touching payload bytes.
  */
final case class MediaRow(
    media_id: Long,
    kind: String,          // "image" | "audio" | "video"
    width: Int,
    height: Int,
    n_frames: Int,
    sample_rate: Int,
    payload: Array[Byte])

/** Fixed-size feature vector produced by the (stubbed) decoder. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    feature: Array[Float])

/** One sampled frame of a video payload. */
final case class SampledFrame(
    media_id: Long,
    frame_index: Int,
    frame_bytes: Array[Byte])

/** Multimodal-column plumbing — SURVEY §2.10 (mm01–mm05).
  *
  * Image/audio/video are opaque `binary` columns plus typed metadata.
  * Formats the JDK itself ships codecs for decode REAL bytes with no
  * external libraries: PNG/JPEG/GIF/BMP via `javax.imageio`
  * ([[Multimodal.decodeImage]], [[Multimodal.resizeImage]]), audio
  * containers of any PCM width via `javax.sound.sampled`
  * ([[Multimodal.decodeAudio]]), and multi-frame GIF via the ImageIO
  * reader API ([[Multimodal.decodeFrames]],
  * [[Multimodal.decodeVideo]]). Payloads with no in-JDK codec (h264)
  * and corrupt rows fall back to [[Multimodal.stubDecode]], a
  * deterministic fake keyed on the payload bytes — the decode seam
  * never throws on a crawled corpus. Everything Spark-side is real
  * and load-bearing at scale: the schema, the `mapPartitions` batch
  * shape (one iterator pass per partition, no per-row task overhead,
  * the exact seam where a vectorized native decoder or a Python
  * worker would plug in), and the metadata-only pruning path.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Deterministic synthetic media table derived from `documents`
    * (payload = utf-8 text bytes; metadata keyed off doc_id). Stands in
    * for a real `spark.read.format("binaryFile")` / parquet-of-blobs
    * source with identical downstream plumbing.
    */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").as("height"),
        (pmod(col("doc_id"), lit(7)) * 30 + 30).cast("int").as("n_frames"),
        when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).cast("int").as("sample_rate"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** REAL image decode for formats the JDK ships codecs for
    * (PNG/JPEG/GIF/BMP via `javax.imageio` — no external libraries):
    * payload bytes → pixels → a `dim`-length mean-pooled luminance
    * grid feature in [0,1]. The image is tiled into ceil(√dim) ×
    * ceil(dim/gw) cells (row-major, matching the feature index), and
    * each feature is the mean (r+g+b)/3/255 over its cell — fully
    * deterministic given the pixel data. Returns None when ImageIO
    * has no codec for the bytes (audio, video, truncated or
    * non-image payloads) — callers fall back to [[stubDecode]], so
    * the decode seam never throws on the mixed-kind media table.
    */
  def decodeImage(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
    // NonFatal, not just IOException: the JDK image plugins throw
    // RuntimeExceptions (ArrayIndexOutOfBounds, CMMException, ...) on
    // payloads with a valid magic header but corrupt body — a crawled
    // corpus WILL contain those, and one bad row must fall back to the
    // stub, not fail the task
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map(poolLuminance(_, dim))
  }

  /** The mean-pooled luminance grid shared by the image and video
    * feature paths (see [[decodeImage]] for the cell geometry).
    */
  private def poolLuminance(im: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val (w, h) = (im.getWidth, im.getHeight)
    val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
    val gh = (dim + gw - 1) / gw
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    // ONE bulk ARGB grab: per-pixel getRGB pays a ColorModel
    // conversion call per pixel (~17M virtual calls on a 4k×4k
    // frame), the bulk form does the identical conversion in one pass
    val px = im.getRGB(0, 0, w, h, null, 0, w)
    var y = 0
    while (y < h) {
      val cy = math.min(y * gh / h, gh - 1)
      var x = 0
      while (x < w) {
        val cell = cy * gw + math.min(x * gw / w, gw - 1)
        if (cell < dim) {
          val rgb = px(y * w + x)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0 / 255.0
          sums(cell) += lum
          counts(cell) += 1
        }
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(i => if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
  }

  /** REAL audio decode for container formats the JDK ships codecs for
    * (WAV / AIFF / AU via `javax.sound.sampled` — no external
    * libraries, headless-safe): payload bytes → PCM samples → a
    * `dim`-length per-window RMS energy feature in [0,1]. PCM of ANY
    * width (8/16/24/32-bit, signed or unsigned, either endianness) is
    * parsed directly — the JDK converter cannot narrow 24/32-bit to
    * 16, and silently stubbing a routine studio WAV would label hash
    * noise as a decoded feature; only non-PCM encodings (u-law/a-law)
    * go through the 16-bit conversion. Channels are averaged to mono
    * and the track is tiled into `dim` equal time windows
    * (time-ordered, matching the feature index); each feature is the
    * RMS of its window's normalized samples — fully deterministic
    * given the sample data. Returns None when the bytes are not a
    * parseable audio container (images, video, text, or a corrupt
    * body behind a valid header) — callers fall back to
    * [[stubDecode]], the same never-throw seam as [[decodeImage]].
    */
  def decodeAudio(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    import AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
    // NonFatal for the same reason as decodeImage: a crawled corpus
    // contains valid-magic/corrupt-body rows, and the JDK audio SPIs
    // throw unchecked errors on some of them — one bad row must fall
    // back, not fail the task
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val isPcm = src.getEncoding == PCM_SIGNED || src.getEncoding == PCM_UNSIGNED
        val (pcm, fmt) =
          if (isPcm) (in, src)
          else {
            val f = new AudioFormat(PCM_SIGNED, src.getSampleRate, 16,
              src.getChannels, 2 * src.getChannels, src.getSampleRate, false)
            (AudioSystem.getAudioInputStream(f, in), f)
          }
        try {
          // payload is already in memory, so this is bounded by row size
          val bytes = pcm.readAllBytes()
          val ch = fmt.getChannels
          val bits = fmt.getSampleSizeInBits
          val bytesPer = (bits + 7) / 8
          if (ch <= 0 || bits <= 0 || bits > 32) None
          else {
            val nFrames = bytes.length / (bytesPer * ch)
            if (nFrames == 0) Some(new Array[Float](dim))
            else {
              val big = fmt.isBigEndian
              val signed = fmt.getEncoding == PCM_SIGNED
              val full = 1L << (bits - 1)
              // one sample, normalized to [-1, 1): assemble the raw
              // bits MSB-first, then sign-extend (signed) or center on
              // the half-range (unsigned)
              def sampleAt(off: Int): Double = {
                var v = 0L
                var i = 0
                while (i < bytesPer) {
                  v = (v << 8) | (bytes(off + (if (big) i else bytesPer - 1 - i)) & 0xffL)
                  i += 1
                }
                val x = if (signed) (v << (64 - bits)) >> (64 - bits) else v - full
                x.toDouble / full
              }
              val sums = new Array[Double](dim)
              val counts = new Array[Long](dim)
              var f = 0
              while (f < nFrames) {
                var acc = 0.0
                var c = 0
                while (c < ch) {
                  acc += sampleAt((f * ch + c) * bytesPer)
                  c += 1
                }
                val mono = acc / ch
                val cell = math.min((f.toLong * dim / nFrames).toInt, dim - 1)
                sums(cell) += mono * mono
                counts(cell) += 1
                f += 1
              }
              Some(Array.tabulate(dim)(i =>
                if (counts(i) == 0) 0f else math.sqrt(sums(i) / counts(i)).toFloat))
            }
          }
        } finally pcm.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL video feature for multi-frame containers with a JDK codec
    * (animated GIF): mean of the per-frame [[decodeImage]] pooled
    * grids over up to `maxFrames` evenly-strided frames — a temporal
    * average of spatial luminance, in [0,1]. Only FULL-CANVAS frames
    * (dimensions equal to frame 0's) enter the mean: optimized GIFs
    * store later frames as changed-rect deltas, and pooling a small
    * delta rect over the whole grid would mix unrelated image regions
    * into the temporal average. Returns None when the payload is not
    * a decodable 2+-frame container (h264 etc.) or no sampled frame
    * is full-canvas — the shared fallback seam. One reader pass:
    * frame count and sampled decodes share a single container walk.
    */
  def decodeVideo(payload: Array[Byte], dim: Int, maxFrames: Int = 8): Option[Array[Float]] = {
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    withFrameReader(payload) { (reader, n) =>
      if (n < 2) None
      else {
        val stride = math.max(1, (n + maxFrames - 1) / maxFrames)
        val first = reader.read(0)
        val (w0, h0) = (first.getWidth, first.getHeight)
        val feats = (0 until n by stride).flatMap { i =>
          val im = if (i == 0) first else reader.read(i)
          if (im.getWidth == w0 && im.getHeight == h0) Some(poolLuminance(im, dim)) else None
        }
        if (feats.isEmpty) None
        else Some(Array.tabulate(dim)(i => feats.map(_(i)).sum / feats.length))
      }
    }
  }

  /** Open `payload` as a multi-image container: find a reader, count
    * frames (one full walk), hand both to `f`. None when no installed
    * reader claims the bytes or anything throws (NonFatal) — the
    * shared seam of the frame-based decoders. The stream is a
    * MemoryCacheImageInputStream: the payload is already an in-memory
    * array, and the ImageIO default (useCache) would write a temp
    * FILE per call from executor tasks.
    */
  private def withFrameReader[T](payload: Array[Byte])(
      f: (javax.imageio.ImageReader, Int) => Option[T]): Option[T] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            f(reader, reader.getNumImages(true))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder: a deterministic 64→`dim` fake "embedding" from a
    * rolling FNV-1a over payload bytes — the fallback for payload
    * kinds with no in-container codec (audio/video/raw text). Replace
    * the body with a real decoder (ffmpeg via JNI, or an arrow batch
    * to a Python worker) without touching the plan shape.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= payload(i) & 0xffL
      h *= 0x100000001b3L
      out(i % dim) += ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** mm02: per-partition batched decode → fixed-size features. One
    * state setup per partition (where a native decoder would init its
    * context), then a pure iterator pass — streaming, no
    * per-partition materialization. Every kind decodes REAL bytes
    * where the JDK ships a codec: images through the pixel path
    * ([[decodeImage]]), audio through the PCM path ([[decodeAudio]]),
    * video through the multi-frame temporal mean ([[decodeVideo]] —
    * GIF containers); payloads with no in-container codec (h264, raw
    * bytes) fall back to the deterministic [[stubDecode]], so one
    * mixed-kind table decodes in one pass with a uniform feature
    * contract.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        // gate the codec probe on the metadata kind: sniffing ImageIO/
        // AudioSystem readers against the wrong media bytes is per-row
        // waste
        val feat = (r.kind match {
          case "image" => decodeImage(r.payload, dim)
          case "audio" => decodeAudio(r.payload, dim)
          case "video" => decodeVideo(r.payload, dim)
          case _       => None
        }).getOrElse(stubDecode(r.payload, dim))
        MediaFeatures(r.media_id, r.kind, feat)
      }
    }
  }

  /** REAL frame extraction for multi-frame containers the JDK can
    * read (animated GIF via `javax.imageio` — the one video-ish
    * format with an in-JDK codec): every `stride`-th stored frame is
    * decoded and re-encoded as PNG bytes. Frames are returned as
    * STORED — no disposal-method compositing across frames, which is
    * exactly what a sampling pipeline wants (independent frames, not
    * a playback state machine); GIFs whose later frames are partial
    * deltas yield those deltas. Returns None when the payload is not
    * a container with 2+ decodable frames (h264 and friends — no JDK
    * codec — plus single images and non-media bytes), so callers fall
    * back to the byte-slicing stub: the same never-throw seam as
    * [[decodeImage]]/[[decodeAudio]].
    */
  def decodeFrames(payload: Array[Byte], stride: Int): Option[Seq[(Int, Array[Byte])]] = {
    // stride is a CALLER bug, not a payload problem — it must not be
    // swallowed into the never-throw fallback (stride=0's range IAE
    // would read as "container not decodable" and mask the real error)
    require(stride > 0, s"frame stride must be positive, got $stride")
    withFrameReader(payload) { (reader, n) =>
      if (n < 2) None
      else Some((0 until n by stride).map { i =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(reader.read(i), "png", bos)
        (i, bos.toByteArray)
      })
    }
  }

  /** mm03: sample every `stride`-th frame of video payloads.
    * Multi-frame containers with a JDK codec (animated GIF) decode
    * REAL frames via [[decodeFrames]]; everything else (h264 — no
    * in-container codec) falls back to an even byte-slicing of the
    * payload driven by the n_frames metadata (a real implementation
    * seeks keyframes). The row fan-out, schema and partition behavior
    * are the same shape on both paths — ceil(frames/stride) rows per
    * video — but the frame count comes from the CONTAINER on the real
    * path and from the n_frames metadata on the stub path; when the
    * two disagree, the container wins (sizing downstream work off
    * metadata is a consumer bug, not a sampler contract).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10): Dataset[SampledFrame] = {
    // validate at the DRIVER (the resizeImage convention): stride=0
    // would throw `step cannot be 0` inside executor tasks mid-job
    // with retries, and a negative stride would silently emit zero
    // frames for every video on both decode paths
    require(stride > 0, s"frame-sample stride must be positive, got $stride")
    implicit val enc = Encoders.product[SampledFrame]
    media.filter(_.kind == "video").flatMap { r =>
      decodeFrames(r.payload, stride) match {
        case Some(frames) =>
          frames.iterator.map { case (i, bytes) => SampledFrame(r.media_id, i, bytes) }
        case None =>
          val frames = math.max(r.n_frames, 1)
          val bytesPerFrame = math.max(r.payload.length / frames, 1)
          (0 until frames by stride).iterator.map { f =>
            val from = math.min(f * bytesPerFrame, r.payload.length)
            val until = math.min(from + bytesPerFrame, r.payload.length)
            SampledFrame(r.media_id, f, java.util.Arrays.copyOfRange(r.payload, from, until))
          }
      }
    }
  }

  /** Deterministic nearest-neighbor image resize: payload → `w`×`h`
    * PNG bytes. Manual pixel resampling rather than Graphics2D
    * drawImage — AWT interpolation can differ across
    * platforms/headless toolkits, a pixel loop is bit-reproducible
    * everywhere. None when the payload doesn't decode (the shared
    * fallback seam).
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    val src =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    src.map { im =>
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val (sw, sh) = (im.getWidth, im.getHeight)
      // bulk ARGB in / bulk out — identical pixels to the per-pixel
      // getRGB/setRGB form, without a ColorModel conversion per pixel
      val src = im.getRGB(0, 0, sw, sh, null, 0, sw)
      val dst = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min((y.toLong * sh / h).toInt, sh - 1)
        var x = 0
        while (x < w) {
          dst(y * w + x) = src(sy * sw + math.min((x.toLong * sw / w).toInt, sw - 1))
          x += 1
        }
        y += 1
      }
      out.setRGB(0, 0, w, h, dst, 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** mm05: resize the image rows of a media table to `w`×`h` —
    * payload swapped for the resized PNG, width/height metadata
    * updated. Non-image kinds and image rows whose payload doesn't
    * decode pass through unchanged (a resize stage must never drop or
    * corrupt rows it can't handle). Same mapPartitions seam as the
    * feature decode.
    */
  def resizeMedia(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    // validate at the driver: per-row requires inside executor tasks
    // fail mid-job with retries (and not at all on image-free data)
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "image") r
        else resizeImage(r.payload, w, h)
          .map(p => r.copy(width = w, height = h, payload = p))
          .getOrElse(r)
      }
    }
  }

  /** mm04: decoded features as an ANN-ready embedding frame — the
    * bridge from the multimodal decode seam into the §2.8 similarity
    * pipeline (media dedup / retrieval over decoded embeddings). The
    * schema contract is [[graft.ann.Knn.lshTables]]'s (vec_id,
    * embedding, nrm); swapping the stub decoder for a real one changes
    * nothing downstream.
    */
  def featureEmbeddings(feats: Dataset[MediaFeatures]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    feats.toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
      .withColumn("nrm", graft.functions.VectorFunctions.norm2(col("embedding")))
      // degenerate payloads (empty media) decode to the zero vector —
      // un-scorable downstream (the shared cosine yields NULL for any
      // zero/NaN/Inf norm, so they can never match or rank); the
      // bridge drops them up front rather than carrying dead rows
      // through the banding exchanges. Both bounds matter: a bare
      // `nrm > 0` is the NaN-greatest trap (NaN > 0 and Inf > 0 are
      // both TRUE in Spark) — a real decoder emitting one NaN element
      // would ride every exchange as a dead row
      .filter(col("nrm") > 0 && col("nrm") < Double.PositiveInfinity)
  }
}
