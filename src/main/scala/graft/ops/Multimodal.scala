package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode/feature-extraction as a
  * partition-wise batch operator.
  *
  * [[decodeImageFeatures]] is a REAL image decode path (JDK `javax.imageio`
  * — PNG/BMP/JPEG/GIF, no external codecs needed) with per-image resize to
  * a fixed luma grid, and [[decodeAudioFeatures]] a REAL audio decode path
  * (JDK `javax.sound.sampled` — WAV/AU/AIFF PCM); payloads no codec claims
  * fall back to the deterministic byte-stride features of
  * [[stubDecodeFeatures]] (flagged `decoded=false`), so one operator serves
  * mixed binary lakehouse columns. Compressed audio (MP3/OGG) and video
  * codecs are NOT in the JDK; those stay on the fallback path — the
  * `mapPartitions` batch shape is the plug-in point for a JNI/FFI or
  * Arrow-batched decoder.
  */
object Multimodal {

  /** Wrap a text table as a blob table: `(doc_id, blob, meta)` where meta
    * carries byte length + md5 — the shape an image/audio lakehouse table
    * would have. */
  def asBlobTable(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(payloadCol).cast("binary").as("blob"),
      struct(
        octet_length(col(payloadCol)).as("byte_len"),
        md5(col(payloadCol).cast("binary")).as("digest")).as("meta"))

  val FeatureDim = 8

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Nullable id accessor shared by both decoders: a lakehouse table with
    * a null id row must flow through (id stays NULL), never NPE a task. */
  private def idOrNull(r: Row): java.lang.Long =
    if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))

  /** STUB decoder: mean byte value over FeatureDim equal strides of the
    * blob, scaled to [0,1]. A real implementation decodes the codec here
    * (per-partition batch, exactly this signature). Deterministic, so
    * tests and the driver's rows-check are stable. */
  def stubDecodeFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rows = blobs.select(col("doc_id").cast("long"), col("blob")).rdd
      .mapPartitions { it =>
        it.map { r =>
          Row(idOrNull(r), strideFeature(r.getAs[Array[Byte]](1)).toSeq)
        }
      }
    spark.createDataFrame(rows, featureSchema)
  }

  private val decodeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Byte-stride fallback feature (the [[stubDecodeFeatures]] math; null
    * or empty payload → zero vector, never an executor NPE). */
  private def strideFeature(bytes: Array[Byte]): Array[Float] = {
    val feat = new Array[Float](FeatureDim)
    if (bytes != null && bytes.nonEmpty) {
      val stride = math.max(bytes.length / FeatureDim, 1)
      var d = 0
      while (d < FeatureDim) {
        var sum = 0L; var n = 0
        var i = d * stride
        val end = if (d == FeatureDim - 1) bytes.length else math.min((d + 1) * stride, bytes.length)
        while (i < end) { sum += bytes(i) & 0xFF; n += 1; i += 1 }
        feat(d) = if (n == 0) 0f else (sum.toFloat / n) / 255f
        d += 1
      }
    }
    feat
  }

  /** Real image decode + feature extraction, per-partition batches:
    * decode with the JDK's `javax.imageio` (PNG/BMP/JPEG/GIF), resize to a
    * 2×2 mean-luma grid, and emit
    * `[meanR, meanG, meanB, stdLuma, luma00, luma01, luma10, luma11]`
    * (all in [0,1]) plus decoded dimensions. Non-image payloads keep the
    * byte-stride fallback with `decoded=false` — a mixed binary column
    * never fails the job. One pass over the pixels per image; decode cost
    * is embarrassingly parallel and partition-local (the 100 TB shape:
    * no shuffle, scales with executor count). */
  /** Shared decode prologue for the image operators: bytes →
    * BufferedImage via `javax.imageio`, null for null/empty/corrupt/
    * non-image payloads (callers take their fallback row). Call once per
    * partition AFTER `ImageIO.setUseCache(false)`. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: Exception => null } // corrupt payload → fallback

  def decodeImageFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rows = blobs.select(col("doc_id").cast("long"), col("blob")).rdd
      .mapPartitions { it =>
        // never spill decode scratch to disk-backed ImageIO cache files
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val id = idOrNull(r)
          val bytes = r.getAs[Array[Byte]](1)
          val img = readImage(bytes)
          if (img == null)
            Row(id, false, 0, 0, strideFeature(bytes).toSeq)
          else {
            val w = img.getWidth; val h = img.getHeight
            var sr = 0.0; var sg = 0.0; var sb = 0.0
            var sl = 0.0; var sl2 = 0.0
            // 2x2 resize accumulators (mean luma per quadrant)
            val ql = new Array[Double](4); val qn = new Array[Long](4)
            // fetch a ROW of pixels per call — per-pixel getRGB pays a
            // color-model conversion dispatch per pixel (several times
            // slower on megapixel images, the dominant decode-stage cost)
            val rowBuf = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, rowBuf, 0, w)
              var x = 0
              while (x < w) {
                val rgb = rowBuf(x)
                val cr = (rgb >> 16) & 0xFF; val cg = (rgb >> 8) & 0xFF; val cb = rgb & 0xFF
                val luma = 0.299 * cr + 0.587 * cg + 0.114 * cb
                sr += cr; sg += cg; sb += cb; sl += luma; sl2 += luma * luma
                val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
                ql(q) += luma; qn(q) += 1
                x += 1
              }
              y += 1
            }
            val n = w.toDouble * h
            val mean = sl / n
            val std = math.sqrt(math.max(sl2 / n - mean * mean, 0.0))
            val feat = Array(
              (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
              (std / 255.0).toFloat,
              (if (qn(0) == 0) 0.0 else ql(0) / qn(0) / 255.0).toFloat,
              (if (qn(1) == 0) 0.0 else ql(1) / qn(1) / 255.0).toFloat,
              (if (qn(2) == 0) 0.0 else ql(2) / qn(2) / 255.0).toFloat,
              (if (qn(3) == 0) 0.0 else ql(3) / qn(3) / 255.0).toFloat)
            // decoded and fallback rows share one column — shapes must agree
            require(feat.length == FeatureDim)
            Row(id, true, w, h, feat.toSeq)
          }
        }
      }
    spark.createDataFrame(rows, decodeSchema)
  }

  private val dhashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("dhash", LongType, nullable = true)))

  /** Perceptual difference-hash (dHash) per image — the 64-bit fingerprint
    * that makes IMAGE near-dup detection a [[Dedup.hammingPairs]] problem:
    * decode (same `javax.imageio` path as [[decodeImageFeatures]]), mean-
    * luma-downsample to a 9x8 grid, and set bit `r*8+c` iff
    * `grid(r,c) > grid(r,c+1)` — brightness GRADIENTS, not absolute
    * values, so re-encoding, uniform brightness shifts, and mild resizes
    * keep the hash stable (the classic dHash robustness argument).
    * Undecodable payloads emit a NULL dhash with `decoded=false` — a
    * byte-stride hash of compressed bytes would pair-match nothing
    * meaningfully, so non-images are excluded from banding rather than
    * hashed wrongly. Partition-local decode, no shuffle; tiny images
    * (w<9 or h<8) leave empty grid cells at 0.0 — deterministic, and
    * their hashes only ever band-match equally-degenerate images. */
  def decodeImageDHash(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rows = blobs.select(col("doc_id").cast("long"), col("blob")).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val id = idOrNull(r)
          val img = readImage(r.getAs[Array[Byte]](1))
          if (img == null)
            Row(id, false, 0, 0, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            val sum = Array.ofDim[Double](8, 9)
            val cnt = Array.ofDim[Long](8, 9)
            val rowBuf = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, rowBuf, 0, w)
              val gr = (y.toLong * 8 / h).toInt
              var x = 0
              while (x < w) {
                val rgb = rowBuf(x)
                val luma = 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                val gc = (x.toLong * 9 / w).toInt
                sum(gr)(gc) += luma; cnt(gr)(gc) += 1
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var gr = 0
            while (gr < 8) {
              var gc = 0
              while (gc < 8) {
                val a = if (cnt(gr)(gc) == 0) 0.0 else sum(gr)(gc) / cnt(gr)(gc)
                val b = if (cnt(gr)(gc + 1) == 0) 0.0 else sum(gr)(gc + 1) / cnt(gr)(gc + 1)
                if (a > b) hash |= 1L << (gr * 8 + gc)
                gc += 1
              }
              gr += 1
            }
            Row(id, true, w, h, java.lang.Long.valueOf(hash))
          }
        }
      }
    spark.createDataFrame(rows, dhashSchema)
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("frame_idx", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("frame", BinaryType)))

  /** Video frame sampling — every `everyN`-th frame of a video column,
    * with per-frame grayscale stats and the raw frame bytes for
    * downstream feature extraction. The `decoder` is the PLUGGABLE
    * compressed-codec seam ([[Codecs.VideoDecoder]]): the default is
    * GFV1, the documented deterministic fake container (the brief's stub
    * discipline — the JDK ships NO video codec), and a real H.264/VP9
    * decoder (JCodec/FFmpeg/JNI) drops into the same parameter with the
    * operator untouched. Undecodable payloads emit ONE flagged row
    * (`decoded=false`, NULL frame fields) — a mixed binary column never
    * fails the job, and the flag is visible downstream; a VALID empty
    * clip (`nFrames == 0`) likewise emits one `decoded=true` row with
    * NULL frame fields, so every input doc stays visible to per-doc
    * accounting. One output row per SAMPLED frame (⌈n/everyN⌉ per
    * video), and `VideoClip.frame(k)` is fetched on demand, so the
    * operator's output — not the decode — bounds memory;
    * partition-local, no shuffle. A decoder that violates its own
    * geometry (frame length ≠ width·height) fails loudly — that is a
    * broken DECODER, not a corrupt payload; corruption a LAZY decoder
    * only discovers at `frame(k)` ([[Codecs.CorruptPayload]]) demotes
    * the doc to the flagged row like an up-front None. */
  def sampleFrames(blobs: DataFrame, everyN: Int,
                   decoder: Codecs.VideoDecoder = Codecs.Gfv1Decoder): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1: $everyN")
    val spark = blobs.sparkSession
    val rows = blobs.select(col("doc_id").cast("long"), col("blob")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = idOrNull(r)
          val bytes = r.getAs[Array[Byte]](1)
          decoder.decode(bytes) match {
            case None =>
              Seq(Row(id, false, null, null, null, null, null, null))
            case Some(clip) if clip.nFrames == 0 =>
              // a VALID empty clip: one decoded row with no frame fields,
              // so per-doc accounting never silently loses the doc
              Seq(Row(id, true, null, 0, clip.width, clip.height, null, null))
            case Some(clip) =>
              // same class of contract violation as the geometry check
              // below: a negative count would make the sample range empty
              // and the doc would VANISH from per-doc accounting silently
              require(clip.nFrames >= 0,
                s"decoder contract violation: negative nFrames ${clip.nFrames} for doc $id")
              // corruption a lazy decoder discovers only at frame(k) —
              // torn entropy-coded data behind valid headers — demotes
              // the WHOLE doc to its flagged row (same as an up-front
              // None; partially-emitted frames would make the flag
              // unreadable downstream). Any other exception is a broken
              // DECODER and stays loud per the contract above.
              try (0 until clip.nFrames by everyN).map { k =>
                val frame = clip.frame(k)
                require(frame != null && frame.length == clip.width * clip.height,
                  s"decoder contract violation: frame $k of doc $id has " +
                    s"${if (frame == null) "null" else frame.length.toString} bytes, " +
                    s"expected ${clip.width}x${clip.height}")
                var s = 0L; var i = 0
                while (i < frame.length) { s += frame(i) & 0xFF; i += 1 }
                Row(id, true, k, clip.nFrames, clip.width, clip.height,
                  s.toDouble / frame.length / 255.0, frame)
              } catch {
                case _: Codecs.CorruptPayload =>
                  Seq(Row(id, false, null, null, null, null, null, null))
              }
          }
        }
      }
    spark.createDataFrame(rows, frameSchema)
  }

  /** Synthesize a GFV1 clip of `n` constant-gray frames (frame k filled
    * with `fill(k)`) — fixture plumbing for the ORACLE-EXACT frame
    * sampling entry: a constant frame's mean luma is exactly
    * `fill(k)/255`, a closed form the SQL twin emits. */
  def gfvVideo(w: Int, h: Int, n: Int, fill: Int => Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(16 + n * w * h)
    out.put("GFV1".getBytes("US-ASCII")).putInt(n).putInt(w).putInt(h)
    (0 until n).foreach { k =>
      val v = fill(k)
      require(v >= 0 && v <= 255, s"gray fill out of range: $v")
      (0 until w * h).foreach(_ => out.put(v.toByte))
    }
    out.array()
  }

  /** Encode one image as JPEG at compression quality 1.0 — all-ones
    * quantization tables, so a CONSTANT-gray frame (DC-only blocks)
    * round-trips bit-exactly through encode+decode (MultimodalSpec pins
    * this for every fill value 0..255). Fixture plumbing only; output
    * bytes never appear in an oracle (twins use the closed-form fills). */
  // writer SPIs hoisted once per JVM: ImageIO's by-format lookups scan
  // the IIORegistry per call — the per-row JDK-registry hazard the r9
  // audio fix documents in SCALE.md; these fixtures run per doc on
  // executors inside the oracle entries
  @transient private lazy val jpegWriterSpi = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    try w.getOriginatingProvider finally w.dispose()
  }
  @transient private lazy val gifWriterSpi = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try w.getOriginatingProvider finally w.dispose()
  }

  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = jpegWriterSpi.createWriterInstance()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Synthesize an MJPEG-in-AVI clip of `n` constant-GRAY frames (frame
    * k filled with `fill(k)`) — fixture plumbing for the REAL
    * compressed-video path ([[Codecs.MjpegAviDecoder]]): a full RIFF/AVI
    * container (`hdrl` with `avih` + `strl`, `LIST movi` with `00dc`
    * JPEG chunks, even-byte padding) whose single-component quality-1.0
    * JPEG frames decode bit-exactly, so mean luma keeps the closed form
    * `fill(k)/255` the SQL twin emits. `n == 0` is the valid empty clip
    * (geometry carried by `avih` alone). */
  def mjpegAviVideo(w: Int, h: Int, n: Int, fill: Int => Int): Array[Byte] = {
    val frames = (0 until n).map { k =>
      val v = fill(k)
      require(v >= 0 && v <= 255, s"gray fill out of range: $v")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val plane = Array.fill[Byte](w * h)(v.toByte)
      img.getRaster.setDataElements(0, 0, w, h, plane)
      jpegBytes(img)
    }
    aviContainer(w, h, frames)
  }

  /** Wrap pre-encoded JPEG frames in a RIFF/AVI container. Exposed
    * separately so specs can build mixed/corrupt containers. */
  def aviContainer(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if ((payload.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    // avih: 56-byte main header; width at offset 32, height at 36
    val avih = chunk("avih",
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(frames.size) ++
        le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
        Array.fill[Byte](16)(0))
    // strh 'vids'/'MJPG' + strf BITMAPINFOHEADER — present for container
    // realism; the decoder keys on the movi chunks and avih geometry
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(30) ++ le32(0) ++
        le32(frames.size) ++ le32(0) ++ le32(-1) ++ le32(0) ++
        le32(0) ++ le32((h << 16) | (w & 0xFFFF)))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le32((24 << 16) | 1) ++
        "MJPG".getBytes("US-ASCII") ++ le32(w * h * 3) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(body.length))
    bos.write(body)
    bos.toByteArray
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Real audio decode + feature extraction, per-partition batches. The
    * `decoder` is the PLUGGABLE compressed-codec seam
    * ([[Codecs.AudioDecoder]]): the default is the JDK's
    * `javax.sound.sampled` (WAV/AU/AIFF; any PCM width — frames convert
    * to 16-bit signed and average to mono), and an FFmpeg-backed MP3/OGG
    * decoder drops into the same parameter with the operator untouched.
    * One pass computes `[rms, zero_crossing_rate, peak, mean_abs,
    * rmsQ1..rmsQ4]` (per-time-quarter RMS — the coarse energy envelope).
    * Undecodable payloads keep the byte-stride fallback with
    * `decoded=false`. Same 100 TB shape as the image path: no shuffle,
    * partition-local decode. */
  def decodeAudioFeatures(blobs: DataFrame,
                          decoder: Codecs.AudioDecoder = Codecs.DefaultAudio): DataFrame = {
    val spark = blobs.sparkSession
    val rows = blobs.select(col("doc_id").cast("long"), col("blob")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = idOrNull(r)
          val bytes = r.getAs[Array[Byte]](1)
          decoder.decode(bytes).map(p => (p.sampleRate, p.channels, p.mono)) match {
            case None =>
              Row(id, false, 0, 0, 0L, strideFeature(bytes).toSeq)
            case Some((rate, ch, mono)) =>
              val n = mono.length
              var sumAbs = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0L
              val qe = new Array[Double](4); val qn = new Array[Long](4)
              var i = 0
              while (i < n) {
                val s = mono(i)
                sumAbs += math.abs(s); sumSq += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                if (i > 0 && (s >= 0) != (mono(i - 1) >= 0)) zc += 1
                val q = math.min(3, (i.toLong * 4 / math.max(n, 1)).toInt)
                qe(q) += s * s; qn(q) += 1
                i += 1
              }
              def rmsOf(e: Double, c: Long) =
                if (c == 0) 0f else math.sqrt(e / c).toFloat
              val feat = Array(
                if (n == 0) 0f else math.sqrt(sumSq / n).toFloat,
                if (n <= 1) 0f else (zc.toDouble / (n - 1)).toFloat,
                peak.toFloat,
                if (n == 0) 0f else (sumAbs / n).toFloat,
                rmsOf(qe(0), qn(0)), rmsOf(qe(1), qn(1)),
                rmsOf(qe(2), qn(2)), rmsOf(qe(3), qn(3)))
              // decoded and fallback rows share one column — shapes must agree
              require(feat.length == FeatureDim)
              Row(id, true, rate, ch, n.toLong, feat.toSeq)
          }
        }
      }
    spark.createDataFrame(rows, audioSchema)
  }

  /** Synthesize a constant-color PNG (pure JDK) — fixture plumbing for
    * the ORACLE-EXACT image entry: a constant image has closed-form
    * features (mean channel = c/255, stdLuma = 0, every quadrant luma =
    * (0.299r+0.587g+0.114b)/255) that a SQL twin can emit directly,
    * converting the decode path from rows-only to hash-checked. */
  def constantPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Constant-color JPEG / BMP via the hoisted JDK writers — probe
    * fixtures (dims are the probed fields; content is irrelevant). */
  def constantJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    jpegBytes(img)
  }

  def constantBmp(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Hand-built WebP container (no JDK encoder exists): spec-shaped
    * headers for all three bitstream variants — `vp8` (lossy key-frame
    * tag + 9D012A start code + 14-bit dims), `vp8l` (0x2F + packed
    * dims-minus-one), `vp8x` (24-bit canvas dims; `animFrames > 0`
    * sets the ANIM flag and appends that many minimal ANMF chunks).
    * Probe fixtures: bodies are zero-filled — the probe's contract is
    * the header walk, decode is out of scope for WebP. */
  def webpBytes(variant: String, w: Int, h: Int, animFrames: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 0x3FFF && h <= 0x3FFF, s"dims out of range: ${w}x$h")
    val body = new java.io.ByteArrayOutputStream()
    def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
      o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF)
    }
    def chunk(cc: String, data: Array[Byte]): Unit = {
      body.write(cc.getBytes("US-ASCII")); le32(body, data.length)
      body.write(data)
      if ((data.length & 1) != 0) body.write(0) // RIFF pad
    }
    variant match {
      case "vp8" =>
        val d = new java.io.ByteArrayOutputStream()
        d.write(0x10); d.write(0); d.write(0) // frame tag: key frame, v0, show
        d.write(0x9D); d.write(0x01); d.write(0x2A)
        d.write(w & 0xFF); d.write((w >> 8) & 0x3F)
        d.write(h & 0xFF); d.write((h >> 8) & 0x3F)
        d.write(new Array[Byte](16)) // stub partition
        chunk("VP8 ", d.toByteArray)
      case "vp8l" =>
        val d = new java.io.ByteArrayOutputStream()
        d.write(0x2F)
        val bits = (w - 1) | ((h - 1) << 14)
        le32(d, bits) // alpha=0, version=0 in the top bits
        d.write(new Array[Byte](8)) // stub stream
        chunk("VP8L", d.toByteArray)
      case "vp8x" =>
        val d = new java.io.ByteArrayOutputStream()
        d.write(if (animFrames > 0) 0x02 else 0x00) // flags: ANIM
        d.write(0); d.write(0); d.write(0) // reserved
        val cw = w - 1; val ch = h - 1
        d.write(cw & 0xFF); d.write((cw >> 8) & 0xFF); d.write((cw >> 16) & 0xFF)
        d.write(ch & 0xFF); d.write((ch >> 8) & 0xFF); d.write((ch >> 16) & 0xFF)
        chunk("VP8X", d.toByteArray)
        if (animFrames > 0) {
          chunk("ANIM", new Array[Byte](6)) // bg color + loop count
          (0 until animFrames).foreach(_ => chunk("ANMF", new Array[Byte](16)))
        }
      case other => throw new IllegalArgumentException(s"unknown webp variant $other")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + body.size())
    out.write("WEBP".getBytes("US-ASCII"))
    body.writeTo(out)
    out.toByteArray
  }

  /** Spec-shaped TIFF (6.0 layout, either byte order): one IFD per
    * page carrying SHORT entries for width/height/bits/compression,
    * chained by next-IFD pointers. Probe fixture — no pixel data. */
  def tiffBytes(le: Boolean, pages: Seq[(Int, Int)],
                compression: Int = 1, bits: Int = 8): Array[Byte] = {
    require(pages.nonEmpty, "tiff needs at least one page")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) { out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt) }
      else { out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt) }
    if (le) { out.write('I'); out.write('I'); out.write(42); out.write(0) }
    else { out.write('M'); out.write('M'); out.write(0); out.write(42) }
    w32(8L) // first IFD directly after the header
    val ifdSize = 2 + 4 * 12 + 4
    pages.zipWithIndex.foreach { case ((pw, ph), i) =>
      w16(4) // entry count
      def entry(tag: Int, value: Int): Unit = {
        w16(tag); w16(3); w32(1L) // SHORT, count 1
        w16(value); w16(0) // value in the field's first two bytes
      }
      entry(256, pw); entry(257, ph); entry(258, bits); entry(259, compression)
      w32(if (i == pages.length - 1) 0L else 8L + (i + 1).toLong * ifdSize)
    }
    out.toByteArray
  }

  /** Spec-shaped HEIF/AVIF container (ISO BMFF): ftyp with the major
    * brand + `mif1` compatible, a `meta` FULL box holding hdlr('pict')
    * and iprp→ipco with the main `ispe` extents, an optional smaller
    * thumbnail `ispe` FIRST (the probe must pick the larger), and the
    * codec config box (`av1C`/`hvcC`). Probe fixture — no coded data. */
  def heifBytes(major: String, w: Int, h: Int, codecBox: String = "av1C",
                thumbW: Int = 0, thumbH: Int = 0): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
    val full0 = be32(0L) // version 0, flags 0
    def ispe(iw: Int, ih: Int): Array[Byte] =
      box("ispe", full0 ++ be32(iw.toLong) ++ be32(ih.toLong))
    val ipco = box("ipco",
      (if (thumbW > 0) ispe(thumbW, thumbH) else Array.emptyByteArray) ++
      ispe(w, h) ++
      box(codecBox, Array[Byte](0x81.toByte, 0x04, 0x0C, 0x00)))
    val hdlr = box("hdlr", full0 ++ be32(0L) ++
      "pict".getBytes("US-ASCII") ++ new Array[Byte](12) :+ 0.toByte)
    val meta = box("meta", full0 ++ hdlr ++ box("iprp", ipco))
    val ftyp = box("ftyp", major.getBytes("US-ASCII") ++ be32(0L) ++
      major.getBytes("US-ASCII") ++ "mif1".getBytes("US-ASCII"))
    ftyp ++ meta ++ box("mdat", Array.emptyByteArray)
  }

  /** Spec-shaped gzip member whose deflate payload is a STORED block
    * (RFC 1951 type 00) — every output byte is the input byte, so a
    * fixture with ASCII content provably contains no spurious member
    * magics and the probe's single-member ISIZE read is deterministic.
    * Real CRC32/ISIZE trailer (GZIPInputStream round-trips it). */
  def gzipStoredBytes(content: Array[Byte], named: Boolean = false): Array[Byte] = {
    require(content.length <= 0xFFFF, "one stored block only")
    val out = new java.io.ByteArrayOutputStream(content.length + 32)
    out.write(0x1F); out.write(0x8B); out.write(8) // magic + deflate
    out.write(if (named) 8 else 0) // FLG
    (0 until 6).foreach(_ => out.write(0)) // MTIME + XFL + OS
    if (named) { out.write("fixture.bin".getBytes("US-ASCII")); out.write(0) }
    out.write(0x01) // BFINAL=1, BTYPE=00 (stored)
    out.write(content.length & 0xFF); out.write((content.length >> 8) & 0xFF)
    out.write(~content.length & 0xFF); out.write((~content.length >> 8) & 0xFF)
    out.write(content)
    val crc = new java.util.zip.CRC32(); crc.update(content)
    var v = crc.getValue
    (0 until 4).foreach { _ => out.write((v & 0xFF).toInt); v >>= 8 }
    var n = content.length.toLong
    (0 until 4).foreach { _ => out.write((n & 0xFF).toInt); n >>= 8 }
    out.toByteArray
  }

  /** Zstandard frame header (RFC 8878) + one empty raw block — probe
    * fixture covering the FCS field widths: `fcsFlag` 0 with
    * `singleSegment` (1 byte), 1 (2 bytes, stores size−256), 2
    * (4 bytes). */
  def zstdFrameBytes(size: Long, fcsFlag: Int, singleSegment: Boolean,
                     checksum: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    out.write(0x28); out.write(0xB5); out.write(0x2F); out.write(0xFD)
    var fhd = fcsFlag << 6
    if (singleSegment) fhd |= 0x20
    if (checksum) fhd |= 0x04
    out.write(fhd)
    if (!singleSegment) out.write(0x00) // window descriptor
    val fcsLen = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    var v = if (fcsFlag == 1) size - 256 else size
    (0 until fcsLen).foreach { _ => out.write((v & 0xFF).toInt); v >>= 8 }
    out.write(0x01); out.write(0x00); out.write(0x00) // last raw block, size 0
    if (checksum) (0 until 4).foreach(_ => out.write(0))
    out.toByteArray
  }

  /** XZ stream header (magic + stream flags + their real CRC32). */
  def xzHeaderBytes(checkType: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16)
    Seq(0xFD, '7'.toInt, 'z'.toInt, 'X'.toInt, 'Z'.toInt, 0x00).foreach(out.write)
    out.write(0x00); out.write(checkType)
    val crc = new java.util.zip.CRC32()
    crc.update(Array(0x00.toByte, checkType.toByte))
    var v = crc.getValue
    (0 until 4).foreach { _ => out.write((v & 0xFF).toInt); v >>= 8 }
    out.toByteArray
  }

  /** bzip2 header: `BZh<level>` + the first block's BCD-pi magic. */
  def bzip2HeaderBytes(level: Int): Array[Byte] = {
    require(level >= 1 && level <= 9, s"bad bzip2 level $level")
    ("BZh" + level).getBytes("US-ASCII") ++
      Array(0x31, 0x41, 0x59, 0x26, 0x53, 0x59).map(_.toByte)
  }

  /** Synthesize a grayscale PNG whose [[decodeImageDHash]] fingerprint is
    * EXACTLY `pattern` — fixture plumbing for the ORACLE-EXACT image
    * near-dup entry. Each dHash grid row walks gray values from `base`
    * in ±12 steps: step DOWN iff the corresponding pattern bit is set,
    * so `grid(r,c) > grid(r,c+1)` ⟺ bit `r*8+c` — with one cell per
    * pixel (9x8 at scale 1) the mean-luma grid IS the pixel grid, and a
    * gray pixel's luma is its value (0.299+0.587+0.114 = 1), so the
    * comparisons sit on exact ±12 gaps, far above float noise. `base`
    * shifts overall brightness (the walk spans base±96, so base in
    * [97, 158] stays in gamut) and `scale` grows each cell to a
    * scale×scale block — both must leave the hash INVARIANT, which is
    * the dHash robustness claim the spec pins. */
  def dhashPng(pattern: Long, base: Int = 128, scale: Int = 1): Array[Byte] = {
    require(base - 96 >= 0 && base + 96 <= 255, s"base walks out of gamut: $base")
    require(scale >= 1, s"scale must be >= 1: $scale")
    val img = new java.awt.image.BufferedImage(9 * scale, 8 * scale,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    def fill(gr: Int, gc: Int, v: Int): Unit = {
      val rgb = (v << 16) | (v << 8) | v
      var y = gr * scale
      while (y < (gr + 1) * scale) {
        var x = gc * scale
        while (x < (gc + 1) * scale) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
    }
    var r = 0
    while (r < 8) {
      var v = base
      fill(r, 0, v)
      var c = 0
      while (c < 8) {
        v = if (((pattern >> (r * 8 + c)) & 1L) == 1L) v - 12 else v + 12
        fill(r, c + 1, v)
        c += 1
      }
      r += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Hand-built mono 16-bit PCM RIFF/WAVE container. The fixtures
    * previously wrote through `AudioSystem.write`, whose provider
    * registry is GLOBALLY locked like the read side (see
    * [[Codecs.JdkPcmDecoder]]'s scale note) — 50 k fixture writes
    * serialized all 32 executor threads; byte-building is lock-free. */
  private def pcm16Wav(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + pcm.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(sampleRate); w32(sampleRate * 2); w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(pcm.length)
    out.write(pcm)
    out.toByteArray
  }

  /** Synthesize a mono 16-bit PCM WAV square wave — fixture plumbing
    * for the ORACLE-EXACT audio entry. A square wave at amplitude
    * 16384/32768 = 0.5 survives 16-bit quantization EXACTLY (every
    * sample is ±0.5, a dyadic rational), so rms/peak/mean-abs and all
    * four quarter-RMS features are exactly 0.5 and the zero-crossing
    * rate is the exact integer formula floor((n-1)/(P/2))/(n-1) — all
    * closed forms a SQL twin can emit (a sine's features are poisoned by
    * per-sample quantization error; a square's are not). */
  def squareWav(periodSamples: Int, n: Int, sampleRate: Int): Array[Byte] = {
    require(periodSamples >= 2 && periodSamples % 2 == 0,
      s"period must be even and >= 2: $periodSamples")
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = if (i % periodSamples < periodSamples / 2) 16384 else -16384
      pcm(i * 2) = (s & 0xFF).toByte; pcm(i * 2 + 1) = (s >> 8).toByte
      i += 1
    }
    pcm16Wav(pcm, sampleRate)
  }

  /** Hand-built Sun/NeXT `.snd` (AU) container — fixture plumbing for
    * the lock-free AU decode path: big-endian header (data offset 24,
    * size, `encoding`, rate, channels) + raw payload bytes. */
  def auBytes(encoding: Int, sampleRate: Int, channels: Int,
              payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write((v >> 24) & 0xFF); out.write((v >> 16) & 0xFF)
      out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
    }
    out.write(".snd".getBytes("US-ASCII"))
    w32(24); w32(payload.length); w32(encoding); w32(sampleRate); w32(channels)
    out.write(payload)
    out.toByteArray
  }

  /** Hand-built AIFF container (big-endian IFF): `COMM` with the 80-bit
    * extended-float sample rate + `SSND` with zero offset/blockSize.
    * `pcmBE` carries the interleaved big-endian signed samples. */
  def aiffBytes(sampleRate: Int, channels: Int, bits: Int,
                pcmBE: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0, s"rate must be positive: $sampleRate")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Int): Unit = { w16((v >> 16) & 0xFFFF); w16(v & 0xFFFF) }
    val nFrames = pcmBE.length / (channels * (bits / 8))
    val ssndLen = 8 + pcmBE.length
    val commLen = 18
    val formLen = 4 + (8 + commLen) + (8 + ssndLen) + (ssndLen & 1)
    out.write("FORM".getBytes("US-ASCII")); w32(formLen)
    out.write("AIFF".getBytes("US-ASCII"))
    out.write("COMM".getBytes("US-ASCII")); w32(commLen)
    w16(channels); w32(nFrames); w16(bits)
    // 80-bit extended float: normalize the integer rate to a 64-bit
    // mantissa with the top bit set
    val k = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    w16((16383 + k).toInt)
    val m = sampleRate.toLong << (63 - k)
    (0 until 8).foreach(i => out.write(((m >>> (56 - 8 * i)) & 0xFF).toInt))
    out.write("SSND".getBytes("US-ASCII")); w32(ssndLen)
    w32(0); w32(0) // offset, blockSize
    out.write(pcmBE)
    if ((ssndLen & 1) == 1) out.write(0) // IFF even padding
    out.toByteArray
  }

  /** Hand-built G.711 WAV (format tag 6 = A-law, 7 = µ-law, 8 bits per
    * sample) — fixture plumbing for the lock-free table-lookup path. */
  def g711Wav(alaw: Boolean, sampleRate: Int, data: Array[Byte],
              channels: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + data.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(if (alaw) 6 else 7); w16(channels); w32(sampleRate)
    w32(sampleRate * channels); w16(channels); w16(8)
    out.write("data".getBytes("US-ASCII")); w32(data.length)
    out.write(data)
    out.toByteArray
  }

  /** Interleaved big-endian 16-bit PCM from samples — the AIFF/AU
    * payload shape. */
  def pcm16be(samples: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      out(2 * i) = ((samples(i) >> 8) & 0xFF).toByte
      out(2 * i + 1) = (samples(i) & 0xFF).toByte
    }
    out
  }

  /** Synthesize a mono 16-bit PCM WAV sine (pure JDK) — fixture plumbing
    * for the audio entry and tests; the testdata has no audio column, so
    * payloads are planted deterministically (same pattern as the
    * text_redact entry's planted PII). */
  def sineWav(freqHz: Double, seconds: Double, sampleRate: Int): Array[Byte] = {
    val n = (seconds * sampleRate).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toInt
      pcm(i * 2) = (s & 0xFF).toByte; pcm(i * 2 + 1) = (s >> 8).toByte
      i += 1
    }
    pcm16Wav(pcm, sampleRate)
  }

  /** Synthesize an animated GIF of `n` constant-gray FULL frames —
    * fixture for the ORACLE-EXACT GIF entry: GIF is palette-based
    * LOSSLESS, so a constant gray `v` round-trips to luma exactly `v`
    * (spec-pinned for all 256 fills) and mean luma keeps the closed
    * form `fill(k)/255`. */
  def gifVideo(w: Int, h: Int, n: Int, fill: Int => Int): Array[Byte] =
    gifAnimation((0 until n).map { k =>
      val v = fill(k)
      require(v >= 0 && v <= 255, s"gray fill out of range: $v")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, Array.fill[Byte](w * h)(v.toByte))
      (img, 0, 0, "none")
    })

  /** Animated-GIF writer with explicit per-frame (left, top, disposal)
    * — the compositing shapes ([[Codecs.GifDecoder]]'s whole job) are
    * only testable with sub-rect frames and disposal methods, which the
    * plain `ImageIO.write` cannot express. First frame must be the full
    * canvas (it defines the logical screen). */
  def gifAnimation(
      frames: Seq[(java.awt.image.BufferedImage, Int, Int, String)]): Array[Byte] = {
    require(frames.nonEmpty, "need >= 1 frame")
    val writer = gifWriterSpi.createWriterInstance()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null) // logical screen = first frame
      frames.foreach { case (img, left, top, disposal) =>
        val param = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), param)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        // the JDK writer defaults to interlaced frames, and its own
        // reader mis-rounds the interlace passes on tiny images (bottom
        // rows come back unfilled) — plain scan order is also what real
        // animation encoders emit
        desc.setAttribute("interlaceFlag", "FALSE")
        val gces = tree.getElementsByTagName("GraphicControlExtension")
        val gce =
          if (gces.getLength > 0)
            gces.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val node = new javax.imageio.metadata.IIOMetadataNode(
              "GraphicControlExtension")
            tree.appendChild(node); node
          }
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Synthesize an IMA ADPCM WAV (format tag 0x11) from EXPLICIT block
    * contents — fixture plumbing for the ORACLE-EXACT compressed-audio
    * entry: `blocks(b)(c) = (headerPredictor, headerStepIndex, nibbles)`
    * (outer = block, inner = channel; nibble counts equal across
    * channels and multiples of 8). With the nibble stream a pure
    * function of doc_id, the DuckDB twin replays the integer decode
    * state machine in a recursive CTE — a REAL lossy codec with a
    * hash-exact oracle. */
  def imaAdpcmWav(sampleRate: Int,
                  blocks: Seq[Seq[(Int, Int, Seq[Int])]]): Array[Byte] = {
    require(blocks.nonEmpty && blocks.forall(_.nonEmpty), "need >= 1 block/channel")
    val channels = blocks.head.size
    val nNib = blocks.head.head._3.size
    require(nNib % 8 == 0, s"nibble count per block must be a multiple of 8: $nNib")
    require(blocks.forall(b => b.size == channels && b.forall(_._3.size == nNib)),
      "all blocks must carry the same channel count and nibble count")
    val blockAlign = channels * (4 + nNib / 2)
    val samplesPerBlock = nNib + 1
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    val dataLen = blocks.size * blockAlign
    out.write("RIFF".getBytes("US-ASCII")); w32(4 + 8 + 20 + 8 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(0x11); w16(channels); w32(sampleRate)
    w32(sampleRate * blockAlign / samplesPerBlock) // nominal byte rate
    w16(blockAlign); w16(4); w16(2); w16(samplesPerBlock)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    blocks.foreach { chs =>
      chs.foreach { case (pred, idx, ns) =>
        require(pred >= -32768 && pred <= 32767 && idx >= 0 && idx <= 88,
          s"header out of range: pred=$pred idx=$idx")
        require(ns.forall(n => n >= 0 && n <= 15), "nibbles must be 0..15")
        w16(pred & 0xFFFF); out.write(idx); out.write(0)
      }
      // 4-byte nibble groups interleaved per channel, LOW nibble first
      for (g <- 0 until nNib / 8; ch <- chs; b <- 0 until 4) {
        val ns = ch._3
        out.write((ns(g * 8 + b * 2) & 0xF) | ((ns(g * 8 + b * 2 + 1) & 0xF) << 4))
      }
    }
    out.toByteArray
  }

  /** A real mono IMA ADPCM ENCODER (greedy nibble quantization, step
    * index carried across blocks — the standard layout) — fixture for
    * the round-trip spec: encode 16-bit samples, decode with
    * [[Codecs.ImaAdpcmDecoder]], bound the reconstruction error. */
  def imaAdpcmEncode(samples: Array[Int], sampleRate: Int,
                     samplesPerBlock: Int): Array[Byte] = {
    require(samplesPerBlock >= 9 && (samplesPerBlock - 1) % 8 == 0,
      s"samplesPerBlock must be 8k+1: $samplesPerBlock")
    require(samples.length % samplesPerBlock == 0,
      s"sample count ${samples.length} must fill whole blocks of $samplesPerBlock")
    var idx = 0
    val blocks = samples.grouped(samplesPerBlock).map { blk =>
      val pred0 = math.max(-32768, math.min(32767, blk(0)))
      var pred = pred0
      val headIdx = idx
      val nibbles = blk.drop(1).map { s =>
        val step = Codecs.ImaAdpcmDecoder.StepTable(idx)
        var d = s - pred
        var n = if (d < 0) { d = -d; 8 } else 0
        if (d >= step) { n |= 4; d -= step }
        if (d >= (step >> 1)) { n |= 2; d -= step >> 1 }
        if (d >= (step >> 2)) n |= 1
        val st = Codecs.ImaAdpcmDecoder.stepState(pred, idx, n)
        pred = (st >> 16).toInt; idx = (st & 0xFFFF).toInt
        n
      }
      Seq((pred0, headIdx, nibbles.toSeq))
    }.toSeq
    imaAdpcmWav(sampleRate, blocks)
  }

  /** Per-channel FLAC subframe content for [[flacBytes]] — explicit
    * enough that a spec (or the oracle entry) controls every coded bit.
    * `wasted` shifts the FINAL samples left by that many bits (the
    * subframe codes `value >> wasted` and flags the shift). */
  sealed trait FlacSub extends Serializable
  /** `n` copies of `value`. */
  final case class FlacConstant(value: Int, n: Int, wasted: Int = 0) extends FlacSub
  final case class FlacVerbatim(samples: Seq[Int], wasted: Int = 0) extends FlacSub
  /** FIXED-predictor subframe: `order` warm-up samples then Rice-coded
    * residuals split into `2^partOrder` partitions, all with one
    * `riceParam`; a NEGATIVE riceParam `-b` selects the escape-to-raw
    * encoding with `b`-bit verbatim residuals instead (the decoder path
    * real encoders use for incompressible partitions). Decoded output:
    * warm-ups then `s(i) = fixedPredict(s, i) + residual(i)`. */
  final case class FlacFixed(order: Int, warmup: Seq[Int], residual: Seq[Int],
                             riceParam: Int, wasted: Int = 0,
                             partOrder: Int = 0) extends FlacSub
  /** LPC subframe: quantized coefficients + shift, Rice-coded residuals.
    * Decoded: `s(i) = ((sum coefs(j)*s(i-1-j)) >> shift) + residual(i)`. */
  final case class FlacLpc(warmup: Seq[Int], coefs: Seq[Int], precision: Int,
                           shift: Int, residual: Seq[Int], riceParam: Int)
      extends FlacSub

  private def flacSubLen(s: FlacSub): Int = s match {
    case FlacConstant(_, n, _) => n
    case FlacVerbatim(v, _) => v.size
    case FlacFixed(o, _, r, _, _, _) => o + r.size
    case FlacLpc(w, _, _, _, r, _) => w.size + r.size
  }

  /** MSB-first bit writer for the FLAC fixture encoder. */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nBits = 0
    def putBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }
    def putBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { putBit(((v >>> k) & 1L).toInt); k -= 1 }
    }
    def putSigned(v: Int, n: Int): Unit =
      putBits(if (v < 0) v + (1L << n) else v.toLong, n)
    def putUnary(q: Int): Unit = { (0 until q).foreach(_ => putBit(0)); putBit(1) }
    def align(): Unit = while (nBits != 0) putBit(0)
    def bytes: Array[Byte] = { require(nBits == 0, "unaligned"); buf.toByteArray }
  }

  /** Build a complete FLAC stream from explicit per-frame subframe
    * specs — fixture plumbing for the hash-exact FLAC entry and the
    * decoder specs. `frames(f) = (channelAssignment, subframes)` where
    * assignment 0-7 is `subframes.size - 1` independent channels, 8 =
    * left/side, 9 = side/right, 10 = mid/side (side specs carry the
    * SIDE channel's values; the decoder reconstructs L/R). CRC-8 and
    * CRC-16 computed for real — the decoder verifies both. */
  def flacBytes(sampleRate: Int, bps: Int, channels: Int,
                frames: Seq[(Int, Seq[FlacSub])]): Array[Byte] = {
    require(frames.nonEmpty, "need >= 1 frame")
    val blockSizes = frames.map { case (_, subs) =>
      val ns = subs.map(flacSubLen).distinct
      require(ns.size == 1, s"subframe lengths disagree: $ns")
      ns.head
    }
    val total = blockSizes.map(_.toLong).sum
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (type 0, last-metadata flag set, 34 bytes)
    out.write(Array[Byte](0x80.toByte, 0, 0, 34))
    val si = new BitWriter
    val minB = blockSizes.min; val maxB = blockSizes.max
    si.putBits(minB, 16); si.putBits(maxB, 16)
    si.putBits(0, 24); si.putBits(0, 24) // frame sizes unknown
    si.putBits(sampleRate, 20)
    si.putBits(channels - 1, 3)
    si.putBits(bps - 1, 5)
    si.putBits(total, 36)
    (0 until 16).foreach(_ => si.putBits(0, 8)) // MD5 unset
    out.write(si.bytes)
    frames.zipWithIndex.foreach { case ((chAsgn, subs), f ) =>
      val blockSize = blockSizes(f)
      val w = new BitWriter
      w.putBits(0x3FFE, 14); w.putBit(0); w.putBit(0) // sync, fixed-block
      w.putBits(7, 4)  // block size: 16-bit value-1 follows
      w.putBits(0, 4)  // sample rate: from STREAMINFO
      w.putBits(chAsgn, 4)
      w.putBits(bps match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
        case _ => 0
      }, 3)
      w.putBit(0)
      // UTF-8 frame number (fits 7 bits for the fixture frame counts)
      require(f < 128, "fixture frame number exceeds 1-byte UTF-8")
      w.putBits(f, 8)
      w.putBits(blockSize - 1, 16)
      val headerBytes = w.bytes // header is byte-aligned here
      val crc8 = graft.ops.Codecs.FlacDecoder.crc8(headerBytes, 0, headerBytes.length)
      val body = new BitWriter
      subs.zipWithIndex.foreach { case (sub, c) =>
        val effBps = chAsgn match {
          case 8 => if (c == 1) bps + 1 else bps  // left/side
          case 9 => if (c == 0) bps + 1 else bps  // side/right
          case 10 => if (c == 1) bps + 1 else bps // mid/side
          case _ => bps
        }
        writeSubframe(body, sub, effBps)
      }
      body.align()
      val frameBytes = headerBytes ++ Array(crc8.toByte) ++ body.bytes
      val crc16 = graft.ops.Codecs.FlacDecoder.crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes)
      out.write((crc16 >> 8) & 0xFF); out.write(crc16 & 0xFF)
    }
    out.toByteArray
  }

  private def writeSubframe(w: BitWriter, sub: FlacSub, bps: Int): Unit = {
    def header(stype: Int, wasted: Int): Int = {
      w.putBit(0); w.putBits(stype, 6)
      if (wasted > 0) { w.putBit(1); w.putUnary(wasted - 1) } else w.putBit(0)
      bps - wasted
    }
    def rice(vals: Seq[Int], param: Int, partOrder: Int, predOrder: Int,
             blockSize: Int): Unit = {
      w.putBits(0, 2) // RICE (4-bit params) method
      w.putBits(partOrder, 4)
      val parts = 1 << partOrder
      require(blockSize % parts == 0, "partition order must divide block size")
      val perPart = blockSize / parts
      var taken = 0
      (0 until parts).foreach { part =>
        val n = if (part == 0) perPart - predOrder else perPart
        val slice = vals.slice(taken, taken + n); taken += n
        if (param < 0) { // escape-to-raw with -param bits
          w.putBits((1 << 4) - 1, 4); w.putBits(-param, 5)
          slice.foreach(v => w.putSigned(v, -param))
        } else {
          w.putBits(param, 4)
          slice.foreach { v =>
            val u = (v.toLong << 1) ^ (v.toLong >> 63) // zigzag
            w.putUnary((u >>> param).toInt); w.putBits(u & ((1L << param) - 1), param)
          }
        }
      }
      require(taken == vals.size, "residual count mismatch")
    }
    def shifted(v: Int, wasted: Int): Int = {
      require((v >> wasted) << wasted == v, s"value $v not divisible by 2^$wasted")
      v >> wasted
    }
    sub match {
      case FlacConstant(v, _, wasted) =>
        val eff = header(0, wasted)
        w.putSigned(shifted(v, wasted), eff)
      case FlacVerbatim(vals, wasted) =>
        val eff = header(1, wasted)
        vals.foreach(v => w.putSigned(shifted(v, wasted), eff))
      case FlacFixed(order, warmup, residualVals, param, wasted, po) =>
        require(order >= 0 && order <= 4 && warmup.size == order, "bad FIXED spec")
        val eff = header(8 + order, wasted)
        warmup.foreach(v => w.putSigned(shifted(v, wasted), eff))
        rice(residualVals, param, po, order, order + residualVals.size)
      case FlacLpc(warmup, coefs, precision, shift, residualVals, param) =>
        require(coefs.nonEmpty && coefs.size == warmup.size && coefs.size <= 32 &&
          precision >= 1 && precision <= 15 && shift >= 0 && shift <= 15, "bad LPC spec")
        val eff = header(32 + coefs.size - 1, 0)
        warmup.foreach(v => w.putSigned(v, eff))
        w.putBits(precision - 1, 4)
        w.putSigned(shift, 5)
        coefs.foreach(c => w.putSigned(c, precision))
        rice(residualVals, param, 0, coefs.size, coefs.size + residualVals.size)
    }
  }

  /** A real adaptive FLAC ENCODER (fixed-predictor search per block,
    * Rice parameter estimate, optional stereo decorrelation) — the
    * independent-formulation counterpart for the round-trip spec:
    * encode arbitrary samples, decode with [[Codecs.FlacDecoder]],
    * require BIT-EXACT equality (losslessness is the invariant that
    * validates both sides). `stereo`: "independent" | "leftside" |
    * "rightside" | "midside" (2-channel input only). */
  def flacEncodeAuto(chans: Array[Array[Int]], sampleRate: Int, bps: Int,
                     blockSize: Int, stereo: String = "independent"): Array[Byte] = {
    require(chans.nonEmpty && chans.forall(_.length == chans(0).length))
    require(chans(0).length % blockSize == 0,
      "sample count must fill whole blocks")
    val maxMag = 1 << (bps - 1)
    require(chans.forall(_.forall(v => v >= -maxMag && v < maxMag)),
      s"samples exceed $bps bits")
    def bestFixed(samples: Array[Int]): FlacSub = {
      // pick the fixed order minimizing total residual magnitude
      def residuals(o: Int): Array[Int] =
        Array.tabulate(samples.length - o) { k =>
          val i = k + o
          val p: Long = o match {
            case 0 => 0L
            case 1 => samples(i - 1).toLong
            case 2 => 2L * samples(i - 1) - samples(i - 2)
            case 3 => 3L * samples(i - 1) - 3L * samples(i - 2) + samples(i - 3)
            case _ => 4L * samples(i - 1) - 6L * samples(i - 2) +
              4L * samples(i - 3) - samples(i - 4)
          }
          (samples(i) - p).toInt
        }
      if (samples.forall(_ == samples(0)))
        FlacConstant(samples(0), samples.length)
      else {
        val cand = (0 to math.min(4, samples.length)).map(o => o -> residuals(o))
        val (order, res) = cand.minBy { case (_, r) =>
          r.map(v => math.abs(v.toLong)).sum
        }
        // Rice parameter from the mean magnitude (the classic estimate)
        val mean = if (res.isEmpty) 0.0
          else res.map(v => math.abs(v.toLong)).sum.toDouble / res.length
        var param = 0
        while (param < 14 && (1L << param) < mean) param += 1
        FlacFixed(order, samples.take(order).toSeq, res.toSeq, param)
      }
    }
    val nBlocks = chans(0).length / blockSize
    val frames = (0 until nBlocks).map { b =>
      val slices = chans.map(_.slice(b * blockSize, (b + 1) * blockSize))
      if (chans.length == 2 && stereo != "independent") {
        val l = slices(0); val r = slices(1)
        val side = Array.tabulate(blockSize)(i => l(i) - r(i))
        stereo match {
          case "leftside" => (8, Seq(bestFixed(l), bestFixed(side)))
          case "rightside" => (9, Seq(bestFixed(side), bestFixed(r)))
          case "midside" =>
            val mid = Array.tabulate(blockSize)(i => (l(i) + r(i)) >> 1)
            (10, Seq(bestFixed(mid), bestFixed(side)))
          case other => throw new IllegalArgumentException(other)
        }
      } else (chans.length - 1, slices.map(bestFixed).toSeq)
    }
    flacBytes(sampleRate, bps, chans.length, frames)
  }

  private val probeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("probed", BooleanType),
    StructField("format", StringType),
    StructField("codec", StringType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", LongType)))

  /** Media TRIAGE (r10): header-only probes over a binary column — the
    * stage that runs BEFORE decode at 100 TB (filter by duration /
    * resolution / bitrate / codec, then decode the survivors), and the
    * stage that serves the formats this container cannot fully decode:
    * MP3 frame walks and MP4 box walks yield real typed metadata where
    * decode can only flag. Partition-local, allocation-light (header
    * reads only), no shuffle; unprobeable payloads emit one flagged
    * `probed=false` row, the mixed-column contract of the decoders. */
  def probeMedia(blobs: DataFrame,
                 probe: MediaProbe.Probe = MediaProbe.Default): DataFrame = {
    val spark = blobs.sparkSession
    val rows = blobs.select(col("doc_id").cast("long"), col("blob")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = idOrNull(r)
          probe.probe(r.getAs[Array[Byte]](1)) match {
            case None =>
              Row(id, false, "unknown", null, null, null, null, null, null, null, null)
            case Some(m) =>
              Row(id, true, m.format, m.codec, m.durationMs, m.sampleRate,
                m.channels, m.bitrateKbps, m.width, m.height, m.frames)
          }
        }
      }
    spark.createDataFrame(rows, probeSchema)
  }

  /** Synthesize a valid MPEG audio (MP3) stream: `nFrames` frames of
    * the given version/layer/bitrate/samplerate indices with zeroed
    * payloads (a PROBE fixture — frame headers and lengths are real,
    * audio content is silence the probe never reads). Optional ID3v2
    * prefix padding and trailing ID3v1 tag exercise the skip paths. */
  def mp3Bytes(nFrames: Int, versionBits: Int, layerBits: Int,
               bitrateIdx: Int, srIdx: Int, mono: Boolean,
               id3v2Pad: Int = 0, id3v1: Boolean = false): Array[Byte] = {
    require(versionBits == 3 || versionBits == 2 || versionBits == 0, "bad version")
    require(layerBits >= 1 && layerBits <= 3 && bitrateIdx >= 1 && bitrateIdx <= 14 &&
      srIdx >= 0 && srIdx <= 2, "bad header indices")
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Pad > 0) {
      out.write("ID3".getBytes("US-ASCII"))
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((id3v2Pad >> 21) & 0x7F); out.write((id3v2Pad >> 14) & 0x7F)
      out.write((id3v2Pad >> 7) & 0x7F); out.write(id3v2Pad & 0x7F)
      (0 until id3v2Pad).foreach(_ => out.write(0))
    }
    val sr = (versionBits match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    })(srIdx)
    val br = (if (versionBits == 3)
      (if (layerBits == 3) Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
       else if (layerBits == 2) Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
       else Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
    else
      (if (layerBits == 3) Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
       else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))(bitrateIdx)
    val frameLen =
      if (layerBits == 3) (12 * br * 1000 / sr) * 4
      else if (layerBits == 2) 144 * br * 1000 / sr
      else (if (versionBits == 3) 144 else 72) * br * 1000 / sr
    (0 until nFrames).foreach { _ =>
      out.write(0xFF)
      out.write(0xE0 | (versionBits << 3) | (layerBits << 1) | 1) // no CRC
      out.write((bitrateIdx << 4) | (srIdx << 2)) // no padding
      out.write(if (mono) 0xC0 else 0x00)
      (4 until frameLen).foreach(_ => out.write(0))
    }
    if (id3v1) {
      out.write("TAG".getBytes("US-ASCII"))
      (3 until 128).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  /** Synthesize a minimal valid ISO BMFF (MP4) box tree: `ftyp` +
    * `moov(mvhd + trak(tkhd + mdia(minf(stbl(stsd)))))` — a PROBE
    * fixture carrying brand, timescale/duration, track dims, and the
    * sample-entry fourcc; no media data. */
  def mp4Bytes(brand: String, timescale: Int, durationTicks: Long,
               w: Int, h: Int, codec: String): Array[Byte] = {
    require(brand.length == 4 && codec.length == 4, "fourcc length")
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ be32(0) ++
      "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", be32(0) /* v0+flags */ ++ be32(0) ++ be32(0) ++
      be32(timescale.toLong) ++ be32(durationTicks) ++
      be32(0x00010000L) ++ Array.fill[Byte](2 + 10 + 36 + 24 + 4)(0))
    val tkhd = box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(durationTicks) ++ Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      be32(16) ++ codec.getBytes("US-ASCII") ++ Array.fill[Byte](8)(0))
    val trak = box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsd))))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  /** A ZIP archive via the JDK writer (PROBE fixture): `entries` are
    * (name, content) pairs; `stored = true` writes method-0 entries
    * (CRC precomputed, as STORED requires), else DEFLATE. */
  def zipBytes(entries: Seq[(String, Array[Byte])],
               stored: Boolean = false): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(buf)
    entries.foreach { case (name, content) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(1704067200000L) // fixed stamp: stable fixture bytes
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(content.length)
        e.setCompressedSize(content.length)
        val crc = new java.util.zip.CRC32()
        crc.update(content)
        e.setCrc(crc.getValue)
      }
      z.putNextEntry(e)
      z.write(content)
      z.closeEntry()
    }
    z.close()
    buf.toByteArray
  }

  /** Ogg page CRC (RFC 3533 §6): CRC-32 with polynomial 0x04C11DB7,
    * MSB-first, init 0, no final xor — NOT the zlib reflected CRC. */
  private def oggCrc(b: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < b.length) {
      crc ^= (b(i) & 0xFF) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04C11DB7
              else crc << 1
        k += 1
      }
      i += 1
    }
    crc
  }

  /** One Ogg page with real lacing and a real CRC. A payload that is a
    * multiple of 255 gets the mandated trailing 0 lacing value. */
  private def oggPage(hdrType: Int, granule: Long, serial: Int, seq: Int,
                      payload: Array[Byte]): Array[Byte] = {
    val full = payload.length / 255
    val segs = Array.fill(full)(255.toByte) :+ (payload.length % 255).toByte
    val page = new Array[Byte](27 + segs.length + payload.length)
    page(0) = 'O'; page(1) = 'g'; page(2) = 'g'; page(3) = 'S'
    page(4) = 0; page(5) = hdrType.toByte
    var i = 0
    while (i < 8) { page(6 + i) = ((granule >>> (8 * i)) & 0xFF).toByte; i += 1 }
    i = 0
    while (i < 4) {
      page(14 + i) = ((serial >>> (8 * i)) & 0xFF).toByte
      page(18 + i) = ((seq >>> (8 * i)) & 0xFF).toByte
      i += 1
    }
    page(26) = segs.length.toByte
    System.arraycopy(segs, 0, page, 27, segs.length)
    System.arraycopy(payload, 0, page, 27 + segs.length, payload.length)
    val crc = oggCrc(page) // CRC field is still zero here, as specified
    i = 0
    while (i < 4) { page(22 + i) = ((crc >>> (8 * i)) & 0xFF).toByte; i += 1 }
    page
  }

  /** Synthesize a minimal valid Ogg Vorbis stream for the PROBE: a BOS
    * page carrying the 30-byte Vorbis identification header and an EOS
    * page whose granule position is the total-sample count (the Vorbis
    * duration convention). The audio payload is opaque filler the
    * probe never parses. */
  def oggVorbisBytes(rate: Int, channels: Int, totalSamples: Long,
                     nominalBps: Int, serial: Int = 0x1234): Array[Byte] = {
    val id = new Array[Byte](30)
    id(0) = 1
    System.arraycopy("vorbis".getBytes("US-ASCII"), 0, id, 1, 6)
    id(11) = channels.toByte
    var i = 0
    while (i < 4) {
      id(12 + i) = ((rate >>> (8 * i)) & 0xFF).toByte
      id(20 + i) = ((nominalBps >>> (8 * i)) & 0xFF).toByte
      i += 1
    }
    id(28) = 0x88.toByte // blocksizes 256/256 (unread by the probe)
    id(29) = 1           // framing bit
    val audio = Array.tabulate(49)(k => (k * 7).toByte)
    oggPage(0x02, 0L, serial, 0, id) ++
      oggPage(0x04, totalSamples, serial, 1, audio)
  }

  /** Synthesize a minimal valid Ogg Opus stream for the PROBE (RFC
    * 7845): BOS page with the 19-byte OpusHead, EOS page at granule
    * preSkip + samples48k (granules are 48 kHz units; duration excludes
    * the pre-skip). */
  def oggOpusBytes(channels: Int, preSkip: Int, inputRate: Int,
                   samples48k: Long, serial: Int = 0x5678): Array[Byte] = {
    val id = new Array[Byte](19)
    System.arraycopy("OpusHead".getBytes("US-ASCII"), 0, id, 0, 8)
    id(8) = 1
    id(9) = channels.toByte
    id(10) = (preSkip & 0xFF).toByte; id(11) = ((preSkip >> 8) & 0xFF).toByte
    var i = 0
    while (i < 4) { id(12 + i) = ((inputRate >>> (8 * i)) & 0xFF).toByte; i += 1 }
    val audio = Array.tabulate(37)(k => (k * 11).toByte)
    oggPage(0x02, 0L, serial, 0, id) ++
      oggPage(0x04, preSkip.toLong + samples48k, serial, 1, audio)
  }

  /** Synthesize a minimal Matroska/WebM EBML tree for the PROBE:
    * EBML(DocType) + Segment(Info(TimestampScale=1ms, Duration as
    * float64) + Tracks(TrackEntry(TrackType=video, CodecID,
    * Video(PixelWidth, PixelHeight)))). Sizes use 2-byte vints
    * (non-minimal lengths are legal EBML). */
  def webmBytes(docType: String, durationMs: Long, w: Int, h: Int,
                codec: String): Array[Byte] = {
    def idBytes(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def size2(n: Int): Array[Byte] = {
      require(n < 0x3FFF, s"size2 overflow: $n")
      Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte)
    }
    def el(id: Long, body: Array[Byte]): Array[Byte] =
      idBytes(id) ++ size2(body.length) ++ body
    def uint(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def f64(d: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      Array.tabulate(8)(i => ((bits >>> (8 * (7 - i))) & 0xFF).toByte)
    }
    val ebml = el(0x1A45DFA3L, el(0x4282L, docType.getBytes("US-ASCII")))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uint(1000000L)) ++ el(0x4489L, f64(durationMs.toDouble)))
    val video = el(0xE0L, el(0xB0L, uint(w.toLong)) ++ el(0xBAL, uint(h.toLong)))
    val track = el(0xAEL, el(0x83L, uint(1L)) ++
      el(0x86L, codec.getBytes("US-ASCII")) ++ video)
    ebml ++ el(0x18538067L, info ++ el(0x1654AE6BL, track))
  }

  /** [[webmBytes]] with an AUDIO TrackEntry instead of a video one:
    * TrackType=audio, CodecID, Audio(SamplingFrequency as float64,
    * Channels). */
  def webmAudioBytes(docType: String, durationMs: Long, codec: String,
                     rate: Int, channels: Int): Array[Byte] = {
    def idBytes(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def size2(n: Int): Array[Byte] =
      Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte)
    def el(id: Long, body: Array[Byte]): Array[Byte] =
      idBytes(id) ++ size2(body.length) ++ body
    def uint(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def f64(d: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      Array.tabulate(8)(i => ((bits >>> (8 * (7 - i))) & 0xFF).toByte)
    }
    val ebml = el(0x1A45DFA3L, el(0x4282L, docType.getBytes("US-ASCII")))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uint(1000000L)) ++ el(0x4489L, f64(durationMs.toDouble)))
    val audio = el(0xE1L, el(0xB5L, f64(rate.toDouble)) ++
      el(0x9FL, uint(channels.toLong)))
    val track = el(0xAEL, el(0x83L, uint(2L)) ++
      el(0x86L, codec.getBytes("US-ASCII")) ++ audio)
    ebml ++ el(0x18538067L, info ++ el(0x1654AE6BL, track))
  }

  /** VIDEO near-duplicate pairs by positional frame-signature voting over
    * a [[sampleFrames]] output: two clips are near-dups when at least
    * `minVotes` of their sampled frames carry the same signature at the
    * same frame index — the re-upload/re-encode video dedup shape (most
    * frames survive identically, a few differ at trims/overlays).
    *
    * The per-frame signature here is the quantized mean luma (an exact
    * integer — demo-grade but oracle-provable); a production pipeline
    * swaps a per-frame perceptual hash (e.g. [[decodeImageDHash]]'s
    * dHash over the frame bytes) into the SAME (frame_idx, signature)
    * join — the signature column is the seam, the voting join is the
    * operator. Contact between clips happens only through equal
    * (frame_idx, signature) keys — the LSH-banding join shape, one
    * bucket shuffle, never an all-pairs compare. Caveat at scale: a
    * degenerate constant signature (black frames) mega-buckets exactly
    * like an LSH hot bucket — production signatures (dHash) spread it;
    * undecodable or empty clips carry NULL frame fields and never vote.
    *
    * @return (id_a, id_b, votes) with id_a < id_b, votes >= minVotes */
  def videoNearDupPairs(frames: DataFrame, minVotes: Int): DataFrame = {
    require(minVotes >= 1, s"minVotes must be >= 1: $minVotes")
    // mean_luma = s/(w*h)/255 with integer s: ×255 recovers the mean to
    // within an ulp and round() lands the exact integer when frames are
    // constant-gray; patterned frames quantize deterministically too
    val sig = frames
      .filter(col("decoded") && col("frame_idx").isNotNull)
      .select(col("doc_id"), col("frame_idx").as("k"),
        round(col("mean_luma") * 255).cast("int").as("sig"))
    // scoped cache: BOTH self-join sides read `sig`, and without it the
    // upstream decode (the dominant cost under a real codec) runs twice
    // — the hammingPairs house pattern
    graft.ops.Caching.scoped(sig) {
      sig.toDF("id_a", "k", "sig")
        .join(sig.toDF("id_b", "k", "sig"), Seq("k", "sig"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("votes"))
        .filter(col("votes") >= minVotes)
    }
  }

  /** dHash of a raw GRAYSCALE plane (a [[sampleFrames]] `frame` payload):
    * the gray bytes ARE the luma plane, so [[decodeImageDHash]]'s 9x8
    * mean-downsample grid applies directly — and with INTEGER sums the
    * column-mean comparison can run on cross-multiplied longs, exact for
    * every frame size (the image path's double division is exact only on
    * the fixture geometry). Empty grid cells (w < 9 or h < 8) behave as
    * mean 0, matching the image path's convention. */
  private[graft] def grayDHash(gray: Array[Byte], w: Int, h: Int): Long = {
    val sum = Array.ofDim[Long](8, 9)
    val cnt = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gr = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val gc = (x.toLong * 9 / w).toInt
        sum(gr)(gc) += (gray(y * w + x) & 0xFF)
        cnt(gr)(gc) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gr = 0
    while (gr < 8) {
      var gc = 0
      while (gc < 8) {
        val sa = sum(gr)(gc); val ca = cnt(gr)(gc)
        val sb = sum(gr)(gc + 1); val cb = cnt(gr)(gc + 1)
        // mean(a) > mean(b) with empty cells as 0; cross-multiplication
        // keeps it exact (sums <= 255 * pixels, nowhere near Long range)
        val gt =
          if (ca == 0L) false
          else if (cb == 0L) sa > 0L
          else sa * cb > sb * ca
        if (gt) hash |= 1L << (gr * 8 + gc)
        gc += 1
      }
      gr += 1
    }
    hash
  }

  private val frameDHashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("frame_idx", IntegerType),
    StructField("dhash", LongType, nullable = true)))

  /** Per-frame perceptual dHash over a [[sampleFrames]] output — the
    * production video signature ([[videoNearDupPairs]]'s scaladoc names
    * this exact swap-in): each sampled frame's gray plane reduced to the
    * same 64-bit gradient fingerprint [[decodeImageDHash]] emits for
    * images, so re-encoding artifacts, brightness shifts, and mild
    * resizes keep per-frame signatures stable instead of mega-bucketing
    * like quantized luma. Undecodable payloads and valid-empty clips
    * carry a NULL dhash (`decoded` preserved) — visible to accounting,
    * excluded from banding. Partition-local, no shuffle. */
  def frameDHash(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    val rows = frames.select(col("doc_id"), col("decoded"), col("frame_idx"),
        col("width"), col("height"), col("frame")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = idOrNull(r)
          val dec = !r.isNullAt(1) && r.getBoolean(1)
          val k: java.lang.Integer =
            if (r.isNullAt(2)) null else Integer.valueOf(r.getInt(2))
          if (!dec || r.isNullAt(5)) Row(id, dec, k, null)
          else {
            val w = r.getInt(3); val h = r.getInt(4)
            val frame = r.getAs[Array[Byte]](5)
            Row(id, true, k, java.lang.Long.valueOf(grayDHash(frame, w, h)))
          }
        }
      }
    spark.createDataFrame(rows, frameDHashSchema)
  }

  /** Synthesize a GFV1 clip (9x8 frames) whose [[frameDHash]] fingerprints
    * are EXACTLY `patterns` — the video twin of [[dhashPng]]: each frame's
    * grid row walks gray values from `base` in ±12 steps, stepping DOWN
    * iff the pattern bit is set, and with one pixel per grid cell the
    * mean-luma grid IS the pixel grid, so every comparison sits on an
    * exact ±12 gap. Fixture plumbing for the ORACLE-EXACT video near-dup
    * entry. */
  def gfvDHashVideo(patterns: Seq[Long], base: Int = 128): Array[Byte] = {
    require(base - 96 >= 0 && base + 96 <= 255, s"base walks out of gamut: $base")
    val w = 9; val h = 8
    val out = java.nio.ByteBuffer.allocate(16 + patterns.length * w * h)
    out.put("GFV1".getBytes("US-ASCII")).putInt(patterns.length).putInt(w).putInt(h)
    patterns.foreach { pattern =>
      val frame = new Array[Byte](w * h)
      var r = 0
      while (r < 8) {
        var v = base
        frame(r * w) = v.toByte
        var c = 0
        while (c < 8) {
          v = if (((pattern >> (r * 8 + c)) & 1L) == 1L) v - 12 else v + 12
          frame(r * w + c + 1) = v.toByte
          c += 1
        }
        r += 1
      }
      out.put(frame)
    }
    out.array()
  }

  /** PRODUCTION-shape video near-dup: positional frame voting like
    * [[videoNearDupPairs]], but with each frame's perceptual dHash
    * ([[frameDHash]]) as the signature and a HAMMING-TOLERANT match —
    * frame `k` of clip A votes for (A, B) when clip B's frame `k` sits
    * within `maxDist` bits, found via [[Dedup.hammingPairsBy]]'s 4x16
    * banding WITHIN each frame index (recall guaranteed for
    * maxDist <= 3). This is the re-upload/re-encode shape with the
    * mega-bucket caveat of the quantized-luma demo CLOSED: gradient
    * hashes spread constant-luma collisions, and a re-encoded frame that
    * drifts a few gradient bits still votes. Contact between clips still
    * happens only through equal (frame_idx, band) keys — one bucket
    * shuffle, never an all-pairs compare.
    *
    * @return (id_a, id_b, votes) with id_a < id_b, votes >= minVotes */
  def videoNearDupDHash(frames: DataFrame, minVotes: Int, maxDist: Int): DataFrame = {
    require(minVotes >= 1, s"minVotes must be >= 1: $minVotes")
    val sig = frameDHash(frames)
      .filter(col("dhash").isNotNull)
      .select(col("doc_id"), col("frame_idx").as("k"), col("dhash"))
    // unscoped plan + one scope around the FINAL frame: the public
    // hammingPairsBy would hand back an already-persisted pairs handle
    // that the vote aggregate on top would leave cached with no owner
    val (sh, pairs) =
      graft.ops.Dedup.hammingPairsPlan(sig, "doc_id", "dhash", Seq("k"), maxDist)
    graft.ops.Caching.scoped(sh)(
      pairs.groupBy("id_a", "id_b").agg(count(lit(1)).as("votes"))
        .filter(col("votes") >= minVotes))
  }
}
