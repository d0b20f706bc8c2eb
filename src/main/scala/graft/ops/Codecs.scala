package graft.ops

/** Pluggable compressed-media decoder seams for [[Multimodal]].
  *
  * This container ships no media codecs (the JDK decodes PNG/BMP/JPEG/GIF
  * images and WAV/AU/AIFF PCM audio, nothing compressed like MP3/OGG/MP4),
  * so the operators expose their partition-local decode boundary as an
  * interface: a user with a real crawl drops a JCodec/FFmpeg/JNI-backed
  * implementation into [[Multimodal.sampleFrames]] /
  * [[Multimodal.decodeAudioFeatures]] without touching the operator — the
  * Spark plumbing (schema, flagged-fallback accounting, stride sampling,
  * feature math, partitioning) is identical for every decoder.
  *
  * Contract for both traits:
  *  - implementations MUST be `Serializable` — they ship to executors
  *    inside the `mapPartitions` closure;
  *  - `decode` returning None means "not my format / corrupt payload":
  *    the operator emits its flagged `decoded=false` row and the job
  *    never fails on a mixed binary column;
  *  - `decode` must not throw on arbitrary bytes (catch internally and
  *    return None — the JDK-backed defaults do exactly that).
  */
object Codecs {

  /** Little-endian byte readers shared by the RIFF-walking decoders
    * (one definition — the [[graft.core.Fs]] consolidation argument). */
  private[ops] object LE {
    def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    def i32(b: Array[Byte], o: Int): Int =
      u16(b, o) | (u16(b, o + 2) << 16)
  }

  /** A decoded clip. `frame(k)` returns the k-th GRAYSCALE plane
    * (exactly `width*height` bytes) ON DEMAND, so a stride-sampling
    * consumer (`everyN` > 1) never materializes the frames it skips —
    * decoders over seekable containers can slice lazily (the GFV1
    * default does), while a sequential codec may decode into a buffer
    * and serve from it. */
  final case class VideoClip(width: Int, height: Int, nFrames: Int,
                             frame: Int => Array[Byte])

  /** Payload corruption a decoder could only discover AFTER `decode()`
    * returned `Some` — e.g. a JPEG whose headers parsed but whose
    * entropy-coded data is torn. `VideoClip.frame(k)` throws this and
    * the operator demotes the whole doc to its flagged `decoded=false`
    * row (the same outcome as an up-front `None`), keeping the
    * never-fail-the-job contract even for lazily-decoded formats. Any
    * OTHER exception from `frame` is a broken DECODER and stays loud. */
  final class CorruptPayload(msg: String) extends RuntimeException(msg)

  /** bytes → [[VideoClip]]; None = undecodable. `Some` with
    * `nFrames == 0` is a VALID empty clip (the operator keeps the doc
    * visible with a `decoded=true` row and no frame fields). */
  trait VideoDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Option[VideoClip]
  }

  /** The default video "codec": GFV1, the documented deterministic fake
    * container (`"GFV1" | int32 n | int32 w | int32 h | n × w·h gray
    * bytes`, big-endian) — the JDK has no real video codec, so fixtures
    * synthesize GFV1 and a real decoder replaces this object. Validation
    * is overflow-safe: `frameLen <= payload/n` is checked before
    * `n·frameLen`, so a crafted header can't wrap Long and fake a
    * matching length. */
  object Gfv1Decoder extends VideoDecoder {
    def decode(bytes: Array[Byte]): Option[VideoClip] = {
      if (bytes == null || bytes.length < 16 ||
          bytes(0) != 'G' || bytes(1) != 'F' || bytes(2) != 'V' || bytes(3) != '1') None
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes, 4, 12)
        val n = bb.getInt; val w = bb.getInt; val h = bb.getInt
        val frameLen = w.toLong * h
        val payload = bytes.length - 16L
        if (n < 0 || w <= 0 || h <= 0 ||
            (n == 0 && payload != 0L) ||
            (n > 0 && (frameLen > payload / n || payload != n * frameLen))) None
        else Some(VideoClip(w, h, n, k =>
          java.util.Arrays.copyOfRange(bytes,
            16 + k * frameLen.toInt, 16 + (k + 1) * frameLen.toInt)))
      }
    }
  }

  /** MJPEG-in-AVI (r9) — the one REAL compressed video format this
    * container can decode with zero new dependencies: a RIFF/AVI
    * container walk (pure byte parsing) locating the `##dc`/`##db`
    * video chunks inside `LIST movi`, plus per-frame `javax.imageio`
    * JPEG decode. Frame OFFSETS and geometry are validated eagerly
    * (chunk walk + JPEG SOF marker scan — header bytes only, no pixel
    * work), so a non-JPEG stream or mixed-geometry container returns
    * None up front; PIXEL decode stays per-frame lazy per the
    * [[VideoClip]] contract, so stride sampling never decodes skipped
    * frames. Single-component (grayscale) JPEGs read their raster
    * directly — bit-exact, no gray→sRGB round trip; color frames reduce
    * via the same Rec.601 luma as the image operators. An AVI with ZERO
    * video chunks is a valid empty clip (geometry from `avih`). */
  object MjpegAviDecoder extends VideoDecoder {
    // JPEG reader SPI hoisted once per JVM — ImageIO.read's per-call
    // registry scan is the per-row JDK-registry class SCALE.md's r9
    // audio finding warns about; createReaderInstance is registry-free
    @transient private lazy val jpegSpi = {
      val r = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
      try r.getOriginatingProvider finally r.dispose()
    }
    private def le32(b: Array[Byte], off: Int): Int = LE.i32(b, off)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Stream prefix ("00", "01", …) of the FIRST `vids` stream, from the
      * hdrl `strl` order (streams are numbered by strl position; chunk
      * ids carry the number as two hex digits per the Windows
      * StreamFromFOURCC convention). None when no strh parses — the
      * walk then falls back to stream 00, the universal default. */
    private def vidsStreamPrefix(b: Array[Byte]): Option[String] = {
      var streamNo = -1; var found = Option.empty[String]
      def walk(start: Int, end: Int): Boolean = {
        var p = start
        while (p + 8 <= end && found.isEmpty) {
          val id = fourcc(b, p); val len = le32(b, p + 4)
          if (len < 0 || p + 8L + len > end) return false
          if (id == "LIST" && len >= 4) {
            val lt = fourcc(b, p + 8)
            if (lt == "strl") streamNo += 1
            if (!walk(p + 12, p + 8 + len)) return false
          } else if (id == "strh" && len >= 4 && streamNo >= 0 &&
              fourcc(b, p + 8) == "vids")
            found = Some(f"$streamNo%02X")
          p += 8 + len + (len & 1)
        }
        true
      }
      walk(12, b.length)
      found
    }

    /** (offset, length) of every chunk of the FIRST `vids` stream inside
      * LIST movi (recursing through `rec ` groups), or None on a
      * structurally corrupt container. Restricting to one stream number
      * keeps a multi-stream AVI (video + audio, or two video streams)
      * from interleaving foreign chunks into the clip (review-caught:
      * the r9 walk collected every `##dc`/`##db`). */
    private def frameChunks(b: Array[Byte]): Option[Vector[(Int, Int)]] = {
      val prefix = vidsStreamPrefix(b).getOrElse("00")
      val out = Vector.newBuilder[(Int, Int)]
      def walk(start: Int, end: Int, inMovi: Boolean): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(b, p); val len = le32(b, p + 4)
          // LONG bounds: a crafted length near Int.MaxValue must not wrap
          if (len < 0 || p + 8L + len > end) return false
          if (id == "LIST" && len >= 4) {
            val lt = fourcc(b, p + 8)
            if (!walk(p + 12, p + 8 + len, inMovi || lt == "movi" || lt == "rec "))
              return false
          } else if (inMovi && id.startsWith(prefix) &&
              (id.endsWith("dc") || id.endsWith("db")) && len > 0)
            out += ((p + 8, len))
          p += 8 + len + (len & 1) // RIFF chunks pad to even
        }
        true
      }
      if (walk(12, b.length, inMovi = false)) Some(out.result()) else None
    }

    /** `avih` main-header (width, height) — the empty-clip geometry. */
    private def avihDims(b: Array[Byte]): Option[(Int, Int)] = {
      def find(start: Int, end: Int): Option[(Int, Int)] = {
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(b, p); val len = le32(b, p + 4)
          if (len < 0 || p + 8L + len > end) return None
          if (id == "avih" && len >= 40)
            return Some((le32(b, p + 8 + 32), le32(b, p + 8 + 36)))
          if (id == "LIST" && len >= 4)
            find(p + 12, p + 8 + len).foreach(d => return Some(d))
          p += 8 + len + (len & 1)
        }
        None
      }
      find(12, b.length)
    }

    /** JPEG (width, height) from the SOF marker — no pixel decode.
      * None = not a baseline/progressive JPEG stream. */
    private def jpegDims(b: Array[Byte], off: Int, len: Int): Option[(Int, Int)] = {
      if (len < 4 || (b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xFF) != 0xD8)
        return None
      var p = off + 2; val end = off + len
      while (p + 2 <= end && (b(p) & 0xFF) == 0xFF) {
        val marker = b(p + 1) & 0xFF
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) p += 2
        else if (marker == 0xDA) return None // scan data before any SOF
        else {
          if (p + 4 > end) return None
          val segLen = ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (p + 9 > end) return None
            val h = ((b(p + 5) & 0xFF) << 8) | (b(p + 6) & 0xFF)
            val w = ((b(p + 7) & 0xFF) << 8) | (b(p + 8) & 0xFF)
            return Some((w, h))
          }
          p += 2 + segLen
        }
      }
      None
    }

    /** Decoded image → grayscale plane. TYPE_BYTE_GRAY rasters copy
      * bit-exactly (getRGB would detour through the gray→sRGB color
      * model and gamma-shift every value); anything else reduces via
      * Rec.601 luma, the image operators' formula. */
    private def grayPlane(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
        val out = new Array[Byte](w * h)
        img.getRaster.getDataElements(0, 0, w, h, out)
        out
      } else {
        val out = new Array[Byte](w * h)
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var x = 0
          while (x < w) {
            val rgb = rowBuf(x)
            val luma = 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            out(y * w + x) =
              math.min(255, math.max(0, math.floor(luma + 0.5).toInt)).toByte
            x += 1
          }
          y += 1
        }
        out
      }
    }

    def decode(bytes: Array[Byte]): Option[VideoClip] =
      try {
        if (bytes == null || bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
            fourcc(bytes, 8) != "AVI ") return None
        frameChunks(bytes).flatMap { chunks =>
          if (chunks.isEmpty)
            avihDims(bytes).collect { case (w, h) if w > 0 && h > 0 =>
              VideoClip(w, h, 0, _ => Array.emptyByteArray)
            }
          else {
            // every frame must be a JPEG of one shared geometry — checked
            // from header bytes before any pixel work
            val dims = chunks.map { case (o, l) => jpegDims(bytes, o, l) }
            if (dims.exists(_.isEmpty) || dims.flatten.distinct.size != 1) None
            else {
              val (w, h) = dims.head.get
              Some(VideoClip(w, h, chunks.size, { k =>
                val (o, l) = chunks(k)
                // the SOF scan can't see entropy-coded corruption (torn
                // scan data, missing DHT tables — standard for camera
                // MJPEG): a per-frame decode failure is CORRUPT PAYLOAD,
                // not a broken decoder — throw the typed signal so the
                // operator demotes the doc to its flagged row instead of
                // failing the job
                val img = {
                  val reader = jpegSpi.createReaderInstance()
                  try {
                    reader.setInput(
                      new javax.imageio.stream.MemoryCacheImageInputStream(
                        new java.io.ByteArrayInputStream(bytes, o, l)))
                    reader.read(0)
                  } catch { case e: Exception =>
                    throw new CorruptPayload(s"frame $k: ${e.getMessage}")
                  } finally reader.dispose()
                }
                if (img == null || img.getWidth != w || img.getHeight != h)
                  throw new CorruptPayload(
                    s"frame $k decoded to ${if (img == null) "null"
                      else s"${img.getWidth}x${img.getHeight}"}, expected ${w}x$h")
                grayPlane(img)
              }))
            }
          }
        }
      } catch { case _: Exception => None } // corrupt container → fallback
  }

  /** Animated GIF (r9) — the THIRD real compressed format through this
    * seam, and the one the JDK decodes natively (LZW + palette), so
    * this decoder is production-usable on real crawl payloads with zero
    * new dependencies. Full frame COMPOSITING per the GIF89a spec:
    * frames are sub-rectangles drawn onto the logical-screen canvas at
    * (left, top) honoring each frame's disposal method (`none` /
    * `doNotDispose` keep the canvas, `restoreToBackgroundColor` clears
    * the frame's rect, `restoreToPrevious` restores the pre-draw
    * canvas) and palette transparency — naive per-frame `ImageIO.read`
    * would return bare sub-rects and mis-decode most real animations.
    * GIF frames chain (each composite depends on the last), so decode
    * materializes the planes sequentially up front — the buffered-codec
    * option the [[VideoClip]] contract documents; GIF payloads are
    * small, and `frame(k)` then serves from the buffer. The canvas
    * starts black (per-pixel luma of an untouched pixel is 0). */
  object GifDecoder extends VideoDecoder {
    // SPI hoisted ONCE per JVM: per-row getImageReadersByFormatName /
    // createImageInputStream scan the IIORegistry — the same per-row
    // JDK-registry class the audio path's 29 s lock stall came from
    // (SCALE.md r9); createReaderInstance per row is registry-free,
    // and MemoryCacheImageInputStream skips the global file-cache
    // machinery (and the ImageIO.setUseCache global mutation)
    @transient private lazy val readerSpi = {
      val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try r.getOriginatingProvider finally r.dispose()
    }
    // header-claimed geometry caps: a few-hundred-byte GIF can CLAIM a
    // 65535x65535 screen (LZW is a decompression bomb) and an OOM is an
    // Error the corrupt-payload catch would not convert to a flagged
    // row — over-cap payloads are rejected up front instead
    private val MaxPixels = 16L << 20      // canvas: 16 MP ≈ 64 MB RGB
    private val MaxPlaneBytes = 512L << 20 // all buffered frame planes

    def decode(bytes: Array[Byte]): Option[VideoClip] = {
      if (bytes == null || bytes.length < 6) return None
      val magic = new String(bytes, 0, 6, "US-ASCII")
      if (magic != "GIF87a" && magic != "GIF89a") return None
      val reader = readerSpi.createReaderInstance()
      try {
        reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        val stream = reader.getStreamMetadata
          .getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val lsd = stream.getElementsByTagName("LogicalScreenDescriptor").item(0)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val w = lsd.getAttribute("logicalScreenWidth").toInt
        val h = lsd.getAttribute("logicalScreenHeight").toInt
        if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
        // unlike AVI (where avih makes a zero-chunk container a valid
        // empty clip), a GIF with no image blocks is truncated garbage
        val n = reader.getNumImages(true)
        if (n <= 0 || n.toLong * w * h > MaxPlaneBytes) return None
        val canvas = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        val planes = Vector.newBuilder[Array[Byte]]
        var k = 0
        while (k < n) {
          // eager decode: a torn frame surfaces HERE, inside decode(),
          // so the catch below returns None (the up-front corrupt-payload
          // path) — no CorruptPayload needed, nothing is lazy
          val img = reader.read(k)
          val tree = reader.getImageMetadata(k)
            .getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val left = desc.getAttribute("imageLeftPosition").toInt
          val top = desc.getAttribute("imageTopPosition").toInt
          val gceN = tree.getElementsByTagName("GraphicControlExtension")
          val disposal =
            if (gceN.getLength == 0) "none"
            else gceN.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              .getAttribute("disposalMethod")
          val prev =
            if (disposal == "restoreToPrevious") {
              val c = new java.awt.image.BufferedImage(w, h, canvas.getType)
              c.createGraphics().drawImage(canvas, 0, 0, null)
              Some(c)
            } else None
          g.drawImage(img, left, top, null) // honors palette transparency
          planes += lumaPlane(canvas)
          disposal match {
            case "restoreToBackgroundColor" =>
              val save = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Src)
              g.setColor(java.awt.Color.BLACK)
              g.fillRect(left, top, img.getWidth, img.getHeight)
              g.setComposite(save)
            case "restoreToPrevious" =>
              g.drawImage(prev.get, 0, 0, null)
            case _ => // none / doNotDispose: canvas persists
          }
          k += 1
        }
        val out = planes.result()
        Some(VideoClip(w, h, n, out(_)))
      } catch {
        case _: Exception => None // corrupt container/frame → flagged fallback
      } finally reader.dispose()
    }

    /** Rec.601 luma of the full canvas (the image operators' formula). */
    private def lumaPlane(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val luma = 0.299 * ((rgb >> 16) & 0xFF) +
            0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          out(y * w + x) =
            math.min(255, math.max(0, math.floor(luma + 0.5).toInt)).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Decoded audio: MONO samples in [-1, 1] (multi-channel inputs are
    * averaged by the decoder), plus the source's rate and channel count
    * for accounting. */
  final case class AudioPcm(sampleRate: Int, channels: Int,
                            mono: Array[Double])

  /** bytes → [[AudioPcm]]; None = undecodable (the operator falls back
    * to the flagged byte-stride feature). */
  trait AudioDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Option[AudioPcm]

    /** Try this decoder, fall through to `other` on None — a mixed
      * binary column routes each payload to its codec through ONE
      * operator parameter (e.g. `JdkPcmDecoder.orElse(ImaAdpcmDecoder)`
      * serves PCM and ADPCM WAVs side by side). */
    def orElse(other: AudioDecoder): AudioDecoder = {
      val self = this
      new AudioDecoder {
        def decode(b: Array[Byte]): Option[AudioPcm] =
          self.decode(b).orElse(other.decode(b))
      }
    }
  }

  /** IMA/DVI ADPCM (r9) — a REAL compressed audio format (WAV format
    * tag 0x11: 4 bits per sample, 4:1 vs 16-bit PCM; telephony, game
    * assets, dictation hardware) the JDK's `javax.sound.sampled` cannot
    * decode, implemented from the public IMA spec with zero new
    * dependencies. RIFF/WAVE walk → `fmt ` (tag 0x11, bps 4) + `data`;
    * per block: one 4-byte header per channel (int16 predictor = output
    * sample 0, step index, reserved), then 4-byte nibble groups
    * interleaved per channel (LOW nibble first, 8 samples per group).
    * The decode state machine per nibble n:
    * `diff = step>>3 (+step if n&4) (+step>>1 if n&2) (+step>>2 if n&1)`,
    * predictor ± diff clamped to int16, step index += indexTable[n&7]
    * clamped to [0, 88] — pure integer arithmetic, which is what lets
    * the oracle twin replay it exactly in SQL. A truncated final block
    * decodes as far as its data reaches; a corrupt header (step index
    * > 88) rejects the payload. Multi-channel averages to mono per the
    * [[AudioPcm]] contract. */
  object ImaAdpcmDecoder extends AudioDecoder {
    private[graft] val StepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
      157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
      598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
      1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
      5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
      15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    private[graft] val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** One nibble through the state machine, packed allocation-free as
      * `(predictor' << 16) | stepIndex'` (this runs twice per payload
      * byte on the corpus hot path — a tuple would box both ints).
      * Unpack: `(s >> 16).toInt` / `(s & 0xFFFF).toInt`. */
    private[graft] def stepState(pred: Int, idx: Int, n: Int): Long = {
      val step = StepTable(idx)
      var diff = step >> 3
      if ((n & 4) != 0) diff += step
      if ((n & 2) != 0) diff += step >> 1
      if ((n & 1) != 0) diff += step >> 2
      val p = if ((n & 8) != 0) pred - diff else pred + diff
      (math.max(-32768, math.min(32767, p)).toLong << 16) |
        math.max(0, math.min(88, idx + IndexTable(n & 7)))
    }

    import LE.{u16 => le16, i32 => le32}

    def decode(bytes: Array[Byte]): Option[AudioPcm] = try {
      if (bytes == null || bytes.length < 12 ||
          new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
          new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
      // chunk walk: find fmt + data. LONG bounds — a crafted chunk
      // length near Int.MaxValue must not wrap past the array check
      // (the fastWav discipline, applied here after the r9 advice)
      var fmtOff = -1; var fmtLen = 0; var dataOff = -1; var dataLen = 0
      var p = 12
      while (p + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(bytes, p, 4, "US-ASCII")
        val len = le32(bytes, p + 4)
        if (len < 0 || p + 8L + len > bytes.length) return None
        if (id == "fmt ") { fmtOff = p + 8; fmtLen = len }
        else if (id == "data") { dataOff = p + 8; dataLen = len }
        p += 8 + len + (len & 1)
      }
      if (fmtOff < 0 || dataOff < 0) return None
      val tag = le16(bytes, fmtOff)
      val channels = le16(bytes, fmtOff + 2)
      val rate = le32(bytes, fmtOff + 4)
      val blockAlign = le16(bytes, fmtOff + 12)
      val bps = le16(bytes, fmtOff + 14)
      if (tag != 0x11 || bps != 4 || channels < 1 ||
          blockAlign < 4 * channels || rate <= 0) return None
      // nibble capacity of a full block (header sample + data nibbles)
      val capacity = (blockAlign - 4 * channels) * 2 / channels + 1
      // wSamplesPerBlock from the fmt extension (cbSize >= 2): a
      // spec-conforming encoder may pad blocks short of nibble capacity,
      // and decoding the padding would emit trailing garbage samples
      // (r9 advice). Out-of-range claims clamp to capacity — the
      // no-extension default.
      val samplesPerBlock =
        if (fmtLen >= 20 && le16(bytes, fmtOff + 16) >= 2) {
          val spb = le16(bytes, fmtOff + 18)
          if (spb >= 1 && spb <= capacity) spb else capacity
        } else capacity
      // decode block by block; the final block may be truncated
      val monoBuf = Array.newBuilder[Double]
      var blk = dataOff
      val dataEnd = dataOff + dataLen
      while (blk + 4 * channels <= dataEnd) {
        val end = math.min(blk + blockAlign, dataEnd)
        val pred = new Array[Int](channels)
        val idx = new Array[Int](channels)
        for (c <- 0 until channels) {
          pred(c) = le16(bytes, blk + 4 * c).toShort.toInt
          idx(c) = bytes(blk + 4 * c + 2) & 0xFF
          if (idx(c) > 88) return None // corrupt header
        }
        // header predictors ARE output frame 0 of the block
        var acc = 0.0
        var c = 0
        while (c < channels) { acc += pred(c) / 32768.0; c += 1 }
        monoBuf += acc / channels
        var emitted = 1
        // 4-byte nibble groups, channel-interleaved: each group is 8
        // samples of ONE channel; emit frames once all channels have
        // them, stopping at wSamplesPerBlock (the rest is pad). The
        // skipped pad nibbles need no state stepping — the next block's
        // header resets predictor and index. Allocation-free while
        // loops — this is the per-byte hot path of the 100 TB corpus
        // shape (millions of blobs/executor)
        var g = blk + 4 * channels
        val frame = Array.ofDim[Double](channels, 8)
        while (g + 4 * channels <= end && emitted < samplesPerBlock) {
          c = 0
          while (c < channels) {
            var b = 0
            while (b < 4) {
              val byte = bytes(g + 4 * c + b) & 0xFF
              var h = 0
              while (h < 2) {
                val n = if (h == 0) byte & 0xF else byte >> 4
                val st = stepState(pred(c), idx(c), n)
                pred(c) = (st >> 16).toInt; idx(c) = (st & 0xFFFF).toInt
                frame(c)(b * 2 + h) = pred(c) / 32768.0
                h += 1
              }
              b += 1
            }
            c += 1
          }
          var s = 0
          while (s < 8 && emitted < samplesPerBlock) {
            var sum = 0.0; c = 0
            while (c < channels) { sum += frame(c)(s); c += 1 }
            monoBuf += sum / channels
            emitted += 1
            s += 1
          }
          g += 4 * channels
        }
        blk += blockAlign
      }
      Some(AudioPcm(rate, channels, monoBuf.result()))
    } catch { case _: Exception => None }
  }

  /** FLAC (r10) — the first codec here chosen by CRAWL FREQUENCY, not
    * oracle convenience: FLAC is the modal lossless audio format in
    * web archives, and losslessness is what lets the hash-exact twin
    * discipline keep working (decoded samples are exact integers, so a
    * SQL twin can emit them in closed form). Implemented from the
    * public format spec (RFC 9639) with zero new dependencies:
    *
    *  - `fLaC` magic → metadata blocks (STREAMINFO parsed for rate /
    *    channels / bits-per-sample / total samples; others skipped);
    *  - frames: 14-bit sync, blocking strategy, coded block size /
    *    sample rate / channel assignment / sample size, UTF-8-coded
    *    frame number, header CRC-8 and frame CRC-16 both VERIFIED (a
    *    flipped bit demotes to the flagged row instead of emitting
    *    garbage samples);
    *  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders
    *    1-32 (quantized coefficients, 64-bit accumulator, arithmetic
    *    shift), each with the wasted-bits-per-sample header;
    *  - residuals: 4-bit (RICE) and 5-bit (RICE2) partitioned Rice
    *    codes incl. the escape-to-raw encoding, zigzag-decoded;
    *  - stereo decorrelation: left/side, right/side, mid/side (side
    *    channel one bit wider, the spec's lossless trick).
    *
    * Output samples normalize by `2^(bps-1)` and average to mono per
    * the [[AudioPcm]] contract. Decompression-bomb cap: total decoded
    * samples bounded (a few-hundred-byte file of CONSTANT frames can
    * claim gigabytes) — over-cap payloads reject up front, the
    * [[GifDecoder]] discipline. Strict tail: bytes after the last
    * frame that do not parse as a frame reject the payload (corrupt
    * containers must flag, not truncate silently). */
  object FlacDecoder extends AudioDecoder {
    private val MaxSamples = 16L << 20 // 16M mono samples ≈ 128 MB doubles

    private[ops] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0; var i = from
      while (i < until) {
        crc ^= b(i) & 0xFF
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
          k += 1
        }
        i += 1
      }
      crc
    }

    private[ops] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0; var i = from
      while (i < until) {
        crc ^= (b(i) & 0xFF) << 8
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
                else (crc << 1) & 0xFFFF
          k += 1
        }
        i += 1
      }
      crc
    }

    /** MSB-first bit reader over the payload. Throws
      * ArrayIndexOutOfBounds past the end — decode()'s catch-all turns
      * any truncation into the flagged None. */
    private final class BitReader(b: Array[Byte], var bytePos: Int) {
      var bitPos = 0 // 0..7, bits consumed of current byte
      def atByteBoundary: Boolean = bitPos == 0
      def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
      def readBit(): Int = {
        val v = (b(bytePos) >> (7 - bitPos)) & 1
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        v
      }
      def readBits(n: Int): Long = {
        var v = 0L; var k = 0
        while (k < n) { v = (v << 1) | readBit(); k += 1 }
        v
      }
      def readSigned(n: Int): Int = {
        val v = readBits(n)
        // sign-extend an n-bit two's-complement value
        if (n == 0) 0
        else if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt
        else v.toInt
      }
      def readUnary(): Int = {
        var q = 0
        while (readBit() == 0) q += 1
        q
      }
    }

    /** One Rice-coded residual partition into `out[from until from+n]`. */
    private def riceBlock(r: BitReader, param: Int, out: Array[Int],
                          from: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        val q = r.readUnary()
        val u = (q.toLong << param) | r.readBits(param)
        out(from + i) = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag
        i += 1
      }
    }

    /** Partitioned residual (both coding methods) for a subframe of
      * `blockSize` samples with `predOrder` warm-ups already emitted. */
    private def residual(r: BitReader, blockSize: Int, predOrder: Int,
                         out: Array[Int]): Boolean = {
      val method = r.readBits(2).toInt
      if (method > 1) return false
      val paramBits = if (method == 0) 4 else 5
      val escape = (1 << paramBits) - 1
      val po = r.readBits(4).toInt
      val parts = 1 << po
      if (blockSize % parts != 0) return false
      val perPart = blockSize >> po
      if (perPart <= predOrder && parts == 1) return false
      var part = 0; var pos = predOrder
      while (part < parts) {
        val n = if (part == 0) perPart - predOrder else perPart
        if (n < 0) return false
        val param = r.readBits(paramBits).toInt
        if (param == escape) {
          val raw = r.readBits(5).toInt
          var i = 0
          while (i < n) { out(pos + i) = if (raw == 0) 0 else r.readSigned(raw); i += 1 }
        } else riceBlock(r, param, out, pos, n)
        pos += n
        part += 1
      }
      true
    }

    /** One subframe into an Int array (final values incl. wasted-bit
      * shift; side-channel callers pass bps+1). Null = invalid. */
    private def subframe(r: BitReader, blockSize: Int, bps: Int): Array[Int] = {
      if (r.readBit() != 0) return null // mandatory zero pad bit
      val stype = r.readBits(6).toInt
      val wasted =
        if (r.readBit() == 1) r.readUnary() + 1 else 0
      val eff = bps - wasted
      // 25 = 24-bit + the side channel's extra bit — the widest real
      // FLAC; 32-bit samples (+1 side) would overflow the Int sample
      // arrays silently, so they take the flagged fallback instead
      if (eff <= 0 || eff > 25) return null
      val out = new Array[Int](blockSize)
      val ok =
        if (stype == 0) { // CONSTANT
          val v = r.readSigned(eff)
          java.util.Arrays.fill(out, v); true
        } else if (stype == 1) { // VERBATIM
          var i = 0
          while (i < blockSize) { out(i) = r.readSigned(eff); i += 1 }
          true
        } else if (stype >= 8 && stype <= 12) { // FIXED order 0-4
          val order = stype - 8
          if (order > blockSize) return null
          var i = 0
          while (i < order) { out(i) = r.readSigned(eff); i += 1 }
          if (!residual(r, blockSize, order, out)) return null
          // undo the fixed polynomial predictor (64-bit intermediates:
          // order-4 coefficients reach ±6 on 17-bit side samples)
          i = order
          while (i < blockSize) {
            val p: Long = order match {
              case 0 => 0L
              case 1 => out(i - 1).toLong
              case 2 => 2L * out(i - 1) - out(i - 2)
              case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
              case _ => 4L * out(i - 1) - 6L * out(i - 2) +
                4L * out(i - 3) - out(i - 4)
            }
            out(i) = (p + out(i)).toInt
            i += 1
          }
          true
        } else if (stype >= 32) { // LPC order 1-32
          val order = (stype & 31) + 1
          if (order > blockSize) return null
          var i = 0
          while (i < order) { out(i) = r.readSigned(eff); i += 1 }
          val precM1 = r.readBits(4).toInt
          if (precM1 == 15) return null
          val precision = precM1 + 1
          val shift = r.readSigned(5)
          if (shift < 0) return null
          val coefs = new Array[Int](order)
          i = 0
          while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
          if (!residual(r, blockSize, order, out)) return null
          i = order
          while (i < blockSize) {
            var acc = 0L; var j = 0
            while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
            out(i) = ((acc >> shift) + out(i)).toInt
            i += 1
          }
          true
        } else false
      if (!ok) return null
      if (wasted > 0) {
        var i = 0
        while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
      }
      out
    }

    def decode(bytes: Array[Byte]): Option[AudioPcm] = try {
      if (bytes == null || bytes.length < 42 ||
          bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
        return None
      // ---- metadata blocks; STREAMINFO is mandatory first ----
      var p = 4
      var last = false
      var sampleRate = 0; var channels = 0; var bps = 0; var totalSamples = 0L
      var haveInfo = false
      while (!last) {
        if (p + 4 > bytes.length) return None
        val hdr = bytes(p) & 0xFF
        last = (hdr & 0x80) != 0
        val btype = hdr & 0x7F
        val len = ((bytes(p + 1) & 0xFF) << 16) | ((bytes(p + 2) & 0xFF) << 8) |
          (bytes(p + 3) & 0xFF)
        if (btype == 127 || p + 4L + len > bytes.length) return None
        if (btype == 0) {
          if (len < 34 || haveInfo) return None
          val o = p + 4
          // bytes o+10..o+17 pack rate(20) ch-1(3) bps-1(5) total(36)
          var v = 0L; var i = 0
          while (i < 8) { v = (v << 8) | (bytes(o + 10 + i) & 0xFF); i += 1 }
          sampleRate = (v >>> 44).toInt
          channels = ((v >>> 41) & 7).toInt + 1
          bps = ((v >>> 36) & 31).toInt + 1
          totalSamples = v & ((1L << 36) - 1)
          haveInfo = true
        }
        p += 4 + len
      }
      if (!haveInfo || sampleRate <= 0) return None
      if (totalSamples > MaxSamples) return None
      // ---- frames ----
      val mono = Array.newBuilder[Double]
      var emitted = 0L
      val norm = (1L << (bps - 1)).toDouble
      while (p < bytes.length && (totalSamples == 0L || emitted < totalSamples)) {
        val frameStart = p
        val r = new BitReader(bytes, p)
        if (r.readBits(14) != 0x3FFE || r.readBit() != 0) return None
        r.readBit() // blocking strategy: fixed/variable frame numbering
        val bsCode = r.readBits(4).toInt
        val srCode = r.readBits(4).toInt
        val chAsgn = r.readBits(4).toInt
        val szCode = r.readBits(3).toInt
        if (r.readBit() != 0) return None
        // UTF-8-coded frame/sample number (value unused; validate shape)
        val first = r.readBits(8).toInt
        if (first >= 0x80) {
          var cont = 0; var mask = 0x40
          while ((first & mask) != 0) { cont += 1; mask >>= 1 }
          if (cont < 1 || cont > 6) return None
          var i = 0
          while (i < cont) {
            if ((r.readBits(8) & 0xC0) != 0x80) return None
            i += 1
          }
        }
        val blockSize = bsCode match {
          case 0 => return None // reserved
          case 1 => 192
          case 6 => r.readBits(8).toInt + 1
          case 7 => r.readBits(16).toInt + 1
          case c if c <= 5 => 576 << (c - 2)
          case c => 256 << (c - 8)
        }
        srCode match { // value only cross-checked, STREAMINFO governs
          case 12 => r.readBits(8)
          case 13 | 14 => r.readBits(16)
          case 15 => return None
          case _ => ()
        }
        val frameBps = szCode match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 3 => return None // reserved
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case _ => return None // 32-bit: exceeds the Int sample width
        }
        if (crc8(bytes, frameStart, r.bytePos) != r.readBits(8).toInt)
          return None
        if (emitted + blockSize > MaxSamples) return None
        val chs: Array[Array[Int]] =
          if (chAsgn <= 7) {
            val n = chAsgn + 1
            val out = new Array[Array[Int]](n)
            var c = 0
            while (c < n) {
              val s = subframe(r, blockSize, frameBps)
              if (s == null) return None
              out(c) = s; c += 1
            }
            out
          } else if (chAsgn <= 10) {
            // side channel is one bit wider — the lossless stereo trick
            val bpsA = if (chAsgn == 9) frameBps + 1 else frameBps
            val bpsB = if (chAsgn == 9) frameBps else frameBps + 1
            val a = subframe(r, blockSize, bpsA)
            if (a == null) return None
            val b = subframe(r, blockSize, bpsB)
            if (b == null) return None
            var i = 0
            chAsgn match {
              case 8 => // left/side: right = left - side
                while (i < blockSize) { b(i) = a(i) - b(i); i += 1 }
              case 9 => // side/right: left = right + side
                while (i < blockSize) { val s = a(i); a(i) = b(i) + s; i += 1 }
              case _ => // mid/side
                while (i < blockSize) {
                  val side = b(i)
                  val m = (a(i) << 1) | (side & 1)
                  a(i) = (m + side) >> 1
                  b(i) = (m - side) >> 1
                  i += 1
                }
            }
            Array(a, b)
          } else return None
          r.align()
        if (crc16(bytes, frameStart, r.bytePos) !=
            ((bytes(r.bytePos) & 0xFF) << 8 | (bytes(r.bytePos + 1) & 0xFF)))
          return None
        p = r.bytePos + 2
        val nch = chs.length
        // the last frame of a fixed-blocksize stream may overrun the
        // STREAMINFO total — emit only the declared samples
        val emit =
          if (totalSamples == 0L) blockSize
          else math.min(blockSize.toLong, totalSamples - emitted).toInt
        var i = 0
        while (i < emit) {
          var acc = 0.0; var c = 0
          while (c < nch) { acc += chs(c)(i) / norm; c += 1 }
          mono += acc / nch
          i += 1
        }
        emitted += emit
      }
      if (totalSamples != 0L && emitted < totalSamples) return None
      // strict tail: bytes past the final frame are corruption, not
      // padding — silently ignoring them would mask torn payloads
      if (p < bytes.length) return None
      Some(AudioPcm(sampleRate, channels, mono.result()))
    } catch { case _: Exception => None } // truncated/corrupt → flagged
  }

  /** Every from-spec audio codec in one chain (r10) — the decoder a
    * mixed crawl column actually wants: FLAC, IMA ADPCM, then the
    * PCM/G.711 container paths. Magic probes order the chain cheapest-
    * reject-first in practice (`fLaC` 4 bytes, RIFF tag check, then
    * the full walk), so a payload pays only its own codec's cost.
    * MP3/OGG/MP4 still return None (flagged fallback) — those need a
    * real external codec, per the seam contract. */
  lazy val DefaultAudio: AudioDecoder =
    FlacDecoder.orElse(ImaAdpcmDecoder).orElse(JdkPcmDecoder)

  /** WAV/AU/AIFF PCM + G.711 (frames convert to
    * 16-bit signed, channels average to mono). Compressed formats
    * (MP3/OGG) return None here; an FFmpeg-backed [[AudioDecoder]]
    * slots in with the same contract.
    *
    * SCALE (r9, measured): `javax.sound.sampled.AudioSystem` does
    * provider lookup under a GLOBAL lock, which serializes all executor
    * threads — 50 k tiny WAVs took **29 s** on 32 threads (~26× the 5 k
    * cost; failed probes on non-PCM payloads were just as bad at 34 s).
    * So the common case takes a LOCK-FREE pure-byte path: 16-bit PCM
    * in RIFF/WAVE (format tag 1) parses directly — bit-identical values
    * to the AudioSystem conversion, which targets 16-bit signed anyway
    * — and a RIFF/WAVE whose tag AudioSystem cannot decode either
    * (ADPCM 0x11, MP3-in-WAV …) returns None WITHOUT touching the
    * locked registry. Only non-RIFF containers (AU/AIFF) and the
    * WAV tags AudioSystem genuinely adds (float 3, A-law 6, µ-law 7,
    * 8/24/32-bit PCM) still go through it. Same 50 k corpus after:
    * 1.5 s. */
  object JdkPcmDecoder extends AudioDecoder {
    /** CCITT G.711 µ-law decode table — the formulation the JDK codec
      * tabulates (sign handling via `132 - t` / `t - 132`), so the
      * lock-free path is BIT-identical to the AudioSystem conversion
      * (spec-pinned over all 256 bytes). */
    private[ops] val UlawTable: Array[Short] = Array.tabulate(256) { i =>
      val u = ~i & 0xFF
      var t = ((u & 0x0F) << 3) + 132
      t <<= (u & 0x70) >> 4
      (if ((u & 0x80) != 0) 132 - t else t - 132).toShort
    }

    /** CCITT G.711 A-law decode table (even-bit inversion, segment
      * expansion) — same bit-identity contract as [[UlawTable]]. */
    private[ops] val AlawTable: Array[Short] = Array.tabulate(256) { i =>
      val a = i ^ 0x55
      var v = ((a & 0x0F) << 4) + 8
      val seg = (a & 0x70) >> 4
      if (seg >= 1) v += 0x100
      if (seg > 1) v <<= seg - 1
      (if ((a & 0x80) == 0) -v else v).toShort
    }

    def decode(bytes: Array[Byte]): Option[AudioPcm] = {
      if (bytes == null || bytes.length < 12) return None
      // every fast path keeps the never-throw contract the AudioSystem
      // path had: corrupt containers (review-caught: an int-overflowing
      // chunk length, a truncated fmt) → None
      val magic = new String(bytes, 0, 4, "US-ASCII")
      if (magic == "RIFF" && new String(bytes, 8, 4, "US-ASCII") == "WAVE")
        try fastWav(bytes)
        catch { case _: Exception => None }
      else if (magic == ".snd")
        try fastAu(bytes)
        catch { case _: Exception => None }
      else if (magic == "FORM" && new String(bytes, 8, 4, "US-ASCII") == "AIFF")
        try fastAiff(bytes)
        catch { case _: Exception => None }
      // AIFC (compressed AIFF) and anything else the registry may know
      else viaAudioSystem(bytes)
    }

    /** Sun/NeXT `.snd` container, lock-free: big-endian header
      * (offset, size, encoding, rate, channels), then sample data.
      * Encodings decoded pure-byte: 1 µ-law, 3 PCM16 big-endian, 27
      * A-law — the shapes the crawl actually carries; rarer widths
      * (8-bit, 24/32-bit, float) keep the registry fallback.
      * Previously EVERY .snd payload took the globally-locked
      * AudioSystem probe (SCALE.md's measured 28× pathology). */
    private def fastAu(bytes: Array[Byte]): Option[AudioPcm] = {
      def be32(o: Int): Int =
        ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
          ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
      if (bytes.length < 24) return None
      val dataOff = be32(4)
      val claimed = be32(8) // 0xFFFFFFFF = unknown, stream until EOF
      val enc = be32(12)
      val rate = be32(16)
      val channels = be32(20)
      if (dataOff < 24 || dataOff > bytes.length || rate <= 0 ||
          channels < 1 || channels > 64) return None
      val avail = bytes.length - dataOff
      val dataLen =
        if (claimed < 0) avail else math.min(claimed.toLong, avail.toLong).toInt
      enc match {
        case 1 | 27 => // G.711 µ-law / A-law, one byte per sample
          val table = if (enc == 1) UlawTable else AlawTable
          val nFrames = dataLen / channels
          val mono = new Array[Double](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0; var c = 0
            while (c < channels) {
              acc += table(bytes(dataOff + f * channels + c) & 0xFF) / 32768.0
              c += 1
            }
            mono(f) = acc / channels; f += 1
          }
          Some(AudioPcm(rate, channels, mono))
        case 3 => // 16-bit signed big-endian
          val nFrames = dataLen / (2 * channels)
          val mono = new Array[Double](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0; var c = 0
            while (c < channels) {
              val o = dataOff + (f * channels + c) * 2
              acc += ((bytes(o) << 8) | (bytes(o + 1) & 0xFF)).toShort / 32768.0
              c += 1
            }
            mono(f) = acc / channels; f += 1
          }
          Some(AudioPcm(rate, channels, mono))
        // 8-bit (enc 2) stays on the registry: the JDK widens it through
        // a FLOAT path (b/127 rescaled with truncation), not b<<8 —
        // measured here, not assumed — and replicating float-conversion
        // rounding is exactly the fragile bit-identity this fast path
        // refuses to fake. 8-bit AU is rare; 24/32-bit and float too.
        case _ => viaAudioSystem(bytes)
      }
    }

    /** AIFF, lock-free: IFF `FORM`/`AIFF` big-endian chunk walk (even
      * padding like RIFF), `COMM` (channels, frames, bits, 80-bit
      * extended-float rate) + `SSND` (offset/blockSize prelude). PCM
      * 16-bit decodes pure-byte; other widths keep the registry
      * fallback. `AIFC` routes to the registry up front (see
      * [[decode]]). */
    private def fastAiff(bytes: Array[Byte]): Option[AudioPcm] = {
      def be16(o: Int): Int = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
      def be32(o: Int): Int =
        ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
          ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
      var channels = -1; var numFrames = 0; var bits = -1; var rate = -1
      var soundOff = -1; var soundLen = 0
      var p = 12
      while (p + 8 <= bytes.length) {
        val id = new String(bytes, p, 4, "US-ASCII")
        val len = be32(p + 4)
        if (len < 0 || p + 8L + len > bytes.length) return None
        if (id == "COMM" && len >= 18) {
          channels = be16(p + 8)
          numFrames = be32(p + 10)
          bits = be16(p + 14)
          // 80-bit extended float sample rate: 15-bit exponent + 64-bit
          // mantissa; audio rates are small integers, so double math is
          // exact
          val e = be16(p + 16) & 0x7FFF
          var m = 0L; var i = 0
          while (i < 8) { m = (m << 8) | (bytes(p + 18 + i) & 0xFF); i += 1 }
          val r =
            if (e == 0 && m == 0L) 0.0
            else math.scalb((m >>> 11).toDouble, e - 16383 - 52)
          rate = math.round(r).toInt
        } else if (id == "SSND" && len >= 8) {
          val off = be32(p + 8)
          if (off < 0 || off > len - 8) return None
          soundOff = p + 16 + off
          soundLen = len - 8 - off
        }
        p += 8 + len + (len & 1)
      }
      if (channels < 1 || channels > 64 || rate <= 0 || soundOff < 0 ||
          numFrames < 0) return None
      if (bits == 16) {
        val nFrames = math.min(numFrames.toLong, soundLen / (2L * channels)).toInt
        val mono = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0; var c = 0
          while (c < channels) {
            val o = soundOff + (f * channels + c) * 2
            acc += ((bytes(o) << 8) | (bytes(o + 1) & 0xFF)).toShort / 32768.0
            c += 1
          }
          mono(f) = acc / channels; f += 1
        }
        Some(AudioPcm(rate, channels, mono))
      } else viaAudioSystem(bytes) // 8-bit (JDK float widening), 24/32-bit
    }

    private def fastWav(bytes: Array[Byte]): Option[AudioPcm] = {
      // RIFF walk: fmt tag decides the route, lock-free. Bounds in
      // LONG — a crafted chunk length near Int.MaxValue must not wrap
      // past the array check and size a giant allocation
      var fmtOff = -1; var fmtLen = 0; var dataOff = -1; var dataLen = 0
      var p = 12
      while (p + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(bytes, p, 4, "US-ASCII")
        val len = LE.i32(bytes, p + 4)
        if (len < 0 || p + 8L + len > bytes.length) return None
        if (id == "fmt ") { fmtOff = p + 8; fmtLen = len }
        else if (id == "data") { dataOff = p + 8; dataLen = len }
        p += 8 + len + (len & 1)
      }
      if (fmtOff < 0 || dataOff < 0 || fmtLen < 16) return None
      val tag = LE.u16(bytes, fmtOff)
      val channels = LE.u16(bytes, fmtOff + 2)
      val rate = LE.i32(bytes, fmtOff + 4)
      val bits = LE.u16(bytes, fmtOff + 14)
      if (tag == 1 && bits == 16 && channels >= 1 && rate > 0) {
        // the overwhelmingly common shape: parse directly
        val nFrames = dataLen / (2 * channels)
        val mono = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0; var c = 0
          while (c < channels) {
            val off = dataOff + (f * channels + c) * 2
            acc += ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort / 32768.0
            c += 1
          }
          mono(f) = acc / channels; f += 1
        }
        return Some(AudioPcm(rate, channels, mono))
      }
      if ((tag == 6 || tag == 7) && bits == 8 && channels >= 1 && rate > 0) {
        // G.711 A-law / µ-law (r10): one table lookup per byte,
        // lock-free — bit-identical to the AudioSystem conversion by
        // the spec-pinned tables
        val table = if (tag == 6) AlawTable else UlawTable
        val nFrames = dataLen / channels
        val mono = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0; var c = 0
          while (c < channels) {
            acc += table(bytes(dataOff + f * channels + c) & 0xFF) / 32768.0
            c += 1
          }
          mono(f) = acc / channels; f += 1
        }
        return Some(AudioPcm(rate, channels, mono))
      }
      // tags AudioSystem can genuinely decode: float (3),
      // WAVE_FORMAT_EXTENSIBLE (0xFFFE — the JDK's
      // WaveExtensibleFileReader handles PCM-under-extensible, so it
      // must NOT short-circuit), other PCM widths under tag 1, and
      // odd-width G.711 under 6/7; anything else (ADPCM 0x11,
      // MP3-in-WAV 0x55 …) would just burn the locked registry probe
      // to throw — skip it
      if (tag != 1 && tag != 3 && tag != 6 && tag != 7 && tag != 0xFFFE)
        None
      else viaAudioSystem(bytes)
    }

    private def viaAudioSystem(bytes: Array[Byte]): Option[AudioPcm] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2,
            fmt.getSampleRate, false)
          val pcm = AudioSystem.getAudioInputStream(target, in)
          try {
            val data = pcm.readAllBytes()
            val ch = target.getChannels
            val nFrames = data.length / (2 * ch)
            val mono = new Array[Double](nFrames)
            var f = 0
            while (f < nFrames) {
              var c = 0; var acc = 0.0
              while (c < ch) {
                val off = (f * ch + c) * 2
                acc += ((data(off) & 0xFF) | (data(off + 1) << 8)).toShort / 32768.0
                c += 1
              }
              mono(f) = acc / ch; f += 1
            }
            // the JDK parses some corrupt headers PERMISSIVELY (fuzz-
            // caught r10: a stomped WAV rate field decodes with a
            // negative getSampleRate) — the contract here is a SANE
            // result or None, so validate what the registry returned
            val rate = fmt.getSampleRate.toInt
            if (rate <= 0 || ch < 1) None
            else Some(AudioPcm(rate, ch, mono))
          } finally pcm.close()
        } finally in.close()
      } catch { case _: Exception => None } // not audio / corrupt → fallback
    }
  }
}
