package graft.ops

/** Header-only media PROBES (r10) — "probe, don't decode".
  *
  * At 100 TB the first multimodal pipeline stage is not decode, it is
  * TRIAGE: filter by duration / resolution / bitrate / codec before
  * paying any per-sample work. That triage must also cover the formats
  * this zero-dependency container cannot fully decode — a crawl's modal
  * audio payload is MP3 and its modal video container is MP4, and both
  * carry their pipeline-relevant metadata in plain headers:
  *
  *  - [[Mp3Probe]] walks EVERY MPEG audio frame header (sync, version,
  *    layer, bitrate/samplerate indices, padding — the public
  *    ISO 11172-3 / 13818-3 tables), hopping frame-to-frame by the
  *    exact frame-length formula with NO payload inspection: exact
  *    frame count, exact sample count (hence duration), true VBR
  *    average bitrate, ID3v2 skipped by its syncsafe length, trailing
  *    ID3v1 tolerated. Cost per blob: one header read per frame —
  *    thousands of times cheaper than decode, and allocation-free.
  *  - [[Mp4Probe]] walks the ISO BMFF box tree (size/type, 64-bit
  *    largesize, nesting): `ftyp` major brand, `mvhd` timescale +
  *    duration (v0/v1), first visual `tkhd` 16.16 fixed-point
  *    width/height, first `stsd` sample-entry fourcc (the codec id —
  *    avc1/hev1/mp4a/…).
  *  - [[FlacProbe]] / [[WavProbe]] read STREAMINFO / `fmt ` only — the
  *    duration of a FLAC stream costs 42 bytes, not a Rice decode.
  *
  * All probes share the [[Codecs]] discipline: pure byte walks, Long
  * bounds against crafted lengths, never throw (None = not my format /
  * corrupt), `orElse` chaining for mixed columns. The decode seam
  * ([[Codecs.AudioDecoder]]/[[Codecs.VideoDecoder]]) is unchanged —
  * probes answer "what is this and is it worth decoding", decoders
  * answer "what does it contain".
  */
object MediaProbe {

  /** Probed metadata: the fields a triage stage filters on. Unknown /
    * not-applicable numeric fields are 0; `codec` is the innermost
    * payload id (MP3 layer, WAV format tag name, MP4 sample-entry
    * fourcc), `format` the container family. */
  final case class MediaInfo(format: String, codec: String,
                             durationMs: Long, sampleRate: Int, channels: Int,
                             bitrateKbps: Int, width: Int, height: Int,
                             frames: Long)

  trait Probe extends Serializable {
    def probe(bytes: Array[Byte]): Option[MediaInfo]
    def orElse(other: Probe): Probe = {
      val self = this
      new Probe {
        def probe(b: Array[Byte]): Option[MediaInfo] =
          self.probe(b).orElse(other.probe(b))
      }
    }
  }

  /** Every probe in one chain — the mixed-column default. MP3 last:
    * it is the only one without a leading magic (any 0xFFE sync byte
    * pair starts a candidate frame), so every other container must get
    * its cheap magic check first. */
  lazy val Default: Probe =
    FlacProbe.orElse(WavProbe).orElse(AviProbe).orElse(GifProbe)
      .orElse(AuProbe).orElse(AiffProbe).orElse(OggProbe).orElse(MkvProbe)
      .orElse(ZipProbe).orElse(Pdf.Probe)
      .orElse(JpegProbe).orElse(PngProbe).orElse(WebpProbe).orElse(BmpProbe)
      .orElse(TiffProbe).orElse(HeifProbe)
      .orElse(GzipProbe).orElse(ZstdProbe).orElse(XzProbe).orElse(Bzip2Probe)
      .orElse(Mp4Probe).orElse(Mp3Probe)

  /** Ogg page walk (RFC 3533) + Vorbis/Opus identification headers —
    * the open crawl audio formats. Duration comes from the LAST page's
    * granule position of the first (BOS) logical stream: total PCM
    * samples for Vorbis (RFC 5334 / Vorbis I spec), 48 kHz units minus
    * pre-skip for Opus (RFC 7845 §4/§5.1) — no packet is ever parsed
    * past the two fixed-layout ID headers. Page CRCs are deliberately
    * NOT verified: triage reads headers, the decode stage owns
    * integrity (the same split every probe here makes). */
  object OggProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 28 ||
          bytes(0) != 'O' || bytes(1) != 'g' || bytes(2) != 'g' ||
          bytes(3) != 'S') return None
      var p = 0L
      var serial = 0L; var haveSerial = false
      var codec = ""; var rate = 0; var ch = 0
      var brNom = 0; var preSkip = 0
      var lastGranule = -1L
      while (p + 27 <= bytes.length) {
        val o = p.toInt
        if (bytes(o) != 'O' || bytes(o + 1) != 'g' || bytes(o + 2) != 'g' ||
            bytes(o + 3) != 'S' || bytes(o + 4) != 0) return None // lost sync
        val hdrType = bytes(o + 5) & 0xFF
        var granule = 0L
        var i = 7
        while (i >= 0) { granule = (granule << 8) | (bytes(o + 6 + i) & 0xFF); i -= 1 }
        val pageSerial = Codecs.LE.i32(bytes, o + 14) & 0xFFFFFFFFL
        val nsegs = bytes(o + 26) & 0xFF
        if (p + 27L + nsegs > bytes.length) return None
        var payloadLen = 0L
        var s = 0
        while (s < nsegs) { payloadLen += (bytes(o + 27 + s) & 0xFF); s += 1 }
        val body = p + 27L + nsegs
        if (body + payloadLen > bytes.length) return None
        if ((hdrType & 2) != 0 && !haveSerial) { // first BOS page: ID header
          haveSerial = true; serial = pageSerial
          val b = body.toInt
          if (payloadLen >= 30 && bytes(b) == 1 &&
              new String(bytes, b + 1, 6, "US-ASCII") == "vorbis") {
            codec = "vorbis"
            ch = bytes(b + 11) & 0xFF
            rate = Codecs.LE.i32(bytes, b + 12)
            brNom = Codecs.LE.i32(bytes, b + 20)
          } else if (payloadLen >= 19 &&
              new String(bytes, b, 8, "US-ASCII") == "OpusHead") {
            codec = "opus"
            ch = bytes(b + 9) & 0xFF
            preSkip = Codecs.LE.u16(bytes, b + 10)
            rate = Codecs.LE.i32(bytes, b + 12) // informational input rate
          } else codec = "unknown"
        }
        // granule -1 = "no packet ends on this page" (skip for duration)
        if (haveSerial && pageSerial == serial && granule != -1L &&
            granule >= 0L) lastGranule = math.max(lastGranule, granule)
        p = body + payloadLen
      }
      if (!haveSerial || p != bytes.length) return None // truncated tail
      val samples = math.max(0L,
        if (codec == "opus") (if (lastGranule < 0) 0L else lastGranule) - preSkip
        else if (lastGranule < 0) 0L else lastGranule)
      val durationMs = codec match {
        case "vorbis" if rate > 0 && samples < Long.MaxValue / 1000 =>
          samples * 1000L / rate
        case "opus" if samples < Long.MaxValue / 1000 =>
          samples * 1000L / 48000L
        case _ => 0L
      }
      if (codec == "vorbis" && (rate <= 0 || ch < 1)) return None
      if (codec == "opus" && ch < 1) return None
      if (rate < 0) rate = 0 // Opus input rate is informational; crafted
                             // negatives must not leak into the metadata
      Some(MediaInfo("ogg", codec, durationMs, rate, ch,
        if (codec == "vorbis" && brNom > 0) brNom / 1000 else 0,
        0, 0, samples))
    } catch { case _: Exception => None }
  }

  /** ZIP central-directory probe (the PKWARE APPNOTE layout): a crawl's
    * office documents, EPUBs and JARs are ZIP containers, and their
    * triage-relevant shape — entry count, payload method — sits in the
    * end-of-central-directory record and the central directory, never
    * in the entry data. Walk: scan the tail window for the EOCD magic
    * (its variable-length comment means scanning, bounded by the spec's
    * 64 KiB comment cap), require the comment length to close the file
    * EXACTLY (a trailing-garbage reject, the Mp3Probe strictness), then
    * walk the central directory verifying the entry count against the
    * EOCD's claim. ZIP64 archives (0xFFFF/0xFFFFFFFF sentinel fields)
    * are flagged as not-probed rather than misparsed. */
  object ZipProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 22 ||
          bytes(0) != 'P' || bytes(1) != 'K') return None
      // EOCD: last 22..(22+65535) bytes; newest (last) magic wins
      val scanFrom = math.max(0, bytes.length - 22 - 65535)
      var eocd = -1
      var i = bytes.length - 22
      while (i >= scanFrom && eocd < 0) {
        if (bytes(i) == 'P' && bytes(i + 1) == 'K' && bytes(i + 2) == 5 &&
            bytes(i + 3) == 6) eocd = i
        i -= 1
      }
      if (eocd < 0) return None
      val commentLen = Codecs.LE.u16(bytes, eocd + 20)
      if (eocd + 22L + commentLen != bytes.length)
        return None // EOCD must close the file exactly
      val totalEntries = Codecs.LE.u16(bytes, eocd + 10)
      val cdSize = Codecs.LE.i32(bytes, eocd + 12) & 0xFFFFFFFFL
      val cdOffset = Codecs.LE.i32(bytes, eocd + 16) & 0xFFFFFFFFL
      if (totalEntries == 0xFFFF || cdOffset == 0xFFFFFFFFL ||
          cdSize == 0xFFFFFFFFL) return None // ZIP64: flag, don't misparse
      if (cdOffset + cdSize > eocd) return None
      // central directory walk: count entries, first entry's method
      var p = cdOffset
      val end = cdOffset + cdSize
      var n = 0L
      var method = -1
      while (p + 46 <= end) {
        val o = p.toInt
        if (bytes(o) != 'P' || bytes(o + 1) != 'K' || bytes(o + 2) != 1 ||
            bytes(o + 3) != 2) return None
        if (method < 0) method = Codecs.LE.u16(bytes, o + 10)
        val nameLen = Codecs.LE.u16(bytes, o + 28)
        val extraLen = Codecs.LE.u16(bytes, o + 30)
        val cmtLen = Codecs.LE.u16(bytes, o + 32)
        n += 1
        p += 46L + nameLen + extraLen + cmtLen
      }
      if (p != end || n != totalEntries)
        return None // torn directory or count mismatch with the EOCD
      val codec = method match {
        case -1 => "empty"
        case 0 => "stored"
        case 8 => "deflate"
        case 12 => "bzip2"
        case 14 => "lzma"
        case 93 => "zstd"
        case m => f"method-$m%d"
      }
      Some(MediaInfo("zip", codec, 0L, 0, 0, 0, 0, 0, n))
    } catch { case _: Exception => None }
  }

  /** Matroska/WebM EBML walk (RFC 8794 + the public Matroska element
    * registry): DocType, Segment→Info's TimestampScale + Duration
    * (float, in scale units), first TrackEntry's CodecID, Video
    * PixelWidth/Height, Audio SamplingFrequency/Channels. EBML vints
    * are length-prefixed by their leading-one position; an all-ones
    * size is "unknown" (streamed Segments) and extends to the buffer
    * end — legal for MASTER elements only. */
  object MkvProbe extends Probe {
    private val Unknown = -1L

    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 8 ||
          (bytes(0) & 0xFF) != 0x1A || (bytes(1) & 0xFF) != 0x45 ||
          (bytes(2) & 0xFF) != 0xDF || (bytes(3) & 0xFF) != 0xA3) return None
      // (value, nextPos); id keeps its marker bits, size masks them.
      // width 0 (first byte 0x00) is invalid EBML.
      def vint(p: Long, mask: Boolean): Option[(Long, Long)] = {
        if (p >= bytes.length) return None
        val b0 = bytes(p.toInt) & 0xFF
        if (b0 == 0) return None
        val len = java.lang.Integer.numberOfLeadingZeros(b0) - 23 // 1..8
        if (p + len > bytes.length) return None
        var v = if (mask) (b0 & (0xFF >>> len)).toLong else b0.toLong
        var allOnes = mask && (b0 & (0xFF >>> len)) == (0xFF >>> len)
        var i = 1
        while (i < len) {
          val b = bytes(p.toInt + i) & 0xFF
          v = (v << 8) | b
          allOnes &&= b == 0xFF
          i += 1
        }
        Some((if (allOnes) Unknown else v, p + len))
      }
      def uintAt(p: Long, len: Long): Long = {
        var v = 0L; var i = 0
        while (i < len) { v = (v << 8) | (bytes(p.toInt + i) & 0xFF); i += 1 }
        v
      }
      def floatAt(p: Long, len: Long): Double =
        if (len == 4) java.lang.Float.intBitsToFloat(uintAt(p, 4).toInt).toDouble
        else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(p, 8))
        else Double.NaN

      var docType = "matroska" // the EBML default when DocType is absent
      var scale = 1000000L     // TimestampScale default: 1 ms in ns
      var durScaled = Double.NaN
      var codec = ""; var width = 0; var height = 0
      var rate = 0; var ch = 0

      // master elements this probe descends into
      val masters = Set(0x18538067L /*Segment*/, 0x1549A966L /*Info*/,
        0x1654AE6BL /*Tracks*/, 0xAEL /*TrackEntry*/, 0xE0L /*Video*/,
        0xE1L /*Audio*/)
      def walk(start: Long, end: Long, depth: Int): Boolean = {
        var p = start
        while (p < end) {
          val (id, afterId) = vint(p, mask = false) match {
            case Some(x) => x; case None => return false
          }
          val (size0, body) = vint(afterId, mask = true) match {
            case Some(x) => x; case None => return false
          }
          val size = if (size0 == Unknown) end - body else size0
          if (size < 0 || body + size > end) return false
          if (size0 == Unknown && !masters.contains(id) && id != 0x1A45DFA3L)
            return false // unknown size is legal on masters only
          id match {
            case 0x1A45DFA3L => // EBML header: scan its children for DocType
              if (!walkEbmlHeader(body, body + size)) return false
            case m if masters.contains(m) =>
              if (depth >= 8 || !walk(body, body + size, depth + 1)) return false
            case 0x2AD7B1L if size >= 1 && size <= 8 => // TimestampScale
              val v = uintAt(body, size); if (v > 0) scale = v
            case 0x4489L => // Duration (float)
              val d = floatAt(body, size)
              if (!d.isNaN && d >= 0) durScaled = d
            case 0x86L if size > 0 && size <= 64 => // CodecID
              if (codec.isEmpty)
                codec = new String(bytes, body.toInt, size.toInt, "US-ASCII")
            case 0xB0L if size >= 1 && size <= 8 => // PixelWidth
              // an 8-byte value with the top bit set reads NEGATIVE —
              // crafted dims must clamp to "unknown", never go negative
              val w = uintAt(body, size)
              if (width == 0 && w > 0) width = math.min(w, Int.MaxValue).toInt
            case 0xBAL if size >= 1 && size <= 8 => // PixelHeight
              val hh = uintAt(body, size)
              if (height == 0 && hh > 0) height = math.min(hh, Int.MaxValue).toInt
            case 0xB5L => // SamplingFrequency (float)
              val f = floatAt(body, size)
              if (rate == 0 && !f.isNaN && f > 0 && f <= Int.MaxValue)
                rate = math.round(f).toInt
            case 0x9FL if size >= 1 && size <= 8 => // Channels
              val c = uintAt(body, size)
              if (ch == 0 && c > 0) ch = math.min(c, Int.MaxValue).toInt
            case _ => () // skip by size
          }
          p = body + size
        }
        true
      }
      def walkEbmlHeader(start: Long, end: Long): Boolean = {
        var p = start
        while (p < end) {
          val (id, afterId) = vint(p, mask = false) match {
            case Some(x) => x; case None => return false
          }
          val (size, body) = vint(afterId, mask = true) match {
            case Some(x) => x; case None => return false
          }
          if (size == Unknown || size < 0 || body + size > end) return false
          if (id == 0x4282L && size > 0 && size <= 64) // DocType
            docType = new String(bytes, body.toInt, size.toInt, "US-ASCII")
          p = body + size
        }
        true
      }
      if (!walk(0L, bytes.length.toLong, 0)) return None
      if (docType != "matroska" && docType != "webm") return None
      val durationMs =
        if (durScaled.isNaN) 0L
        else {
          val ms = durScaled * scale / 1000000.0
          if (ms < 0 || ms > Long.MaxValue / 2.0) return None
          math.round(ms)
        }
      Some(MediaInfo(docType, if (codec.isEmpty) "unknown" else codec,
        durationMs, rate, ch, 0, width, height, 0L))
    } catch { case _: Exception => None }
  }

  /** MPEG-1/2/2.5 audio (MP3 and friends): exact frame walk. */
  object Mp3Probe extends Probe {
    // bitrate tables in kbps, indexed [version-group][layer][idx 1..14]
    private val V1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
    private val V1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
    private val V1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val V2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
    private val V2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    private val RatesV1 = Array(44100, 48000, 32000)
    private val RatesV2 = Array(22050, 24000, 16000)
    private val RatesV25 = Array(11025, 12000, 8000)

    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 4) return None
      var p = 0
      // ID3v2 prefix: "ID3" ver(2) flags(1) syncsafe size(4)
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
          ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
        val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
        val skip = 10L + size + footer
        if (skip >= bytes.length) return None
        p = skip.toInt
      }
      var frames = 0L
      var samples = 0L
      var brSum = 0L
      var rate = 0; var ch = 0; var layerSeen = 0
      while (p + 4 <= bytes.length) {
        // trailing ID3v1 tag: exactly 128 bytes starting "TAG"
        if (bytes.length - p == 128 && bytes(p) == 'T' && bytes(p + 1) == 'A' &&
            bytes(p + 2) == 'G') {
          p = bytes.length
        } else {
          val b1 = bytes(p) & 0xFF; val b2 = bytes(p + 1) & 0xFF
          val b3 = bytes(p + 2) & 0xFF; val b4 = bytes(p + 3) & 0xFF
          if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None // lost sync
          val version = (b2 >> 3) & 3 // 0=2.5, 2=MPEG2, 3=MPEG1
          val layer = (b2 >> 1) & 3   // 1=L3, 2=L2, 3=L1
          val brIdx = (b3 >> 4) & 0xF
          val srIdx = (b3 >> 2) & 3
          val padding = (b3 >> 1) & 1
          if (version == 1 || layer == 0 || brIdx == 0 || brIdx == 15 ||
              srIdx == 3) return None // reserved / free-format unsupported
          val sr = (version match {
            case 3 => RatesV1; case 2 => RatesV2; case _ => RatesV25
          })(srIdx)
          val br = (if (version == 3)
            (if (layer == 3) V1L1 else if (layer == 2) V1L2 else V1L3)
          else
            (if (layer == 3) V2L1 else V2L23))(brIdx)
          val spf =
            if (layer == 3) 384
            else if (layer == 2) 1152
            else if (version == 3) 1152 else 576 // L3: MPEG1 vs 2/2.5
          val frameLen =
            if (layer == 3) (12 * br * 1000 / sr + padding) * 4
            else if (layer == 2) 144 * br * 1000 / sr + padding
            else (if (version == 3) 144 else 72) * br * 1000 / sr + padding
          if (frameLen < 4 || p + frameLen.toLong > bytes.length)
            return None // truncated mid-frame: corrupt, not shorter
          if (rate == 0) { rate = sr; ch = if (((b4 >> 6) & 3) == 3) 1 else 2
            layerSeen = layer }
          else if (sr != rate) return None // rate switch mid-stream: corrupt
          frames += 1; samples += spf; brSum += br
          p += frameLen
        }
      }
      if (frames == 0 || p != bytes.length) return None
      Some(MediaInfo("mp3",
        if (layerSeen == 1) "mpeg-layer3"
        else if (layerSeen == 2) "mpeg-layer2" else "mpeg-layer1",
        samples * 1000L / rate, rate, ch,
        (brSum / frames).toInt, 0, 0, frames))
    } catch { case _: Exception => None }
  }

  /** ISO BMFF (MP4/MOV/3GP …): box-tree walk. */
  object Mp4Probe extends Probe {
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 16 || fourcc(bytes, 4) != "ftyp")
        return None
      var brand = ""
      var durationMs = 0L
      var width = 0; var height = 0
      var codec = ""
      // walk(start, end): top-level and nested box iteration. Long
      // arithmetic throughout — box sizes are attacker-controlled.
      def walk(start: Long, end: Long, depth: Int): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val size0 = be32(bytes, p.toInt)
          val typ = fourcc(bytes, p.toInt + 4)
          var hdr = 8L
          val size =
            if (size0 == 1L) {
              if (p + 16 > end) return false
              hdr = 16L; be64(bytes, p.toInt + 8)
            } else if (size0 == 0L) end - p // box extends to end
            else size0
          if (size < hdr || p + size > end) return false
          val body = p + hdr
          typ match {
            case "ftyp" if depth == 0 =>
              if (size >= hdr + 4) brand = fourcc(bytes, body.toInt)
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              if (depth < 8 && !walk(body, p + size, depth + 1)) return false
            case "mvhd" if size >= hdr + 4 =>
              val v = bytes(body.toInt) & 0xFF
              if (v == 1 && size >= hdr + 28) {
                val ts = be32(bytes, body.toInt + 20)
                val dur = be64(bytes, body.toInt + 24)
                // dur is a 64-bit field an attacker controls: negative
                // (top bit) or overflow-prone values must not produce a
                // negative duration
                if (ts > 0 && dur >= 0 && dur < Long.MaxValue / 1000)
                  durationMs = dur * 1000L / ts
              } else if (v == 0 && size >= hdr + 20) {
                val ts = be32(bytes, body.toInt + 12)
                val dur = be32(bytes, body.toInt + 16)
                if (ts > 0) durationMs = dur * 1000L / ts
              }
            case "tkhd" =>
              val v = bytes(body.toInt) & 0xFF
              val wOff = if (v == 1) 4 + 84 else 4 + 72
              if (size >= hdr + wOff + 8) {
                // 16.16 fixed point; keep the FIRST track with nonzero dims
                val w = (be32(bytes, body.toInt + wOff) >> 16).toInt
                val h = (be32(bytes, body.toInt + wOff + 4) >> 16).toInt
                if (width == 0 && w > 0 && h > 0) { width = w; height = h }
              }
            case "stsd" if size >= hdr + 16 =>
              // FullBox(4) + entry_count(4) + first entry size(4)+fourcc(4)
              if (codec.isEmpty) codec = fourcc(bytes, body.toInt + 12)
            case _ => ()
          }
          p += size
        }
        true
      }
      if (!walk(0L, bytes.length.toLong, 0)) return None
      if (brand.isEmpty) return None
      Some(MediaInfo("mp4", codec, durationMs, 0, 0, 0, width, height, 0L))
    } catch { case _: Exception => None }
  }

  /** Compressed-payload probes — the non-media blobs a crawl meets
    * constantly (.gz/.zst/.xz/.bz2 sidecars and payloads). Header-only
    * per the family discipline; `frames` carries the UNCOMPRESSED byte
    * count where the format declares one (gzip's trailer ISIZE —
    * mod 2³² and only trustworthy for single-member files, so it is
    * reported only when exactly one member magic is plausible; zstd's
    * frame-content-size field when present), else 0. `codec` carries
    * the flag-level detail (zstd single-segment/checksum, xz stream
    * flags' check type, bzip2 block size). */
  object GzipProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 18 ||
          (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B) return None
      if (bytes(2) != 8) return None // deflate is the only defined method
      val flg = bytes(3) & 0xFF
      if ((flg & 0xE0) != 0) return None // reserved flags must be zero
      // trailer ISIZE is per-MEMBER; meaningful only if this looks like
      // a single member (no second 1F 8B 08 boundary candidate after a
      // plausible member end — cheap heuristic: scan for the magic)
      var members = 1
      var i = 10
      while (i + 2 < bytes.length - 8) {
        if ((bytes(i) & 0xFF) == 0x1F && (bytes(i + 1) & 0xFF) == 0x8B &&
            bytes(i + 2) == 8) members += 1
        i += 1
      }
      val isize =
        if (members == 1)
          (bytes(bytes.length - 4) & 0xFFL) |
          ((bytes(bytes.length - 3) & 0xFFL) << 8) |
          ((bytes(bytes.length - 2) & 0xFFL) << 16) |
          ((bytes(bytes.length - 1) & 0xFFL) << 24)
        else 0L
      val named = (flg & 8) != 0
      Some(MediaInfo("gzip", if (named) "deflate/named" else "deflate",
        0L, 0, 0, 0, 0, 0, isize))
    } catch { case _: Exception => None }
  }

  /** Zstandard frame header (RFC 8878 §3.1.1): magic, frame header
    * descriptor (FCS field size, single-segment, checksum, dictionary
    * id), declared content size when present. */
  object ZstdProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 6 ||
          Codecs.LE.i32(bytes, 0) != 0xFD2FB528) return None
      val fhd = bytes(4) & 0xFF
      if ((fhd & 0x08) != 0) return None // reserved bit must be zero
      val fcsFlag = fhd >>> 6
      val single = (fhd & 0x20) != 0
      val checksum = (fhd & 0x04) != 0
      val dictFlag = fhd & 0x03
      var p = 5
      if (!single) p += 1 // window descriptor
      p += (dictFlag match { case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4 })
      val fcsLen = fcsFlag match {
        case 0 => if (single) 1 else 0
        case 1 => 2
        case 2 => 4
        case _ => 8
      }
      if (p + fcsLen > bytes.length) return None
      var size = 0L
      if (fcsLen > 0) {
        var i = 0
        while (i < fcsLen) { size |= (bytes(p + i) & 0xFFL) << (8 * i); i += 1 }
        if (fcsLen == 2) size += 256 // RFC 8878: 2-byte field is value-256
        if (size < 0) return None
      }
      val codec = "zstd" + (if (single) "/single-segment" else "") +
        (if (checksum) "/checksum" else "")
      Some(MediaInfo("zstd", codec, 0L, 0, 0, 0, 0, 0, size))
    } catch { case _: Exception => None }
  }

  /** XZ stream header (the public .xz format spec): magic, stream
    * flags with the integrity-check type, CRC32-protected (CRC not
    * verified — the probe split). */
  object XzProbe extends Probe {
    private val Magic = Array(0xFD, '7', 'z', 'X', 'Z', 0x00)
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 12) return None
      var i = 0
      while (i < 6) { if ((bytes(i) & 0xFF) != (Magic(i) & 0xFF)) return None; i += 1 }
      if (bytes(6) != 0) return None // first flags byte must be zero
      val check = bytes(7) & 0xFF
      if ((check & 0xF0) != 0) return None // reserved bits
      val codec = check match {
        case 0 => "lzma2/none"
        case 1 => "lzma2/crc32"
        case 4 => "lzma2/crc64"
        case 10 => "lzma2/sha256"
        case c => s"lzma2/check-$c"
      }
      Some(MediaInfo("xz", codec, 0L, 0, 0, 0, 0, 0, 0L))
    } catch { case _: Exception => None }
  }

  /** bzip2 header: `BZh` + block-size digit + the first block's
    * compressed magic (pi) or the empty-stream end magic (sqrt(pi)). */
  object Bzip2Probe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 10 ||
          bytes(0) != 'B' || bytes(1) != 'Z' || bytes(2) != 'h') return None
      val level = bytes(3) - '0'
      if (level < 1 || level > 9) return None
      val m = (0 until 6).map(i => bytes(4 + i) & 0xFF)
      val blockMagic = Seq(0x31, 0x41, 0x59, 0x26, 0x53, 0x59) // BCD pi
      val endMagic = Seq(0x17, 0x72, 0x45, 0x38, 0x50, 0x90)   // BCD sqrt(pi)
      if (m != blockMagic && m != endMagic) return None
      Some(MediaInfo("bzip2", s"bwt$level", 0L, 0, 0, 0, 0, 0, 0L))
    } catch { case _: Exception => None }
  }

  /** HEIF/AVIF still-image probe (ISO/IEC 23008-12 over 14496-12 —
    * the modern crawl image formats): keyed on the HEIF brand family
    * in `ftyp` (major OR compatible — `mif1` majors usually carry
    * `heic`/`avif` as compatibles), then a box walk into
    * `meta`→`iprp`→`ipco` for `ispe` extents — `meta` is a FULL box
    * (4 version/flags bytes before its children, the classic BMFF
    * trap). Multiple `ispe` entries (thumbnails, auxiliaries) resolve
    * to the LARGEST area (the primary image in practice; deterministic
    * tie to first). Codec from the config box present in `ipco`
    * (`av1C` → av01, `hvcC` → hvc1). Sequence brands (`avis`/`msf1`)
    * surface as codec suffix `/seq` — their track walk is Mp4Probe
    * territory. */
  object HeifProbe extends Probe {
    private val Brands = Set("heic", "heix", "heim", "heis", "hevc",
      "hevx", "mif1", "msf1", "avif", "avis")

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 24 || fourcc(bytes, 4) != "ftyp")
        return None
      val ftypSize = be32(bytes, 0)
      if (ftypSize < 16 || ftypSize > bytes.length) return None
      val major = fourcc(bytes, 8)
      val compat = (16L until ftypSize by 4)
        .takeWhile(_ + 4 <= ftypSize).map(o => fourcc(bytes, o.toInt))
      if (!Brands(major) && !compat.exists(Brands)) return None
      var w = 0L; var h = 0L
      var codec = ""
      // walk(start, end, fullBox): fullBox skips the 4-byte version/
      // flags prefix of the CONTAINER before its children
      def walk(start: Long, end: Long, depth: Int): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val size0 = be32(bytes, p.toInt)
          val typ = fourcc(bytes, p.toInt + 4)
          var hdr = 8L
          val size =
            if (size0 == 1L) {
              if (p + 16 > end) return false
              hdr = 16L
              (be32(bytes, p.toInt + 8) << 32) | be32(bytes, p.toInt + 12)
            } else if (size0 == 0L) end - p
            else size0
          if (size < hdr || p + size > end) return false
          val body = p + hdr
          typ match {
            case "meta" => // FULL box container
              if (depth < 8 && size >= hdr + 4 &&
                  !walk(body + 4, p + size, depth + 1)) return false
            case "iprp" | "ipco" =>
              if (depth < 8 && !walk(body, p + size, depth + 1)) return false
            case "ispe" if size >= hdr + 12 =>
              val iw = be32(bytes, body.toInt + 4)
              val ih = be32(bytes, body.toInt + 8)
              if (iw > 0 && ih > 0 && iw <= Int.MaxValue && ih <= Int.MaxValue &&
                  iw * ih > w * h) { w = iw; h = ih }
            case "av1C" => if (codec.isEmpty || codec == "hvc1") codec = "av01"
            case "hvcC" => if (codec.isEmpty) codec = "hvc1"
            case _ => ()
          }
          p += size
        }
        true
      }
      if (!walk(0L, bytes.length.toLong, 0)) return None
      if (w <= 0 || h <= 0) return None
      val seq = major == "avis" || major == "msf1" ||
        compat.contains("avis") || compat.contains("msf1")
      val fmt = if (major == "avif" || major == "avis" ||
        compat.contains("avif") || compat.contains("avis")) "avif" else "heif"
      Some(MediaInfo(fmt,
        (if (codec.isEmpty) major else codec) + (if (seq) "/seq" else ""),
        0L, 0, 0, 0, w.toInt, h.toInt, 1L))
    } catch { case _: Exception => None }
  }

  /** FLAC STREAMINFO only — duration for 42 bytes of reading. */
  object FlacProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 42 ||
          bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
        return None
      if ((bytes(4) & 0x7F) != 0) return None // STREAMINFO must be first
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (bytes(18 + i) & 0xFF); i += 1 }
      val rate = (v >>> 44).toInt
      val channels = ((v >>> 41) & 7).toInt + 1
      val total = v & ((1L << 36) - 1)
      if (rate <= 0) return None
      Some(MediaInfo("flac", "flac", total * 1000L / rate, rate, channels,
        0, 0, 0, total))
    } catch { case _: Exception => None }
  }

  /** RIFF/AVI `avih` + first `vids` `strh` — frame count, frame rate,
    * dims, and the video codec fourcc, no chunk-data reads. */
  object AviProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 12 ||
          new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
          new String(bytes, 8, 4, "US-ASCII") != "AVI ") return None
      var usPerFrame = 0L; var totalFrames = 0L
      var width = 0; var height = 0; var handler = ""
      var haveAvih = false
      def walk(start: Int, end: Int): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val id = new String(bytes, p, 4, "US-ASCII")
          val len = Codecs.LE.i32(bytes, p + 4)
          if (len < 0 || p + 8L + len > end) return false
          if (id == "LIST" && len >= 4) {
            val lt = new String(bytes, p + 8, 4, "US-ASCII")
            // hdrl/strl only: walking movi would touch every data chunk
            if ((lt == "hdrl" || lt == "strl") && !walk(p + 12, p + 8 + len))
              return false
          } else if (id == "avih" && len >= 40) {
            usPerFrame = Codecs.LE.i32(bytes, p + 8) & 0xFFFFFFFFL
            totalFrames = Codecs.LE.i32(bytes, p + 24) & 0xFFFFFFFFL
            width = Codecs.LE.i32(bytes, p + 40)
            height = Codecs.LE.i32(bytes, p + 44)
            haveAvih = true
          } else if (id == "strh" && len >= 8 && handler.isEmpty &&
              new String(bytes, p + 8, 4, "US-ASCII") == "vids")
            handler = new String(bytes, p + 12, 4, "US-ASCII").trim
          p += 8 + len + (len & 1)
        }
        true
      }
      if (!walk(12, bytes.length) || !haveAvih) return None
      if (width < 0 || height < 0) return None
      // both factors are attacker-controlled 32-bit fields: the product
      // can exceed Long (review-caught r10) — an overflowing claim is a
      // corrupt header, not a 584-million-year video
      if (totalFrames > 0 && usPerFrame > Long.MaxValue / totalFrames)
        return None
      Some(MediaInfo("avi", if (handler.isEmpty) "unknown" else handler,
        totalFrames * usPerFrame / 1000L, 0, 0, 0, width, height, totalFrames))
    } catch { case _: Exception => None }
  }

  /** GIF block walk — logical-screen dims, image count, and total
    * animation duration from the Graphic Control Extension delays
    * (centiseconds), WITHOUT LZW decode: color tables and pixel data
    * sub-blocks are length-skipped. */
  object GifProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 13) return None
      val magic = new String(bytes, 0, 6, "US-ASCII")
      if (magic != "GIF87a" && magic != "GIF89a") return None
      val w = Codecs.LE.u16(bytes, 6); val h = Codecs.LE.u16(bytes, 8)
      val packed = bytes(10) & 0xFF
      var p = 13
      if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 7) + 1)) // GCT
      var frames = 0L; var delayCs = 0L
      def skipSubBlocks(): Unit = {
        while ((bytes(p) & 0xFF) != 0) p += 1 + (bytes(p) & 0xFF)
        p += 1 // block terminator
      }
      var done = false
      while (!done) {
        (bytes(p) & 0xFF) match {
          case 0x3B => done = true // trailer
          case 0x21 => // extension: label + sub-blocks
            val label = bytes(p + 1) & 0xFF
            p += 2
            if (label == 0xF9 && (bytes(p) & 0xFF) >= 4)
              delayCs += Codecs.LE.u16(bytes, p + 2) // GCE delay field
            skipSubBlocks()
          case 0x2C => // image descriptor
            val ipacked = bytes(p + 9) & 0xFF
            p += 10
            if ((ipacked & 0x80) != 0) p += 3 * (1 << ((ipacked & 7) + 1))
            p += 1 // LZW min code size
            skipSubBlocks()
            frames += 1
          case _ => return None // corrupt block stream
        }
      }
      if (w <= 0 || h <= 0 || frames == 0) return None
      Some(MediaInfo("gif", "gif-lzw", delayCs * 10L, 0, 0, 0, w, h, frames))
    } catch { case _: Exception => None }
  }

  /** JPEG marker walk (ITU-T T.81): FFD8, then marker segments with
    * big-endian lengths until the first SOFn frame header carries the
    * precision/height/width/components — the crawl-modal image format's
    * triage fields without any entropy decode. Standalone markers
    * (TEM, RSTn) have no length; the walk stops at SOS (past it is
    * entropy-coded data) or EOI. */
  object JpegProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 4 ||
          (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
      var p = 2
      while (p + 4 <= bytes.length) {
        if ((bytes(p) & 0xFF) != 0xFF) return None // marker desync
        var m = bytes(p + 1) & 0xFF
        while (m == 0xFF && p + 2 < bytes.length) { p += 1; m = bytes(p + 1) & 0xFF } // fill bytes
        if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { p += 2 }
        else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before any SOF
        else {
          val len = ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
          if (len < 2 || p + 2L + len > bytes.length) return None
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) {
            if (len < 8) return None
            val h = ((bytes(p + 5) & 0xFF) << 8) | (bytes(p + 6) & 0xFF)
            val w = ((bytes(p + 7) & 0xFF) << 8) | (bytes(p + 8) & 0xFF)
            val comps = bytes(p + 9) & 0xFF
            if (w <= 0 || h <= 0 || comps <= 0) return None
            val codec = m match {
              case 0xC0 => "baseline"
              case 0xC1 => "extended-sequential"
              case 0xC2 => "progressive"
              case 0xC3 => "lossless"
              case mm => f"sof${mm - 0xC0}%d"
            }
            return Some(MediaInfo("jpeg", codec, 0L, 0, comps, 0, w, h, 1L))
          }
          p += 2 + len
        }
      }
      None
    } catch { case _: Exception => None }
  }

  /** PNG chunk walk (RFC 2083 / the PNG spec): 8-byte signature, IHDR
    * first (dims, bit depth, color type, interlace), then chunks to
    * IEND; an `acTL` chunk before the first `IDAT` makes it APNG and
    * carries the frame count. CRCs deliberately unverified (the probe
    * split). */
  object PngProbe extends Probe {
    private val Sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 33) return None
      var i = 0
      while (i < 8) { if ((bytes(i) & 0xFF) != (Sig(i) & 0xFF)) return None; i += 1 }
      def u32(o: Int): Long =
        ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      if (u32(8) != 13L || new String(bytes, 12, 4, "US-ASCII") != "IHDR") return None
      val w = u32(16); val h = u32(20)
      val bitDepth = bytes(24) & 0xFF
      val colorType = bytes(25) & 0xFF
      val interlace = bytes(28) & 0xFF
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
      val codec = (colorType match {
        case 0 => "gray"
        case 2 => "rgb"
        case 3 => "indexed"
        case 4 => "gray-alpha"
        case 6 => "rgba"
        case _ => return None
      }) + s"$bitDepth" + (if (interlace == 1) "/adam7" else "")
      // chunk walk: APNG acTL (before IDAT) carries num_frames
      var frames = 1L
      var p = 33L
      var sawIdat = false
      var done = false
      while (!done && p + 8 <= bytes.length) {
        val len = u32(p.toInt)
        if (len > bytes.length) return None
        val typ = new String(bytes, p.toInt + 4, 4, "US-ASCII")
        typ match {
          case "IEND" => done = true
          case "IDAT" => sawIdat = true
          case "acTL" if !sawIdat && len >= 8 =>
            frames = math.max(1L, u32(p.toInt + 8))
          case _ => ()
        }
        p += 12L + len // len + type + data + crc
      }
      Some(MediaInfo("png", codec, 0L, 0, 0, 0, w.toInt, h.toInt, frames))
    } catch { case _: Exception => None }
  }

  /** WebP RIFF walk (the public WebP container + VP8/VP8L bitstream
    * specs): `VP8 ` lossy (frame tag + 9D012A start code + 14-bit
    * dims), `VP8L` lossless (0x2F + packed 14-bit dims-minus-one),
    * `VP8X` extended (24-bit canvas dims-minus-one; the ANIM flag
    * makes ANMF chunks countable frames). */
  object WebpProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 20 ||
          bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
          bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'E' ||
          bytes(10) != 'B' || bytes(11) != 'P') return None
      val fourcc = new String(bytes, 12, 4, "US-ASCII")
      val chunkLen = Codecs.LE.i32(bytes, 16) & 0xFFFFFFFFL
      if (20L + chunkLen > bytes.length + 1L) return None // +1: odd-length pad
      fourcc match {
        case "VP8 " =>
          if (bytes.length < 30) return None
          val tag = (bytes(20) & 0xFF) | ((bytes(21) & 0xFF) << 8) | ((bytes(22) & 0xFF) << 16)
          if ((tag & 1) != 0) return None // not a key frame: no dims
          if ((bytes(23) & 0xFF) != 0x9D || (bytes(24) & 0xFF) != 0x01 ||
              (bytes(25) & 0xFF) != 0x2A) return None
          val w = Codecs.LE.u16(bytes, 26) & 0x3FFF
          val h = Codecs.LE.u16(bytes, 28) & 0x3FFF
          if (w == 0 || h == 0) return None
          Some(MediaInfo("webp", "vp8", 0L, 0, 0, 0, w, h, 1L))
        case "VP8L" =>
          if (bytes.length < 25 || (bytes(20) & 0xFF) != 0x2F) return None
          val b = Codecs.LE.i32(bytes, 21)
          val w = (b & 0x3FFF) + 1
          val h = ((b >>> 14) & 0x3FFF) + 1
          Some(MediaInfo("webp", "vp8l", 0L, 0, 0, 0, w, h, 1L))
        case "VP8X" =>
          if (bytes.length < 30 || chunkLen < 10) return None
          val flags = bytes(20) & 0xFF
          val w = ((bytes(24) & 0xFF) | ((bytes(25) & 0xFF) << 8) |
                   ((bytes(26) & 0xFF) << 16)) + 1
          val h = ((bytes(27) & 0xFF) | ((bytes(28) & 0xFF) << 8) |
                   ((bytes(29) & 0xFF) << 16)) + 1
          val anim = (flags & 0x02) != 0
          var frames = if (anim) 0L else 1L
          if (anim) { // count ANMF chunks
            var p = 20L + chunkLen + (chunkLen & 1L)
            while (p + 8 <= bytes.length) {
              val cc = new String(bytes, p.toInt, 4, "US-ASCII")
              val len = Codecs.LE.i32(bytes, p.toInt + 4) & 0xFFFFFFFFL
              if (cc == "ANMF") frames += 1
              p += 8L + len + (len & 1L)
            }
            if (frames == 0) return None
          }
          Some(MediaInfo("webp", if (anim) "vp8x-anim" else "vp8x",
            0L, 0, 0, 0, w, h, frames))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** BMP header read (the public BITMAPINFOHEADER layout): dims are
    * signed (negative height = top-down rows — reported absolute),
    * compression id names the codec. */
  object BmpProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 54 ||
          bytes(0) != 'B' || bytes(1) != 'M') return None
      val dibSize = Codecs.LE.i32(bytes, 14)
      if (dibSize < 40) return None // BITMAPCOREHEADER not served
      val w = Codecs.LE.i32(bytes, 18)
      val h = Codecs.LE.i32(bytes, 22)
      val bpp = Codecs.LE.u16(bytes, 28)
      val comp = Codecs.LE.i32(bytes, 30)
      if (w <= 0 || h == 0 || h == Int.MinValue || bpp == 0) return None
      val codec = comp match {
        case 0 => s"rgb$bpp"
        case 1 => "rle8"
        case 2 => "rle4"
        case 3 => s"bitfields$bpp"
        case c => s"comp-$c"
      }
      Some(MediaInfo("bmp", codec, 0L, 0, 0, 0, w, math.abs(h), 1L))
    } catch { case _: Exception => None }
  }

  /** TIFF IFD walk (the public TIFF 6.0 layout): byte-order header
    * (II little / MM big endian), then the IFD chain — dims, bits per
    * sample, compression id per IFD0, page count = IFD chain length
    * (multi-page TIFF is the document-scan norm). Entry values read
    * inline for SHORT/LONG types; chain bounded against loops. */
  object TiffProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 8) return None
      val le =
        if (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) true
        else if (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42) false
        else return None
      def u16(o: Int): Int =
        if (le) Codecs.LE.u16(bytes, o)
        else ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
      def u32(o: Int): Long =
        if (le) Codecs.LE.i32(bytes, o) & 0xFFFFFFFFL
        else ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
             ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      var w = 0L; var h = 0L; var bits = 0L; var comp = 1L
      var ifd = u32(4)
      var pages = 0L
      var first = true
      while (ifd != 0L && pages < 65536) {
        if (ifd + 2 > bytes.length || ifd < 8) return None
        val n = u16(ifd.toInt)
        if (ifd + 2 + n * 12L + 4 > bytes.length) return None
        if (first) {
          var i = 0
          while (i < n) {
            val e = (ifd + 2 + i * 12L).toInt
            val tag = u16(e)
            val typ = u16(e + 2)
            // inline SHORT/LONG value (count 1): SHORT sits in the
            // value field's FIRST two bytes in both byte orders
            val v: Long =
              if (typ == 3) u16(e + 8) else if (typ == 4) u32(e + 8) else -1L
            if (v >= 0) tag match {
              case 256 => w = v
              case 257 => h = v
              case 258 => bits = v
              case 259 => comp = v
              case _ => ()
            }
            i += 1
          }
          first = false
        }
        pages += 1
        ifd = u32((ifd + 2 + n * 12L).toInt)
      }
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
      val codec = comp match {
        case 1 => s"none$bits"
        case 2 | 3 | 4 => "ccitt"
        case 5 => "lzw"
        case 6 | 7 => "jpeg"
        case 8 | 32946 => "deflate"
        case 32773 => "packbits"
        case c => s"comp-$c"
      }
      Some(MediaInfo("tiff", codec, 0L, 0, 0, 0, w.toInt, h.toInt, pages))
    } catch { case _: Exception => None }
  }

  /** Sun/NeXT `.snd` header only. */
  object AuProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 24 ||
          new String(bytes, 0, 4, "US-ASCII") != ".snd") return None
      def be32(o: Int): Int =
        ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
          ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
      val dataOff = be32(4); val claimed = be32(8)
      val enc = be32(12); val rate = be32(16); val ch = be32(20)
      if (dataOff < 24 || dataOff > bytes.length || rate <= 0 ||
          ch < 1 || ch > 64) return None
      val (codec, bytesPer) = enc match {
        case 1 => ("ulaw", 1); case 2 => ("pcm8", 1); case 3 => ("pcm16-be", 2)
        case 4 => ("pcm24-be", 3); case 5 => ("pcm32-be", 4)
        case 6 => ("float32-be", 4); case 27 => ("alaw", 1)
        case _ => return None
      }
      val avail = bytes.length - dataOff
      val dataLen = if (claimed < 0) avail
        else math.min(claimed.toLong, avail.toLong).toInt
      val frames = dataLen.toLong / (bytesPer * ch)
      // bitrate in LONG: bytesPer·ch·rate·8 overflows Int for large
      // (crafted) rates (review-caught r10)
      val kbps = math.min(bytesPer.toLong * ch * rate * 8 / 1000,
        Int.MaxValue.toLong).toInt
      Some(MediaInfo("au", codec, frames * 1000L / rate, rate, ch,
        kbps, 0, 0, frames))
    } catch { case _: Exception => None }
  }

  /** AIFF `COMM` header only. */
  object AiffProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 12 ||
          new String(bytes, 0, 4, "US-ASCII") != "FORM" ||
          new String(bytes, 8, 4, "US-ASCII") != "AIFF") return None
      def be16(o: Int): Int = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
      def be32(o: Int): Int =
        (be16(o) << 16) | be16(o + 2)
      var p = 12
      while (p + 8 <= bytes.length) {
        val id = new String(bytes, p, 4, "US-ASCII")
        val len = be32(p + 4)
        if (len < 0 || p + 8L + len > bytes.length) return None
        if (id == "COMM" && len >= 18) {
          val ch = be16(p + 8); val frames = be32(p + 10)
          val bits = be16(p + 14)
          val e = be16(p + 16) & 0x7FFF
          var m = 0L; var i = 0
          while (i < 8) { m = (m << 8) | (bytes(p + 18 + i) & 0xFF); i += 1 }
          val rate = math.round(
            if (e == 0 && m == 0L) 0.0
            else math.scalb((m >>> 11).toDouble, e - 16383 - 52)).toInt
          if (ch < 1 || rate <= 0 || frames < 0) return None
          val kbps = math.min(bits.toLong * ch * rate / 1000,
            Int.MaxValue.toLong).toInt // Long: crafted fields overflow Int
          return Some(MediaInfo("aiff", s"pcm$bits", frames.toLong * 1000L / rate,
            rate, ch, kbps, 0, 0, frames.toLong))
        }
        p += 8 + len + (len & 1)
      }
      None
    } catch { case _: Exception => None }
  }

  /** RIFF/WAVE `fmt ` + `data` headers only. */
  object WavProbe extends Probe {
    def probe(bytes: Array[Byte]): Option[MediaInfo] = try {
      if (bytes == null || bytes.length < 12 ||
          new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
          new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
      var fmtOff = -1; var dataLen = -1L
      var p = 12
      while (p + 8 <= bytes.length && (fmtOff < 0 || dataLen < 0)) {
        val id = new String(bytes, p, 4, "US-ASCII")
        val len = Codecs.LE.i32(bytes, p + 4)
        if (len < 0 || p + 8L + len > bytes.length) return None
        if (id == "fmt ") fmtOff = p + 8
        else if (id == "data") dataLen = len.toLong
        p += 8 + len + (len & 1)
      }
      if (fmtOff < 0 || dataLen < 0) return None
      val tag = Codecs.LE.u16(bytes, fmtOff)
      val channels = Codecs.LE.u16(bytes, fmtOff + 2)
      val rate = Codecs.LE.i32(bytes, fmtOff + 4)
      val byteRate = Codecs.LE.i32(bytes, fmtOff + 8)
      if (channels < 1 || rate <= 0 || byteRate <= 0) return None
      val codec = tag match {
        case 1 => "pcm"; case 3 => "pcm-float"; case 6 => "alaw"
        case 7 => "ulaw"; case 0x11 => "ima-adpcm"; case 0x55 => "mp3"
        case t => f"0x$t%04x"
      }
      Some(MediaInfo("wav", codec, dataLen * 1000L / byteRate, rate, channels,
        math.min(byteRate.toLong * 8 / 1000, Int.MaxValue.toLong).toInt,
        0, 0, 0L))
    } catch { case _: Exception => None }
  }
}
