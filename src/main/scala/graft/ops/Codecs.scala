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

  /** A decoded clip. `frame(k)` returns the k-th GRAYSCALE plane
    * (exactly `width*height` bytes) ON DEMAND, so a stride-sampling
    * consumer (`everyN` > 1) never materializes the frames it skips —
    * decoders over seekable containers can slice lazily (the GFV1
    * default does), while a sequential codec may decode into a buffer
    * and serve from it. */
  final case class VideoClip(width: Int, height: Int, nFrames: Int,
                             frame: Int => Array[Byte])

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

  /** Decoded audio: MONO samples in [-1, 1] (multi-channel inputs are
    * averaged by the decoder), plus the source's rate and channel count
    * for accounting. */
  final case class AudioPcm(sampleRate: Int, channels: Int,
                            mono: Array[Double])

  /** bytes → [[AudioPcm]]; None = undecodable (the operator falls back
    * to the flagged byte-stride feature). */
  trait AudioDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Option[AudioPcm]
  }

  /** The default audio decoder: JDK `javax.sound.sampled` — WAV/AU/AIFF
    * at any PCM width (frames convert to 16-bit signed, channels average
    * to mono). Compressed formats (MP3/OGG) return None here; an
    * FFmpeg-backed [[AudioDecoder]] slots in with the same contract. */
  object JdkPcmDecoder extends AudioDecoder {
    def decode(bytes: Array[Byte]): Option[AudioPcm] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      if (bytes == null || bytes.isEmpty) return None
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
            Some(AudioPcm(fmt.getSampleRate.toInt, ch, mono))
          } finally pcm.close()
        } finally in.close()
      } catch { case _: Exception => None } // not audio / corrupt → fallback
    }
  }
}
