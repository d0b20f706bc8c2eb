package graft.tools

import graft.ops.{Codecs, Multimodal}

/** Receipt tool (r10): measures the AIFF/AU decode cost of the
  * LOCK-FREE pure-byte path vs the globally-locked
  * `javax.sound.sampled` registry path, on 32 threads — the same
  * methodology that caught the r9 WAV pathology (SCALE.md). Usage:
  * `runMain graft.tools.AudioPathBench [nBlobs]`. No Spark: the lock
  * contention under test is thread-level, and 32 plain threads model
  * the executor pool exactly. */
object AudioPathBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val threads = 32
    // mixed AIFF/AU corpus, the shape the r9 verdict flagged as the
    // un-fixed residual of the WAV fast path
    val blobs: Array[Array[Byte]] = Array.tabulate(n) { i =>
      if (i % 2 == 0)
        Multimodal.aiffBytes(8000, 1, 16,
          Multimodal.pcm16be((0 until 100).map(k => (i + k * 37) % 60000 - 30000)))
      else
        Multimodal.auBytes(3, 8000, 1,
          Multimodal.pcm16be((0 until 100).map(k => (i * 3 + k) % 60000 - 30000)))
    }
    // the registry path, replicated as a decoder (JdkPcmDecoder's
    // private fallback): every call probes AudioSystem's provider
    // registry under its global lock
    val registry = new Codecs.AudioDecoder {
      def decode(bytes: Array[Byte]): Option[Codecs.AudioPcm] = {
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
              Some(Codecs.AudioPcm(fmt.getSampleRate.toInt, fmt.getChannels,
                new Array[Double](data.length / 2)))
            } finally pcm.close()
          } finally in.close()
        } catch { case _: Exception => None }
      }
    }
    def time(name: String, dec: Codecs.AudioDecoder): Double = {
      val t0 = System.nanoTime()
      val ok = new java.util.concurrent.atomic.AtomicLong()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val per = (n + threads - 1) / threads
        val futures = (0 until threads).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var i = t * per
              val end = math.min((t + 1) * per, n)
              while (i < end) {
                if (dec.decode(blobs(i)).nonEmpty) ok.incrementAndGet()
                i += 1
              }
            }
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-10s n=$n decoded=${ok.get()} $sec%.2f s")
      sec
    }
    time("warmup", Codecs.JdkPcmDecoder)
    val fast = time("fast", Codecs.JdkPcmDecoder)
    val locked = time("registry", registry)
    println(f"registry/fast = ${locked / fast}%.1f x")
  }
}
