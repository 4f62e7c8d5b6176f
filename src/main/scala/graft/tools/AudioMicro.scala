package graft.tools

/** Micro-benchmark behind the r18 audio-decode fix: readAudio's
  * single-thread rate and its scaling across 32 threads. Before the
  * fix (AudioSystem provider lookup + the SoftMidi reader's per-probe
  * classpath scan under a global lock): 2.3 s at 1 thread, 3.0 s at 32
  * — the whole pass serialized. After (cached SPI readers, SoftMidi
  * excluded): ~0.7 s at 1 thread, ~0.05 s at 32.
  *
  * Usage: runMain graft.tools.AudioMicro
  */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = 50000
    val blobs = Array.tabulate(200)(i => graft.ops.Multimodal.syntheticWav(i.toLong))
    (0 until 1000).foreach(i => graft.ops.Multimodal.readAudio(blobs(i % 200)))
    def run(threads: Int): Double = {
      val t0 = System.nanoTime()
      val per = n / threads
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = 0
          while (i < per) { graft.ops.Multimodal.readAudio(blobs(i % 200)); i += 1 }
        })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"1 thread:  ${run(1)}%.3f s for $n decodes")
    println(f"32 thread: ${run(32)}%.3f s for $n decodes")
  }
}
