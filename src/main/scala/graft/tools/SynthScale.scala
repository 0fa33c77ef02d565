package graft.tools

import graft.audio.Wav

/** Dev probe: raw-thread scaling of the synth+validate kernel itself (no
  * Spark) — isolates host-level scaling of the actual per-row work from the
  * Spark plumbing. Not part of the driver contract. */
object SynthScale {
  def main(args: Array[String]): Unit = {
    def run(threads: Int, clipsPerThread: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { id =>
        val t = new Thread(() => {
          val buf = new Array[Byte](64 * 1024)
          var i = 0
          var sink = 0.0
          while (i < clipsPerThread) {
            val len = Wav.synthInto(buf, id * 1000 + i, i, 44100, 260, Wav.CleanSnrDb, 0)
            val (snr, n) = Wav.validateVsClean(buf, len, id * 1000 + i)
            sink += snr + n
            i += 1
          }
          if (sink == Double.MinValue) println("impossible")
        })
        t.start(); t
      }
      ts.foreach(_.join())
      threads.toLong * clipsPerThread / ((System.nanoTime() - t0) / 1e9)
    }
    run(24, 2000) // warmup
    for (pass <- 1 to 2; t <- Seq(6, 24)) {
      val cps = run(t, if (t == 6) 24000 else 6000)
      println(f"[synthscale] pass$pass threads=$t ${cps}%.0f clips/s (${cps / t}%.0f per thread)")
    }
  }
}
