package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.audio.{AudioQueries, ClipMeta, Wav}
import graft.clips.ClipsTable
import graft.run.ValidationPipeline

/** Dev tool: decompose the validation pipeline's wall time per parallelism
  * level — (1) metadata scan, (2) fused synth+validate map, (3) full
  * verdicts incl. clip_id window + bucket agg — to locate where per-core
  * throughput is lost between local[N] and local[4N]. Not driver contract. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPL", "6").toInt
    Seq(6, 24, 6, 24).foreach { c =>
      val spark = SparkSession.builder()
        .master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._

      def timed(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"[probe] c=$c $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
      }

      val meta = ValidationPipeline.replicatedBase(spark, sfDir, repl)
      timed("scan")(meta.count())
      val flagged = meta
        .as[ClipMeta]
        .mapPartitions { it =>
          var buf = new Array[Byte](64 * 1024)
          it.map { m =>
            val seed = AudioQueries.seedOf(m.clip_id)
            val snrDb = if (m.ord % 149 == 0) Wav.CorruptSnrDb else Wav.CleanSnrDb
            val extra = if (m.ord % 157 == 0) 7 else 0
            val need = Wav.synthLen(m.sr_hz, m.dur_ms, extra)
            if (need > buf.length) buf = new Array[Byte](need)
            val len = Wav.synthInto(buf, seed, m.ord, m.sr_hz, m.dur_ms, snrDb, extra)
            val (snr, n) = Wav.validateVsClean(buf, len, seed)
            (m.clip_id, m.ord, m.bucket, snr < 30.0 || n < 0)
          }
        }
      timed("synth+validate")(flagged.count())
      timed("full verdicts")(ValidationPipeline.verdicts(spark, sfDir, repl).count())
      spark.stop()
    }
  }
}
