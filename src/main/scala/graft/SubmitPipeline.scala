package graft

import org.apache.spark.sql.SparkSession

import graft.run.ValidationPipeline

/** spark-submit entry for the headline validation pipeline — the north
  * rule's literal launch mode ("run via spark-submit ... at two cluster
  * sizes"). Unlike graft.Bench (which builds its own local sessions), this
  * main inherits the session from spark-submit, so the parallelism level is
  * exactly what `--master local[N]` / a real cluster manager provides:
  *
  * {{{
  * spark-submit --master local[6]  --class graft.SubmitPipeline <jar> <sfDir> <replicate>
  * spark-submit --master local[24] --class graft.SubmitPipeline <jar> <sfDir> <replicate>
  * }}}
  *
  * Prints one JSON line with the measured throughput; efficiency between
  * two invocations = (cps_4N / cps_N) / 4.
  */
object SubmitPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repl = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // follow the granted cores unless the submit set partitions EXPLICITLY —
    // probe the SparkConf (only explicit settings), not RuntimeConfig.get,
    // which silently returns the registered "200" default for this key
    if (!spark.sparkContext.getConf.contains("spark.sql.shuffle.partitions"))
      spark.conf.set("spark.sql.shuffle.partitions",
        spark.sparkContext.defaultParallelism.toString)
    // warm pass (JIT + page cache), then the measured run
    ValidationPipeline.timed(spark, sfDir, 1)
    val (n, bad, sec) = ValidationPipeline.timed(spark, sfDir, repl)
    println(f"""{"master":"${spark.sparkContext.master}","clips":$n,"bad_rows":$bad,"sec":$sec%.3f,"clips_per_sec":${n / sec}%.1f}""")
    spark.stop()
  }
}
