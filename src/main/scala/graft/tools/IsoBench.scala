package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Dev tool: quick timing probes outside the full Bench protocol — re-run
  * the query loop to localize transient host dips, or time the scaling
  * pipeline at one level. Not part of the driver contract. */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = args.headOption.getOrElse("queries")
    if (mode == "pipeline") {
      val cores = if (args.length > 1) args(1).toInt else 24
      val repl = if (args.length > 2) args(2).toInt else 6
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      graft.run.ValidationPipeline.timed(spark, sfDir, 1) // warm
      for (p <- 1 to 3) {
        val (n, bad, sec) = graft.run.ValidationPipeline.timed(spark, sfDir, repl)
        println(f"[iso] pipeline pass$p cores=$cores repl=$repl clips=$n bad=$bad ${sec}%.2f s (${n / sec}%.0f cps)")
      }
      spark.stop()
    } else {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val warmSf = "/root/testdata/sf0.001"
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmSf).count() catch { case _: Throwable => }
      }
      for (pass <- 1 to 2) {
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable => println(s"[iso] $name FAILED: ${e.getMessage}") }
          println(f"[iso] pass$pass $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
          spark.catalog.clearCache()
        }
      }
      spark.stop()
    }
  }
}
