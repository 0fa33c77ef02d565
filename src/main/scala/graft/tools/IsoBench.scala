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
      // mode "queries": optional further args = query-name filter, optional
      // leading Npasses as args(1) when numeric. Uses the same noop-sink
      // force action as graft.Bench so projection-only queries are honest.
      val rest = args.drop(if (mode == "queries") 1 else 0)
      val nPasses = rest.headOption.flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(2)
      val filter = rest.dropWhile(s => scala.util.Try(s.toInt).toOption.isDefined).toSet
      val sel = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => filter.isEmpty || filter(n) }
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // literally Bench's action, not a copy — the round-3 count()-prunes-
      // projections bug class must not be re-fixable in only one place
      def force(df: org.apache.spark.sql.DataFrame): Unit = graft.Bench.force(df)
      val warmSf = "/root/testdata/sf0.001"
      sel.foreach { case (_, fn) =>
        try force(fn(spark, warmSf)) catch { case _: Throwable => }
      }
      for (pass <- 1 to nPasses) {
        sel.foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          try force(fn(spark, sfDir))
          catch { case e: Throwable => println(s"[iso] $name FAILED: ${e.getMessage}") }
          println(f"[iso] pass$pass $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
          spark.catalog.clearCache()
        }
      }
      spark.stop()
    }
  }
}
