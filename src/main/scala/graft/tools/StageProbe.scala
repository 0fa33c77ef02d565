package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time the six staged shared materializations exactly as
  * graft.Bench books them (same build calls, same count() actions for the
  * au/dd pair tables), after the same small-sf warmup, so the staged-entry
  * numbers can be iterated on without running the frozen Bench protocol.
  * Not part of the driver contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmSf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[stage] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup at the small sf (mirrors Bench's untimed warmup pass)
    graft.queries.ClipQueries.stagedIncrTable(spark, warmSf)
    graft.queries.ClipQueries.stagedRangedTable(spark, warmSf)
    graft.queries.ClipQueries.stagedOverwriteTable(spark, warmSf)
    graft.queries.ClipQueries.stagedEvolveTable(spark, warmSf)
    graft.dedup.Dedup.verifiedPairsShared(spark, warmSf).count()
    graft.audio.AudioQueries.measuredShared(spark, warmSf).count()
    t("au_materialize")(graft.audio.AudioQueries.measuredShared(spark, sfDir).count())
    t("dd_pairs_materialize")(graft.dedup.Dedup.verifiedPairsShared(spark, sfDir).count())
    t("vc_incr_materialize")(graft.queries.ClipQueries.stagedIncrTable(spark, sfDir))
    t("vc_skip_materialize")(graft.queries.ClipQueries.stagedRangedTable(spark, sfDir))
    t("vc_overwrite_materialize")(graft.queries.ClipQueries.stagedOverwriteTable(spark, sfDir))
    t("vc_evolve_materialize")(graft.queries.ClipQueries.stagedEvolveTable(spark, sfDir))
    spark.stop()
  }
}
