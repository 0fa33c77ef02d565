package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not driver contract): replicate DedupSpec's stopword corpus
  * and print per-stage shuffle-read task distributions WITH stage names so
  * a skewed stage can be attributed to an operator. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-skewprobe").toString
    def dupFrame(off: Long) = spark.range(0, 20).select(
      (col("id") + off).as("doc_id"),
      concat(lit("the dupa"), col("id"), lit(" dupb"), col("id"),
        lit(" dupc"), col("id")).as("text"),
      lit("en").as("lang"), lit("synth").as("source"))
    spark.range(0, 100000).select(
        col("id").as("doc_id"),
        concat(lit("the filler"), col("id")).as("text"),
        lit("en").as("lang"), lit("synth").as("source"))
      .unionByName(dupFrame(200000)).unionByName(dupFrame(300000))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val stageReads = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && m.shuffleReadMetrics != null)
          stageReads.computeIfAbsent(e.stageId,
            _ => new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]())
            .add(m.shuffleReadMetrics.recordsRead)
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageNames.put(e.stageInfo.stageId,
          e.stageInfo.rddInfos.map(r => s"${r.id}:${r.name}").mkString(","))
    }
    spark.sparkContext.addSparkListener(l)
    val result = graft.dedup.Dedup.tokenJaccard(spark, dir, 0.8)
    println(s"rows=${result.count()}")
    println("==== executed plan ====")
    println(result.queryExecution.executedPlan.toString.take(14000))
    Thread.sleep(2000)
    import scala.jdk.CollectionConverters._
    stageReads.asScala.toSeq.sortBy(_._1).foreach { case (sid, lst) =>
      val xs = lst.asScala.map(_.longValue).toSeq
      println(f"stage $sid: n=${xs.size} sum=${xs.sum} max=${xs.max}  name=${stageNames.getOrDefault(sid, "?").take(300)}")
    }
    spark.stop()
  }
}
