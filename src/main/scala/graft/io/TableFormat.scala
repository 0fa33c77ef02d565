package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-format seam (SURVEY.md §7.1 io/): the engine targets Iceberg-layout
  * tables, but no Iceberg jars ship in this sandbox, so this seam emulates
  * the layout with partitioned parquet + snapshot metadata:
  *
  * ```
  * <table>/data/v<k>/bucket=<n>/  # partitioned data files (parquet)
  * <table>/metadata/snap-<v>.json  # snapshot: partitions + row counts
  * <table>/metadata/version-hint.txt  # current snapshot version
  * ```
  *
  * Snapshot commits are atomic (temp + rename of the version hint), so a
  * reader always sees a complete snapshot — the property the Runner's
  * resume manifest relies on. Swapping in real Iceberg replaces this object
  * with `spark.read.format("iceberg")` and catalog commits; no caller
  * changes.
  */
object TableFormat {

  private def metaDir(table: String): Path = Paths.get(table, "metadata")

  /** Append a new snapshot of `df` partitioned by `partitionCol`. Returns
    * the committed snapshot version. */
  def commit(df: DataFrame, table: String, partitionCol: String): Int = {
    val version = currentVersion(table).getOrElse(0) + 1
    val dataPath = s"$table/data/v$version"
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dataPath)

    val counts = df.groupBy(col(partitionCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => s"""{"${partitionCol}": ${r.get(0)}, "rows": ${r.getLong(1)}}""")
    Files.createDirectories(metaDir(table))
    val snap =
      s"""{"version": $version, "data": "data/v$version", "partition_col": "$partitionCol",
         | "partitions": [${counts.mkString(", ")}]}""".stripMargin
    Files.writeString(metaDir(table).resolve(s"snap-$version.json"), snap)
    val tmp = metaDir(table).resolve(".version-hint.tmp")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, metaDir(table).resolve("version-hint.txt"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }

  def currentVersion(table: String): Option[Int] = {
    val hint = metaDir(table).resolve("version-hint.txt")
    if (Files.exists(hint)) Some(Files.readString(hint).trim.toInt) else None
  }

  def snapshots(table: String): Seq[Int] = {
    val dir = metaDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
      .map(_.stripPrefix("snap-").stripSuffix(".json").toInt)
      .toSeq.sorted
  }

  /** Read a snapshot (latest by default). Filters on the partition column
    * prune at the directory level (Spark partition discovery). */
  def read(spark: SparkSession, table: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $table"))
    spark.read.parquet(s"$table/data/v$v")
  }
}
