package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *   - cosine near-dup pairs, blocked on `label` with a probe-side
  *     restriction (oracle-able, linear in probes x block size)
  *   - brute-force cosine top-k for a query set (the exactness baseline)
  *   - random-hyperplane LSH bucketed top-k (the 100 TB scale path:
  *     candidates come from a 16-bit signature bucket join, not a cross
  *     join)
  *
  * Dot products use `zip_with` + `aggregate` over DOUBLE — codegen-friendly
  * built-ins, sequential accumulation, so DuckDB's loop reproduces the FP
  * result bit-for-bit.
  */
object Ann {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Sequential-order dot product of two double arrays as a Column. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Near-duplicate pairs with cosine >= threshold; probes are the
    * vec_id % 20 == 0 subset, candidates blocked on equal `label`. */
  def cosinePairs(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    val e = emb(spark, sfDir).select(
      col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val probes = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("id_a"), col("label"), col("v").as("va"))
    val cands = e.select(col("vec_id").as("id_b"), col("label"), col("v").as("vb"))
    probes.join(cands, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** Brute-force cosine top-k: queries = vec_id < nQueries, ranked per query
    * by (cos desc, vec_id) for determinism. The query side is broadcast —
    * the scan of the corpus stays partition-parallel with no shuffle until
    * the per-query top-k aggregate. */
  def bruteTopK(spark: SparkSession, sfDir: String, nQueries: Int = 16, k: Int = 5): DataFrame = {
    val e = emb(spark, sfDir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim) —
    * arithmetic only, so signatures are stable across runs/engines. */
  private def planeCoef(plane: Int, dim: Int): Double = {
    var h = 0x9E3779B97F4A7C15L * (plane * 131 + dim + 1)
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** IVF-style bucketed top-k: coarse quantization against `nCells`
    * deterministic centroids (the first nCells vectors — a fixed, data-
    * derived codebook; a production build would k-means these), each vector
    * assigned to its nearest centroid, queries probing their `nProbe`
    * closest cells. Join key = cell id, so candidate generation is a
    * bounded-key join — the inverted-file shape that survives 10^9 vectors. */
  def ivfTopK(spark: SparkSession, sfDir: String, nQueries: Int = 16, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val e = emb(spark, sfDir).select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val centroids: Array[(Int, Array[Double])] = e.filter(col("vec_id") < nCells)
      .collect().map(r => (r.getLong(0).toInt,
        r.getSeq[Double](1).toArray))
    val bc = spark.sparkContext.broadcast(centroids)
    val cellOf = udf((v: Seq[Double]) => {
      var best = -1; var bestDot = Double.NegativeInfinity
      bc.value.foreach { case (cid, c) =>
        var acc = 0.0; var i = 0
        while (i < c.length) { acc += c(i) * v(i); i += 1 }
        if (acc > bestDot) { bestDot = acc; best = cid }
      }
      best
    })
    val probesOf = udf((v: Seq[Double]) => {
      bc.value.map { case (cid, c) =>
        var acc = 0.0; var i = 0
        while (i < c.length) { acc += c(i) * v(i); i += 1 }
        (cid, acc)
      }.sortBy(-_._2).take(nProbe).map(_._1)
    })
    val assigned = e.withColumn("cell", cellOf(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(probesOf(col("v"))).as("cell"))
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor"), round(col("cos"), 4).as("cos"))
  }

  val LshBits = 12

  /** LSH-bucketed approximate top-k: 12-bit random-hyperplane signature,
    * candidates share the bucket; rank within bucket. Trades recall for a
    * bounded-key join — the shape that survives 10^9 vectors. */
  def lshTopK(spark: SparkSession, sfDir: String, nQueries: Int = 16, k: Int = 5): DataFrame = {
    val dim = 64
    val planes: Array[Array[Double]] =
      Array.tabulate(LshBits, dim)((p, d) => planeCoef(p, d))
    val sigUdf = udf((v: Seq[Double]) => {
      var sig = 0
      var p = 0
      while (p < LshBits) {
        var acc = 0.0
        var i = 0
        while (i < v.length) { acc += planes(p)(i) * v(i); i += 1 }
        if (acc >= 0) sig |= (1 << p)
        p += 1
      }
      sig
    })
    val e = emb(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("sig", sigUdf(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sig"))
    val scored = e.join(broadcast(q), Seq("sig"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor"), round(col("cos"), 4).as("cos"))
  }
}
