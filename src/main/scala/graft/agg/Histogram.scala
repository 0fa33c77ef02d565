package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fixed-bin histogram sketch: bin i covers [lo + i*width, lo + (i+1)*width);
  * underflow clamps to bin 0, overflow to the last bin. Mergeable (vector
  * add) => partial+final aggregation, one pass, no shuffle beyond the final
  * 1-row combine. Feeds the KS / chi-square drift tests (SURVEY.md §2.10).
  */
final case class HistBuf(counts: Array[Long], n: Long)

class HistogramAggregator(lo: Double, hi: Double, nBins: Int)
    extends Aggregator[NumIn, HistBuf, HistBuf] {
  private val width = (hi - lo) / nBins
  def zero: HistBuf = HistBuf(Array.fill(nBins)(0L), 0L)
  def reduce(b: HistBuf, in: NumIn): HistBuf = in.v match {
    case None => b
    case Some(x) =>
      val bin = math.min(nBins - 1, math.max(0, ((x - lo) / width).toInt))
      b.counts(bin) += 1
      HistBuf(b.counts, b.n + 1)
  }
  def merge(a: HistBuf, b: HistBuf): HistBuf = {
    val out = new Array[Long](nBins)
    var i = 0
    while (i < nBins) { out(i) = a.counts(i) + b.counts(i); i += 1 }
    HistBuf(out, a.n + b.n)
  }
  def finish(b: HistBuf): HistBuf = b
  def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  def outputEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
}

object Histogram {
  def sketch(c: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val u = udaf(new HistogramAggregator(lo, hi, nBins), Encoders.product[NumIn])
    u(c.cast("long"))
  }
}

/** Two-sample drift statistics over merged histogram sketches — the
  * dataset-level analogue of the reference's enum/const domain enforcement
  * (schema_repair.py:705-710) generalised to distributions. Pure math on
  * two already-aggregated count vectors (tiny driver-side finalize, like the
  * reference's final `validate` gate, schema_repair.py:163-183).
  */
object Drift {
  /** Two-sample chi-square statistic over category counts.
    * Categories with zero total are skipped. Returns (stat, dof). */
  def chiSquare(a: Map[String, Long], b: Map[String, Long]): (Double, Int) = {
    val keys = (a.keySet ++ b.keySet).toSeq.sorted
    val na = a.values.sum.toDouble
    val nb = b.values.sum.toDouble
    val n = na + nb
    var stat = 0.0
    var cats = 0
    keys.foreach { k =>
      val oa = a.getOrElse(k, 0L).toDouble
      val ob = b.getOrElse(k, 0L).toDouble
      val tot = oa + ob
      if (tot > 0) {
        cats += 1
        val ea = tot * na / n
        val eb = tot * nb / n
        if (ea > 0) stat += (oa - ea) * (oa - ea) / ea
        if (eb > 0) stat += (ob - eb) * (ob - eb) / eb
      }
    }
    (stat, math.max(0, cats - 1))
  }

  /** Two-sample KS statistic at bin granularity: max |ECDF_a − ECDF_b|. */
  def ksBinned(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    val na = a.sum.toDouble
    val nb = b.sum.toDouble
    var ca = 0.0; var cb = 0.0; var ks = 0.0
    var i = 0
    while (i < a.length) {
      ca += a(i); cb += b(i)
      val d = math.abs(ca / na - cb / nb)
      if (d > ks) ks = d
      i += 1
    }
    ks
  }
}
