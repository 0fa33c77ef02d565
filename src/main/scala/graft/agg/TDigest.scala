package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A merging t-digest (Dunning's k1 scale function), implemented from the
  * published algorithm ("Computing Extremely Accurate Quantiles Using
  * t-Digests", Dunning & Ertl). Mergeable => works as a Spark partial/final
  * aggregate; the multi-level merge IS the `treeAggregate` semantics the
  * north star asks for, expressed through the Catalyst agg pipeline
  * (no RDDs).
  *
  * Buffer layout is two parallel arrays so the Catalyst product encoder can
  * serialise it without kryo.
  */
final case class TDigestBuf(
    compression: Double,
    means: Array[Double],
    weights: Array[Double],
    buf: Array[Double],
    bufLen: Int)

object TDigest {
  val DefaultCompression = 100.0
  private val BufferCap = 512

  def empty(compression: Double = DefaultCompression): TDigestBuf =
    TDigestBuf(compression, Array.empty, Array.empty, Array.empty, 0)

  /** Buffered inserts land in a PRE-SIZED scratch array via a write cursor
    * (`bufLen`) — the previous `:+` shape copied the whole buffer on every
    * input row (O(cap^2) copying + 2 garbage arrays per row in the hottest
    * aggregation loop). Buffered entries always have weight 1.0, so no
    * parallel weight buffer is needed. The Aggregator reduce contract
    * allows mutating and returning the buffer; the scratch is re-allocated
    * once per compress cycle (512 rows — compress drops it to keep the
    * serialized buffer lean), so steady state allocates nothing per row
    * but the 5-field case-class shell. */
  def add(b0: TDigestBuf, x: Double): TDigestBuf = {
    val b = if (b0.bufLen >= BufferCap) compress(b0) else b0
    val buf = if (b.buf.length >= BufferCap) b.buf else new Array[Double](BufferCap)
    buf(b.bufLen) = x
    b.copy(buf = buf, bufLen = b.bufLen + 1)
  }

  def merge(a0: TDigestBuf, b0: TDigestBuf): TDigestBuf = {
    val a = compress(a0); val b = compress(b0)
    val comp = math.max(a.compression, b.compression)
    compress(TDigestBuf(comp,
      a.means ++ b.means, a.weights ++ b.weights, Array.empty, 0))
  }

  /** k1 scale function: k(q) = (δ / 2π) · asin(2q − 1). */
  private def kOf(q: Double, d: Double): Double =
    d / (2.0 * math.Pi) * StrictMath.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  def compress(b: TDigestBuf): TDigestBuf = {
    val n = b.means.length + b.bufLen
    if (n == 0) return b // n == 0 implies bufLen == 0 — nothing to reset
    val idx = Array.range(0, n)
    val ms = new Array[Double](n)
    System.arraycopy(b.means, 0, ms, 0, b.means.length)
    System.arraycopy(b.buf, 0, ms, b.means.length, b.bufLen)
    val ws = new Array[Double](n)
    System.arraycopy(b.weights, 0, ws, 0, b.weights.length)
    java.util.Arrays.fill(ws, b.weights.length, n, 1.0) // buffered weight = 1
    val order = idx.sortBy(ms(_))
    val total = ws.sum
    val outM = Array.newBuilder[Double]
    val outW = Array.newBuilder[Double]
    var curM = ms(order(0)); var curW = ws(order(0))
    var wSoFar = 0.0
    var kLo = kOf(0.0, b.compression)
    var i = 1
    while (i < n) {
      val m = ms(order(i)); val w = ws(order(i))
      val proposed = (wSoFar + curW + w) / total
      if (kOf(proposed, b.compression) - kLo <= 1.0) {
        // merge into current centroid (weighted mean)
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW
        wSoFar += curW
        kLo = kOf(wSoFar / total, b.compression)
        curM = m; curW = w
      }
      i += 1
    }
    outM += curM; outW += curW
    // the scratch array is DROPPED, not handed back: the product encoder
    // serializes `buf` in full, so keeping the 512-slot array would ship
    // ~4KB of dead tail per group through every partial-agg exchange and
    // spill. add() re-allocates the scratch lazily — once per 512 rows,
    // amortized noise
    TDigestBuf(b.compression, outM.result(), outW.result(), Array.empty, 0)
  }

  /** Quantile estimate with linear interpolation between centroid means. */
  def quantile(b0: TDigestBuf, q: Double): Double = {
    val b = compress(b0)
    val n = b.means.length
    if (n == 0) return Double.NaN
    if (n == 1) return b.means(0)
    val total = b.weights.sum
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val w = b.weights(i)
      val centroidCum = cum + w / 2.0
      if (target < centroidCum) {
        if (i == 0) return b.means(0)
        val prevCum = cum - b.weights(i - 1) / 2.0
        val frac = (target - prevCum) / (centroidCum - prevCum)
        return b.means(i - 1) + frac * (b.means(i) - b.means(i - 1))
      }
      cum += w
      i += 1
    }
    b.means(n - 1)
  }
}

/** Aggregator producing quantiles at the requested probabilities. */
class TDigestAggregator(ps: Seq[Double], compression: Double = TDigest.DefaultCompression)
    extends Aggregator[NumIn, TDigestBuf, Seq[Double]] {
  def zero: TDigestBuf = TDigest.empty(compression)
  def reduce(b: TDigestBuf, in: NumIn): TDigestBuf =
    in.v.map(x => TDigest.add(b, x.toDouble)).getOrElse(b)
  def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = TDigest.merge(a, b)
  def finish(b: TDigestBuf): Seq[Double] = ps.map(p => TDigest.quantile(b, p))
  def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
  def outputEncoder: Encoder[Seq[Double]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TDigestAggregator {
  def quantiles(c: Column, ps: Seq[Double]): Column = {
    val u = udaf(new TDigestAggregator(ps), Encoders.product[NumIn])
    u(c.cast("long"))
  }
}
