package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Input wrapper so nullable numeric columns flow through a typed
  * Aggregator (a bare Long encoder would NPE on null). */
final case class NumIn(v: Option[Long])

final case class StatsBuf(
    n: Long,         // all rows
    nulls: Long,     // null rows
    min: Long,       // valid iff n > nulls
    max: Long,
    sum: Long)

final case class NumStats(
    n_rows: Long,
    n_nulls: Long,
    min_v: Option[Long],
    max_v: Option[Long],
    sum_v: Long)

/** Per-column count / null-count / min / max / sum as a typed `Aggregator`
  * (north_star: "per-column stats via typed Aggregator"). Spark's aggregate
  * pipeline supplies the partial (map-side) + final merge — the distributed
  * analogue of the reference walking one string once (json_parser.py:96-99).
  *
  * Mean is derived downstream as sum/count so the DuckDB oracle can
  * reproduce it bit-for-bit (integer sums are exact; a streaming average
  * would not be).
  */
class StatsAggregator extends Aggregator[NumIn, StatsBuf, NumStats] {
  def zero: StatsBuf = StatsBuf(0L, 0L, Long.MaxValue, Long.MinValue, 0L)

  def reduce(b: StatsBuf, in: NumIn): StatsBuf = in.v match {
    case None => b.copy(n = b.n + 1, nulls = b.nulls + 1)
    case Some(x) =>
      StatsBuf(b.n + 1, b.nulls, math.min(b.min, x), math.max(b.max, x), b.sum + x)
  }

  def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
    StatsBuf(a.n + b.n, a.nulls + b.nulls,
      math.min(a.min, b.min), math.max(a.max, b.max), a.sum + b.sum)

  def finish(b: StatsBuf): NumStats = {
    val hasVals = b.n > b.nulls
    NumStats(b.n, b.nulls,
      if (hasVals) Some(b.min) else None,
      if (hasVals) Some(b.max) else None,
      b.sum)
  }

  def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  def outputEncoder: Encoder[NumStats] = Encoders.product[NumStats]
}

object StatsAggregator {
  /** Column-API entry: `numStats(col("sr_hz"))` → struct(n_rows, n_nulls, min_v, max_v, sum_v). */
  def numStats(c: Column): Column = {
    val u = udaf(new StatsAggregator(), Encoders.product[NumIn])
    u(c.cast("long"))
  }
}
