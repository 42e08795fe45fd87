package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** sparkbar(width[, min_x, max_x])(x, y) — unicode bar-chart string (ref
  * AggregateFunctions/AggregateFunctionSparkbar.h):
  *   - state: x → Σy for y > 0 only, plus min/max over EVERY added x
  *     (points with y ≤ 0 still widen the auto range);
  *   - render: `width` buckets over [from_x, to_x], bucket index
  *     min(trunc((width/Δ)·(x−from)), width−1) with Δ = to−from+1; bucket
  *     value = Σy / #points (integer division — Y is integral here, the
  *     reference's UInt64 instantiation); scaled y·7/y_max + 1 into the
  *     9-glyph ramp " ▁▂▃▄▅▆▇█"; empty points / all-zero histogram → "".
  *
  * Deterministic given the parameters, so it is spec-testable — the state
  * merges associatively (map-union + min/min, max/max), meaning partial
  * aggregation holds at any scale.
  */
case class SparkbarBuf(points: Map[Long, Long], minX: Long, maxX: Long)

class SparkbarAgg(width: Int, rangeOpt: Option[(Long, Long)])
    extends Aggregator[(Long, Long), SparkbarBuf, String] {
  require(width >= 2 && width <= 1024,
    "sparkbar width must be in range [2, 1024]")
  rangeOpt.foreach { case (a, b) =>
    require(a < b, "sparkbar min_x must be less than max_x") }

  override def zero: SparkbarBuf =
    SparkbarBuf(Map.empty, Long.MaxValue, Long.MinValue)

  override def reduce(b: SparkbarBuf, in: (Long, Long)): SparkbarBuf = {
    val (x, y) = in
    val pts = if (y > 0) b.points.updated(x, b.points.getOrElse(x, 0L) + y)
      else b.points
    SparkbarBuf(pts, math.min(b.minX, x), math.max(b.maxX, x))
  }

  override def merge(a: SparkbarBuf, b: SparkbarBuf): SparkbarBuf =
    SparkbarBuf(
      b.points.foldLeft(a.points) { case (m, (x, y)) =>
        m.updated(x, m.getOrElse(x, 0L) + y) },
      math.min(a.minX, b.minX), math.max(a.maxX, b.maxX))

  override def finish(b: SparkbarBuf): String = {
    if (b.points.isEmpty) return ""
    val fromX = rangeOpt.map(_._1).getOrElse(b.minX)
    val toX = rangeOpt.map(_._2).getOrElse(b.maxX)
    if (fromX >= toX) return "█" // degenerate range: single full bar
    val hist = Array.fill(width)(0L)
    val fhist = Array.fill(width)(0L)
    val delta = toX - fromX + 1
    for ((x, y) <- b.points if x >= fromX && x <= toX) {
      val idx = math.min(
        (width.toDouble / delta * (x - fromX)).toLong, width - 1L).toInt
      hist(idx) += y
      fhist(idx) += 1
    }
    for (i <- hist.indices if fhist(i) > 0) hist(i) /= fhist(i)
    val yMax = hist.foldLeft(0L)((m, y) => if (y > 0) math.max(m, y) else m)
    if (yMax == 0) return ""
    val bars = " ▁▂▃▄▅▆▇█"
    hist.map { y =>
      if (y <= 0) bars.charAt(0)
      else bars.charAt((y * 7 / yMax + 1).toInt)
    }.mkString
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[SparkbarBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING
}
