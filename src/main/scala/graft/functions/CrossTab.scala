package graft.functions

/** Cross-tab association statistics (ref AggregateFunctions/CrossTab.h):
  * shared state = total count + per-value histograms of both arguments +
  * the pair histogram; merges are map-unions so partial aggregation
  * holds. `kind` picks the finisher: cramersV (sqrt(phi2/(q-1))),
  * cramersVBiasCorrected, theilsU (entropy-based; the reference's sign
  * convention is negative), contingency (sqrt(phi2/(phi2+n))). Category
  * identity is the value's text form — the reference hashes values, so
  * both sides group equal values together.
  */
case class CrossTabBuf(count: Long, a: Map[String, Long],
    b: Map[String, Long], ab: Map[String, Long])

class CrossTabAgg(kind: String) extends org.apache.spark.sql.expressions
    .Aggregator[(String, String), CrossTabBuf, Double] {
  private def bump(m: Map[String, Long], k: String, v: Long = 1L) =
    m.updated(k, m.getOrElse(k, 0L) + v)
  // length-prefixed composite key: a category value containing the
  // would-be separator must not shift the split point
  private def pairKey(a: String, b: String) = a.length + ":" + a + b
  private def splitKey(k: String): (String, String) = {
    val c = k.indexOf(':')
    val n = k.substring(0, c).toInt
    (k.substring(c + 1, c + 1 + n), k.substring(c + 1 + n))
  }
  override def zero: CrossTabBuf =
    CrossTabBuf(0L, Map.empty, Map.empty, Map.empty)
  override def reduce(buf: CrossTabBuf, x: (String, String)): CrossTabBuf =
    if (x._1 == null || x._2 == null) buf
    else CrossTabBuf(buf.count + 1, bump(buf.a, x._1), bump(buf.b, x._2),
      bump(buf.ab, pairKey(x._1, x._2)))
  override def merge(x: CrossTabBuf, y: CrossTabBuf): CrossTabBuf =
    CrossTabBuf(x.count + y.count,
      y.a.foldLeft(x.a) { case (m, (k, v)) => bump(m, k, v) },
      y.b.foldLeft(x.b) { case (m, (k, v)) => bump(m, k, v) },
      y.ab.foldLeft(x.ab) { case (m, (k, v)) => bump(m, k, v) })
  private def phiSquared(buf: CrossTabBuf): Double = {
    var chi = 0.0
    for ((k, vab) <- buf.ab) {
      val (ka, kb) = splitKey(k)
      val va = buf.a(ka).toDouble
      val vb = buf.b(kb).toDouble
      val expected = va * vb / buf.count
      val d = vab - expected
      chi += d * d / expected
    }
    chi / buf.count
  }
  override def finish(buf: CrossTabBuf): Double = {
    if (buf.count < 2) return Double.NaN
    kind match {
      case "cramersV" =>
        val q = math.min(buf.a.size, buf.b.size)
        math.sqrt(phiSquared(buf) / (q - 1))
      case "cramersVBiasCorrected" =>
        val phi = phiSquared(buf)
        val aAdj = buf.a.size - 1.0
        val bAdj = buf.b.size - 1.0
        val nAdj = buf.count - 1.0
        var res = math.max(0.0, phi - aAdj * bAdj / nAdj)
        val corrA = buf.a.size - aAdj * aAdj / nAdj
        val corrB = buf.b.size - bAdj * bAdj / nAdj
        res /= math.min(corrA, corrB) - 1
        math.sqrt(res)
      case "theilsU" =>
        var hA = 0.0
        for ((_, v) <- buf.a)
          hA += (v.toDouble / buf.count) * math.log(v.toDouble / buf.count)
        var dep = 0.0
        for ((k, vab) <- buf.ab) {
          val vb = buf.b(splitKey(k)._2).toDouble
          dep += (vab.toDouble / buf.count) * math.log(vab / vb)
        }
        val res = (dep - hA) / hA
        // dep >= hA (conditional entropy bound) and hA < 0, so the true
        // value is always <= 0; summation noise can flip the sign of an
        // exact zero — clamp to the reference's -0
        if (res > 0.0) -0.0 else res
      case _ => // contingency
        val phi = phiSquared(buf)
        math.sqrt(phi / (phi + buf.count))
    }
  }
  override def bufferEncoder: org.apache.spark.sql.Encoder[CrossTabBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
