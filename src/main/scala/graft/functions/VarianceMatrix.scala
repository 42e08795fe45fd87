package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** corrMatrix / covarSampMatrix / covarPopMatrix (ref
  * AggregateFunctions/AggregateFunctionVarianceMatrix.cpp): one pass
  * accumulating the co-moment matrix (count, per-column sums, pairwise
  * product sums), finished into the full symmetric n×n Array(Array(
  * Float64)). The partial state is O(n²) scalars — the same state the
  * reference keeps, and Spark's partial aggregation merges it map-side, so
  * one shuffle of n²+n+1 doubles per group at any data size.
  *
  * Degenerate groups follow the reference exactly: empty → nan (0/0),
  * single row → nan for corr/covarSamp, 0 for covarPop — obtained for free
  * by keeping every intermediate in IEEE Float64.
  */
object VarianceMatrix {

  private def moments(xs: Seq[Column]) = {
    val d = xs.map(_.cast("double"))
    val n = count(lit(1)).cast("double")
    val s = d.map(x => coalesce(sum(x), lit(0.0)))
    val p = d.map(xi => d.map(xj => coalesce(sum(xi * xj), lit(0.0))))
    (n, s, p)
  }

  def corrMatrix(xs: Seq[Column]): Column = {
    val (n, s, p) = moments(xs)
    val idx = xs.indices
    array(idx.map(i => array(idx.map { j =>
      (n * p(i)(j) - s(i) * s(j)) /
        sqrt((n * p(i)(i) - s(i) * s(i)) * (n * p(j)(j) - s(j) * s(j)))
    }: _*)): _*)
  }

  def covarMatrix(xs: Seq[Column], pop: Boolean): Column = {
    val (n, s, p) = moments(xs)
    val idx = xs.indices
    array(idx.map(i => array(idx.map { j =>
      val cross = p(i)(j) - s(i) * s(j) / n
      if (pop) cross / n else cross / (n - 1)
    }: _*)): _*)
  }
}
