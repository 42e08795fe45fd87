package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking primitives.
  *
  * A `rank()/row_number()/ntile() OVER (ORDER BY …)` window with no
  * PARTITION BY collapses the whole table into ONE task in Spark — fine at
  * test scale, fatal at 100 TB. These helpers express the same semantics
  * with fully parallel plans:
  *
  *  - `withRowNumber`: range-partition on the sort key (the same machinery
  *    as Spark's distributed global sort), local row_number per partition,
  *    then add per-partition offsets computed by a prefix sum over the
  *    (tiny, one-row-per-partition) count frame.
  *  - `ntile`: bucket assignment from the global row number in closed form.
  *  - `limitWithTies`: `LIMIT n WITH TIES` (reference
  *    `src/Processors/LimitTransform.h:17`) as threshold-filter — a cheap
  *    `orderBy().limit(n)` (TakeOrderedAndProject: parallel per-partition
  *    top-k) finds the nth value, then a fully parallel filter keeps every
  *    row tied with it.
  */
object GlobalRank {

  /** Distributed global row_number over the total order `order`.
    * `order` must be a total order (include a tiebreak) for deterministic
    * numbering. */
  def withRowNumber(
      df: DataFrame, order: Seq[Column], out: String = "global_rn",
      numPartitions: Int = 0): DataFrame = {
    val p =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // Range partitioning keeps equal keys together and partition ids in
    // global sort order, so (partition offset + local row_number) is the
    // global row number. The persist is a REQUIRED lineage barrier, not a
    // cache optimization: the numbered frame is read by two branches
    // (per-partition counts and the final join), and without the barrier
    // each branch may re-materialize `repartitionByRange`, whose boundary
    // sampling is seeded per RDD — two materializations can disagree on
    // partition boundaries and desynchronize pids from offsets.
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(order.map(c => c): _*)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Per-partition row count = that partition's max local row number.
    // Prefix sum over one row per partition — bounded by the partition
    // count, so the single-task window here is over a broadcast-size frame.
    val counts = local.groupBy(col("__pid")).agg(max(col("__lrn")).as("__cnt"))
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off",
        coalesce(sum(col("__cnt").cast("long")).over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn")
      .drop("__off")
  }

  /** `ntile(k) OVER (ORDER BY order)` with a distributed plan: global row
    * number (see above) + closed-form bucket assignment. Matches SQL ntile
    * exactly: the first (N mod k) buckets get ceil(N/k) rows. */
  def ntile(
      df: DataFrame, order: Seq[Column], k: Int,
      out: String = "tile"): DataFrame = {
    val rn = withRowNumber(df, order, "__rn")
    val total = df.agg(count(lit(1)).as("__n"))
    val d = rn.join(broadcast(total))
    val bsize = floor(col("__n") / k)
    val rem = col("__n") % k
    val cut = rem * (bsize + 1)
    val tile = when(col("__rn") <= cut,
        floor((col("__rn") - 1) / (bsize + 1)) + 1)
      // greatest(_,1): this branch is only reached when bsize >= 1, but
      // ANSI mode would still throw on a speculative 0 divisor when N < k.
      .otherwise(rem + floor((col("__rn") - 1 - cut) / greatest(bsize, lit(1))) + 1)
    d.withColumn(out, tile.cast("int")).drop("__rn", "__n")
  }

  /** Distributed running (inclusive) sum of `value` over the total order
    * `order` — same range-partition + per-partition scan + tiny-prefix
    * design as [[withRowNumber]]. */
  def withRunningSum(
      df: DataFrame, order: Seq[Column], value: Column, out: String,
      numPartitions: Int = 0): DataFrame = {
    val p =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__lsum", sum(col("__v")).over(wLocal))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = local.groupBy(col("__pid")).agg(sum(col("__v")).as("__psum"))
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__psum")).over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lsum"))
      .drop("__pid", "__lsum", "__off", "__v")
  }

  /** `ORDER BY key [DESC] LIMIT n WITH TIES` — equivalently
    * `rank() OVER (ORDER BY key) <= n` — as threshold + filter. */
  def limitWithTies(
      df: DataFrame, key: Column, descending: Boolean, n: Int): DataFrame = {
    val sorted = if (descending) df.orderBy(key.desc) else df.orderBy(key.asc)
    val th = sorted.limit(n)
      .agg((if (descending) min(key) else max(key)).as("__th"))
    val cond = if (descending) key >= col("__th") else key <= col("__th")
    df.join(broadcast(th), cond).drop("__th")
  }
}
