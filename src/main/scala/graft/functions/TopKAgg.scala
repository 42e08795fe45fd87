package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => CC, expression => EE}
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a real AGGREGATE (map-side partial
  * combine), for the exact ANN tier: ranking n·|q| scored pairs through
  * a row_number window shuffles every pair; aggregating them with a
  * k-bounded buffer shuffles only partitions·|q| buffers of ≤k entries.
  * Order: score DESC, id ASC (ids are distinct, so the order is total
  * and the result deterministic — same contract as the window form).
  *
  * Native TypedImperativeAggregate over primitive arrays (double[] +
  * long[], flat ByteBuffer serde) — a Scala Aggregator with kryo
  * buffers costs ~30% wall-clock on the bench from per-row boxing. The
  * buffer holds at most 4k entries between trims, so update is O(1)
  * amortized with one partial sort per 3k inserts. */
object TopKAgg {

  final class Buf(val k: Int) {
    var n = 0
    var scores = new Array[Double](math.max(4 * k, 8))
    var ids = new Array[Long](math.max(4 * k, 8))
    def add(s: Double, id: Long): Unit = {
      if (n == scores.length) trim()
      scores(n) = s; ids(n) = id; n += 1
    }
    /** Keep only the best k (score desc, id asc). */
    def trim(): Unit = if (n > k) {
      val idx = Array.range(0, n).sortBy(i => (-scores(i), ids(i)))
      val s2 = new Array[Double](scores.length)
      val i2 = new Array[Long](ids.length)
      var j = 0
      while (j < k) { s2(j) = scores(idx(j)); i2(j) = ids(idx(j)); j += 1 }
      scores = s2; ids = i2; n = k
    }
  }

  case class BoundedTopK(score: Expression, id: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("_1", DoubleType, nullable = false),
      StructField("_2", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "bounded_top_k"

    override def createAggregationBuffer(): Buf = new Buf(k)

    override def update(b: Buf, input: InternalRow): Buf = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
      b
    }

    override def merge(b: Buf, o: Buf): Buf = {
      var j = 0
      while (j < o.n) { b.add(o.scores(j), o.ids(j)); j += 1 }
      b
    }

    override def eval(b: Buf): Any = {
      b.trim()
      val idx = Array.range(0, b.n).sortBy(i => (-b.scores(i), b.ids(i)))
      new GenericArrayData(idx.take(k).map(i =>
        InternalRow(b.scores(i), b.ids(i))): Array[Any])
    }

    override def serialize(b: Buf): Array[Byte] = {
      b.trim()
      val bb = ByteBuffer.allocate(4 + b.n * 16)
      bb.putInt(b.n)
      var j = 0
      while (j < b.n) { bb.putDouble(b.scores(j)); bb.putLong(b.ids(j)); j += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new Buf(k)
      var j = 0
      while (j < n) { b.add(bb.getDouble, bb.getLong); j += 1 }
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): BoundedTopK =
      copy(score = cs(0), id = cs(1))
  }

  /** topK(k)(score, id) → array<struct<_1: score, _2: id>> of the k best
    * (score desc, id asc) rows in the group. */
  def topK(k: Int)(score: Column, id: Column): Column =
    CC(BoundedTopK(EE(score), EE(id), k)
      .toAggregateExpression(isDistinct = false))
}
