package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Per-task row-count guard for the block-local functions (neighbor,
  * runningDifference — ref src/Functions/neighbor.cpp,
  * runningDifference.h). Their dialect translation uses one global
  * unpartitioned window, which is the CH-parity semantics for the
  * small/sorted frames the reference tests exercise, but it collapses
  * the whole input into a single task — on a large table that silently
  * serializes the job. This pass-through expression counts the rows one
  * task sees and fails fast beyond `limit`, pointing at the scalable
  * alternative (an explicit lag/lead window with PARTITION BY).
  */
case class BlockLocalGuard(child: Expression, limit: Long, fn: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "block_local_guard"

  // fresh per task: expression trees are re-deserialized per partition
  @transient private[this] var seen = 0L

  override def eval(input: InternalRow): Any = {
    seen += 1
    if (seen > limit)
      throw new IllegalStateException(
        s"$fn() processes the whole frame in one task (CH block-local " +
          s"semantics) and exceeded graft.blockLocal.maxRows=$limit rows; " +
          "use lag()/lead() OVER (PARTITION BY ... ORDER BY ...) for " +
          "frames this size")
    child.eval(input)
  }

  override protected def withNewChildInternal(c: Expression): BlockLocalGuard =
    copy(child = c)
}
