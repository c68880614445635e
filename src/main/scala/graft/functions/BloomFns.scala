package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `mightContainLong` over a BROADCAST Bloom filter — the probe the
  * seen-store prefilter ([[graft.ml.Dedup.dropSeenStore]]) and the
  * benchmark-decontamination pass ([[graft.ml.DatasetOps
  * .bloomDecontaminate]]) run per row.
  *
  * Why not Spark's own `BloomFilterMightContain`: it takes the
  * SERIALIZED filter as a child expression, which in practice means a
  * `lit(bytes)` plan literal — and a plan literal rides inside EVERY
  * stage's serialized task binary that references the filter (the r18
  * driver bench logged `Broadcasting large task binary with size
  * 2.5 MiB` repeatedly: the store sidecar's 2^20-item sizing floor is
  * ~1.2 MB serialized, and three stages carried it — at a 10^8-item
  * store the filter is ~115 MB and the literal form is structurally
  * impossible). The pre-r19 fallback for big filters was a Scala UDF
  * over a broadcast — which fixed shipping but broke whole-stage
  * codegen on the probe path.
  *
  * This expression takes the [[Broadcast]] HANDLE instead: the task
  * binary carries bytes, executors fetch the filter once each (torrent
  * broadcast), and the probe stays inside whole-stage codegen. The
  * handle is resolved once per generated-class instance (a mutable
  * state slot initialized from the broadcast in `init`), so the per-row
  * work is exactly the same hash probes as the literal form — no
  * `Broadcast.value` synchronization on the row path.
  *
  * Null semantics: null hash → false (never null). The two call sites
  * use the probe under `filter`/`exists`, where Spark's literal form
  * (nullable) and this form agree: a null-keyed row is not a candidate
  * either way.
  */
case class BloomMightContainBcast(bcast: Broadcast[BloomFilter],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain_bcast"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a LONG hash child, got ${child.dataType.sql}")

  @transient private lazy val filter: BloomFilter = bcast.value

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("bloomBcast", bcast,
      classOf[Broadcast[_]].getName)
    // resolved once in the generated class's init — the row path never
    // touches Broadcast.value (a synchronized read)
    val filterVar = ctx.addMutableState(bfClass, "bloomFilter",
      v => s"$v = ($bfClass) $ref.value();")
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        boolean ${ev.value} = !${c.isNull} && $filterVar.mightContainLong(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
