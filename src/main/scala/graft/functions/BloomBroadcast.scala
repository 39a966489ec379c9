package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain` over a sketch held in a torrent BROADCAST instead
  * of a plan literal — the 100 TB spelling of the Bloom prefilter
  * (`Dedup.incrementalNearDupsBloom`). A correctly sized sketch for a
  * billion-document index is GB-scale; as a foldable literal it would be
  * copied with every plan transformation the optimizer runs and serialized
  * into every task binary. Here the expression carries only the broadcast
  * HANDLE (a few bytes in the plan); executors fetch the sketch bytes once
  * each through the torrent protocol, exactly how Spark ships build-side
  * hash relations — the same plan-vs-payload split Spark's own
  * `InjectRuntimeFilter` achieves with its scalar-subquery shape.
  *
  * Deserialization (`BloomFilter.readFrom`, one long[] copy of the
  * executor-local broadcast block) happens once per expression instance —
  * once per task at worst, a memory copy dwarfed by the per-row probes it
  * enables. The probe itself stays inside whole-stage codegen: doGenCode
  * emits a direct call against the expression object, no UDF dispatch.
  *
  * Null semantics match `BloomFilterMightContain`: null input -> null.
  */
case class BloomMightContainBc(child: Expression, sketch: Broadcast[Array[Byte]])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_bc expects BIGINT, got ${other.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(sketch.value))

  def mightContain(h: Long): Boolean = bloom.mightContainLong(h)

  override def nullSafeEval(input: Any): Any = mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", this, classOf[BloomMightContainBc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain_bc"
}
