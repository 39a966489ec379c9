package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** simhash32(tokens: ARRAY<STRING>) -> BIGINT — 32-bit SimHash for near-dup
  * detection over token arrays, as a native Catalyst expression (codegen'd)
  * so the per-token hashing loop stays in generated code rather than a
  * boxed Scala UDF.
  *
  * Spec (integer-exact, mirrored by the DuckDB oracle in
  * graft.queries.PipelineQueries.qSimhash):
  *   h(t)  = fold over characters: h = (h*31 + codepoint) mod 1e9+7
  *   g(t)  = (h(t) * 2654435761) mod 2^32          (Knuth multiplicative)
  *   vote_j = sum over tokens of ((g>>j)&1)==1 ? +1 : -1   for j in 0..31
  *   result = sum of 2^j over j where vote_j > 0
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash32 expects ARRAY<STRING>, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash32.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SimHash32.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 = copy(newChild)
  override def prettyName: String = "simhash32"
}

object SimHash32 {
  private final val P = 1000000007L
  private final val KNUTH = 2654435761L
  private final val M32 = 4294967296L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var h = 0L
        var k = 0
        while (k < s.length) {
          val cp = s.codePointAt(k)
          h = (h * 31L + cp) % P
          k += Character.charCount(cp)
        }
        val g = (h * KNUTH) % M32
        var j = 0
        while (j < 32) {
          if (((g >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

}
