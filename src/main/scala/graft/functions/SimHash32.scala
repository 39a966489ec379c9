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

/** simhash60(tokens: ARRAY<STRING>) -> BIGINT — the WIDE fingerprint for
  * scale (Manku et al. 2007 run 64-bit simhash with multi-bit band tables):
  * the 32-bit fingerprint caps the pigeonhole band space at 2^8 buckets
  * (4 bands x 8 bits), so candidate pairs grow as n²/256 — measured
  * super-linear at the sf1 stress (0.73s -> 35.1s, exponent 1.68/decade).
  * 60 bits give 4 bands x 15 bits = 32,768 buckets — 128x fewer candidate
  * pairs at the same guaranteed hamming<=3 recall. 60 (not 64) keeps the
  * fingerprint, its shifts and the DuckDB replay inside positive BIGINT
  * range in both engines.
  *
  * Spec extends simhash32's: per token, bits 0..31 = (poly31 * 2654435761)
  * mod 2^32 (IDENTICAL to the 32-bit fingerprint's bits), bits 32..59 =
  * (poly31 * 2246822519) mod 2^28, votes and majority as before. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash60 expects ARRAY<STRING>, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SimHash32.compute60($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 = copy(newChild)
  override def prettyName: String = "simhash60"
}

object SimHash32 {
  private final val P = 1000000007L
  private final val KNUTH = 2654435761L
  private final val KNUTH2 = 2246822519L
  private final val M32 = 4294967296L
  private final val M28 = 268435456L

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

  /** Static entry shared by interpreted eval and generated code (60-bit). */
  def compute60(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
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
        val g = ((h * KNUTH) % M32) | (((h * KNUTH2) % M28) << 32)
        var j = 0
        while (j < 60) {
          if (((g >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
