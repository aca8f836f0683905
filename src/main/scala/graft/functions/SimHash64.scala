package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a feature array — the hot-path form of
  * [[graft.extensions.Dedup.simHash]].
  *
  * Bit-for-bit equivalent to the declarative construction (md5 hex →
  * nibble → per-bit vote; the DuckDB oracle of q_dedup_simhash proves
  * the equivalence on real data): bit b of the fingerprint is set iff
  * the sum over features of (2·bit_b(md5(feature)) − 1) is positive,
  * where bit_b reads nibble b/4 of the hex digest, bit b%4.
  *
  * Why an Expression: the declarative form explodes |features| × 64 rows
  * through two aggregations; this computes the whole fingerprint in one
  * pass over the array per ROW — no generator, no shuffle beyond the
  * per-doc collect. Codegen emits a single static call per row (the win
  * is structural, not instruction-level). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** One pass: md5 each feature, vote all 64 bits, assemble. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = digests.get()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          val hexChar = b >> 2                       // nibble index in hex string
          val byte = d(hexChar >> 1) & 0xff
          val nib = if ((hexChar & 1) == 0) (byte >> 4) & 0xf else byte & 0xf
          votes(b) += (((nib >> (b & 3)) & 1) << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) h |= 1L << b
      b += 1
    }
    h
  }
}
