package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native md5-lane split: the four unsigned 32-bit lanes of md5(s) as
  * array<long> — the hot-path form of the CMS hash in
  * [[graft.extensions.Sketches]], where the declarative chain
  * (md5 → 32-char hex string → substring per seed → conv radix parse)
  * materializes a string and parses 8 hex chars per lane per token.
  *
  * Bit-for-bit equivalent to the declarative form (and therefore to
  * the DuckDB `substr(md5(tok), seed*8+1, 8)` oracles, which keep
  * matching unchanged): hex chars [8i, 8i+8) of the digest are bytes
  * [4i, 4i+4) big-endian, read unsigned. Md5LanesSpec pins the
  * equivalence property over arbitrary strings and interpreted ≡
  * codegen.
  *
  * Why an Expression: one digest, four shifts — no hex string, no
  * radix parse; measured ~2× on the bench grid build, which is the
  * per-token inner loop of every sketch in the family. */
case class Md5Lanes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_lanes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_lanes expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Lanes.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Lanes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes =
    copy(child = newChild)
}

object Md5Lanes {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val lanes = new Array[Long](4)
    var i = 0
    while (i < 4) {
      lanes(i) = ((d(4 * i) & 0xffL) << 24) |
        ((d(4 * i + 1) & 0xffL) << 16) |
        ((d(4 * i + 2) & 0xffL) << 8) |
        (d(4 * i + 3) & 0xffL)
      i += 1
    }
    ArrayData.toArrayData(lanes)
  }
}
