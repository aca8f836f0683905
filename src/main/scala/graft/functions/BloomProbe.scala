package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe against a BROADCAST VARIABLE — the
  * scale-safe sibling of Spark's `BloomFilterMightContain`, whose filter
  * argument must be a foldable expression and therefore rides the
  * logical plan as a serialized byte literal. A multi-MB literal is
  * copied on every plan transform, rendered into plan strings, and
  * re-shipped with every stage's task binary; a `Broadcast[BloomFilter]`
  * is a scalar handle in the plan and the bitset moves to each executor
  * ONCE over the torrent protocol, shared by all stages and all tasks.
  *
  * The broadcast cannot pass through the function registry (builders see
  * only argument Expressions), so [[graft.extensions.Membership]]
  * registers a throwaway builder that CAPTURES the broadcast, resolves
  * it into the plan (DataFrame analysis is eager), and drops the
  * registry entry immediately — the expression instance in the analyzed
  * plan keeps the only reference. */
case class BloomProbe(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects a 64-bit hash (long), got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    bf.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle (not the bitset) lands in the codegen
    // references array; executors dereference it once per task
    val bfRef = ctx.addReferenceObj("bloomBc", bf,
      "org.apache.spark.broadcast.Broadcast")
    val filterClass = classOf[BloomFilter].getName
    defineCodeGen(ctx, ev, c =>
      s"(($filterClass) $bfRef.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
