package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The broadcast centroid table of [[NearestCell]]: parallel primitive
  * arrays (no per-centroid tuple unboxing in the k×dim inner loop),
  * REQUIRED sorted ascending by cell id so the fold's keep-the-incumbent
  * tie-break means "smallest cell_id". `norms` is only read in cosine
  * mode. */
case class CentTable(ids: Array[Int], vecs: Array[Array[Double]],
                     norms: Array[Double])

/** Nearest-centroid argmin/argmax against a BROADCAST centroid table —
  * the k-scalable form of the inlined-literal fold in
  * [[graft.extensions.KMeans.assign]] / ivfSearch's index build.
  *
  * The typedLit formulation is zero-shuffle and correct, but the k×dim
  * table rides the LOGICAL PLAN: copied on every plan transform,
  * re-serialized into every stage's task binary, and scored through
  * interpreted HOF lambdas — fine at k=64, a tens-of-MB plan tax at the
  * IVF-realistic 4k–65k cells. Here the table is a `Broadcast` handle
  * (shipped to each executor once, shared by all tasks — the
  * [[BloomProbe]] discipline) and the k×dim inner loop is one fused
  * native pass per row.
  *
  * SEMANTICS ARE BIT-FOR-BIT the declarative fold's (pinned in
  * NearestCellSpec and Round8OpsSpec's windowed reference):
  *  - centroids are scanned in ascending cell_id order; L2 keeps the
  *    incumbent on ties (strict `<` vs an init of Double.MaxValue),
  *    cosine likewise (strict `>` vs -Infinity) — ties break to the
  *    smallest cell_id;
  *  - comparisons use Spark's NaN-largest ordering (a NaN cosine beats
  *    -Infinity, a NaN distance never beats MaxValue), and -0.0 == 0.0;
  *  - a NULL per-centroid score — length mismatch, NULL element, or a
  *    zero cosine denominator under `try_divide` semantics — skips
  *    that centroid (`when(score < acc)` with a NULL predicate keeps
  *    the incumbent). The try_divide choice is DELIBERATE where it
  *    diverges from the replaced fold: under Spark 4's default ANSI
  *    mode a plain `/` fails the WHOLE JOB the first time a zero-norm
  *    vector meets a centroid — at 100 TB a zero-norm row is data to
  *    quarantine (it exits via the -1 filter), not a job-fatal
  *    arithmetic error. Non-degenerate scores are unaffected;
  *  - a row with no scoring centroid at all returns the -1 sentinel,
  *    which callers filter (degenerate-row quarantine).
  *
  * @param vec    array<double> vector column
  * @param nrm    the row's L2 norm (cosine mode; pass 0.0 for L2 mode)
  * @param cents  broadcast centroid table, sorted by cell id
  * @param cosine true → argmax of dot/(nrm·cnrm); false → argmin of
  *               squared L2 (norms unused)
  */
case class NearestCell(
    vec: Expression,
    nrm: Expression,
    cents: Broadcast[CentTable],
    cosine: Boolean)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = nrm
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, nrm.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_cell expects (array<double>, double), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(v: Any, n: Any): Any =
    NearestCell.nearest(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], cents.value, cosine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast HANDLE lands in the codegen references array;
    // executors dereference the table once per task, never per row
    val bcRef = ctx.addReferenceObj("centsBc", cents,
      "org.apache.spark.broadcast.Broadcast")
    val cos = if (cosine) "true" else "false"
    nullSafeCodeGen(ctx, ev, (v, n) => {
      s"""
      ${ev.value} = graft.functions.NearestCell.nearest(
        $v, $n, (graft.functions.CentTable) $bcRef.value(), $cos);
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(vec = newLeft, nrm = newRight)
}

object NearestCell {

  /** Spark's `<` on doubles: NaN sorts largest, -0.0 == 0.0. */
  private def lt(a: Double, b: Double): Boolean =
    if (a.isNaN) false
    else if (b.isNaN) true
    else a < b

  /** One fused pass over the centroid table; see the case-class scaladoc
    * for the exact fold semantics being replicated. */
  def nearest(v: ArrayData, nrm: Double, t: CentTable, cosine: Boolean): Int = {
    val n = v.numElements()
    var bestCell = -1
    var bestScore = if (cosine) Double.NegativeInfinity else Double.MaxValue
    var c = 0
    while (c < t.ids.length) {
      val ce = t.vecs(c)
      if (ce.length == n) {
        // strict left-to-right fold — SquaredL2/DotProduct's order, so
        // scores match the HOF/native expressions bit for bit
        var acc = 0.0
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (v.isNullAt(i)) ok = false
          else {
            val x = v.getDouble(i)
            if (cosine) acc += x * ce(i)
            else { val d = x - ce(i); acc += d * d }
            i += 1
          }
        }
        if (ok) {
          if (cosine) {
            val den = nrm * t.norms(c)
            // try_divide: zero divisor → NULL score → skip centroid
            // (see scaladoc — deliberate vs ANSI-mode job failure)
            if (den != 0.0) {
              val s = acc / den
              if (lt(bestScore, s)) { bestCell = t.ids(c); bestScore = s }
            }
          } else if (lt(acc, bestScore)) { bestCell = t.ids(c); bestScore = acc }
        }
      }
      c += 1
    }
    bestCell
  }

  private val exprId = new java.util.concurrent.atomic.AtomicLong(0)

  /** Column-level entry point: broadcasts the (sorted) centroid table
    * and resolves a [[NearestCell]] into the plan through a throwaway
    * function-registry builder (the [[graft.extensions.Membership]]
    * seam — builders are the one public path that lets a captured
    * broadcast become an Expression; DataFrame analysis is eager, so
    * the temp registration is dropped before returning). The broadcast
    * is bounded (k×dim doubles) and unreferenced once the consuming
    * frames are — the ContextCleaner reclaims it; per-iteration Lloyd
    * callers lean on that rather than explicit destroy, since the
    * returned plan stays lazily re-executable. */
  def nearestCellCol(
      df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Array[Double], Double)],
      cosine: Boolean,
      vec: org.apache.spark.sql.Column,
      nrm: org.apache.spark.sql.Column)(
      build: org.apache.spark.sql.Column => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val sorted = cents.sortBy(_._1)
    val table = CentTable(sorted.map(_._1).toArray,
      sorted.map(_._2).toArray, sorted.map(_._3).toArray)
    val bc = spark.sparkContext.broadcast(table)
    val fname = s"graft_nearest_cell_${exprId.incrementAndGet()}"
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      fname, args => NearestCell(args.head, args(1), bc, cosine), "built-in")
    try build(org.apache.spark.sql.functions.call_function(fname, vec, nrm))
    finally registry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(fname))
  }
}
