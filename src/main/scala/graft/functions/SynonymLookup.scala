package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for dictionary canonicalization — the
  * reference's `search_synonim` (001_….ipynb:946-950): token → canonical
  * skill, NULL when absent (the reference returns 0 and filters, :951-952).
  *
  * `dict` must be a foldable map literal (e.g. `typedlit(Map(...))`): it is
  * evaluated ONCE at plan time into a java.util.HashMap that codegen
  * references directly — each row costs one hash probe inside whole-stage
  * codegen, no UDF serialization, no per-row map materialization. This is
  * the UDF-surface exemplar of SURVEY §2.10: prefer built-ins, then a
  * native Expression, and only then a Scala UDF.
  */
case class SynonymLookup(token: Expression, dict: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(token, dict)

  override def checkInputDataTypes(): TypeCheckResult =
    (token.dataType, dict.dataType) match {
      case (StringType, MapType(StringType, StringType, _)) if dict.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"synonym_lookup expects (string, literal map<string,string>), got " +
            s"(${token.dataType.simpleString}, ${dict.dataType.simpleString}, foldable=${dict.foldable})")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "synonym_lookup"

  /** A literal token folds at plan time (Catalyst ConstantFolding calls
    * eval once and inlines the result). */
  override def foldable: Boolean = token.foldable && dict.foldable

  @transient private lazy val table: java.util.HashMap[UTF8String, UTF8String] = {
    require(dict.foldable, "synonym_lookup dictionary must be a literal map")
    val m = new java.util.HashMap[UTF8String, UTF8String]()
    val md = dict.eval(null).asInstanceOf[MapData]
    if (md != null) {
      val keys = md.keyArray()
      val vals = md.valueArray()
      var i = 0
      while (i < md.numElements()) {
        m.put(keys.getUTF8String(i), vals.getUTF8String(i))
        i += 1
      }
    }
    m
  }

  override def eval(input: InternalRow): Any = {
    val t = token.eval(input)
    if (t == null) null else table.get(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("synTable", table, "java.util.HashMap")
    val childGen = token.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = (UTF8String) $tableRef.get(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(token = newChildren(0), dict = newChildren(1))
}
