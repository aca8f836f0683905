package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** Registration surface for graft's native expressions.
  *
  * Two paths:
  *  - [[GraftExtensions]] for session construction
  *    (`.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions`) — the
  *    idiomatic cluster deployment;
  *  - [[GraftFunctions.register]] for an already-built session (the
  *    harness driver owns the SparkSession), after which
  *    `call_function("synonym_lookup", ...)` / SQL `synonym_lookup(...)`
  *    resolve.
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "synonym_lookup" -> (args => SynonymLookup(args(0), args(1))),
    "simhash64" -> (args => SimHash64(args(0))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "squared_l2" -> (args => SquaredL2(args(0), args(1))),
    "md5_lanes" -> (args => Md5Lanes(args(0))),
    // membership probe against a pre-built broadcast Bloom filter
    // (serialized bytes literal + xxhash64 of the key) — the same
    // expression Spark's AQE runtime filter injects, exposed for
    // explicit reference-set prefilters (see extensions/Membership)
    "bloom_might_contain" -> (args => BloomFilterMightContain(args(0), args(1))))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.SynonymLookup", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.FuseExplodeCount)
    // MERGE INTO over plain relations: rewritten at resolution into the
    // full-outer-join merge plan (see MergeIntoRewrite scaladoc)
    ext.injectResolutionRule(_ => graft.plans.MergeIntoRewrite)
  }
}
