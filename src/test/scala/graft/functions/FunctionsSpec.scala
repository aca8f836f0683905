package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SynonymLookupSpec extends SparkSpec {
  import spark.implicits._

  private val dict = typedlit(Map("py" -> "python", "js" -> "javascript"))

  test("maps via literal dictionary; misses and null input → null") {
    GraftFunctions.register(spark)
    val out = Seq("py", "js", "rust", null).toDF("t")
      .select(call_function("synonym_lookup", $"t", dict)).as[String].collect()
    assert(out.toSeq == Seq("python", "javascript", null, null))
  }

  test("works in SQL via extensions-style registration") {
    GraftFunctions.register(spark)
    Seq("py").toDF("t").createOrReplaceTempView("syn_in")
    val out = spark.sql(
      "SELECT synonym_lookup(t, map('py', 'python')) FROM syn_in").as[String].head()
    assert(out == "python")
  }

  test("codegen and interpreted paths agree") {
    GraftFunctions.register(spark)
    val df = Seq("py", "zz").toDF("t")
      .select(call_function("synonym_lookup", $"t", dict).as("c"))
    val codegen = df.collect().map(_.getString(0))
    // force interpreted eval through the expression directly
    val e = SynonymLookup(
      org.apache.spark.sql.catalyst.expressions.Literal.create("py"),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Map("py" -> "python"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
    assert(e.eval(null).toString == "python")
    assert(codegen.toSeq == Seq("python", null))
  }

  test("literal token constant-folds at plan time") {
    GraftFunctions.register(spark)
    val df = spark.range(1)
      .select(call_function("synonym_lookup", lit("py"), dict).as("c"))
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[SynonymLookup])),
      optimized.toString) // folded to Literal("python")
    assert(df.as[String].head() == "python")
  }

  test("non-foldable dictionary is rejected at analysis") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      Seq(("py", "x")).toDF("t", "v")
        .select(call_function("synonym_lookup", $"t", map($"v", $"v")))
        .collect()
    }
  }
}

class TopKByCountSpec extends SparkSpec {
  import spark.implicits._

  test("keeps global top-k ordered by (cnt desc, term), buffer bounded") {
    val data = Seq(("a", 5L), ("b", 9L), ("c", 5L), ("d", 1L), ("e", 9L))
    val ds = data.toDS()
    val top3 = ds.select(new TopKByCount(3).toColumn).head()
    assert(top3 == Seq(("b", 9L), ("e", 9L), ("a", 5L)))
  }

  test("agrees with window-function top-k on a larger frame") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 500).map(i => (s"t${rnd.nextInt(50)}", rnd.nextInt(100).toLong))
    val ds = data.toDS().groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).sum))
    val viaAgg = ds.select(new TopKByCount(5).toColumn).head()
    val viaSort = ds.toDF("term", "cnt")
      .orderBy($"cnt".desc, $"term").limit(5)
      .as[(String, Long)].collect().toSeq
    assert(viaAgg == viaSort)
  }
}
