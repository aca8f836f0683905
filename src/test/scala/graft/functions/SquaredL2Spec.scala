package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SquaredL2Spec extends SparkSpec {
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private lazy val vecs = {
    GraftFunctions.register(spark)
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.1, -0.2), Seq(-0.3, 0.4)),
      (3L, Seq.empty[Double], Seq.empty[Double]))
      .toDF("id", "a", "b")
  }

  test("native squared_l2 equals the zip_with/aggregate fold bitwise") {
    val out = vecs.select(
      call_function("squared_l2", $"a", $"b").as("native"),
      hof($"a", $"b").as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0, r)
    }
  }

  test("null element and length mismatch yield NULL, like the HOF form") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)),
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
      .select(
        call_function("squared_l2",
          $"a".cast("array<double>"), $"b".cast("array<double>")).as("native"),
        hof($"a".cast("array<double>"), $"b".cast("array<double>")).as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), r)
    }
  }

  test("SQL surface: squared_l2 callable after registration") {
    vecs.createOrReplaceTempView("l2_vecs")
    val r = spark.sql("SELECT squared_l2(a, b) AS d FROM l2_vecs WHERE id = 1").head()
    assert(r.getDouble(0) == 27.0)
  }
}
