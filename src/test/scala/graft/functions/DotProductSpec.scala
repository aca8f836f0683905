package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Similarity

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    GraftFunctions.register(spark)
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.1, -0.2), Seq(-0.3, 0.4)),
      (3L, Seq.empty[Double], Seq.empty[Double]))
      .toDF("id", "a", "b")
  }

  test("native dot_product equals the zip_with/aggregate fold bitwise") {
    val out = vecs.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotHof($"a", $"b").as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0, r)
    }
  }

  test("null element and length mismatch yield NULL, like the HOF form") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)),
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
      .select(Similarity.dot($"a".cast("array<double>"), $"b".cast("array<double>")).as("native"),
        Similarity.dotHof($"a".cast("array<double>"), $"b".cast("array<double>")).as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), r)
    }
  }

  test("SQL surface: dot_product callable after registration") {
    vecs.createOrReplaceTempView("dp_vecs")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM dp_vecs WHERE id = 1").head()
    assert(r.getDouble(0) == 32.0)
  }
}
