package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.KMeans

/** NearestCell replaces the round-8 typedLit argmin/argmax fold: the
  * centroid table moves from a plan-embedded literal to a broadcast, so
  * the contract here is (1) bitwise agreement with the declarative fold
  * it replaced — tie-breaks, NaN ordering, zero-denominator skips,
  * degenerate -1 sentinel included — (2) identical results interpreted
  * and codegen'd, and (3) NO oversized literal in the plan (the whole
  * point of the change). */
class NearestCellSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-9 declarative L2 fold, kept as the semantic oracle. */
  private def foldL2(cents: Seq[(Int, Seq[Double])]) = {
    val scored = transform(typedLit(cents.sortBy(_._1)), c => struct(
      c.getField("_1").as("cell_id"),
      aggregate(zip_with(col("e"), c.getField("_2"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x).as("d2")))
    aggregate(scored,
      struct(lit(-1).as("cell_id"), lit(Double.MaxValue).as("d2")),
      (acc, s) => when(s.getField("d2") < acc.getField("d2"), s).otherwise(acc))
      .getField("cell_id")
  }

  /** The pre-round-9 declarative cosine fold — with `try_divide` where
    * the original wrote `/`: under Spark 4's default ANSI mode the
    * plain division FAILS THE JOB on a zero-norm vector, which is
    * exactly the hazard NearestCell's documented try_divide semantics
    * remove; on every non-degenerate row the two are identical. */
  private def foldCos(cents: Seq[(Int, Seq[Double], Double)]) = {
    val scored = transform(typedLit(cents.sortBy(_._1)), c => struct(
      c.getField("_1").as("cell_id"),
      try_divide(aggregate(zip_with(col("e"), c.getField("_2"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x), col("nrm") * c.getField("_3"))
        .as("csim")))
    aggregate(scored,
      struct(lit(-1).as("cell_id"), lit(Double.NegativeInfinity).as("csim")),
      (acc, s) => when(s.getField("csim") > acc.getField("csim"), s).otherwise(acc))
      .getField("cell_id")
  }

  private def nearestL2(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Array[Double])]) =
    NearestCell.nearestCellCol(df,
      cents.map { case (id, v) => (id, v, 0.0) },
      cosine = false, col("e"), lit(0.0)) { nearest =>
      df.select(col("vec_id"), nearest.as("cell_id"))
    }

  test("L2 argmin agrees with the typedLit fold on every row, ties and degenerates included") {
    val cents = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0),
      2 -> Array(0.0, 1.0)) // 1 and 2 identical: tie must pick 1
    val rows = Seq(
      (1L, Seq[java.lang.Double](0.9, 0.1)),
      (2L, Seq[java.lang.Double](0.1, 0.9)), // ties cell 1 vs 2 -> 1
      (3L, Seq[java.lang.Double](0.5, 0.5)), // ties cell 0 vs 1 -> 0
      (4L, Seq[java.lang.Double](1.0, null)), // null element -> -1
      (5L, Seq[java.lang.Double](1.0, 2.0, 3.0))) // dim mismatch -> -1
      .toDF("vec_id", "raw")
      .select(col("vec_id"), col("raw").cast("array<double>").as("e"))
      .localCheckpoint() // distributed input: keep the expressions in the physical plan
    val native = nearestL2(rows, cents.map { case (i, v) => (i, v) })
      .as[(Long, Int)].collect().toMap
    val oracle = rows.select(col("vec_id"),
      foldL2(cents.map { case (i, v) => (i, v.toSeq) }).as("cell_id"))
      .as[(Long, Int)].collect().toMap
    assert(native == oracle)
    assert(native(2L) == 1 && native(3L) == 0, "ties break to the smallest cell_id")
    assert(native(4L) == -1 && native(5L) == -1, "degenerate rows carry the sentinel")
  }

  test("cosine argmax agrees with the typedLit fold: zero norms skip (null-divide), NaN sorts largest") {
    val cents = Seq(
      (0, Seq(1.0, 0.0), 1.0),
      (1, Seq(0.0, 1.0), 1.0),
      (2, Seq(0.0, 0.0), 0.0)) // zero-norm centroid: divisor 0 -> skipped
    val rows = Seq(
      (1L, Seq(2.0, 0.1)),
      (2L, Seq(0.1, 2.0)),
      (3L, Seq(0.0, 0.0)), // zero-norm row: every divisor 0 -> -1
      (4L, Seq(Double.NaN, 1.0))) // NaN cosines: NaN > -Inf, first wins
      .toDF("vec_id", "e")
      .withColumn("e", col("e").cast("array<double>"))
      .withColumn("nrm", sqrt(aggregate(zip_with(col("e"), col("e"),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)))
      .localCheckpoint()
    val native = NearestCell.nearestCellCol(rows,
      cents.map { case (i, v, n) => (i, v.toArray, n) },
      cosine = true, col("e"), col("nrm")) { nearest =>
      rows.select(col("vec_id"), nearest.as("cell_id"))
    }.as[(Long, Int)].collect().toMap
    val oracle = rows.select(col("vec_id"), foldCos(cents).as("cell_id"))
      .as[(Long, Int)].collect().toMap
    assert(native == oracle)
    assert(native(3L) == -1, "all-zero divisors leave the sentinel")
    assert(native(4L) == 0, "NaN beats -Inf once; later NaNs don't displace it")
  }

  test("interpreted and codegen paths agree") {
    val cents = (0 until 16).map(i => (i, Array(i.toDouble, 1.0, -i.toDouble)))
    val rows = spark.range(200).select(col("id").as("vec_id"),
      array(col("id") % 7, col("id") % 5, col("id") % 3)
        .cast("array<double>").as("e"))
      .localCheckpoint()
    def run() = nearestL2(rows, cents).as[(Long, Int)].collect().toMap
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(codegen == interpreted)
  }

  test("the centroid table rides a broadcast, not a plan literal; registry entry is dropped") {
    // a table big enough (k=4096 x dim 8) that a literal regression
    // would be unmissable in the analyzed plan's expression tree
    val cents = (0 until 4096).map(i => (i, Array.fill(8)(i * 0.001)))
    val rows = spark.range(100).select(col("id").as("vec_id"),
      array((0 until 8).map(j => (col("id") % (j + 2)).cast("double")): _*)
        .as("e")).localCheckpoint()
    val df = nearestL2(rows, cents)
    val exprs = df.queryExecution.analyzed
      .collect { case n => n.expressions }.flatten
      .flatMap(e => e.collect { case x => x })
    assert(exprs.exists(_.isInstanceOf[NearestCell]),
      "NearestCell expression missing from analyzed plan")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bigLits = exprs.collect {
      case l: Literal if l.dataType.simpleString.length > 40 => l.dataType.simpleString
      case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData, _)
        if v.numElements() > 256 => s"array literal of ${v.numElements()}"
    }
    assert(bigLits.isEmpty, s"centroid-sized literals embedded in plan: $bigLits")
    assert(df.count() == 100)
    val leaked = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).filter(_.startsWith("graft_nearest_cell"))
    assert(leaked.isEmpty, leaked.mkString(","))
  }

  test("KMeans.assign drops degenerate rows instead of emitting a -1 cell") {
    val emb = Seq(
      (1L, Seq[java.lang.Double](1.0, 0.0)),
      (2L, Seq[java.lang.Double](0.0, 1.0)),
      (3L, Seq[java.lang.Double](null, 1.0))) // null element: unassignable
      .toDF("vec_id", "raw")
      .select(col("vec_id"), col("raw").cast("array<float>").as("embedding"))
    val cents = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
      .toDF("cell_id", "centroid")
    val got = KMeans.assign(emb, cents)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1), s"row 3 must be quarantined, got $got")
  }
}
