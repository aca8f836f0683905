package graft.extensions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The span-corruption invariants a denoising objective depends on:
  * sentinels are ordinal and dense, the (input, target) pair is
  * LOSSLESS (substituting each sentinel's target span back into the
  * input reproduces the original token stream), the coin is a pure
  * function of (doc_id, window), and the whole operator is one
  * shuffle-free projection. */
class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private def reconstruct(input: String, target: String): String = {
    // parse "<extra_id_j> tok tok ... <extra_id_j+1> ..." into spans
    val spans = "<extra_id_(\\d+)>".r.findAllMatchIn(target).toSeq
    val byId = spans.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < spans.size) spans(i + 1).start else target.length
      m.group(1).toInt -> target.substring(m.end, end).trim
    }.toMap
    input.split(" ").flatMap { tok =>
      "<extra_id_(\\d+)>".r.findFirstMatchIn(tok) match {
        case Some(m) =>
          byId(m.group(1).toInt).split(" ").filter(_.nonEmpty).toSeq
        case None => Seq(tok)
      }
    }.mkString(" ")
  }

  test("substituting target spans into the input reproduces every document") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val out = SpanCorrupt.corrupt(docs)
      .join(docs, "doc_id")
      .select("doc_id", "input_text", "target_text", "text")
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      val original = Option(r.getString(3)).getOrElse("")
        .toLowerCase.split(" ").filter(_.nonEmpty).mkString(" ")
      assert(reconstruct(r.getString(1), r.getString(2)) == original,
        s"doc ${r.getLong(0)} must reconstruct losslessly")
    }
  }

  test("sentinels are ordinal, dense, and consistent between input and target") {
    val r = SpanCorrupt.corrupt(
      Seq((42L, Seq.tabulate(64)(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")).head()
    val nMasked = r.getAs[Long]("n_masked")
    val inputIds = "<extra_id_(\\d+)>".r
      .findAllMatchIn(r.getAs[String]("input_text")).map(_.group(1).toInt).toSeq
    val targetIds = "<extra_id_(\\d+)>".r
      .findAllMatchIn(r.getAs[String]("target_text")).map(_.group(1).toInt).toSeq
    assert(inputIds == (0 until nMasked.toInt), "input sentinels 0..m-1 in order")
    assert(targetIds == inputIds, "target lists the same sentinels in order")
    assert(r.getAs[Long]("n_windows") == 8)
  }

  test("the coin is deterministic and ~25%: regeneration is byte-identical") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val a = SpanCorrupt.corrupt(docs).orderBy("doc_id").collect()
    val b = SpanCorrupt.corrupt(docs).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    val masked = a.map(_.getAs[Long]("n_masked")).sum.toDouble
    val windows = a.map(_.getAs[Long]("n_windows")).sum.toDouble
    assert(masked / windows > 0.15 && masked / windows < 0.35,
      s"mask rate ~25%, got ${masked / windows}")
  }

  test("empty and null docs yield empty pairs; the plan never shuffles") {
    val df = SpanCorrupt.corrupt(
      Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("n_windows") == 0L)
      assert(r.getAs[String]("input_text") == "")
      assert(r.getAs[String]("target_text") == "")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must stay narrow:\n$plan")
  }
}
