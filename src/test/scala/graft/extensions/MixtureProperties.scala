package graft.extensions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.Test.Parameters

import org.apache.spark.sql.DataFrame

/** [[Mixture]]'s budget algebra as properties over random corpora and
  * random weights (Spark jobs per case — case count kept modest):
  *
  *  1. feasibility — no source is asked to upsample: keep ≤ total,
  *     for every source;
  *  2. mixture adherence — keeps follow the target ratio up to floor
  *     rounding: |keep_s·w_t − keep_t·w_s| ≤ w_s + w_t for all pairs
  *     (each keep is a floor of an exact proportional share, so the
  *     cross-products differ by less than one unit of each weight);
  *  3. the sample lands on its budget exactly: per source,
  *     keep ≤ tokens_kept < keep + max_doc (the one-doc-overshoot
  *     contract), and empty-keep sources emit nothing;
  *  4. zero/negative-weight sources never appear in plan or sample.
  */
object MixtureProperties extends Properties("Mixture") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.SparkSpec.session
  import scala.jdk.CollectionConverters._

  private val cases = for {
    nDocs <- Gen.choose(20, 120)
    nSources <- Gen.choose(2, 5)
    seedLens <- Gen.choose(1, 30)
    weights <- Gen.listOfN(5, Gen.choose(0L, 6L))
    phantom <- Gen.oneOf(true, false) // a weighted source with no docs
  } yield (nDocs, nSources, seedLens, weights, phantom)

  private def mkDocs(nDocs: Int, nSources: Int, seedLens: Int): DataFrame = {
    val rows = (0 until nDocs).map { i =>
      val len = 1 + (i * seedLens) % 37
      org.apache.spark.sql.Row(
        i.toLong, Seq.fill(len)("w").mkString(" "), s"s${i % nSources}")
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType))))
  }

  private def mkWeights(
      nSources: Int, ws: List[Long], phantom: Boolean): DataFrame = {
    // phantom: weight a source the corpus does not hold — the strict
    // contract says it stays in the plan at tokens_total = 0 and binds
    // the budget to 0
    val names = (0 until nSources).map(i => s"s$i") ++
      (if (phantom) Seq("sPhantom") else Seq.empty)
    val rows = names.zipWithIndex.map { case (s, i) =>
      org.apache.spark.sql.Row(s, ws(i % ws.length))
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.LongType))))
  }

  property("feasible, ratio-adherent plan; budget-exact sample; weight-0 excluded") =
    Prop.forAllNoShrink(cases) { case (nDocs, nSources, seedLens, ws, phantom) =>
      val docs = mkDocs(nDocs, nSources, seedLens)
      val weights = mkWeights(nSources, ws, phantom)
      val plan = Mixture.plan(docs, weights).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
      val names = (0 until nSources).map(i => s"s$i") ++
        (if (phantom) Seq("sPhantom") else Seq.empty)
      val posWeights = names.zipWithIndex
        .map { case (s, i) => s -> ws(i % ws.length) }.filter(_._2 > 0).toMap

      // strict semantics: every positive-weight source appears in the
      // plan (a phantom at tokens_total = 0), and a weighted phantom
      // zeroes the budget for everyone
      val complete = plan.keySet == posWeights.keySet
      val phantomStrict = !phantom ||
        !posWeights.contains("sPhantom") ||
        (plan("sPhantom")._1 == 0L && plan.values.forall(_._3 == 0L))

      val feasible = plan.values.forall { case (total, _, keep) =>
        keep >= 0 && keep <= total
      }
      val excluded = plan.keySet.subsetOf(posWeights.keySet)
      val adherent = plan.toSeq.combinations(2).forall {
        case Seq((_, (_, ws1, k1)), (_, (_, ws2, k2))) =>
          math.abs(k1 * ws2 - k2 * ws1) <= ws1 + ws2
        case _ => true
      }

      val sample = Mixture.sample(docs, weights, seed = 11L).collect()
        .map(r => (r.getString(0), r.getLong(2)))
      val bySource = sample.groupBy(_._1)
      val budgetExact = plan.forall { case (s, (_, _, keep)) =>
        val toks = bySource.get(s).map(_.map(_._2).sum).getOrElse(0L)
        val maxDoc = bySource.get(s).map(_.map(_._2).max).getOrElse(0L)
        if (keep == 0) toks == 0L
        else toks >= keep && toks < keep + math.max(maxDoc, 1L)
      }
      val sampleSources = bySource.keySet.subsetOf(plan.keySet)

      (feasible :| "keep > total somewhere") &&
        (excluded :| "a non-positive-weight source leaked into the plan") &&
        (complete :| s"a positive-weight source is missing from the plan: $plan") &&
        (phantomStrict :| s"weighted phantom did not zero the budget: $plan") &&
        (adherent :| s"keeps off-ratio: $plan") &&
        (budgetExact :| s"sample off-budget: plan=$plan") &&
        (sampleSources :| "sample emitted an unplanned source")
    }
}
