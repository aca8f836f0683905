package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** ScalaCheck property suite (SURVEY §5.3): merge invariants over random
  * snapshot sequences, pct/pivot conservation laws. Case counts are kept
  * small — each case runs real Spark jobs. */
object MergeProperties extends Properties("ScdMerge") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val key = "id"
  private val tracked = Seq("v")

  private def snap(rows: Seq[(Long, Long)]): DataFrame = {
    val data = rows.map { case (id, v) => (id, java.lang.Long.valueOf(v)) }
    data.toDF(key, "v")
  }

  /** A sequence of 2-4 dated snapshots over a small id universe. */
  private val genSnapshots: Gen[List[Seq[(Long, Long)]]] =
    Gen.choose(2, 4).flatMap { n =>
      Gen.listOfN(n,
        Gen.someOf(1L to 12L).flatMap { ids =>
          Gen.sequence[Seq[(Long, Long)], (Long, Long)](
            ids.toSeq.map(id => Gen.choose(0L, 2L).map(v => (id, v))))
        })
    }

  private def dates(n: Int): Seq[String] = (1 to n).map(i => f"2021-02-$i%02d")

  property("lifecycle invariants over random snapshot sequences") =
    forAll(genSnapshots) { snaps =>
      val ds = dates(snaps.size)
      var state = ScdMerge.emptyState(snap(Seq.empty))
      var firstSeen = Map.empty[Long, String]
      var lastSeen = Map.empty[Long, String]
      snaps.zip(ds).foreach { case (rows, d) =>
        state = ScdMerge.applySnapshot(state, snap(rows), d, key, tracked)
        rows.foreach { case (id, _) =>
          if (!firstSeen.contains(id)) firstSeen += id -> d
          lastSeen += id -> d
        }
      }
      val m = state.select(col(key),
          date_format(col("added_at"), "yyyy-MM-dd"),
          date_format(col("updated_at"), "yyyy-MM-dd"),
          date_format(col("removed_at"), "yyyy-MM-dd"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), Option(r.getString(3)))))
        .toMap

      // every key ever seen is in the state exactly once, and only those
      m.keySet == firstSeen.keySet &&
        m.forall { case (id, (added, updated, removed)) =>
          added == firstSeen(id) &&          // added_at = first sighting
          updated >= added &&                // updated_at monotone
          updated <= lastSeen(id) &&         // never beyond last sighting
          // removed_at set iff the key was absent from a later snapshot
          // after being added earlier (tombstone semantics; reappearance
          // keeps the old tombstone, so check set-ness only)
          removed.forall(_ > firstSeen(id))
        }
    }

  property("feeding any snapshot twice is a no-op (idempotence)") =
    forAll(genSnapshots) { snaps =>
      val rows = snaps.head
      val d = "2021-03-01"
      val s1 = ScdMerge.applySnapshot(
        ScdMerge.emptyState(snap(Seq.empty)), snap(rows), d, key, tracked)
      val s2 = ScdMerge.applySnapshot(s1, snap(rows), d, key, tracked)
      s1.orderBy(key).collect().toSeq == s2.orderBy(key).collect().toSeq
    }
}

/** Conservation laws for the analytics family. */
object AnalyticsProperties extends Properties("TermFrequency") {
  import graft.analytics.TermFrequency

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genDocs: Gen[List[(Int, String)]] =
    Gen.nonEmptyListOf(for {
      year <- Gen.oneOf(2020, 2021)
      toks <- Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    } yield (year, toks.mkString(" ")))

  property("pivot row sums equal pre-pivot totals; pct sums to ~100 per group") =
    forAll(genDocs) { docs =>
      val df = docs.toDF("year", "text")
      val toks = TermFrequency.tokenize(df, "text", " ", Seq("year"))
      val counted = TermFrequency.counts(toks, Seq("year"))
      val total = toks.count()
      val pivotSum = TermFrequency.pivotCounts(counted, "year", Seq("2020", "2021"))
        .select(coalesce(col("2020"), lit(0L)) + coalesce(col("2021"), lit(0L)))
        .as[Long].collect().sum
      val pctOk = TermFrequency.withPct(counted, Seq("year"))
        .groupBy("year").agg(sum("pct").as("s"))
        .select("s").as[Double].collect()
        .forall(s => math.abs(s - 100.0) < 0.01)
      pivotSum == total && (total == 0 || pctOk)
    }
}
