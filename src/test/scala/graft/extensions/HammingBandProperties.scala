package graft.extensions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

/** The pigeonhole-completeness invariant of [[Dedup.hammingBandPairs]]
  * as a property: for ANY hash population and any (maxHamming,
  * numBands) with numBands > maxHamming, the banded candidate pairs
  * equal the brute-force ≤ maxHamming pairs — banding is an
  * optimization, never a recall trade. Populations mix pure-random
  * longs (pairs far apart) with planted near-dup clusters (a base hash
  * ± a few flipped bits), since random-only data would leave the
  * ≤ maxHamming regime untested. Case counts kept small — each case
  * runs a real Spark job. */
object HammingBandProperties extends Properties("HammingBandPairs") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val population: Gen[List[Long]] = for {
    nBase <- Gen.choose(2, 5)
    bases <- Gen.listOfN(nBase, Gen.long)
    // planted near-dups: up to 3 variants per base with 0-4 flipped bits
    variants <- Gen.sequence[List[List[Long]], List[Long]](bases.map { h =>
      for {
        k <- Gen.choose(0, 3)
        flips <- Gen.listOfN(k, for {
          nb <- Gen.choose(0, 4)
          pos <- Gen.listOfN(nb, Gen.choose(0, 63))
        } yield pos.foldLeft(h)((acc, p) => acc ^ (1L << p)))
      } yield flips
    })
  } yield (bases ++ variants.flatten).distinct

  private val config: Gen[(Int, Int)] =
    Gen.oneOf((1, 2), (3, 4), (7, 8), (3, 8))

  property("banded candidates equal brute force whenever numBands > maxHamming") =
    Prop.forAll(population, config) { case (hashes, (maxHam, nBands)) =>
      val df = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("id", "h")
      val banded = Dedup.hammingBandPairs(df, "id", "h", maxHam, nBands)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val idx = hashes.zipWithIndex
      val brute = (for {
        (ha, ia) <- idx; (hb, ib) <- idx
        if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= maxHam
      } yield (ia.toLong, ib.toLong)).toSet
      banded == brute
    }

  property("reported hamming is the exact bit distance") =
    Prop.forAll(population) { hashes =>
      val df = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("id", "h")
      val byId = hashes.zipWithIndex.map { case (h, i) => i.toLong -> h }.toMap
      Dedup.hammingBandPairs(df, "id", "h", maxHamming = 5, numBands = 8)
        .collect().forall { r =>
          r.getInt(2) == java.lang.Long.bitCount(byId(r.getLong(0)) ^ byId(r.getLong(1)))
        }
    }

  property("bucketCols restricts candidates to same-bucket pairs, complete within") =
    Prop.forAll(population, config) { case (hashes, (maxHam, nBands)) =>
      // deterministic 2-way bucket split (id parity stands in for lang)
      val df = hashes.zipWithIndex.map { case (h, i) =>
        (i.toLong, h, if (i % 2 == 0) "a" else "b") }
        .toDF("id", "h", "lang")
      val bucketed = Dedup
        .hammingBandPairs(df, "id", "h", maxHam, nBands, bucketCols = Seq("lang"))
        .select("a", "b").as[(Long, Long)].collect().toSet
      val idx = hashes.zipWithIndex
      val brute = (for {
        (ha, ia) <- idx; (hb, ib) <- idx
        if ia < ib && ia % 2 == ib % 2 &&
          java.lang.Long.bitCount(ha ^ hb) <= maxHam
      } yield (ia.toLong, ib.toLong)).toSet
      bucketed == brute
    }
}
