package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.SparkSpec
import graft.extensions.Sketches

/** [[Md5Lanes]] parity: the native lane split must equal the
  * declarative hex-slice+conv reference ([[Sketches.cmsLane]]) for any
  * input — that equivalence is what lets the CMS oracles stay on the
  * `substr(md5(tok), seed*8+1, 8)` form while the hot path skips the
  * hex string entirely. */
class Md5LanesSpec extends SparkSpec {
  import spark.implicits._

  test("lanes equal the hex-slice conv reference for arbitrary strings (ScalaCheck)") {
    graft.functions.GraftFunctions.register(spark)
    val gen = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(24)),
      Gen.asciiPrintableStr.map(_.take(24)),
      Gen.const(""), Gen.const("αβγ 漢字 emoji 🙂")))
    val prop = Prop.forAll(gen) { xs =>
      val df = xs.toDF("tok")
        .select(col("tok"),
          call_function("md5_lanes", col("tok")).as("lanes"),
          md5(col("tok").cast("binary")).as("m"))
      val rows = (0 until 4).foldLeft(df) { (d, i) =>
        d.withColumn(s"ref_$i",
          Sketches.cmsLane(col("m"), lit(i), 1 << 30) // width > 2^32? no: keep raw via huge width
        )
      }
      // compare raw lane values: pmod with width 2^30 is NOT identity;
      // instead compare lane % W == ref for two coprime widths, which
      // pins the 32-bit value itself (CRT: 2^30 and 3^19 exceed 2^32)
      val w2 = 1162261467 // 3^19
      val rows2 = (0 until 4).foldLeft(rows) { (d, i) =>
        d.withColumn(s"ref2_$i", Sketches.cmsLane(col("m"), lit(i), w2))
      }
      val collected = rows2.collect()
      collected.forall { r =>
        val lanes = r.getAs[scala.collection.Seq[Long]]("lanes")
        (0 until 4).forall { i =>
          lanes(i) % (1 << 30) == r.getAs[Long](s"ref_$i") &&
            lanes(i) % w2 == r.getAs[Long](s"ref2_$i")
        }
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpreted equals codegen equals driver-side compute") {
    graft.functions.GraftFunctions.register(spark)
    val inputs = Seq("", "a", "hello world", "αβγ", "tok12345")
    val viaDf = inputs.toDF("tok")
      .select(col("tok"), call_function("md5_lanes", col("tok")).as("lanes"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Long]](1).toSeq).toMap
    inputs.foreach { s =>
      val direct = Md5Lanes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val expected = (0 until 4).map(direct.getLong)
      assert(viaDf(s) == expected, s"$s: ${viaDf(s)} vs $expected")
      // and against MessageDigest arithmetic done by hand
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hand = (0 until 4).map { i =>
        java.lang.Long.parseLong(
          d.slice(4 * i, 4 * i + 4).map(b => f"$b%02x").mkString, 16)
      }
      assert(viaDf(s) == hand, s"$s: ${viaDf(s)} vs $hand")
    }
  }
}
