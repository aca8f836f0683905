package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — a SURVEY §7.4 extension operator Spark's
  * built-ins don't provide directly: match each probe row to the latest
  * build row with the same key and `buildTs <= probeTs`.
  *
  * Implementation is the scalable union-and-carry-forward pattern, NOT a
  * range cross join:
  *   1. tag both sides and union them (plan-level, no data copy);
  *   2. one shuffle: window partitioned by key, ordered by
  *      (ts, side) with build rows sorting before probe rows on ties —
  *      "<=" semantics;
  *   3. last(struct(buildCols), ignoreNulls) over rowsBetween(-inf, 0)
  *      carries the most recent build row forward onto each probe row as
  *      ONE struct — atomically, so a build row whose latest value for a
  *      column is legitimately NULL is not back-filled from an older row
  *      (column-independent carries would mix values across build rows).
  *
  * Cost: ONE shuffle on the key (same as any equi-join), state per task
  * bounded by the carried build columns — at 100 TB this behaves exactly
  * like a sort-merge join, whereas the naive
  * `a.join(b, key && b.ts <= a.ts)` + max() explodes quadratically on hot
  * keys. This is case (a) of the custom-operator preference order:
  * composition of existing operators expresses the semantics, so no
  * custom SparkPlan is needed.
  */
object AsOfJoin {

  /** @param probe      rows to enrich
    * @param build      rows providing the as-of values
    * @param keyCols    equi-join keys present in both sides
    * @param probeTs    event-time column in `probe`
    * @param buildTs    event-time column in `build`
    * @param buildCols  build columns to carry onto probe rows (renamed as
    *                   given); null when no build row precedes the probe
    */
  def leftAsOf(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTs: String,
      buildTs: String,
      buildCols: Map[String, String]): DataFrame = {

    val probeCols = probe.columns.toSeq
    val srcCols = buildCols.keys.toSeq
    // one struct per build row: non-null on every build row (even when all
    // carried fields are null), so last(ignoreNulls) always lands on the
    // LATEST preceding build row, never mixes fields across rows
    val payloadType = org.apache.spark.sql.types.StructType(
      srcCols.map(c => build.schema(build.schema.fieldIndex(c))))

    val taggedBuild = build.select(
      (keyCols.map(col) :+ col(buildTs).as("_ts") :+ lit(0).as("_side") :+
        struct(srcCols.map(col): _*).as("_bpayload")) ++
        probeCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)

    val taggedProbe = probe.select(
      (keyCols.map(col) :+ col(probeTs).as("_ts") :+ lit(1).as("_side") :+
        lit(null).cast(payloadType).as("_bpayload")) ++
        probeCols.filterNot(keyCols.contains).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedBuild.unionByName(taggedProbe)
      .withColumn("_asof", last(col("_bpayload"), ignoreNulls = true).over(w))

    carried.filter(col("_side") === 1)
      .select(probeCols.map(col) ++
        srcCols.map(c => col("_asof").getField(c).as(buildCols(c))): _*)
  }

  /** Forward as-of: match each probe row to the EARLIEST build row with
    * the same key and `buildTs >= probeTs` — "next event after"
    * semantics (first view after a purchase, next price tick). The
    * reflection of [[leftAsOf]]: probe rows sort BEFORE build rows on
    * ties (">=" is inclusive) and `first(ignoreNulls)` over
    * [current, +∞) carries the nearest FOLLOWING build row backward.
    * Same cost shape: ONE shuffle on the key. */
  def forwardAsOf(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTs: String,
      buildTs: String,
      buildCols: Map[String, String]): DataFrame = {

    val probeCols = probe.columns.toSeq
    val srcCols = buildCols.keys.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      srcCols.map(c => build.schema(build.schema.fieldIndex(c))))

    val taggedBuild = build.select(
      (keyCols.map(col) :+ col(buildTs).as("_ts") :+ lit(1).as("_side") :+
        struct(srcCols.map(col): _*).as("_bpayload")) ++
        probeCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)

    val taggedProbe = probe.select(
      (keyCols.map(col) :+ col(probeTs).as("_ts") :+ lit(0).as("_side") :+
        lit(null).cast(payloadType).as("_bpayload")) ++
        probeCols.filterNot(keyCols.contains).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = taggedBuild.unionByName(taggedProbe)
      .withColumn("_asof", first(col("_bpayload"), ignoreNulls = true).over(w))

    carried.filter(col("_side") === 0)
      .select(probeCols.map(col) ++
        srcCols.map(c => col("_asof").getField(c).as(buildCols(c))): _*)
  }
}
