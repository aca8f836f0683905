package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath
    def write(date: String, rows: Seq[String]): Unit = {
      new java.io.File(s"$r/$date").mkdirs()
      val w = new java.io.PrintWriter(s"$r/$date/result.csv")
      w.println("id,name,archived")
      rows.foreach(w.println)
      w.close()
    }
    write("2021-01-01", Seq("1,a,False", "2,b,False"))
    write("2021-01-08", Seq("1,a2,False"))
    write("2021-01-15", Seq("3,,True"))
    new java.io.File(s"$r/not-a-date").mkdirs()
    r
  }

  private def load() =
    spark.read.format("graft.sources.SnapshotSource")
      .option("path", root).load()

  test("schema inference: CSV header columns + snapshot_date") {
    assert(load().schema.fieldNames.toSeq ==
      Seq("id", "name", "archived", "snapshot_date"))
    assert(load().schema("snapshot_date").dataType.typeName == "date")
  }

  test("reads all snapshots with dir-derived dates; empty cells → null") {
    val rows = load()
      .select($"id", $"name", date_format($"snapshot_date", "yyyy-MM-dd"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("1", "a", "2021-01-01"), ("2", "b", "2021-01-01"),
      ("1", "a2", "2021-01-08"), ("3", null, "2021-01-15")))
  }

  test("snapshot_date predicate prunes directories at planning time") {
    val df = load().filter($"snapshot_date" > lit("2021-01-01").cast("date"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.partitions.size == 2) // 01-08 and 01-15; 01-01 never opened
    assert(df.count() == 2)

    val one = load().filter($"snapshot_date" === lit("2021-01-08").cast("date"))
    val scan1 = one.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan1.partitions.size == 1)
    assert(one.select("name").as[String].head() == "a2")
  }

  test("schema column absent from a CSV header reads as NULL, not the date marker") {
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("path", root)
      .schema("id STRING, name STRING, archived STRING, extra_col STRING, snapshot_date DATE")
      .load()
    val rows = back.select("id", "extra_col").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.isNullAt(1)))
  }

  test("SCHEMA EVOLUTION across dated snapshots: per-file header resolution " +
    "fills missing columns with NULL and survives reordering") {
    // the dated-snapshot reality this source exists for: the feed adds a
    // column one week and reshuffles its header the next — each file's
    // cells must resolve by ITS OWN header (the reader's header.indexOf
    // per partition), never by position in the union schema
    val r = Files.createTempDirectory("snapevo").toFile.getAbsolutePath
    def write(date: String, header: String, rows: Seq[String]): Unit = {
      new java.io.File(s"$r/$date").mkdirs()
      val w = new java.io.PrintWriter(s"$r/$date/result.csv")
      w.println(header); rows.foreach(w.println); w.close()
    }
    write("2021-01-01", "id,name", Seq("1,old")) // before the column existed
    write("2021-01-08", "id,name,salary", Seq("1,mid,100")) // column added
    write("2021-01-15", "salary,id,name", Seq("200,1,new")) // feed reordered
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("path", r)
      .schema("id STRING, name STRING, salary STRING, snapshot_date DATE")
      .load()
      .select($"name", $"salary",
        date_format($"snapshot_date", "yyyy-MM-dd").as("d"))
      .collect().map(row => (row.getString(0), row.getString(1), row.getString(2)))
      .toSet
    assert(back == Set(
      ("old", null, "2021-01-01"), // pre-evolution rows: NULL, not shifted cells
      ("mid", "100", "2021-01-08"),
      ("new", "200", "2021-01-15")), s"got $back")
  }

  test("column pruning reaches the reader") {
    val df = load().select("name")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(df.as[String].collect().toSet == Set("a", "a2", "b", null))
  }

  test("feeds the normal ingest path (filter + normalize downstream)") {
    val live = load().filter(lower($"archived") =!= "true")
    assert(live.count() == 3)
  }

  test("write path: staged part files publish atomically as a dated dir") {
    val wroot = Files.createTempDirectory("snapwrite").toFile.getAbsolutePath
    val df = Seq(("10", "x", "False"), ("11", "y", "True"))
      .toDF("id", "name", "archived").repartition(2)
    df.write.format("graft.sources.SnapshotSource")
      .option("path", wroot).option("snapshotDate", "2022-05-01")
      .mode("append").save()

    // published dir exists, no staging leftovers
    val children = new java.io.File(wroot).list().toSeq
    assert(children == Seq("2022-05-01"), children.toString)

    // roundtrip through the read path
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("path", wroot).load()
    assert(back.select("id", "name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet == Set(("10", "x"), ("11", "y")))

    // snapshots are immutable: same date again fails, dir untouched
    intercept[Exception] {
      df.write.format("graft.sources.SnapshotSource")
        .option("path", wroot).option("snapshotDate", "2022-05-01")
        .mode("append").save()
    }
    assert(new java.io.File(wroot).list().toSeq == Seq("2022-05-01"))

    // missing/invalid snapshotDate is rejected before any file IO
    intercept[Exception] {
      df.write.format("graft.sources.SnapshotSource")
        .option("path", wroot).mode("append").save()
    }
  }

  test("job commit publishes by manifest: zombie part files never publish") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val wroot = Files.createTempDirectory("snapzombie").toFile.getAbsolutePath
    val schema = StructType(Seq(StructField("id", StringType)))
    val bw = new SnapshotBatchWrite(wroot, "2022-06-01", schema, "q-test")
    bw.createBatchWriterFactory(null) // creates the staging dir
    val staging = new java.io.File(wroot).listFiles()
      .find(_.getName.startsWith(".staging")).get
    def put(name: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(staging, name), "UTF-8")
      w.println("id"); w.println(name); w.close()
    }
    put("part-00000-1.csv")
    put("part-00001-2.csv")
    // a zombie attempt's orphan output: present in staging, never committed
    // (this models the file appearing at ANY time, incl. mid-commit — by
    // manifest it can never reach the publish dir)
    put("part-00001-99.csv")
    bw.commit(Array(
      SnapshotFileCommit("part-00000-1.csv"),
      SnapshotFileCommit("part-00001-2.csv")))
    val published = new java.io.File(wroot, "2022-06-01").list().toSet
    assert(published == Set("part-00000-1.csv", "part-00001-2.csv"))
    // readers see exactly the published snapshot (dot-dirs invisible)
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("path", wroot).load()
    assert(back.select("id").as[String].collect().toSet ==
      Set("part-00000-1.csv", "part-00001-2.csv"))
    // a committed file missing from staging fails the commit loudly
    val bw2 = new SnapshotBatchWrite(wroot, "2022-06-08", schema, "q-test2")
    bw2.createBatchWriterFactory(null)
    intercept[IllegalStateException] {
      bw2.commit(Array(SnapshotFileCommit("part-00000-gone.csv")))
    }
    assert(!new java.io.File(wroot, "2022-06-08").exists())
  }
}
