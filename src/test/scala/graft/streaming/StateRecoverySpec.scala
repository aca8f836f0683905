package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** State-store RECOVERY across a checkpointed restart — the cluster
  * reality the stateful operators must survive: a streaming job dies
  * (driver loss, deploy, preemption) and the restarted query must
  * resume from the checkpoint's state store, not refold from scratch.
  * A key first seen before the crash must keep its `added_at` after
  * it; a state store that silently restarted empty would stamp the
  * post-restart snapshot date instead — a wrong-data failure, not an
  * error. StreamingSpec pins source-side restart (no re-feed); this
  * pins the STATE side through a real stop → new query → same
  * checkpoint cycle over a restart-capable file source. */
class StateRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def writeSnapshot(
      root: String, date: String, rows: Seq[(Long, Long)]): Unit = {
    new java.io.File(s"$root/$date").mkdirs()
    val f = new java.io.PrintWriter(s"$root/$date/obs.csv")
    f.println("id,payload")
    rows.foreach { case (id, p) => f.println(s"$id,$p") }
    f.close()
  }

  test("StatefulMerge lifecycle state survives a checkpointed restart") {
    val root = Files.createTempDirectory("state-rec").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("state-rec-ckpt").toFile.getAbsolutePath
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", LongType)))

    // rows observed per micro-batch, accumulated across BOTH query
    // incarnations through the restart-capable foreachBatch sink
    var seen = Vector.empty[StatefulMerge.KeyLifecycle]
    def start() = {
      val obs: Dataset[StatefulMerge.KeyObs] = spark.readStream
        .schema(schema).option("header", "true")
        .csv(s"$root/*")
        .withColumn("snapshotDate",
          org.apache.spark.sql.functions.element_at(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions
                .input_file_name(), "/"), -2))
        .selectExpr("id", "snapshotDate", "payload AS payloadHash")
        .as[StatefulMerge.KeyObs]
      StatefulMerge(obs).writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: Dataset[StatefulMerge.KeyLifecycle], _: Long) =>
          seen = seen ++ batch.collect()
        }
        .start()
    }

    // life before the crash: key 1 enters, key 2 enters
    writeSnapshot(root, "2021-02-01", Seq(1L -> 100L, 2L -> 200L))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(seen.map(_.id).sorted == Vector(1L, 2L))

    // the crash: q1 is gone. A NEW query resumes from the checkpoint;
    // the next snapshot changes key 2 and repeats key 1 unchanged
    writeSnapshot(root, "2021-02-08", Seq(1L -> 100L, 2L -> 201L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val byKey = seen.groupBy(_.id).view.mapValues(_.last).toMap
    // key 1: unchanged payload — recovered state says added 02-01,
    // never updated, changed=false. An empty-restart store would have
    // re-added it at 02-08 with changed=true.
    assert(byKey(1L) ==
      StatefulMerge.KeyLifecycle(1L, "2021-02-01", "2021-02-01", changed = false))
    // key 2: changed payload — added_at survives the restart, only
    // updated_at moves
    assert(byKey(2L) ==
      StatefulMerge.KeyLifecycle(2L, "2021-02-01", "2021-02-08", changed = true))
  }
}
