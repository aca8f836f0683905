package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe (Test/runMain graft.NanosProbe): can Spark 4.1 read the
  * events.parquet TIMESTAMP(NANOS) column without the explicit-schema
  * workaround in Tables? Tries the plain read and the documented confs. */
object NanosProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/root/testdata/sf0.001/events.parquet"
    def attempt(label: String)(body: => Unit): Unit =
      try { body; println(s"PROBE $label: OK") }
      catch { case e: Throwable =>
        println(s"PROBE $label: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    attempt("plain read") {
      val df = spark.read.parquet(path); df.printSchema(); df.show(2)
    }
    attempt("nanosAsLong conf") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path)
      println(df.schema.simpleString.take(200)); df.show(2)
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
    attempt("inferTimestampNTZ off") {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      val df = spark.read.parquet(path); df.show(2)
      spark.conf.unset("spark.sql.parquet.inferTimestampNTZ.enabled")
    }
    spark.stop()
  }
}
