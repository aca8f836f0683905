package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 exemplar: the reference's dated-snapshot directory layout
  * (`data/YYYY-MM-DD/result.csv`, feeder_postgres.py:213-233) as a
  * first-class Spark source with:
  *
  *  - **partition pruning**: filters on `snapshot_date` are pushed down
  *    and evaluated against DIRECTORY NAMES at planning time — a
  *    high-water-mark predicate (`snapshot_date > hwm`) never opens a
  *    pruned dir, exactly the reference's incremental skip;
  *  - **column pruning**: only requested CSV columns are materialized;
  *  - one InputPartition per snapshot dir — parallelism = snapshot count,
  *    each task streams its file (no whole-file buffering).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SnapshotSource")
  *     .option("path", root).schema(csvSchema).load()
  *     .filter($"snapshot_date" > "2021-01-01")
  * }}}
  *
  * Data columns are read as strings (the CSV truth — normalization is
  * [[graft.ingest.Normalize]]'s job downstream); `snapshot_date` is a
  * DateType derived from the dir name. SCHEMA EVOLUTION across
  * snapshots is handled per file: each partition resolves the
  * requested columns against ITS OWN header (never by position), so a
  * column the feed added later reads as NULL from older dirs and a
  * reordered header cannot shift cells — the week-to-week reality of
  * a live feed, pinned in SnapshotSourceSpec. The CSV parsing here is
  * deliberately minimal (no quoted-comma support) — the exemplar's point
  * is the connector surface, not a CSV parser; production would delegate
  * record parsing to Spark's CSV reader.
  */
class SnapshotSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = options.get("path")
    val dirs = SnapshotSource.listSnapshotDirs(root)
    // one bounded driver-side read of ONE header line, through the Hadoop
    // FS API so any scheme the cluster mounts (hdfs://, s3a://, file:/)
    // works — never a local-file assumption. The session's Hadoop conf
    // (not a bare new Configuration()) carries fs.s3a.* credentials and
    // other cluster FS settings. Production callers should still pass an
    // explicit schema (supportsExternalMetadata).
    val header = dirs.headOption
      .flatMap(d => SnapshotSource.listCsvFiles(s"$root/$d").headOption)
      .map { f =>
        val path = new org.apache.hadoop.fs.Path(f)
        val conf = org.apache.spark.sql.SparkSession.active
          .sessionState.newHadoopConf()
        val fs = path.getFileSystem(conf)
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(path), java.nio.charset.StandardCharsets.UTF_8))
        try in.readLine() finally in.close()
      }.getOrElse(throw new IllegalArgumentException(s"no snapshot dirs under $root"))
    StructType(header.split(",").map(c => StructField(c, StringType)) :+
      StructField("snapshot_date", DateType))
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new SnapshotTable(properties.get("path"), schema)
}

object SnapshotSource {
  private[sources] val DatedDir = "^\\d{4}-\\d{2}-\\d{2}$".r

  private[sources] def listSnapshotDirs(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
      .filter(DatedDir.matches(_)).sorted.toSeq

  private[sources] def daysSinceEpoch(date: String): Int =
    java.time.LocalDate.parse(date).toEpochDay.toInt

  private[sources] def listCsvFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".csv"))
      .map(_.getAbsolutePath).sorted.toSeq
}

class SnapshotTable(root: String, schema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  // the reader materializes CSV cells as strings: reject schemas that
  // would silently mistype data columns (normalization is Normalize's
  // job downstream, on real typed expressions)
  schema.fields.foreach { f =>
    require(f.name == "snapshot_date" || f.dataType == StringType,
      s"SnapshotSource data columns must be STRING, got ${f.name}: ${f.dataType.simpleString}")
  }

  override def name(): String = s"snapshots($root)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(root, schema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotWriteBuilder(root, info)
}

class SnapshotScanBuilder(root: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushedDateFilters: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** Accept filters on snapshot_date (evaluated against dir names at plan
    * time); everything else stays in Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (date, rest) = filters.partition {
      case EqualTo("snapshot_date", _) | GreaterThan("snapshot_date", _) |
           GreaterThanOrEqual("snapshot_date", _) | LessThan("snapshot_date", _) |
           LessThanOrEqual("snapshot_date", _) => true
      case _ => false
    }
    pushedDateFilters = date
    rest
  }

  override def pushedFilters(): Array[Filter] = pushedDateFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SnapshotScan(root, fullSchema, required, pushedDateFilters)
}

class SnapshotScan(
    root: String, fullSchema: StructType, required: StructType, dateFilters: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def matches(date: String): Boolean = dateFilters.forall {
    case EqualTo(_, v) => date == v.toString
    case GreaterThan(_, v) => date > v.toString
    case GreaterThanOrEqual(_, v) => date >= v.toString
    case LessThan(_, v) => date < v.toString
    case LessThanOrEqual(_, v) => date <= v.toString
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] =
    SnapshotSource.listSnapshotDirs(root)
      .filter(matches) // ← directory-level pruning, before any file opens
      .flatMap(d => SnapshotSource.listCsvFiles(s"$root/$d")
        .map(f => SnapshotPartition(f, d): InputPartition))
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotReaderFactory(fullSchema, required)
}

case class SnapshotPartition(file: String, date: String) extends InputPartition

class SnapshotReaderFactory(fullSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SnapshotPartition]
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(part.file)
      private val lines = src.getLines()
      private val header =
        if (lines.hasNext) lines.next().split(",", -1).toSeq else Seq.empty
      // required-column index into the CSV row; DateMarker = snapshot_date,
      // header.indexOf = -1 (column absent from this file) must stay NULL
      // and NOT collide with the marker
      private val DateMarker = Int.MinValue
      private val colIdx = required.fields.map { f =>
        if (f.name == "snapshot_date") DateMarker else header.indexOf(f.name)
      }
      private val dateDays = SnapshotSource.daysSinceEpoch(part.date)
      private var row: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val cells = lines.next().split(",", -1)
          row = InternalRow.fromSeq(colIdx.map {
            case DateMarker => dateDays
            case i if i >= 0 && i < cells.length =>
              if (cells(i).isEmpty) null else UTF8String.fromString(cells(i))
            case _ => null
          }.toSeq)
          true
        }

      override def get(): InternalRow = row
      override def close(): Unit = src.close()
    }
  }
}

/** Write path: publish ONE dated snapshot dir per job with the
  * reference's commit protocol hardened to Spark's task-attempt model —
  * tasks write part files into a hidden staging dir; job commit moves
  * exactly the files named in the task commit messages into a hidden
  * publish dir and atomically renames THAT to `root/<snapshotDate>/`
  * (periodic_run.py:42-63 tempdir + os.rename, plus publish-by-manifest
  * so a zombie task attempt can never slip uncommitted rows into the
  * published dir). A crashed job leaves only dot-dirs that readers never
  * list (the dated-dir regex excludes them); re-publishing an existing
  * date is rejected — snapshots are immutable. */
class SnapshotWriteBuilder(root: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val date = info.options.get("snapshotDate")
      require(date != null && SnapshotSource.DatedDir.matches(date),
        "option snapshotDate=YYYY-MM-DD is required")
      new SnapshotBatchWrite(root, date, info.schema(), info.queryId())
    }
  }
}

class SnapshotBatchWrite(root: String, date: String, schema: StructType, queryId: String)
    extends BatchWrite {

  private val stagingDir = s"$root/.staging-$date-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val created = new java.io.File(stagingDir).mkdirs()
    require(created || new java.io.File(stagingDir).isDirectory,
      s"cannot create staging dir $stagingDir")
    new SnapshotWriterFactory(stagingDir, schema)
  }

  private val publishDir = s"$root/.publish-$date-$queryId"

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val finalDir = new java.io.File(s"$root/$date")
    if (finalDir.exists()) {
      abort(messages)
      throw new IllegalStateException(s"snapshot $date already published")
    }
    // Publish BY MANIFEST: move exactly the files named in the tasks'
    // commit messages into a second hidden dir, then atomically rename
    // that dir into place. A zombie task attempt (executor lost
    // mid-write, never ran abort()) can drop a part file into STAGING at
    // any moment — including between a cleanup scan and a whole-dir
    // rename, which is why delete-then-rename-the-dir cannot close the
    // race. The zombie never writes into the publish dir (only commit
    // builds it), so the published snapshot contains exactly the
    // committed attempts' output; readers never list dot-dirs.
    val committed = messages.collect { case m: SnapshotFileCommit => m.fileName }
    val publish = new java.io.File(publishDir)
    require(publish.mkdirs() || publish.isDirectory,
      s"cannot create publish dir $publishDir")
    committed.foreach { name =>
      val src = new java.io.File(stagingDir, name)
      if (!src.renameTo(new java.io.File(publish, name)))
        throw new IllegalStateException(
          s"commit lost task output $name for snapshot $date")
    }
    // the reference's atomic publish: one rename of the manifest-built dir
    if (!publish.renameTo(finalDir))
      throw new IllegalStateException(s"commit rename failed for $date")
    // best-effort cleanup: staging may still receive zombie writes after
    // this; it stays invisible to readers (dated-dir regex skips dot-dirs)
    abortDir(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    abortDir(stagingDir)
    abortDir(publishDir)
  }

  private def abortDir(path: String): Unit = {
    val d = new java.io.File(path)
    Option(d.listFiles()).foreach(_.foreach(_.delete()))
    d.delete()
  }
}

/** Task-level commit message: names the one file this attempt wrote, so
  * job commit can publish exactly the committed attempts' output. */
case class SnapshotFileCommit(fileName: String) extends WriterCommitMessage

class SnapshotWriterFactory(stagingDir: String, schema: StructType)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val dataFields = schema.fields.filter(_.name != "snapshot_date")
      private val idx = dataFields.map(f => schema.fieldIndex(f.name))
      private val file = new java.io.File(
        stagingDir, f"part-$partitionId%05d-$taskId.csv")
      private lazy val out = {
        val w = new java.io.PrintWriter(file, "UTF-8")
        w.println(dataFields.map(_.name).mkString(","))
        w
      }

      override def write(row: InternalRow): Unit =
        out.println(idx.zip(dataFields).map { case (i, f) =>
          if (row.isNullAt(i)) "" else row.get(i, f.dataType).toString
        }.mkString(","))

      override def commit(): WriterCommitMessage = {
        out.close()
        SnapshotFileCommit(file.getName)
      }

      override def abort(): Unit = { out.close(); file.delete() }
      override def close(): Unit = ()
    }
}
