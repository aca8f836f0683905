package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  * DateType derived from the dir name. The CSV parsing here is
  * deliberately minimal (no quoted-comma support) — the exemplar's point
  * is the connector surface, not a CSV parser; production would delegate
  * record parsing to Spark's CSV reader.
  */
class SnapshotSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = options.get("path")
    val dirs = SnapshotSource.listSnapshotDirs(root)
    val header = dirs.headOption.map { d =>
      val src = scala.io.Source.fromFile(s"$root/$d/result.csv")
      try src.getLines().next() finally src.close()
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
}

class SnapshotTable(root: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"snapshots($root)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(root, schema)
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
      .map(d => SnapshotPartition(s"$root/$d/result.csv", d): InputPartition)
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
      // required-column index into the CSV row, -1 = snapshot_date
      private val colIdx = required.fields.map { f =>
        if (f.name == "snapshot_date") -1 else header.indexOf(f.name)
      }
      private val dateDays = SnapshotSource.daysSinceEpoch(part.date)
      private var row: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val cells = lines.next().split(",", -1)
          row = InternalRow.fromSeq(colIdx.map {
            case -1 => dateDays
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
