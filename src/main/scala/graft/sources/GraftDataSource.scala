package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.table.{Fs, Snapshot, SnapshotIO}

/** DataSourceV2 reader for graft lake tables (SURVEY.md §2.1 S5 — the
  * reference's pushdown precedent is its ArcGIS client pushing `where`
  * server-side, geo_curitiba_client.py:69-114):
  *
  * {{{ spark.read.format("graft").load("/path/to/table")          // live rows
  *     spark.read.format("graft").option("snapshot", 3).load(dir) // time travel }}}
  *
  * Pushdown surface:
  *  - `SupportsPushDownRequiredColumns`: the parquet scan decodes ONLY the
  *    pruned columns (ReadSchema in explain).
  *  - `SupportsPushDownFilters`: `lsn` range predicates are used for
  *    FILE-LEVEL data skipping against the snapshot's per-file min/max lsn
  *    stats — files wholly outside the range are never opened (the engine's
  *    analogue of the reference's indexed reads, docs/database.md:319-323).
  *    Pushed filters remain in the residual (Spark re-applies them row-wise)
  *    so skipping can never change semantics.
  *
  * Scope: serves CopyOnWrite and DeletionVector tables always (live DVs are
  * applied INSIDE each partition reader: the per-file dead-position set is
  * collected from the DV sidecars at plan time — sidecar size is bounded by
  * the table's dv-fraction compaction policy — and rows at dead positions
  * are skipped during the scan, no join needed); MergeOnRead tables once
  * compacted to ≤1 file per bucket (un-compacted MOR deltas need the
  * latest-per-key shuffle, which a scan cannot do — use LakeTable.read()).
  * Tombstones are filtered inside the reader; `deleted` is not exposed.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def loadSnapshot(options: CaseInsensitiveStringMap): (String, Snapshot) = {
    val root = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft: .load(<table root>) is required"))
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = new Fs(conf)
    val snap = Option(options.get("snapshot")) match {
      case Some(v) =>
        val p = s"$root/meta/snap-$v.json"
        require(fs.exists(p), s"graft: snapshot $v expired or never existed under $root")
        SnapshotIO.read(fs.readString(p))
      case None =>
        val vf = s"$root/meta/VERSION"
        require(fs.exists(vf), s"graft: no table at $root (missing meta/VERSION)")
        SnapshotIO.read(fs.readString(s"$root/meta/snap-${fs.readString(vf).trim.toInt}.json"))
    }
    if (snap.mode == "mor") {
      val worst = snap.files.groupBy(_.bucket).values.map(_.size).maxOption.getOrElse(0)
      require(worst <= 1,
        "graft: MergeOnRead table has un-compacted deltas (latest-per-key needs a shuffle); " +
          "run compact() or read via LakeTable.read()")
    }
    (root, snap)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, snap) = loadSnapshot(options)
    StructType(StructType.fromDDL(snap.schemaDdl).fields.filterNot(_.name == "deleted"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftTable(loadSnapshot(new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = false
}

final class GraftTable(rootSnap: (String, Snapshot), tableSchema: StructType)
    extends Table with SupportsRead {
  override def schema(): StructType = tableSchema
  override def name(): String = s"graft:${rootSnap._1}@v${rootSnap._2.version}"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(rootSnap._1, rootSnap._2, schema)
}

final class GraftScanBuilder(root: String, snap: Snapshot, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var lsnLo: Long = Long.MinValue
  private var lsnHi: Long = Long.MaxValue

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (usable, _) = filters.partition {
      case GreaterThan("lsn", _: Long) | GreaterThanOrEqual("lsn", _: Long) |
           LessThan("lsn", _: Long) | LessThanOrEqual("lsn", _: Long) |
           EqualTo("lsn", _: Long) => true
      case _ => false
    }
    usable.foreach {
      case GreaterThan("lsn", v: Long)        => lsnLo = math.max(lsnLo, v + 1)
      case GreaterThanOrEqual("lsn", v: Long) => lsnLo = math.max(lsnLo, v)
      case LessThan("lsn", v: Long)           => lsnHi = math.min(lsnHi, v - 1)
      case LessThanOrEqual("lsn", v: Long)    => lsnHi = math.min(lsnHi, v)
      case EqualTo("lsn", v: Long)            => lsnLo = math.max(lsnLo, v); lsnHi = math.min(lsnHi, v)
      case _ => ()
    }
    pushed = usable
    // everything stays residual: skipping is a pure optimisation, Spark
    // re-applies the predicates row-wise
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new GraftScan(root, snap, required, pushed, lsnLo, lsnHi)
}

final class GraftScan(root: String, snap: Snapshot, required: StructType, pushed: Array[Filter],
                      lsnLo: Long, lsnHi: Long) extends Scan with Batch {
  // snapshot-stored paths are root-relative (relocatable tables)
  private def resolve(p: String): String = if (p.startsWith("data/")) s"$root/$p" else p
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // file-level data skipping on the snapshot's per-file lsn stats
  private def liveFiles = snap.files.filter(f => f.maxLsn >= lsnLo && f.minLsn <= lsnHi)

  override def description(): String = {
    val total = snap.files.size
    s"graft v${snap.version} files=${liveFiles.size}/$total dvRows=${snap.dvRows} " +
      s"PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.catalogString}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // live deletion vectors: per-file dead-position sets, collected once at
    // plan time (sidecar volume is bounded by the dv-fraction compaction
    // policy) and shipped to each file's reader — rows at dead positions
    // are skipped during the scan, no join in the plan
    val dv = GraftScan.loadDvPositions(root, snap.dvFiles,
      SparkSession.active.sessionState.newHadoopConf())
    liveFiles.map { f =>
      GraftInputPartition(resolve(f.path),
        dv.getOrElse(GraftScan.relPath(f.path), Array.empty)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new GraftReaderFactory(required, conf)
  }
}

object GraftScan {
  def relPath(p: String): String = {
    val i = p.lastIndexOf("/data/")
    if (i >= 0) p.substring(i + 1) else p
  }

  /** driver-side load of the DV sidecars → relative data-file path →
    * sorted dead row indexes
    */
  def loadDvPositions(root: String, dvFiles: Seq[String],
                      conf: Configuration): Map[String, Array[Long]] = {
    if (dvFiles.isEmpty) return Map.empty
    val acc = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    dvFiles.foreach { f0 =>
      val f = if (f0.startsWith("data/")) s"$root/$f0" else f0
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      try {
        val fileSchema = reader.getFooter.getFileMetaData.getSchema
        val columnIO = new ColumnIOFactory().getColumnIO(fileSchema)
        var pages = reader.readNextRowGroup()
        while (pages != null) {
          val rr = columnIO.getRecordReader(pages, new GroupRecordConverter(fileSchema))
          var i = 0L
          while (i < pages.getRowCount) {
            val g = rr.read()
            acc.getOrElseUpdate(relPath(g.getString("file_path", 0)),
              scala.collection.mutable.ArrayBuffer.empty[Long]) += g.getLong("row_index", 0)
            i += 1
          }
          pages = reader.readNextRowGroup()
        }
      } finally reader.close()
    }
    acc.map { case (k, v) => k -> v.toArray.sorted }.toMap
  }
}

final case class GraftInputPartition(path: String, deadPositions: Array[Long])
  extends InputPartition

final class GraftReaderFactory(required: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new GraftPartitionReader(p.path, required, conf.value, p.deadPositions)
  }
}

/** Row-by-row parquet reader over the parquet-mr example Group API —
  * projection-pruned to the required columns (+ `deleted`, filtered here),
  * null-backfilling columns the file predates (schema evolution), skipping
  * rows whose file position is marked dead by a deletion vector.
  */
final class GraftPartitionReader(path: String, required: StructType, conf: Configuration,
                                 deadPositions: Array[Long] = Array.empty)
    extends PartitionReader[InternalRow] {

  private val dead: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](math.max(16, deadPositions.length * 2))
    deadPositions.foreach(p => s.add(p))
    s
  }
  private var rowOrdinal: Long = -1L // position within the file (all row groups)

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
  private val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema

  // projection = (required ∪ deleted) ∩ file columns; evolution gaps → null
  private val wanted: Seq[String] = (required.fieldNames :+ "deleted").distinct.toSeq
  private val present: Seq[String] = wanted.filter(fileSchema.containsField)
  private val projection: MessageType = {
    val types: Seq[org.apache.parquet.schema.Type] =
      present.map(n => fileSchema.getType(fileSchema.getFieldIndex(n)))
    new MessageType(fileSchema.getName, types: _*)
  }
  reader.setRequestedSchema(projection)

  private val fieldIdx: Map[String, Int] = present.zipWithIndex.toMap
  private val deletedIdx: Int = fieldIdx.getOrElse("deleted", -1)

  private var recordReader: org.apache.parquet.io.RecordReader[org.apache.parquet.example.data.Group] = _
  private var rowsLeftInGroup: Long = 0L
  private var current: InternalRow = _

  private def advanceRowGroup(): Boolean = {
    val pages = reader.readNextRowGroup()
    if (pages == null) false
    else {
      val columnIO = new ColumnIOFactory().getColumnIO(projection, fileSchema)
      recordReader = columnIO.getRecordReader(pages, new GroupRecordConverter(projection))
      rowsLeftInGroup = pages.getRowCount
      true
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (rowsLeftInGroup == 0 && !advanceRowGroup()) return false
      while (rowsLeftInGroup > 0) {
        rowsLeftInGroup -= 1
        rowOrdinal += 1
        val g = recordReader.read()
        // deletion-vector dead positions and tombstones are not part of
        // the user-facing table
        if (!dead.contains(rowOrdinal) &&
          (deletedIdx < 0 || g.getFieldRepetitionCount(deletedIdx) == 0 ||
            !g.getBoolean(deletedIdx, 0))) {
          current = toRow(g)
          return true
        }
      }
    }
    false
  }

  private def toRow(g: org.apache.parquet.example.data.Group): InternalRow = {
    val values = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      values(i) = fieldIdx.get(f.name) match {
        case Some(j) if g.getFieldRepetitionCount(j) > 0 =>
          f.dataType match {
            case StringType  => UTF8String.fromString(g.getString(j, 0))
            case LongType    => g.getLong(j, 0)
            case IntegerType => g.getInteger(j, 0)
            case DoubleType  => g.getDouble(j, 0)
            case BooleanType => g.getBoolean(j, 0)
            case other => throw new UnsupportedOperationException(
              s"graft scan: unsupported column type $other for ${f.name}")
          }
        case _ => null // file predates the column (additive evolution) or null value
      }
      i += 1
    }
    new GenericInternalRow(values)
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
