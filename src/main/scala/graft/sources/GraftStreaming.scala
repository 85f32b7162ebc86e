package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.table.{Fs, Snapshot, SnapshotIO}

/** LSN offset of the CDC tail — the table's applied-LSN high watermark.
  * A micro-batch covers the half-open range (start, end].
  */
final case class GraftOffset(lsn: Long) extends Offset {
  override def json(): String = lsn.toString
}

/** graft lake tables as a STRUCTURED STREAMING SOURCE — a downstream
  * incremental consumer tails the table by LSN (the lake-side counterpart
  * of `LakeTable.readChangedSince`, SURVEY.md §2.1 S8 as a *source*):
  *
  * {{{ spark.readStream.format("graft")
  *       .option("changeFeed", "true")   // expose tombstones (+`deleted`)
  *       .option("startLsn", "1000")     // exclusive lower bound (default 0)
  *       .option("maxLsnsPerTrigger", "10000") // admission control
  *       .load(tableRoot) }}}
  *
  * Each micro-batch reads the files whose lsn range intersects
  * (startOffset, endOffset] — the same file-level skipping stats the batch
  * scan uses — and re-filters rows to the range, so a file straddling the
  * boundary never double-delivers. Offsets live in the stream checkpoint:
  * restart resumes exactly after the last committed batch.
  *
  * Delivery contract: every change still PRESENT in the current snapshot
  * for the range, exactly once per lsn. MergeOnRead tables deliver
  * per-commit winners with full fidelity (delta files are immutable);
  * CopyOnWrite/compaction can collapse a key's intermediate versions into
  * the final one before the tail reads them (the standard lake-CDC caveat —
  * Delta's change feed without CDF files behaves the same way). Deletes
  * surface only with `changeFeed=true`, as rows with `deleted = true`.
  */
final class GraftMicroBatchStream(root: String, required: StructType,
                                  options: Map[String, String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val conf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  private val startLsn = options.getOrElse("startlsn", "0").toLong
  private val maxPerTrigger = options.get("maxlsnspertrigger").map(_.toLong)

  private def fs = new Fs(conf.value)
  /** latest snapshot; a registered-but-unwritten table (no VERSION yet)
    * tails as empty from offset 0 instead of crashing the query
    */
  private def loadSnapshot(): Snapshot = {
    val f = fs
    if (!f.exists(s"$root/meta/VERSION"))
      return Snapshot(0, graft.model.Schemas.repoRow.toDDL, 32, Seq.empty, Map.empty, 0L, 0L)
    val v = graft.table.LakeTable.headVersion(f.exists, s"$root/meta",
      f.readString(s"$root/meta/VERSION").trim.toInt)
    SnapshotIO.read(f.readString(s"$root/meta/snap-$v.json"),
      mp => f.readString(s"$root/$mp"))
  }
  /** one snapshot load per trigger: latestOffset anchors it; the planning
    * and progress calls in the same trigger reuse it (3x fewer metadata
    * round-trips per micro-batch on object stores)
    */
  @volatile private var triggerSnap: Snapshot = _
  private def snapshot(): Snapshot = {
    val s = triggerSnap
    if (s != null) s else { val fresh = loadSnapshot(); triggerSnap = fresh; fresh }
  }

  override def initialOffset(): Offset = GraftOffset(startLsn)
  override def deserializeOffset(json: String): Offset = GraftOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  /** Trigger.AvailableNow pins the catch-up target at start, so the run
    * drains every commit present THEN (in maxLsnsPerTrigger-sized batches
    * when rate-limited) and stops — commits landing mid-run wait for the
    * next run.
    */
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    triggerSnap = loadSnapshot()
    availableNowTarget = Some(triggerSnap.hwm)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is used")

  override def reportLatestOffset(): Offset =
    GraftOffset(availableNowTarget.getOrElse(snapshot().hwm))

  /** rate-limited head: lsns are dense in WAL order, so capping the lsn
    * range bounds the batch volume like maxFilesPerTrigger bounds a file
    * tail
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    if (availableNowTarget.isEmpty) triggerSnap = loadSnapshot() // fresh anchor per trigger
    val hwm = availableNowTarget.getOrElse(triggerSnap.hwm)
    val from = start.asInstanceOf[GraftOffset].lsn
    maxPerTrigger match {
      case Some(n) => GraftOffset(math.min(hwm, from + n))
      case None    => GraftOffset(hwm)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GraftOffset].lsn // exclusive
    val hi = end.asInstanceOf[GraftOffset].lsn   // inclusive
    if (hi <= lo) return Array.empty
    val snap = snapshot()
    // same file-level lsn skipping the batch scan uses; the row-level
    // (lo, hi] re-filter in the reader makes boundary files exact
    snap.files.filter(f => f.maxLsn > lo && f.minLsn <= hi)
      .map(f => GraftStreamPartition(
        graft.table.LakeTable.resolveUnder(root, f.path), lo, hi): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory(required, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** one file of a stream micro-batch + the batch's lsn range (serialized to
  * the executor with the task)
  */
final case class GraftStreamPartition(file: String, lo: Long, hi: Long) extends InputPartition

final class GraftStreamReaderFactory(required: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftStreamPartition]
    new GraftStreamReader(p.file, required, conf.value, p.lo, p.hi)
  }
}

/** Row reader for one delta/data file in a stream batch: reads the required
  * columns plus the bookkeeping columns (`lsn` for the range re-filter,
  * `deleted` for tombstone handling) and emits exactly the required
  * columns. Tombstone rows flow through ONLY when the read schema carries
  * the `deleted` column (keyed off the SCHEMA, not the option: a consumer
  * without the flag — e.g. the catalog `readStream.table` path, or a
  * projection that pruned it — could not tell deletes from upserts, so it
  * gets the upsert-only feed).
  */
final class GraftStreamReader(path: String, required: StructType, conf: Configuration,
                              lo: Long, hi: Long)
    extends PartitionReader[InternalRow] {

  private val extraNames =
    Seq("lsn", "deleted").filterNot(required.fieldNames.contains)
  private val ext: Array[StructField] = required.fields ++ extraNames.map {
    case "lsn"     => StructField("lsn", LongType)
    case "deleted" => StructField("deleted", BooleanType)
  }
  private val lsnIdx = ext.indexWhere(_.name == "lsn")
  private val deletedIdx = ext.indexWhere(_.name == "deleted")
  private val exposeDeleted = required.fieldNames.contains("deleted")
  private val cursor = new GroupRowCursor(path, ext, conf)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (cursor.advance()) {
      val lsn = cursor.values(lsnIdx).asInstanceOf[Long]
      val del = cursor.values(deletedIdx)
      val isDel = del != null && del == true
      if (lsn > lo && lsn <= hi && (exposeDeleted || !isDel)) {
        current = new GenericInternalRow(java.util.Arrays.copyOfRange(
          cursor.values.asInstanceOf[Array[AnyRef]], 0, required.length).asInstanceOf[Array[Any]])
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = cursor.close()
}
