package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Per-batch, per-partition lineage ledger (SURVEY.md §2.2 K5/K6) — the
  * engine's `run_info.json` (reference: stuttgart_comprehensive_script.py:870-889,
  * outputs/stuttgart_maps_030/run_info.json): which batch, which bucket,
  * how many rows, the applied-LSN high watermark. Written by the merge
  * JUST BEFORE the snapshot VERSION flip: a crash in between leaves the
  * batch uncommitted, the replay re-merges and overwrites the same entry
  * idempotently — ledger and table can never diverge.
  */
final class Ledger(root: String) {
  import Ledger.Entry
  private val dir = Paths.get(root, "ledger")

  def record(e: Entry): Unit = {
    Files.createDirectories(dir)
    val buckets = e.buckets.map(b =>
      s"""{"bucket":${b.bucket},"rows":${b.rows},"minLsn":${b.minLsn},"maxLsn":${b.maxLsn}}"""
    ).mkString("[", ",", "]")
    val json =
      s"""{"checkpointId":"${e.cpId}","batchId":${e.batchId},"appliedLsnHwm":${e.appliedLsnHwm},"liveRows":${e.liveRows},"tombstoneRows":${e.tombstoneRows},"batchRows":${e.batchRows},"staleRows":${e.staleRows},"buckets":$buckets}"""
    val path = dir.resolve(s"entry-${e.cpId}-${e.batchId}.json")
    val tmp = dir.resolve(s"entry-${e.cpId}-${e.batchId}.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def entries(): Seq[String] = {
    if (!Files.exists(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
        .map(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      finally s.close()
    }
  }
  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}

object Ledger {
  final case class Entry(cpId: String, batchId: Long, buckets: Seq[LakeTable.BucketStats],
                         appliedLsnHwm: Long, liveRows: Long = 0L, tombstoneRows: Long = 0L,
                         batchRows: Long = 0L, staleRows: Long = 0L)
}
