package graft.table

/** Per-batch, per-partition lineage ledger (SURVEY.md §2.2 K5/K6) — the
  * engine's `run_info.json` (reference: stuttgart_comprehensive_script.py:870-889,
  * outputs/stuttgart_maps_030/run_info.json): which batch, which bucket,
  * how many rows, the applied-LSN high watermark. Written by the merge
  * JUST BEFORE the snapshot VERSION flip: a crash in between leaves the
  * batch uncommitted, the replay re-merges and overwrites the same entry
  * idempotently — ledger and table can never diverge.
  *
  * All IO via the Hadoop FileSystem API (HDFS/S3-capable, same store as the
  * table's data files).
  */
final class Ledger(root: String, fs: Fs) {
  import Ledger.Entry
  private val dir = s"$root/ledger"

  def record(e: Entry): Unit = {
    val buckets = e.buckets.map(b =>
      s"""{"bucket":${b.bucket},"rows":${b.rows},"minLsn":${b.minLsn},"maxLsn":${b.maxLsn}}"""
    ).mkString("[", ",", "]")
    val json =
      s"""{"checkpointId":"${e.cpId}","batchId":${e.batchId},"appliedLsnHwm":${e.appliedLsnHwm},"liveRows":${e.liveRows},"tombstoneRows":${e.tombstoneRows},"batchRows":${e.batchRows},"staleRows":${e.staleRows},"buckets":$buckets}"""
    fs.atomicWrite(s"$dir/entry-${Ledger.safeName(e.cpId)}-${e.batchId}.json", json)
  }

  def entries(): Seq[String] =
    fs.listFiles(dir, _.endsWith(".json")).map(fs.readString)
}

object Ledger {
  /** cpIds are caller-supplied: entry files must stay FLAT (entries() lists
    * one level) whatever characters the id carries. Mapping every illegal
    * character to '_' alone could COLLIDE distinct cpIds ("a/b" vs "a_b")
    * onto one entry file — one writer's lineage silently overwriting
    * another's — so a sanitized name also carries a short digest of the RAW
    * id. Clean ids keep their readable unsuffixed form (and their
    * pre-upgrade entry file names).
    */
  def safeName(cpId: String): String = {
    val safe = cpId.replaceAll("[^A-Za-z0-9_.-]", "_")
    if (safe == cpId) safe
    else {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(cpId.getBytes("UTF-8"))
      safe + "-" + d.take(4).map(b => f"$b%02x").mkString
    }
  }

  final case class Entry(cpId: String, batchId: Long, buckets: Seq[LakeTable.BucketStats],
                         appliedLsnHwm: Long, liveRows: Long = 0L, tombstoneRows: Long = 0L,
                         batchRows: Long = 0L, staleRows: Long = 0L)
}
