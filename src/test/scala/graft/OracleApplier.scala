package graft

import graft.model.LangRules

/** Sequential in-memory reference applier (SURVEY.md §5.2) — the ground
  * truth for replay-determinism / dedup / skew tests: a plain fold over the
  * change log in LSN order. Deliberately naive — no Spark, no parallelism.
  */
object OracleApplier {
  final case class Ev(lsn: Long, op: String, repo: String, path: String,
                      commit: String, content: String)
  final case class St(commit: String, lang: String, sha: String, lsn: Long, deleted: Boolean)

  def lang(path: String): String =
    LangRules.rules.collectFirst { case (s, l) if path.endsWith(s) => l }
      .getOrElse(LangRules.fallback)

  def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Final table state after replaying `events` in LSN order (events at or
    * below a key's applied LSN are ignored; deletes leave tombstones).
    */
  def replay(events: Seq[Ev]): Map[(String, String), St] =
    events.sortBy(e => (e.lsn, e.commit)).foldLeft(Map.empty[(String, String), St]) { (m, e) =>
      val k = (e.repo, e.path)
      // same total order as the engine: max (lsn, commit) wins
      if (m.get(k).exists(s => s.lsn > e.lsn || (s.lsn == e.lsn && s.commit >= e.commit))) m
      else m.updated(k, St(e.commit, lang(e.path),
        Option(e.content).map(sha256).orNull, e.lsn, e.op == "D"))
    }

  /** Live rows only, as a sorted seq of (repo, path, commit, lang, sha). */
  def liveRows(events: Seq[Ev]): Seq[(String, String, String, String, String)] =
    replay(events).collect { case ((r, p), st) if !st.deleted => (r, p, st.commit, st.lang, st.sha) }
      .toSeq.sorted
}
