package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Internals

import graft.table.LakeTable

/** SQL DML statements over graft tables — the round-3 "Missing" item: the
  * API surface had merge/updateWhere/deleteWhere, and SQL had INSERT and
  * (filter-convertible) DELETE, but an external SQL user could not express
  * an upsert or an update AS A STATEMENT. With the GraftExtensions
  * registered (spark.sql.extensions=graft.functions.GraftExtensions):
  *
  * {{{ UPDATE g.events SET content = 'x' WHERE repo = 'r' AND path = 'p'
  *     MERGE INTO g.events t USING updates s
  *       ON t.repo = s.repo AND t.path = s.path
  *       WHEN MATCHED AND s.op = 'D' THEN DELETE
  *       WHEN MATCHED THEN UPDATE SET content = s.content
  *       WHEN NOT MATCHED THEN INSERT (repo, path, content, ...) VALUES (...)
  *     DELETE FROM g.events WHERE length(path) > 40   -- any predicate }}}
  *
  * Implementation: a post-hoc resolution rule replaces the analyzed
  * UpdateTable / MergeIntoTable / DeleteFromTable plans with runnable
  * commands that route into the SAME distributed LakeTable paths every
  * other surface uses (updateWhere / merge / deleteWhere) — the Delta-style
  * analysis-rewrite shape, chosen over `SupportsRowLevelOperations` because
  * the engine's merge IS already a whole-plan distributed op with its own
  * exactly-once commit; per-task row-level writers cannot express it
  * (same argument as the V1Write handoff in GraftWrite). All data movement
  * stays fully distributed; victim scans bucket-prune on keyed predicates.
  *
  * MERGE semantics supported (the CDC-upsert canonical form; reference
  * precedent: the DB upsert path, docs/database.md:193-242):
  *  - ON must be exactly `t.repo = s.repo AND t.path = s.path` (any order/
  *    sides) — the key-equality join the bucket layout co-locates.
  *  - WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE, WHEN NOT
  *    MATCHED [AND cond] THEN INSERT ... — first applicable action wins
  *    (SQL order semantics).
  *  - `lang`/`contentSha` are derived invariants (recomputed by the merge);
  *    assigning them, or the key/bookkeeping columns, is rejected.
  *  - Multiple source rows hitting one key resolve deterministically
  *    through the engine's (lsn, commit, payload) tie-break rather than
  *    erroring — the WAL-replay contract applied to SQL.
  */
final class GraftDmlRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  /** the graft table behind a (possibly aliased) relation */
  private def graftTarget(plan: LogicalPlan): Option[(String, Seq[AttributeReference])] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some((t.root, r.output.map(_.asInstanceOf[AttributeReference])))
        case _ => None
      }
      case SubqueryAlias(_, child) => graftTarget(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table) match {
        case Some((root, tOut)) => rewriteUpdate(root, tOut, u)
        case None => plan
      }
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable) match {
        case Some((root, tOut)) => rewriteMerge(root, tOut, m)
        case None => plan
      }
    case d: DeleteFromTable if d.resolved =>
      // SupportsDelete covers filter-convertible conditions; this rewrite
      // extends SQL DELETE to ARBITRARY predicates (deleteWhere takes any
      // Column), same engine path either way
      graftTarget(d.table) match {
        case Some((root, _)) =>
          GraftDeleteCommand(root, Internals.column(byName(d.condition, Map.empty)))
        case None => plan
      }
    case _ => plan
  }

  /** resolved expression → by-NAME form applicable over a fresh read():
    * target attributes become `__t_<name>` when `targetNames` maps them
    * (the merge join frame), plain names otherwise
    */
  private def byName(e: Expression, targetNames: Map[ExprId, String]): Expression =
    e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute.quoted(targetNames.getOrElse(a.exprId, a.name))
    }

  private def assignmentName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case u: UnresolvedAttribute => u.name
    case other => throw new UnsupportedOperationException(
      s"graft DML: unsupported assignment target $other (only top-level columns)")
  }

  /** true when the assignment is the aligned identity no-op (col = col) */
  private def isIdentity(a: Assignment): Boolean = (a.key, a.value) match {
    case (k: AttributeReference, v: AttributeReference) => k.exprId == v.exprId
    case _ => false
  }

  private val derived = Set("lang", "contentsha")
  private val bookkeeping = Set("lsn", "commit")

  private def rewriteUpdate(root: String, tOut: Seq[AttributeReference],
                            u: UpdateTable): LogicalPlan = {
    val sets = u.assignments.filterNot(isIdentity).map { a =>
      val n = assignmentName(a)
      require(!derived(n.toLowerCase),
        s"graft UPDATE: '$n' is a derived invariant, recomputed by the merge — do not assign it")
      n -> Internals.column(byName(a.value, Map.empty))
    }.toMap
    // key/bookkeeping assignments fall through to updateWhere's own
    // validation (clear immutable-key error)
    val cond = u.condition.map(c => Internals.column(byName(c, Map.empty)))
      .getOrElse(lit(true))
    GraftUpdateCommand(root, cond, sets)
  }

  private def rewriteMerge(root: String, tOut: Seq[AttributeReference],
                           m: MergeIntoTable): LogicalPlan = {
    require(m.notMatchedBySourceActions.isEmpty,
      "graft MERGE: WHEN NOT MATCHED BY SOURCE is not supported (express it as a filter DELETE/UPDATE)")
    val tIds = tOut.map(_.exprId).toSet
    val sOut = m.sourceTable.output.map(_.asInstanceOf[AttributeReference])
    val sIds = sOut.map(_.exprId).toSet
    val tNames = tOut.map(a => a.exprId -> s"__t_${a.name}").toMap

    // ON must equality-join the two key columns, one side each
    def keyPair(e: Expression): Option[(String, String)] = e match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (tIds(a.exprId) && sIds(b.exprId)) Some((a.name.toLowerCase, b.name))
        else if (tIds(b.exprId) && sIds(a.exprId)) Some((b.name.toLowerCase, a.name))
        else None
      case _ => None
    }
    val pairs = {
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      conjuncts(m.mergeCondition).map(c => keyPair(c).getOrElse(
        throw new UnsupportedOperationException(
          "graft MERGE: ON must be exactly t.repo = s.repo AND t.path = s.path " +
            s"(got conjunct $c)"))).toMap
    }
    def onError(which: String) = new UnsupportedOperationException(
      s"graft MERGE: ON must be exactly t.repo = s.repo AND t.path = s.path " +
        s"(the key-equality join the bucket layout co-locates); target.$which is unbound")
    val srcRepo = pairs.getOrElse("repo", throw onError("repo"))
    val srcPath = pairs.getOrElse("path", throw onError("path"))

    val srcNames = sOut.map(_.name).toSet
    /** SET * / INSERT *: every non-derived target column the source also
      * carries, bound by NAME from the source side of the join frame
      */
    def starSets: Map[String, Column] =
      tOut.map(_.name).filterNot(n => derived(n.toLowerCase) || bookkeeping(n.toLowerCase))
        .filter(srcNames.contains)
        .map(n => n -> col(n)).toMap

    def explicitSets(assignments: Seq[Assignment], forInsert: Boolean,
                     fromStar: Boolean): Map[String, Column] = {
      // an INSERT * expansion assigns EVERY target column; a hand-written
      // list naming a derived column is (almost always) partial — only the
      // partial shape gets the dropped-assignment warning
      val coversAll = assignments.length >= tOut.length
      assignments.filterNot(a => !forInsert && isIdentity(a)).flatMap { a =>
        val n = assignmentName(a)
        val nl = n.toLowerCase
        // the analyzer expands SET * / INSERT * into one assignment per
        // target column from the same-named source column — including the
        // derived/bookkeeping/key columns a user may not set explicitly.
        // Those star-shaped assignments are DROPPED (derived invariants are
        // recomputed; commit/lsn are pinned by the as-of-now contract; in
        // UPDATE the keys equal the join keys anyway); an explicit
        // non-star assignment to them is an error. UPDATE actions carry the
        // analyzer's `fromStar` flag, so an EXPLICIT `SET lang = s.lang`
        // raises the documented error instead of being silently dropped;
        // InsertAction has no such flag, so INSERT falls back to the
        // same-name shape test — with a warning, since user intent is
        // ambiguous there.
        val nameShape = a.value match {
          case v: AttributeReference => v.name.equalsIgnoreCase(n)
          case _ => false
        }
        val starShape = fromStar || (forInsert && nameShape)
        if ((derived(nl) || bookkeeping(nl)) && starShape) {
          if (!fromStar && !coversAll) logWarning(
            s"graft MERGE: dropping INSERT assignment '$n = $n' — '$n' is " +
              "derived/bookkeeping and recomputed by the merge (indistinguishable " +
              "from an INSERT * expansion; remove the column to silence this)")
          None
        }
        else if (!forInsert && (nl == "repo" || nl == "path") && starShape) None
        else {
          require(!derived(nl) && !bookkeeping(nl),
            s"graft MERGE: '$n' is derived/bookkeeping (recomputed by the merge) — do not assign it")
          require(forInsert || (nl != "repo" && nl != "path"),
            s"graft MERGE: key column '$n' is immutable in UPDATE actions")
          Some(n -> Internals.column(byName(a.value, tNames)))
        }
      }.toMap
    }

    def condCol(c: Option[Expression]): Option[Column] =
      c.map(e => Internals.column(byName(e, tNames)))

    val matched: Seq[GraftMergeCommand.MAct] = m.matchedActions.map {
      case ua @ UpdateAction(c, as, _) =>
        GraftMergeCommand.MUpdate(condCol(c), explicitSets(as, forInsert = false, ua.fromStar))
      case u: UpdateStarAction => GraftMergeCommand.MUpdate(condCol(u.condition), starSets)
      case DeleteAction(c) => GraftMergeCommand.MDelete(condCol(c))
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported WHEN MATCHED action $other")
    }
    val notMatched: Seq[GraftMergeCommand.MAct] = m.notMatchedActions.map {
      case InsertAction(c, as) =>
        GraftMergeCommand.MInsert(condCol(c), explicitSets(as, forInsert = true, fromStar = false))
      case i: InsertStarAction => GraftMergeCommand.MInsert(condCol(i.condition), starSets)
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported WHEN NOT MATCHED action $other")
    }
    notMatched.foreach {
      case GraftMergeCommand.MInsert(_, sets) =>
        require(sets.contains("repo") && sets.contains("path"),
          "graft MERGE: INSERT must assign both key columns (repo, path)")
      case _ => ()
    }
    GraftMergeCommand(root, m.sourceTable, srcRepo, srcPath, matched, notMatched)
  }
}

/** SQL UPDATE → the distributed updateWhere path (bucket-pruned victim
  * scan, O(victims) writes in dv mode, same "as of now" lsn contract).
  */
final case class GraftUpdateCommand(root: String, cond: Column, sets: Map[String, Column])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new LakeTable(session, root).updateWhere(cond, sets)
    Seq.empty
  }
}

/** SQL DELETE (arbitrary predicate) → the distributed deleteWhere path. */
final case class GraftDeleteCommand(root: String, cond: Column)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    new LakeTable(session, root).deleteWhere(cond)
    Seq.empty
  }
}

/** SQL MERGE INTO → change events through the engine's native merge.
  *
  * Physical shape: source LEFT JOIN target-keys (the bucket-co-located
  * equi-join), first-applicable-action selection as a codegen'd CASE
  * chain, then `LakeTable.merge` — one distributed pass, no driver data.
  * Events carry lsn = hwm+1 with a '!'-prefixed commit id, the same
  * "as of now, never over the future" contract as updateWhere/deleteWhere.
  */
final case class GraftMergeCommand(root: String, source: LogicalPlan,
                                   srcRepo: String, srcPath: String,
                                   matched: Seq[GraftMergeCommand.MAct],
                                   notMatched: Seq[GraftMergeCommand.MAct])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    // statement-level conflict retry (Delta-style MERGE semantics): the
    // events pin lsn = base hwm+1 and join against the base's live state,
    // so a concurrent commit landing first would make the statement a
    // silent no-op — merge(requireVersion) detects that and we re-derive
    // the whole statement against the new head
    val cpId = s"merge-${LakeTable.newToken}"
    var attempts = 0
    while (true) {
      try { runOnce(session, cpId); return Seq.empty }
      catch {
        case e: graft.table.ConcurrentWriteException =>
          attempts += 1
          if (attempts >= 5) throw new graft.table.ConcurrentWriteException(
            s"graft MERGE: lost $attempts concurrent-commit races (${e.getMessage})")
      }
    }
    Seq.empty
  }

  private def runOnce(session: SparkSession, cpId: String): Unit = {
    import GraftMergeCommand._
    val lake = new LakeTable(session, root)
    val snap = lake.currentSnapshot().getOrElse(
      throw new IllegalStateException(s"graft MERGE: no table at $root"))
    val src = Internals.ofRows(session, source)
    val tgt = lake.read()
    val tgtKeyed = tgt.select(tgt.columns.map(c => col(c).as(s"__t_$c")).toSeq: _*)
    val joined = src.join(tgtKeyed,
      col(srcRepo) === col("__t_repo") && col(srcPath) === col("__t_path"), "left")
    val isMatched = col("__t_repo").isNotNull

    // first-applicable-action semantics: action k fires iff its guard holds
    // and no earlier guard held
    def guards(acts: Seq[MAct], base: Column): Seq[Column] = {
      var prior: Column = lit(false)
      acts.map { a =>
        val g = base && coalesce(a.cond.getOrElse(lit(true)), lit(false)) && !prior
        prior = prior || (base && coalesce(a.cond.getOrElse(lit(true)), lit(false)))
        g
      }
    }
    val mGuards = guards(matched, isMatched)
    val nGuards = guards(notMatched, !isMatched)
    val all: Seq[(Column, MAct)] = mGuards.zip(matched) ++ nGuards.zip(notMatched)
    val applies = all.map(_._1).reduceOption(_ || _).getOrElse(lit(false))

    def chain(value: MAct => Column): Column =
      all.foldRight(lit(null): Column) { case ((g, a), acc) =>
        when(g, value(a)).otherwise(acc)
      }
    // event key: the join key for matched actions, the INSERT assignment
    // for not-matched
    def keyCol(srcSide: String, name: String): MAct => Column = {
      case _: MUpdate | _: MDelete => col(srcSide)
      case MInsert(_, sets) => sets(name)
    }
    // payload columns: target's beyond the key/derived/bookkeeping core
    val extras = tgt.columns.toSeq
      .filterNot(Set("repo", "path", "commit", "lang", "content", "contentSha"))
      .filterNot(_ == "lsn")
    def payloadCol(name: String): MAct => Column = {
      case MUpdate(_, sets) => sets.getOrElse(name, col(s"__t_$name"))
      case _: MDelete       => lit(null)
      case MInsert(_, sets) => sets.getOrElse(name, lit(null))
    }
    val opCol: MAct => Column = {
      case _: MDelete => lit("D")
      case _          => lit("U")
    }
    // each payload CASE chain is cast to the TARGET column's type: an
    // action branch that doesn't assign an evolved column contributes
    // lit(null), and a chain whose every branch is lit(null) would
    // otherwise type as NullType and abort the merge's schema union
    // ("column type change StringType -> NullType")
    val tgtSchema = tgt.schema
    val events = joined.where(applies).select(
      Seq(
        lit(snap.hwm + 1).as("lsn"),
        chain(opCol).as("op"),
        chain(keyCol(srcRepo, "repo")).as("repo"),
        chain(keyCol(srcPath, "path")).as("path"),
        lit(s"!merge-v${snap.version + 1}").as("commit"),
        chain(payloadCol("content")).cast("string").as("content")
      ) ++ extras.map(x => chain(payloadCol(x)).cast(tgtSchema(x).dataType).as(x)): _*)
    lake.merge(events, cpId, 0L, Some(snap.version))
  }
}

object GraftMergeCommand {
  sealed trait MAct { def cond: Option[Column] }
  final case class MUpdate(cond: Option[Column], sets: Map[String, Column]) extends MAct
  final case class MDelete(cond: Option[Column]) extends MAct
  final case class MInsert(cond: Option[Column], sets: Map[String, Column]) extends MAct
}
