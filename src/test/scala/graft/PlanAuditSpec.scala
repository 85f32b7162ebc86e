package graft

import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.queries.RelationalQueries
import graft.table.{ApplyMode, LakeTable}

/** Physical-plan audits (the ".explain and iterate" contract): filters
  * reach the parquet scan, projections prune columns, small dims broadcast,
  * top-k avoids a global sort, and the merge resolve stage has exactly ONE
  * Exchange. These pin the plan shapes that make the engine scale; a
  * regression here is a performance bug even if results stay correct.
  */
class PlanAuditSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan (PushedFilters)") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_quantity") > 40).select("l_orderkey")
    val p = planOf(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"), p)
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val p = planOf(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("dim joins broadcast (no shuffle of the fact side for the join)") {
    val p = planOf(RelationalQueries.q3JoinAgg(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject (no global sort materialisation)") {
    val p = planOf(RelationalQueries.q2TopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("merge resolve stage contains exactly one Exchange") {
    val t = new LakeTable(spark, tmpDir("audit"), defaultBuckets = 8, ApplyMode.MergeOnRead)
    val wal = ChangeLogGen.changeLog(spark, GenConfig(seed = 9, events = 2000, repos = 8, filesPerRepo = 10))
    // reproduce the resolve plan shape the merge writes
    val b = pmod(xxhash64(col("repo"), col("path")), lit(8L)).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b", "repo", "path").orderBy(col("lsn").desc, col("commit").desc)
    val resolved = wal.withColumn("b", b).repartition(8, col("b"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
    val exchanges = "Exchange".r.findAllMatchIn(planOf(resolved)).size
    assert(exchanges == 1, planOf(resolved))
    // the SUB-SPLIT variant (bucket × key-salt shuffle, window partitioned
    // by (b, repo, path, salt) — salt LAST so file rows come out
    // (repo,path)-sorted, the MOR sorted-merge format) must also plan
    // exactly one Exchange: HashPartitioning(b, salt) satisfies the
    // window's clustering regardless of the key order
    val salt = pmod(xxhash64(col("repo"), col("path")), lit(4L)).cast("int")
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("b", "repo", "path", "__salt").orderBy(col("lsn").desc, col("commit").desc)
    val split = wal.withColumn("b", b).withColumn("__salt", salt)
      .repartition(32, col("b"), col("__salt"))
      .withColumn("__rn", row_number().over(ws)).where(col("__rn") === 1).drop("__rn", "__salt")
    assert("Exchange".r.findAllMatchIn(planOf(split)).size == 1, planOf(split))
    // and the real merge still works on top of that shape
    assert(t.merge(wal, "a", 0L).nonEmpty)
  }

  test("q52 substring dedup: hash joins only, no cartesian, no UDF") {
    val p = planOf(graft.queries.TextQueries.q52SubstringDedup(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gram dedup must stay equi-join shaped:\n" + p)
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"), p)
    // grams travel as 8-byte hashes — never the raw 64-char windows
    assert(p.contains("xxhash64"), p)
  }

  test("MV fold state join scans ONLY the delta buckets' files") {
    import graft.stream.IncrementalAgg
    // per-key MV over many buckets; the delta touches few keys, so the
    // fold's state join must open only those keys' buckets — the scale
    // property that keeps per-trigger IO O(MV ∩ touched), never O(MV)
    val t = new LakeTable(spark, tmpDir("mvprune"), defaultBuckets = 4,
      ApplyMode.MergeOnRead, defaultCdfFull = true)
    val wal = ChangeLogGen.changeLog(spark,
      GenConfig(seed = 21, events = 2000, repos = 8, filesPerRepo = 10))
    t.merge(wal.where(col("lsn") <= 1900), "pa", 0L)
    t.merge(wal.where(col("lsn") > 1900), "pa", 1L)
    val agg = IncrementalAgg.multi(spark, tmpDir("mvprune-mv"),
      concat_ws("/", col("repo"), col("path")),
      Seq("total" -> length(col("content"))), buckets = 64)
    agg.applyChanges(t.readChangesBetween(0L, 1900L), "pa-mv", 1900L)
    val delta = t.readChangesBetween(1900L)
    val bs = agg.deltaBuckets(delta, agg.mv.nBuckets)
    assert(bs.size < 64, s"fixture defect: delta must touch a strict subset, got ${bs.size}")
    val events = agg.eventsFor(delta)
    events.collect()
    // every MV file the plan reads belongs to a touched bucket
    val snap = agg.mv.currentSnapshot().get
    def rel(p: String) = p.substring(p.lastIndexOf("/data/") + 1)
    val allowed = snap.files.filter(f => bs(f.bucket)).map(_.path).toSet
    val scanned = events.inputFiles.filter(_.contains(agg.mv.root)).map(rel).toSet
    assert(scanned.nonEmpty, "the state join must read SOME MV state")
    assert(scanned.subsetOf(allowed),
      s"state join read outside the delta buckets: ${scanned.diff(allowed)}")
    // and far fewer files than the full MV holds
    assert(scanned.size < snap.files.size,
      s"no pruning: read ${scanned.size} of ${snap.files.size} MV files")
  }

  test("clean-stage categorisation stays in whole-stage codegen (no UDF)") {
    val wal = ChangeLogGen.changeLog(spark, GenConfig(seed = 9, events = 100, repos = 3, filesPerRepo = 5))
    val df = wal.select(graft.model.LangRules.langFor(col("path")).as("lang"))
    val p = planOf(df)
    assert(p.linesIterator.next().trim.startsWith("*("), p) // inside codegen
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }
}
