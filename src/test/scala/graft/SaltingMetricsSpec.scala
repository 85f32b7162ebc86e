package graft

import org.apache.spark.sql.functions._

import graft.cdc.Salting
import graft.gen.{ChangeLogGen, GenConfig}
import graft.publish.Metrics
import graft.queries.CdcQueries
import graft.table.{ApplyMode, LakeTable}

/** Suite 5 (SURVEY.md §5.2): the salted two-phase aggregation gives
  * identical results to the plain aggregation on hot-key-skewed data, and
  * the publish metrics run over a real lake snapshot.
  */
class SaltingMetricsSpec extends SparkSpec {

  lazy val wal = ChangeLogGen.changeLog(spark,
    GenConfig(seed = 3, events = 8000, repos = 12, filesPerRepo = 20, hotShare = 0.5))

  lazy val lake: LakeTable = {
    val t = new LakeTable(spark, tmpDir("metrics"), 8, ApplyMode.CopyOnWrite)
    t.merge(wal, "m", 0L)
    t
  }

  test("salted count == plain count under 50% hot-repo skew") {
    val live = lake.read()
    val plain = live.groupBy("repo").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(live, Seq(col("repo")), fine = col("path"), salts = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // skew lives in the EVENT stream (one hot repo gets ~50% of events)
    val evCounts = wal.groupBy("repo").count().collect().map(_.getLong(1))
    assert(evCounts.max >= evCounts.sum * 2 / 5, "skew profile present")
  }

  test("salted multi-agg == plain multi-agg") {
    val live = lake.read()
    val plain = live.groupBy("repo")
      .agg(count(lit(1)).as("n_files"), sum(length(col("content"))).as("total_bytes"), max("lsn").as("max_lsn"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val salted = Metrics.repoSummary(lake)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(salted == plain)
  }

  test("publish metrics all produce sane frames") {
    assert(Metrics.langDistribution(lake).count() > 0)
    val ent = Metrics.langEntropyPerRepo(lake).collect()
    assert(ent.nonEmpty && ent.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= math.log(10)))
    assert(Metrics.contentDiversity(lake).count() > 0)
    val scores = Metrics.repoSizeScores(lake).collect()
    assert(scores.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(Metrics.ledgerTimeline(spark, lake).count() == 1)
  }
}
