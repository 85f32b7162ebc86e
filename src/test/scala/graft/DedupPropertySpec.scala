package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.table.LakeTable

/** Suite 4 (SURVEY.md §5.2), property-based (raw ScalaCheck generators,
  * fixed seeds → reproducible): for ANY set of events — any permutation,
  * duplicate LSNs, any op mix — the engine's latest-per-key equals
  * "max (lsn, commit) per key wins" (the sequential oracle), and is
  * invariant under permutation and partitioning.
  */
object DedupPropertySpec {
  // top-level so Spark can derive an Encoder (inner classes can't)
  case class Ev(lsn: Long, op: String, repo: String, path: String, commit: String, content: String)
}

class DedupPropertySpec extends SparkSpec {
  import spark.implicits._
  import DedupPropertySpec.Ev

  val genEv: Gen[Ev] = for {
    lsn <- Gen.chooseNum(1L, 40L) // small range → force lsn collisions
    op <- Gen.oneOf("I", "U", "D")
    repo <- Gen.oneOf("r1", "r2", "hot")
    path <- Gen.oneOf("a.py", "b.scala", "c.md", "d.sql")
    commit <- Gen.listOfN(8, Gen.hexChar).map(_.mkString.toLowerCase)
  } yield Ev(lsn, op, repo, path, commit, if (op == "D") null else s"src-$lsn-$commit")

  def sample(seed: Long, n: Int): List[Ev] =
    Gen.listOfN(n, genEv).apply(Gen.Parameters.default, Seed(seed)).get

  def oracle(evs: List[Ev]): Map[(String, String), (Long, String, Boolean)] =
    evs.sortBy(e => (e.lsn, e.commit)).foldLeft(Map.empty[(String, String), (Long, String, Boolean)]) {
      (m, e) =>
        val k = (e.repo, e.path)
        if (m.get(k).exists(s => s._1 > e.lsn || (s._1 == e.lsn && s._2 >= e.commit))) m
        else m.updated(k, (e.lsn, e.commit, e.op == "D"))
    }

  def engine(evs: List[Ev], parts: Int = 0): Map[(String, String), (Long, String, Boolean)] = {
    var df = evs.toDF()
      .withColumn("ts", timestamp_seconds(col("lsn")))
      .withColumn("deleted", col("op") === "D")
      .drop("op")
    if (parts > 0) df = df.repartition(parts)
    LakeTable.latestPerKey(df)
      .select("repo", "path", "lsn", "commit", "deleted")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getString(3), r.getBoolean(4))))
      .toMap
  }

  test("latestPerKey == sequential oracle for arbitrary event sets (15 seeds)") {
    (1L to 15L).foreach { seed =>
      val evs = sample(seed, 60)
      assert(engine(evs) == oracle(evs), s"seed=$seed")
    }
  }

  test("latestPerKey is permutation- and partitioning-invariant (8 seeds)") {
    (100L to 107L).foreach { seed =>
      val evs = sample(seed, 40)
      val base = engine(evs)
      assert(engine(evs.reverse) == base, s"seed=$seed reverse")
      assert(engine(scala.util.Random.javaRandomToRandom(new java.util.Random(seed)).shuffle(evs), 7) == base,
        s"seed=$seed shuffle+repartition")
    }
  }
}
