package graft

import org.apache.spark.sql.functions._

import graft.queries.CdcQueries
import graft.table.{ApplyMode, LakeTable}

/** Stage-by-stage timing probe for the apply path (not part of the driver
  * contract; used to find where merge time goes).
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val walDir = args(0)
    val spark = BenchScaling.session(if (args.length > 1) args(1).toInt else 32)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val wal = spark.read.parquet(walDir)
    val n = time("full scan count")(wal.count())
    System.err.println(s"[probe] events=$n")
    time("scan+filter 1/8 count")(wal.where(col("lsn").between(1, n / 8)).count())
    time("scan+sha2+agg")(wal.agg(count(sha2(col("content"), 256))).collect())
    val t = new LakeTable(spark, s"${CdcQueries.LakeRoot}/probe", 32, ApplyMode.MergeOnRead)
    CdcQueries.deleteRec(s"${CdcQueries.LakeRoot}/probe")
    time("latestPerKey over full wal count") {
      LakeTable.latestPerKey(wal.withColumnRenamed("content", "content")).count()
    }
    time("merge batch 1/8")(t.merge(wal.where(col("lsn").between(1, n / 8)), "p", 0L))
    time("merge batch 2/8")(t.merge(wal.where(col("lsn").between(n / 8 + 1, 2 * n / 8)), "p", 1L))
    time("raw write parquet 1/8") {
      wal.where(col("lsn").between(1, n / 8)).write.mode("overwrite")
        .parquet(s"${CdcQueries.LakeRoot}/probe_raw")
    }
    CdcQueries.deleteRec(s"${CdcQueries.LakeRoot}/probe2")
    val t2 = new LakeTable(spark, s"${CdcQueries.LakeRoot}/probe2", 32, ApplyMode.MergeOnRead)
    time("fresh-table merge batch 1/8 (warm JVM)")(t2.merge(wal.where(col("lsn").between(1, n / 8)), "p2", 0L))
    // plan audit: the resolve stage must contain exactly ONE Exchange
    val resolvedPlan = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("b", "repo", "path").orderBy(col("lsn").desc, col("commit").desc)
      wal.withColumn("b", pmod(xxhash64(col("repo"), col("path")), lit(32L)).cast("int"))
        .repartition(32, col("b"))
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
    }
    val physical = resolvedPlan.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(physical).size
    System.err.println(s"[probe] resolve-stage Exchange count = $exchanges (want 1)")
    if (args.length > 2) System.err.println(physical)
    spark.stop()
  }
}
