package graft

import graft.gen.{ChangeLogGen, GenConfig}
import graft.model.ChangeEvent
import graft.source.WalSource

/** The typed Dataset[ChangeEvent] surface: compile-time field access, typed
  * transforms, and round-trip agreement with the untyped WAL read.
  */
class TypedApiSpec extends SparkSpec {

  test("Dataset[ChangeEvent] round-trips the WAL with typed field access") {
    val walDir = tmpDir("typedwal")
    val cfg = GenConfig(seed = 17, events = 2000, repos = 8, filesPerRepo = 10)
    ChangeLogGen.writeWal(spark, cfg, walDir, segments = 2)

    val ds = WalSource.events(spark, walDir)
    import spark.implicits._

    val deletes: Long = ds.filter((e: ChangeEvent) => e.op == "D").count()
    val untypedDeletes = spark.read.parquet(walDir).where("op = 'D'").count()
    assert(deletes == untypedDeletes && deletes > 0)

    // typed groupByKey aggregation
    val perRepo = ds.groupByKey(_.repo).count().collect().toMap
    assert(perRepo.values.sum == cfg.events)

    // typed max-lsn fold matches the declared event count
    val maxLsn = ds.map(_.lsn).reduce((a: Long, b: Long) => math.max(a, b))
    assert(maxLsn == cfg.events)

    // deletes carry null content; others carry the deterministic payload
    val bad = ds.filter((e: ChangeEvent) =>
      (e.op == "D" && e.content != null) || (e.op != "D" && e.content == null)).count()
    assert(bad == 0)
  }

  test("streaming typed tail feeds the same merge path") {
    val walDir = tmpDir("typedwal2")
    ChangeLogGen.writeWal(spark, GenConfig(seed = 18, events = 1000, repos = 5, filesPerRepo = 8), walDir, 2)
    val stream = WalSource.eventsStream(spark, walDir, maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    // file sources relax nullability; names and types must hold
    assert(stream.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      graft.model.Schemas.changeEvent.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
