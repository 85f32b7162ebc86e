package graft

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, Catalog}

/** Multi-tenant catalog: isolated tables, persisted properties, SQL views. */
class CatalogSpec extends SparkSpec {

  test("tenant tables are isolated, properties persist, views register") {
    val cat = new Catalog(spark, tmpDir("catalog"))
    val a = cat.table("tenant_a", nBuckets = 4, mode = ApplyMode.CopyOnWrite)
    val b = cat.table("tenant_b", nBuckets = 8, mode = ApplyMode.MergeOnRead)
    a.merge(ChangeLogGen.changeLog(spark, GenConfig(seed = 1, events = 500, repos = 4, filesPerRepo = 6)), "a", 0L)
    b.merge(ChangeLogGen.changeLog(spark, GenConfig(seed = 2, events = 700, repos = 4, filesPerRepo = 6)), "b", 0L)

    assert(cat.list() == Seq("tenant_a", "tenant_b"))
    assert(cat.properties("tenant_a")("rulesVersion") == graft.model.LangRules.version)
    // reopen with DIFFERENT defaults: properties win
    val b2 = cat.table("tenant_b", nBuckets = 64, mode = ApplyMode.CopyOnWrite)
    assert(b2.nBuckets == 8 && b2.mode == ApplyMode.MergeOnRead)
    // isolation: contents differ and views are queryable
    cat.createViews()
    val na = spark.sql("SELECT count(*) FROM tenant_a").collect().head.getLong(0)
    val nb = spark.sql("SELECT count(*) FROM tenant_b").collect().head.getLong(0)
    assert(na > 0 && nb > 0 && na != nb)
    // third apply mode persists through catalog properties too
    val c = cat.table("tenant_c", nBuckets = 4, mode = ApplyMode.DeletionVector)
    c.merge(ChangeLogGen.changeLog(spark, GenConfig(seed = 3, events = 400, repos = 3, filesPerRepo = 5)), "c", 0L)
    assert(cat.table("tenant_c", mode = ApplyMode.CopyOnWrite).mode == ApplyMode.DeletionVector)
    assert(cat.properties("tenant_c")("mode") == "dv")
  }
}
