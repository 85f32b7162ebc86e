package graft.table

import org.apache.spark.sql.SparkSession

import graft.model.LangRules

/** Multi-tenant table catalog — the engine's analogue of the reference's
  * isolated city modules, each with its own config + data directories
  * (reference: docs/architecture.md:85-105,
  * cities/_template/config/city.yaml.template:1-30). Each tenant table
  * lives under `root/<name>/` with a properties file recording its layout
  * and the rule-table version it was created with (the reference's rules
  * files carry `version:` metadata, docs/data_layers.md:276-296) —
  * table properties instead of YAML dirs.
  *
  * All IO via the Hadoop FileSystem API — the catalog root may be any
  * registered scheme (`file:`, `hdfs:`, `s3a:`...).
  */
final class Catalog(spark: SparkSession, root: String) {

  private val fs = new Fs(spark.sessionState.newHadoopConf())
  private def propsPath(name: String) = s"$root/$name/table.properties.json"

  /** open-or-create: properties are written once at creation; later opens
    * take the stored layout (constructor args are creation defaults only).
    */
  def table(name: String, nBuckets: Int = 32,
            mode: ApplyMode.Value = ApplyMode.CopyOnWrite): LakeTable = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"bad table name: $name")
    val p = propsPath(name)
    if (!fs.exists(p)) {
      val json =
        s"""{"name":"$name","nBuckets":$nBuckets,"mode":"${LakeTable.modeName(mode)}","rulesVersion":"${LangRules.version}","format":"graft-lake-v1"}"""
      fs.atomicWrite(p, json)
    }
    val props = JsonMini.parse(fs.readString(p)).asInstanceOf[Map[String, Any]]
    new LakeTable(spark, s"$root/$name",
      SnapshotIO.asInt(props("nBuckets")),
      LakeTable.modeOf(props("mode").asInstanceOf[String]))
  }

  def properties(name: String): Map[String, Any] =
    JsonMini.parse(fs.readString(propsPath(name))).asInstanceOf[Map[String, Any]]

  def list(): Seq[String] =
    fs.listDirs(root)
      .map(d => new org.apache.hadoop.fs.Path(d).getName)
      .filter(n => fs.exists(propsPath(n)))
      .sorted

  /** register every tenant table as `<prefix><name>` temp views */
  def createViews(prefix: String = ""): Unit =
    list().foreach(n => table(n).createView(s"$prefix$n"))
}
