package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

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
  */
final class Catalog(spark: SparkSession, root: String) {

  private def propsPath(name: String) = Paths.get(root, name, "table.properties.json")

  /** open-or-create: properties are written once at creation; later opens
    * take the stored layout (constructor args are creation defaults only).
    */
  def table(name: String, nBuckets: Int = 32,
            mode: ApplyMode.Value = ApplyMode.CopyOnWrite): LakeTable = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"bad table name: $name")
    val p = propsPath(name)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      val json =
        s"""{"name":"$name","nBuckets":$nBuckets,"mode":"${if (mode == ApplyMode.MergeOnRead) "mor" else "cow"}","rulesVersion":"${LangRules.version}","format":"graft-lake-v1"}"""
      val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    val props = JsonMini.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .asInstanceOf[Map[String, Any]]
    new LakeTable(spark, s"$root/$name",
      props("nBuckets").asInstanceOf[Double].toInt,
      if (props("mode") == "mor") ApplyMode.MergeOnRead else ApplyMode.CopyOnWrite)
  }

  def properties(name: String): Map[String, Any] =
    JsonMini.parse(new String(Files.readAllBytes(propsPath(name)), StandardCharsets.UTF_8))
      .asInstanceOf[Map[String, Any]]

  def list(): Seq[String] = {
    val d = new java.io.File(root)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq.filter(f => f.isDirectory && Files.exists(propsPath(f.getName)))
      .map(_.getName).sorted
  }

  /** register every tenant table as `<prefix><name>` temp views */
  def createViews(prefix: String = ""): Unit =
    list().foreach(n => table(n).createView(s"$prefix$n"))
}
