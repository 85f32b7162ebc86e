package graft.source

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{ChangeEvent, Schemas}

/** Typed entry points over the WAL (north-star: `Dataset[ChangeEvent]`).
  * The declared schema replaces the reference's runtime column probing
  * (SURVEY.md §1.3); schema evolution happens PAST the typed envelope — an
  * evolved stream carries extra nullable columns that the untyped merge
  * path preserves (`LakeTable.merge` on the DataFrame view), while typed
  * consumers keep compiling against the stable core fields.
  */
object WalSource {

  /** batch read, lsn-ordered */
  def events(spark: SparkSession, walDir: String): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.read.schema(Schemas.changeEvent).parquet(walDir).as[ChangeEvent]
  }

  /** streaming tail (ordered segments; offset = file position) */
  def eventsStream(spark: SparkSession, walDir: String,
                   maxFilesPerTrigger: Int = 4): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(Schemas.changeEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(walDir)
      .as[ChangeEvent]
  }
}
