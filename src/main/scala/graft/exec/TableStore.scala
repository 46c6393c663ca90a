package graft.exec

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-backed table storage for pipeline targets (no Delta jars in the
  * environment — SURVEY §7). Tables are directories under a warehouse root.
  *
  * Concurrency/scale notes: appends go to unique part-files (Spark's normal
  * committer); `overwrite` swaps the directory atomically enough for a
  * single-writer-per-table discipline, which the runner enforces by
  * serializing flows per table (SURVEY §7.3c). A real deployment would swap
  * this for Delta/Iceberg commit protocols — the interface is the seam.
  */
final class TableStore(spark: SparkSession, val warehouse: String,
    /** Sandbox name remapping (the reference's dev-sandbox table rewriting,
      * core/sandbox/ — here a catalog-level mapping, no text rewriting):
      * every table name passes through before hitting storage. */
    nameMap: String => String = identity) {

  /** Storage path for a table, with the sandbox nameMap applied — the single
    * place table names resolve to directories (callers must never rebuild
    * this by hand or they bypass sandbox isolation). */
  def path(table: String): String = s"$warehouse/${nameMap(table).replace('.', '/')}"

  def exists(table: String): Boolean = Files.exists(Paths.get(path(table)))

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def readIfExists(table: String): Option[DataFrame] =
    if (exists(table)) Some(read(table)) else None

  def overwrite(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(table))
  }

  def append(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(table))
  }

  /** Upsert = anti-join rewrite (the parquet stand-in for Delta MERGE
    * `whenNotMatchedInsertAll` / full upsert — SURVEY §2.2 quarantine row).
    * The result is computed BEFORE the overwrite so the read and write of the
    * same table never race. */
  def upsert(table: String, updates: DataFrame, keys: Seq[String]): Unit = {
    readIfExists(table) match {
      case None => overwrite(table, updates)
      case Some(existing) =>
        val kept = existing.join(updates.select(keys.head, keys.tail: _*).distinct(),
          keys, "left_anti")
        val merged = kept.unionByName(updates, allowMissingColumns = true)
          .localCheckpoint(eager = true) // break lineage on the table being replaced
        overwrite(table, merged)
    }
  }

  /** Insert rows whose keys are absent (Delta `whenNotMatchedInsertAll`). */
  def insertIfAbsent(table: String, updates: DataFrame, keys: Seq[String]): Unit = {
    readIfExists(table) match {
      case None => overwrite(table, updates)
      case Some(existing) =>
        val fresh = updates.join(existing.select(keys.head, keys.tail: _*).distinct(), keys, "left_anti")
          .localCheckpoint(eager = true)
        append(table, fresh)
    }
  }

  /** Replace table contents with `df`, where `df` may derive from the current
    * table contents (lineage broken via localCheckpoint). */
  def replace(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    overwrite(table, df.localCheckpoint(eager = true), partitionBy)

  def drop(table: String): Unit = {
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(): Unit
    }
    val f = new java.io.File(path(table))
    if (f.exists()) rm(f)
  }

  /** Persist table properties as a JSON sidecar (the TBLPROPERTIES stand-in
    * for a catalog-less parquet warehouse). */
  def setProperties(table: String, props: Map[String, String]): Unit = if (props.nonEmpty) {
    val json = props.map { case (k, v) =>
      "\"" + k.replace("\"", "\\\"") + "\": \"" + v.replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val p = Paths.get(path(table) + "._properties.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p, json): Unit
  }

  def properties(table: String): Map[String, String] = {
    val p = Paths.get(path(table) + "._properties.json")
    if (!Files.exists(p)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      new org.yaml.snakeyaml.Yaml().load[Any](Files.readString(p)) match {
        case m: java.util.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
        case _ => Map.empty
      }
    }
  }

  def registerAll(): Unit = {
    val root = new java.io.File(warehouse)
    if (root.exists()) root.listFiles().filter(_.isDirectory).foreach { d =>
      spark.read.parquet(d.getAbsolutePath).createOrReplaceTempView(d.getName)
    }
  }
}
