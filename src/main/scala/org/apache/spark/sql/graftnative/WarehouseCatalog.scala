package org.apache.spark.sql.graftnative

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 catalog over a graft parquet warehouse: resolves
  * `<catalog>.<schema...>.<table>` SQL references straight to the warehouse
  * directory layout (`warehouse/schema/table`), so the reference's
  * three-part table names work unchanged:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.acme_edw_dev",
  *   "org.apache.spark.sql.graftnative.WarehouseCatalog")
  * spark.conf.set("spark.sql.catalog.acme_edw_dev.warehouse", "/data/wh")
  * spark.sql("SELECT * FROM acme_edw_dev.edw_bronze.customer")
  * }}}
  *
  * Read path only — writes go through the pipeline's TableStore, which owns
  * the staging/swap commit protocol. Lives in this package to reuse Spark's
  * own `ParquetTable` (scan builder with pushdown/pruning — the same class
  * behind `spark.read.parquet`).
  */
class WarehouseCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires option 'spark.sql.catalog.$name.warehouse'"))
  }

  override def name(): String = catalogName

  private def dirFor(ident: Identifier): java.io.File =
    new java.io.File((warehouse +: ident.namespace :+ ident.name).mkString("/"))

  override def tableExists(ident: Identifier): Boolean = dirFor(ident).isDirectory

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    if (!dir.isDirectory)
      throw new NoSuchTableException(ident.namespace.toSeq :+ ident.name)
    val path = dir.getAbsolutePath
    ParquetTable(
      (ident.namespace :+ ident.name).mkString("."),
      SparkSession.active.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      new CaseInsensitiveStringMap(util.Map.of("path", path)),
      Seq(path),
      None,
      classOf[ParquetFileFormat])
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((warehouse +: namespace).mkString("/"))
    if (!dir.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !d.getName.startsWith(".") && !d.getName.contains("="))
      .map(d => Identifier.of(namespace, d.getName))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"catalog '$catalogName' is read-only; write through the pipeline store")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"catalog '$catalogName' is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(s"catalog '$catalogName' is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(s"catalog '$catalogName' is read-only")

  // ---------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new java.io.File(warehouse)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !d.getName.startsWith("."))
      .filter(d => Option(d.listFiles()).exists(_.exists(_.isDirectory)))
      .map(d => Array(d.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    new java.io.File((warehouse +: namespace).mkString("/")).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(s"catalog '$catalogName' is read-only")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"catalog '$catalogName' is read-only")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(s"catalog '$catalogName' is read-only")
}
