package graft.sources

import java.io.File
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 [[TableCatalog]] over graft-sink versioned tables — the
  * SQL half of the lakehouse surface. Registered via
  * `spark.sql.catalog.<name>=graft.sources.GraftCatalog` (+
  * `spark.sql.catalog.<name>.root=<dir>`), it maps `name.ns.tbl` to the
  * directory `<root>/ns/tbl` and serves the SAME [[GraftSinkTable]] the
  * path-based reads use — so every connector capability (versioned
  * commits, stats skipping, schema evolution, streaming) is reachable
  * from plain SQL:
  *
  *  - `SELECT ... FROM cat.ns.t` resolves the head snapshot;
  *    `VERSION AS OF n` pins a version (Spark routes it to
  *    `loadTable(ident, version)`), `TIMESTAMP AS OF ts` arrives as
  *    MICROseconds and resolves through the manifests' strictly-
  *    increasing commit clocks ([[GraftManifest.resolveTimestamp]]);
  *  - `INSERT INTO cat.ns.t ...` appends a new version through the
  *    connector's normal commit protocol (link(2)-CAS manifest claim);
  *  - `CREATE TABLE` commits version 1 as an EMPTY manifest carrying the
  *    declared schema DDL — the table is self-describing from birth, and
  *    a first INSERT appends version 2 without schema guessing;
  *  - `DROP TABLE` removes the directory (no external metastore state to
  *    reconcile — the manifest IS the metadata, so drop is local).
  *
  * No persistent catalog state exists outside the table directories:
  * `listTables` is a directory listing filtered to dirs with a committed
  * manifest. That is the design point — the catalog is a NAMING layer
  * over self-describing tables, exactly the posture a 100 TB object-store
  * layout wants (any engine that can read manifests can mount the same
  * root). */
class GraftCatalog extends TableCatalog {
  private var catName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog '$name' requires spark.sql.catalog.$name.root=<dir>"))
  }
  override def name(): String = catName

  private def dirOf(ident: Identifier): String =
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def load(ident: Identifier, version: Option[Int]): Table = {
    val path = dirOf(ident)
    val m = GraftManifest.readVersion(path, version).getOrElse(
      throw new NoSuchTableException(ident))
    new GraftSinkTable(path,
      m.schemaDdl.map(StructType.fromDDL).getOrElse(new StructType()), version)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toInt))
  /** SQL `TIMESTAMP AS OF` hands the catalog MICROseconds since epoch;
    * manifest commit clocks are millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, Some(GraftManifest.resolveTimestamp(dirOf(ident), timestamp / 1000L)))

  override def tableExists(ident: Identifier): Boolean =
    GraftManifest.versions(dirOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Option(new File((root +: namespace.toSeq).mkString("/")).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && GraftManifest.versions(f.getPath).nonEmpty)
      .map(f => Identifier.of(namespace, f.getName))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog: use the partitionBy WRITE option, not PARTITIONED BY")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // version 1 = empty manifest carrying the declared schema: the table
    // is self-describing before any row lands
    GraftManifest.commitMetas(dirOf(ident), Seq.empty, schema.toDDL,
      truncate = false)
    new GraftSinkTable(dirOf(ident), schema, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: schema evolves via the evolveSchema write option")

  override def dropTable(ident: Identifier): Boolean = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val d = new File(dirOf(ident))
    val existed = tableExists(ident)
    if (existed) rm(d)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog: rename not supported")
}
