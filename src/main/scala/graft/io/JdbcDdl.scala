package graft.io

import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types.StructType

/** Dialect-resolved CREATE TABLE DDL for the JDBC sinks — the exact SQL
  * Spark's JDBC writer would issue on the first `SaveMode.Append` against
  * an absent table (reference target: a Postgres 15 instance,
  * data_persistance.py:48 `jdbc:postgresql://postgres:5432/iot_db`).
  *
  * The sandbox has no Postgres server, but the type mapping that decides
  * whether the first production run creates `TEXT` vs `VARCHAR`,
  * `FLOAT8` vs `DOUBLE`, `TIMESTAMP` vs `TIMESTAMPTZ` is pure driver-side
  * logic in Spark's `PostgresDialect` — so it IS pinnable here:
  * `JdbcSinkSpec` asserts the generated DDL for the three canonical
  * tables (readings / alerts / aggregates) byte-for-byte, and a Spark
  * upgrade that shifts a mapping fails the suite instead of surfacing as
  * a surprise schema in production.
  */
object JdbcDdl {

  /** Per-column `"name" TYPE` definitions, dialect-resolved the way
    * Spark's writer does: the dialect's override first
    * (`PostgresDialect.getJDBCType`), the common fallback second.
    */
  def columnDefs(url: String, schema: StructType): Seq[String] = {
    val dialect = JdbcDialects.get(url)
    schema.fields.toSeq.map { f =>
      val jt = dialect.getJDBCType(f.dataType)
        .orElse(JdbcUtils.getCommonJDBCType(f.dataType))
        .getOrElse(throw new IllegalArgumentException(
          s"no JDBC type for ${f.dataType.catalogString} in $url dialect"))
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"${dialect.quoteIdentifier(f.name)} ${jt.databaseTypeDefinition}$notNull"
    }
  }

  /** The full CREATE TABLE statement (Spark's writer shape: quoted
    * identifiers, comma-joined defs, no constraints — keys/indexes are
    * DBA-side DDL, applied after the fact exactly as the reference's
    * compose file does for its Postgres volume).
    */
  def createTableDdl(url: String, table: String, schema: StructType): String =
    s"CREATE TABLE $table (${columnDefs(url, schema).mkString(", ")})"
}
