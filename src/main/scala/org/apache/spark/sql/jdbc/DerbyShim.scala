package org.apache.spark.sql
package jdbc

import java.sql.Types

import org.apache.spark.sql.types.{DataType, StringType}

/** Case-insensitive Derby dialect (the built-in one is package-private,
  * hence this shim lives inside the jdbc package, like graftshim.ColumnShim
  * does for the sql package).
  *
  * Spark's stock Derby dialect quotes every identifier, which makes
  * Spark-created tables case-SENSITIVE — raw user SQL (`UPDATE ledger SET
  * amt = ...`, always unquoted in the reference's script corpus,
  * web_scheduler.py:896-1026) then fails to resolve the quoted-lowercase
  * columns. The reference's engines fold unquoted identifiers
  * case-insensitively, so this dialect leaves plain identifiers unquoted
  * (Derby folds them to uppercase, matching unquoted lookups) and maps
  * StringType to a comparable VARCHAR instead of CLOB (Derby forbids CLOB
  * in predicates/GROUP BY — user SQL needs both). */
private[jdbc] class GraftDerbyDialect extends DerbyDialect {
  private val plain = "[A-Za-z][A-Za-z0-9_]*".r
  override def quoteIdentifier(colName: String): String = colName match {
    case plain() => colName
    case _ => super.quoteIdentifier(colName)
  }
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("VARCHAR(32672)", Types.VARCHAR))
    case _ => super.getJDBCType(dt)
  }
}

object DerbyShim {
  /** Swap the built-in Derby dialect for [[GraftDerbyDialect]]. Idempotent. */
  lazy val install: Unit = {
    JdbcDialects.unregisterDialect(DerbyDialect())
    JdbcDialects.registerDialect(new GraftDerbyDialect)
  }
}
