package graft.engine

import graft.naming.SqlEscape.mysqlIdentifier
import graft.types.{Constraint, TargetColumn}

/** MySQL DDL/DML text builders
  * (/root/reference/src/insert/query.rs:6-135).
  */
object SqlDdl {

  /** `INSERT INTO t (c1, c2) VALUES` prefix (query.rs:6-18). */
  def insertStatement(table: String, schema: Seq[TargetColumn]): String = {
    val cols = schema.map(c => mysqlIdentifier(c.columnName)).mkString(", ")
    s"INSERT INTO ${mysqlIdentifier(table)} ($cols) VALUES"
  }

  /** `CREATE TABLE` with rendered types, inline PRIMARY KEY and
    * NULL/NOT NULL (query.rs:100-135).
    */
  def createTable(table: String, schema: Seq[TargetColumn]): String = {
    val pkCols = schema.filter(_.constraints.contains(Constraint.PrimaryKey))
    // reference parity renders a single PK inline (query.rs:114); a
    // COMPOSITE key must be a table-level clause instead — inline
    // 'PRIMARY KEY' on two columns is invalid DDL on every target
    // (the reference would emit it; we deviate to stay executable)
    val inlinePk = pkCols.size == 1
    val cols = schema.map { c =>
      val pk = if (inlinePk && c.constraints.contains(Constraint.PrimaryKey))
        " PRIMARY KEY" else ""
      val nullable = if (c.isNullable) "NULL" else "NOT NULL"
      s"${mysqlIdentifier(c.columnName)} ${c.dataType.toSql}$pk $nullable"
    }.mkString(", ")
    val tableClause = if (pkCols.size > 1)
      s", PRIMARY KEY (${pkCols.map(c => mysqlIdentifier(c.columnName)).mkString(", ")})"
    else ""
    s"CREATE TABLE ${mysqlIdentifier(table)} ($cols$tableClause)"
  }

  sealed trait ResetAction { def verb: String }
  case object Drop extends ResetAction { val verb = "DROP" }
  case object Truncate extends ResetAction { val verb = "TRUNCATE" }

  /** One `DROP TABLE x;` / `TRUNCATE TABLE x;` line per table
    * (query.rs:20-32).
    */
  def resetQuery(tables: Seq[String], action: ResetAction): String =
    tables.map(t => s"${action.verb} TABLE ${mysqlIdentifier(t)};").mkString("\n")

  /** Post-load constraint DDL (query.rs:34-98): one ALTER TABLE with
    * ADD FOREIGN KEY(...) REFERENCES ... ON DELETE CASCADE /
    * ADD UNIQUE / ADD CHECK / ADD DEFAULT clauses. FKs whose target
    * table was not migrated are skipped (returned in `_2` for the
    * caller's warning log); PRIMARY KEY is inline in CREATE, so it
    * never appears here. Returns None when nothing remains.
    */
  def createConstraints(
      table: String,
      schema: Seq[TargetColumn],
      migratedTables: Seq[String]): (Option[String], Seq[String]) = {

    val skipped = Vector.newBuilder[String]
    val clauses = schema.flatMap { c =>
      c.constraints.flatMap {
        case Constraint.ForeignKey(refTable, refCol) =>
          if (migratedTables.contains(refTable))
            Some("ADD FOREIGN KEY(" + mysqlIdentifier(c.columnName) +
              s") REFERENCES ${mysqlIdentifier(refTable)}(${mysqlIdentifier(refCol)})" +
              " ON DELETE CASCADE")
          else {
            skipped += s"${c.columnName} -> $refTable.$refCol"
            None
          }
        case Constraint.Unique =>
          Some(s"ADD UNIQUE(${mysqlIdentifier(c.columnName)})")
        case Constraint.Check(clause) => Some(s"ADD CHECK ($clause)")
        case Constraint.Default(v) => Some(s"ADD DEFAULT $v")
        case Constraint.PrimaryKey => None
      }
    }
    val sql =
      if (clauses.isEmpty) None
      else Some("SET FOREIGN_KEY_CHECKS=0; ALTER TABLE " +
        s"${mysqlIdentifier(table)} ${clauses.mkString(", ")}")
    (sql, skipped.result())
  }
}
