package graft.engine

import graft.naming.SqlEscape.mysqlIdentifier
import graft.types.{Constraint, TargetColumn}

/** MySQL DDL/DML text builders
  * (/root/reference/src/insert/query.rs:6-135).
  */
object SqlDdl {

  /** Split a `;`-joined DDL script into statements, honoring the
    * literal/identifier quoting of BOTH dialects this writer renders
    * (`'…''…'` strings, `"…"""…"` / `` `…``…` `` / `[…]]…]`
    * identifiers) — a probed CHECK clause or DEFAULT literal is free
    * to contain `;`, and a raw `split(';')` would cut it mid-statement
    * and execute corrupted SQL.
    */
  def splitStatements(sql: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var quote: Char = 0 // 0 = outside; else the CLOSING char we await
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (quote != 0) {
        sb += ch
        if (ch == quote) {
          // doubled closer = escaped (''  ""  ``  ]]) — stay inside
          if (i + 1 < sql.length && sql.charAt(i + 1) == quote) {
            sb += quote; i += 1
          } else quote = 0
        }
      } else ch match {
        case ';' => out += sb.toString; sb.clear()
        case '\'' | '"' | '`' => quote = ch; sb += ch
        case '[' => quote = ']'; sb += ch
        case c => sb += c
      }
      i += 1
    }
    out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

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

  /** A probed CHECK clause arrives in the SOURCE catalog's own
    * identifier quoting — ANSI double quotes (Derby's SYSCHECKS) or
    * MSSQL `[brackets]` (the INFORMATION_SCHEMA shim); the rendered
    * DDL is MySQL dialect, so requote identifiers to backticks —
    * masking single-quoted literals first so data is never touched.
    */
  private[engine] def mysqlizeClause(clause: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = clause.length
    while (i < n) clause.charAt(i) match {
      case '\'' => // literal: copy verbatim through the closing quote
        val end = {
          var j = i + 1
          while (j < n && !(clause.charAt(j) == '\'' &&
            (j + 1 >= n || clause.charAt(j + 1) != '\''))) {
            j += (if (clause.charAt(j) == '\'') 2 else 1)
          }
          math.min(j + 1, n)
        }
        sb.append(clause.substring(i, end)); i = end
      case '"' => // ANSI identifier -> backtick identifier
        val close = clause.indexOf('"', i + 1)
        if (close < 0) { sb.append(clause.substring(i)); i = n }
        else {
          sb.append('`').append(clause.substring(i + 1, close)).append('`')
          i = close + 1
        }
      case '[' => // MSSQL identifier -> backtick identifier
        val close = clause.indexOf(']', i + 1)
        if (close < 0) { sb.append(clause.substring(i)); i = n }
        else {
          sb.append('`').append(clause.substring(i + 1, close)).append('`')
          i = close + 1
        }
      case c => sb.append(c); i += 1
    }
    sb.toString
  }

  /** Post-load constraint DDL (query.rs:34-98): ADD FOREIGN KEY(...)
    * REFERENCES ... ON DELETE CASCADE / ADD UNIQUE / ADD CHECK /
    * column DEFAULT clauses. FKs whose target table was not migrated
    * are skipped (returned in `_2` for the caller's warning log);
    * PRIMARY KEY is inline in CREATE, so it never appears here.
    * Returns None when nothing remains.
    *
    * Deviation from the reference (like the composite-PK one in
    * [[createTable]]): the reference folds every clause into ONE
    * multi-action ALTER and renders DEFAULT as a bare `ADD DEFAULT v`
    * (query.rs:84-96) — neither executes on an ANSI target (and the
    * column-less DEFAULT on none). We emit one `;`-separated statement
    * per clause, with DEFAULT as standard
    * `ALTER COLUMN c SET DEFAULT v`, so the SAME rendered DDL runs on
    * both MySQL and ANSI targets.
    */
  def createConstraints(
      table: String,
      schema: Seq[TargetColumn],
      migratedTables: Seq[String]): (Option[String], Seq[String]) = {

    val t = mysqlIdentifier(table)
    val skipped = Vector.newBuilder[String]
    val clauses = schema.flatMap { c =>
      c.constraints.flatMap {
        case Constraint.ForeignKey(refTable, refCol) =>
          if (migratedTables.contains(refTable))
            Some(s"ALTER TABLE $t ADD FOREIGN KEY(" +
              mysqlIdentifier(c.columnName) +
              s") REFERENCES ${mysqlIdentifier(refTable)}(${mysqlIdentifier(refCol)})" +
              " ON DELETE CASCADE")
          else {
            skipped += s"${c.columnName} -> $refTable.$refCol"
            None
          }
        case Constraint.Unique =>
          Some(s"ALTER TABLE $t ADD UNIQUE(${mysqlIdentifier(c.columnName)})")
        case Constraint.Check(clause) =>
          Some(s"ALTER TABLE $t ADD CHECK (${mysqlizeClause(clause)})")
        case Constraint.Default(v) =>
          Some(s"ALTER TABLE $t ALTER COLUMN " +
            s"${mysqlIdentifier(c.columnName)} SET DEFAULT $v")
        case Constraint.PrimaryKey => None
      }
    }
    val sql =
      if (clauses.isEmpty) None
      else Some(("SET FOREIGN_KEY_CHECKS=0" +: clauses).mkString("; "))
    (sql, skipped.result())
  }
}
