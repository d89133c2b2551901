package graft.mapping

import graft.naming.SnakeCase
import graft.types._
import org.apache.spark.sql.types.StructType

/** Source schema → target schema mapping, the reference's core
  * "expression engine" (/root/reference/src/migrate/table_schema_mapper.rs:13-117):
  *
  *  - resolve each column through the registry (against SOURCE names,
  *    before any renaming);
  *  - optional snake_case renaming of columns and FK targets;
  *  - length carry-over with `(MAX)` (= -1) promotion: varchar →
  *    longtext, varbinary → longblob, anything else is an error
  *    (:37-53); lengths above the base type's max are an error (:54-65);
  *  - precision/scale carry-over with fallback to entry defaults and a
  *    safe int→(0..255) scale conversion (:74-87);
  *  - nullability and constraints preserved.
  */
object TableSchemaMapper {

  def mapSchema(
      registry: TypeRegistry,
      tableName: String,
      sourceSchema: Seq[ColumnSchema],
      format: Boolean): Either[String, Seq[TargetColumn]] = {

    val out = Vector.newBuilder[TargetColumn]
    for (column <- sourceSchema) {
      val entry = registry.resolve(tableName, column.columnName, column.dataType)
      val name = if (format) SnakeCase(column.columnName) else column.columnName

      var base = entry.mysqlType
      val length: Either[String, Option[Long]] =
        if (!entry.carryLength) Right(None)
        else column.characterMaximumLength match {
          case Some(-1) => base match {
            case MySqlBaseType.Varchar => base = MySqlBaseType.LongText; Right(None)
            case MySqlBaseType.VarBinary => base = MySqlBaseType.LongBlob; Right(None)
            case other => Left(
              s"Column '${column.columnName}' has MAX length (-1) but is mapped to " +
                s"'${other.sqlName}' which requires a fixed length. Use an override to map " +
                s"'${column.dataType.sqlName}' to longtext or longblob instead.")
          }
          case Some(len) if len > 0 =>
            entry.mysqlType.maxLength match {
              case Some(max) if len > max => Left(
                s"Column '${column.columnName}' length $len exceeds MySQL " +
                  s"${entry.mysqlType.sqlName} max length $max. " +
                  "Use an override to map to longtext/longblob.")
              case _ => Right(Some(len.toLong))
            }
          case _ => Right(entry.defaultLength)
        }

      length match {
        case Left(err) => return Left(err)
        case Right(len) =>
          val precision =
            if (entry.carryPrecision)
              column.numericPrecision.orElse(entry.defaultPrecision)
            else None
          val scale =
            if (entry.carryPrecision)
              column.numericScale.filter(s => s >= 0 && s <= 255)
                .orElse(entry.defaultScale)
            else None

          val constraints = column.constraints.map {
            case Constraint.ForeignKey(t, c) if format =>
              Constraint.ForeignKey(SnakeCase(t), SnakeCase(c))
            case Constraint.Check(text) if format =>
              // the clause text references SOURCE column names; under
              // snake_case renaming the emitted ALTER would name a
              // column that no longer exists (and, per-table constraint
              // DDL being one transaction, roll back the table's other
              // constraints with it) — rename quoted identifiers inside
              // the clause like the FK refs above
              Constraint.Check(renameClauseIdents(text))
            case other => other
          }

          out += TargetColumn(
            columnName = name,
            dataType = MySqlType(base, len, precision, scale,
              entry.unsigned, entry.zerofill),
            isNullable = column.isNullable,
            constraints = constraints)
      }
    }
    Right(out.result())
  }

  /** snake_case every quoted identifier inside a constraint clause —
    * `[Name]` (MSSQL probe text) and `"Name"` (ANSI catalog text)
    * spans, with their `]]` / `""` escapes — leaving single-quoted
    * string literals untouched. Bare words are NOT renamed: they may
    * be SQL keywords/functions, and both catalogs quote identifiers
    * in the constraint text they store.
    */
  private[graft] def renameClauseIdents(clause: String): String = {
    val sb = new StringBuilder(clause.length)
    var i = 0
    val n = clause.length
    def spanTo(open: Char, close: Char): Unit = {
      val inner = new StringBuilder
      i += 1
      var done = false
      while (!done && i < n) clause.charAt(i) match {
        case c if c == close && i + 1 < n && clause.charAt(i + 1) == close =>
          inner.append(close); i += 2
        case c if c == close => done = true; i += 1
        case c => inner.append(c); i += 1
      }
      val renamed = SnakeCase(inner.toString)
      sb.append(open)
        .append(renamed.replace(close.toString, close.toString * 2))
        .append(close)
    }
    while (i < n) clause.charAt(i) match {
      case '\'' => // literal: copy verbatim through the closing quote
        sb.append('\'')
        i += 1
        var done = false
        while (!done && i < n) clause.charAt(i) match {
          case '\'' if i + 1 < n && clause.charAt(i + 1) == '\'' =>
            sb.append("''"); i += 2
          case '\'' => sb.append('\''); done = true; i += 1
          case c => sb.append(c); i += 1
        }
      case '[' => spanTo('[', ']')
      case '"' => spanTo('"', '"')
      case c => sb.append(c); i += 1
    }
    sb.toString
  }

  /** Spark read/write schema for a mapped table. */
  def toStructType(cols: Seq[TargetColumn]): StructType =
    StructType(cols.map(_.toStructField))

  /** Value for the Spark JDBC writer's `createTableColumnTypes` option:
    * a comma-separated `name type` list in target-database DDL terms.
    */
  def createTableColumnTypes(cols: Seq[TargetColumn]): String =
    cols.map(c => s"${c.columnName} ${c.dataType.toSql}").mkString(", ")
}
