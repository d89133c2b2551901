package graft.types

import org.apache.spark.sql.types._

/** Per-column constraint carried through the migration
  * (/root/reference/src/common/constraints.rs:3-13). Spark's schema
  * model has no constraint objects, so these ride in StructField
  * metadata and come back out as ALTER TABLE DDL at the sink.
  */
sealed trait Constraint extends Product with Serializable

object Constraint {
  case object PrimaryKey extends Constraint
  final case class ForeignKey(referencedTable: String,
      referencedColumn: String) extends Constraint
  case object Unique extends Constraint
  final case class Check(clause: String) extends Constraint
  final case class Default(value: String) extends Constraint

  /** Parse the schema probe's constraint string
    * (constraints.rs:16-55): `"PRIMARY KEY"`,
    * `"FOREIGN KEY,tbl,col"`, `"UNIQUE"`, `"CHECK(...)"`,
    * `"DEFAULT x"`. Unrecognized strings are not constraints (None);
    * a malformed FOREIGN KEY is an error (Left).
    */
  def fromString(raw: String): Either[String, Option[Constraint]] = {
    val s = raw.trim
    if (s.isEmpty) Right(None)
    else if (s.startsWith("PRIMARY KEY")) Right(Some(PrimaryKey))
    else if (s.startsWith("FOREIGN KEY")) {
      s.split(',').map(_.trim) match {
        case Array(_, table, column) => Right(Some(ForeignKey(table, column)))
        case parts => Left(
          s"FOREIGN KEY constraint requires 3 comma-separated parts, got ${parts.length}")
      }
    }
    else if (s == "UNIQUE") Right(Some(Unique))
    else if (s.startsWith("CHECK")) {
      // Keep the predicate inside CHECK(...). The reference keeps the
      // raw "CHECK(pred" after stripping only trailing parens
      // (constraints.rs:47-49) — that renders invalid ALTER DDL, so
      // this engine deliberately extracts the balanced inner clause.
      val body = s.stripPrefix("CHECK").trim
      val clause =
        if (body.startsWith("(") && body.endsWith(")"))
          body.substring(1, body.length - 1).trim
        else body
      Right(Some(Check(clause)))
    }
    else if (s.startsWith("DEFAULT"))
      Right(Some(Default(s.stripPrefix("DEFAULT "))))
    else Right(None)
  }
}

/** Source column description, as fetched from
  * INFORMATION_SCHEMA.COLUMNS + the constraint probe
  * (/root/reference/src/common/schema.rs:8-17).
  * `characterMaximumLength == Some(-1)` encodes `(MAX)`.
  */
final case class ColumnSchema(
    columnName: String,
    dataType: MssqlType,
    characterMaximumLength: Option[Int] = None,
    numericPrecision: Option[Int] = None,
    numericScale: Option[Int] = None,
    isNullable: Boolean = true,
    constraints: Option[Constraint] = None)

/** Mapped target column (/root/reference/src/common/target_schema.rs:5-11),
  * extended with the Spark DataType our engine keeps values in.
  */
final case class TargetColumn(
    columnName: String,
    dataType: MySqlType,
    isNullable: Boolean,
    constraints: Option[Constraint]) {

  /** The Spark-side type this column flows through (SURVEY.md §1.2).
    * Decimals keep (p,s); unsigned bigint (rowversion) stays LongType —
    * MSSQL emits monotonic counters that fit (SURVEY.md §7.4); TIME is
    * carried as string because it round-trips poorly through JDBC.
    */
  def sparkType: DataType = dataType.baseType match {
    case MySqlBaseType.TinyInt => if (dataType.unsigned) ShortType else ByteType
    case MySqlBaseType.SmallInt => if (dataType.unsigned) IntegerType else ShortType
    case MySqlBaseType.Int => if (dataType.unsigned) LongType else IntegerType
    case MySqlBaseType.BigInt => LongType
    case MySqlBaseType.Decimal =>
      DecimalType(dataType.precision.getOrElse(10), dataType.scale.getOrElse(0))
    case MySqlBaseType.Float => DoubleType
    case MySqlBaseType.Real => FloatType
    case MySqlBaseType.Char | MySqlBaseType.Varchar | MySqlBaseType.Text |
        MySqlBaseType.LongText | MySqlBaseType.Time => StringType
    case MySqlBaseType.Binary | MySqlBaseType.VarBinary |
        MySqlBaseType.LongBlob => BinaryType
    case MySqlBaseType.DateTime | MySqlBaseType.Timestamp => TimestampType
    case MySqlBaseType.Date => DateType
  }

  def toStructField: StructField =
    StructField(columnName, sparkType, isNullable)
}

/** One type-mapping rule: which MySQL base type an MSSQL type lands on
  * and how length/precision/scale carry over
  * (/root/reference/src/common/type_mapping_entry.rs:6-15).
  */
final case class TypeMappingEntry(
    mysqlType: MySqlBaseType,
    carryLength: Boolean = false,
    carryPrecision: Boolean = false,
    defaultLength: Option[Long] = None,
    defaultPrecision: Option[Int] = None,
    defaultScale: Option[Int] = None,
    unsigned: Boolean = false,
    zerofill: Boolean = false)
