package graft.types

/** The 29 MSSQL source column types the engine understands.
  *
  * Mirrors the reference's source-type enumeration
  * (/root/reference/src/common/mssql_type.rs:4-37); names are parsed
  * case-insensitively from INFORMATION_SCHEMA strings
  * (mssql_type.rs:40-73). MSSQL `timestamp` is a deprecated alias of
  * `rowversion` — an 8-byte row-modification counter, not a time value
  * (mssql_type.rs:32-35) — so it parses to [[MssqlType.RowVersion]].
  */
sealed abstract class MssqlType(val sqlName: String)
    extends Product with Serializable

object MssqlType {
  case object Bit extends MssqlType("bit")
  case object TinyInt extends MssqlType("tinyint")
  case object SmallInt extends MssqlType("smallint")
  case object Int extends MssqlType("int")
  case object BigInt extends MssqlType("bigint")
  case object Decimal extends MssqlType("decimal")
  case object Numeric extends MssqlType("numeric")
  case object Money extends MssqlType("money")
  case object SmallMoney extends MssqlType("smallmoney")
  case object Float extends MssqlType("float")
  case object Real extends MssqlType("real")
  case object Char extends MssqlType("char")
  case object NChar extends MssqlType("nchar")
  case object Varchar extends MssqlType("varchar")
  case object NVarchar extends MssqlType("nvarchar")
  case object Text extends MssqlType("text")
  case object NText extends MssqlType("ntext")
  case object Binary extends MssqlType("binary")
  case object VarBinary extends MssqlType("varbinary")
  case object Image extends MssqlType("image")
  case object Date extends MssqlType("date")
  case object DateTime extends MssqlType("datetime")
  case object DateTime2 extends MssqlType("datetime2")
  case object SmallDateTime extends MssqlType("smalldatetime")
  case object DateTimeOffset extends MssqlType("datetimeoffset")
  case object Time extends MssqlType("time")
  case object UniqueIdentifier extends MssqlType("uniqueidentifier")
  case object RowVersion extends MssqlType("timestamp")
  case object Xml extends MssqlType("xml")

  val all: Seq[MssqlType] = Seq(
    Bit, TinyInt, SmallInt, Int, BigInt, Decimal, Numeric, Money,
    SmallMoney, Float, Real, Char, NChar, Varchar, NVarchar, Text, NText,
    Binary, VarBinary, Image, Date, DateTime, DateTime2, SmallDateTime,
    DateTimeOffset, Time, UniqueIdentifier, RowVersion, Xml)

  private val byName: Map[String, MssqlType] =
    all.map(t => t.sqlName -> t).toMap

  /** Case-insensitive parse; None for unknown types (e.g. `geometry`),
    * which callers treat as a hard error (reference schema.rs:25-30).
    */
  def fromString(s: String): Option[MssqlType] =
    byName.get(s.trim.toLowerCase)
}
