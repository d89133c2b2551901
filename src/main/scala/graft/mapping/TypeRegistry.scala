package graft.mapping

import java.util.concurrent.ConcurrentHashMap

import graft.types._

/** The MSSQL→MySQL type-mapping registry: 29 built-in defaults
  * (/root/reference/src/migrate/type_registry.rs:19-103) overlaid with
  * user type overrides and column-scoped overrides. Resolution
  * precedence is column override > type override > default
  * (type_registry.rs:105-129), with column keys matched
  * case-insensitively as "table.column" source names. Matched column
  * keys are tracked so stale/typo'd overrides can be reported after a
  * run (type_registry.rs:133-143).
  */
final class TypeRegistry private (
    defaults: Map[MssqlType, TypeMappingEntry],
    typeOverrides: Map[MssqlType, TypeMappingEntry],
    columnOverrides: Map[String, TypeMappingEntry]) {

  private val usedColumnKeys = ConcurrentHashMap.newKeySet[String]()

  /** Type-level lookup: override else default. */
  def get(t: MssqlType): TypeMappingEntry =
    typeOverrides.getOrElse(t, defaults(t))

  /** Column-level resolve: column override > type override > default. */
  def resolve(table: String, column: String, t: MssqlType): TypeMappingEntry = {
    val key = s"$table.$column".toLowerCase
    columnOverrides.get(key) match {
      case Some(entry) => usedColumnKeys.add(key); entry
      case None => get(t)
    }
  }

  /** Column override keys that never matched, sorted — surfaced as a
    * warning after migration (reference migrator.rs:80-87).
    */
  def unusedColumnOverrides: Seq[String] = {
    import scala.jdk.CollectionConverters._
    (columnOverrides.keySet -- usedColumnKeys.asScala).toSeq.sorted
  }

  def withUserOverrides(o: UserOverrides): TypeRegistry =
    new TypeRegistry(defaults, typeOverrides ++ o.typeOverrides,
      columnOverrides ++ o.columnOverrides.map { case (k, v) => k.toLowerCase -> v })
}

object TypeRegistry {
  import MySqlBaseType._

  private def simple(t: MySqlBaseType) = TypeMappingEntry(t)
  private def simpleUnsigned(t: MySqlBaseType) = TypeMappingEntry(t, unsigned = true)
  private def numeric(t: MySqlBaseType, p: Int, s: Int) =
    TypeMappingEntry(t, carryPrecision = true,
      defaultPrecision = Some(p), defaultScale = Some(s))
  private def withLength(t: MySqlBaseType, len: Long) =
    TypeMappingEntry(t, carryLength = true, defaultLength = Some(len))

  /** The 29 built-in defaults (type_registry.rs:19-103; table in
    * SURVEY.md §1.2). rowversion lands on bigint unsigned because it
    * is a modification counter, not a time (type_registry.rs:83-89).
    */
  val defaults: Map[MssqlType, TypeMappingEntry] = Map(
    MssqlType.Bit -> simple(TinyInt),
    MssqlType.TinyInt -> simple(TinyInt),
    MssqlType.SmallInt -> simple(SmallInt),
    MssqlType.Int -> simple(Int),
    MssqlType.BigInt -> simple(BigInt),
    MssqlType.Decimal -> numeric(Decimal, 10, 2),
    MssqlType.Numeric -> numeric(Decimal, 18, 0),
    MssqlType.Money -> numeric(Decimal, 19, 4),
    MssqlType.SmallMoney -> numeric(Decimal, 10, 2),
    MssqlType.Float -> simple(Float),
    MssqlType.Real -> simple(Real),
    MssqlType.Char -> withLength(Char, 1),
    MssqlType.NChar -> withLength(Char, 1),
    MssqlType.Varchar -> withLength(Varchar, 255),
    MssqlType.NVarchar -> simple(LongText),
    MssqlType.Text -> simple(Text),
    MssqlType.NText -> simple(LongText),
    MssqlType.Binary -> withLength(Binary, 1),
    MssqlType.VarBinary -> withLength(VarBinary, 255),
    MssqlType.Image -> simple(LongBlob),
    MssqlType.Date -> simple(Date),
    MssqlType.DateTime -> simple(DateTime),
    MssqlType.DateTime2 -> simple(DateTime),
    MssqlType.SmallDateTime -> simple(DateTime),
    MssqlType.DateTimeOffset -> simple(DateTime),
    MssqlType.Time -> simple(Time),
    MssqlType.RowVersion -> simpleUnsigned(BigInt),
    MssqlType.UniqueIdentifier -> withLength(Char, 36),
    MssqlType.Xml -> simple(LongText))

  def withDefaults(): TypeRegistry =
    new TypeRegistry(defaults, Map.empty, Map.empty)
}
