package graft.types

/** The 18 MySQL base target types plus the fully-rendered type.
  *
  * Mirrors the reference's target-type model
  * (/root/reference/src/common/mysql_type.rs:4-158): capability
  * predicates decide which parameters a base type takes and
  * [[MySqlType.toSql]] renders the DDL fragment (`decimal(19, 4)
  * unsigned`).
  */
sealed abstract class MySqlBaseType(val sqlName: String)
    extends Product with Serializable {

  /** char/varchar/binary/varbinary take `(length)` (mysql_type.rs:73-78). */
  def acceptsLength: Boolean = this match {
    case MySqlBaseType.Char | MySqlBaseType.Varchar |
        MySqlBaseType.Binary | MySqlBaseType.VarBinary => true
    case _ => false
  }

  /** decimal/float/real take `(precision[, scale])` (mysql_type.rs:80-82). */
  def acceptsPrecision: Boolean = this match {
    case MySqlBaseType.Decimal | MySqlBaseType.Float | MySqlBaseType.Real => true
    case _ => false
  }

  /** Integer and numeric types take `unsigned`/`zerofill` (mysql_type.rs:84-95). */
  def acceptsUnsigned: Boolean = this match {
    case MySqlBaseType.TinyInt | MySqlBaseType.SmallInt | MySqlBaseType.Int |
        MySqlBaseType.BigInt | MySqlBaseType.Decimal | MySqlBaseType.Float |
        MySqlBaseType.Real => true
    case _ => false
  }

  /** Storage cap per length-typed base (mysql_type.rs:97-105). */
  def maxLength: Option[Long] = this match {
    case MySqlBaseType.Char | MySqlBaseType.Binary => Some(255L)
    case MySqlBaseType.Varchar | MySqlBaseType.VarBinary => Some(65535L)
    case _ => None
  }
}

object MySqlBaseType {
  case object TinyInt extends MySqlBaseType("tinyint")
  case object SmallInt extends MySqlBaseType("smallint")
  case object Int extends MySqlBaseType("int")
  case object BigInt extends MySqlBaseType("bigint")
  case object Decimal extends MySqlBaseType("decimal")
  case object Float extends MySqlBaseType("float")
  case object Real extends MySqlBaseType("real")
  case object Char extends MySqlBaseType("char")
  case object Varchar extends MySqlBaseType("varchar")
  case object Text extends MySqlBaseType("text")
  case object LongText extends MySqlBaseType("longtext")
  case object Binary extends MySqlBaseType("binary")
  case object VarBinary extends MySqlBaseType("varbinary")
  case object LongBlob extends MySqlBaseType("longblob")
  case object DateTime extends MySqlBaseType("datetime")
  case object Timestamp extends MySqlBaseType("timestamp")
  case object Date extends MySqlBaseType("date")
  case object Time extends MySqlBaseType("time")

  val all: Seq[MySqlBaseType] = Seq(
    TinyInt, SmallInt, Int, BigInt, Decimal, Float, Real, Char, Varchar,
    Text, LongText, Binary, VarBinary, LongBlob, DateTime, Timestamp,
    Date, Time)

  private val byName: Map[String, MySqlBaseType] =
    all.map(t => t.sqlName -> t).toMap

  def fromString(s: String): Option[MySqlBaseType] =
    byName.get(s.trim.toLowerCase)
}

/** A fully-rendered MySQL column type (mysql_type.rs:114-158). */
final case class MySqlType(
    baseType: MySqlBaseType,
    length: Option[Long] = None,
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    unsigned: Boolean = false,
    zerofill: Boolean = false) {

  /** DDL fragment, e.g. `varchar(255)`, `decimal(19, 4) unsigned`. */
  def toSql: String = {
    val sb = new StringBuilder(baseType.sqlName)
    if (baseType.acceptsLength) length.foreach(l => sb.append(s"($l)"))
    else if (baseType.acceptsPrecision) precision.foreach { p =>
      scale match {
        case Some(sc) => sb.append(s"($p, $sc)")
        case None => sb.append(s"($p)")
      }
    }
    if (baseType.acceptsUnsigned) {
      if (unsigned) sb.append(" unsigned")
      if (zerofill) sb.append(" zerofill")
    }
    sb.toString
  }

  override def toString: String = toSql
}
