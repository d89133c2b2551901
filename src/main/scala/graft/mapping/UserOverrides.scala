package graft.mapping

import graft.types._

/** User type-mapping overrides, loaded from a `mappings.toml`:
  *
  * {{{
  * [mappings]
  * nvarchar = "varchar(500)"
  * money = "decimal(19, 4) unsigned"
  * [mappings.columns]
  * "Orders.ID" = "int unsigned"
  * }}}
  *
  * Grammar and validation follow the reference
  * (/root/reference/src/mappings.rs:42-224): the value is
  * `base[(len)|(p[, s])] [unsigned] [zerofill]`; parenthesized params
  * only on types that accept them; lengths bounded by the base type's
  * max; unknown modifiers and unknown type names rejected; column keys
  * must be `Table.Column` and are matched case-insensitively.
  */
final case class UserOverrides(
    typeOverrides: Map[MssqlType, TypeMappingEntry],
    columnOverrides: Map[String, TypeMappingEntry])

object UserOverrides {
  val empty: UserOverrides = UserOverrides(Map.empty, Map.empty)

  /** Parse one override value, e.g. `"decimal(19, 4) unsigned"`. */
  def parseToType(spec: String, fromKey: String): Either[String, TypeMappingEntry] = {
    val s = spec.trim
    // Split "base(params) modifiers" — params may contain spaces, so
    // cut after ')' when present, else at the first whitespace.
    val (typePart, modifiersPart) = s.indexOf(')') match {
      case -1 => s.indexWhere(_.isWhitespace) match {
        case -1 => (s, "")
        case w => (s.take(w), s.drop(w))
      }
      case p => (s.take(p + 1), s.drop(p + 1))
    }
    val (baseStr, paramsOpt) = typePart.indexOf('(') match {
      case -1 => (typePart, None)
      case p => (typePart.take(p),
        Some(typePart.drop(p + 1).stripSuffix(")")))
    }

    MySqlBaseType.fromString(baseStr) match {
      case None => Left(
        s"Unknown MySQL type '$spec' in mapping from '$fromKey'. Valid types: " +
          MySqlBaseType.all.map(_.sqlName).mkString(", "))
      case Some(base) =>
        val withParams: Either[String, TypeMappingEntry] = paramsOpt match {
          case Some(params) if base.acceptsLength =>
            params.trim.toLongOption match {
              case None => Left(s"Invalid length '$params' in to_type '$spec'")
              case Some(len) =>
                val max = base.maxLength.get
                if (len > max || len < 0) Left(
                  s"Length $len exceeds maximum $max for type '${base.sqlName}'. " +
                    "Use longtext/longblob for unlimited.")
                else Right(TypeMappingEntry(base, carryLength = true,
                  defaultLength = Some(len)))
            }
          case Some(params) if base.acceptsPrecision =>
            val parts = params.split(',').map(_.trim)
            parts(0).toIntOption.filter(p => p >= 0 && p <= 255) match {
              case None => Left(s"Invalid precision '${parts(0)}' in to_type '$spec'")
              case Some(prec) =>
                val scale: Either[String, Option[Int]] =
                  if (parts.length > 1)
                    parts(1).toIntOption.filter(sc => sc >= 0 && sc <= 255) match {
                      case None => Left(s"Invalid scale '${parts(1)}' in to_type '$spec'")
                      case ok => Right(ok)
                    }
                  else Right(None)
                scale.map(sc => TypeMappingEntry(base, carryPrecision = true,
                  defaultPrecision = Some(prec), defaultScale = sc))
            }
          case Some(_) => Left(
            s"Type '${base.sqlName}' does not accept parameters, but got '$spec'")
          // No params: length/precision types still carry from source
          // with safe defaults (mappings.rs:190-200).
          case None if base.acceptsLength =>
            Right(TypeMappingEntry(base, carryLength = true, defaultLength = Some(255L)))
          case None if base.acceptsPrecision =>
            Right(TypeMappingEntry(base, carryPrecision = true,
              defaultPrecision = Some(10), defaultScale = Some(2)))
          case None => Right(TypeMappingEntry(base))
        }

        withParams.flatMap { entry0 =>
          val mods = modifiersPart.split("\\s+").filter(_.nonEmpty)
          mods.foldLeft[Either[String, TypeMappingEntry]](Right(entry0)) {
            case (acc, m) => acc.flatMap { e =>
              m.toLowerCase match {
                case "unsigned" => Right(e.copy(unsigned = true))
                case "zerofill" => Right(e.copy(zerofill = true))
                case other => Left(
                  s"Unknown modifier '$other' in to_type '$spec'. " +
                    "Supported modifiers: unsigned, zerofill")
              }
            }
          }.flatMap { e =>
            if ((e.unsigned || e.zerofill) && !base.acceptsUnsigned) Left(
              s"Type '${base.sqlName}' does not support unsigned/zerofill " +
                s"in to_type '$spec' for mapping from '$fromKey'")
            else Right(e)
          }
        }
    }
  }

  /** Parse a mappings.toml document (minimal TOML subset: the two
    * sections `[mappings]` / `[mappings.columns]` with string values;
    * that is the entire grammar the reference accepts, mappings.rs:42-105).
    */
  def fromToml(text: String): Either[String, UserOverrides] = {
    var section = ""
    var types = Map.empty[MssqlType, TypeMappingEntry]
    var columns = Map.empty[String, TypeMappingEntry]
    var sawMappings = false

    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && (t.head == '"' || t.head == '\'') && t.last == t.head)
        t.substring(1, t.length - 1)
      else t
    }

    for (rawLine <- text.linesIterator) {
      val line = graft.config.AppConfig.stripComment(rawLine).trim
      if (line.nonEmpty) {
        if (line.startsWith("[")) {
          section = line.stripPrefix("[").stripSuffix("]").trim
          // [mappings.columns] implicitly defines [mappings] in TOML —
          // the reference's serde parser accepts such a file, so the
          // bare sub-table header must count as seeing the section
          if (section == "mappings" || section.startsWith("mappings."))
            sawMappings = true
        } else {
          val eq = line.indexOf('=')
          if (eq < 0) return Left(s"Invalid line in mappings.toml: '$line'")
          val key = unquote(line.take(eq))
          val value = unquote(line.drop(eq + 1))
          section match {
            case "mappings" =>
              MssqlType.fromString(key) match {
                case None => return Left(
                  s"Unknown MSSQL type '$key'. Valid types: " +
                    MssqlType.all.map(_.sqlName).mkString(", "))
                case Some(t) => parseToType(value, key) match {
                  case Left(err) => return Left(err)
                  case Right(entry) => types += t -> entry
                }
              }
            case "mappings.columns" =>
              if (!key.contains('.')) return Left(
                s"""Invalid column override key '$key' — expected "Table.Column" format""")
              parseToType(value, key) match {
                case Left(err) => return Left(err)
                case Right(entry) => columns += key.toLowerCase -> entry
              }
            case other => return Left(s"Unknown section [$other] in mappings.toml")
          }
        }
      }
    }
    if (!sawMappings) Left("Missing [mappings] section")
    else Right(UserOverrides(types, columns))
  }
}
