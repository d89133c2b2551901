package graft

import graft.mapping.{TableSchemaMapper, TypeRegistry, UserOverrides}
import graft.types._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's type-registry, override-grammar and
  * schema-mapper test areas (type_registry.rs:211-465,
  * mappings.rs:226-568, table_schema_mapper.rs:120-392).
  */
class MappingSpec extends AnyFunSuite {

  // --- MssqlType / MySqlBaseType parsing ---

  test("all 29 mssql types parse case-insensitively") {
    assert(MssqlType.all.size == 29)
    for (t <- MssqlType.all) {
      assert(MssqlType.fromString(t.sqlName).contains(t))
      assert(MssqlType.fromString(t.sqlName.toUpperCase).contains(t))
    }
  }

  test("timestamp parses as rowversion; unknown types rejected") {
    assert(MssqlType.fromString("timestamp").contains(MssqlType.RowVersion))
    assert(MssqlType.fromString("geometry").isEmpty)
  }

  test("mysql type rendering") {
    assert(MySqlType(MySqlBaseType.Varchar, length = Some(255)).toSql == "varchar(255)")
    assert(MySqlType(MySqlBaseType.Decimal, precision = Some(19), scale = Some(4),
      unsigned = true).toSql == "decimal(19, 4) unsigned")
    assert(MySqlType(MySqlBaseType.BigInt, unsigned = true).toSql == "bigint unsigned")
    assert(MySqlType(MySqlBaseType.LongText).toSql == "longtext")
    // length ignored on types that don't accept it
    assert(MySqlType(MySqlBaseType.Text, length = Some(10)).toSql == "text")
  }

  // --- TypeRegistry ---

  test("every mssql type has a default mapping") {
    val reg = TypeRegistry.withDefaults()
    for (t <- MssqlType.all) reg.get(t) // must not throw
  }

  test("rowversion maps to bigint unsigned") {
    val e = TypeRegistry.withDefaults().get(MssqlType.RowVersion)
    assert(e.mysqlType == MySqlBaseType.BigInt && e.unsigned)
  }

  test("resolve precedence: column override > type override > default") {
    val typeOv = UserOverrides.parseToType("varchar(500)", "nvarchar")
      .toOption.get
    val colOv = UserOverrides.parseToType("int unsigned", "Orders.ID")
      .toOption.get
    val reg = TypeRegistry.withDefaults().withUserOverrides(
      UserOverrides(Map(MssqlType.NVarchar -> typeOv), Map("orders.id" -> colOv)))
    // column override wins, case-insensitively
    assert(reg.resolve("ORDERS", "Id", MssqlType.NVarchar).mysqlType == MySqlBaseType.Int)
    // type override beats default
    assert(reg.resolve("Other", "col", MssqlType.NVarchar).mysqlType == MySqlBaseType.Varchar)
    // default still applies elsewhere
    assert(reg.resolve("Other", "col", MssqlType.Int).mysqlType == MySqlBaseType.Int)
  }

  test("unused column overrides reported") {
    val colOv = UserOverrides.parseToType("int", "x").toOption.get
    val reg = TypeRegistry.withDefaults().withUserOverrides(
      UserOverrides(Map.empty,
        Map("orders.id" -> colOv, "users.name" -> colOv)))
    reg.resolve("Orders", "ID", MssqlType.Int)
    assert(reg.unusedColumnOverrides == Seq("users.name"))
  }

  // --- Override grammar ---

  test("grammar: plain type") {
    val e = UserOverrides.parseToType("longtext", "nvarchar").toOption.get
    assert(e.mysqlType == MySqlBaseType.LongText && !e.carryLength)
  }

  test("grammar: type with length") {
    val e = UserOverrides.parseToType("varchar(500)", "nvarchar").toOption.get
    assert(e.mysqlType == MySqlBaseType.Varchar && e.carryLength &&
      e.defaultLength.contains(500L))
  }

  test("grammar: decimal(19, 4) unsigned") {
    val e = UserOverrides.parseToType("decimal(19, 4) unsigned", "money").toOption.get
    assert(e.mysqlType == MySqlBaseType.Decimal && e.carryPrecision &&
      e.defaultPrecision.contains(19) && e.defaultScale.contains(4) && e.unsigned)
  }

  test("grammar: length-typed base without params carries with default 255") {
    val e = UserOverrides.parseToType("varchar", "nvarchar").toOption.get
    assert(e.carryLength && e.defaultLength.contains(255L))
  }

  test("grammar: precision-typed base without params defaults to (10,2)") {
    val e = UserOverrides.parseToType("decimal", "money").toOption.get
    assert(e.carryPrecision && e.defaultPrecision.contains(10) && e.defaultScale.contains(2))
  }

  test("grammar rejects: oversized length, params on paramless type, bad modifier, unsigned on text") {
    assert(UserOverrides.parseToType("varchar(70000)", "x").isLeft)
    assert(UserOverrides.parseToType("longtext(10)", "x").isLeft)
    assert(UserOverrides.parseToType("int banana", "x").isLeft)
    assert(UserOverrides.parseToType("text unsigned", "x").isLeft)
    assert(UserOverrides.parseToType("nosuchtype", "x").isLeft)
  }

  test("toml parse: sections, column keys, unknown type rejected") {
    val good =
      """# comment
        |[mappings]
        |nvarchar = "varchar(500)"
        |money = "decimal(19, 4) unsigned"
        |[mappings.columns]
        |"Orders.ID" = "int unsigned"
        |""".stripMargin
    val o = UserOverrides.fromToml(good).toOption.get
    assert(o.typeOverrides.size == 2)
    assert(o.columnOverrides.keySet == Set("orders.id"))

    assert(UserOverrides.fromToml("[mappings]\nbanana = \"int\"").isLeft)
    assert(UserOverrides.fromToml("[mappings.columns]\nnodot = \"int\"").isLeft)
    assert(UserOverrides.fromToml("[other]\nint = \"int\"").isLeft)

    // [mappings.columns] alone implicitly defines [mappings] in TOML —
    // the reference's serde parser accepts such a file
    val colsOnly = UserOverrides.fromToml(
      "[mappings.columns]\n\"Orders.ID\" = \"int unsigned\"").toOption.get
    assert(colsOnly.columnOverrides.keySet == Set("orders.id"))
  }

  // --- Constraints ---

  test("CHECK clause extracts the balanced inner predicate") {
    assert(Constraint.fromString("CHECK (age > 0)") ==
      Right(Some(Constraint.Check("age > 0"))))
    assert(Constraint.fromString("CHECK(len(x) > 0)") ==
      Right(Some(Constraint.Check("len(x) > 0"))))
  }

  test("constraint parsing") {
    assert(Constraint.fromString("PRIMARY KEY") == Right(Some(Constraint.PrimaryKey)))
    assert(Constraint.fromString("FOREIGN KEY,Users,ID") ==
      Right(Some(Constraint.ForeignKey("Users", "ID"))))
    assert(Constraint.fromString("UNIQUE") == Right(Some(Constraint.Unique)))
    assert(Constraint.fromString("DEFAULT 42") == Right(Some(Constraint.Default("42"))))
    assert(Constraint.fromString("") == Right(None))
    assert(Constraint.fromString("whatever") == Right(None))
    assert(Constraint.fromString("FOREIGN KEY,Users").isLeft)
  }

  // --- TableSchemaMapper ---

  private val reg = TypeRegistry.withDefaults()

  private def col(name: String, t: MssqlType,
      len: Option[Int] = None, prec: Option[Int] = None,
      scale: Option[Int] = None, nullable: Boolean = true,
      cons: Option[Constraint] = None) =
    ColumnSchema(name, t, len, prec, scale, nullable, cons)

  test("varchar(MAX) promotes to longtext, varbinary(MAX) to longblob") {
    val Right(out) = TableSchemaMapper.mapSchema(reg, "T", Seq(
      col("a", MssqlType.Varchar, len = Some(-1)),
      col("b", MssqlType.VarBinary, len = Some(-1))), format = false)
    assert(out(0).dataType.toSql == "longtext")
    assert(out(1).dataType.toSql == "longblob")
  }

  test("char(MAX) errors; over-max length errors") {
    assert(TableSchemaMapper.mapSchema(reg, "T",
      Seq(col("a", MssqlType.Char, len = Some(-1))), format = false).isLeft)
    assert(TableSchemaMapper.mapSchema(reg, "T",
      Seq(col("a", MssqlType.Char, len = Some(300))), format = false).isLeft)
  }

  test("length carries; missing length falls back to default") {
    val Right(out) = TableSchemaMapper.mapSchema(reg, "T", Seq(
      col("a", MssqlType.Varchar, len = Some(100)),
      col("b", MssqlType.Varchar)), format = false)
    assert(out(0).dataType.toSql == "varchar(100)")
    assert(out(1).dataType.toSql == "varchar(255)")
  }

  test("decimal carries p/s; out-of-range scale falls back to entry default") {
    val Right(out) = TableSchemaMapper.mapSchema(reg, "T", Seq(
      col("a", MssqlType.Decimal, prec = Some(12), scale = Some(3)),
      col("b", MssqlType.Decimal, prec = Some(12), scale = Some(300)),
      col("c", MssqlType.Money)), format = false)
    assert(out(0).dataType.toSql == "decimal(12, 3)")
    assert(out(1).dataType.toSql == "decimal(12, 2)") // scale 300 -> default 2
    assert(out(2).dataType.toSql == "decimal(19, 4)")
  }

  test("snake_case renames columns and FK targets; nullability preserved") {
    val Right(out) = TableSchemaMapper.mapSchema(reg, "UserAccounts", Seq(
      col("AccountId", MssqlType.Int, nullable = false,
        cons = Some(Constraint.ForeignKey("UserAccounts", "AccountId")))),
      format = true)
    assert(out.head.columnName == "account_id")
    assert(!out.head.isNullable)
    assert(out.head.constraints.contains(
      Constraint.ForeignKey("user_accounts", "account_id")))
  }

  test("snake_case renames quoted identifiers inside CHECK clauses") {
    val Right(out) = TableSchemaMapper.mapSchema(reg, "SupplierFacts", Seq(
      col("AcctBal", MssqlType.Int,
        cons = Some(Constraint.Check("[AcctBal] > -10000")))),
      format = true)
    assert(out.head.constraints.contains(
      Constraint.Check("[acct_bal] > -10000")))
    // ANSI-quoted catalogs rename too; literals and bare words do not
    assert(TableSchemaMapper.renameClauseIdents(
      """"GradeLevel" BETWEEN 0 AND 5 OR "Tag" = 'Keep [MixedCase]'""")
      == """"grade_level" BETWEEN 0 AND 5 OR "tag" = 'Keep [MixedCase]'""")
  }

  test("spark schema emission") {
    val Right(out) = TableSchemaMapper.mapSchema(reg, "T", Seq(
      col("id", MssqlType.Int, nullable = false),
      col("price", MssqlType.Money),
      col("name", MssqlType.NVarchar),
      col("data", MssqlType.VarBinary, len = Some(-1)),
      col("at", MssqlType.DateTime2),
      col("ver", MssqlType.RowVersion)), format = false)
    val st = TableSchemaMapper.toStructType(out)
    assert(st == StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("price", DecimalType(19, 4)),
      StructField("name", StringType),
      StructField("data", BinaryType),
      StructField("at", TimestampType),
      StructField("ver", LongType))))
    assert(TableSchemaMapper.createTableColumnTypes(out) ==
      "id int, price decimal(19, 4), name longtext, data longblob, at datetime, ver bigint unsigned")
  }
}
