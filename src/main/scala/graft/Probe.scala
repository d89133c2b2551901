package graft

/** Dev scratchpad. Current probe: mssql-mode pipeline constraint DDL. */
object Probe {
  def main(args: Array[String]): Unit = {
    import graft.engine._
    import graft.mapping.TypeRegistry
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srcUrl = MssqlModeEngine.url("memory:probe_src;create=true")
    val dstUrl = "jdbc:derby:memory:probe_dst;create=true"
    val c = java.sql.DriverManager.getConnection(srcUrl)
    val st = c.createStatement()
    st.execute("CREATE TABLE [nation] ([n_nationkey] BIGINT NOT NULL PRIMARY KEY, [n_name] NVARCHAR(256) UNIQUE, [n_regionkey] BIGINT)")
    st.execute("INSERT INTO [nation] ([n_nationkey],[n_name],[n_regionkey]) VALUES (1, N'ALGERIA', 0), (2, N'BRAZIL', 1)")
    st.close(); c.close()
    val src = new MssqlSchemaSource(srcUrl)
    println("schema=" + src.getTableSchema("nation"))
    val m = new Migrator(spark, src, new JdbcTargetWriter(dstUrl, AnsiFlavor),
      TypeRegistry.withDefaults(),
      MigrationOptions(maxConcurrentTasks = 1, createConstraints = true))
    m.run()
    println("warnings=" + m.warnings.mkString(" | "))
    val (sql, _) = SqlDdl.createConstraints("nation",
      graft.mapping.TableSchemaMapper.mapSchema(TypeRegistry.withDefaults(),
        "nation", src.getTableSchema("nation"), format = false).toOption.get,
      Seq("nation"))
    println("ddl=" + sql)
    println("translated=" + sql.map(AnsiFlavor.translate))
    spark.stop()
  }
}
