package graft

/** Dev scratchpad. Current probe: Derby SYS.SYSCHECKS shape. */
object Probe {
  def main(args: Array[String]): Unit = {
    val url = "jdbc:derby:memory:probechk;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE WIDGETS (
        |  W_ID BIGINT NOT NULL PRIMARY KEY,
        |  W_SKU VARCHAR(20) NOT NULL UNIQUE,
        |  W_GRADE INTEGER CHECK (W_GRADE BETWEEN 0 AND 5),
        |  W_STATE VARCHAR(10) DEFAULT 'new')""".stripMargin)
    println("schema=" + c.getSchema)
    val rs = st.executeQuery(
      """SELECT ck.CHECKDEFINITION, ck.REFERENCEDCOLUMNS, t.TABLENAME, s.SCHEMANAME
        |FROM SYS.SYSCHECKS ck
        |JOIN SYS.SYSCONSTRAINTS cons ON ck.CONSTRAINTID = cons.CONSTRAINTID
        |JOIN SYS.SYSTABLES t ON cons.TABLEID = t.TABLEID
        |JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID""".stripMargin)
    while (rs.next()) {
      val o = rs.getObject(2)
      println(s"def=${rs.getString(1)} tbl=${rs.getString(3)} sch=${rs.getString(4)} refcols=${o} cls=${if (o == null) "null" else o.getClass.getName}")
      if (o != null) {
        try {
          val m = o.getClass.getMethod("getReferencedColumnPositions")
          println("positions=" + m.invoke(o).asInstanceOf[Array[Int]].toSeq)
        } catch { case e: Throwable => println("reflect fail: " + e) }
      }
    }
    rs.close(); st.close(); c.close()
  }
}
