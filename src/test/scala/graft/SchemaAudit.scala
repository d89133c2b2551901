package graft
import org.apache.spark.sql.SparkSession
/** Dev audit main: list every query whose output schema falls outside
  * the driver-verifiable envelope. Delegates to THE check
  * ([[Verify.envelopeViolations]] — recursive, path-labeled) so this
  * tool can never drift from what Verify actually enforces.
  */
object SchemaAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val bad = Verify.envelopeViolations(fn(spark, dir).schema)
        if (bad.nonEmpty) println(s"OUTSIDE $name: ${bad.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}")
      }
    }
    println("AUDIT DONE")
    spark.stop()
  }
}
