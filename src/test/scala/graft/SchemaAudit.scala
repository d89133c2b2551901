package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
/** One-shot dev audit: which queries emit ArrayType at top level? */
object SchemaAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val schema = fn(spark, dir).schema
        val arrs = schema.fields.filter(f => f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType])
        if (arrs.nonEmpty)
          println(s"CONTAINER $name: ${arrs.map(f => f.name + ":" + f.dataType.simpleString).mkString(", ")}")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}") }
    }
    println("AUDIT DONE")
    spark.stop()
  }
}
