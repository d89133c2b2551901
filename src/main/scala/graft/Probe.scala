package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFns

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = Tables(spark, dir, "embeddings")
        .withColumn("nrm", TextFns.norm(col("embedding")))
      // exact qualifying pairs at cos >= 0.45
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
      val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("cosv", TextFns.cosineFrom(TextFns.dot(col("va"), col("vb")), col("na"), col("nb")))
        .filter(col("cosv") >= 0.45)
        .select(col("id_a"), col("id_b"))
      // full centroid ranking per vector
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"), col("nrm").as("cn"))
      val wA = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id"))
      val ranked = e.crossJoin(broadcast(cents))
        .withColumn("ccos", TextFns.cosineFrom(TextFns.dot(col("embedding"), col("cv")), col("nrm"), col("cn")))
        .withColumn("arnk", row_number().over(wA))
        .select(col("vec_id"), col("cent_id"), col("arnk"))
      // for each truth pair: min k such that top-k sets intersect
      val ra = ranked.select(col("vec_id").as("id_a"), col("cent_id"), col("arnk").as("ka"))
      val rb = ranked.select(col("vec_id").as("id_b"), col("cent_id"), col("arnk").as("kb"))
      val needed = truth.join(ra, "id_a").join(rb, Seq("id_b", "cent_id"))
        .withColumn("k_need", greatest(col("ka"), col("kb")))
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("k_need")).as("k_min"))
      val hist = needed.groupBy(col("k_min")).count().orderBy(col("k_min")).collect()
      println(s"$sf truth pairs=${truth.count()} k_min histogram:")
      hist.foreach(r => println(s"  k=${r.get(0)} -> ${r.get(1)} pairs"))
    }
    spark.stop()
  }
}
