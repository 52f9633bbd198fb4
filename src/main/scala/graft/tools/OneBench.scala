package graft.tools

import graft.{GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession
object OneBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    // comma-separated names run IN SEQUENCE in one session, so
    // session-scoped memo effects (trained models, recall ground
    // truth) are measured exactly as the driver's one-JVM bench run
    // sees them
    val names = args(0).split(",").toSeq; val dir = args(1)
    SparkEntry.queries("d_contamination")(spark, dir).write.mode("overwrite").format("noop").save()
    (1 to 2).foreach { i =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
        println(s"$name run$i: ${(System.nanoTime()-t0)/1e9}")
      }
    }
    spark.stop()
  }
}
