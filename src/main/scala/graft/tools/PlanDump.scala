package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Debug helper: print the executed plan of one query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark,
      if (args.length > 1) args(1) else "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
