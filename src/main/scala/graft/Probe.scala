package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.printSchema()
    e.show(3, false)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.printSchema()
    o.show(3, false)
    spark.stop()
  }
}
