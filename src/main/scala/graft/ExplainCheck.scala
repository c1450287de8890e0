package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- Seq("d2_minhash_lsh", "d6_ann_brute", "d7_ann_ivf", "d1_exact_dedup")) {
      println(s"===== $q")
      graft.SparkEntry.queries(q)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
