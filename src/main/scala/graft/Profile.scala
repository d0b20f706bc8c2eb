package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import spark.implicits._
    time("clinit-direct") {
      val t = Class.forName("org.apache.spark.sql.catalyst.util.CollationAwareUTF8String")
      println("[prof] loaded " + t.getName)
    }
    time("lower-first")(Seq("AbC").toDF("s").select(lower(col("s"))).collect())
    spark.stop()
  }
}
