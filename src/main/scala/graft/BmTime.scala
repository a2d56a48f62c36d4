package graft
import org.apache.spark.sql.SparkSession
object BmTime {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $n%-20s ${(System.nanoTime()-t0)/1e9}%7.2fs"); r }
    // warm fixture materialization
    t("fixture-warm") { graft.domain.ChainFixture.actionsTable(spark, dir).count() }
    t("headers-warm") { graft.domain.Accounting.bundleHeaders(spark, dir).count() }
    val q = SparkEntry.queries("q1_bigmac")
    t("bigmac-1st") { q(spark, dir).write.mode("overwrite").format("noop").save() }
    spark.sharedState.cacheManager.clearCache()
    t("bigmac-2nd") { q(spark, dir).write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
