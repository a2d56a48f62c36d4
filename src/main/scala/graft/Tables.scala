package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's table registry
  * (brontes-database/brontes-db/src/libmdbx/tables/mod.rs:526-541) in spirit:
  * one named, schema-stable table per source. Here every table is a parquet
  * directory/file — at cluster scale these would be partitioned datasets and
  * the same `spark.read.parquet` call prunes partitions on filter.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  /** The `events` fixture has shipped `ts` as both INT64 epoch-nanos and
    * parquet TIMESTAMP (µs) across driver regenerations. Downstream code
    * (EventOps/MiscOps) is written against the epoch-nanos contract, so
    * normalize here: when the read schema types `ts` as a timestamp,
    * project it back to epoch-nanos (`unix_micros * 1000`). DuckDB oracles
    * read the same parquet with `epoch_us(ts)` which agrees in both cases.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val df = apply(spark, dir, "events")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
