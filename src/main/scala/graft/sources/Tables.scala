package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table readers for the engine's test corpus (TESTDATA.md).
  *
  * Spark's vectorized parquet reader rejects TIMESTAMP(NANOS) columns
  * (the `events.ts` column is nanos); we read them via the nanos-as-long
  * escape hatch and rebuild a microsecond TIMESTAMP_NTZ in integer space
  * (`div 1000`, never double arithmetic — epoch-nanos exceed 2^53).
  * TIMESTAMP_NTZ is the naive-timestamp type every other engine
  * (DuckDB/Postgres TIMESTAMP) means, so parity comparisons are
  * timezone-proof regardless of session zone.
  */
object Tables {

  /** Columns stored as TIMESTAMP(NANOS) per table (schema knowledge from
    * TESTDATA.md; parquet metadata at /root/testdata). */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanosColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema(c).dataType == LongType)
        df.withColumn(c, expr(s"cast(timestamp_micros($c div 1000) as timestamp_ntz)"))
      else df
    }
  }
}
