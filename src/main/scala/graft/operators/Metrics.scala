package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative metric layer — aggregations as CONFIG, the semantic-
  * layer shape (dbt metrics / LookML measures) completing the
  * config-as-data surface next to `graft.checks.CheckConfig`: a JSON
  * array of metric descriptors compiles to ONE fused `agg(...)` pass
  * (optionally grouped), so a metrics catalog ships as a reviewable
  * file and every consumer computes identical definitions.
  *
  * Descriptor: `{"name": ..., "agg": <SQL aggregate call>,
  * "where": <optional SQL row predicate>, "cast": <optional SQL
  * type>}`. The predicate compiles to the standard `FILTER (WHERE
  * ...)` clause — which SQL attaches DIRECTLY to the aggregate call,
  * which is why any output cast is its own field (`CAST(COUNT(*) AS
  * BIGINT) FILTER (...)` is a syntax error; the compiler builds
  * `CAST(COUNT(*) FILTER (...) AS BIGINT)`). Every metric keeps its
  * own row scope inside the single scan — N metrics over 100 TB cost
  * one pass, not N.
  *
  * Determinism is the CONFIG AUTHOR's contract exactly as when writing
  * the aggregates inline: follow the repo rules (decimal-path sums
  * internally, BIGINT/double in compared output, exact counts, single
  * final divisions). Unknown/missing fields fail loudly at compile
  * time.
  *
  * TRUST MODEL: descriptors compile verbatim through `expr(...)`, so a
  * metrics catalog is EXECUTABLE SQL with the caller's privileges —
  * exactly like a dbt model file. Treat catalogs as code (review them
  * in the same lane as source); never feed this function strings from
  * an untrusted channel. The same contract applies to
  * `graft.checks.CheckConfig`. */
object Metrics {

  def fromJson(spark: SparkSession, df: DataFrame, json: String,
               groupBy: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val rows = spark.read.schema("name STRING, agg STRING, where STRING, cast STRING")
      .json(Seq(json).toDS).collect()
    require(rows.nonEmpty, "metric config is empty")
    val names = rows.map(_.getAs[String]("name"))
    require(names.forall(n => n != null && n.nonEmpty), "metric missing 'name'")
    require(names.distinct.length == names.length,
      s"duplicate metric names in config: ${names.mkString(", ")}")
    val aggs = rows.toIndexedSeq.map { r =>
      val name = r.getAs[String]("name")
      val agg = r.getAs[String]("agg")
      require(agg != null && agg.nonEmpty, s"metric '$name' missing 'agg'")
      val scoped = Option(r.getAs[String]("where")) match {
        case Some(w) => s"$agg FILTER (WHERE $w)"
        case None => agg
      }
      val typed = Option(r.getAs[String]("cast")) match {
        case Some(t) => s"CAST($scoped AS $t)"
        case None => scoped
      }
      expr(typed).as(name)
    }
    if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
