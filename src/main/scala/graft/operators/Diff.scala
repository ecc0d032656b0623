package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — "what changed between yesterday's table and
  * today's": added / removed / changed rows, with the exact set of
  * changed columns per row. The table-level sibling of the document
  * fingerprint corpusDiff (DedupOps): corpusDiff compares by content
  * hash and cannot say WHICH field moved; tableDiff aligns on the
  * business key and reports per-column drift — the tool for auditing an
  * incremental load (did the delete+insert touch exactly the rows it
  * should?), validating a migration, or building a CDC feed from two
  * full snapshots when the source system offers no change log.
  *
  * Scale design (100 TB): ONE full-outer shuffle join on the key —
  * the minimum possible for snapshot alignment — then a map-side
  * null-safe column compare (`<=>`, so NULL→value and value→NULL count
  * as changes while NULL→NULL does not). No window, no collect;
  * unchanged rows are dropped before the result materializes. For
  * repeated diffs of bucketed snapshots, write both sides bucketed by
  * the key and even the join shuffle disappears.
  */
object Diff {

  /** Diff `newDf` against `oldDf` aligned on `keys`.
    *
    * Output: key columns + `diff_status` ('added' | 'removed' |
    * 'changed') + `changed_cols` (comma-joined compared-column names in
    * the order given, NULL for added/removed). Unchanged rows are
    * omitted. `compareCols` defaults to every shared non-key column. */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "keys required")
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(c =>
        !keys.contains(c) && newDf.columns.contains(c)).toSeq
    require(cols.nonEmpty, "no non-key columns to compare")
    val o = oldDf.select((keys ++ cols).map(col): _*).alias("o")
    val n = newDf.select((keys ++ cols).map(col): _*).alias("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    // presence markers survive the outer join even when every payload
    // column is NULL on one side
    val joined = o.withColumn("__in_old", lit(1))
      .join(n.withColumn("__in_new", lit(1)), joinCond, "full_outer")
    val changedList = concat_ws(",",
      cols.map(c => when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c))): _*)
    joined
      .withColumn("diff_status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(length(changedList) > 0, lit("changed")))
      .filter(col("diff_status").isNotNull)
      .withColumn("changed_cols",
        when(col("diff_status") === "changed", changedList))
      .select(keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
        Seq(col("diff_status"), col("changed_cols")): _*)
  }

  /** Rollup of [[tableDiff]]: one row per (status, changed_cols) combo
    * with counts — the audit summary a reviewer reads first. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy(col("diff_status"), col("changed_cols"))
      .agg(count(lit(1)).as("n_rows"))

  /** Snapshot diff rendered as a CHANGE FEED — delete/insert events
    * with full payloads, the bridge from "the source only gives us full
    * dumps" to every CDC consumer in the engine
    * ([[AggMerge.applyCdc]], the cdc maintenance sink, a keyed-upsert
    * load): `removed → delete(old row)`, `added → insert(new row)`,
    * `changed → delete(old row) + insert(new row)` — the
    * retraction-style encoding whose apply rule is pure set algebra
    * (delete by key, then union inserts).
    *
    * Output: `op` ('delete' | 'insert') + key columns + compared
    * columns, payload taken from the matching side. Same ONE
    * full-outer key join as [[tableDiff]] — the change pair for an
    * updated row rides a 2-element generator off the single joined row,
    * not a second scan. */
  def toCdcFeed(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "keys required")
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(c =>
        !keys.contains(c) && newDf.columns.contains(c)).toSeq
    require(cols.nonEmpty, "no non-key columns to carry")
    val o = oldDf.select((keys ++ cols).map(col): _*).alias("o")
    val n = newDf.select((keys ++ cols).map(col): _*).alias("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val joined = o.withColumn("__in_old", lit(1))
      .join(n.withColumn("__in_new", lit(1)), joinCond, "full_outer")
    val changed = cols.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    def payload(side: String, op: String) = struct(
      lit(op).as("op") +:
        (keys ++ cols).map(c => col(s"$side.$c").as(c)): _*)
    val del = when(col("__in_old").isNotNull &&
      (col("__in_new").isNull || changed), payload("o", "delete"))
    val ins = when(col("__in_new").isNotNull &&
      (col("__in_old").isNull || changed), payload("n", "insert"))
    joined.select(explode(array(del, ins)).as("__e"))
      .filter(col("__e").isNotNull)
      .select(col("__e.*"))
  }

  /** Apply a [[toCdcFeed]] feed to a snapshot: delete by key, union
    * inserts — the retraction-apply rule, exposed so the
    * diff → feed → apply loop is a tested identity (apply(old, feed) ≡
    * new), not folklore. One anti-join + one union. */
  def applyCdcFeed(snapshot: DataFrame, feed: DataFrame,
      keys: Seq[String]): DataFrame = {
    // contract: the feed must carry every snapshot column (a feed built
    // with a compareCols SUBSET can delete but cannot reconstruct the
    // uncompared columns of its inserts) — fail with the contract, not
    // an AnalysisException from the projection below
    val missing = snapshot.columns.filterNot(feed.columns.contains)
    require(missing.isEmpty,
      s"applyCdcFeed: feed lacks snapshot column(s) ${missing.mkString(", ")} — " +
        "build the feed with compareCols covering ALL non-key columns " +
        "(or empty = all shared) so inserts carry the full row")
    val dels = feed.filter(col("op") === "delete").select(keys.map(col): _*)
    val inss = feed.filter(col("op") === "insert").drop("op")
    snapshot
      .join(dels.distinct(), keys, "left_anti")
      .unionByName(inss.select(snapshot.columns.map(col): _*))
  }

  /** Snapshot-vs-snapshot COLUMN drift report — the schema-and-
    * nullness complement of [[tableDiff]] (which aligns ROWS): one row
    * per column name across both snapshots with its membership status
    * ('added' = cur only, 'removed' = ref only, 'type_changed',
    * 'kept'), the type on each side, and exact row/null counts — the
    * first thing a pipeline migration audit reads, and the
    * upstream-contract check that catches a source silently widening a
    * type or starting to emit NULLs.
    *
    * Cost: schema compare is driver-side metadata; the null counts are
    * ONE fused aggregate pass per side (every column's
    * `SUM(IS NULL)` in a single scan — k columns over 100 TB cost one
    * pass, not k), whose single result row is collected (metadata-
    * scale, the freshness-asOf convention). `null_frac_ref/cur` are
    * single exact divisions; NULL where the column is absent on that
    * side. Output ordering carries no meaning (hash-gate sorts). */
  def columnDriftReport(ref: DataFrame, cur: DataFrame): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    def stats(df: DataFrame): (Long, Map[String, Long]) = {
      val cols = df.columns.toSeq
      val aggs = count(lit(1)).as("__n") +:
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__z_$c"))
      val row = df.agg(aggs.head, aggs.tail: _*).head
      (row.getAs[Long]("__n"),
        cols.map(c => c -> row.getAs[Long](s"__z_$c")).toMap)
    }
    val (nRef, zRef) = stats(ref)
    val (nCur, zCur) = stats(cur)
    val tRef = ref.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val tCur = cur.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val names = (ref.columns ++ cur.columns).distinct.toSeq
    val rows = names.map { c =>
      val status = (tRef.get(c), tCur.get(c)) match {
        case (Some(a), Some(b)) if a == b => "kept"
        case (Some(_), Some(_)) => "type_changed"
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (None, None) => sys.error("unreachable")
      }
      (c, status, tRef.get(c).orNull, tCur.get(c).orNull,
        tRef.get(c).map(_ => nRef), zRef.get(c),
        tCur.get(c).map(_ => nCur), zCur.get(c))
    }
    rows.toDF("column_name", "status", "ref_type", "cur_type",
      "n_ref", "n_null_ref", "n_cur", "n_null_cur")
      .withColumn("null_frac_ref",
        when(col("n_ref") > 0,
          col("n_null_ref").cast("double") / col("n_ref").cast("double")))
      .withColumn("null_frac_cur",
        when(col("n_cur") > 0,
          col("n_null_cur").cast("double") / col("n_cur").cast("double")))
  }
}
