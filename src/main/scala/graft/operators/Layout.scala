package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Physical-layout planning operators: the table-maintenance math a
  * lakehouse pipeline runs BETWEEN queries — small-file compaction
  * grouping and space-filling-curve (Z-order) sort keys for
  * multi-column locality. Both are pure, deterministic computations
  * over table METADATA or key columns; the actual rewrite is the
  * caller's `Writers` swap.
  */
object Layout {

  /** Compaction plan over a file-listing frame: contiguous files (in
    * `pathCol` order) grouped so each group's cumulative size crosses
    * one `targetBytes` boundary — the next-fit bin packing a
    * small-file compactor wants (groups may overshoot by at most one
    * file; singleton oversized files get their own group). Group ids
    * are stable under re-listing (pure function of the sorted listing).
    *
    * `group_id = (cum_bytes_before_this_file) div targetBytes` — a
    * prefix sum over the file listing. File listings are
    * table-metadata-scale (not data-scale), so the one ordered window
    * here is the documented metadata exception; partition the listing
    * by table/partition column upstream to bound it further.
    *
    * Output: (path, bytes, group_id) + per-group `group_bytes` and
    * `n_files` joined back for the planner's readout. */
  def compactionPlan(files: DataFrame, pathCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val w = Window.orderBy(col(pathCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = files
      .select(col(pathCol), col(bytesCol).cast("long").as("bytes"))
      .withColumn("__cum", sum(col("bytes")).over(w))
      .withColumn("group_id",
        expr(s"(__cum - bytes) div ${targetBytes}L").cast("long"))
      .drop("__cum")
    val groups = assigned.groupBy(col("group_id"))
      .agg(sum(col("bytes")).cast("long").as("group_bytes"),
        count(lit(1)).as("n_files"))
    assigned.join(Broadcasts.maybeBroadcast(groups), Seq("group_id"))
      .select(col(pathCol), col("bytes"), col("group_id"),
        col("group_bytes"), col("n_files"))
  }

  /** Z-order (Morton) key of two non-negative ints below `2^bits`:
    * bit-interleave x (even positions) and y (odd positions) —
    * `Σᵢ bitᵢ(x)·4ⁱ + 2·bitᵢ(y)·4ⁱ`, a pure shift/mask/add tree that
    * whole-stage codegen collapses to straight-line long arithmetic
    * (the oracle mirrors it with div/mod arithmetic, so the value is
    * engine-portable by construction). Sorting or range-partitioning
    * by this key co-locates rows close in BOTH dimensions — the
    * classic multi-column data-skipping layout (a file covers a
    * z-range ⇒ tight min/max on both columns, so predicates on either
    * prune files).
    *
    * `bits ≤ 31` keeps the interleave inside a signed long. Inputs out
    * of [0, 2^bits) yield NULL (loud in any downstream sort) rather
    * than a silently-wrapped key. */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val lim = 1L << bits
    val xl = x.cast("long")
    val yl = y.cast("long")
    val terms: Seq[Column] = (0 until bits).flatMap { i =>
      val p4 = 1L << (2 * i)
      Seq(
        shiftright(xl, i).bitwiseAND(1L) * p4,
        shiftright(yl, i).bitwiseAND(1L) * (2L * p4))
    }
    when(x.isNotNull && y.isNotNull &&
      xl >= 0 && xl < lim && yl >= 0 && yl < lim,
      terms.reduce(_ + _).cast("long"))
  }

  /** N-dimensional Z-order (Morton) key — [[mortonCode]] generalized
    * past two columns: bit i of input column j lands at interleaved
    * position `i·n + j`, so sorting by the key co-locates rows close
    * in ALL n dimensions at once (real lakes cluster 3-4 columns —
    * e.g. (month, customer, product) — and a 2-D key leaves the third
    * predicate unpruned). `n·bits ≤ 62` keeps the key inside a signed
    * long — 3 columns × 20 bits or 4 × 15 cover realistic key
    * cardinalities. Any input NULL or out of [0, 2^bits) yields a
    * NULL key (loud in any downstream sort), the [[mortonCode]] rule.
    * Like the 2-D form it is a pure shift/mask/add tree — whole-stage
    * codegen collapses it to straight-line long arithmetic, cheap
    * enough for on-the-fly keys (Hilbert stays 2-D: its rotation
    * rounds are where the locality win lives, and the 2-D walk is the
    * documented cold-rewrite tool). */
  def mortonCodeN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 62,
      s"n*bits must be <= 62, got ${cols.size} * $bits")
    val lim = 1L << bits
    val longs = cols.map(_.cast("long"))
    val n = cols.size
    val terms: Seq[Column] = (0 until bits).flatMap { i =>
      longs.zipWithIndex.map { case (c, j) =>
        shiftright(c, i).bitwiseAND(1L) * (1L << (i * n + j))
      }
    }
    val inRange = longs.map(c => c.isNotNull && c >= 0 && c < lim)
      .reduce(_ && _)
    when(inRange, terms.reduce(_ + _).cast("long"))
  }

  /** Hilbert-curve key of two non-negative ints below `2^bits` — the
    * locality-optimal sibling of [[mortonCode]]: a Hilbert walk visits
    * every cell of the 2^bits × 2^bits grid through ADJACENT cells
    * only (|Δx|+|Δy| = 1 between consecutive keys), so equal key
    * ranges cover more compact boxes than the Z-curve's diagonal
    * jumps — tighter per-file min/max under [[skippingStats]] /
    * [[graft.sources.Tables.readPruned]], the property that matters
    * when files are cut by key range. Z-order keeps one advantage:
    * the key is a pure bit-interleave (cheap, streamable); Hilbert
    * costs `bits` dependent rounds. Pick Hilbert for cold layout
    * rewrites, Morton for on-the-fly keys.
    *
    * Implementation: the classic per-scale rotate-and-accumulate walk
    * (d += s²·((3·rx)⊕ry), then reflect/transpose the lower bits),
    * expressed as one chained projection per scale — `bits`
    * projections of plain long arithmetic, each referencing the
    * previous (NOT a single expression: the rotation reads x and y
    * twice per round, so inlining would grow the tree 3^bits).
    * Coordinates out of [0, 2^bits) yield a NULL key — the
    * [[mortonCode]] loud-in-any-sort rule.
    *
    * Returns `df` with `outCol` appended; helper columns are dropped. */
  def withHilbert(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  outCol: String): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val lim = 1L << bits
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    var s = 1L << (bits - 1)
    while (s > 0) {
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__hd",
          col("__hd") + lit(s) * lit(s)
            * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // reflect (full-grid complement — bits below s flip exactly)
        // then transpose, only in the ry = 0 half
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(lim - 1) - col("__hy"))
              .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(lim - 1) - col("__hx"))
              .otherwise(col("__hx"))).otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
      s >>= 1
    }
    cur
      .withColumn(outCol,
        when(col(xCol).isNotNull && col(yCol).isNotNull
          && col(xCol).cast("long").between(0, lim - 1)
          && col(yCol).cast("long").between(0, lim - 1), col("__hd")))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__nx", "__ny")
  }

  /** N-dimensional Hilbert key — [[withHilbert]] generalized past two
    * columns via Skilling's transpose algorithm ("Programming the
    * Hilbert curve", AIP Conf. Proc. 707, 2004): the per-scale
    * invert/exchange walk runs MSB→LSB over the n coordinate columns
    * (the "inverse undo" pass), a Gray-code pass follows, and the
    * resulting TRANSPOSED index interleaves into one long with X[0]
    * carrying the most significant bit of each level. Like
    * [[withHilbert]] it is expressed as CHAINED PROJECTIONS — one
    * small projection per (scale, axis) step, each referencing the
    * previous — because the exchange step reads state twice per round
    * and a single inlined expression would grow exponentially
    * (CollapseProject does not re-inline non-cheap multi-referenced
    * exprs; the r9 lesson). ~3·bits·n projections of plain long
    * bitwise arithmetic, all inside whole-stage codegen.
    *
    * The walk visits adjacent cells only (|Δ| = 1 in exactly one
    * coordinate between consecutive keys — spec-pinned over full
    * grids), so equal key ranges cover compact n-boxes: tighter
    * per-file bounds than [[mortonCodeN]]'s diagonal jumps on EVERY
    * axis at once. `n·bits ≤ 62` keeps the key in a signed long.
    * Inputs out of [0, 2^bits) or NULL yield a NULL key — the
    * [[mortonCode]] loud-in-any-sort rule. Returns `df` with `outCol`
    * appended; helper columns dropped. */
  def withHilbertN(df: DataFrame, cols: Seq[String], bits: Int,
                   outCol: String): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 62,
      s"n*bits must be <= 62, got ${cols.size} * $bits")
    val n = cols.size
    val lim = 1L << bits
    def x(i: Int) = col(s"__hn$i")
    var cur = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__hn$i", col(c).cast("long"))
    }
    // inverse undo: Q from 2^(bits-1) down to 2
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      // i = 0 reduces to a self-invert (the exchange with itself is a
      // no-op): X0 ^= P only when X0 & Q
      cur = cur.withColumn("__hn0",
        when(x(0).bitwiseAND(q) > 0, x(0).bitwiseXOR(p)).otherwise(x(0)))
      (1 until n).foreach { i =>
        cur = cur
          .withColumn("__ht",
            when(x(i).bitwiseAND(q) > 0, lit(0L))
              .otherwise(x(0).bitwiseXOR(x(i)).bitwiseAND(p)))
          .withColumn("__hn0",
            when(x(i).bitwiseAND(q) > 0, x(0).bitwiseXOR(p))
              .otherwise(x(0).bitwiseXOR(col("__ht"))))
          .withColumn(s"__hn$i", x(i).bitwiseXOR(col("__ht")))
      }
      q >>= 1
    }
    // Gray encode (sequential: each axis folds the PREVIOUS updated one)
    (1 until n).foreach { i =>
      cur = cur.withColumn(s"__hn$i", x(i).bitwiseXOR(x(i - 1)))
    }
    // trailing exchange: t accumulates over scales from the LAST axis
    cur = cur.withColumn("__ht", lit(0L))
    q = 1L << (bits - 1)
    while (q > 1) {
      cur = cur.withColumn("__ht",
        when(x(n - 1).bitwiseAND(q) > 0, col("__ht").bitwiseXOR(q - 1))
          .otherwise(col("__ht")))
      q >>= 1
    }
    (0 until n).foreach { i =>
      cur = cur.withColumn(s"__hn$i", x(i).bitwiseXOR(col("__ht")))
    }
    // transposed -> single key: bit b of axis i lands at position
    // b·n + (n-1-i)  (X[0] most significant within each level)
    val terms: Seq[Column] = (0 until bits).flatMap { b =>
      (0 until n).map { i =>
        shiftright(x(i), b).bitwiseAND(1L) * (1L << (b * n + (n - 1 - i)))
      }
    }
    val inRange = cols.map(c =>
      col(c).isNotNull && col(c).cast("long").between(0, lim - 1))
      .reduce(_ && _)
    cur
      .withColumn(outCol, when(inRange, terms.reduce(_ + _).cast("long")))
      .drop(((0 until n).map(i => s"__hn$i") :+ "__ht"): _*)
  }

  /** One-call clustered rewrite — the table-maintenance action that
    * makes [[graft.sources.Tables.readPruned]] pay: lay `df` out in
    * `nFiles` range-cut files ordered by the chosen space-filling
    * curve over two key columns ('morton' for cheap streamable keys,
    * 'hilbert' for the tighter adjacent-cell boxes — see
    * [[withHilbert]]), dropping the key before write. Run it from the
    * compaction/maintenance window (cold rewrite), then box probes on
    * EITHER column skip files via the footer zone maps. */
  def rewriteClustered(df: DataFrame, xCol: String, yCol: String,
                       bits: Int, nFiles: Int, path: String,
                       curve: String = "hilbert"): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val scaled = gridScaled(df, Seq(xCol, yCol), bits)
    val keyed = curve match {
      case "hilbert" =>
        withHilbert(df.withColumn("__gx", scaled(0))
          .withColumn("__gy", scaled(1)), "__gx", "__gy", bits,
          "__cluster_key").drop("__gx", "__gy")
      case "morton" => df.withColumn("__cluster_key",
        mortonCode(scaled(0), scaled(1), bits))
      case other => throw new IllegalArgumentException(
        s"curve must be 'hilbert' or 'morton', got '$other'")
    }
    writeByKey(keyed, nFiles, path)
  }

  /** [[rewriteClustered]] for 3+ cluster columns — the layout a box
    * probe on ANY of the n columns then prunes through
    * [[graft.sources.Tables.readPruned]]. `curve` picks the key:
    * 'morton' ([[mortonCodeN]] — cheap streamable interleave, the
    * on-the-fly default) or 'hilbert' ([[withHilbertN]] — adjacent-
    * cell walk, tighter boxes per key range, the cold-rewrite
    * choice). Both run on grid-scaled inputs ([[gridScaled]]). */
  def rewriteClusteredN(df: DataFrame, clusterCols: Seq[String], bits: Int,
                        nFiles: Int, path: String,
                        curve: String = "morton"): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val scaled = gridScaled(df, clusterCols, bits)
    val keyed = curve match {
      case "morton" =>
        df.withColumn("__cluster_key", mortonCodeN(scaled, bits))
      case "hilbert" =>
        val tmp = clusterCols.indices.map(i => s"__g$i")
        val withG = scaled.zipWithIndex.foldLeft(df) {
          case (d, (c, i)) => d.withColumn(s"__g$i", c)
        }
        withHilbertN(withG, tmp, bits, "__cluster_key")
          .drop(tmp: _*)
      case other => throw new IllegalArgumentException(
        s"curve must be 'morton' or 'hilbert', got '$other'")
    }
    writeByKey(keyed, nFiles, path)
  }

  /** Cluster columns scaled onto the FULL [0, 2^bits) grid —
    * `(x · 2^bits) div (max+1)`, monotone, so raw-column footer bounds
    * still narrow per file — applied INSIDE the rewrite entry points
    * for two reasons proven live (q400's first probe): (1) a raw value
    * ≥ 2^bits makes the interleave key NULL, silently degrading the
    * whole rewrite to an unclustered layout (NULLs all sort together);
    * (2) UNBALANCED dimension spans starve the narrow column of high
    * key bits — a raw-span (60k × 20k) 2-D key gave ZERO narrowing on
    * the small column. One metadata-scale `agg().head()` per rewrite
    * (per-column min/max — the documented driver-collect convention;
    * a rewrite is a maintenance action, the extra pass is the cheap
    * part of a full table rewrite). Negative values raise (the grid is
    * non-negative by construction); NULLs still yield NULL keys — the
    * [[mortonCode]] loud-in-any-sort rule. The multiply rides
    * decimal(38,0) so `x · 2^bits` can never overflow a long. */
  private def gridScaled(df: DataFrame, clusterCols: Seq[String],
                         bits: Int): Seq[Column] = {
    val lim = 1L << bits
    val aggs = clusterCols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__mn_$c"),
      max(col(c).cast("long")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    clusterCols.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(2 * i + 1)) col(c).cast("long") // empty / all-NULL
      else {
        val mn = row.getLong(2 * i)
        val mx = row.getLong(2 * i + 1)
        require(mn >= 0,
          s"cluster column '$c' has negative values (min $mn) — the" +
            s" 2^$bits grid is non-negative; shift or encode upstream")
        expr(s"(cast($c as decimal(38,0)) * ${lim}L)" +
          s" div (cast(${mx}L as decimal(38,0)) + 1)").cast("long")
      }
    }
  }

  private def writeByKey(keyed: DataFrame, nFiles: Int, path: String): Unit =
    keyed.repartitionByRange(nFiles, col("__cluster_key"))
      .sortWithinPartitions("__cluster_key")
      .drop("__cluster_key")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** EXECUTE a small-file compaction — the action side of
    * [[compactionPlan]] (which only plans): the source lake's files
    * are grouped by the next-fit plan and rewritten into `dst` with
    * EXACTLY ONE file per group, each landing in its own
    * `compaction_group=N` directory. One listing + ONE shuffle pass:
    * every row is read once, tagged with its file's group id via a
    * broadcast (file-count-scale) map join on `input_file_name()`,
    * hash-repartitioned BY GROUP so each group's rows reach exactly
    * one task, and written `partitionBy(compaction_group)` — a hash
    * collision merely makes one task write two groups sequentially,
    * never two files for one group. No driver loop over groups, no
    * per-group job storm: the rewrite cost is one full pass at any
    * file count, which is the floor for a compactor.
    *
    * `dst` is a NEW location (rewrite-to-new + swap, the atomic
    * maintenance convention — in-place deletion of source files is
    * the caller's retention decision, see the snapshot log's
    * unreferenced-file sweep). Returns the plan frame
    * ([[compactionPlan]] columns) so callers can assert group shapes. */
  def compactExecute(spark: org.apache.spark.sql.SparkSession,
                     src: String, dst: String,
                     targetBytes: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(src)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val listed = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString
      val hidden = rel.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (f.isFile && rel.endsWith(".parquet") && !hidden)
        listed += ((rel, f.getLen))
    }
    compactRewrite(spark, listed.sorted.toSeq, dst, targetBytes)
  }

  /** The rewrite core of [[compactExecute]] over an EXPLICIT
    * (path, bytes) file list — factored out so snapshot-transactional
    * compaction ([[graft.incremental.Snapshots.compact]]) can rewrite
    * exactly the files its pinned version references, not whatever a
    * directory listing happens to see. Same single-shuffle contract
    * as [[compactExecute]] (whose scaladoc is the spec). */
  private[graft] def compactRewrite(spark: org.apache.spark.sql.SparkSession,
                                    listed: Seq[(String, Long)], dst: String,
                                    targetBytes: Long): DataFrame = {
    require(listed.nonEmpty, "no data files to compact")
    import scala.jdk.CollectionConverters._
    val filesDf = spark.createDataFrame(
      listed.map { case (p, b) =>
        org.apache.spark.sql.Row(p, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("bytes",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val plan = compactionPlan(filesDf, "path", "bytes", targetBytes)
      .localCheckpoint(true) // consumed by the join AND returned
    val nGroups = plan.select(col("group_id")).distinct().count().toInt
    // join key normalized on BOTH sides: input_file_name() renders
    // file:///x while Hadoop's Path.toString renders file:/x
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^file:/+", "/")
    spark.read.parquet(listed.map(_._1): _*)
      .withColumn("__f", norm(input_file_name()))
      .join(broadcast(plan.select(norm(col("path")).as("__f"),
        col("group_id").as("compaction_group"))), Seq("__f"))
      .drop("__f")
      .repartition(math.max(1, nGroups), col("compaction_group"))
      .write.partitionBy("compaction_group")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dst)
    plan
  }

  /** Zone-map reader: per parquet FILE min/max/count for `cols` — the
    * skipping statistics a scan planner consults before opening files.
    * The READ-side pairing of [[ZOrder.layout]] (which produces the
    * write layout these stats reward): one aggregate pass grouped by
    * `input_file_name()`; output is file-count-scale metadata. Column
    * order: path, n_rows, then `<col>_min`, `<col>_max` per requested
    * column. */
  def skippingStats(spark: org.apache.spark.sql.SparkSession, path: String,
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols required")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Clustering-depth readout from zone-map stats — "how good is this
    * layout for column `c`?" as one number instead of a per-probe
    * experiment: for each file, the count of OTHER files whose
    * [min, max] range on `c` overlaps it. Perfectly range-cut files
    * score 0 (a point probe opens 1 file); a layout ignoring `c`
    * scores ~n_files (every probe opens everything) — the metric a
    * maintenance planner reads to decide whether a
    * [[rewriteClustered]] on `c` would pay, the same signal Delta's
    * OPTIMIZE clustering-depth reports. NULL-bounded files overlap
    * everything by the conservative rule and are counted as such.
    * Input is file-count-scale metadata, so the pairwise comparison
    * is a metadata² self-join — fine to ~10⁴ files; lift to a sort +
    * sweep if manifests grow past that.
    *
    * Output: one row (n_files, n_bounded, total_overlaps,
    * max_overlaps, avg_overlaps). */
  def overlapDepth(stats: DataFrame, c: String): DataFrame = {
    val a = stats.select(col("path").as("__pa"),
      col(s"${c}_min").as("__la"), col(s"${c}_max").as("__ha"))
    val b = stats.select(col("path").as("__pb"),
      col(s"${c}_min").as("__lb"), col(s"${c}_max").as("__hb"))
    val overlapping = a.crossJoin(b)
      .filter(col("__pa") =!= col("__pb"))
      .filter(col("__la").isNull || col("__lb").isNull ||
        (col("__ha") >= col("__lb") && col("__la") <= col("__hb")))
      .groupBy(col("__pa")).agg(count(lit(1)).as("__ov"))
    a.join(overlapping, Seq("__pa"), "left")
      .withColumn("__ov", coalesce(col("__ov"), lit(0L)))
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum(when(col("__la").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_bounded"),
        sum(col("__ov")).cast("long").as("total_overlaps"),
        max(col("__ov")).cast("long").as("max_overlaps"),
        avg(col("__ov").cast("double")).as("avg_overlaps"))
  }

  /** Files a box predicate `lo <= col <= hi` (per column) cannot rule
    * out, given [[skippingStats]] output — the planner's candidate
    * set. A file is skippable iff ANY predicate's range misses the
    * file's [min, max] entirely; NULL bounds (all-NULL file column)
    * keep the file (no evidence to skip — the conservative zone-map
    * rule). */
  def candidateFiles(stats: DataFrame,
                     box: Seq[(String, Long, Long)]): DataFrame = {
    require(box.nonEmpty, "box predicates required")
    val keep = box.map { case (c, lo, hi) =>
      col(s"${c}_min").isNull || col(s"${c}_max").isNull ||
        (col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
    }.reduce(_ && _)
    stats.filter(keep)
  }
}
