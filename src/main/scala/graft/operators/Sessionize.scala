package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of
  * `graft.streaming.Streaming.sessionWindows` (same gap semantics, proven
  * there with mapGroupsWithState): a new session starts wherever the gap
  * to the previous event of the same key exceeds `gapSeconds`.
  *
  * Classic two-window shape: a boundary flag from `lag`, a running sum of
  * boundaries as the session index — both over the same (key, ts) window,
  * so ONE shuffle on the key; the final per-session aggregate groups by
  * (key, session_index). Gap comparison runs in integer microseconds
  * (`unix_micros`), never float epoch — bit-identical on any engine.
  * Ordering is total (ts, then `tieBreakCol`), so session assignment is
  * deterministic under equal timestamps.
  *
  * At 100 TB: per-key window state is one row (the lag); no driver state,
  * no all-pairs. Skewed keys (a bot user with millions of events) sort
  * within one partition under [[tag]] — [[tagSkewSafe]] is the built
  * mitigation: sessionize per (key, day) slice, then stitch sessions
  * across the day seams with a metadata-scale summary pass.
  */
object Sessionize {

  /** Tags every input row with its 1-based `session_index` (the
    * per-event form of [[byGap]] — same boundary semantics, same single
    * key shuffle). Use this when downstream logic needs the events
    * themselves grouped by session (e.g. a per-session funnel), not just
    * the session summaries. */
  def tag(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
          tieBreakCol: String): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(micros, 1).over(w)
    val boundary = when(prev.isNull ||
      micros - prev > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("__brk", boundary)
      .withColumn("session_index", sum(col("__brk")).over(run).cast("long"))
      .drop("__brk")
  }

  /** Skew-safe [[tag]]: identical output (spec-proven row-for-row), but
    * the big sort runs per (key, DAY) — a bot key's million-event stream
    * splits across its days instead of serializing through one
    * partition's sort, so the heaviest partition is bounded by one
    * key-day, not one key.
    *
    * Stitching: local 1-based session indexes are computed inside each
    * (key, day) slice; a per-(key, day) summary (first/last event micros,
    * local session count — |keys|×|days| rows, metadata-scale next to
    * the event stream) then decides for each day whether its first local
    * session CONTINUES the previous present day's last session (seam gap
    * <= gapSeconds, exactly [[tag]]'s boundary test, so absent days in
    * between fall out naturally when gapSeconds spans them). The global
    * index is local index + (sessions on earlier days) - (stitched
    * seams so far) — two running sums over the summary frame's per-key
    * window, whose partition size is the key's day count, never its
    * event count.
    *
    * Cost: one extra exchange ((key, day) for the slice window, then the
    * summary agg reuses it; the final (key, day) equi-join rides the
    * same partitioning) — the price of removing the per-key sort
    * bottleneck. Use [[tag]] when keys are known to be light. */
  /** Top-k frequent session path n-grams — "what are users' most common
    * 3-step flows": within every gap-session, each sliding window of
    * `n` consecutive event types becomes a ` > `-joined path string
    * (windows never cross session boundaries — the [[transitions]]
    * boundary rule at length n), counted corpus-wide and ranked.
    *
    * Shape: the session tag's one key shuffle; the n−1 leads ride the
    * SAME (key, session) window sort; path counts hash-aggregate with
    * map-side combine (path cardinality ≤ |types|^n — vocabulary-scale
    * for small n); top-k is a TakeOrdered, ranks assigned over the k
    * survivors only. Ties rank by path ascending. */
  def pathNgrams(df: DataFrame, keyCol: String, tsCol: String,
                 tieBreakCol: String, typeCol: String, gapSeconds: Long,
                 n: Int, topK: Int): DataFrame = {
    require(n >= 2, s"paths need n >= 2, got $n")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tagged = tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
    val w = Window.partitionBy(col(keyCol), col("session_index"))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val steps = col(typeCol) +: (1 until n).map(j => lead(col(typeCol), j).over(w))
    val paths = tagged
      .withColumn("__last", steps.last)
      .withColumn("__path", concat_ws(" > ", steps: _*))
      .filter(col("__last").isNotNull) // window fits inside the session
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_occurrences"))
    paths.orderBy(col("n_occurrences").desc, col("path").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("path").asc)))
  }

  def tagSkewSafe(df: DataFrame, keyCol: String, tsCol: String,
                  gapSeconds: Long, tieBreakCol: String): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val wDay = Window.partitionBy(col(keyCol), col("__day"))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val runDay = wDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withDay = df
      .withColumn("__day", to_date(col(tsCol)))
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
    val prev = lag(col("__us"), 1).over(wDay)
    val boundary = when(prev.isNull ||
      col("__us") - prev > gapSeconds * 1000000L, 1).otherwise(0)
    val local = withDay.withColumn("__brk", boundary)
      .withColumn("__li", sum(col("__brk")).over(runDay).cast("long"))
    val summary = local.groupBy(col(keyCol), col("__day"))
      .agg(min(col("__us")).as("__first_us"),
        max(col("__us")).as("__last_us"),
        max(col("__li")).as("__n_sessions"))
    val wKey = Window.partitionBy(col(keyCol)).orderBy(col("__day").asc)
    // first present day: lag is NULL -> condition NULL -> no stitch
    val stitch = when(col("__first_us") - lag(col("__last_us"), 1).over(wKey)
      <= gapSeconds * 1000000L, 1L).otherwise(0L)
    val offsets = summary.withColumn("__stitch", stitch)
      .withColumn("__base", coalesce(sum(col("__n_sessions"))
          .over(wKey.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        - sum(col("__stitch"))
          .over(wKey.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col(keyCol), col("__day"), col("__base"))
    local.join(offsets, Seq(keyCol, "__day"))
      .withColumn("session_index", (col("__base") + col("__li")).cast("long"))
      .drop("__brk", "__li", "__base", "__day", "__us")
  }

  /** Returns one row per session: (keyCol, session_index (1-based),
    * session_start, session_end, n_events). */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
            tieBreakCol: String): DataFrame =
    tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
      .groupBy(col(keyCol), col("session_index"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** [[byGap]] on the skew-safe tag — same output (the q139 oracle is
    * q87's SQL verbatim), heaviest sort partition bounded by one
    * key-day. */
  def byGapSkewSafe(df: DataFrame, keyCol: String, tsCol: String,
                    gapSeconds: Long, tieBreakCol: String): DataFrame =
    tagSkewSafe(df, keyCol, tsCol, gapSeconds, tieBreakCol)
      .groupBy(col(keyCol), col("session_index"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Within-session transition matrix — the user-flow ("Sankey") table:
    * for each ordered pair of event types, how often does `to_type`
    * immediately follow `from_type` inside one session, and what share
    * of `from_type`'s outgoing transitions is that (an exact two-BIGINT
    * division). Session boundaries CUT transitions: the last event of a
    * session has no successor.
    *
    * Shape: the session tag's key shuffle, a second exchange for the
    * (key, session_index) lead window, then one hash aggregate into a
    * |types|² matrix — metadata-scale output, so the per-row share
    * window runs on a tiny frame. */
  def transitions(df: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, gapSeconds: Long,
                  tieBreakCol: String): DataFrame = {
    val tagged = tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
    val w = Window.partitionBy(col(keyCol), col("session_index"))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val matrix = tagged
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    matrix.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"))
  }

  /** Ordered sequence assembly: collapse each key's event stream into ONE
    * row carrying the full ordered value sequence — the
    * training-example builder (SFT conversations, behavioral-cloning
    * trajectories, next-event-prediction examples) that turns a
    * billion-row event log into per-key documents.
    *
    * Ordering is a TOTAL order — (ts, tieBreak) with tieBreak unique per
    * key — pinned inside the row: events collect as structs whose field
    * order is (ts, tie, value), `array_sort` orders them
    * lexicographically by exactly that prefix, and only then is the
    * value projected out and joined. Any engine assembling under the
    * same total order produces the identical string.
    *
    * Shape at 100 TB: one hash aggregate keyed on `keyCol` (partial
    * aggregation packs structs map-side; one key shuffle). Per-key state
    * is the key's OWN event list — bounded by the training-example
    * length a consumer could use anyway; keys too hot for that belong
    * behind [[tagSkewSafe]]'s per-day split or a per-key cap upstream
    * ([[graft.llmdata.Sampling]]), not in a single example. */
  def assembleSequences(df: DataFrame, keyCol: String, tsCol: String,
                        tieBreakCol: String, valueCol: String,
                        sep: String = "->"): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col(tsCol), col(tieBreakCol), col(valueCol)))),
            x => x.getField(valueCol)),
          sep).as("sequence"))

  /** Dwell-time analysis: how long users sit ON each event type before
    * their next action in the same session — the engagement readout
    * behind "which screen do people stall on". An event's dwell is the
    * gap to the session's NEXT event (total (ts, tieBreak) order); each
    * session's final event has no successor and is excluded (its dwell
    * is right-censored, not zero — counting it as 0 would bias every
    * mean downward).
    *
    * Exact arithmetic: gaps are integer microseconds summed as BIGINTs;
    * the mean is ONE final double division. Shape: the one session
    * window [[tag]] already costs, then a types-cardinality hash
    * aggregate. */
  def dwellTimes(df: DataFrame, keyCol: String, tsCol: String,
                 typeCol: String, gapSeconds: Long,
                 tieBreakCol: String): DataFrame = {
    val tagged = tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
    val w = Window.partitionBy(col(keyCol), col("session_index"))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    tagged
      .withColumn("__next_us",
        lead(unix_micros(col(tsCol).cast("timestamp")), 1).over(w))
      .filter(col("__next_us").isNotNull)
      .withColumn("__dwell_us",
        col("__next_us") - unix_micros(col(tsCol).cast("timestamp")))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__dwell_us")).as("total_dwell_us"),
        max(col("__dwell_us")).as("max_dwell_us"))
      .withColumn("mean_dwell_s",
        col("total_dwell_us").cast("double")
          / (col("n_events") * lit(1000000L)).cast("double"))
  }

  /** Top session paths: the first `depth` event types of each session
    * joined with `>` — the "how do users actually start" table behind
    * every onboarding/funnel-design review (the transition MATRIX
    * q135 shows only one hop; paths show the sequence). Sessions
    * shorter than `depth` report their full (shorter) path.
    *
    * Deterministic: in-session order is (ts, tieBreak) — total; the
    * per-session array is built by array_sort over collected structs
    * (order-insensitive input, sorted output), truncated with slice.
    * Shape: the session tag's key shuffle + one (key, session)
    * aggregate + one paths-scale count aggregate; `share` divides two
    * exact BIGINTs on the tiny path frame. */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String,
               typeCol: String, gapSeconds: Long, tieBreakCol: String,
               depth: Int = 3): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val perSession = tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
      .groupBy(col(keyCol), col("session_index"))
      .agg(concat_ws(">",
        slice(transform(
          array_sort(collect_list(struct(col(tsCol).as("t"),
            col(tieBreakCol).as("b"), col(typeCol).as("e")))),
          x => x.getField("e")), 1, depth)).as("path"))
    val counted = perSession.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
    val total = counted.agg(sum(col("n_sessions")).cast("long").as("__tot"))
    counted.crossJoin(broadcast(total))
      .withColumn("share",
        col("n_sessions").cast("double") / col("__tot").cast("double"))
      .drop("__tot")
  }
}
