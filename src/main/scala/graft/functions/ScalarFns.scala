package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's scalar-expression library (SURVEY.md §2.6, F1-F14).
  *
  * Every function is a pure `Column => Column` built from
  * `org.apache.spark.sql.functions` — fully codegen'd by Tungsten, no UDFs
  * anywhere (the reference likewise uses only built-in SQL expressions;
  * SURVEY.md §2.9). Citations point into /root/reference/.
  */
object ScalarFns {

  /** F1 — vendor decode (silver_yellow_tripdata.sql:20-26). NULL and
    * unknown codes both fall to 'Unknown', matching CASE-without-ELSE-match
    * semantics in Postgres. */
  def decodeVendor(c: Column): Column =
    when(c === 1, "Creative Mobile Technologies, LLC")
      .when(c === 2, "Curb Mobility, LLC")
      .when(c === 6, "Myle Technologies Inc")
      .when(c === 7, "Helix")
      .otherwise("Unknown")

  /** F2 — ratecode decode (silver_yellow_tripdata.sql:28-36). */
  def decodeRatecode(c: Column): Column =
    when(c === 1, "Standard rate")
      .when(c === 2, "JFK")
      .when(c === 3, "Newark")
      .when(c === 4, "Nassau or Westchester")
      .when(c === 5, "Negotiated fare")
      .when(c === 6, "Group ride")
      .otherwise("Null/unknown")

  /** F3 — payment decode (silver_yellow_tripdata.sql:38-47). */
  def decodePayment(c: Column): Column =
    when(c === 0, "Flex Fare trip")
      .when(c === 1, "Credit card")
      .when(c === 2, "Cash")
      .when(c === 3, "No charge")
      .when(c === 4, "Dispute")
      .when(c === 5, "Unknown")
      .when(c === 6, "Voided trip")
      .otherwise("Unknown")

  /** F4 — EXTRACT(EPOCH FROM (t2-t1)) with sub-second precision
    * (silver_yellow_tripdata.sql:50). Double-cast of a timestamp yields
    * fractional epoch seconds; `unix_timestamp` would truncate. */
  def epochSeconds(t2: Column, t1: Column): Column =
    t2.cast("timestamp").cast("double") - t1.cast("timestamp").cast("double")

  /** F4+F5 — trip duration in minutes, rounded to 2 decimals
    * (silver_yellow_tripdata.sql:50). */
  def durationMinutes(pickup: Column, dropoff: Column): Column =
    round(epochSeconds(dropoff, pickup) / 60.0, 2)

  /** F6 — ABS(COALESCE(x, 0)): the silver money normalization
    * (silver_yellow_tripdata.sql:52-59). */
  def absCoalesce0(c: Column): Column = abs(coalesce(c, lit(0.0)))

  /** F8 — md5 surrogate key over ||-concatenated COALESCE(CAST(col AS
    * VARCHAR), default) fields (silver_yellow_tripdata.sql:72-80).
    *
    * Key-rendering spec (SURVEY.md §7.4 item 1): callers must pass columns
    * whose string rendering is engine-portable — integer/long/string/
    * timestamp columns render identically in Spark and DuckDB/Postgres;
    * raw doubles do NOT ('2.0' vs '2'), so fractional columns must be
    * pre-formatted (e.g. `format_string("%.2f", ..)` — separator-free,
    * matching printf in other engines; NOT `format_number`, which inserts
    * grouping separators at >= 1000)
    * before entering the key. */
  def surrogateKey(parts: Seq[(Column, String)]): Column =
    md5(concat(parts.map { case (c, default) =>
      coalesce(c.cast("string"), lit(default))
    }: _*))

  /** Engine-portable fixed-2-decimal rendering for surrogate-key fields.
    *
    * Formatter families disagree exactly where it hurts: Java's
    * `format_string("%.2f")` rounds HALF_UP on the decimal representation
    * while C/DuckDB `printf` rounds the binary value half-to-even — e.g.
    * 0.125 renders "0.13" vs "0.12", silently forking md5 keys across
    * engines. This renders via integer-cents arithmetic instead:
    * `floor(x*100 + 0.5)` is the same IEEE multiply/add/floor everywhere,
    * and the string assembly is plain integer ops — bit-identical in any
    * engine that has floor/abs/mod/lpad. NULL in → NULL out (concat
    * propagates it), so COALESCE defaults still apply downstream. */
  def render2(c: Column): Column = {
    val cents = floor(c * 100 + lit(0.5)).cast("long")
    val a = abs(cents)
    concat(
      when(cents < 0, lit("-")).otherwise(lit("")),
      floor(a.cast("double") / 100).cast("long").cast("string"),
      lit("."),
      lpad((a % 100).cast("string"), 2, "0"))
  }

  /** F13 — guarded percentage ratio (gold_payment_summary.sql:8-11):
    * CASE WHEN denom <= 0 THEN 0 ELSE num/denom*100 END. */
  def guardedPercent(num: Column, denom: Column): Column =
    when(denom <= 0, lit(0.0)).otherwise(num / denom * 100.0)

  /** F11 — month key 'yyyy-MM' (bronze_yellow_tripdata.sql:34). */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** Decimal-exact sum of a double column, returned as double.
    *
    * Plain `sum(double)` is non-associative: partial-aggregate order (and
    * therefore partition count) changes the low-order bits, which breaks
    * bit-exact comparison against any other engine AND between two runs of
    * this engine at different parallelism. Casting each value to
    * decimal(20,6) first makes the sum exact integer arithmetic —
    * deterministic at any partitioning, any cluster size — then one final
    * cast back to double. The double→decimal cast itself is deterministic
    * (no double is exactly representable at a .5 ULP tie at scale 6).
    * Overhead is small and the aggregation stays whole-stage-codegen'd. */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(20,6)")).cast("double")

  /** Decimal-exact average of a double column (same rationale as
    * [[exactSum]]); NULLs excluded from both numerator and denominator,
    * matching SQL AVG. The division happens in double (not decimal) space —
    * decimal-division scale rules are engine-specific, IEEE double division
    * is not. */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(20,6)")).cast("double") / count(c)

  /** Business days from `start` (exclusive) to `end` (inclusive) —
    * weekday counting for SLA/lead-time math, in PURE INTEGER calendar
    * arithmetic (the q225 weekday discipline: engine `dayofweek()`
    * conventions disagree; epoch-day arithmetic can't). Uses the
    * Monday-anchored absolute index m = epoch_days + 3 and the closed
    * form B(x) = 5·⌊x/7⌋ + min(x mod 7, 5) counting weekdays in
    * [0, x); the answer is B(m_end + 1) − B(m_start + 1). Negative
    * when end < start (anti-symmetric), zero for same-day and
    * weekend-to-adjacent-weekend spans. */
  def businessDaysBetween(start: Column, end: Column): Column = {
    def m(d: Column) =
      (datediff(d, lit("1970-01-01").cast("date")) + 4).cast("long")
    def b(x: Column) =
      lit(5L) * ((x - pmod(x, lit(7L))) / 7).cast("long") +
        least(pmod(x, lit(7L)), lit(5L))
    b(m(end)) - b(m(start))
  }
}
