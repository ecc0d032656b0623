package graft

import org.apache.spark.sql.functions._
import graft.functions.ScalarFns._

class ScalarFnsSpec extends SparkSpec {
  import spark.implicits._

  test("decoders map known codes and fall through to defaults") {
    val df = Seq((1, 1, 0), (2, 6, 1), (6, 99, 6), (7, 2, 7), (99, 3, 99))
      .toDF("v", "r", "p")
      .select(decodeVendor($"v").as("vn"), decodeRatecode($"r").as("rn"),
        decodePayment($"p").as("pn"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) == ("Creative Mobile Technologies, LLC", "Standard rate", "Flex Fare trip"))
    assert(rows(1) == ("Curb Mobility, LLC", "Group ride", "Credit card"))
    assert(rows(2) == ("Myle Technologies Inc", "Null/unknown", "Voided trip"))
    assert(rows(3) == ("Helix", "JFK", "Unknown"))
    assert(rows(4) == ("Unknown", "Newark", "Unknown"))
  }

  test("decoders send NULL to the else branch (Postgres CASE semantics)") {
    val df = Seq[(Option[Int], Option[Int])]((None, None)).toDF("v", "r")
      .select(decodeVendor($"v").as("vn"), decodeRatecode($"r").as("rn"))
    assert(df.first().getString(0) == "Unknown")
    assert(df.first().getString(1) == "Null/unknown")
  }

  test("absCoalesce0: NULL → 0, negatives flipped") {
    val df = Seq[Option[Double]](Some(-3.5), None, Some(2.0)).toDF("x")
      .select(absCoalesce0($"x").as("y"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(3.5, 0.0, 2.0))
  }

  test("durationMinutes keeps sub-second precision (no unix_timestamp truncation)") {
    val df = Seq(("2024-01-01 00:00:00.500", "2024-01-01 00:10:30.500"))
      .toDF("a", "b")
      .select(durationMinutes($"a".cast("timestamp"), $"b".cast("timestamp")).as("m"))
    assert(df.first().getDouble(0) == 10.5)
  }

  test("render2 is separator-free, halfway-stable, and null-propagating") {
    val out = Seq(Some(0.125), Some(1234.5), Some(2.0), Some(-1.005), None)
      .toDF("x").select(render2($"x").as("r")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    // 0.125*100+0.5 = 13.0 exactly → "0.13" on EVERY engine (no
    // printf-family divergence); 1234.5 → no grouping separator
    assert(out(0) == "0.13")
    assert(out(1) == "1234.50")
    assert(out(2) == "2.00")
    assert(out(3) == "-1.00") // floor(-100.5+0.5) = -100 cents
    assert(out(4) == null)    // NULL propagates for COALESCE defaults
  }

  test("surrogateKey is stable and null-defaulted") {
    val df = Seq((Some(1), Some(2)), (None, Some(2))).toDF("a", "b")
      .select(surrogateKey(Seq($"a" -> "-1", $"b" -> "-1")).as("k"))
    val ks = df.collect().map(_.getString(0))
    // md5("12") vs md5("-12") — distinct, deterministic
    assert(ks(0) == "c20ad4d76fe97759aa27a0c99bff6710")
    assert(ks(0) != ks(1))
  }

  test("exactSum is invariant under repartitioning (the determinism contract)") {
    val vals = (1 to 10000).map(i => math.sin(i) * 1e6)
    val a = vals.toDF("x").repartition(1).agg(exactSum($"x")).first().getDouble(0)
    val b = vals.toDF("x").repartition(97).agg(exactSum($"x")).first().getDouble(0)
    assert(a == b, "decimal-path sum must be bit-identical at any parallelism")
  }

  test("guardedPercent returns 0 on non-positive denominator") {
    val df = Seq((5.0, 0.0), (5.0, 10.0)).toDF("n", "d")
      .select(guardedPercent($"n", $"d").as("p"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 50.0))
  }
}
