package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fns._
import graft.operators.Scd2

/** Property-style checks (SURVEY.md §5.3 item 4) with seeded
  * randomization (the scalatest-scalacheck bridge isn't in the offline
  * cache): parser totality over adversarial money strings, window dedup
  * always one row per key, SCD2 invariants under randomized batch
  * sequences.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val rnd = new scala.util.Random(42)

  test("parseMoneyToFloatLenient is total: never throws on arbitrary strings") {
    import spark.implicits._
    // NB strict parseMoneyToFloat THROWS on malformed residue under
    // ANSI mode — matching Snowflake's strict ::float (reference
    // parity). The lenient variant is the dirty-data-at-scale path.
    val adversarial = Seq("", "$", ",", "-$", "$-", "N/A", "1.2.3", "$1,00,0.5",
      "∞", "-", "--1", "$$5", "1e10", " 42 ", "\t", "$,")
    val randomJunk = (1 to 200).map(_ =>
      new String(Array.fill(rnd.nextInt(12))((rnd.nextInt(94) + 33).toChar)))
    val out = (adversarial ++ randomJunk).toDF("s")
      .select(parseMoneyToFloatLenient($"s")).collect()
    assert(out.length == adversarial.length + randomJunk.length)
    // and clean money strings parse identically to the strict version
    assert((adversarial ++ randomJunk).toDF("s")
      .select(parseMoneyToFloatLenient(lit("$1,234.56"))).first().getDouble(0) == 1234.56)
  }

  test("parseMoneyToFloat round-trips clean money renderings") {
    import spark.implicits._
    val vals = (1 to 100).map(_ => math.rint(rnd.between(-999999.99, 999999.99) * 100) / 100)
    val strs = vals.map(d => f"$$$d%,.2f")
    val out = strs.toDF("s").select(parseMoneyToFloat($"s")).collect().map(_.getDouble(0))
    assert(out.toSeq == vals)
  }

  test("window dedup always yields exactly one row per key") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    (1 to 5).foreach { _ =>
      val pairs = (1 to 200).map(_ => (rnd.nextInt(20) + 1, rnd.nextInt(1000)))
      val w = Window.partitionBy($"k").orderBy($"v".asc_nulls_last, $"k".asc)
      val deduped = pairs.toDF("k", "v")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      assert(deduped.count() == pairs.map(_._1).distinct.length)
    }
  }

  test("withGlobalPrefixSums equals the sequential scan under randomized inputs") {
    import spark.implicits._
    // randomized sizes straddle the partition count (empty partitions,
    // single-row partitions, heavy partitions) — the offset bookkeeping
    // must be exact in every layout, including negative addends
    for (n <- Seq(1, 7, 31, 997, 5000)) {
      val rows = (1 to n).map(i =>
        (rnd.nextLong(), rnd.between(-1000L, 1000L), rnd.nextLong() % 5))
        .distinct // unique sort key required by the device
      val df = rows.toDF("k", "a", "b").repartition(13)
      val got = operators.GlobalRank
        .withGlobalPrefixSums(df, Seq("a" -> "ca", "b" -> "cb"), $"k".asc)
        .select($"k", $"ca", $"cb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      var (sa, sb) = (0L, 0L)
      val want = rows.sortBy(_._1).map { case (k, a, b) =>
        sa += a; sb += b; (k, sa, sb)
      }
      assert(got.toSeq == want, s"prefix sums diverged at n=$n")
    }
  }

  test("SCD2 invariants hold under randomized three-run sequences") {
    import spark.implicits._
    def batch(keys: Seq[Int], day: Int) =
      keys.distinct.map(k => (k.toString, s"v$day"))
        .toDF("key", "value")
        .withColumn("last_updated",
          lit(f"2024-01-$day%02d 00:00:00").cast("timestamp"))
    (1 to 5).foreach { _ =>
      def keys() = Seq.fill(8)(rnd.nextInt(6) + 1)
      val (k1, k2, k3) = (keys(), keys(), keys())
      val r1 = Scd2.firstRun(batch(k1, 1), Seq("key"), "last_updated")
      val r2 = Scd2.snapshot(r1, batch(k2, 2), Seq("key"), "last_updated",
        lit("2024-01-02 00:00:00").cast("timestamp"))
      val r3 = Scd2.snapshot(r2, batch(k3, 3), Seq("key"), "last_updated",
        lit("2024-01-03 00:00:00").cast("timestamp"))

      val open = r3.filter($"dbt_valid_to".isNull).groupBy($"key").count()
      assert(open.filter($"count" > 1).count() == 0, "at most one open version per key")
      val nonDistinctVf = r3.groupBy($"key")
        .agg(count(lit(1)).as("n"), countDistinct($"dbt_valid_from").as("nvf"))
        .filter($"n" =!= $"nvf")
      assert(nonDistinctVf.count() == 0, "valid_from distinct per key")
      val allKeys = (k1 ++ k2 ++ k3).distinct.map(_.toString).toSet
      val got = r3.select($"key").distinct().collect().map(_.getString(0)).toSet
      assert(got == allKeys, "every key ever seen is present in history")
    }
  }

  test("applyCdc invariants under randomized change streams") {
    import spark.implicits._
    import graft.operators.Incremental
    // random ops over a small key space; seq is the unique total order
    val changes = (1 to 500).map { seq =>
      (rnd.nextInt(20).toLong,
        if (rnd.nextInt(4) == 0) "D" else "U",
        rnd.nextInt(1000), seq.toLong)
    }
    val df = changes.toDF("key", "op", "payload", "seq")
    val got = Incremental.applyCdc(df, Seq("key"), Seq("seq"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // reference: sequential fold over the ordered stream
    val expected = changes.sortBy(_._4).foldLeft(Map.empty[Long, Int]) {
      case (m, (k, "D", _, _)) => m - k
      case (m, (k, _, p, _)) => m.updated(k, p)
    }
    assert(got == expected)
    // idempotence: re-applying the surviving state as a U-stream is a no-op
    val asStream = got.toSeq.map { case (k, p) => (k, "U", p, 1L) }
      .toDF("key", "op", "payload", "seq")
    val again = Incremental.applyCdc(asStream, Seq("key"), Seq("seq"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(again == got)
  }
}
