package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchAggregates._

/** The two mergeable-summary aggregates: the Misra-Gries theorem bounds
  * (which q70's oracle rests on) and the bloom filter's no-false-negative
  * side (which q69's correctness rests on).
  */
class SketchAggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("MisraGries: est within [true - n/(k+1), true] for every emitted key") {
    import spark.implicits._
    // skewed synthetic stream: key h0 = 30%, h1 = 20%, 50 tail keys 1% each
    val rows = Seq.tabulate(10000) { i =>
      if (i % 10 < 3) "h0" else if (i % 10 < 5) "h1" else s"t${i % 50}"
    }
    val k = 20
    // 4 partitions force the merge path, not just sequential updates
    val mg = rows.toDF("key").repartition(4)
      .agg(misraGries($"key", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.key".as("key"), $"e.est".as("est"))
      .as[(String, Long)].collect().toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    assert(mg.size <= k, "summary must hold at most k counters")
    mg.foreach { case (key, est) =>
      val t = truth(key)
      assert(est <= t, s"$key overcounted: est=$est true=$t")
      assert(est >= t - n / (k + 1), s"$key undercounted past bound")
    }
    // the theorem's point: both heavy keys (>n/(k+1)) MUST be present
    assert(mg.contains("h0") && mg.contains("h1"))
  }

  test("MisraGries: eviction exercised and uniform tail evictable") {
    import spark.implicits._
    // 200-key uniform stream into k=20 counters: constant eviction; no
    // key is guaranteed (none exceeds n/21), but bounds must still hold
    val rows = Seq.tabulate(4000)(i => s"u${i % 200}")
    val mg = rows.toDF("key").repartition(4)
      .agg(misraGries($"key", 20).as("hh"))
      .select(explode($"hh").as("e")).select($"e.est".as("est"))
      .as[Long].collect()
    assert(mg.length <= 20)
    assert(mg.forall(e => e <= 20L), "uniform 20-count keys can't exceed true count")
  }

  test("MisraGries: nulls ignored, empty input yields empty summary") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("a"), None, Some("a"))
      .toDF("key")
    val out = df.agg(misraGries($"key", 4).as("hh"))
      .select(explode($"hh").as("e")).select($"e.key", $"e.est")
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L)))
    val empty = Seq("x").toDF("key")
      .filter(lit(false))
      .agg(misraGries($"key", 4).as("hh")).select(size($"hh")).head().getInt(0)
    assert(empty == 0)
  }

  test("bloom filter: zero false negatives over the real dim keys") {
    import spark.implicits._
    val dim = Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val bf = dim.agg(bloomFilterAgg($"c_custkey", 100000L, 800000L).as("b"))
      .head().getAs[Array[Byte]]("b")
    val misses = dim.filter(!mightContain(lit(bf), $"c_custkey")).count()
    assert(misses == 0, "a bloom filter must never reject an inserted key")
  }

  test("q69 == plain exact semi-join (bloom prune is transparent)") {
    import spark.implicits._
    val dim = Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val plain = Tables.load(spark, dir, "orders")
      .join(broadcast(dim), $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
    val pruned = graft.operators.Extended.q69BloomPruneJoin(spark, dir)
      .select($"o_orderpriority", $"n_orders")
    assert(pruned.except(plain).count() == 0 && plain.except(pruned).count() == 0)
  }

  test("CountMin: est >= true always; overcount bounded; absent key ~ 0") {
    import spark.implicits._
    val depth = 5
    val width = 256
    // 400 distinct keys over width=256 forces real collisions
    val rows = Seq.tabulate(8000)(i => s"k${i % 400}")
    val sk = rows.toDF("key").repartition(4)
      .agg(countMin($"key", depth, width).as("sk"))
    val probes = (0 until 400).map(i => s"k$i") :+ "never-seen"
    val est = sk.crossJoin(probes.toDF("p"))
      .select($"p", countMinQuery($"sk", $"p", depth, width).as("est"))
      .as[(String, Long)].collect().toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    probes.dropRight(1).foreach { p =>
      assert(est(p) >= truth(p), s"$p undercounted — CMS can never")
      assert(est(p) <= truth(p) + 3L * rows.size / width,
        s"$p overcounted past 3N/width")
    }
    assert(est("never-seen") <= 3L * rows.size / width)
    // the collision path must actually be live at this density
    assert(probes.dropRight(1).exists(p => est(p) > truth(p)),
      "no collisions at 400 keys / 256 counters — hash suspect")
  }

  test("CountMin: merge path equals single-partition build") {
    import spark.implicits._
    val rows = Seq.tabulate(2000)(i => s"k${i % 97}")
    def build(parts: Int) = rows.toDF("key").repartition(parts)
      .agg(countMin($"key", 3, 64).as("sk"))
      .select(explode($"sk").as("c")).as[Long].collect().toSeq
    assert(build(1) == build(8), "counter matrices must add exactly")
  }

  test("Kmv: below k the sketch is the exact distinct hash set") {
    import spark.implicits._
    val rows = (Seq.tabulate(300)(i => s"d${i % 50}")).toDF("key")
    val arr = rows.repartition(4).agg(kmv($"key", 512).as("sk"))
      .select(size($"sk")).as[Int].head()
    assert(arr == 50, s"50 distinct below k=512 must be stored exactly, got $arr")
  }

  test("Kmv: union estimator within 3/sqrt(k) of truth when saturated") {
    import spark.implicits._
    val k = 256
    val rows = Seq.tabulate(12000)(i => s"v${i % 4000}").toDF("key")
    val sk = rows.repartition(8).agg(kmv($"key", k).as("sk"))
      .select($"sk", element_at($"sk", k).as("kth"))
      .select(size($"sk").as("n"), $"kth").as[(Int, Long)].head()
    assert(sk._1 == k, "saturated sketch must hold exactly k hashes")
    val u = (sk._2.toDouble + 9.223372036854775808e18) / 1.8446744073709551616e19
    val est = (k - 1).toDouble / u
    assert(math.abs(est - 4000.0) <= 4000.0 * 3.0 / math.sqrt(k),
      s"estimate $est strayed past 3 sigma from 4000")
  }

  test("TopKBy == window row_number formulation, ties + merge path + plan") {
    import spark.implicits._
    // synthetic with HEAVY ties: ord = i % 7 (many equal), id unique;
    // 8 partitions force partial-heap merges, not sequential updates
    val df = spark.range(0, 5000).select(
      (col("id") % 13).cast("string").as("g"),
      (col("id") % 7).cast("double").as("ord"),
      col("id").as("rid")).repartition(8)
    val viaAgg = df.groupBy($"g")
      .agg(topkBy($"ord", $"rid", 4).as("t"))
      .select($"g", explode($"t").as("e"))
      .select($"g", $"e.rank".as("rank"), $"e.id".as("rid"), $"e.ord".as("ord"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"ord".desc, $"rid".asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 4)
      .select($"g", $"rank", $"rid", $"ord")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "bounded-heap top-k must equal the window formulation exactly")
    // plan shape: the aggregate runs as ObjectHashAggregate with a
    // partial stage -- the O(groups x k) shuffle is the whole point
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") &&
      (plan.contains("partial_topk_by") || plan.contains("topk_by")), plan.take(500))
    // nulls ignored; k larger than the group emits the whole group ranked
    val tiny = Seq((Some(1.0), 10L), (None, 11L), (Some(2.0), 12L))
      .toDF("o", "i")
      .agg(topkBy($"o", $"i", 99).as("t"))
      .select(explode($"t").as("e")).select($"e.rank", $"e.id").as[(Int, Long)]
      .collect().toSeq
    assert(tiny == Seq((1, 12L), (2, 10L)))
  }
}
