package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the round-4 operators: the DuckDB
  * oracles share the operators' algorithmic SHAPE (windows, joins), so
  * both could be wrong the same way; these recompute the answers with
  * naive O(n²)-per-key driver-side sweeps — a genuinely independent
  * algorithm — on sf0.001 and demand exact agreement.
  */
class BruteForceCrossCheckSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q104 islands == naive per-customer interval sweep") {
    val got = operators.Warehouse.q104IntervalMerge(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val orders = Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.get(1).toString.take(10)))
    val expected = orders.groupBy(_._1).map { case (ck, rs) =>
      val ivs = rs.map(_._2).sorted.map { d =>
        val s = LocalDate.parse(d); (s, s.plusDays(30))
      }
      // naive sweep: merge sorted intervals
      var islands = List.empty[(LocalDate, LocalDate)]
      ivs.foreach { case (s, e) =>
        islands match {
          case (cs, ce) :: tail if !s.isAfter(ce) =>
            islands = (cs, if (e.isAfter(ce)) e else ce) :: tail
          case _ => islands = (s, e) :: islands
        }
      }
      val days = islands.map(i => java.time.temporal.ChronoUnit.DAYS.between(i._1, i._2)).sum
      ck -> (rs.length.toLong, islands.length.toLong, days)
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (ck, exp) =>
      assert(got(ck) == exp, s"customer $ck: got ${got(ck)} expected $exp")
    }
  }

  test("q112 nearest == naive per-purchase scan of all clicks") {
    val got = operators.AsOf.q112NearestClick(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    val ev = Tables.load(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("click", "purchase"))
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    byUser.foreach { case (_, rs) =>
      val clicks = rs.filter(_._3 == "click")
      rs.filter(_._3 == "purchase").foreach { case (pid, _, _, pus) =>
        // naive: consider every click; order key (us, event_id) decides
        // same-instant ties; closest |gap| wins, backward wins exact ties
        val best = clicks
          .map { case (cid, _, _, cus) =>
            val before = cus < pus
            val gap = cus - pus // negative when before
            (cid, gap, before)
          }
          .sortBy { case (cid, gap, before) =>
            (math.abs(gap), if (before) 0 else 1, cid)
          }
          .headOption
          // drop clicks at identical (us) with larger event_id than the
          // purchase? The operator orders by (us, event_id): a click at
          // the same microsecond counts as BEFORE only if its event_id
          // is smaller. No same-us pairs exist in this data; assert that.
          .map { case (cid, gap, _) => (cid, gap) }
        assert(clicks.forall(_._4 != pus), "same-instant pair would need tie logic")
        assert(got(pid) == best, s"purchase $pid: got ${got(pid)} expected $best")
      }
    }
  }

  test("q102 triangle census == naive enumeration over the same edges") {
    val r = operators.Warehouse.q102Triangles(spark, dir).collect().head
    // rebuild the kNN edge set naively from lineitem
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey").collect()
      .map(x => (x.getLong(0), x.getLong(1))).distinct
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { sks =>
      for (a <- sks; b <- sks if a != b)
        support((a, b)) = support.getOrElse((a, b), 0) + 1
    }
    // NB .toSeq first: flatMap over a Map with pair results would
    // rebuild a Map and silently collapse edges sharing a min-endpoint
    val picked = support.keys.groupBy(_._1).toSeq.flatMap { case (src, ks) =>
      ks.toSeq.map(k => (k._2, support(k)))
        .sortBy { case (dst, sup) => (-sup, dst) }
        .take(3).map { case (dst, _) =>
          (math.min(src, dst), math.max(src, dst))
        }
    }.toSet
    val nodes = picked.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(n => n ->
      picked.collect { case (a, b) if a == n => b; case (a, b) if b == n => a })
      .toMap
    var tri = 0L
    for ((a, b) <- picked; c <- adj(b) if c > b && picked.contains((a, c))) tri += 1
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(r.getLong(0) == nodes.size, "n_nodes")
    assert(r.getLong(1) == picked.size, "n_edges")
    assert(r.getLong(2) == wedges, "n_wedges")
    assert(r.getLong(3) == tri, s"n_triangles: got ${r.getLong(3)} expected $tri")
  }

  test("q125 stream upsert == batch arg_max, one row per user") {
    import org.apache.spark.sql.functions._
    val out = streaming.StreamingOps.q125StreamUpsert(spark, dir).collect()
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate user in sink")
    val expected = Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(max("event_id").as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.length == expected.size)
    out.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)),
        s"user ${r.getLong(0)}: kept ${r.getLong(1)} not the max event")
    }
  }

  test("q126 rolling 24h == naive per-event trailing scan") {
    val got = operators.Warehouse.q126Rolling24h(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    ev.groupBy(_._2).foreach { case (_, rs) =>
      rs.foreach { case (eid, _, us, _) =>
        val in = rs.filter(x => x._3 >= us - 86400000000L && x._3 <= us)
        val s = math.rint(in.map(x => math.rint(x._4 * 100)).sum) / 100
        assert(got(eid) == ((in.length.toLong, s)),
          s"event $eid: got ${got(eid)} expected (${in.length}, $s)")
      }
    }
  }

  test("q130 pointer doubling == procedural parent-walk per key") {
    val rows = operators.Warehouse.q130TreeClosure(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, root, depth) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (cur, d) = (k, 0L)
      while (cur >= 10) { cur /= 10; d += 1 }
      assert(root == cur, s"key $k: root $root != walked $cur")
      assert(depth == d, s"key $k: depth $depth != walked $d")
    }
  }

  test("q131 session windows are disjoint per user and gap-consistent") {
    val rows = operators.Warehouse.q131SessionWindow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, ws) =>
      val sorted = ws.sortBy(_._2)
      sorted.foreach { case (_, st, en, n) =>
        assert(en - st >= 30 * 60 * 1000, s"user $u: window shorter than gap")
        assert(n >= 1)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 >= e1, s"user $u: overlapping session windows")
        case _ =>
      }
    }
    // total events conserved
    assert(rows.map(_._4).sum == Tables.load(spark, dir, "events").count())
  }

  test("q108 OLS slope == naive least squares on collected monthly sums") {
    val got = operators.Warehouse.q108TrendRegression(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val rows = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .join(Tables.load(spark, dir, "nation"),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .selectExpr("n_name",
        "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS x",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS y")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDecimal(2)))
    rows.groupBy(_._1).foreach { case (nation, rs) =>
      val monthly = rs.groupBy(_._2).map { case (x, ys) =>
        (x.toDouble, ys.map(_._3.doubleValue()).sum)
      }.toSeq
      val n = monthly.length
      val sx = monthly.map(_._1).sum; val sy = monthly.map(_._2).sum
      val sxx = monthly.map(m => m._1 * m._1).sum
      val sxy = monthly.map(m => m._1 * m._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = sy / n - slope * (sx / n)
      val (gs, gi) = got(nation)
      assert(math.abs(gs - slope) < 1e-4, s"$nation slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1e-2, s"$nation intercept $gi vs $intercept")
    }
  }

  test("q132 global rank == driver-side full sort (offset machinery independent)") {
    val got = operators.GlobalRank.q132GlobalRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (k, p) => (-p, k) }
      .zipWithIndex.map { case ((k, _), i) => (i + 1L, k) }
    assert(got.toSeq == expected.toSeq,
      "range-partition + offset ranks must equal the driver sort exactly")
  }

  // independent algorithm: words as symbol LISTS, greedy left-to-right
  // pair replacement by explicit index walk (no delimiter strings)
  private def naiveBpe(words: Seq[String]): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] = words
      .filter(_.nonEmpty).groupBy(identity).map { case (w, ws) =>
        w.toList.map(_.toString) -> ws.length.toLong
      }
    (1 to operators.Bpe.BpeMerges).map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, wc) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + wc)
        }
      }
      val (bl, br) = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
      val cnt = counts((bl, br))
      vocab = vocab.map { case (syms, wc) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == bl && syms(i + 1) == br) {
            out += (bl + br); i += 2 // greedy, non-overlapping
          } else { out += syms(i); i += 1 }
        }
        out.toList -> wc
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      (step, bl, br, cnt)
    }
  }

  test("q136 BPE merges == naive list-walk merge on collected word counts") {
    val got = operators.Bpe.q136BpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val merges = naiveBpe(Tables.load(spark, dir, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ")).toSeq)
    assert(got.toSeq == merges,
      "delimiter-string replace must equal the explicit greedy list walk")
  }

  test("q136 BPE greedy replace merges adjacent repeats (abab-shaped words)") {
    import spark.implicits._
    // 'xyxyxyxy' makes the learned merge (x,y) — and then (xy,xy) —
    // occur repeatedly ADJACENTLY inside one word: the shape where a
    // shared-delimiter replace under-merges ([ab,a,b] instead of
    // [ab,ab]); the double-delimiter encoding must match the walk
    val texts = Seq(
      "xy xy xyxy xyxyxy xyxyxyxy",
      "xy xyxy zq zq zq",
      "ab abab abab ababab")
    val tmp = java.nio.file.Files.createTempDirectory("bpe-abab").toString
    texts.toDF("text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = operators.Bpe.q136BpeTrain(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val merges = naiveBpe(texts.flatMap(_.split(" ")))
    assert(got.toSeq == merges,
      "adjacent-repeat merges must equal the explicit greedy list walk")
  }

  test("q140 LPA == naive driver-side synchronous label propagation") {
    val got = operators.Analytics.q140LabelPropagation(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    val e0 = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .selectExpr("concat('c', o_custkey) AS src", "concat('s', l_suppkey) AS dst")
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val edges = (e0 ++ e0.map(_.swap)).toSeq
    var labels: Map[String, String] =
      edges.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      val next = edges.groupBy(_._2).map { case (node, es) =>
        val freq = es.map(e => labels(e._1))
          .groupBy(identity).map { case (l, ls) => (l, ls.size) }
        node -> freq.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
      labels = next
    }
    val expected = labels.groupBy(_._2).map { case (community, ms) =>
      val members = ms.keys.toSeq.sorted
      (community, members.size.toLong, members.head, members.last)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected,
      "distributed mode-of-neighbors must equal the driver recomputation")
  }

  test("q157 semi-sync LPA == naive Gauss-Seidel walk, and is a fixed point") {
    val got = operators.Analytics.q157LpaSemiSync(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    val e0 = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .selectExpr("concat('c', o_custkey) AS src", "concat('s', l_suppkey) AS dst")
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val edges = (e0 ++ e0.map(_.swap)).toSeq
    var labels: Map[String, String] =
      edges.map(_._1).distinct.map(n => n -> n).toMap
    def halfRound(side: String): Map[String, String] = {
      val upd = edges.filter(_._2.startsWith(side)).groupBy(_._2)
        .map { case (node, es) =>
          val freq = es.map(e => labels(e._1))
            .groupBy(identity).map { case (l, ls) => (l, ls.size) }
          node -> freq.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
      labels.map { case (n, l) => n -> upd.getOrElse(n, l) }
    }
    for (_ <- 1 to 3; side <- Seq("s", "c")) labels = halfRound(side)
    val expected = labels.groupBy(_._2).map { case (community, ms) =>
      val members = ms.keys.toSeq.sorted
      (community, members.size.toLong, members.head, members.last)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected,
      "distributed half-rounds must equal the driver Gauss-Seidel walk")
    // convergence: one more full round must not move any label — the
    // property synchronous LPA cannot promise on this bipartite graph
    val converged = labels
    for (side <- Seq("s", "c")) labels = halfRound(side)
    assert(labels == converged, "semi-sync LPA did not reach a fixed point")
  }
}
