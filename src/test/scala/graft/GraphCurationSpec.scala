package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-9 additions q202-q207 — each query
  * is oracle-hash-gated against DuckDB, so these tests check what the
  * hash cannot: that BOTH engines' shared semantics equal an
  * independent brute-force restatement computed in plain Scala.
  */
class GraphCurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** The q102/q202/q203 graph, reconstructed independently: canonical
    * (sa < sb) edges of the top-3-partner co-supply graph.
    */
  private def bruteEdges(): Set[(Long, Long)] = {
    import spark.implicits._
    val base = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".cast("long"), $"l_suppkey".cast("long"))
      .as[(Long, Long)].collect().toSet
    val support = (for {
      (ok, sk) <- base.toSeq
      (ok2, sk2) <- base if ok2 == ok && sk2 != sk
    } yield (sk, sk2)).groupBy(identity).view.mapValues(_.size).toMap
    val picked = support.keys.map(_._1).toSeq.distinct.flatMap { src =>
      support.filter(_._1._1 == src).toSeq
        .sortBy { case ((_, dst), sup) => (-sup, dst) }
        .take(3)
        .map { case ((a, b), _) => (math.min(a, b), math.max(a, b)) }
    }
    picked.toSet
  }

  test("q202: peel rounds match an independent sequential k-core peel") {
    val rows = operators.Warehouse.q202KcorePeel(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent peel: adjacency from brute edges, K=4
    val canon = bruteEdges()
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    canon.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    var live = adj.keySet.toSet
    val peelOf = scala.collection.mutable.Map[Long, Int]()
    var round = 1
    var changed = true
    while (changed) {
      val rem = live.filter(n => (adj(n) & live).size < 4)
      changed = rem.nonEmpty
      if (changed) { rem.foreach(peelOf(_) = round); live --= rem; round += 1 }
    }
    live.foreach(peelOf(_) = 0)
    val expect = peelOf.toSeq.groupBy(_._2).map { case (pr, ns) =>
      pr -> (ns.size, ns.map(_._1).min, ns.map(_._1).max)
    }
    val got = rows.map(r => r.getInt(0) ->
      (r.getLong(1).toInt, r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"got $got vs brute $expect")
    // the graph is 3-degenerate by construction: 4-core must be empty
    assert(!got.contains(0), "4-core unexpectedly non-empty on a top-3 graph")
    // and the cascade must be a real iteration, not a single sweep
    assert(got.keySet.max >= 2, "peel converged in one round — no cascade")
  }

  test("q203: coefficient profile is consistent with the q102 census") {
    val prof = operators.Warehouse.q203LocalClustering(spark, dir).collect()
    assert(prof.nonEmpty)
    prof.foreach { r =>
      val (deg, tri, coef) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(coef >= 0.0 && coef <= 1.0, s"coef $coef out of [0,1]")
      assert(tri <= deg * (deg - 1) / 2, "more triangles than wedges at a node")
    }
    val census = operators.Warehouse.q102Triangles(spark, dir).collect().head
    // corner-exploded per-node counts sum to exactly 3 per triangle
    val triSum = prof.map(r => r.getLong(1) * r.getLong(2)).sum
    assert(triSum == 3 * census.getLong(3),
      s"per-node tri sum $triSum != 3 * ${census.getLong(3)}")
    // node counts agree with the census
    assert(prof.map(_.getLong(2)).sum == census.getLong(0))
  }

  test("q204: prefix-filtered join equals brute-force all-pairs Jaccard") {
    import spark.implicits._
    val got = operators.Dedup.q204PpjoinExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force on the FULL (uncapped) shingle universe
    val sets = Tables.load(spark, dir, "documents")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .collect().map { case (id, text) =>
        val t = text.split(" ", -1)
        id -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
    val brute = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (ida, sa) = sets(i)
      (idb, sb) = sets(j)
      common = (sa & sb).size
      if common > 0 && common.toDouble / (sa.size + sb.size - common) >= 0.6
    } yield {
      val (x, y) = if (ida < idb) (ida, idb) else (idb, ida)
      (x, y, common.toLong)
    }).toSet
    assert(got == brute,
      s"ppjoin missed ${(brute -- got).size}, extra ${(got -- brute).size}")
    assert(brute.nonEmpty, "vacuous: no qualifying pair at sf0.001")
  }

  test("q205: bucket-pruned skyline equals the brute-force definition") {
    import spark.implicits._
    val got = operators.Curation.q205Skyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = Tables.load(spark, dir, "documents")
      .select($"doc_id".cast("long"), $"n_chars".cast("long"), $"text")
      .as[(Long, Long, String)].collect().map { case (id, nc, text) =>
        val t = text.split(" ", -1)
        (id, nc, 1000L * t.distinct.length / t.length)
      }
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet
    assert(got == brute, s"skyline mismatch: got ${got.size}, brute ${brute.size}")
    assert(brute.size >= 3, "degenerate skyline")
  }

  test("q208: edge peel matches an independent sequential k-truss peel") {
    val rows = operators.Warehouse.q208KtrussPeel(spark, dir).collect()
    assert(rows.nonEmpty)
    var cur = bruteEdges()
    val peelOf = scala.collection.mutable.Map[(Long, Long), Int]()
    var round = 1
    var changed = true
    while (changed) {
      val tris = for {
        (x, y) <- cur; (y2, z) <- cur if y2 == y && cur.contains((x, z))
      } yield (x, y, z)
      val sup = tris.toSeq.flatMap { case (x, y, z) =>
        Seq((x, y), (y, z), (x, z))
      }.groupBy(identity).view.mapValues(_.size).toMap
      val rem = cur.filter(e => sup.getOrElse(e, 0) < 2)
      changed = rem.nonEmpty
      if (changed) { rem.foreach(peelOf(_) = round); cur --= rem; round += 1 }
    }
    cur.foreach(peelOf(_) = 0)
    val expect = peelOf.toSeq.groupBy(_._2).map { case (pr, es) =>
      pr -> (es.size, es.map(_._1._1).min, es.map(_._1._2).max)
    }
    val got = rows.map(r => r.getInt(0) ->
      (r.getLong(1).toInt, r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"got $got vs brute $expect")
    assert(got.keySet.max >= 2, "truss peel converged in one round — no cascade")
  }

  test("q209: verdicts are internally consistent and both classes appear") {
    val rows = operators.Platform.q209FdDiscovery(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (ng, nv, mx, holds) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(holds == (nv == 0L), "holds flag disagrees with violation count")
      assert(nv <= ng && mx >= 1)
      if (holds) assert(mx == 1L, "held FD with a multi-valued group")
    }
    // the key LHS groups once per row; the derived FD holds on a
    // NON-unique LHS (the class uniqueness checks cannot certify)
    val byLhs = rows.map(r => r.getString(0) -> r).toMap
    val nOrders = Tables.load(spark, dir, "orders").count()
    assert(byLhs("o_orderkey").getLong(2) == nOrders)
    val derived = byLhs("o_orderpriority")
    assert(derived.getBoolean(5) && derived.getLong(2) < nOrders)
    assert(rows.exists(!_.getBoolean(5)), "no failing candidate (vacuous)")
  }

  test("q210: PSI terms are non-negative, bins cover both eras exactly") {
    import spark.implicits._
    val rows = operators.Platform.q210PsiDrift(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10), "bins not dense 1..10")
    // (p-q)ln(p/q) has matching signs in both factors: every term >= 0
    rows.foreach(r => assert(r.getDouble(3) >= 0.0, "negative PSI term"))
    // bin populations partition each era exactly
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    val o = Tables.load(spark, dir, "orders")
    val split = to_timestamp(lit("1998-01-01"))
    assert(rows.map(_.getLong(1)).sum ==
      o.filter($"o_orderdate" < split).count())
    assert(rows.map(_.getLong(2)).sum ==
      o.filter($"o_orderdate" >= split).count())
    // ntile makes reference tiles near-equal: sizes differ by <= 1
    val nr = rows.map(_.getLong(1))
    assert(nr.max - nr.min <= 1, "reference deciles not equi-depth")
  }

  test("q211: contingency cells partition orders; expected sums match marginals") {
    val rows = operators.Platform.q211Chi2Independence(spark, dir).collect()
    val nOrders = Tables.load(spark, dir, "orders").count()
    // observed cells partition the table exactly
    assert(rows.map(_.getLong(2)).sum == nOrders, "cells don't partition orders")
    // every chi2 term is finite and >= 0 (E > 0 whenever a cell exists)
    rows.foreach { r =>
      assert(r.getDouble(5) > 0.0, "non-positive expected count")
      assert(r.getDouble(6) >= 0.0 && !r.getDouble(6).isNaN, "bad chi2 term")
    }
    // each status's row_tot equals the sum of its observed cells (marginal
    // consistency — the broadcast attach didn't duplicate or drop)
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      assert(grp.map(_.getLong(2)).sum == grp.head.getLong(3),
        "row marginal != sum of observed cells")
    }
  }

  test("q215: scc ids are min members, sizes partition the vertex set, a core exists") {
    import spark.implicits._
    val out = operators.Warehouse.q215Scc(spark, dir).persist()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the canonical id is the component's minimum member
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0),
      s"scc_id above a member: $r"))
    assert(out.filter($"custkey" === $"scc_id").select($"custkey").distinct()
      .count() == out.select($"scc_id").distinct().count(),
      "some component's id is not one of its members")
    // sizes are consistent: each scc_id appears exactly scc_size times
    val bad = out.groupBy($"scc_id", $"scc_size").count()
      .filter($"count" =!= $"scc_size")
    assert(bad.count() == 0, "scc_size disagrees with the membership count")
    // the day-hub construction must yield at least one non-trivial core
    assert(rows.map(_.getLong(2)).max >= 2, "no non-trivial SCC found")
    // every vertex appears exactly once
    assert(out.select($"custkey").distinct().count() == rows.length)
    out.unpersist(false)
  }

  test("q207: top-30 is rank-contiguous, count-guarded, PMI-sorted") {
    val rows = operators.TextAnalysis.q207PmiCollocations(spark, dir).collect()
    assert(rows.length == 30)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 30))
    rows.foreach(r => assert(r.getLong(3) >= 5, "low-count pair leaked"))
    val pmis = rows.map(_.getDouble(4)).toSeq
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b }, "not sorted")
  }
}
