package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the data-ops audit family (q114-q119). */
class AuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q114: estimator is honest — n_sample near 10%, CI positive") {
    val rows = operators.Audit.q114SampleEstimate(spark, dir).collect()
    assert(rows.nonEmpty)
    val o = Tables.load(spark, dir, "orders")
    val byStatus = o.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (st, n) = (r.getString(0), r.getLong(1))
      val frac = n.toDouble / byStatus(st)
      assert(frac > 0.04 && frac < 0.2, s"$st sample fraction $frac")
      assert(r.getDouble(3) > 0, "CI half-width must be positive")
    }
  }

  test("q115: every supplier gets <= 3 distinct ranked brands") {
    val rows = operators.Audit.q115TopBrandArray(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val brands = r.getString(1).split("\\|")
      assert(brands.length >= 1 && brands.length <= 3)
      assert(brands.distinct.length == brands.length, "duplicate brand in top-k")
    }
  }

  test("q116: the synthetic star is referentially intact") {
    val rows = operators.Audit.q116FkAudit(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(4) == 0, s"${r.getString(0)}: orphans found")
      assert(r.getLong(3) == 0, s"${r.getString(0)}: null FKs found")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("q117: checksum is order-free (matches a reversed-read recompute)") {
    val rows = operators.Audit.q117TableChecksums(spark, dir).collect()
    assert(rows.length == 6)
    // recompute one table's checksum from a differently-ordered frame
    val o = Tables.load(spark, dir, "orders").orderBy(col("o_totalprice").desc)
    val again = o.agg(
      sum(conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long"))).collect().head.getLong(0)
    val reported = rows.find(_.getString(0) == "orders").get.getLong(2)
    assert(again == reported, "row order changed the checksum")
  }

  test("q118: keyset page equals the OFFSET page exactly, in order") {
    val keyset = operators.Audit.q118KeysetPage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(keyset.length == 20)
    val offset = Tables.load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(60).collect().drop(40)
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(keyset.sameElements(offset), "keyset page != offset page")
  }

  test("q122: SQL star join matches the DataFrame-API composition") {
    import org.apache.spark.sql.functions._
    val sql = operators.SqlSurface.q122StarJoin(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(sql.nonEmpty)
    // independent DataFrame-API recompute of one (region, nation) cell
    val ((region, nation), revenue) = sql.head
    val li = Tables.load(spark, dir, "lineitem")
    val api = li
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(Tables.load(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      .filter(col("r_name") === region && col("n_name") === nation)
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .collect().head.getDouble(0)
    assert(math.abs(api - revenue) < 1.0, s"$region/$nation: $revenue vs $api")
  }

  test("q123: every kept part is strictly above its brand average") {
    val rows = operators.SqlSurface.q123CorrelatedSubquery(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > r.getDouble(3),
        s"part ${r.getLong(0)} not above brand avg")
    }
    // and it must be a strict subset: some parts fall at-or-below average
    val total = Tables.load(spark, dir, "part").count()
    assert(rows.length < total)
  }

  test("q124: enrichment preserves fact cardinality (intervals disjoint)") {
    import org.apache.spark.sql.functions._
    val out = operators.Incremental.q124Scd2Enrich(spark, dir)
    val n = out.count()
    val facts = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1998-01-01").count()
    assert(n == facts,
      s"enrichment changed cardinality: $n vs $facts (double/zero match)")
    // both regimes present: matched versions and pre-history orders
    val matched = out.filter(col("dim_status").isNotNull).count()
    assert(matched > 0 && matched < n)
  }

  test("q127: NULL keys route to UNKNOWN; plain = would drop them") {
    val rows = operators.SqlSurface.q127NullSafeJoin(spark, dir).collect()
    val byLabel = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.contains("UNKNOWN") && byLabel("UNKNOWN") > 0,
      "null-safe join lost the NULL bucket")
    val total = Tables.load(spark, dir, "orders").count()
    assert(byLabel.values.sum == total, "join dropped or duplicated orders")
  }

  test("q128: union by name fills missing columns with NULL, loses no rows") {
    import org.apache.spark.sql.functions._
    val out = operators.SqlSurface.q128UnionByName(spark, dir)
    val c = Tables.load(spark, dir, "customer").count()
    val s = Tables.load(spark, dir, "supplier").count()
    assert(out.count() == c + s)
    assert(out.filter(col("party_type") === "supplier" &&
      col("mktsegment").isNotNull).count() == 0)
    assert(out.filter(col("party_type") === "customer" &&
      col("nationkey").isNotNull).count() == 0)
    assert(out.filter(col("acctbal").isNull).count() == 0)
  }

  test("q129: delta + old == full recompute (bilinear expansion closes)") {
    import org.apache.spark.sql.functions._
    val delta = operators.Incremental.q129JoinDelta(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val orders = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    def pairs(oldOnly: Boolean) = {
      val a = if (oldOnly) orders.filter(col("o_orderdate") < "1997-01-01") else orders
      val b = if (oldOnly) cust.filter(col("c_custkey") % 10 =!= 0) else cust
      a.join(b, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val full = pairs(oldOnly = false)
    val old = pairs(oldOnly = true)
    full.foreach { case (nk, n) =>
      val d = delta.getOrElse(nk, 0L)
      assert(old.getOrElse(nk, 0L) + d == n,
        s"nation $nk: old + delta != full ($d)")
    }
    assert(delta.values.sum > 0)
  }

  test("q119: TWAP differs from the plain mean and durations add up") {
    val rows = operators.Audit.q119Twap(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0, "non-positive total duration")
      assert(r.getDouble(3) > 0 && r.getDouble(4) > 0)
    }
    // time weighting must actually move SOME estimate
    assert(rows.exists(r => math.abs(r.getDouble(3) - r.getDouble(4)) > 1e-6))
  }

  test("q114: empty and 1-row strata report nulls, never NaN or a drop") {
    import spark.implicits._
    // replicate the operator's hash draw to PLACE keys in/out of the
    // sample deliberately — the gate data never produces an empty or
    // singleton stratum, so these guard branches were unexercised
    def u(key: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("est" + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble + 0.5) /
        4294967296.0
    }
    val keys = (1L to 4000L)
    val sampled = keys.filter(u(_) < 0.1)
    val unsampled = keys.filterNot(u(_) < 0.1)
    assert(sampled.size >= 1 && unsampled.size >= 9, "draw too small")
    val tmp = java.nio.file.Files.createTempDirectory("audit-edge").toString
    // stratum U: 5 unsampled keys -> n_sample = 0 (missed entirely)
    // stratum S: 1 sampled + 4 unsampled -> n_sample = 1 (no variance)
    val rows =
      unsampled.take(5).map(k => (k, "U", java.math.BigDecimal.valueOf(100.0))) ++
      (sampled.take(1) ++ unsampled.drop(5).take(4))
        .map(k => (k, "S", java.math.BigDecimal.valueOf(200.0)))
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = operators.Audit.q114SampleEstimate(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("U", "S"), "a stratum was silently dropped")
    val uRow = got("U")
    assert(uRow.getLong(1) == 0 && uRow.isNullAt(2) && uRow.isNullAt(3) &&
      uRow.isNullAt(5), "empty stratum must be all-null, present")
    val sRow = got("S")
    assert(sRow.getLong(1) == 1 && !sRow.isNullAt(2) && sRow.isNullAt(3),
      "1-row stratum has an estimate but no CI")
  }
}
