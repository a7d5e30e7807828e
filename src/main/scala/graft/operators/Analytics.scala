package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-4 analytic operator families over the behavioral tables:
  * cohort retention (the canonical month-offset OLAP matrix), iterative
  * graph propagation (PageRank over the customer–supplier bipartite
  * graph — the repeated join-agg workload that stresses shuffle reuse at
  * cluster scale), and deterministic weighted sampling
  * (Efraimidis–Elisavet priority sampling with a hash-derived uniform, so
  * the drawn sample is reproducible across engines and backfills — the
  * same no-RNG contract as q50's hash split and q59's mixture resample).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q87: cohort retention matrix — customers grouped by first-order
    * month, retention measured as the fraction of each cohort active
    * again k months later (k = 0..3). One groupBy for cohort assignment,
    * one distinct for activity, one join + count-distinct for the
    * matrix; every shuffle keys on (cohort_month | custkey) — the shape
    * scales linearly and AQE-coalesces at small SF. The reference's
    * high-water-mark machinery (P3) answers "what's new"; this answers
    * the follow-on question every warehouse asks of it: "do they come
    * back".
    */
  def q87CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_custkey", date_trunc("month", $"o_orderdate").as("m"))
    val cohort = o.groupBy($"o_custkey").agg(min($"m").as("cm"))
    val sizes = cohort.groupBy($"cm").agg(count(lit(1)).as("cohort_size"))
    val active = o.distinct()
      .join(cohort, "o_custkey")
      .select($"cm", months_between($"m", $"cm").cast("int").as("offset_m"),
        $"o_custkey")
      .filter($"offset_m".between(0, 3))
      .groupBy($"cm", $"offset_m")
      .agg(count_distinct($"o_custkey").as("active"))
    active.join(sizes, "cm")
      .select(date_format($"cm", "yyyy-MM-dd").as("cohort_month"), $"offset_m",
        $"cohort_size", $"active",
        round($"active".cast("double") / $"cohort_size", 6).as("retention"))
      .orderBy($"cohort_month", $"offset_m")
  }

  private val q87Sql =
    """WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m
      |           FROM orders),
      |c AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
      |s AS (SELECT cm, CAST(count(*) AS BIGINT) AS cohort_size
      |      FROM c GROUP BY 1),
      |a AS (SELECT DISTINCT o_custkey, m FROM o),
      |r AS (SELECT cm, CAST(datediff('month', cm, m) AS INTEGER) AS offset_m,
      |        CAST(count(DISTINCT a.o_custkey) AS BIGINT) AS active
      |      FROM a JOIN c USING (o_custkey)
      |      WHERE datediff('month', cm, m) BETWEEN 0 AND 3
      |      GROUP BY 1, 2)
      |SELECT strftime(cm, '%Y-%m-%d') AS cohort_month, offset_m, cohort_size, active,
      |  round(CAST(active AS DOUBLE) / cohort_size, 6) AS retention
      |FROM r JOIN s USING (cm)
      |ORDER BY cohort_month, offset_m""".stripMargin

  private val Damping = 0.85
  private val PrIters = 3

  /** q89: PageRank over the customer–supplier interaction graph (edge =
    * "customer ordered from supplier", undirected so the bipartite walk
    * mixes). The iterative join-agg is THE repeated-shuffle workload of
    * graph analytics at 100 TB: each iteration joins the edge list
    * (shuffled once, reused — persisted here, co-partitioned on a
    * cluster) with the current rank vector and re-aggregates by
    * destination. Three fixed iterations, ranks rounded to 10 digits per
    * iteration so cross-engine float-summation drift cannot compound
    * (drift ~1e-18 per sum vs a 5e-11 rounding band — collision odds are
    * negligible, and identical rounded inputs feed the next iteration);
    * graph size N is a 1-row driver scalar like q06's high-water mark.
    * Companion to q40's connected components: CC answers membership,
    * PageRank answers importance, over the same edge machinery.
    */
  def q89PageRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      .join(t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst"))
      .distinct()
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
      .persist()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg")).persist()
    val n = deg.count()
    var pr = deg.select($"src".as("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to PrIters) {
      pr = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select($"dst", ($"pr" / $"deg").as("contrib"))
        .groupBy($"dst")
        .agg(sum($"contrib").as("in_pr"))
        .select($"dst".as("node"),
          round(lit((1 - Damping) / n) + lit(Damping) * $"in_pr", 10).as("pr"))
    }
    val w = Window.orderBy($"pr".desc, $"node".asc)
    pr.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 20)
      .select($"rank", $"node", round($"pr", 8).as("pagerank"))
      .orderBy($"rank")
  }

  private val q89Sql = {
    def iter(prev: String, out: String) =
      s"""$out AS (
         |  SELECT e.dst AS node,
         |    round((SELECT (1 - $Damping) / n FROM n) +
         |      $Damping * sum(p.pr / d.deg), 10) AS pr
         |  FROM e JOIN $prev p ON e.src = p.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
       |p0 AS (SELECT src AS node, (SELECT 1.0 / n FROM n) AS pr FROM deg),
       |${iter("p0", "p1")},
       |${iter("p1", "p2")},
       |${iter("p2", "p3")}
       |SELECT rank, node, pagerank FROM (
       |  SELECT node, round(pr, 8) AS pagerank,
       |    row_number() OVER (ORDER BY pr DESC, node ASC) AS rank
       |  FROM p3)
       |WHERE rank <= 20
       |ORDER BY rank""".stripMargin
  }

  /** q90: deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis priority sampling): each document draws a
    * "uniform" u from the first 8 md5 hex digits of its id, and the 20
    * smallest priorities -ln(u)/weight win — equivalent to sequential
    * weighted draws, but embarrassingly parallel: priorities compute in
    * the scan projection and one top-k (window at small SF; at corpus
    * scale a per-partition top-k then a 20-row driver merge) selects the
    * sample. No RNG: re-running, backfilling, or re-sharding the corpus
    * reproduces the same sample — the q50 split contract extended to
    * weighted draws. Weight = n_chars, so long documents are
    * proportionally favored (char-budget-fair sampling).
    */
  def q90WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val docs = t(s, dir, "documents")
      .select($"doc_id", $"n_chars", (-log(u) / $"n_chars").as("priority"))
    val w = Window.orderBy($"priority".asc, $"doc_id".asc)
    docs.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 20)
      .select($"rank", $"doc_id", $"n_chars",
        round($"priority", 9).as("priority"))
      .orderBy($"rank")
  }

  private val q90Sql =
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |         + 0.5e0) / 4294967296e0) / n_chars AS priority
      |  FROM documents)
      |SELECT rank, doc_id, n_chars, round(priority, 9) AS priority FROM (
      |  SELECT *, row_number() OVER (ORDER BY priority ASC, doc_id ASC) AS rank
      |  FROM d)
      |WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q87_cohort_retention", Seq("A3", "W2", "EXT-olap"),
      "first-order-month cohort retention matrix, offsets 0-3",
      q87CohortRetention, Some(q87Sql)),
    GraftQuery("q89_pagerank", Seq("EXT-graph", "J1", "A1"),
      "3-iteration PageRank over the customer-supplier bipartite graph",
      q89PageRank, Some(q89Sql)),
    GraftQuery("q90_weighted_sample", Seq("EXT-sample"),
      "deterministic Efraimidis-Spirakis weighted sample, top-20 by priority",
      q90WeightedSample, Some(q90Sql)))
}
