package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}

/** Similarity search over the embedding column (Array[Float], dim 64) —
  * the north-star ANN extension (BASELINE.json). Brute-force cosine is the
  * correctness baseline; label-blocked search is the IVF-shaped scale
  * path (probe only the partition a vector routes to).
  *
  * Numeric determinism: dot products fold left-to-right over the array
  * (`aggregate` over `zip_with`), after a float→double widening that is
  * exact by IEEE-754 — so per-pair similarity is bit-identical in any
  * engine that evaluates the same sequential fold; ties in top-k are
  * broken on rounded similarity then id.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String) = Tables.loadSpread(s, dir, n)

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays — a native codegen'd
    * Expression (NativeExpressions.DotProduct), bit-identical to the
    * `aggregate(zip_with(...))` formulation it replaced but ~7x faster (the
    * higher-order builtins are CodegenFallback with per-element dispatch).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** q21: embedding near-dup pairs, blocked by label (IVF-style cell
    * restriction: |cell|² pairs instead of |all|²). Cosine rounded to 6
    * digits to absorb the one non-guaranteed bit of cross-engine libm
    * sqrt; pairs above 0.35 survive (the synthetic embeddings top out near 0.47 intra-label).
    */
  def q21EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Norms are computed once per vector BEFORE the pairwise join (O(n)
    // instead of O(pairs) sqrt-folds) — same arithmetic as
    // dot/(sqrt(aa)*sqrt(bb)), so oracle-identical.
    val e = t(s, dir, "embeddings")
      .select($"vec_id", $"label", d($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val a = e.select($"vec_id".as("vec_a"), $"label", $"v".as("va"), $"nrm".as("nrm_a"))
    val b = e.select($"vec_id".as("vec_b"), $"label", $"v".as("vb"), $"nrm".as("nrm_b"))
    a.join(b, Seq("label"))
      .filter($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", $"label",
        round(dot($"va", $"vb") / ($"nrm_a" * $"nrm_b"), 6).as("cos_sim"))
      .filter($"cos_sim" >= 0.35)
      .orderBy($"vec_a", $"vec_b")
  }

  private val q21Sql =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
      |  round(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin

  /** q22: brute-force cosine top-k (k=5) for the query subset
    * vec_id % 100 = 0 — the exact-answer baseline every ANN variant is
    * judged against. Rank by rounded similarity with id tiebreak so the
    * top-k set is engine-independent.
    */
  def q22AnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .select($"vec_id", d($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val q = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos_sim".desc, $"neighbor_id".asc)
    q.crossJoin(e.select($"vec_id".as("neighbor_id"), $"v", $"nrm"))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .orderBy($"query_id", $"rank")
  }

  private val q22Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    round(list_dot_product(qv, v) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
      |  FROM q CROSS JOIN e
      |  WHERE query_id <> e.vec_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rank
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  val NumPlanes = 64
  val LshBands = 8 // 8 bands of 8 signature bits -> 256 buckets per band

  /** q29: random-hyperplane LSH ANN — the 100 TB path: vectors sharing
    * any 8-bit signature band become candidates (join on band buckets,
    * cost ∝ collisions, never |vecs|²); exact cosine then verifies, same
    * 0.35 threshold as q21 so recall is directly comparable. Signature
    * computed by a one-pass custom Expression with md5-derived
    * deterministic hyperplanes (see NativeExpressions.CosineLshSignature).
    *
    * Geometry: 64 planes as 8 bands × 8 bits. A random (non-near) pair
    * collides on a given 8-bit band with p = 2⁻⁸, so expected candidates
    * ≈ pairs · 8/256 ≈ 3% of all pairs (vs 25% for the earlier 4-bit
    * bands — 16 buckets can never separate n ≫ 16 vectors). Measured at
    * sf0.1 (2,000 vectors, 2.0M unordered pairs): 73k candidate pairs =
    * 3.7%, matching theory; on real (clustered, non-uniform) corpora the
    * near-pair mass concentrates further. Widening bands is the knob:
    * +1 bit halves candidates, ~×0.61 recall per band at sim 0.35.
    */
  def q29AnnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.NativeExpressions.cosineLshSignature
    val e = t(s, dir, "embeddings")
      .select($"vec_id", d($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
      .withColumn("sig", cosineLshSignature($"v", NumPlanes))
      .persist()
    val bandBits = NumPlanes / LshBands
    val bands = e.select($"vec_id",
        posexplode(array((0 until LshBands).map(k =>
          shiftrightunsigned($"sig", k * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select($"vec_id".as("vec_a"), $"v".as("va"), $"nrm".as("nrm_a")), "vec_a")
      .join(e.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nrm".as("nrm_b")), "vec_b")
      .select($"vec_a", $"vec_b",
        round(dot($"va", $"vb") / ($"nrm_a" * $"nrm_b"), 6).as("cos_sim"))
      .filter($"cos_sim" >= 0.35)
      .orderBy($"vec_a", $"vec_b")
  }

  private val q29Sql = {
    val bandBits = NumPlanes / LshBands
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |planes AS (
      |  SELECT p, list_transform(range(0, 64),
      |    d -> CASE WHEN (strpos('0123456789abcdef',
      |           substring(md5(p || ':' || d), 1, 1)) - 1) % 2 = 0
      |         THEN 1.0 ELSE -1.0 END) AS coefs
      |  FROM range(0, $NumPlanes) t(p)),
      |bands AS (
      |  SELECT vec_id, p // $bandBits AS band,
      |    CAST(sum(CASE WHEN list_dot_product(coefs, v) > 0
      |        THEN CAST(pow(2, p % $bandBits) AS BIGINT) ELSE 0 END) AS BIGINT) AS bkey
      |  FROM e CROSS JOIN planes
      |  GROUP BY vec_id, p // $bandBits),
      |cand AS (
      |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
      |SELECT vec_a, vec_b,
      |  round(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
      |FROM cand
      |JOIN e a ON a.vec_id = vec_a
      |JOIN e b ON b.vec_id = vec_b
      |WHERE round(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** q45: IVF-style ANN with DETERMINISTIC coarse centroids — the missing
    * piece of q21's "IVF-shaped" blocking, which leaned on a label column.
    * Seeds are the vectors with `vec_id % 100 == 0` (k ≈ n/100, no RNG so
    * the oracle reproduces the cells exactly); every vector routes to its
    * max-cosine seed (rounded to 6 digits, seed-id tiebreak), then
    * near-dup pairs are found WITHIN cells only. The plumbing is real
    * IVF: broadcast the (small) centroid table, one n·k scoring pass, one
    * shuffle on cell id, cell-local pairing — at production scale the
    * seeds would come from k-means (k ≈ √n) and a multiprobe would scan
    * the top-p cells, but the plan shape is exactly this one.
    */
  def q45IvfAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .select($"vec_id", d($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
      .persist()
    val cent = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("centroid_id"), $"v".as("cv"), $"nrm".as("cnrm"))
    val w = Window.partitionBy($"vec_id").orderBy($"csim".desc, $"centroid_id".asc)
    val cells = e.crossJoin(broadcast(cent))
      .select($"vec_id", $"v", $"nrm", $"centroid_id",
        round(dot($"v", $"cv") / ($"nrm" * $"cnrm"), 6).as("csim"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"nrm", $"centroid_id".as("cell"))
    val a = cells.select($"vec_id".as("vec_a"), $"v".as("va"), $"nrm".as("nrm_a"), $"cell")
    val b = cells.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nrm".as("nrm_b"), $"cell")
    a.join(b, Seq("cell"))
      .filter($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", $"cell",
        round(dot($"va", $"vb") / ($"nrm_a" * $"nrm_b"), 6).as("cos_sim"))
      .filter($"cos_sim" >= 0.35)
      .orderBy($"vec_a", $"vec_b")
  }

  private val q45Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT e.vec_id, centroid_id,
      |    round(list_dot_product(v, cv) /
      |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS csim
      |  FROM e CROSS JOIN c),
      |cells AS (
      |  SELECT vec_id, centroid_id AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY csim DESC, centroid_id ASC) AS rn
      |    FROM scored) WHERE rn = 1)
      |SELECT ca.vec_id AS vec_a, cb.vec_id AS vec_b, ca.cell,
      |  round(list_dot_product(ea.v, eb.v) /
      |    (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos_sim
      |FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
      |JOIN e ea ON ea.vec_id = ca.vec_id
      |JOIN e eb ON eb.vec_id = cb.vec_id
      |WHERE round(list_dot_product(ea.v, eb.v) /
      |    (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q21_embedding_near_dup", Seq("EXT-similarity", "EXT-dedup"),
      "label-blocked embedding near-dup (IVF-shaped)", q21EmbeddingNearDup, Some(q21Sql)),
    GraftQuery("q22_ann_brute_force", Seq("EXT-similarity"),
      "brute-force cosine top-k baseline", q22AnnBruteForce, Some(q22Sql)),
    GraftQuery("q29_ann_lsh", Seq("EXT-similarity"),
      "random-hyperplane LSH ANN (banded signature buckets)", q29AnnLsh, Some(q29Sql)),
    GraftQuery("q45_ivf_ann", Seq("EXT-similarity"),
      "IVF ANN with deterministic coarse centroids (cell-local search)",
      q45IvfAnn, Some(q45Sql)))
}
