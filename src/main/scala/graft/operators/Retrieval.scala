package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Retrieval-shaped corpus operators (round 4): BM25 ranked retrieval
  * and fixed-stride context chunking — the two halves of the RAG /
  * training-context pipeline (chunk the corpus, rank chunks or docs
  * against queries). Complements q64 (TF-IDF keyword extraction, which
  * scores a doc's OWN terms) with cross-doc ranking against an external
  * query set.
  */
object Retrieval {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The fixed query set: (query id, term) pairs. `dup` is the one rare
    * term in the synthetic vocabulary (df ≈ 5% of docs vs ~78% for the
    * rest), so it carries a genuinely discriminating idf; the other
    * terms exercise the tf/length normalization on a flat-idf corpus.
    */
  private val QueryTerms = Seq(
    ("dup-cleanup", "dup"), ("dup-cleanup", "merge"),
    ("windowed-sort", "window"), ("windowed-sort", "sort"),
    ("join-only", "join"))

  /** q82: BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
    * relevance; k1=1.2, b=0.75) — top-10 documents per query. Score
    * components: idf(t) = ln(1 + (N-df+0.5)/(df+0.5)), tf term with
    * document-length normalization against the corpus mean. Determinism
    * discipline (the q64/q77 device): each (query, doc, term)
    * contribution is rounded to 12 digits and summed as DECIMAL — exact
    * and order-independent — then the final score is rounded to 6
    * digits BEFORE ranking with a doc_id tiebreak, so the top-10 cut is
    * engine-independent even though ln is libm. Plan: one explode →
    * (doc, term) counts; df and avgdl are vocabulary-/scalar-sized
    * aggregates that BROADCAST back; the query set is a literal
    * broadcast — the only full shuffle is the (doc, term) count, which
    * any inverted-index build pays. At 100 TB the per-query top-10 is a
    * partial top-k before the final window (same early-stop note as
    * q65).
    */
  def q82Bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.loadSpread(s, dir, "documents")
    val nDocs = docs.count()
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val avgdl = dl.agg(avg($"dl".cast("double")).as("avgdl"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val q = QueryTerms.toDF("qid", "term")
    val contrib = q
      .join(tf, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(avgdl))
      .join(broadcast(df), "term")
      .select($"qid", $"doc_id",
        round(
          log(lit(1.0) + (lit(nDocs.toDouble) - $"df" + 0.5) / ($"df" + 0.5)) *
            ($"tf" * 2.2 /
              ($"tf" + (lit(0.25) + $"dl" / $"avgdl" * 0.75) * 1.2)),
          12).cast("decimal(18,12)").as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"qid")
      .orderBy($"score".desc, $"doc_id".asc)
    val out = contrib.groupBy($"qid", $"doc_id")
      .agg(round(sum($"c").cast("double"), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"qid", $"rank", $"doc_id", $"score")
      .orderBy($"qid", $"rank")
    tf.unpersist()
    out
  }

  private val q82Sql =
    """WITH q(qid, term) AS (VALUES
      |  ('dup-cleanup', 'dup'), ('dup-cleanup', 'merge'),
      |  ('windowed-sort', 'window'), ('windowed-sort', 'sort'),
      |  ('join-only', 'join')),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
      |avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
      |contrib AS (
      |  SELECT qid, tf.doc_id,
      |    CAST(round(
      |      ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) *
      |        (tf * 2.2 / (tf + (0.25 + (dl / avgdl) * 0.75) * 1.2)),
      |      12) AS DECIMAL(18,12)) AS c
      |  FROM q
      |  JOIN tf USING (term)
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  JOIN df USING (term)
      |  CROSS JOIN avgdl CROSS JOIN n),
      |scored AS (
      |  SELECT qid, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
      |  FROM contrib GROUP BY qid, doc_id)
      |SELECT qid, rank, doc_id, score
      |FROM (SELECT *, row_number() OVER (PARTITION BY qid
      |        ORDER BY score DESC, doc_id ASC) AS rank
      |      FROM scored)
      |WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin

  private val ChunkLen = 32
  private val Stride = 24

  /** q83: fixed-stride context chunking — split each document into
    * overlapping token windows (len 32, stride 24), the standard
    * context-construction pass before embedding or training (the
    * overlap preserves cross-boundary n-grams). Emits a content hash
    * per chunk so the output is joinable against dedup/decontamination
    * passes (q17/q58 operate on exactly such hashes). Pure scan-side
    * explode: no shuffle at all — each task chunks its own documents,
    * which is why this pass is embarrassingly parallel at any corpus
    * size (the final ORDER BY is presentation-only).
    */
  def q83ChunkDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks",
        explode(sequence(lit(0), size($"toks") - 1, lit(Stride))).as("start"))
      .select($"doc_id",
        ($"start" / Stride).cast("long").as("chunk_idx"),
        slice($"toks", $"start" + 1, lit(ChunkLen)).as("chunk"))
      .select($"doc_id", $"chunk_idx",
        size($"chunk").cast("long").as("n_tok"),
        md5(array_join($"chunk", " ")).as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  private val q83Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |st AS (
      |  SELECT doc_id, toks,
      |    unnest(generate_series(0, len(toks) - 1, 24)) AS start
      |  FROM d),
      |ch AS (
      |  SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_idx,
      |    list_slice(toks, start + 1, start + 32) AS chunk
      |  FROM st)
      |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tok,
      |  md5(array_to_string(chunk, ' ')) AS chunk_hash
      |FROM ch
      |ORDER BY doc_id, chunk_idx""".stripMargin

  private val RrfK = 60

  /** q98: hybrid retrieval via reciprocal-rank fusion (Cormack et al.'s
    * RRF, k=60) of the lexical and dense rankers: BM25 ranks (q82) fuse
    * with a dense cosine ranking whose query vector is the embedding of
    * each query's BM25 rank-1 document — pseudo-relevance feedback, so
    * the dense leg needs no external query embedding and the whole
    * hybrid stays oracle-checkable. RRF scores depend only on integer
    * ranks (1/(k+r) — no score-scale calibration between the two
    * systems, which is exactly why RRF is the production default), so
    * determinism is free; the fused rank re-ties on doc_id. Plan: the
    * dense leg is |queries| x |corpus| scored against 3 broadcast query
    * vectors — the brute-force shape q22 establishes, with the IVF/LSH
    * routes (q45/q29) as the corpus-scale swap-in; the fusion itself is
    * a full outer join of two 10-row-per-query rankings — driver-trivial
    * at any corpus size.
    */
  def q98RrfHybrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val bm = q82Bm25(s, dir)
      .select($"qid", $"doc_id", $"rank".as("rank_bm"))
      .persist()
    val e = t(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val dot = graft.functions.NativeExpressions.dotProduct _
    val seeds = bm.filter($"rank_bm" === 1)
      .join(e, $"doc_id" === $"vec_id")
      .select($"qid", $"v".as("qv"))
    val wD = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"doc_id".asc)
    val dense = broadcast(seeds).crossJoin(e)
      .select($"qid", $"vec_id".as("doc_id"),
        round(dot($"qv", $"v") /
          (sqrt(dot($"qv", $"qv")) * sqrt(dot($"v", $"v"))), 6).as("cos_sim"))
      .withColumn("rank_d", row_number().over(wD))
      .filter($"rank_d" <= 10)
      .select($"qid", $"doc_id", $"rank_d")
    val wR = Window.partitionBy($"qid").orderBy($"rrf".desc, $"doc_id".asc)
    val out = bm.join(dense, Seq("qid", "doc_id"), "full_outer")
      .select($"qid", $"doc_id",
        round(
          coalesce(lit(1.0) / ($"rank_bm" + RrfK), lit(0.0)) +
            coalesce(lit(1.0) / ($"rank_d" + RrfK), lit(0.0)), 6).as("rrf"),
        $"rank_bm", $"rank_d")
      .withColumn("rank", row_number().over(wR))
      .filter($"rank" <= 10)
      .select($"qid", $"rank", $"doc_id", $"rrf", $"rank_bm", $"rank_d")
      .orderBy($"qid", $"rank")
    out
  }

  private val q98Sql =
    s"""WITH bm0 AS (SELECT * FROM ($q82Sql)),
      |bm AS (SELECT qid, doc_id, rank AS rank_bm FROM bm0),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |seeds AS (
      |  SELECT qid, v AS qv FROM bm JOIN e ON doc_id = vec_id
      |  WHERE rank_bm = 1),
      |dense AS (
      |  SELECT qid, doc_id, rank_d FROM (
      |    SELECT qid, vec_id AS doc_id,
      |      row_number() OVER (PARTITION BY qid ORDER BY
      |        round(list_dot_product(qv, v) /
      |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))),
      |          6) DESC, vec_id ASC) AS rank_d
      |    FROM seeds CROSS JOIN e)
      |  WHERE rank_d <= 10),
      |fused AS (
      |  SELECT coalesce(bm.qid, dense.qid) AS qid,
      |    coalesce(bm.doc_id, dense.doc_id) AS doc_id,
      |    round(coalesce(1e0 / (rank_bm + $RrfK), 0e0) +
      |      coalesce(1e0 / (rank_d + $RrfK), 0e0), 6) AS rrf,
      |    rank_bm, rank_d
      |  FROM bm FULL OUTER JOIN dense
      |    ON bm.qid = dense.qid AND bm.doc_id = dense.doc_id)
      |SELECT qid, rank, doc_id, rrf, rank_bm, rank_d
      |FROM (SELECT *, row_number() OVER (PARTITION BY qid
      |        ORDER BY rrf DESC, doc_id ASC) AS rank
      |      FROM fused)
      |WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin

  /** q142: positional PHRASE search — the index shape BM25 (q82) cannot
    * answer: "table value" as adjacent tokens, not co-occurrence. The
    * plan IS the positional-inverted-index intersection a search engine
    * runs: tokenize with positions (posexplode — one pass), filter each
    * term's posting list scan-side, and equi-join the two lists on
    * (doc, pos) with the second term's positions shifted by one. At
    * 100 TB the join carries only the two terms' postings — term
    * selectivity bounds the shuffle, never the corpus; an n-word phrase
    * is n-1 such joins. Count per document = phrase term frequency.
    */
  def q142PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", posexplode(split($"text", " ")))
      .toDF("doc_id", "pos", "tok")
    val first = toks.filter($"tok" === "table").select($"doc_id", $"pos")
    val second = toks.filter($"tok" === "value")
      .select($"doc_id", ($"pos" - 1).as("pos"))
    first.join(second, Seq("doc_id", "pos"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_matches"))
      .orderBy($"doc_id")
  }

  private val q142Sql =
    """WITH toks AS (
      |  SELECT doc_id, p[2] AS pos, p[1] AS tok FROM (
      |    SELECT doc_id,
      |      unnest(list_zip(l, generate_series(0, len(l) - 1))) AS p
      |    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))),
      |a AS (SELECT doc_id, pos FROM toks WHERE tok = 'table'),
      |b AS (SELECT doc_id, pos - 1 AS pos FROM toks WHERE tok = 'value')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
      |FROM a JOIN b USING (doc_id, pos)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  private val QlmMu = 2000.0

  /** q261: QUERY-LIKELIHOOD retrieval with DIRICHLET SMOOTHING (Zhai &
    * Lafferty '01) — the language-modeling ranker that sits beside
    * BM25 (q82) in every IR bake-off: score(q,d) = Σ_t ln((tf_t,d +
    * μ·p(t|C)) / (|d| + μ)), μ=2000. Unlike BM25 a document scores on
    * EVERY query term including the ones it lacks (tf=0 still
    * contributes the collection-model mass), so the join shape differs:
    * query terms cross the doc-length table (broadcast terms — the
    * per-(query,doc) matrix is docs × query-terms, scan-shaped), then a
    * LEFT join picks up the nonzero tfs. Same decimal-pinned summation
    * discipline as q82 (per-term round(12) into DECIMAL, rounded
    * double at the end), same top-10 heap per query.
    */
  def q261QlmDirichlet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.loadSpread(s, dir, "documents")
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val cf = tf.groupBy($"term").agg(sum($"tf").as("cf"))
    val cTotal = tf.agg(sum($"tf")).as[Long].head().toDouble
    val q = QueryTerms.toDF("qid", "term")
    val pairs = q.join(broadcast(cf), Seq("term")) // p(t|C) per query term
    val contrib = dl
      .crossJoin(broadcast(pairs))
      .join(tf, Seq("doc_id", "term"), "left")
      .select($"qid", $"doc_id",
        round(log((coalesce($"tf", lit(0L)) +
            lit(QlmMu) * ($"cf" / cTotal)) / ($"dl" + QlmMu)), 12)
          .cast("decimal(18,12)").as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"qid")
      .orderBy($"score".desc, $"doc_id".asc)
    val out = contrib.groupBy($"qid", $"doc_id")
      .agg(round(sum($"c").cast("double"), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"qid", $"rank", $"doc_id", $"score")
      .orderBy($"qid", $"rank")
      .localCheckpoint()
    tf.unpersist()
    out
  }

  private val q261Sql = {
    val qvals = QueryTerms.map { case (q, t) => s"('$q', '$t')" }
      .mkString(", ")
    s"""WITH tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |    FROM documents)
       |  WHERE term <> '' GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
       |ct AS (SELECT CAST(sum(tf) AS DOUBLE) AS c_total FROM tf),
       |q(qid, term) AS (VALUES $qvals),
       |pairs AS (SELECT q.qid, q.term, cf.cf FROM q JOIN cf USING (term)),
       |contrib AS (
       |  SELECT p.qid, dl.doc_id,
       |    CAST(round(ln((coalesce(tf.tf, 0) +
       |      $QlmMu * (p.cf / (SELECT c_total FROM ct))) / (dl.dl + $QlmMu)),
       |      12) AS DECIMAL(18,12)) AS c
       |  FROM dl CROSS JOIN pairs p
       |  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.term = p.term)
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, score, row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM (
       |    SELECT qid, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
       |    FROM contrib GROUP BY qid, doc_id))
       |WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q261_qlm_dirichlet", Seq("EXT-text", "J1", "A2"),
      "query-likelihood retrieval with Dirichlet smoothing: docs score on every query term incl. absent ones, decimal-pinned log sums, top-10 heap",
      q261QlmDirichlet, Some(q261Sql)),
    GraftQuery("q142_phrase_search", Seq("EXT-text", "J1"),
      "positional phrase search: per-term posting lists joined on (doc, pos+1)",
      q142PhraseSearch, Some(q142Sql)),
    GraftQuery("q82_bm25", Seq("EXT-text", "A2", "J1"),
      "BM25 top-10 docs per query (k1=1.2, b=0.75), decimal-reduced",
      q82Bm25, Some(q82Sql)),
    GraftQuery("q83_chunk_docs", Seq("EXT-text", "J2"),
      "fixed-stride overlapping context chunking with content hashes",
      q83ChunkDocs, Some(q83Sql)),
    GraftQuery("q98_rrf_hybrid", Seq("EXT-text", "EXT-similarity", "J1", "W2"),
      "reciprocal-rank fusion of BM25 and PRF-seeded dense retrieval",
      q98RrfHybrid, Some(q98Sql)))
}
