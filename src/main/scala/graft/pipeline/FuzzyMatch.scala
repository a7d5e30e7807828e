package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery

/** Fuzzy entity-name reconciliation (SURVEY.md §7.4-5): the core join J1
  * matches the two sources on EXACT company_name equality — "Acme Corp"
  * in one source and "Acme Corporation" in the other silently drop out of
  * the core layer. This utility finds near-matches with character-trigram
  * Jaccard, the q18/q19 blocking pattern applied at the name level:
  *
  *   1. normalize (lower, strip non-alphanumerics, drop corporate
  *      suffixes) — most real divergence disappears here;
  *   2. explode character trigrams of the padded normalized name;
  *   3. equi-join on trigram with a frequency cap (stop-grams like
  *      "inc" never drive candidate pairs);
  *   4. exact Jaccard on the candidate pairs only.
  *
  * Cost: |names|·|trigrams| rows through one equi-join — never the
  * |left|×|right| cross product; at catalog scale (~10⁶ names) this fits
  * one shuffle. For corpus-scale fuzzy joins swap stage 3 for the q19
  * MinHash-LSH banding unchanged.
  */
object FuzzyMatch {

  val Suffixes: Seq[String] =
    Seq("incorporated", "corporation", "company", "holdings", "group",
      "inc", "corp", "co", "ltd", "plc", "llc")

  /** Lowercase, strip legal suffixes and every non-alphanumeric. One
    * alternation pass, not 11 chained regexp_replace: suffix removals
    * only ever delete whole words (boundaries intact, spaces remain), so
    * a single left-to-right alternation — alternatives tried in the same
    * order — produces the identical string 6x cheaper, which matters
    * because Catalyst's projection collapse re-inlines this expression
    * into every consumer (the empty-name filter AND the trigram builder).
    */
  def normalizeName(c: Column): Column = {
    val alt = Suffixes.mkString("|")
    regexp_replace(
      regexp_replace(lower(c), s"\\b($alt)\\b", ""), "[^a-z0-9]", "")
  }

  /** Character trigrams of the normalized name, padded so 1–2 char names
    * still produce a gram.
    */
  def nameTrigrams(c: Column): Column = {
    val padded = concat(lit("^^"), normalizeName(c), lit("$$"))
    filter(
      transform(sequence(lit(0), greatest(length(padded) - 3, lit(0))),
        i => padded.substr(i + 1, lit(3))),
      g => length(g) === 3)
  }

  /** Candidate pairs with trigram-Jaccard >= threshold. Output:
    * left name, right name, jaccard — one row per near-match.
    *
    * @param maxGramFreq stop-gram cap: trigrams appearing in more rows
    *        than this are not used for candidate generation or the
    *        intersection count (the Jaccard is then a conservative
    *        underestimate for pairs sharing only stop-grams — the pairs
    *        a fuzzy matcher should be skeptical of anyway).
    */
  def similarityJoin(
      left: DataFrame, leftName: String,
      right: DataFrame, rightName: String,
      threshold: Double = 0.5,
      maxGramFreq: Long = 1000L): DataFrame = {
    // Names that normalize to the empty string (pure legal suffixes like
    // "Inc." or "The Corp Co") would still produce the padding-only
    // trigrams "^^$"/"^$$" and match each other with jaccard 1.0 — drop
    // them BEFORE the projection renames the column away (filtering after
    // would lean on the analyzer re-injecting a dropped attribute).
    val l = left.filter(length(normalizeName(col(leftName))) > 0)
      .select(col(leftName).as("l_name"),
        array_distinct(nameTrigrams(col(leftName))).as("grams"))
      .filter(size(col("grams")) > 0).distinct()
    val r = right.filter(length(normalizeName(col(rightName))) > 0)
      .select(col(rightName).as("r_name"),
        array_distinct(nameTrigrams(col(rightName))).as("grams"))
      .filter(size(col("grams")) > 0).distinct()

    // lg/rg each feed BOTH the stop-gram frequency build and the
    // candidate join — persist so the normalize→trigram→explode chain
    // (the dominant per-row cost) runs once per row, not twice
    val lg = l.select(col("l_name"), size(col("grams")).as("nl"),
      explode(col("grams")).as("g")).persist()
    val rg = r.select(col("r_name"), size(col("grams")).as("nr"),
      explode(col("grams")).as("g")).persist()
    val freq = lg.select(col("g")).unionAll(rg.select(col("g")))
      .groupBy(col("g")).count().filter(col("count") <= maxGramFreq)
      .select(col("g"))

    lg.join(broadcast(freq), "g")
      .join(rg, "g")
      .groupBy(col("l_name"), col("r_name"), col("nl"), col("nr"))
      .agg(count(lit(1)).as("n_common"))
      .select(col("l_name"), col("r_name"),
        (col("n_common").cast("double") /
          (col("nl") + col("nr") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** q56: the fuzzy matcher ORACLE-CARRIED — part names vs three
    * deterministic corruption classes a real entity-reconciliation job
    * sees: decorated legal forms ("The <name> Inc." — normalization
    * strips the suffix but "the" survives as honest fuzz; jaccard
    * 0.5-0.61, MATCH), leading-character typos (drop the first char;
    * ~0.6, MATCH), and word-order swaps ("ring small" — trigram overlap
    * collapses to ~0.29 on two-word names, REJECT: the swap class is the
    * in-data negative control proving the 0.5 threshold discriminates).
    * Every stage (normalize, trigram, stop-gram cap, capped-intersection
    * Jaccard) is re-derived in DuckDB SQL, so the driver hash-checks the
    * full chain.
    */
  /** The three deterministic corruption classes (decorated legal form,
    * leading-char typo, word-order swap) — shared by q56 and q113 so the
    * pair generator and the entity-resolution record universe can never
    * drift apart.
    */
  private def corruptionVariants(names: DataFrame): DataFrame = {
    import names.sparkSession.implicits._
    names.select(concat(lit("The "), $"p_name", lit(" Inc.")).as("v"))
      .unionByName(names.select(expr("substring(p_name, 2)").as("v")))
      .unionByName(names.select(
        concat_ws(" ", reverse(split($"p_name", " "))).as("v")))
  }

  /** DuckDB twin of [[corruptionVariants]] (emits column `v` from `names`). */
  private val variantsSql =
    """SELECT 'The ' || p_name || ' Inc.' AS v FROM names
      |  UNION ALL
      |  SELECT substring(p_name, 2) FROM names
      |  UNION ALL
      |  SELECT array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
      |  FROM names""".stripMargin

  def q56FuzzyNames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = graft.Tables.load(s, dir, "part").select($"p_name").distinct()
    similarityJoin(names, "p_name", corruptionVariants(names), "v",
        threshold = 0.5)
      .orderBy($"l_name", $"r_name")
  }

  /** DuckDB rendition of [[normalizeName]] over SQL expression `c`. */
  private def normSql(c: String): String = {
    val alt = Suffixes.mkString("|")
    s"regexp_replace(regexp_replace(lower($c), '\\b($alt)\\b', '', 'g'), '[^a-z0-9]', '', 'g')"
  }

  /** DuckDB rendition of [[nameTrigrams]] + array_distinct over `c`. */
  private def gramsSql(c: String): String = {
    val padded = s"'^^' || ${normSql(c)} || '$$$$'"
    s"""list_distinct(list_filter(
       |    list_transform(range(0, greatest(length($padded) - 3, 0) + 1),
       |      i -> substring($padded, i + 1, 3)),
       |    g -> length(g) = 3))""".stripMargin
  }

  private val q56Sql =
    s"""WITH names AS (SELECT DISTINCT p_name FROM part),
      |l AS (
      |  SELECT p_name AS l_name, ${gramsSql("p_name")} AS grams
      |  FROM names WHERE length(${normSql("p_name")}) > 0),
      |r0 AS (
      |  $variantsSql),
      |r AS (
      |  SELECT DISTINCT v AS r_name, ${gramsSql("v")} AS grams
      |  FROM r0 WHERE length(${normSql("v")}) > 0),
      |lg AS (SELECT l_name, len(grams) AS nl, unnest(grams) AS g FROM l),
      |rg AS (SELECT r_name, len(grams) AS nr, unnest(grams) AS g FROM r),
      |freq AS (
      |  SELECT g FROM (
      |    SELECT g, count(*) AS c
      |    FROM (SELECT g FROM lg UNION ALL SELECT g FROM rg)
      |    GROUP BY g)
      |  WHERE c <= 1000),
      |inter AS (
      |  SELECT l_name, r_name, nl, nr, count(*) AS n_common
      |  FROM lg JOIN freq USING (g) JOIN rg USING (g)
      |  GROUP BY 1, 2, 3, 4)
      |SELECT l_name, r_name,
      |  CAST(n_common AS DOUBLE) / (nl + nr - n_common) AS jaccard
      |FROM inter
      |WHERE CAST(n_common AS DOUBLE) / (nl + nr - n_common) >= 0.5
      |ORDER BY l_name, r_name""".stripMargin

  /** q113: entity resolution END-TO-END — the full master-data pipeline
    * over the q56 name universe: fuzzy candidate pairs (trigram blocking
    * + Jaccard) → connected components → one canonical record per
    * entity, singletons included. Components carry internal xxhash64
    * record ids (never surfaced — the canonical is the component's
    * lexicographic min NAME, so the output is engine-independent while
    * the id space needs no global row-numbering). This is q40/q46's
    * dedup machinery re-used on ENTITY records — the survivor policy a
    * warehouse's customer-360 run applies after every ingest; at 100 TB
    * the pair stage is the only corpus-sized work (one trigram shuffle),
    * components being pair-count-sized.
    */
  def q113EntityResolution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = graft.Tables.load(s, dir, "part").select($"p_name").distinct()
    val variants = corruptionVariants(names)
    val records = names.select($"p_name".as("rec"))
      .unionByName(variants.select($"v".as("rec"))).distinct()
      .withColumn("rid", xxhash64($"rec"))
    val pairs = similarityJoin(names, "p_name", variants, "v", threshold = 0.5)
      .select(xxhash64($"l_name").as("doc_a"), xxhash64($"r_name").as("doc_b"))
    val labels = graft.operators.Dedup.connectedComponents(pairs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"comp")
    records
      .join(labels.withColumnRenamed("doc_id", "rid"), Seq("rid"), "left")
      .withColumn("comp", coalesce($"canonical_id", $"rid"))
      .withColumn("canonical", min($"rec").over(w))
      .withColumn("entity_size", count(lit(1)).over(w))
      .select($"rec".as("record"), $"canonical", $"entity_size",
        ($"rec" === $"canonical").as("is_canonical"))
      .orderBy($"record")
  }

  private val q113Sql =
    s"""WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
      |v0 AS (
      |  $variantsSql),
      |records AS (
      |  SELECT DISTINCT rec FROM (
      |    SELECT p_name AS rec FROM names UNION ALL SELECT v FROM v0)),
      |p AS (SELECT l_name, r_name FROM ($q56Sql)),
      |edges AS (
      |  SELECT l_name AS a, r_name AS b FROM p
      |  UNION ALL SELECT r_name, l_name FROM p),
      |reach AS (
      |  SELECT rec AS src, rec AS dst FROM records
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |lab AS (SELECT src AS record, min(dst) AS canonical
      |        FROM reach GROUP BY src),
      |sz AS (SELECT canonical, CAST(count(*) AS BIGINT) AS entity_size
      |       FROM lab GROUP BY canonical)
      |SELECT record, canonical, entity_size,
      |  record = canonical AS is_canonical
      |FROM lab JOIN sz USING (canonical)
      |ORDER BY record""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q56_fuzzy_names", Seq("EXT-fuzzy", "J1"),
      "trigram-Jaccard fuzzy name reconciliation, full chain oracle-carried",
      q56FuzzyNames, Some(q56Sql)),
    GraftQuery("q113_entity_resolution", Seq("EXT-fuzzy", "EXT-dedup", "J1"),
      "end-to-end entity resolution: fuzzy pairs -> components -> canonical",
      q113EntityResolution, Some(q113Sql)))
}
