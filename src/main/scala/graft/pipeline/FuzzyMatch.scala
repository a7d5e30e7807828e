package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  private val Suffixes =
    Seq("incorporated", "corporation", "company", "holdings", "group",
      "inc", "corp", "co", "ltd", "plc", "llc")

  /** Lowercase, strip legal suffixes and every non-alphanumeric. */
  def normalizeName(c: Column): Column = {
    val lowered = lower(c)
    val noSuffix = Suffixes.foldLeft(lowered)((col, s) =>
      regexp_replace(col, s"\\b$s\\b", ""))
    regexp_replace(noSuffix, "[^a-z0-9]", "")
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
    // them before trigram generation; there is no content to match on.
    val l = left.select(col(leftName).as("l_name"),
        array_distinct(nameTrigrams(col(leftName))).as("grams"))
      .filter(length(normalizeName(col(leftName))) > 0)
      .filter(size(col("grams")) > 0).distinct()
    val r = right.select(col(rightName).as("r_name"),
        array_distinct(nameTrigrams(col(rightName))).as("grams"))
      .filter(length(normalizeName(col(rightName))) > 0)
      .filter(size(col("grams")) > 0).distinct()

    val lg = l.select(col("l_name"), size(col("grams")).as("nl"),
      explode(col("grams")).as("g"))
    val rg = r.select(col("r_name"), size(col("grams")).as("nr"),
      explode(col("grams")).as("g"))
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
}
