package graft

/** Regenerates the QUERIES.md table body from the registry (no Spark
  * session needed — it only reads query metadata).
  */
object CatalogDump {
  def main(args: Array[String]): Unit =
    Registry.all.sortBy(q => q.name.drop(1).takeWhile(_.isDigit).toInt)
      .foreach { q =>
        val oracle = if (q.oracle.isDefined) "DuckDB SQL" else "rows-only"
        println(s"| ${q.name} | ${q.surveyOps.mkString(", ")} | ${q.description} | $oracle |")
      }
}
