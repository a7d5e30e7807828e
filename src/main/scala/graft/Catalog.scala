package graft
import java.nio.file.{Files, Paths}
object Catalog {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    sb.append("# Query catalog (generated from graft.Registry)\n\n")
    sb.append("Every entry is a DataFrame program over the driver's parquet tables plus\n")
    sb.append("(unless noted) a DuckDB oracle the t2 gate hash-checks. SURVEY.md §2 ids\n")
    sb.append("in the second column are the operators exercised.\n\n")
    sb.append("| query | SURVEY §2 ops | description | oracle |\n|---|---|---|---|\n")
    Registry.all.foreach { q =>
      sb.append(s"| ${q.name} | ${q.surveyOps.mkString(", ")} | ${q.description} | ${if (q.oracle.isDefined) "DuckDB SQL" else "rows-only"} |\n")
    }
    Files.writeString(Paths.get("QUERIES.md"), sb.toString)
    println(s"wrote ${Registry.all.size} queries")
  }
}
