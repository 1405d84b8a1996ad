package graft.tools

import java.nio.file.{Files, Paths}

/** Dev main: write the COMPLETE SparkEntry.oracleSql map as
  * oracle_sql.json into a directory — for sweeps that assemble the
  * Spark dumps incrementally (partial VerifySome batches overwrite the
  * json with their own subset). No Spark session needed.
  * Usage: runMain graft.tools.OracleDump <outDir>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[oracle-dump] ${graft.SparkEntry.oracleSql.size} oracles → " +
      s"$outDir/oracle_sql.json")
  }
}
