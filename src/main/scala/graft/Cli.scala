package graft

import org.apache.spark.sql.SparkSession

/** zeno-cli parity (/root/reference/cmd/zeno-cli): a minimal REPL over a
  * schema + data dir. `runMain graft.Cli <schema.yaml> <dataDir>` then type
  * dialect SQL, one statement per line; `\q` exits.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Cli <schema.yaml> <dataDir> [sql...]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schemaText = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
    val db = new GraftDB(spark, schemaText, args(1))

    if (args.length > 2) {
      // one-shot mode: remaining args are statements
      args.drop(2).foreach(q => db.sql(q).show(100, truncate = false))
    } else {
      val in = new java.util.Scanner(System.in)
      print("graft> ")
      while (in.hasNextLine) {
        val line = in.nextLine().trim
        if (line == "\\q") return
        if (line.nonEmpty) {
          try db.sql(line).show(100, truncate = false)
          catch { case e: Exception => println(s"error: ${e.getMessage}") }
        }
        print("graft> ")
      }
    }
    // no spark.stop(): the session may be shared (getOrCreate); process exit
    // tears it down in standalone use
  }
}
