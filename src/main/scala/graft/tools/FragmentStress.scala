package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftDB

/** Scale-stress evidence for generation FRAGMENTATION — the failure mode
  * [[QueryStress]]'s stores cannot show. Those stores are built in one
  * merge, so all days live in ONE commit generation and the whole store
  * plans as one relation. A production store is built by thousands of
  * flushes: each day's dir lives in the generation of the last flush that
  * touched it, so a quiesced store converges on ~one generation per day —
  * and the bucketed read opens one relation PER generation, recreating the
  * O(days)-relations plan (multi-MiB task binaries, driver OOM at 3,001
  * days) that the per-generation read fixed for the single-generation case.
  *
  * This tool builds the SAME corpus as QueryStress's 10× store, but as one
  * merge per day-group (auto-compaction disabled), then measures the three
  * QueryStress query shapes against:
  *
  *  1. the fragmented store (~nBatches live generations);
  *  2. the same store after compact() (1 generation);
  *  3. a store built with auto-compaction ON (default policy) — live
  *     generations stay ≤ graft.compact.maxGenerations THROUGHOUT the
  *     build, which is how a real deployment never reaches state (1).
  *
  * Results (times, plan relation counts, generation counts) are recorded
  * in BENCH_LOCAL.md. Queries must return identical rows in all three
  * states — the correctness cross-check rides along.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.FragmentStress"
  */
object FragmentStress {

  /** The QueryStress store shape; shared by the subcommands below. */
  private val StoreYaml =
    "ev:\n  partitionby: [user_id]\n  sql: >\n    SELECT value, AVG(value) AS av FROM evs GROUP BY event_type, user_id, period(1h)\n"

  /** `shatter <srcStore> <dstStore>`: hardlink-copy a (single-generation)
    * store into the worst-case fragmented layout — every day dir in its OWN
    * commit generation — without touching the source. This reproduces, at
    * full scale and in minutes, the layout a store reaches after one flush
    * per day of retention: the exact 3,001-generation shape whose per-day
    * relations OOMed the r8/r9 stress driver. Data files are hardlinked
    * (no bytes copied); only the manifest is rewritten.
    */
  private def shatter(src: String, dst: String): Unit = {
    import java.nio.file.{Paths, StandardCopyOption}
    val srcEv = Paths.get(src, "ev")
    val dstEv = Paths.get(dst, "ev")
    graft.GraftDB.deleteRecursively(Paths.get(dst))
    val manifest = Files.readString(srcEv.resolve("MANIFEST")).split("\n")
    val dayLines = manifest.filter(_.contains("\tcommits/"))
    val header = manifest.filterNot(_.contains("\tcommits/"))
      .filterNot(_.startsWith("v="))
    var gen = 0
    val newLines = dayLines.map { l =>
      val Array(day, rel) = l.split("\t", 2)
      gen += 1
      val from = srcEv.resolve(rel)
      val toRel = s"commits/$gen/__day=${rel.split("__day=")(1)}"
      val to = dstEv.resolve(toRel)
      Files.createDirectories(to.getParent)
      // hardlink every file below the day dir, preserving structure
      val st = Files.walk(from)
      try {
        val it = st.iterator()
        while (it.hasNext) {
          val p = it.next()
          val t = to.resolve(from.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(t)
          else Files.createLink(t, p)
        }
      } finally st.close()
      s"$day\t$toRel"
    }
    Files.writeString(dstEv.resolve("MANIFEST"),
      (Seq(s"v=${gen + 1}") ++ header ++ newLines).mkString("\n"))
    println(s"""{"op":"shatter","days":$gen,"generations":$gen,"dst":"$dst"}""")
  }

  /** `measure <store> <label> [timeoutSec]`: time the QueryStress window /
    * dim-equality shapes against an existing store under a deadline (a
    * fragmented store may take minutes per query or OOM — run each
    * measurement in its own JVM). `compactstore <store>`: full compact().
    * `compare <storeA> <storeB>`: row-identity check of both query shapes
    * across two stores (e.g. a compacted shattered store vs its
    * single-merge twin) — compaction must be placement, never semantics.
    */
  private def subcommand(args: Array[String], sfDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dayMs = 86400000L
    def gens(dir: String): Int =
      Files.readString(java.nio.file.Paths.get(dir, "ev", "MANIFEST"))
        .split("\n").filter(_.contains("\tcommits/"))
        .map(_.split("\t")(1).split("/")(1)).distinct.length
    // the two QueryStress query shapes, aimed at copy-0 data (cheap to
    // derive; only the measure/compare subcommands call this)
    def queries(): (String, String) = {
      val base = EventsBlowup.baseEvents(spark, sfDir)
      val Seq(bMinMs, bMaxMs) = base
        .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
        .head().toSeq.map(_.asInstanceOf[Long]).toSeq
      val midDay = (bMinMs / dayMs + bMaxMs / dayMs) / 2
      def iso(day: Long) = java.time.LocalDate.ofEpochDay(day).toString
      val uid = base
        .filter((unix_millis(col("ts")) / lit(dayMs)).cast("long") === midDay)
        .select(col("user_id")).head().getLong(0)
      (s"SELECT value FROM ev ASOF '${iso(midDay)}' UNTIL '${iso(midDay + 1)}' GROUP BY event_type",
        s"SELECT value FROM ev WHERE user_id = $uid GROUP BY event_type, period(1h)")
    }
    args(0) match {
      case "measure" =>
        val (dir, label) = (args(1), args(2))
        val timeoutMs = args.lift(3).map(_.toLong * 1000).getOrElse(300000L)
        val (qWindow, qDim) = queries()
        def timed(name: String, sql: String): Double = {
          def once(): Double = {
            val db = new graft.GraftDB(spark, StoreYaml, dir)
            val t0 = System.nanoTime()
            try { db.sqlTimed(sql, timeoutMs); (System.nanoTime() - t0) / 1e9 }
            catch {
              case _: java.util.concurrent.TimeoutException => -1.0
              case e: Throwable =>
                println(s"""{"store":"$label","query":"$name","error":${"\""}${
                  String.valueOf(e.getMessage).take(120).replace("\"", "'")}${"\""}}""")
                -2.0
            }
          }
          val a = once()
          if (a < 0) a else math.min(a, once())
        }
        val tw = timed("window", qWindow)
        val td = timed("dim_eq", qDim)
        println(f"""{"store":"$label","gens":${gens(dir)},"window_1d_sec":$tw%.2f,"dim_eq_sec":$td%.2f,"timeout_sec":${timeoutMs / 1000}} (-1 = deadline exceeded)""")
      case "compactstore" =>
        val dir = args(1)
        val before = gens(dir)
        val t0 = System.nanoTime()
        val rewritten = new graft.GraftDB(spark, StoreYaml, dir).compact("ev")
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"compactstore","gens_before":$before,"gens_after":${gens(dir)},"day_dirs_rewritten":$rewritten,"sec":$sec%.2f}""")
      case "compare" =>
        val (dirA, dirB) = (args(1), args(2))
        val (qWindow, qDim) = queries()
        // doubles rounded to 1e-6: sum order differs between layouts
        def rows(dir: String, sql: String): Seq[String] = {
          val db = new graft.GraftDB(spark, StoreYaml, dir)
          db.sql(sql).collect().map(_.toSeq.map {
            case d: Double => f"$d%.6f"
            case x         => String.valueOf(x)
          }.mkString("|")).toSeq.sorted
        }
        val idW = rows(dirA, qWindow) == rows(dirB, qWindow)
        val dA = rows(dirA, qDim); val dB = rows(dirB, qDim)
        println(s"""{"op":"compare","window_identical":$idW,"dim_identical":${dA == dB},"dim_rows":${dA.size}}""")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.headOption match {
      case Some("shatter") =>
        shatter(args(1), args(2)); return
      case Some("measure") | Some("compactstore") | Some("compare") =>
        subcommand(args, sfDir); return
      case _ => ()
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val yaml =
      "ev:\n  partitionby: [user_id]\n  sql: >\n    SELECT value, AVG(value) AS av FROM evs GROUP BY event_type, user_id, period(1h)\n"
    val dayMs = 86400000L
    val scaleK = 10 // the 10x corpus: ~300 days, enough to fragment hard
    val corpus = spark.read.parquet(EventsBlowup.blowUp(spark, sfDir, scaleK))
      .persist()
    val Seq(minDay, maxDay) = corpus
      .agg(min((unix_millis(col("ts")) / lit(dayMs)).cast("long")),
        max((unix_millis(col("ts")) / lit(dayMs)).cast("long")))
      .head().toSeq.map(_.asInstanceOf[Long]).toSeq
    val nDays = (maxDay - minDay + 1).toInt
    val nBatches = 100 // one merge per contiguous day-group, oldest first
    val perBatch = math.max(1, math.ceil(nDays.toDouble / nBatches).toInt)

    def gens(dir: String): Int =
      Files.readString(java.nio.file.Paths.get(dir, "ev", "MANIFEST"))
        .split("\n").filter(_.contains("\tcommits/"))
        .map(_.split("\t")(1).split("/")(1)).distinct.length

    /** Build by day-group merges, oldest first (temporal arrival order). */
    def build(dir: String, auto: Boolean): Double = {
      if (Files.exists(java.nio.file.Paths.get(dir, "ev", "MANIFEST")))
        return -1.0 // reused from a previous run
      System.setProperty("graft.compact.auto", auto.toString)
      try {
        val db = new GraftDB(spark, yaml, dir)
        val t0 = System.nanoTime()
        (0 until nBatches).foreach { b =>
          val lo = minDay + b.toLong * perBatch
          val batch = corpus.filter(
            (unix_millis(col("ts")) / lit(dayMs)).cast("long")
              .between(lo, lo + perBatch - 1))
          db.insert("evs", batch)
        }
        (System.nanoTime() - t0) / 1e9
      } finally System.clearProperty("graft.compact.auto")
    }

    // query shapes aimed at copy-0 data (present in every build), like
    // QueryStress — the blowup's copies are day-shifted, so a midpoint of
    // the FULL range can land in a day no copy populated
    val base = EventsBlowup.baseEvents(spark, sfDir)
    val Seq(bMinMs, bMaxMs) = base
      .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toSeq
    val midDay = (bMinMs / dayMs + bMaxMs / dayMs) / 2
    def iso(day: Long) = java.time.LocalDate.ofEpochDay(day).toString
    val uid = base
      .filter((unix_millis(col("ts")) / lit(dayMs)).cast("long") === midDay)
      .select(col("user_id")).head().getLong(0)
    val qWindow =
      s"SELECT value FROM ev ASOF '${iso(midDay)}' UNTIL '${iso(midDay + 1)}' GROUP BY event_type"
    val qDim =
      s"SELECT value FROM ev WHERE user_id = $uid GROUP BY event_type, period(1h)"
    val qFull = "SELECT value FROM ev GROUP BY event_type"

    def time(dir: String, sql: String): Double = {
      def once(): Double = {
        val db = new GraftDB(spark, yaml, dir)
        val t0 = System.nanoTime()
        db.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def relations(dir: String, sql: String): Int = {
      val db = new GraftDB(spark, yaml, dir)
      db.sql(sql).queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.size
    }
    def rowsOf(dir: String, sql: String): Seq[String] = {
      val db = new GraftDB(spark, yaml, dir)
      db.sql(sql).collect().map(_.toSeq.map {
        case d: Double => f"$d%.6f"
        case other => String.valueOf(other)
      }.mkString("|")).toSeq.sorted
    }
    def measure(label: String, dir: String): (Seq[String], Seq[String]) = {
      val (tw, td, tf) = (time(dir, qWindow), time(dir, qDim), time(dir, qFull))
      println(f"""{"store":"$label","gens":${gens(dir)},"full_scan_relations":${
        relations(dir, qFull)},"window_1d_sec":$tw%.2f,"dim_eq_sec":$td%.2f,"full_scan_sec":$tf%.2f}""")
      (rowsOf(dir, qWindow), rowsOf(dir, qDim))
    }

    // 1. fragmented: one generation per day-group, the quiesced-store shape
    val fragDir = s"/tmp/graft-scale/fragstore_x$scaleK"
    val tBuildFrag = build(fragDir, auto = false)
    val (wFrag, dFrag) = measure("fragmented", fragDir)

    // 2. compacted: explicit full consolidation of (1)
    val t0c = System.nanoTime()
    val rewritten = new GraftDB(spark, yaml, fragDir).compact("ev")
    val tCompact = (System.nanoTime() - t0c) / 1e9
    println(f"""{"op":"compact","day_dirs_rewritten":$rewritten,"sec":$tCompact%.2f}""")
    val (wComp, dComp) = measure("compacted", fragDir)

    // 3. auto-compacted build: the default policy bounds generations as the
    // store grows — a deployment never reaches state (1)
    val autoDir = s"/tmp/graft-scale/fragstore_auto_x$scaleK"
    val tBuildAuto = build(autoDir, auto = true)
    val (wAuto, dAuto) = measure("auto_compacted", autoDir)
    if (tBuildFrag >= 0 && tBuildAuto >= 0)
      println(f"""{"op":"build","fragmented_sec":$tBuildFrag%.2f,"auto_compact_sec":$tBuildAuto%.2f,"batches":$nBatches}""")

    require(wFrag.nonEmpty && wFrag == wComp && wFrag == wAuto,
      "window query diverged across store states")
    require(dFrag.nonEmpty && dFrag == dComp && dFrag == dAuto,
      "dim query diverged across store states")
    println(s"""{"metric":"fragment_invariance","window_rows":${wFrag.size},"dim_rows":${dFrag.size},"identical":true}""")
    spark.stop()
  }
}
