package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Giant-batch stress for [[graft.pipeline.Dedup.containmentIncremental]]:
  * above `maxBroadcastRows` nothing broadcasts — the postings and the
  * probe frames shuffle once, amortized over the batch — and the survivor
  * set must still match a closed-form expectation.
  *
  * Fixture with a provable answer: history docs carry 10 tokens unique to
  * their id, and the batch interleaves four classes per id k — an exact
  * copy (c = 1, rejected), a 5-token PREFIX quote (c = 1 via "batch
  * quotes history", the side-1 probe direction), the history doc EXTENDED
  * with 5 fresh tokens (c = 1 via "history quoted by batch", side 2), and
  * a wholly fresh doc (survives). Bases are distinct within each class,
  * so expected survivors = exactly a quarter of the batch; intra-batch
  * dominance among same-base classes fires but only on rows history
  * already rejects, keeping the expectation closed-form.
  *
  * Run: sbt "runMain graft.tools.ContainmentStress [histDocs] [batchRows]"
  */
object ContainmentStress {
  def main(args: Array[String]): Unit = {
    val histDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val batchRows = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    require(batchRows / 4 <= histDocs, "bases must stay distinct per class")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def toks(base: org.apache.spark.sql.Column, n: Int) =
      (0 until n).map(i => concat(lit(s"t${i}_"), base))

    val idx = java.nio.file.Files
      .createTempDirectory("cn-stress").toString + "/i"
    val hist = spark.range(histDocs).select(col("id").as("doc_id"),
      concat_ws(" ", toks(col("id"), 10): _*).as("text"))
    val (_, buildSec) = time {
      graft.pipeline.Dedup.buildContainmentIndex(hist, col("text"),
        col("doc_id"), idx, n = 1, numProbes = 16)
    }

    val base = (col("id") / 4).cast("long")
    val batch = spark.range(batchRows).select(
      (col("id") + 10000000L).as("doc_id"),
      when(col("id") % 4 === 0, concat_ws(" ", toks(base, 10): _*))
        .when(col("id") % 4 === 1, concat_ws(" ", toks(base, 5): _*))
        .when(col("id") % 4 === 2, concat_ws(" ",
          toks(base, 10) ++ (0 until 5).map(i =>
            concat(lit(s"f${i}_"), col("id"))): _*))
        .otherwise(concat_ws(" ", (0 until 10).map(i =>
          concat(lit(s"n${i}_"), col("id"))): _*))
        .as("text"))

    // forced shuffle: the giant-batch path (no broadcast anywhere)
    val (bigCount, bigSec) = time {
      graft.pipeline.Dedup.containmentIncremental(batch, col("text"),
        col("doc_id"), idx, n = 1, threshold = 0.95, numProbes = 16,
        admit = false, maxBroadcastRows = 0L).count()
    }
    val expected = batchRows / 4

    // the daily shape: a small broadcast probe against the same index
    val small = spark.range(1000L).select(
      (col("id") + 90000000L).as("doc_id"),
      when(col("id") % 2 === 0,
          concat_ws(" ", toks((col("id") / 2).cast("long"), 3): _*))
        .otherwise(concat_ws(" ", (0 until 8).map(i =>
          concat(lit(s"s${i}_"), col("id"))): _*)).as("text"))
    val (smallCount, smallSec) = time {
      graft.pipeline.Dedup.containmentIncremental(small, col("text"),
        col("doc_id"), idx, n = 1, threshold = 0.95, numProbes = 16,
        admit = false).count()
    }

    // Probe-scan bounding A/B: input bytes for the SAME broadcast-shaped
    // probe with the ph range filter on (default) vs off (probe-filter
    // max forced to 0), across shrinking batch sizes. Skipping granularity
    // is the parquet ROW GROUP: a production-scale postings table holds
    // thousands of ph-sorted row groups per `__pp` dir, so emulate that
    // row-group COUNT at toy scale with a small block size on a second
    // index copy — the mechanism under measure is "row groups whose
    // [min,max] misses every probe are never read", and that is a function
    // of group count vs probe count, not absolute bytes.
    val idxRg = java.nio.file.Files
      .createTempDirectory("cn-stress-rg").toString + "/i"
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    hc.setInt("parquet.page.size", 16 * 1024)
    try graft.pipeline.Dedup.buildContainmentIndex(hist, col("text"),
      col("doc_id"), idxRg, n = 1, numProbes = 16)
    finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      hc.unset("parquet.page.size")
    }
    val inputBytes = new java.util.concurrent.atomic.AtomicLong
    val lst = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          inputBytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    def measuredBytes(f: => Unit): Long = {
      spark.sparkContext.addSparkListener(lst)
      inputBytes.set(0L)
      try { f; var last = -1L; var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val now = inputBytes.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
      } finally spark.sparkContext.removeSparkListener(lst)
      inputBytes.get()
    }
    // isolate the POSTINGS scan itself (the end-to-end probe also reads
    // the per-doc `docs/` table twice, which at toy scale drowns the
    // signal but at 100 TB is the cheap part): synthetic uniform probe
    // sets of shrinking size through the same pushed-predicate path.
    // Measured as the scan node's numOutputRows — rows MATERIALIZED from
    // non-skipped row groups, the quantity that is IO-proportional at any
    // scale (local-fs byte counters are dominated by constant
    // footer/page-index reads at toy scale).
    val allPostFiles = spark.read.parquet(s"$idxRg/post").inputFiles.toSeq
    def postingsScanRows(files: Seq[String],
        filter: Option[org.apache.spark.sql.Column]): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val base = spark.read.parquet(files: _*)
        val df = filter.map(base.filter).getOrElse(base)
          .agg(count(col("hid")))
        df.collect()
        df.queryExecution.executedPlan.collectLeaves().collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.sum
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // history-independence of the BOUNDED probe: at 4x the history the
    // unfiltered scan reads 4x the rows, but a fixed small probe set hits
    // the same NUMBER of row groups (more groups exist, the same count
    // match), so filtered rows read stay ~flat — the property that makes
    // the daily small-batch probe O(batch), not O(corpus tokens)
    val idxRg4 = java.nio.file.Files
      .createTempDirectory("cn-stress-rg4").toString + "/i"
    val hist4 = spark.range(histDocs * 4).select(col("id").as("doc_id"),
      concat_ws(" ", toks(col("id"), 10): _*).as("text"))
    hc.setInt("parquet.block.size", 64 * 1024)
    hc.setInt("parquet.page.size", 16 * 1024)
    try graft.pipeline.Dedup.buildContainmentIndex(hist4, col("text"),
      col("doc_id"), idxRg4, n = 1, numProbes = 16)
    finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      hc.unset("parquet.page.size")
    }
    val rowsFull = postingsScanRows(allPostFiles, None)
    // both halves of the real path's bound: residue file-prune (a probe
    // set covering r of 64 residues keeps r/64 of the files) x row-group
    // skip (within kept files, a group survives only if some probe lands
    // in its ph range — P ~ probes/groups_per_dir, vanishing at real
    // group counts). Together the read rows collapse superlinearly as the
    // batch shrinks.
    val postScan = Seq(256, 16, 4, 1).map { n =>
      val rnd = new scala.util.Random(n)
      val vs = Array.fill(n)(rnd.nextLong()).distinct.sorted
      val residues = vs.map(v => ((v % 64) + 64) % 64).toSet
      val files = allPostFiles.filter(f =>
        residues.exists(r => f.contains(s"/__pp=$r/")))
      n -> postingsScanRows(files,
        Some(graft.pipeline.Dedup.phRangePredicate(vs)))
    }
    val allPostFiles4 = spark.read.parquet(s"$idxRg4/post").inputFiles.toSeq
    val rowsFull4 = postingsScanRows(allPostFiles4, None)
    val rows16At4x = {
      val rnd = new scala.util.Random(16)
      val vs = Array.fill(16)(rnd.nextLong()).distinct.sorted
      val residues = vs.map(v => ((v % 64) + 64) % 64).toSet
      val files = allPostFiles4.filter(f =>
        residues.exists(r => f.contains(s"/__pp=$r/")))
      postingsScanRows(files,
        Some(graft.pipeline.Dedup.phRangePredicate(vs)))
    }
    // and the end-to-end daily probe with the filter on vs forced off
    def probeBatch(rows: Long) = spark.range(rows).select(
      (col("id") + 95000000L).as("doc_id"),
      concat_ws(" ", (0 until 8).map(i =>
        concat(lit(s"p${i}_"), col("id"))): _*).as("text"))
    def runProbe(rows: Long): Unit =
      graft.pipeline.Dedup.containmentIncremental(probeBatch(rows),
        col("text"), col("doc_id"), idxRg, n = 1, threshold = 0.95,
        numProbes = 16, admit = false).count()
    val e2eFiltered = {
      // the toy index sits under the production file-count gate — open it
      sys.props("graft.containmentProbeFilterMinFiles") = "0"
      try measuredBytes(runProbe(16L))
      finally sys.props.remove("graft.containmentProbeFilterMinFiles")
    }
    val e2eUnfiltered = {
      sys.props("graft.containmentProbeFilterMax") = "0"
      try measuredBytes(runProbe(16L))
      finally sys.props.remove("graft.containmentProbeFilterMax")
    }

    // ---- mid-band probe tiers (10k-1M probes): broadcast vs shuffle vs
    //      shuffle + runtime bloom-filter injection --------------------
    // The bounded (residue-prune + pushed ph ranges) path covers <=4096
    // probes; giant batches shuffle. In between, uniform probes saturate
    // both the residue dirs and any 256-range cover, so row-group
    // skipping cannot win — the open question is the JOIN tier: the probe
    // frame still broadcasts easily through ~4M hash rows, and past that
    // ceiling Spark's runtime bloom filter could bound the postings
    // side's shuffle. Measure all three tiers on the exact candidate-join
    // shape containmentIncremental plans (postings JOIN probes ON ph),
    // miss-dominated probes (the daily fresh-doc shape).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val shLst = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleBytes.addAndGet(
            te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    val bloomDefault =
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
    val postAll = spark.read.parquet(s"$idx/post")
    def probeFrame(n: Long) = spark.range(n)
      .select(xxhash64(col("id"), lit(777)).as("ph"))
    def bandRun(n: Long, bcast: Boolean, bloom: Boolean,
                dedupProbes: Boolean = false): (Double, Long, Boolean) = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        bloom.toString)
      // let injection fire at toy scale: production postings clear the
      // 10GB application-side default on their own
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "128MB")
      if (!bcast) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p0 = if (dedupProbes) probeFrame(n).distinct() else probeFrame(n)
        val p = if (bcast) broadcast(p0) else p0
        val df = postAll.join(p, Seq("ph")).agg(count(lit(1)))
        spark.sparkContext.addSparkListener(shLst)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        try df.collect() finally ()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let straggler task-end events land
        spark.sparkContext.removeSparkListener(shLst)
        val injected = df.queryExecution.executedPlan.toString
          .toLowerCase.contains("might_contain")
        (sec, shuffleBytes.get(), injected)
      } finally {
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter" +
          ".applicationSideScanSizeThreshold")
        spark.conf.unset(
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    // InjectRuntimeFilter only fires when the creation side holds a
    // SELECTIVE FILTER OVER A SCAN — a derived probe frame (explode over a
    // persisted prep, or this synthetic range) never qualifies, with or
    // without an Aggregate on top. The variants measure the tiers anyway
    // (distinct() on the probe side is the Aggregate a real adoption
    // would add; a semantic no-op — probe arrays are already
    // array_distinct), and the sanity run below proves the rig CAN
    // produce an injection when the creation-side shape is right, so
    // "injected: false" is a property of the probe shape, not the rig.
    val band = Seq(16384L, 131072L, 1048576L).map { n =>
      val b = bandRun(n, bcast = true, bloom = false)
      val s = bandRun(n, bcast = false, bloom = false)
      val sb = bandRun(n, bcast = false, bloom = true, dedupProbes = true)
      (n, b, s, sb)
    }
    // sanity: parquet-backed creation side carrying a selective literal
    // filter — the shape InjectRuntimeFilter's isSelectiveFilterOverScan
    // demands. If THIS reports false too, the conclusion above is void.
    val bloomSanity = {
      val pdir = java.nio.file.Files
        .createTempDirectory("cn-bloom-probe").toString
      probeFrame(1048576L).withColumn("tag", pmod(col("ph"), lit(17)))
        .write.mode("overwrite").parquet(pdir)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "128MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = spark.read.parquet(pdir).filter(col("tag") === 3)
          .select(col("ph"))
        val df = postAll.join(p, Seq("ph")).agg(count(lit(1)))
        df.collect()
        df.queryExecution.executedPlan.toString
          .toLowerCase.contains("might_contain")
      } finally {
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter" +
          ".applicationSideScanSizeThreshold")
        spark.conf.unset(
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }

    // one admitting pass (counter + postings + docs) at the giant size
    val (_, admitSec) = time {
      graft.pipeline.Dedup.containmentIncremental(batch, col("text"),
        col("doc_id"), idx, n = 1, threshold = 0.95, numProbes = 16,
        admit = true, maxBroadcastRows = 0L)
        .write.format("noop").mode("overwrite").save()
    }

    println(s"""{"metric":"containment_giant_batch","hist_docs":$histDocs,""" +
      s""""batch_rows":$batchRows,"index_build_sec":${f"$buildSec%.1f"},""" +
      s""""shuffle_path_sec":${f"$bigSec%.1f"},"survivors":$bigCount,""" +
      s""""survivors_expected":$expected,"match":${bigCount == expected},""" +
      s""""small_broadcast_sec":${f"$smallSec%.2f"},""" +
      s""""small_survivors":$smallCount,""" +
      s""""postings_scan_rows_full":$rowsFull,""" +
      postScan.map { case (n, b) =>
        s""""postings_scan_rows_${n}probes":{"rows":$b,""" +
          s""""of_full":${f"${b.toDouble / rowsFull}%.4f"}},"""
      }.mkString +
      s""""e2e_16doc_bytes":{"filtered":$e2eFiltered,""" +
      s""""unfiltered":$e2eUnfiltered,""" +
      s""""ratio":${f"${e2eFiltered.toDouble / e2eUnfiltered}%.3f"}},""" +
      s""""history_4x":{"rows_full_1x":$rowsFull,"rows_full_4x":$rowsFull4,""" +
      s""""rows_16probes_1x":${postScan.find(_._1 == 16).get._2},""" +
      s""""rows_16probes_4x":$rows16At4x},""" +
      s""""bloom_default":"$bloomDefault","probe_band":{""" +
      band.map { case (n, b, s, sb) =>
        s""""${n}":{"bcast_sec":${f"${b._1}%.2f"},""" +
          s""""bcast_shuffle_mb":${b._2 / (1 << 20)},""" +
          s""""shuffle_sec":${f"${s._1}%.2f"},""" +
          s""""shuffle_mb":${s._2 / (1 << 20)},""" +
          s""""bloom_sec":${f"${sb._1}%.2f"},""" +
          s""""bloom_mb":${sb._2 / (1 << 20)},""" +
          s""""bloom_injected":${sb._3}}"""
      }.mkString(",") + "}," +
      s""""bloom_sanity_injected":$bloomSanity,""" +
      s""""admit_shuffle_sec":${f"$admitSec%.1f"}}""")
    spark.stop()
  }
}
