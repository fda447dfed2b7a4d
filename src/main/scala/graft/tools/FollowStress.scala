package graft.tools

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.SparkSession
import graft.GraftDB
import graft.server.{RpcClient, RpcServer}

/** Throughput + isolation evidence for the FOLLOW replay path (round-7
  * verdict, next-round #2). Replay is correctness-tested in RpcSpec; this
  * sizes it:
  *
  *  1. fill a stream's journal with a deep backlog, then attach several
  *     concurrent followers (plain AND snappy transports) replaying from
  *     marker 0 and measure per-follower replay MB/s — replay streams
  *     entry files per connection thread, so followers should each see
  *     near-disk throughput, not 1/N of it;
  *  2. inserts must never block on slow followers: insert latency with 4
  *     deliberately-slow consumers (50 ms per chunk) attached mid-replay
  *     is compared against the no-follower baseline — the journal append
  *     runs on the inserter's connection thread and followers only read
  *     published files, so the ratio should be ≈1;
  *  3. replay is file-streamed, never buffered: the server chunks ≤500
  *     rows / ≤8 MiB per frame straight off the entry reader
  *     (RpcServer.writeJournalEntry), so driver heap must not grow with
  *     backlog depth — used-heap before/after rides the output as coarse
  *     evidence.
  *
  * Run: sbt "runMain graft.tools.FollowStress"
  * Results are recorded in BENCH_LOCAL.md.
  */
object FollowStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val T0 = 1700000000000L
    val dir = Files.createTempDirectory("graft-follow-stress").toString
    val yaml =
      """combined:
        |  retentionperiod: 30d
        |  sql: >
        |    SELECT requests FROM inbound GROUP BY *, period(5m)
        |""".stripMargin
    val db = new GraftDB(spark, yaml, dir, () => T0 + 1000000)
    val srv = new RpcServer(spark, db, 0)
    val port = srv.start()
    try {
      // ---- backlog: batches big enough that chunking (500 rows/frame)
      // and the gzip entry reader both do real work
      val batches = 40
      val rowsPer = 5000
      def batch(b: Int): String =
        (0 until rowsPer).map { i =>
          s"""{"ts": ${T0 + (b.toLong * rowsPer + i) * 250}, "dims": {"server": "srv${i % 97}", "path": "/api/endpoint/${i % 31}/resource"}, "vals": {"requests": ${i % 13}}}"""
        }.mkString("\n")
      val rawBytes = (0 until batches).map(b => batch(b).length.toLong).sum
      val client = new RpcClient("localhost", port)
      val tIns0 = System.nanoTime()
      (0 until batches).foreach(b => client.insert("inbound", Seq(batch(b))))
      val insSec = (System.nanoTime() - tIns0) / 1e9
      val depth = db.journalStats.get("inbound")
      println(f"""{"backlog_batches":$batches,"rows":${batches * rowsPer},"raw_mb":${rawBytes / 1e6}%.1f,"journal_disk_mb":${depth.map(_._2).getOrElse(0L) / 1e6}%.1f,"fill_sec":$insSec%.1f}""")

      def usedHeapMb(): Long = {
        System.gc()
        val rt = Runtime.getRuntime
        (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
      }

      // ---- concurrent replay: 4 followers (2 plain, 2 snappy) from 0
      val heap0 = usedHeapMb()
      val followers = 4
      val done = new CountDownLatch(followers)
      val stats = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Long)]()
      val t0 = System.nanoTime()
      val handles = (0 until followers).map { f =>
        val c = new RpcClient("localhost", port, snappy = f % 2 == 1)
        @volatile var bytes = 0L
        c.followSince("inbound", Some(0L)) { (m, lines, end) =>
          bytes += lines.length
          if (end && m == batches.toLong) {
            stats.add((f, (System.nanoTime() - t0) / 1e9, bytes))
            done.countDown()
          }
        }(onError = e => { System.err.println(s"follower $f: $e"); done.countDown() })
      }
      require(done.await(300, TimeUnit.SECONDS), "replay timed out")
      handles.foreach(_.close())
      val heap1 = usedHeapMb()
      stats.forEach { case (f, sec, bytes) =>
        println(f"""{"follower":$f,"snappy":${f % 2 == 1},"replay_sec":$sec%.2f,"replay_mb_per_sec":${bytes / 1e6 / sec}%.1f}""")
      }
      val worst = {
        val arr = stats.toArray(Array.empty[(Int, Double, Long)])
        arr.map(_._2).max
      }
      println(f"""{"metric":"follow_replay","followers":$followers,"worst_replay_sec":$worst%.2f,"aggregate_mb_per_sec":${followers * rawBytes / 1e6 / worst}%.1f,"heap_before_mb":$heap0,"heap_after_mb":$heap1}""")

      // ---- inserts vs slow followers: baseline then contended
      def timeInserts(n: Int, tag: String): Double = {
        val t = System.nanoTime()
        (0 until n).foreach(b => client.insert("inbound", Seq(batch(b))))
        val sec = (System.nanoTime() - t) / 1e9
        println(f"""{"insert_run":"$tag","batches":$n,"sec":$sec%.2f}""")
        sec
      }
      val base = timeInserts(5, "no_followers")
      val slowHandles = (0 until 4).map { f =>
        val c = new RpcClient("localhost", port, snappy = f % 2 == 1)
        c.followSince("inbound", Some(0L)) { (_, _, _) =>
          Thread.sleep(50) // a deliberately slow consumer mid-replay
        }(onError = _ => ())
      }
      Thread.sleep(500) // replay to the slow consumers is now in flight
      val contended = timeInserts(5, "with_4_slow_followers")
      slowHandles.foreach(_.close())
      println(f"""{"metric":"insert_isolation","ratio":${contended / base}%.2f}""")
    } finally { srv.stop(); spark.stop() }
  }
}
