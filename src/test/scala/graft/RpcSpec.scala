package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.server.{RpcClient, RpcServer}

/** Round trip over the RPC surface ≅ the reference's rpc/server test
  * (rpc/server/rpc_test.go): streaming insert, streamed query results,
  * follow delivering subsequent inserts.
  */
class RpcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1700000000000L

  test("RPC insert (client-streaming) + query (server-streaming) + follow") {
    val dir = Files.createTempDirectory("graft-rpc").toString
    val yaml =
      """combined:
        |  retentionperiod: 1h
        |  sql: >
        |    SELECT requests FROM inbound GROUP BY *, period(5m)
        |""".stripMargin
    val db = new GraftDB(spark, yaml, dir, () => T0 + 10000)
    val srv = new RpcServer(spark, db, 0)
    val port = srv.start()
    try {
      val client = new RpcClient("localhost", port)

      // a follower subscribed BEFORE the inserts sees every batch
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val latch = new CountDownLatch(2)
      val follower = client.follow("inbound") { lines =>
        seen.add(lines); latch.countDown()
      }
      Thread.sleep(200) // let the FOLLOW registration land

      // two POINTS frames in ONE streaming insert call
      val n = client.insert("inbound", Seq(
        Seq(
          s"""{"ts": $T0, "dims": {"server": "s1"}, "vals": {"requests": 56}}""",
          s"""{"ts": ${T0 + 1000}, "dims": {"server": "s1"}, "vals": {"requests": 12}}"""
        ).mkString("\n"),
        s"""{"ts": ${T0 + 2000}, "dims": {"server": "s2"}, "vals": {"requests": 30}}"""))
      assert(n == 3)

      val (cols, rows, stats) = client.queryWithStats(
        "SELECT _points, requests FROM combined GROUP BY server ORDER BY requests DESC")
      assert(cols == Seq("_time", "server", "_points", "requests"))
      assert(rows.length == 2)
      assert(rows(0).contains("\"server\":\"s1\"") && rows(0).contains("\"requests\":68.0"))
      assert(rows(1).contains("\"server\":\"s2\"") && rows(1).contains("\"requests\":30.0"))
      // the END frame carries QueryStats (common.QueryStats analogue)
      assert(stats.contains("\"rows\":2") && stats.contains("\"completed\":true"), stats)

      // both POINTS frames reached the follower
      assert(latch.await(10, TimeUnit.SECONDS))
      val delivered = seen.toArray.mkString("\n")
      assert(delivered.contains("\"requests\":56"))
      assert(delivered.contains("\"server\":\"s2\""))
      follower.close()

      // errors come back as ERR frames, not hung connections
      val ex = intercept[RuntimeException](client.query("SELECT nope FROM missing"))
      assert(String.valueOf(ex.getMessage).contains("ERR"))
    } finally srv.stop()
  }

  test("snappy-framed transport: auto-detected per connection, plain client coexists") {
    // the reference wraps EVERY rpc socket in the snappy framing format
    // (rpc/snappyconn.go snappyDialer/SnappyListener); our server detects
    // the 0xFF stream-identifier byte and speaks the same public format
    // (snappy-java's SnappyFramed streams implement it) per connection
    val dir = Files.createTempDirectory("graft-rpc-snappy").toString
    val yaml =
      """combined:
        |  retentionperiod: 1h
        |  sql: >
        |    SELECT requests FROM inbound GROUP BY *, period(5m)
        |""".stripMargin
    val db = new GraftDB(spark, yaml, dir, () => T0 + 10000)
    val srv = new RpcServer(spark, db, 0)
    val port = srv.start()
    try {
      val zipped = new RpcClient("localhost", port, snappy = true)
      val plain = new RpcClient("localhost", port)

      // follow over the compressed transport
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val latch = new CountDownLatch(1)
      val follower = zipped.follow("inbound") { lines =>
        seen.add(lines); latch.countDown()
      }
      Thread.sleep(200)

      // compressed streaming insert
      val n = zipped.insert("inbound", Seq(
        s"""{"ts": $T0, "dims": {"server": "s1"}, "vals": {"requests": 7}}""",
        s"""{"ts": ${T0 + 1000}, "dims": {"server": "s2"}, "vals": {"requests": 5}}"""))
      assert(n == 2)

      // compressed query sees the data; an interleaved PLAIN connection to
      // the same server sees the identical result
      for (c <- Seq(zipped, plain)) {
        val (cols, rows, stats) = c.queryWithStats(
          "SELECT requests FROM combined GROUP BY server ORDER BY requests DESC")
        assert(cols == Seq("_time", "server", "requests"))
        assert(rows.length == 2, rows)
        assert(rows(0).contains("\"requests\":7.0"), rows)
        assert(stats.contains("\"completed\":true"), stats)
      }

      assert(latch.await(10, TimeUnit.SECONDS))
      assert(seen.toArray.mkString("\n").contains("\"requests\":7"))
      follower.close()

      // ERR frames survive the compressed transport too
      val ex = intercept[RuntimeException](zipped.query("SELECT nope FROM missing"))
      assert(String.valueOf(ex.getMessage).contains("ERR"))
    } finally srv.stop()
  }
}
