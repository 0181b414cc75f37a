package graft

import java.sql.DriverManager

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{AnsiInsertIgnoreDialect, InsertIgnoreDialect, JdbcInsertIgnoreSink}

/** Embedded-Derby round-trip for the JDBC first-write-wins sink — the
  * Spark analog of the reference consumer's
  * `execute_values(cur, "INSERT … ON CONFLICT DO NOTHING", records)`
  * (trading-etl-python/src/processing/consumer.py:188-210,
  * tests/test_consumer.py:115-161). Derby ships in the Spark distribution,
  * so this exercises a real database: DDL with a primary key, MERGE-based
  * conflict absorption, the duplicate-key row-replay fallback, and
  * rollback-on-failure. */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:graftSinkDb;create=true"
  private def conn() = DriverManager.getConnection(url)

  /** Serializable connection factory: captures only the url string, never
    * `this` (a ScalaTest spec is not serializable). */
  private def connect: () => java.sql.Connection = {
    val u = url
    () => DriverManager.getConnection(u)
  }

  private def freshTable(name: String): Unit = {
    val c = conn()
    try {
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $name") catch { case _: java.sql.SQLException => () }
      st.execute(
        s"""CREATE TABLE $name (
           |  symbol VARCHAR(16) NOT NULL,
           |  ts BIGINT NOT NULL,
           |  px DOUBLE,
           |  PRIMARY KEY (symbol, ts))""".stripMargin)
      st.close()
    } finally c.close()
  }

  private def readAll(name: String): Map[(String, Long), Double] = {
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery(s"SELECT symbol, ts, px FROM $name")
      val b = Map.newBuilder[(String, Long), Double]
      while (rs.next()) b += ((rs.getString(1), rs.getLong(2)) -> rs.getDouble(3))
      b.result()
    } finally c.close()
  }

  private def df(rows: Seq[(String, Long, Double)], parts: Int) = {
    import spark.implicits._
    rows.toDF("symbol", "ts", "px").repartition(parts)
  }

  test("ANSI dialect: round-trip, then at-least-once replay is absorbed (first write wins)") {
    freshTable("bars_merge")
    val first = df(Seq(("AAPL", 1L, 150.0), ("AAPL", 2L, 151.0), ("MSFT", 1L, 300.0)), 3)
    JdbcInsertIgnoreSink.write(first, connect, "bars_merge",
      Seq("symbol", "ts"), AnsiInsertIgnoreDialect)
    assert(readAll("bars_merge") === Map(
      ("AAPL", 1L) -> 150.0, ("AAPL", 2L) -> 151.0, ("MSFT", 1L) -> 300.0))

    // replay two keys with DIFFERENT values + two genuinely new keys:
    // the reference's consumer replays whole batches after a crash
    val replay = df(Seq(("AAPL", 1L, 999.0), ("MSFT", 1L, 999.0),
      ("AAPL", 3L, 152.0), ("TSLA", 1L, 700.0)), 2)
    JdbcInsertIgnoreSink.write(replay, connect, "bars_merge",
      Seq("symbol", "ts"), AnsiInsertIgnoreDialect)
    assert(readAll("bars_merge") === Map(
      ("AAPL", 1L) -> 150.0, ("AAPL", 2L) -> 151.0, ("MSFT", 1L) -> 300.0,
      ("AAPL", 3L) -> 152.0, ("TSLA", 1L) -> 700.0))
  }

  /** Raw INSERT with no conflict clause — simulates the window where a
    * concurrent writer lands a key between MERGE's NOT-MATCHED probe and
    * its insert, so every duplicate surfaces as a constraint error. */
  private object RawInsertDialect extends InsertIgnoreDialect {
    override def insertIgnoreSql(table: String, columns: Seq[String],
        keys: Seq[String], schema: StructType): String =
      s"INSERT INTO $table (${columns.mkString(", ")}) VALUES (${columns.map(_ => "?").mkString(", ")})"
  }

  test("duplicate-key batch failure replays row-at-a-time: dups skipped, rest lands") {
    freshTable("bars_race")
    JdbcInsertIgnoreSink.write(df(Seq(("AAPL", 1L, 150.0)), 1), connect,
      "bars_race", Seq("symbol", "ts"), RawInsertDialect)
    // one partition, one batch: [dup, new, dup, new] — the batch fails with
    // SQLState 23505 and the fallback must keep the two fresh rows
    JdbcInsertIgnoreSink.write(
      df(Seq(("AAPL", 1L, 999.0), ("AAPL", 2L, 151.0),
        ("AAPL", 1L, 888.0), ("MSFT", 1L, 300.0)), 1),
      connect, "bars_race", Seq("symbol", "ts"), RawInsertDialect)
    assert(readAll("bars_race") === Map(
      ("AAPL", 1L) -> 150.0, ("AAPL", 2L) -> 151.0, ("MSFT", 1L) -> 300.0))
  }

  test("non-duplicate failure rolls the partition back (nothing half-committed)") {
    freshTable("bars_rb")
    val tooLong = "X" * 64 // exceeds VARCHAR(16) → SQLState 22001, not a dup
    val bad = df(Seq(("AAPL", 1L, 150.0), (tooLong, 2L, 151.0)), 1)
    intercept[org.apache.spark.SparkException] {
      JdbcInsertIgnoreSink.write(bad, connect, "bars_rb",
        Seq("symbol", "ts"), AnsiInsertIgnoreDialect)
    }
    assert(readAll("bars_rb").isEmpty)
  }

  test("NOT NULL violation (SQLState 23502) propagates — not swallowed as a duplicate") {
    freshTable("bars_nn")
    // ts is NOT NULL in the DDL; a null there is class-23 but NOT 23505 —
    // first-write-wins must never absorb it as if it were a replay
    import spark.implicits._
    val bad = Seq(("AAPL", Some(1L), 150.0), ("MSFT", None, 300.0))
      .toDF("symbol", "ts", "px").repartition(1)
    intercept[org.apache.spark.SparkException] {
      JdbcInsertIgnoreSink.write(bad, connect, "bars_nn",
        Seq("symbol", "ts"), RawInsertDialect)
    }
    assert(readAll("bars_nn").isEmpty) // rolled back, nothing half-committed
  }

  test("streaming foreachBatch: micro-batches land once, replays absorbed") {
    freshTable("bars_stream")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val q = input.toDF().toDF("symbol", "ts", "px")
      .writeStream
      .foreachBatch(JdbcInsertIgnoreSink.foreachBatchWriter(
        connect, "bars_stream", Seq("symbol", "ts"), AnsiInsertIgnoreDialect))
      .start()
    try {
      input.addData(("AAPL", 1L, 150.0), ("MSFT", 1L, 300.0))
      q.processAllAvailable()
      // second micro-batch replays a key with a different value (the
      // at-least-once case) plus a genuinely new row
      input.addData(("AAPL", 1L, 999.0), ("AAPL", 2L, 151.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(readAll("bars_stream") === Map(
      ("AAPL", 1L) -> 150.0, ("MSFT", 1L) -> 300.0, ("AAPL", 2L) -> 151.0))
  }

  test("complex column types are rejected on the driver, before any job") {
    import spark.implicits._
    val withArray = Seq(("AAPL", Array(1.0, 2.0))).toDF("symbol", "path")
    val e = intercept[IllegalArgumentException] {
      JdbcInsertIgnoreSink.write(withArray, connect, "bars_merge",
        Seq("symbol"), AnsiInsertIgnoreDialect)
    }
    assert(e.getMessage.contains("path"))
  }
}
