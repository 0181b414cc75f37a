package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** State-format EVOLUTION proof (the operational risk a long-lived
  * deployment hits on every upgrade): a transformWithState checkpoint
  * written with state schema v1 must restart under a processor whose state
  * case class gained a field — without clearing state or replaying the
  * topic from offset zero.
  *
  * Spark 4 supports this through the Avro state-store encoding
  * (`spark.sql.streaming.stateStore.encodingFormat=avro`): adding a
  * nullable field is a standard Avro reader-schema evolution, so v1 rows
  * deserialize under v2 with the new field absent. The default UnsafeRow
  * encoding is positional and would reject the changed schema — which is
  * why the production config in SCALE.md pins Avro for stateful queries.
  *
  * Harness mirrors StreamRecoverySpec: file source (replayable offsets) →
  * transformWithState → parquet sink, AvailableNow triggers.
  */
class StreamEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import StreamEvolutionSpec._

  private def run(proc: StatefulProcessor[String, Tick, Emit],
      in: String, out: String, ckpt: String): Unit = {
    val ticks = spark.readStream.text(in).select(col("value")).as[String]
      .map { s => val a = s.split(','); Tick(a(0), a(1).toDouble, a(2).toLong) }
    val q = ticks.groupByKey(_.symbol)
      .transformWithState(proc, TimeMode.None(), OutputMode.Append())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("v1 checkpoint restarts under v2 state schema (added field) with state intact") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.encodingFormat")
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
    try {
      val root = graft.SessionScoped.scratchDir("graft_evo")
      def dir(name: String): String = {
        Files.createDirectories(Paths.get(root, name)); s"$root/$name"
      }
      val in = dir("in"); val out = dir("out"); val ckpt = dir("ckpt")

      // ---- phase 1: schema v1 (count only) over 3 A-ticks + 2 B-ticks
      Files.write(Paths.get(in, "p1.csv"),
        Seq("A,10.0,1", "A,11.0,2", "A,12.0,3", "B,20.0,4", "B,21.0,5")
          .mkString("\n").getBytes)
      run(new CountV1, in, out, ckpt)
      val p1 = spark.read.parquet(out).as[Emit].collect().sortBy(_.symbol)
      assert(p1.map(e => (e.symbol, e.count)).toSeq == Seq(("A", 3L), ("B", 2L)))
      assert(p1.forall(_.total.isEmpty))

      // ---- phase 2: RESTART from the same checkpoint under schema v2
      // (count + total). The restored v1 state must carry its counts; the
      // new field starts empty and begins accumulating.
      Files.write(Paths.get(in, "p2.csv"),
        Seq("A,30.0,6", "A,40.0,7").mkString("\n").getBytes)
      run(new SumV2, in, out, ckpt)
      val p2 = spark.read.parquet(out).as[Emit].collect()
        .filter(_.count == 5L)
      assert(p2.length == 1, "A's v2 state must resume from the v1 count of 3")
      assert(p2.head.symbol == "A" && p2.head.total.contains(70.0),
        "the added field starts fresh and accumulates the v2 batch")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat")
      }
    }
  }
}

object StreamEvolutionSpec {
  final case class Tick(symbol: String, price: Double, timestamp: Long)
  final case class StateV1(count: Long)
  final case class StateV2(count: Long, total: Option[Double])
  final case class Emit(symbol: String, count: Long, total: Option[Double])

  /** v1: counts ticks per symbol. */
  final class CountV1 extends StatefulProcessor[String, Tick, Emit] {
    @transient private var st: ValueState[StateV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StateV1]("evoState",
        Encoders.product[StateV1], TTLConfig.NONE)
    override def handleInputRows(symbol: String, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[Emit] = {
      val s0 = if (st.exists()) st.get() else StateV1(0L)
      val s1 = StateV1(s0.count + rows.size)
      st.update(s1)
      Iterator(Emit(symbol, s1.count, None))
    }
  }

  /** v2: same state name, schema gained a nullable `total` field. */
  final class SumV2 extends StatefulProcessor[String, Tick, Emit] {
    @transient private var st: ValueState[StateV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StateV2]("evoState",
        Encoders.product[StateV2], TTLConfig.NONE)
    override def handleInputRows(symbol: String, rows: Iterator[Tick],
        timerValues: TimerValues): Iterator[Emit] = {
      val rs = rows.toVector
      val s0 = if (st.exists()) st.get() else StateV2(0L, None)
      val s1 = StateV2(s0.count + rs.size,
        Some(s0.total.getOrElse(0.0) + rs.map(_.price).sum))
      st.update(s1)
      Iterator(Emit(symbol, s1.count, s1.total))
    }
  }
}
