package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Sums shuffle-write bytes/records across completed stages — the number
  * scale work cares about (it is what a bloom prescreen or a broadcast
  * flip actually removes). Register once per session; [[delta]] brackets
  * a measured action. Listener events are async and the bus is private,
  * so reads poll until the adders stabilize (bounded). */
final class ShuffleMeter(sc: SparkContext) {
  private val bytes = new LongAdder
  private val records = new LongAdder
  sc.addSparkListener(new SparkListener {
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      bytes.add(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      records.add(e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
  })

  private def settle(): Unit = {
    var last = -1L
    var spins = 0
    while (bytes.sum() != last && spins < 25) {
      last = bytes.sum(); spins += 1; Thread.sleep(200)
    }
  }

  /** (bytes, records) shuffled while running `a`. */
  def delta[A](a: => A): (Long, Long, A) = {
    settle()
    val b0 = bytes.sum(); val r0 = records.sum()
    val out = a
    settle()
    (bytes.sum() - b0, records.sum() - r0, out)
  }
}
