package graft

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.streaming.StreamingQueryListener

/** HDFS-backed vs RocksDB state store on the unbounded-state streaming
  * ops (round-12 verdict item 5): g8's per-user approx-distinct rows are
  * the state class that outgrows executor heap at 100 TB, which is what
  * `SPARK_GRAFT_STATE_STORE=rocksdb` exists for. The provider is a
  * per-query SQLConf, so both providers run in ONE JVM on the same host:
  * per provider, min-of-3 wall time on the sf1 (1M-event) g8 feed plus
  * the final-batch state-operator metrics (rows, memory/native bytes)
  * captured through a StreamingQueryListener. g2 (sessionization — one
  * state row per user, updated every event) rides along as the
  * write-heavy shape.
  *
  * Usage: Test/runMain graft.G8StateProbe [sfDir]
  */
object G8StateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf1data")
    val s = GraftSession.get("local[32]")

    // peak state across a run's triggers (the final empty trigger can
    // report 0 rows - the max is the state the store actually carried)
    val maxRows = new java.util.concurrent.atomic.AtomicLong(0)
    val maxMem = new java.util.concurrent.atomic.AtomicLong(0)
    val lastState = new AtomicReference[String]("")
    s.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops.nonEmpty) {
          maxRows.getAndUpdate(m => math.max(m, ops.map(_.numRowsTotal).sum))
          maxMem.getAndUpdate(m => math.max(m, ops.map(_.memoryUsedBytes).sum))
          lastState.set(
            s"rows=${maxRows.get} mem=${maxMem.get}")
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val providers = Seq(
      ("hdfs", "org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider"),
      ("rocksdb", "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"))

    for ((tag, cls) <- providers) {
      s.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      for (op <- Seq("g8", "g2")) {
        val run: () => Unit = op match {
          case "g8" => () => { streaming.StreamOps.g8(s, dir).write
            .format("noop").mode("overwrite").save(); () }
          case _ => () => { streaming.StreamOps.g2(s, dir).write
            .format("noop").mode("overwrite").save(); () }
        }
        run() // warm (staged feed is cached after the first run)
        maxRows.set(0); maxMem.set(0)
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          run()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[g8state] $op/$tag: $t%.2f s (min of 3), state ${lastState.get}")
      }
    }
    streaming.StreamRunner.clearStagedCache()
    s.stop()
  }
}
