package graft.model

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
import scala.collection.mutable

/** Measurement main for the optimization rounds: run named gate queries
  * through the bench's noop-sink methodology with a listener that
  * attributes wall time to the owning SQL EXECUTION (the action's call
  * site — broadcast/subquery sub-jobs roll into their parent action,
  * where a per-job view shows only an opaque thread-pool frame) — the
  * "where do a lifecycle gate's 50 seconds actually go" view that the
  * per-query bench number cannot give. No production surface: prints a
  * per-action table (wall sec, executions, jobs) per query and exits.
  *
  * Usage: runMain graft.model.GateProfile [sfDir] <queryName> [more...]
  */
object GateProfile {

  private final class ExecClock extends SparkListener {
    // executionId -> (description, startNanos-equivalent millis, jobs)
    val open = mutable.Map.empty[Long, (String, Long, Int)]
    val agg = mutable.LinkedHashMap.empty[String, (Double, Int, Int)]
    val jobsByExec = mutable.Map.empty[Long, Int].withDefaultValue(0)
    // per-execution job wall durations (sec) — tells scheduling tax
    // (many uniform tiny jobs) apart from real compute (a few big ones)
    val jobDursByExec = mutable.Map.empty[Long, mutable.ArrayBuffer[Double]]
    val jobDurs = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Double]]
    val jobStart = mutable.Map.empty[Int, (Long, Option[Long])]
    var nonSqlJobs = 0
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      val exec = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.sql.execution.id"))).map(_.toLong)
      jobStart(js.jobId) = (js.time, exec)
      exec match {
        case Some(id) => jobsByExec(id) += 1
        case None => nonSqlJobs += 1
      }
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      jobStart.remove(je.jobId).foreach { case (t0, exec) =>
        exec.foreach(id => jobDursByExec.getOrElseUpdate(id,
          mutable.ArrayBuffer.empty) += (je.time - t0) / 1e3)
      }
    }
    override def onOtherEvent(e: SparkListenerEvent): Unit = synchronized {
      e match {
        case s: SparkListenerSQLExecutionStart =>
          open(s.executionId) = (s.description, s.time, 0)
        case s: SparkListenerSQLExecutionEnd =>
          open.remove(s.executionId).foreach { case (desc, t0, _) =>
            val secs = (s.time - t0) / 1e3
            val (w, n, j) = agg.getOrElse(desc, (0.0, 0, 0))
            agg(desc) = (w + secs, n + 1, j + jobsByExec.remove(s.executionId).getOrElse(0))
            jobDursByExec.remove(s.executionId).foreach(ds =>
              jobDurs.getOrElseUpdate(desc, mutable.ArrayBuffer.empty) ++= ds)
          }
        case _ => ()
      }
    }
    def reset(): Unit = synchronized {
      open.clear(); agg.clear(); jobsByExec.clear(); nonSqlJobs = 0
      jobDursByExec.clear(); jobDurs.clear(); jobStart.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val isName = (s: String) => graft.SparkEntry.queries.contains(s)
    val (dirArgs, names) = args.partition(a => !isName(a))
    require(names.nonEmpty, "usage: GateProfile [sfDir] <queryName> [more...]")
    val (spark, dir) = BenchHarness.session(dirArgs, "/root/testdata/sf0.1")
    val clock = new ExecClock
    spark.sparkContext.addSparkListener(clock)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def runOnce(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        secs
      }
      runOnce() // warm-up rep: JIT/codegen land here, like the sweep steady state
      spark.catalog.clearCache()
      Thread.sleep(500) // let straggler listener events drain
      clock.reset()
      val wall = runOnce()
      Thread.sleep(500)
      val (rows, nonSql) = clock.synchronized { (clock.agg.toSeq, clock.nonSqlJobs) }
      val execWall = rows.map(_._2._1).sum
      val execs = rows.map(_._2._2).sum
      val jobs = rows.map(_._2._3).sum
      println(f"\n===== $name%s wall=$wall%.2fs execs=$execs%d execWall=$execWall%.2fs sqlJobs=$jobs%d nonSqlJobs=$nonSql%d offExec=${wall - execWall}%.2fs =====")
      val durs = clock.synchronized { clock.jobDurs.toMap }
      rows.sortBy(-_._2._1).foreach { case (desc, (w, n, j)) =>
        println(f"  $w%8.3f s  x$n%-4d jobs=$j%-4d ${desc.linesIterator.next()}%s")
        durs.get(desc).filter(_.size >= 8).foreach { ds =>
          val s = ds.sorted
          println(f"      jobs: sum=${ds.sum}%.2fs p50=${s(s.size / 2)}%.3f max=${s.last}%.3f top=${s.takeRight(5).reverse.map(d => f"$d%.2f").mkString(",")}%s")
        }
      }
    }
    spark.stop()
  }
}
