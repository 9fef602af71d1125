package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.SparkBackend

class DebuggerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val etl =
    """-- target=variables
      |select 1 as a
      |
      |-- target=temp.t1
      |select ${a} as id, 'x' as val
      |
      |-- target=temp.t2
      |select id + 1 as id, val from t1
      |
      |-- target=output.db.out
      |select * from t2
      |""".stripMargin

  private def newDebugger(): SqlProcessorDebugger = {
    val f = java.nio.file.Files.createTempFile("graft_dbg", ".sql")
    java.nio.file.Files.write(f, etl.getBytes("UTF-8"))
    new SqlProcessorDebugger(f.toString, new SparkBackend(spark),
      initialVars = Map("__create_output_table__" -> "true"))
  }

  test("step-through life cycle: positions, vars, temp views, output") {
    val dbg = newDebugger()
    assert(!dbg.isStarted && !dbg.isFinished)
    assert(dbg.steps.length == 4)
    assert(dbg.currentStepNo.isEmpty && dbg.nextStepNo.contains(1))

    dbg.stepOn() // variables
    assert(dbg.isStarted && dbg.isInProgress)
    assert(dbg.currentStepNo.contains(1))
    assert(dbg.vars.get("a").map(_.toString).contains("1"))

    dbg.stepTo(3) // t1 + t2
    assert(dbg.currentStepNo.contains(3))
    assert(dbg.tempViews.contains("t1") && dbg.tempViews.contains("t2"))
    assert(dbg.sql("select id from t2").collect().head.getInt(0) == 2)
    assert(dbg.leftStepCount == 1)

    dbg.run() // output step, dry-run -> <out>_<hex>_output view
    assert(dbg.isFinished)
    assert(dbg.tempViews.exists(_.matches("out_[0-9a-f]+_output")))
    dbg.stepOn() // no-op past the end
    assert(dbg.isFinished)
  }

  test("restart drops views created since construction and resets position") {
    // restart keeps only the views that existed at construction time, so
    // start this debugger from a clean slate
    new SparkBackend(spark).clearTempTables()
    val dbg = newDebugger()
    dbg.run()
    assert(dbg.tempViews.contains("t1"))
    dbg.restart()
    assert(!dbg.isStarted && dbg.leftStepCount == 4)
    assert(!dbg.tempViews.contains("t1") && !dbg.tempViews.contains("t2"))
    // and it can run again after restart
    dbg.stepTo(2)
    assert(dbg.tempViews.contains("t1"))
  }

  test("stepTo rejects out-of-range and backwards targets") {
    val dbg = newDebugger()
    dbg.stepTo(99) // prints, runs nothing
    assert(!dbg.isStarted)
    dbg.stepTo(2)
    dbg.stepTo(1) // backwards: nothing to run
    assert(dbg.currentStepNo.contains(2))
  }
}
