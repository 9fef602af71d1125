package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.SparkBackend
import graft.etl.{SqlProcessor, TestSpark}

/** The reference's alert rule semantics (funcs_common.py:276-321):
  * ≤10 rows fetched from the step's sql, `pass_condition` formatted
  * per-row and run as a func, failing rows rendered via
  * `alert_template` into ONE alerter message.
  */
class AlertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private final class Recorder extends SparkFuncs.Alerter {
    val sent = scala.collection.mutable.Buffer[(String, String)]()
    override def sendAlert(msg: String, users: String): Unit =
      sent += ((msg, users))
  }

  test("alert step: failing rows templated into one message") {
    val rec = new Recorder
    val saved = SparkFuncs.alerter
    SparkFuncs.alerter = rec
    try {
      // pass_condition carries parens/commas, so it rides in via a var
      // (the reference's func-arg grammar has the same restriction)
      val etl = """-- target=variables
select 'is_greater_or_equal({v}, 10)' as cond, 'id {id} low: {v}' as tmpl

-- target=temp.checked
select * from (values (1, 15), (2, 3), (3, 9)) as t(id, v)

-- target=func.alert(__step__, __context__, low_rule, ${cond}, ${tmpl}, ops)
select id, v from checked
"""
      new SqlProcessor(new SparkBackend(spark), etl).run()
      assert(rec.sent.length == 1)
      val (msg, users) = rec.sent.head
      assert(users == "ops")
      assert(msg.linesIterator.toSeq.sorted ==
        Seq("id 2 low: 3", "id 3 low: 9"))
    } finally SparkFuncs.alerter = saved
  }

  test("alert with all rows passing sends nothing; send_alert is direct") {
    val rec = new Recorder
    val saved = SparkFuncs.alerter
    SparkFuncs.alerter = rec
    try {
      val etl = """-- target=variables
select 'is_greater_or_equal({v}, 1)' as cond

-- target=func.alert(__step__, __context__, ok_rule, ${cond}, unused, ops)
select 5 as v

-- target=func.send_alert(direct-message, oncall)
"""
      new SqlProcessor(new SparkBackend(spark), etl).run()
      assert(rec.sent.length == 1)
      assert(rec.sent.head == (("direct-message", "oncall")))
    } finally SparkFuncs.alerter = saved
  }
}
