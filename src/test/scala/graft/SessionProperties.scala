package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.model.Event
import graft.session.Sessionize
import graft.streaming.StreamingSessionizer

/** Property-based invariants of the sessionization semantics (SURVEY.md §5
  * item 5), checked on randomly generated event histories. Batch
  * formulation and the stateful streaming function (run in single-batch
  * mode) are both exercised.
  */
object SessionProperties extends Properties("sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark

  private val baseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private val genEvents: Gen[List[Event]] = for {
    n <- Gen.choose(1, 40)
    users <- Gen.listOfN(n, Gen.choose(1L, 4L))
    gaps <- Gen.listOfN(n, Gen.oneOf(0L, 60L, 600L, 1800L, 1801L, 7200L)) // seconds
    types <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase"))
  } yield {
    // per-user monotone timestamps built from cumulative gaps
    val perUser = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    users.lazyZip(gaps).lazyZip(types).lazyZip(1 to n).map { (u, g, t, i) =>
      val ts = perUser(u) + g
      perUser(u) = ts
      Event(i.toLong, new Timestamp(baseMs + ts * 1000L), u, t, (i % 7) + 0.25, "{}")
    }.toList
  }

  private def sessionized(events: List[Event]) = {
    import spark.implicits._
    Sessionize.withSessionIds(events.toDF())
      .select("event_id", "user_id", "ts", "session_start", "session_seq", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3), r.getLong(4), r.getString(5)))
  }

  property("session ids are never null and always <user>-<seq>") = Prop.forAll(genEvents) { evs =>
    sessionized(evs).forall { case (_, u, _, _, seq, sid) => sid == s"$u-$seq" }
  }

  property("gap > 30min starts a session; <= 30min never does") = Prop.forAll(genEvents) { evs =>
    sessionized(evs).groupBy(_._2).forall { case (_, rows) =>
      val byTime = rows.sortBy(r => (r._3.getTime, r._1))
      byTime.zip(byTime.drop(1)).forall { case (prev, cur) =>
        val gapSec = (cur._3.getTime - prev._3.getTime) / 1000L
        if (gapSec > 1800L) cur._4 == 1L else cur._4 == 0L
      } && byTime.head._4 == 1L
    }
  }

  property("session_seq counts session starts cumulatively") = Prop.forAll(genEvents) { evs =>
    sessionized(evs).groupBy(_._2).forall { case (_, rows) =>
      val byTime = rows.sortBy(r => (r._3.getTime, r._1))
      byTime.map(_._4).scanLeft(0L)(_ + _).tail.sameElements(byTime.map(_._5))
    }
  }

  property("streaming single-batch equals batch window formulation") = Prop.forAll(genEvents) { evs =>
    import spark.implicits._
    val batch = sessionized(evs).map(r => r._1 -> r._6).toMap
    val streamed = StreamingSessionizer.sessionize(evs.toDS())
      .collect().map(e => e.event_id -> e.session_id).toMap
    batch == streamed
  }

  property("saltedJoin equals the plain join on random histories") = Prop.forAll(genEvents) { evs =>
    import org.apache.spark.sql.functions.{col, count, lit}
    import spark.implicits._
    val fact = evs.toDF().select("event_id", "user_id")
    val dim = evs.toDF().groupBy(col("user_id")).agg(count(lit(1)).as("user_total"))
    val plain = fact.join(dim, "user_id")
      .select("event_id", "user_total")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val salted = graft.ops.Skew.saltedJoin(fact, dim, "user_id", "event_id", buckets = 4)
      .select("event_id", "user_total")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    plain.sameElements(salted)
  }

  property("last_purchase_value is the most recent purchase's value") = Prop.forAll(genEvents) { evs =>
    import spark.implicits._
    val got = graft.session.StateOps.carryForwardLastPurchase(evs.toDF())
      .select("event_id", "last_purchase_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    evs.groupBy(_.user_id).forall { case (_, uevs) =>
      val byTime = uevs.sortBy(e => (e.ts.getTime, e.event_id))
      byTime.zipWithIndex.forall { case (e, i) =>
        val expected = byTime.take(i + 1).filter(_.event_type == "purchase").lastOption.map(_.value)
        got(e.event_id) == expected
      }
    }
  }
}
