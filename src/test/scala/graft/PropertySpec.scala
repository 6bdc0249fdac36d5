package graft

import graft.operators.CoreOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties over randomly generated event sets (SURVEY §5). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val eventsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    ms <- Gen.listOfN(n, Gen.choose(0L, 50000L))
  } yield ms.zipWithIndex.map { case (m, i) => (i.toLong, m) }

  test("property: tumbling-window counts always sum to the input row count") {
    check(Prop.forAll(eventsGen) { rows =>
      val df = rows.toDF("event_id", "ms").withColumn("ts", timestamp_millis(col("ms")))
      val total = CoreOps.tumblingCount(df, "ts", "3 seconds")
        .agg(sum("cnt")).as[Long].head()
      total == rows.size
    })
  }

  test("property: session count per key equals 1 + number of gaps >= gap") {
    val gapMs = 5000L
    check(Prop.forAll(eventsGen) { rows =>
      val df = rows.toDF("event_id", "ms")
        .withColumn("ts", timestamp_millis(col("ms")))
        .withColumn("user_id", lit(1L))
      val sessions = CoreOps.sessionSummary(df, "user_id", "ts", "5 seconds").count()
      val sorted = rows.map(_._2).sorted
      val expected = 1 + sorted.zip(sorted.tail).count { case (a, b) => b - a >= gapMs }
      sessions == expected
    })
  }

  test("property: window join size = sum over (key, bucket) of |L| * |R|") {
    val pairGen = for {
      l <- eventsGen; r <- eventsGen
      keys <- Gen.listOfN(l.size max r.size, Gen.choose(1L, 4L))
    } yield (l.zip(keys).map { case ((id, ms), k) => (id, ms, k) },
             r.zip(keys.reverse).map { case ((id, ms), k) => (id, ms, k) })
    check(Prop.forAll(pairGen) { case (lRows, rRows) =>
      def df(rows: List[(Long, Long, Long)]) = rows.toDF("event_id", "ms", "user_id")
        .withColumn("ts", timestamp_millis(col("ms")))
      val bucket = (ms: Long) => ms - ms % 10000
      val lCnt = lRows.groupBy(e => (e._3, bucket(e._2))).view.mapValues(_.size)
      val rCnt = rRows.groupBy(e => (e._3, bucket(e._2))).view.mapValues(_.size)
      val expected = lCnt.map { case (k, n) => n.toLong * rCnt.getOrElse(k, 0) }.sum
      CoreOps.windowJoin(df(lRows), df(rRows), "user_id", "ts", "10 seconds")
        .count() == expected
    })
  }

  test("property: salted running sum equals the plain running sum (incl. ties, hot keys)") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        ms <- Gen.choose(0L, 20000L) // narrow range → frequent equal-ts ties
        k <- Gen.oneOf(1L, 1L, 1L, 2L) // key 1 is hot (75% of rows)
        v <- Gen.choose(0, 10000)
      } yield (ms, k, v / 100.0))
    } yield rows.zipWithIndex.map { case ((m, k, v), i) => (i.toLong, m, k, v) }
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("event_id", "ms", "user_id", "value")
        .withColumn("ts", timestamp_millis(col("ms")))
      def result(d: org.apache.spark.sql.DataFrame) =
        d.select("event_id", "run").as[(Long, Double)].collect().toMap
      val plain = result(CoreOps.runningSum(df, "user_id", "ts", "event_id", "value", "run"))
      val salted = result(CoreOps.runningSumSalted(df, "user_id", "ts", "event_id", "value", "run", 4))
      plain == salted
    })
  }

  test("property: asofJoin equals the brute-force latest-at-or-before match") {
    // keys 0..2, coarse timestamps so equal-ts collisions actually occur;
    // right side made unique per (key, ts) as the operator requires
    val sideGen: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 2L); ms <- Gen.choose(0L, 20L)
      } yield (k, ms * 1000))
    } yield rows.zipWithIndex.map { case ((k, ms), i) => (k, ms, i.toLong) }
    check(Prop.forAll(sideGen, sideGen) { (lRows, rRowsRaw) =>
      val rRows = rRowsRaw.groupBy(r => (r._1, r._2)).map { case ((k, ms), g) =>
        (k, ms, g.map(_._3).max) }.toList // unique (key, ts), deterministic tie
      val left = lRows.toDF("k", "ms", "lid")
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      val right = rRows.toDF("k", "r_ms", "rid")
        .withColumn("ts", timestamp_millis(col("r_ms")))
      val got = CoreOps.asofJoin(left, right, "k", "ts", Seq("r_ms", "rid"))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      val expected = lRows.map { case (k, ms, lid) =>
        val cand = rRows.filter(r => r._1 == k && r._2 <= ms)
        lid -> (if (cand.isEmpty) None
                else Some(cand.maxBy(r => (r._2, r._3))._3))
      }.toMap
      got == expected
    })
  }

  test("property: split partitions are disjoint and exhaustive") {
    check(Prop.forAll(eventsGen) { rows =>
      val df = rows.toDF("event_id", "ms")
      val (a, b) = CoreOps.splitBy(df, col("ms") % 2 === 0)
      a.count() + b.count() == rows.size
    })
  }
}
