package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.extensions.EventWindows
import graft.functions.MisraGriesAggregator

/** Misra-Gries guarantees under arbitrary partitioning/merge trees, and
  * exact-value fixtures for linear calendar interpolation (v14). */
object SketchInterpSpec extends Properties("graft.sketch_interp") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  // ---- Misra-Gries: pure aggregator semantics, no Spark needed ----

  private val streamGen: Gen[List[Long]] = for {
    n <- Gen.choose(50, 400)
    // zipf-ish: small keys dominate, so true heavy hitters exist often
    xs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const(1L), 3 -> Gen.const(2L),
      2 -> Gen.choose(3L, 6L), 1 -> Gen.choose(7L, 40L)))
  } yield xs

  /** Fold a stream through reduce with random chunking, then merge the
    * chunk sketches in left-fold order — the exact shape Spark's
    * partial+final aggregation executes, for ANY partition count. */
  private def sketchOf(agg: MisraGriesAggregator, stream: List[Long],
      chunks: Int): Map[Long, Long] = {
    val parts = stream.grouped(math.max(1, stream.size / chunks)).toList
    parts.map(_.foldLeft(agg.zero)((m, v) => agg.reduce(m, v)))
      .foldLeft(agg.zero)(agg.merge)
  }

  property("MG: underestimates, bounded error, size <= k, HH captured") =
    forAll(streamGen, Gen.choose(1, 8), Gen.choose(2, 12)) {
      (stream, chunks, k) =>
        val agg = new MisraGriesAggregator(k)
        val est = sketchOf(agg, stream, chunks)
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
        val n = stream.size.toLong
        val sizeOk = est.size <= k
        val underOk = est.forall { case (i, c) => c <= exact(i) }
        val errOk = est.forall { case (i, c) =>
          (exact(i) - c) * (k + 1) <= n
        }
        val hhOk = exact.forall { case (i, c) =>
          c * (k + 1) <= n || est.contains(i)
        }
        sizeOk && underOk && errOk && hhOk
    }

  property("MG: partition layout never breaks the guarantees in Spark") =
    forAll(Gen.choose(1, 6)) { parts =>
      val agg = udaf(new MisraGriesAggregator(4))
      // 120 rows: key 0 on every third row (40 rows, > n/(k+1)=24)
      val df = spark.range(120)
        .select(when(col("id") % 3 === 0, 0L)
          .otherwise(pmod(col("id"), lit(17))).as("key"))
        .repartition(parts)
      val sketch = df.agg(agg(col("key"))).as[Map[Long, Long]].head()
      sketch.size <= 4 && sketch.contains(0L) && sketch(0L) <= 40L
    }

  // ---- interpolateDaily: exact fixture + layout invariance ----

  private def ev(userId: Long, day: Int, value: Double) =
    (day.toLong, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), userId,
      "e", value, "{}")

  private def interp(rows: Seq[(Long, Timestamp, Long, String, Double, String)],
      parts: Int): Seq[(Long, String, Boolean, Double)] = {
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").repartition(parts)
    EventWindows.interpolateDaily(df)
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd"),
        col("observed"), col("v_interp"))
      .as[(Long, String, Boolean, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
  }

  property("interpolation: gaps take the exact linear value") = {
    // user 7: days 1, 4, 6 observed at 10, 40, 20 — gaps 2,3 ride the
    // 10→40 segment (slope 10/day), gap 5 rides 40→20 (slope -10/day)
    val rows = Seq(ev(7, 1, 10.0), ev(7, 4, 40.0), ev(7, 6, 20.0))
    val out = interp(rows, 2)
    val expected = Seq(
      (7L, "2024-01-01", true, 10.0), (7L, "2024-01-02", false, 20.0),
      (7L, "2024-01-03", false, 30.0), (7L, "2024-01-04", true, 40.0),
      (7L, "2024-01-05", false, 30.0), (7L, "2024-01-06", true, 20.0))
    out == expected
  }

  property("interpolation: observed days average, single-day user intact") = {
    // two events same day average decimal-exactly; a one-day user
    // yields exactly one observed row (no gap machinery)
    val rows = Seq(ev(1, 2, 3.0), ev(1, 2, 4.0), ev(9, 5, 1.25))
    val out = interp(rows, 3)
    out == Seq((1L, "2024-01-02", true, 3.5), (9L, "2024-01-05", true, 1.25))
  }

  property("interpolation: partition layout invariant") =
    forAll(Gen.choose(1, 6), Gen.choose(1, 6)) { (p1, p2) =>
      val rows = Seq(ev(3, 1, 5.0), ev(3, 5, 25.0), ev(3, 9, 5.0),
        ev(4, 2, 8.0), ev(4, 3, 0.0))
      interp(rows, p1) == interp(rows, p2)
    }
}
