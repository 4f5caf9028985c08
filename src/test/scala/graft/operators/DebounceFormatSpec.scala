package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x258 (telemetry debounce) and x259 (multi-format round-trip). */
class DebounceFormatSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("x258 debounce flags match a driver-side sequential replay") {
    val flagged = Sessionize
      .debouncedEvents(spark, sf, Sessionize.DebounceGapSeconds)
      .select($"event_id", $"user_id", $"event_type", $"ts_s", $"kept")
      .as[(Long, Long, String, Long, Boolean)].collect()
    // sequential replay per (user, type) key — the definitionally-correct
    // single-threaded debounce the distributed lag window must equal
    val expected = flagged
      .groupBy(r => (r._2, r._3))
      .iterator.flatMap { case (_, rows) =>
        var prev = Option.empty[Long]
        rows.sortBy(r => (r._4, r._1)).iterator.map { r =>
          val kept = prev.forall(p => r._4 - p >= Sessionize.DebounceGapSeconds)
          prev = Some(r._4)
          r._1 -> kept
        }
      }.toMap
    assert(flagged.nonEmpty)
    flagged.foreach { r => assert(r._5 == expected(r._1), s"event ${r._1}") }
    // the fixture actually exercises both branches
    assert(flagged.exists(_._5) && flagged.exists(!_._5),
      "fixture must contain kept AND dropped events")
  }

  test("x258 panel reconciles with the per-event flags") {
    val flagged = Sessionize
      .debouncedEvents(spark, sf, Sessionize.DebounceGapSeconds)
    val fromFlags = flagged.groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"))
      .as[(String, Long, Long)].collect().toSet
    val panel = Sessionize.eventDebounce(spark, sf)
      .select($"event_type", $"n_events", $"n_kept")
      .as[(String, Long, Long)].collect().toSet
    assert(panel == fromFlags && panel.nonEmpty)
    // debounce never keeps more than it saw, and always keeps ≥ 1 per
    // nonempty key-group's type
    Sessionize.eventDebounce(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") >= 1L &&
        r.getAs[Long]("n_kept") <= r.getAs[Long]("n_events"))
    }
  }

  test("x269 normalized dedup collapses exactly the mutated twins") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val got = Dedup.normalizedDedup(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val twins = rows.count(_._1 % Dedup.NormTwinMod == 0).toLong
      val (_, nDocs, nRaw, nNorm, extra) = got(src)
      assert(nDocs == rows.length + twins, src)
      // raw hashing sees every twin as new content (corpus has no raw
      // dups); normalization folds each twin back onto its original
      assert(nRaw == rows.length + twins, src)
      assert(nNorm == rows.length.toLong, src)
      assert(extra == twins && twins > 0, src)
    }
  }

  test("x259 all four format panels are identical and equal the direct aggregate") {
    val rt = FormatStage.roundTrip(spark, sf)
    val perFormat = FormatStage.Formats.map { f =>
      rt.filter($"format" === f)
        .select($"event_type", $"n_events", $"sum_value_cents", $"n_users",
          $"min_ts_s", $"max_ts_s")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    }
    assert(perFormat.head.nonEmpty)
    perFormat.tail.foreach(p => assert(p == perFormat.head,
      "a staged format diverged from the parquet panel"))
    val raw = graft.Tables.events(spark, sf)
    val direct = raw.select($"event_type", $"user_id",
        Sessionize.tsSeconds(raw).as("ts_s"),
        Relational.cents($"value").as("value_cents"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value_cents").as("sum_value_cents"),
        countDistinct($"user_id").as("n_users"),
        min($"ts_s").as("min_ts_s"), max($"ts_s").as("max_ts_s"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(perFormat.head == direct)
  }
}
