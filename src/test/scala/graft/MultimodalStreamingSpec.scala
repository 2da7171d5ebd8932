package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.EventsStream

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val media = Multimodal.withFakeMedia(Tables.load(spark, sf, "documents"))

  test("encode→decode roundtrip preserves metadata and payload size") {
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == 500)
    meta.foreach { m =>
      assert(m.format == "GRFT")
      assert(m.width == 16 + (m.doc_id % 64) && m.height == 16 + (m.doc_id % 48))
      assert(m.n_channels >= 1 && m.n_channels <= 3)
      assert(m.n_bytes > 0)
    }
  }

  test("metadata n_bytes equals source text byte length") {
    val meta = Multimodal.decodeMeta(media).toDF()
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("expected"))
    val joined = meta.join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("expected"))
    assert(joined.count() == 0)
  }

  test("byte histogram features are normalized and partition-parallel") {
    val feats = Multimodal.byteHistogram(media, bins = 8).collect()
    assert(feats.length == 500)
    feats.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0) < 1e-9)
    }
  }

  test("resize re-encodes to the requested dimensions, chains with decode") {
    val resized = Multimodal.resize(media, newW = 8, newH = 8)
    val meta = Multimodal.decodeMeta(resized).collect()
    assert(meta.length == 500)
    meta.foreach { m =>
      assert(m.width == 8 && m.height == 8)
      assert(m.n_bytes == 64, s"8x8 payload expected, got ${m.n_bytes}")
      assert(m.n_channels >= 1 && m.n_channels <= 3) // carried through
    }
    // deterministic: same input → same bytes
    val a = resized.collect().map(r => r.doc_id -> r.media.toSeq).toMap
    val b = Multimodal.resize(media, 8, 8).collect().map(r => r.doc_id -> r.media.toSeq).toMap
    assert(a == b)
  }

  test("real PNGs decode through imageio and resize losslessly") {
    import spark.implicits._
    import Multimodal.{MediaCodec, MediaRow}
    // author real PNGs in-memory: a deterministic RGB gradient per doc
    def makePng(id: Long, w: Int, h: Int): Array[Byte] = {
      val samples = new Array[Byte](w * h * 3)
      var i = 0
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          samples(i) = ((x * 7 + id) % 256).toByte
          samples(i + 1) = ((y * 11 + id) % 256).toByte
          samples(i + 2) = ((x + y) % 256).toByte
          i += 3
        }
      }
      MediaCodec.encodePng(samples, w, h, 3)
    }
    assert(MediaCodec.detectFormat(makePng(0, 4, 4)) == "png")
    val pngs = (0L until 20L).map(id => MediaRow(id, makePng(id, 12 + id.toInt % 5, 10)))
      .toDS().repartition(4)
    val meta = Multimodal.decodeMeta(pngs).collect().sortBy(_.doc_id)
    assert(meta.length == 20)
    meta.foreach { m =>
      assert(m.format == "png")
      assert(m.width == 12 + m.doc_id % 5 && m.height == 10 && m.n_channels == 3)
      assert(m.n_bytes == m.width.toLong * m.height * 3)
    }
    // decode returns the exact samples that were encoded (PNG is lossless)
    val (m0, samples0) = MediaCodec.decode(3L, makePng(3L, 15, 10))
    assert(samples0.length == 15 * 10 * 3)
    assert(samples0(0) == ((0 * 7 + 3) % 256).toByte)
    assert(m0.width == 15)
    // resize: output is an 8x8 3-channel PNG; roundtrip decodes to 8x8
    val resized = Multimodal.resize(pngs, newW = 8, newH = 8)
    val rmeta = Multimodal.decodeMeta(resized).collect()
    assert(rmeta.length == 20)
    rmeta.foreach { m =>
      assert(m.format == "png" && m.width == 8 && m.height == 8 && m.n_channels == 3)
    }
    // deterministic bytes across runs
    val a = resized.collect().map(r => r.doc_id -> r.media.toSeq).toMap
    val b = Multimodal.resize(pngs, 8, 8).collect().map(r => r.doc_id -> r.media.toSeq).toMap
    assert(a == b)
    // histograms also run on real images
    val feats = Multimodal.byteHistogram(pngs, bins = 8).collect()
    assert(feats.length == 20)
  }

  test("gray+alpha (2-band) and 16-bit PNGs decode and re-encode correctly") {
    import spark.implicits._
    import Multimodal.{MediaCodec, MediaRow}
    // 2-band gray+alpha roundtrip: encode → decode preserves both bands
    val ga = Array.tabulate(6 * 4 * 2)(i => ((i * 13) % 256).toByte)
    val png2 = MediaCodec.encodePng(ga, 6, 4, 2)
    val (m2, back2) = MediaCodec.decode(7L, png2)
    assert(m2.n_channels == 2 && m2.width == 6 && m2.height == 4)
    assert(back2.toSeq == ga.toSeq, "gray+alpha samples must roundtrip losslessly")
    // resize keeps the 2-band layout
    val resized = Multimodal.resize(
      Seq(MediaRow(7L, png2)).toDS(), newW = 3, newH = 2).collect().head
    val (mr, _) = MediaCodec.decode(7L, resized.media)
    assert(mr.n_channels == 2 && mr.width == 3 && mr.height == 2)

    // 16-bit grayscale: samples downscale by >>8, not low-byte truncation
    val img16 = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    (0 until 4).foreach(y => (0 until 4).foreach { x =>
      img16.getRaster.setSample(x, y, 0, (x + y * 4) * 4096) // 0, 4096, …
    })
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img16, "png", out)
    val (m16, s16) = MediaCodec.decode(8L, out.toByteArray)
    assert(m16.n_channels == 1)
    val expected = (0 until 16).map(i => ((i * 4096) >> 8).toByte)
    assert(s16.toSeq == expected,
      s"16-bit samples must shift high bits: ${s16.toSeq} vs $expected")
  }

  test("WAV roundtrip: encode → magic dispatch → chunk walk → same samples") {
    import Multimodal.MediaCodec
    val samples = Array.tabulate(96)(i => ((i * 37 - 1200) % 1800).toShort)
    val wav = MediaCodec.encodeWav(samples, sampleRate = 8000)
    assert(MediaCodec.detectFormat(wav) == "wav")
    val (m, got) = MediaCodec.decodeWav(wav)
    assert(m == MediaCodec.WavMeta(1, 8000, 16, 96))
    assert(got.toSeq == samples.toSeq)
    // through the generic decode dispatch: payload = raw PCM data bytes
    val (meta, payload) = MediaCodec.decode(7L, wav)
    assert(meta.format == "wav" && meta.width == 96 && meta.height == 8000 &&
      meta.n_channels == 1 && meta.n_bytes == 192L)
    assert(payload.toSeq == wav.takeRight(192).toSeq)
  }

  test("WAV decode skips unknown chunks (word-aligned) and handles stereo/8-bit") {
    import Multimodal.MediaCodec
    // hand-build: RIFF [LIST(odd size → pad)] fmt data — the in-the-wild
    // layout where metadata precedes fmt
    val samples = Array[Short](100, -100, 200, -200) // 2 frames of stereo
    val canonical = MediaCodec.encodeWav(samples, 44100, channels = 2)
    val fmtAndData = canonical.drop(12) // reuse the canonical chunks
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ "abc".getBytes("US-ASCII") ++ Array[Byte](0)
    val body = list ++ fmtAndData
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WAVE".getBytes("US-ASCII")).put(body)
    val (m, got) = MediaCodec.decodeWav(bb.array())
    assert(m == MediaCodec.WavMeta(2, 44100, 16, 2))
    assert(got.toSeq == samples.toSeq)
    // 8-bit path: unsigned by spec, centered to signed on decode
    val eight = Array[Byte](
      'R', 'I', 'F', 'F', 33, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 1, 0, 0x40, 0x1f, 0, 0, 0x40, 0x1f, 0, 0, 1, 0, 8, 0,
      'd', 'a', 't', 'a', 3, 0, 0, 0, 0, 128.toByte, 255.toByte)
    val (m8, s8) = MediaCodec.decodeWav(eight)
    assert(m8 == MediaCodec.WavMeta(1, 8000, 8, 3))
    assert(s8.toSeq == Seq[Short](-128, 0, 127))
  }

  test("malformed WAV blobs are rejected with the defect named") {
    import Multimodal.MediaCodec
    val good = MediaCodec.encodeWav(Array[Short](1, 2, 3, 4), 8000)
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](MediaCodec.decodeWav(bytes))
        .getMessage
    assert(msg(good.take(8)).contains("12"))                 // truncated header
    assert(msg("RIFX".getBytes ++ good.drop(4)).contains("RIFF magic"))
    assert(msg(good.take(8) ++ "WAVX".getBytes ++ good.drop(12))
      .contains("WAVE"))
    assert(msg(good.take(40) ++ Array[Byte](99, 0, 0, 0) ++ good.drop(44))
      .contains("claims"))                                   // data longer than blob
    val nonPcm = good.clone(); nonPcm(20) = 3                // IEEE float tag
    assert(msg(nonPcm).contains("PCM"))
    val noFmt = good.take(12) ++ good.drop(36)               // data with no fmt
    assert(msg(noFmt).contains("fmt"))
    val bits12 = good.clone(); bits12(34) = 12
    assert(msg(bits12).contains("12 bits"))
  }

  test("wavFrameFeatures decodes real RIFF bytes and matches a scalar replay") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents").limit(40)
    val wavs = Multimodal.withFakeWav(docs)
    val feats = Multimodal.wavFrameFeatures(wavs, frameLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(feats.size == 40 * 8)
    // scalar replay straight from md5 — no WAV container involved
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.select(col("doc_id")).as[Long].collect().foreach { id =>
      (0 until 8).foreach { f =>
        val dg = md.digest(s"$id:$f".getBytes("UTF-8"))
        val nibs = dg.flatMap(b => Seq((b & 0xff) >> 4, b & 0xf))
        val s = nibs.map(n => (n - 8) * 256 + 128)
        val energy = s.map(x => x.toLong * x).sum
        val zcr = s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong
        assert(feats((id, f.toLong)) == (energy, zcr), s"doc $id frame $f")
      }
    }
  }

  test("frame sampling emits every stride-th chunk") {
    val frames = Multimodal.sampleFrames(media, frameSize = 64, stride = 4)
    val byDoc = frames.groupBy(col("doc_id")).count().collect()
    assert(byDoc.nonEmpty)
    // a doc with payload length L has ceil(L/64) chunks, every 4th kept
    val one = frames.filter(col("doc_id") === 0).collect()
    assert(one.forall(_.getInt(1) % 4 == 0))
  }
}

class AsofJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("backward as-of join picks latest at-or-before right row per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "ord", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("k", "ord", "v")
    val got = graft.operators.AsofJoin
      .backward(left, right, "k", "ord", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.get(3)))).toSet
    assert(got == Set(
      (1L, 10L, "a", Some(100.0)), // inclusive: right at same ord matches
      (1L, 20L, "b", Some(150.0)), // latest of the two prior rights
      (1L, 5L, "c", None),         // nothing at-or-before
      (2L, 7L, "d", None)))        // key with no right rows at all
  }

  test("forward as-of join picks earliest at-or-after right row per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "ord", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("k", "ord", "v")
    val got = graft.operators.AsofJoin
      .forward(left, right, "k", "ord", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.get(3)))).toSet
    assert(got == Set(
      (1L, 10L, "a", Some(100.0)), // inclusive: right at same ord matches
      (1L, 20L, "b", None),        // nothing at-or-after
      (1L, 5L, "c", Some(100.0)),  // earliest of the two following rights
      (2L, 7L, "d", None)))        // key with no right rows at all
  }

  test("null keys never match (SQL join semantics)") {
    val left = Seq((Some(1L), 10L), (None: Option[Long], 10L)).toDF("k", "ord")
    val right = Seq((Some(1L), 5L, 1.0), (None: Option[Long], 5L, 99.0))
      .toDF("k", "ord", "v")
    val got = graft.operators.AsofJoin
      .backward(left, right, "k", "ord", Seq("v"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(2)))).toSet
    // the null-key left row must NOT receive the null-key right payload
    assert(got == Set((Some(1L), Some(1.0)), (None, None)))
  }

  test("multi-column payload comes from one right row, nulls preserved") {
    val left = Seq((1L, 10L)).toDF("k", "ord")
    val right = Seq((1L, 3L, Some("x"), 1.0), (1L, 8L, None: Option[String], 2.0))
      .toDF("k", "ord", "s", "v")
    val got = graft.operators.AsofJoin
      .backward(left, right, "k", "ord", Seq("s", "v")).collect()(0)
    // latest right row (ord=8) wins for BOTH columns — its null s must not
    // fall back to the earlier row's "x"
    assert(got.isNullAt(2) && got.getDouble(3) == 2.0)
  }
}

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bucketed point-in-interval equals the naive non-equi join") {
    val points = (0L until 500L by 7L).map(p => (p, s"p$p")).toDF("pt", "tag")
    val intervals = Seq(
      (0L, 10L), (5L, 250L), (100L, 101L), (240L, 240L), // empty: dropped
      (490L, 600L), (3L, 4L))
      .toDF("start", "end").withColumn("iid", monotonically_increasing_id())
    Seq(1L, 16L, 1000L).foreach { width => // narrow, mid, all-in-one-bucket
      val got = graft.operators.RangeJoin
        .pointInInterval(points, intervals, "pt", "start", "end", width)
        .select("pt", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = points.join(intervals,
          col("pt") >= col("start") && col("pt") < col("end"))
        .select("pt", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"width=$width: ${got.size} vs ${want.size}")
    }
  }

  test("range join plan is an equi join, not nested-loop or cartesian") {
    val points = (0L until 100L).map(p => (p, p)).toDF("pt", "x")
    val intervals = Seq((0L, 50L), (25L, 75L)).toDF("start", "end")
    val p = graft.operators.RangeJoin
      .pointInInterval(points, intervals, "pt", "start", "end", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketed interval overlap equals the naive non-equi join, no dups") {
    // deterministic mixed-length closed intervals, including touching
    // endpoints, bucket-boundary-straddlers, points (len 0), and a
    // degenerate end<start row that must be dropped
    val left = (0L until 400L by 11L).map(a => (a, a + a % 37L))
      .toDF("ls", "le").withColumn("lid", monotonically_increasing_id())
    val right = (Seq((5L, 5L), (100L, 99L)) ++ // point; inverted: dropped
        (0L until 400L by 23L).map(b => (b, b + b % 53L)))
      .toDF("rs", "re").withColumn("rid", monotonically_increasing_id())
    Seq(1L, 16L, 1000L).foreach { width =>
      val got = graft.operators.RangeJoin
        .intervalOverlap(left, right, "ls", "le", "rs", "re", width)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = left.join(right,
          col("ls") <= col("re") && col("rs") <= col("le") && col("re") >= col("rs"))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.length == got.toSet.size, s"width=$width: duplicate pairs")
      assert(got.toSet == want, s"width=$width: ${got.length} vs ${want.size}")
    }
  }

  test("interval overlap plan is an equi join, not nested-loop or cartesian") {
    val left = (0L until 100L).map(a => (a, a + 5L)).toDF("ls", "le")
    val right = Seq((0L, 50L), (25L, 75L)).toDF("rs", "re")
    val p = graft.operators.RangeJoin
      .intervalOverlap(left, right, "ls", "le", "rs", "re", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming hourly counts match the batch answer") {
    // Complete mode: a finite file feed never advances the watermark past
    // the last window, so Append would hold the tail windows back forever
    val stream = EventsStream.hourlyCounts(EventsStream.readEvents(spark, sf))
    val got = EventsStream.runToMemory(stream, "hourly_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .select("hour", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == batch)
  }

  test("streaming gap sessionization matches batch sessions (closed ones)") {
    import org.apache.spark.sql.expressions.Window
    val ds = EventsStream.sessionize(EventsStream.readEvents(spark, sf))
    val got = EventsStream.runToMemory(ds.toDF(), "sessionize_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5)))
      .toMap

    // batch twin (double sum — the streaming state accumulates raw doubles)
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val batch = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_trunc("second", min(col("ts"))).as("session_start"),
        date_trunc("second", max(col("ts"))).as("session_end"),
        sum(col("value")).as("session_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5)))
      .toMap

    // processAllAvailable runs a final trigger after the watermark advances,
    // closing idle sessions via the event-time timeout. A user's LAST
    // session survives only if its timeout (end + gap) is still ahead of
    // the final watermark (max event time − 10 min) — compute exactly
    // which ones those are and expect everything else.
    val wmMs = Tables.load(spark, sf, "events")
      .agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime - 10 * 60 * 1000L
    val lastPerUser = batch.keys.groupBy(_._1).map { case (u, ks) => u -> ks.map(_._2).max }
    val mayStayOpen = batch.filter { case ((u, sid), (_, _, end, _)) =>
      sid == lastPerUser(u) && end.getTime + 30 * 60 * 1000L >= wmMs
    }.keySet
    val expected = batch.filter { case (k, _) => !mayStayOpen(k) }
    assert(expected.keySet.subsetOf(got.keySet) && got.keySet.subsetOf(batch.keySet),
      s"session keys differ: got=${got.size} expected>=${expected.size} batch=${batch.size}")
    got.foreach { case (k, (gn, gstart, gend, gv)) =>
      val (n, start, end, v) = batch(k)
      assert(gn == n && gstart == start && gend == end, s"session $k mismatch")
      assert(math.abs(gv - v) < 1e-6, s"session $k value: $gv vs $v")
    }
  }

  test("stream-stream interval join matches the batch attribution join") {
    val joined = EventsStream.clickAttribution(
      EventsStream.readEvents(spark, sf), gapMinutes = 30)
    val got = EventsStream.runToMemory(joined, "attribution_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val e = Tables.load(spark, sf, "events")
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val batch = c.join(p,
        col("cu") === col("pu") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == batch, s"stream ${got.size} vs batch ${batch.size}")
  }

  test("streaming dedup drops duplicate keys, keeps state watermark-bounded") {
    val deduped = EventsStream.dedupStream(
      EventsStream.readEvents(spark, sf), Seq("user_id", "event_type"))
    val got = EventsStream.runToMemory(deduped.toDF(), "dedup_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    // one row per (user, type) — the batch distinct count
    val batchDistinct = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(got.count() == batchDistinct)
    assert(got.groupBy(col("user_id"), col("event_type")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("streaming transition pairs match the batch lead() pairs") {
    import org.apache.spark.sql.expressions.Window
    // horizon >> the data's time span so no chain restarts in the spec
    // feed — the equivalence is exact, not gap-truncated
    val stream = EventsStream.transitionPairsStream(
      EventsStream.readEvents(spark, sf), idleMinutes = 60 * 24 * 365)
    val got = EventsStream.runToMemory(stream, "trans_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val batch = Tables.load(spark, sf, "events")
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("user_id"), col("event_type"), col("nxt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == batch)
  }

  test("streaming 3-step path triples match the batch double-lead triples") {
    import org.apache.spark.sql.expressions.Window
    // horizon >> the data's time span so no chain restarts in the spec
    // feed — the equivalence is exact, not gap-truncated
    val stream = EventsStream.pathTriplesStream(
      EventsStream.readEvents(spark, sf), idleMinutes = 60 * 24 * 365)
    val got = EventsStream.runToMemory(stream, "paths_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val batch = Tables.load(spark, sf, "events")
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(col("user_id"), col("event_type"), col("e2"), col("e3"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == batch)
  }

  test("streaming latest-wins upsert view matches the batch x6 compaction") {
    val stream = EventsStream.latestWinsStream(
      EventsStream.readEvents(spark, sf))
    // Update mode appends one refreshed row per (key, microbatch); the
    // CURRENT view is each key's last emission = the max-n_versions row
    val got = EventsStream.runToMemory(stream, "latest_test",
      org.apache.spark.sql.streaming.OutputMode.Update())
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5),
          r.getString(6)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    val batch = Tables.load(spark, sf, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_versions"),
        max(struct(col("ts"), col("event_id"), col("value"), col("props")))
          .as("w"))
      .select(col("user_id"), col("event_type"), col("n_versions"),
        col("w.ts"), col("w.event_id"), col("w.value"), col("w.props"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5),
          r.getString(6)))
      .toMap
    assert(got == batch)
  }

  test("durable parquet sink: exactly-once commit log, same rows as batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val deduped = EventsStream.dedupStream(
      EventsStream.readEvents(spark, sf), Seq("user_id", "event_type"))
    EventsStream.runToParquet(deduped.toDF(), s"$base/out", s"$base/ckpt")
    // the file sink's transaction log is what makes restarts exactly-once
    assert(new java.io.File(s"$base/out/_spark_metadata").exists(),
      "file sink must write its _spark_metadata commit log")
    val back = spark.read.parquet(s"$base/out")
    val batchDistinct = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(back.count() == batchDistinct)
  }

  test("stateful user totals match batch aggregation") {
    val ds = EventsStream.userTotals(EventsStream.readEvents(spark, sf))
    val got = EventsStream.runToMemory(ds.toDF(), "user_totals_test")
      .groupBy(col("user_id"))
      // Update mode re-emits per batch; the last emission per user is the
      // final state — with one input batch there is exactly one emission
      .agg(max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val batch = Tables.load(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == batch)
  }

  test("userTotals idle TTL: idle key evicted silently, live keys unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    def drive(ttl: Option[Long], name: String): Seq[(Long, Long, Double)] = {
      val in = MemoryStream[(Long, Double, java.sql.Timestamp)]
      val events = in.toDF().toDF("user_id", "value", "ts")
      val q = EventsStream.userTotals(events, ttl).toDF()
        .writeStream.outputMode("update").format("memory").queryName(name)
        .start()
      // batch 1: users 1 and 2 at 10:00 → both horizons land at 10:01
      in.addData((1L, 1.0, ts(0)), (2L, 1.0, ts(0)))
      q.processAllAvailable()
      // batch 2: only user 2, 30 min later → watermark advances to
      // 10:20 (10-min delay), past user 1's idle horizon → evicted
      in.addData((2L, 1.0, ts(30)))
      q.processAllAvailable()
      // batch 3: user 1 reappears; user 2 keeps accumulating
      in.addData((1L, 5.0, ts(31)), (2L, 1.0, ts(31)))
      q.processAllAvailable()
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    val ttl = drive(Some(60000L), "ttl_totals")
    // evicted key restarts from zero — and eviction emits NO tombstone
    assert(ttl.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet ==
      Set((1L, 1.0), (1L, 5.0)), s"user 1 must restart after eviction: $ttl")
    // the live key's emission SEQUENCE is exactly the NoTimeout path's
    val live = ttl.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet
    assert(live == Set((1L, 1.0), (2L, 2.0), (3L, 3.0)), s"user 2: $ttl")
    val off = drive(None, "nottl_totals")
    assert(off.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet == live,
      "a live key's outputs must be identical with and without the TTL")
    // without the TTL the idle key keeps its state across the gap
    assert(off.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet ==
      Set((1L, 1.0), (2L, 6.0)), s"NoTimeout keeps exact totals: $off")
  }

  test("streaming funnel matches the batch e9 stages") {
    val ds = EventsStream.funnelStream(EventsStream.readEvents(spark, sf))
    // one input batch → one emission per user, and the within-batch sort
    // makes the feed in-order, so the running funnel IS the batch funnel
    val got = EventsStream.runToMemory(ds.toDF(), "funnel_stream_test")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))))
      .toMap
    val batch = graft.queries.Events.queries("e9_funnel")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))))
      .toMap
    assert(got == batch)
  }

  test("streaming funnel: anchors chain across batches; late lower view ignored") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val q = EventsStream.funnelStream(
        in.toDF().toDF("user_id", "event_id", "event_type"))
      .toDF().writeStream.outputMode("update").format("memory")
      .queryName("funnel_chain_test").start()
    // batch 1: user 1 views (id 10), clicks BEFORE the view (id 5 —
    // must not count), user 2 views only
    in.addData((1L, 10L, "view"), (1L, 5L, "click"), (2L, 3L, "view"))
    q.processAllAvailable()
    // batch 2: user 1 clicks after the view and purchases; a LATE view
    // with a smaller id arrives and must NOT retro-lower the anchor
    in.addData((1L, 2L, "view"), (1L, 12L, "click"), (1L, 15L, "purchase"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_chain_test")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4))).toSeq
    // user 1 emissions: stage 1 after batch 1 (click id 5 < view id 10
    // does not chain), stage 3 after batch 2 with the ORIGINAL view
    // anchor 10 (the late id-2 view is ignored, the documented contract)
    assert(rows.contains((1L, Some(10L), None, None, 1)), rows.toString)
    assert(rows.contains((1L, Some(10L), Some(12L), Some(15L), 3)), rows.toString)
    assert(rows.contains((2L, Some(3L), None, None, 1)), rows.toString)
    assert(rows.count(_._1 == 1L) == 2, "one emission per touched batch")
  }

  test("streaming IVF drift matches the batch ivfDrift bit-for-bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cells = Seq((1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)))
      .toDF("centroid_id", "centroid") // 1..nlist, the lloydCentroids contract
    // batch 1 tracks the fitted distribution; batch 2 plants a drift on
    // cell 1 (members pulled off the x axis)
    val b1 = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.2, 0.7)), (3L, Seq(0.97, 0.02)))
    val b2 = Seq((4L, Seq(0.55, 0.5)), (5L, Seq(0.6, 0.45)))
    val in = MemoryStream[(Long, Seq[Double])]
    val q = EventsStream.ivfDriftStream(
        in.toDF().toDF("vec_id", "embedding"), cells)
      .toDF().writeStream.outputMode("update").format("memory")
      .queryName("ivf_drift_stream").start()
    def latest(): Map[Int, (Long, Double)] = spark.table("ivf_drift_stream")
      .groupBy(col("cell"))
      .agg(max(struct(col("n_new"), col("cos"))).as("s"))
      .select(col("cell"), col("s.n_new"), col("s.cos"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def batchDrift(rows: Seq[(Long, Seq[Double])]): Map[Int, (Long, Double)] =
      graft.operators.Similarity
        .ivfDrift(cells, rows.toDF("vec_id", "embedding"))
        .filter(col("n_new") > 0)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    in.addData(b1: _*)
    q.processAllAvailable()
    // every emission is the batch answer over the drop prefix seen so far
    assert(latest() == batchDrift(b1), "prefix after batch 1")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val got = latest()
    assert(got == batchDrift(b1 ++ b2),
      "final state must equal the batch ivfDrift over the whole drop, " +
        "double-for-double")
    // the planted drift is visible: cell 1's cosine dropped
    assert(got(1)._2 < batchDrift(b1)(1)._2,
      s"planted off-axis members must lower cell 1's drift cosine: $got")
  }

  test("streaming span excision equals the batch operator per arriving doc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val header = "all rights reserved contact the site admin team"
    // the base snapshot carries the boilerplate header; its span index
    // is the static side (built once, the d22 materialized index)
    val base = Seq((100L, s"$header plus some base only tail words"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.spanIndex(base, n = 8)
    // batch 1: one contaminated + one clean doc; batch 2: another
    // contaminated doc — batches must neither see nor affect each other
    val b1 = Seq((0L, s"$header alpha beta gamma"),
      (1L, "totally novel content nothing shared with the base at all"))
    val b2 = Seq((2L, s"$header delta epsilon"))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val q = EventsStream.spanExciseStream(
        in.toDF().toDF("doc_id", "text"), index, n = 8) { batch =>
      got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }
    def batchOp(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, String)] =
      graft.operators.Dedup.spanExciseAgainstIndex(
          rows.toDF("doc_id", "text"), index, n = 8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sortBy(_._1)
    in.addData(b1: _*)
    q.processAllAvailable()
    assert(got.sortBy(_._1).toSeq == batchOp(b1), "after batch 1")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // cumulative stream output ≡ the batch operator over the union —
    // the zero-state property (per-doc decisions ride the static index)
    assert(got.sortBy(_._1).toSeq == batchOp(b1 ++ b2),
      "cumulative stream output must equal batch over the whole arrival")
    // and the excision itself is right: headers gone, novel text intact
    val byId = got.map(r => r._1 -> r._4).toMap
    assert(byId(0L) == "alpha beta gamma" && byId(2L) == "delta epsilon")
    assert(byId(1L) ==
      "totally novel content nothing shared with the base at all")
  }

  test("composed excision stream: per-batch keep-one, cross-batch divergence pinned") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val header = "all rights reserved contact the site admin team"
    val passage = "n1 n2 n3 n4 n5 n6 n7 n8" // NEW: not in the base
    val base = Seq((100L, s"$header plus some base only tail words"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.spanIndexCounted(base, n = 8)
    // batch 1: two co-arriving copies of the new passage + one
    // header-contaminated doc; batch 2: a THIRD copy, alone
    val b1 = Seq(
      (0L, s"$passage first copy tail"),
      (1L, s"$passage second copy tail"),
      (2L, s"$header alpha beta"))
    val b2 = Seq((3L, s"$passage third copy tail"))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val q = EventsStream.spanExciseComposedStream(
        in.toDF().toDF("doc_id", "text"), index, n = 8) { batch =>
      got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }
    def batchOp(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, String)] =
      graft.operators.Dedup.spanExciseAgainstIndexKeepOne(
          rows.toDF("doc_id", "text"), index, n = 8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sortBy(_._1)
    in.addData(b1: _*)
    q.processAllAvailable()
    assert(got.sortBy(_._1).toSeq == batchOp(b1),
      "each microbatch must equal the batch operator over that batch")
    val byId1 = got.map(r => r._1 -> r._4).toMap
    // co-arriving copies excise down to the canonical (doc 0) copy;
    // the header (base-held) excises from everyone
    assert(byId1(0L) == s"$passage first copy tail", byId1.toString)
    assert(byId1(1L) == "second copy tail", byId1.toString)
    assert(byId1(2L) == "alpha beta", byId1.toString)
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val byId = got.map(r => r._1 -> r._4).toMap
    // the DOCUMENTED cross-batch divergence: doc 3's copy arrives alone
    // — the static index doesn't hold the passage and the within-batch
    // count is 1, so it SURVIVES, whereas a one-batch arrival would
    // have excised it (the batch operator over the union proves it)
    assert(byId(3L) == s"$passage third copy tail", byId.toString)
    val union = batchOp(b1 ++ b2).map(r => r._1 -> r._4).toMap
    assert(union(3L) == "third copy tail",
      "the union batch would have excised doc 3's copy — " +
        "the divergence this spec pins must be real")
    graft.operators.Dedup.unpersistAll()
  }

  test("char excise stream: zero-state, cumulative output equals the union batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val run = "0123456789abcdefghijklmnopqrstuvwxyz-end" // 40 chars
    val base = Seq((100L, s"base holds $run verbatim"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.spanIndexCountedChars(base, n = 40)
    val b1 = Seq((0L, s"first $run copy"), (1L, "clean novel content row"))
    val b2 = Seq((2L, s"second $run copy"))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val q = EventsStream.charExciseStream(
        in.toDF().toDF("doc_id", "text"), index, n = 40) { batch =>
      got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }
    def batchOp(rows: Seq[(Long, String)]) =
      graft.operators.Dedup.spanExciseCharsAgainstIndex(
          rows.toDF("doc_id", "text"), index, n = 40)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sortBy(_._1)
    in.addData(b1: _*)
    q.processAllAvailable()
    assert(got.sortBy(_._1).toSeq == batchOp(b1), "after batch 1")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // zero-state: cumulative stream ≡ the batch operator over the union
    assert(got.sortBy(_._1).toSeq == batchOp(b1 ++ b2))
    val byId = got.map(r => r._1 -> r._4).toMap
    // base-held run excises (with its shared flanking spaces), clean
    // text passes untouched
    assert(byId(0L) == "firstcopy" && byId(2L) == "secondcopy", byId.toString)
    assert(byId(1L) == "clean novel content row")
    graft.operators.Dedup.unpersistAll()
  }

  test("components merge stream: per-batch exact; the store swap chains to the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ts = (1 to 40).map(i => s"tok$i")
    val tA = ts.mkString(" ")
    val tA1 = (ts.dropRight(1) :+ "xx").mkString(" ")
    val base = Seq((10L, tA, "en"), (11L, tA, "en"),
      (20L, "an unrelated base document", "en"))
      .toDF("doc_id", "text", "lang")
    val store = graft.operators.Dedup.componentsIndex(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    store.count()
    val b1 = Seq((5L, tA, "en"),     // takes over the {10,11} clique
      (30L, "fresh singleton content", "en"))
    val b2 = Seq((40L, tA1, "en"))   // near-dup of the clique text
    def storeRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map { r =>
        def l(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), l(1), l(2), l(6))
      }.toSet
    val in = MemoryStream[(Long, String, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Option[Long], Option[Long], Option[Long])]]
    val q = EventsStream.componentsMergeStream(
        in.toDF().toDF("doc_id", "text", "lang"), store) { batch =>
      perBatch += storeRows(batch)
    }
    in.addData(b1: _*)
    q.processAllAvailable()
    assert(perBatch.head == storeRows(graft.operators.Dedup
        .componentsIndexMerge(store, b1.toDF("doc_id", "text", "lang"))),
      "per-batch output must equal the batch merge against the snapshot")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // each batch merged against the SAME snapshot (b2 alone does not
    // see b1's docs — the pre-swap contract)...
    assert(perBatch(1) == storeRows(graft.operators.Dedup
      .componentsIndexMerge(store, b2.toDF("doc_id", "text", "lang"))))
    assert(!perBatch(1).exists(_._1 == 5L),
      "without the swap, batch 2's output must not hold batch 1's docs")
    // ...and the caller-owned STORE SWAP chains exactly: folding batch
    // after batch reproduces the build over everything that arrived
    val chained = graft.operators.Dedup.componentsIndexMerge(
      graft.operators.Dedup.componentsIndexMerge(
        store, b1.toDF("doc_id", "text", "lang")),
      b2.toDF("doc_id", "text", "lang"))
    val all = base.unionByName((b1 ++ b2).toDF("doc_id", "text", "lang"))
    assert(storeRows(chained) ==
      storeRows(graft.operators.Dedup.componentsIndex(all)),
      "the store-swap chain must equal the rebuild over the union")
    graft.operators.Dedup.unpersistAll()
    store.unpersist()
  }

  test("components delete stream: per-batch exact; revocations commute and fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ts = (1 to 40).map(i => s"tok$i")
    val tA = ts.mkString(" ")
    val chB = (100 to 139).map(i => s"w$i").mkString(" ")
    val chA = ((100 to 138).map(i => s"w$i") :+ "aa").mkString(" ")
    val chC = ("cc" +: (101 to 139).map(i => s"w$i")).mkString(" ")
    val docs = Seq((1L, tA, "en"), (2L, tA, "en"),
      (100L, chA, "en"), (101L, chB, "en"), (102L, chC, "en"),
      (200L, "an untouched singleton here", "en"))
      .toDF("doc_id", "text", "lang")
    val store = graft.operators.Dedup.componentsIndex(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    store.count()
    def storeRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map { r =>
        def l(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), l(1), l(2), l(6))
      }.toSet
    val b1 = Seq(1L)    // clique rep leaves
    val b2 = Seq(101L)  // the chain's middle leaves (split)
    val in = MemoryStream[Long]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Option[Long], Option[Long], Option[Long])]]
    val q = EventsStream.componentsDeleteStream(
        in.toDF().toDF("doc_id"), store) { batch =>
      perBatch += storeRows(batch)
    }
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // per-batch ≡ the batch delete against the snapshot
    assert(perBatch.head == storeRows(graft.operators.Dedup
      .componentsIndexDelete(store, b1.toDF("doc_id"))))
    assert(perBatch(1) == storeRows(graft.operators.Dedup
      .componentsIndexDelete(store, b2.toDF("doc_id"))))
    // revocations COMMUTE and FOLD: chaining the swaps in either order
    // equals one delete of the union
    def del(s: org.apache.spark.sql.DataFrame, ids: Seq[Long]) =
      graft.operators.Dedup.componentsIndexDelete(s, ids.toDF("doc_id"))
    val unionDel = storeRows(del(store, b1 ++ b2))
    assert(storeRows(del(del(store, b1), b2)) == unionDel)
    assert(storeRows(del(del(store, b2), b1)) == unionDel)
    // and the fold equals the ground-truth rebuild on the survivors
    assert(unionDel == storeRows(graft.operators.Dedup.componentsIndex(
      docs.filter(!col("doc_id").isInCollection(b1 ++ b2)))))
    graft.operators.Dedup.unpersistAll()
    store.unpersist()
  }

  test("governance loop stream: one-batch artifact equals the batch x27 statement") {
    // the r18 verdict stretch: retention expiry -> seven-store takedown
    // -> audit as a foreachBatch composition, pinned bit-for-bit
    // against the batch x27_governance_loop result on the same planted
    // corpus and the same persisted pin stores
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val d = Tables.load(spark, dir, "documents")
    val policy = d.select(col("source")).distinct()
      .select(col("source"),
        (lit(60L) + lit(45L) * (length(col("source")) % 5).cast("long"))
          .as("retention_days"))
    val base = queries.Pipeline.x25PlantedBase(spark, dir)
    val stores = queries.Pipeline.x25StoresShared(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    val expected = rows(SparkEntry.queries("x27_governance_loop")(spark, dir))
    val feed = d.select(col("doc_id"), col("source"),
        (col("doc_id") % 360).cast("long").as("ingest_day"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val in = MemoryStream[(Long, String, Long)]
    val artifacts = scala.collection.mutable.ArrayBuffer
      .empty[Set[(String, Long, Long, Long, String)]]
    val q = EventsStream.governanceLoopStream(
        in.toDF().toDF("doc_id", "source", "ingest_day"),
        policy, asOfDay = 120L, base = base, prebuilt = stores) { b =>
      artifacts += rows(b)
    }
    in.addData(feed.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    assert(artifacts.size == 1 && artifacts.head == expected,
      s"stream artifact must equal the batch x27 statement: " +
        s"${artifacts.headOption} vs $expected")
    graft.operators.Dedup.unpersistAll()
  }

  test("curriculum merge stream: per-batch exact top-k; store-swap chain equals rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 3 // small so merges genuinely DISPLACE ranked rows
    val base = (1L to 8L).map(i => (i, if (i <= 5) "web" else "book"))
      .toDF("doc_id", "source")
    val store = graft.operators.Curriculum.curriculumIndex(base, k = k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    store.count()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val b1 = Seq((20L, "web"), (21L, "forum")) // new source bootstraps
    val b2 = Seq((30L, "web"), (31L, "book"))
    val in = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(String, Long, String, Long, Long)]]
    val q = EventsStream.curriculumMergeStream(
        in.toDF().toDF("doc_id", "source"), store, k = k) { batch =>
      perBatch += rows(batch)
    }
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // per-batch ≡ the batch merge against the snapshot
    assert(perBatch.head == rows(graft.operators.Curriculum
      .curriculumIndexMerge(store, b1.toDF("doc_id", "source"), k = k)))
    assert(perBatch(1) == rows(graft.operators.Curriculum
      .curriculumIndexMerge(store, b2.toDF("doc_id", "source"), k = k)))
    // the caller-owned store-swap chain is EXACT: fold ≡ rebuild on
    // the union (the top-k fold identity — s16's bit-identity run
    // continuously), including counts and displaced rows
    val chained = graft.operators.Curriculum.curriculumIndexMerge(
      graft.operators.Curriculum.curriculumIndexMerge(
        store, b1.toDF("doc_id", "source"), k = k),
      b2.toDF("doc_id", "source"), k = k)
    val all = base.unionByName((b1 ++ b2).toDF("doc_id", "source"))
    assert(rows(chained) ==
      rows(graft.operators.Curriculum.curriculumIndex(all, k = k)),
      "the store-swap chain must equal the rebuild over the union")
    store.unpersist()
  }

  test("curriculum delete stream: per-batch exact; revocations fold to the union delete") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // default k = 1000 leaves every source UNSATURATED, where the
    // prefix contract is vacuous and delete ≡ rebuild exactly
    val base = (1L to 9L).map(i => (i, if (i % 3 == 0) "book" else "web"))
      .toDF("doc_id", "source")
    val store = graft.operators.Curriculum.curriculumIndex(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    store.count()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val b1 = Seq((1L, "web"), (3L, "book"))
    val b2 = Seq((4L, "web"))
    val in = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(String, Long, String, Long, Long)]]
    val q = EventsStream.curriculumDeleteStream(
        in.toDF().toDF("doc_id", "source"), store) { batch =>
      perBatch += rows(batch)
    }
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def del(s: org.apache.spark.sql.DataFrame, ids: Seq[(Long, String)]) =
      graft.operators.Curriculum.curriculumIndexDelete(
        s, ids.toDF("doc_id", "source"))
    // per-batch ≡ the batch delete against the snapshot
    assert(perBatch.head == rows(del(store, b1)))
    assert(perBatch(1) == rows(del(store, b2)))
    // folding swap after swap ≡ one delete of the union, and (sources
    // unsaturated) ≡ the rebuild on the survivors
    val unionDel = rows(del(store, b1 ++ b2))
    assert(rows(del(del(store, b1), b2)) == unionDel)
    val revoked = (b1 ++ b2).map(_._1)
    assert(unionDel == rows(graft.operators.Curriculum.curriculumIndex(
      base.filter(!col("doc_id").isInCollection(revoked)))))
    store.unpersist()
  }

  test("retention expiry stream: stateless per-batch decisions feed the takedown") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val policy = Seq(("web", 100L), ("forum", 50L))
      .toDF("source", "retention_days")
    val asOf = 359L
    // web: retention 100 — doc 1 (age 349) expires, doc 2 (age 59)
    // survives; book: NO policy row — never expires (the safe
    // default); forum: retention 50 — doc 4 (age 259) expires, doc 5
    // (age 29) survives
    val b1 = Seq((1L, "web", 10L, "alpha beta code1111 shared9999"),
      (2L, "web", 300L, "gamma delta shared9999"),
      (3L, "book", 5L, "no policy never expires code1111"))
    val b2 = Seq((4L, "forum", 100L, "expired forum row key7777"),
      (5L, "forum", 330L, "fresh forum row key7777"))
    val in = MemoryStream[(Long, String, Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long)]
    val q = EventsStream.retentionExpiryStream(
        in.toDF().toDF("doc_id", "source", "ingest_day", "text"),
        policy, asOf) { batch =>
      got ++= batch.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
          r.getAs[Long]("age_days")))
    }
    def batchOp(rows: Seq[(Long, String, Long, String)]) =
      graft.operators.Privacy.retentionExpiry(
          rows.toDF("doc_id", "source", "ingest_day", "text"), policy, asOf)
        .select(col("doc_id"), col("text"), col("age_days"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    in.addData(b1: _*)
    q.processAllAvailable()
    assert(got.sortBy(_._1).toSeq == batchOp(b1), "after batch 1")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // zero-state: cumulative stream ≡ the batch sweep over the union
    assert(got.sortBy(_._1).toSeq == batchOp(b1 ++ b2))
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 4L),
      s"exactly docs 1 and 4 are past retention: $got")
    // and the emitted rows ARE the takedown shape: revoking them from
    // a persisted secrets index equals rebuilding on the survivors
    val all = (b1 ++ b2).toDF("doc_id", "source", "ingest_day", "text")
    val idx = graft.operators.Privacy.secretFrequencies(all)
    val revokedDf = got.toSeq.map(r => (r._1, r._2)).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows(graft.operators.Privacy.secretIndexDelete(idx, revokedDf)) ==
      rows(graft.operators.Privacy.secretFrequencies(
        all.filter(!col("doc_id").isInCollection(got.map(_._1))))),
      "the stream's expiry set must drive the index delete exactly")
    graft.operators.Dedup.unpersistAll()
  }

  test("secret scrub stream: per-batch rule exact, split evidence only over-redacts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the base holds pin8888 twice: one more sighting anywhere clears
    // k = 3; fresh secrets need all their evidence in ONE batch
    val base = Seq(
      (100L, "pin8888 base one"),
      (101L, "pin8888 base two"),
      (102L, "plain base row")).toDF("doc_id", "text")
    val index = graft.operators.Privacy.secretFrequencies(base)
    // batch 1: a pin sighting (2+1 ⇒ survives) and two co-arriving
    // copies of a fresh key (0+2 < 3 ⇒ both redact); batch 2: a third
    // copy of that key, alone (0+1 < 3 ⇒ redacts)
    val b1 = Seq(
      (0L, "pin8888 rides the base"),
      (1L, "key5555 first copy"),
      (2L, "key5555 second copy"))
    val b2 = Seq((3L, "key5555 third copy"))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = EventsStream.secretScrubStream(
        in.toDF().toDF("doc_id", "text"), index, k = 3) { batch =>
      got ++= batch.collect().map(r => (r.getLong(0), r.getString(4)))
    }
    def batchOp(rows: Seq[(Long, String)]): Seq[(Long, String)] =
      graft.operators.Privacy.secretScrubAgainstIndex(
          rows.toDF("doc_id", "text"), index, k = 3)
        .collect().map(r => (r.getLong(0), r.getString(4)))
        .toSeq.sortBy(_._1)
    in.addData(b1: _*)
    q.processAllAvailable()
    assert(got.sortBy(_._1).toSeq == batchOp(b1),
      "each microbatch must equal the batch operator over that batch")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val byId = got.toMap
    assert(byId(0L) == "pin8888 rides the base")
    assert(byId(1L) == "<secret> first copy")
    assert(byId(2L) == "<secret> second copy")
    // the pinned divergence direction: the union batch would see
    // key5555 in 3 docs (0 + 3 ⇒ SURVIVES), but split across batches
    // each side counts only its own evidence — the stream REDACTS doc
    // 3's copy too. For a privacy gate that is the safe direction:
    // splitting evidence can only redact more, never leak.
    assert(byId(3L) == "<secret> third copy")
    val union = batchOp(b1 ++ b2).toMap
    assert(union(1L) == "key5555 first copy" &&
      union(3L) == "key5555 third copy",
      "the union batch must clear k — the divergence this spec pins " +
        "must be real, and in the over-redact direction only")
  }

  test("streaming incremental pairs equals the batch operator per arriving doc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // a tiny base whose postings carry real df-banded weights: grams
    // "fast scan" / "scan joins" etc. shared by 2..3 base docs survive
    // the [2, 25] band; singleton grams are banded away
    val base = Seq(
      (100L, "fast scan joins rows"),
      (101L, "fast scan joins tables"),
      (102L, "fast scan beats slow scan"))
      .toDF("doc_id", "text")
    val tf = base.select(col("doc_id"), explode(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col("text")), 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 25))
    val n = base.agg(count(lit(1)).as("n_docs"))
    val postings = tf.join(dfreq, Seq("gram")).crossJoin(broadcast(n))
      .select(col("gram"), col("doc_id"), col("tf"),
        (col("n_docs").cast("double") / col("df")).as("w"))
      .cache()
    postings.count() // materialize the static side once
    val b1 = Seq((0L, "fast scan joins everywhere"),
      (1L, "nothing in common here"))
    val b2 = Seq((2L, "fast scan fast scan"))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Double)]
    val q = EventsStream.incrementalPairsStream(
        in.toDF().toDF("doc_id", "text"), postings) { batch =>
      got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    }
    def batchOp(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, Double)] =
      graft.operators.Dedup.incrementalTfidfPairs(
          rows.toDF("doc_id", "text"), postings)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
    in.addData(b1: _*)
    q.processAllAvailable()
    assert(got.sortBy(t => (t._1, t._2)).toSeq == batchOp(b1), "after batch 1")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    assert(got.sortBy(t => (t._1, t._2)).toSeq == batchOp(b1 ++ b2),
      "cumulative stream edges must equal batch over the whole arrival")
    // the clean doc gains no edges; the contaminated ones hit the base
    assert(!got.exists(_._2 == 1L), s"doc 1 shares no banded gram: $got")
    assert(got.exists(t => t._1 == 100L && t._2 == 0L),
      s"doc 0 must edge into base 100 via 'fast scan'/'scan joins': $got")
  }

  test("streaming IVF refit decision equals the batch partial refit per drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def vecs(ids: Range, f: Int => Array[Double]) =
      ids.map(i => (i.toLong, f(i).toSeq)).toDF("vec_id", "embedding")
    val base = vecs(0 until 10, i => Array(1.0, 0.0, 0.0, 0.001 * (i % 3)))
      .unionByName(
        vecs(10 until 16, i => Array(0.0, 1.0, 0.0, 0.001 * (i % 3))))
      .cache()
    base.count()
    val cells = graft.operators.Similarity.lloydCentroids(
      base, nlist = 2, iters = 2)
    // batch 1: an in-distribution drop (calm — pass-through, serve on);
    // batch 2: the planted drifted drop (axis2 tilted into the axis1
    // cell) — the refit must fire for exactly that cell
    val calm = (100 until 104).map(i =>
      (i.toLong, Seq(1.0, 0.0, 0.0, 0.001 * (i % 3))))
    val drifted = (200 until 220).map(i =>
      (i.toLong, Seq(0.0, 0.001, 1.0, 0.001 * (i % 3))))
    val in = MemoryStream[(Long, Seq[Double])]
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Int, Seq[Double], Boolean)]]
    val q = EventsStream.ivfRefitStream(
        in.toDF().toDF("vec_id", "embedding"), cells, base,
        minCos = 0.9, iters = 2) { out =>
      emitted += out.collect().map(r => (r.getInt(0),
        r.getAs[scala.collection.Seq[Double]]("centroid").toSeq,
        r.getBoolean(2))).toSeq.sortBy(_._1)
    }
    def batchOp(rows: Seq[(Long, Seq[Double])]): Seq[(Int, Seq[Double], Boolean)] =
      graft.operators.Similarity.ivfPartialRefit(
          cells, base, rows.toDF("vec_id", "embedding"),
          minCos = 0.9, iters = 2)
        .collect().map(r => (r.getInt(0),
          r.getAs[scala.collection.Seq[Double]]("centroid").toSeq,
          r.getBoolean(2))).toSeq.sortBy(_._1)
    in.addData(calm: _*)
    q.processAllAvailable()
    in.addData(drifted: _*)
    q.processAllAvailable()
    q.stop()
    assert(emitted.length == 2)
    assert(emitted(0) == batchOp(calm), "calm batch must match the batch op")
    assert(emitted(0).forall(!_._3), "calm batch must not flag a refit")
    assert(emitted(1) == batchOp(drifted),
      "drifted batch must match the batch op bit-for-bit")
    assert(emitted(1).count(_._3) == 1,
      s"exactly the drop-hit cell must refit: ${emitted(1).map(t => (t._1, t._3))}")
    base.unpersist()
  }

  test("streaming PQ distortion matches the batch pqDistortion bit-for-bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // m=2 subspaces of 2 dims, axis-aligned codebooks; batch 1 tracks
    // the fitted distribution, batch 2 plants a STALE-codebook ingest on
    // subspace 1 (blocks far from both of its centroids)
    val model = graft.operators.Similarity.PqModel(2, 2, Seq(
      Seq(1 -> Seq(1.0, 0.0), 2 -> Seq(0.0, 1.0)),
      Seq(1 -> Seq(1.0, 0.0), 2 -> Seq(0.0, 1.0))))
    val cells = Seq(
      (0, 1, Seq(1.0, 0.0)), (0, 2, Seq(0.0, 1.0)),
      (1, 1, Seq(1.0, 0.0)), (1, 2, Seq(0.0, 1.0)))
      .toDF("sub", "code", "centroid")
    val b1 = Seq((1L, Seq(0.9, 0.1, 0.05, 0.95)),
      (2L, Seq(0.05, 0.9, 1.0, 0.1)))
    val b2 = Seq((3L, Seq(0.8, 0.2, 3.0, 3.0)),
      (4L, Seq(1.0, 0.0, -2.0, 2.5)))
    val in = MemoryStream[(Long, Seq[Double])]
    val q = EventsStream.pqDistortionStream(
        in.toDF().toDF("vec_id", "embedding"), model, cells)
      .toDF().writeStream.outputMode("update").format("memory")
      .queryName("pq_dist_stream").start()
    def latest(): Map[Int, (Long, Double, Double)] = spark.table("pq_dist_stream")
      .groupBy(col("sub"))
      .agg(max(struct(col("n_vecs"), col("sse"), col("mse"))).as("s"))
      .select(col("sub"), col("s.n_vecs"), col("s.sse"), col("s.mse"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def batch(rows: Seq[(Long, Seq[Double])]): Map[Int, (Long, Double, Double)] =
      graft.operators.Similarity
        .pqDistortion(rows.toDF("vec_id", "embedding"), model, cells)
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
    in.addData(b1: _*)
    q.processAllAvailable()
    // every emission is the batch answer over the ingest prefix so far
    assert(latest() == batch(b1), "prefix after batch 1")
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val got = latest()
    assert(got == batch(b1 ++ b2),
      "final state must equal the batch pqDistortion over the whole " +
        "ingest, double-for-double")
    // the planted staleness is visible exactly where it was planted
    assert(got(1)._3 > batch(b1)(1)._3,
      s"stale sub-1 blocks must raise subspace 1's mse: $got")
    assert(math.abs(got(0)._3 - batch(b1)(0)._3) < 0.2,
      s"subspace 0 stayed in-distribution: $got")
  }

  test("latestWinsStream idle TTL: idle (user, type) evicted, version count restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val in = MemoryStream[(Long, String, Long, java.sql.Timestamp, Double, String)]
    val events = in.toDF()
      .toDF("user_id", "event_type", "event_id", "ts", "value", "props")
    val q = EventsStream.latestWinsStream(events, Some(60000L))
      .writeStream.outputMode("update").format("memory")
      .queryName("ttl_latest").start()
    in.addData((1L, "click", 10L, ts(0), 1.0, "a"),
      (2L, "view", 11L, ts(0), 1.0, "b"))
    q.processAllAvailable()
    in.addData((2L, "view", 12L, ts(30), 2.0, "c"))
    q.processAllAvailable()
    in.addData((1L, "click", 13L, ts(31), 3.0, "d"),
      (2L, "view", 14L, ts(31), 4.0, "e"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ttl_latest").collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(4), r.getDouble(5))))
    // (1, click) was idle through the 10:20 watermark → state dropped →
    // its reappearance carries n_versions = 1, not 2
    assert(rows.filter(_._1 == (1L, "click")).map(_._2).toSet ==
      Set((1L, 10L, 1.0), (1L, 13L, 3.0)), s"evicted key: ${rows.toSeq}")
    // the live key versions through uninterrupted: 1, 2, 3
    assert(rows.filter(_._1 == (2L, "view")).map(_._2).toSet ==
      Set((1L, 11L, 1.0), (2L, 12L, 2.0), (3L, 14L, 4.0)),
      s"live key: ${rows.toSeq}")
  }

  test("streaming decontamination matches the batch answer") {
    import graft.operators.Decontaminate
    // eval set is static/broadcast; the corpus arrives as a stream — the
    // continuously-fed curation shape. The gram join is stream-static and
    // stateless; only the per-doc count aggregate holds state.
    val batchDocs = Tables.load(spark, sf, "documents")
    val evalSet = batchDocs.filter(col("doc_id") % 10 === 7)
    val streamCorpus = EventsStream.readDocuments(spark, sf)
      .filter(col("doc_id") % 10 =!= 7)
    val got = EventsStream.runToMemory(
      Decontaminate.ngramOverlap(streamCorpus, evalSet, n = 8),
      "decon_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Decontaminate
      .ngramOverlap(batchDocs.filter(col("doc_id") % 10 =!= 7), evalSet, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch)
    assert(got.nonEmpty, "sf0.001 corpus should contain planted contamination")
  }

  test("stateless streaming contamination flags match the batch answer") {
    import graft.operators.Decontaminate
    // the c1 twin WITHOUT aggregate state: the eval set collapses to a
    // one-row sorted gram-array index (built once, static), each arriving
    // doc's flag is a map-only broadcast cross join + codegen'd merge
    // intersect. Running in APPEND mode is itself the statelessness
    // proof — Spark rejects unwatermarked streaming aggregates there, so
    // this plan holds no state store at all.
    val batchDocs = Tables.load(spark, sf, "documents")
    val evalSet = batchDocs.filter(col("doc_id") % 10 === 7)
    val index = Decontaminate.evalGramIndex(evalSet, n = 8)
    val streamCorpus = EventsStream.readDocuments(spark, sf)
      .filter(col("doc_id") % 10 =!= 7)
    val got = EventsStream.runToMemory(
      Decontaminate.streamFlags(streamCorpus, index, n = 8),
      "decon_flags_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Decontaminate
      .ngramOverlap(batchDocs.filter(col("doc_id") % 10 =!= 7), evalSet, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch,
      "stateless flag stream must equal the batch gram-join answer exactly")
    assert(got.nonEmpty, "sf0.001 corpus should contain planted contamination")
  }

  test("streaming shard manifest matches the batch x14 manifest") {
    // state is keyed by the FIXED 16-value shard domain — the one
    // unwindowed streaming aggregate whose state is bounded by its key
    // space, not a watermark
    val got = EventsStream.runToMemory(
      EventsStream.shardManifestStream(EventsStream.readDocuments(spark, sf)),
      "shard_manifest_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val batch = SparkEntry.queries("x14_shard_manifest")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(got == batch)
    assert(got.map(_._1) == (0 until 16), "all 16 shards populated at this sf")
  }

  test("streaming heavy-hitters aggregate matches the batch sketch") {
    // the SpaceSaving TypedImperativeAggregate composes with Structured
    // Streaming: its buffer IS the streaming aggregation state, so a
    // running vocabulary monitor costs O(capacity) state per group
    import org.apache.spark.sql.functions.{call_function, explode, lit, posexplode}
    import graft.functions.TextFunctions
    val agg = (d: org.apache.spark.sql.DataFrame) => d
      .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(call_function("graft_heavy_hitters", col("tok"), lit(5), lit(4096)).as("hh"))
    val got = EventsStream.runToMemory(
      agg(EventsStream.readDocuments(spark, sf)),
      "hh_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .select(col("lang"), posexplode(col("hh")).as(Seq("i", "s")))
      .select(col("lang"), col("s.token"), col("s.cnt"), col("i"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val want = agg(Tables.load(spark, sf, "documents"))
      .select(col("lang"), posexplode(col("hh")).as(Seq("i", "s")))
      .select(col("lang"), col("s.token"), col("s.cnt"), col("i"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming quantile-sketch aggregate matches the batch sketch") {
    // the MRL buffer is the streaming aggregation state exactly as the
    // SpaceSaving buffer is for heavy hitters: partial buffers merge
    // associatively across micro-batches, so a running length-quantile
    // monitor carries O(capacity) state per group. capacity=4096 ≥ every
    // per-lang group here, so streamed and batch answers must be
    // identical (the exact regime — same discipline as the k2 gate).
    import org.apache.spark.sql.functions.{call_function, length, lit}
    val agg = (d: org.apache.spark.sql.DataFrame) => d
      .groupBy(col("lang"))
      .agg(
        call_function("graft_quantile_sketch",
          length(col("text")), lit(0.25), lit(4096)).as("q25"),
        call_function("graft_quantile_sketch",
          length(col("text")), lit(0.5), lit(4096)).as("q50"),
        call_function("graft_quantile_sketch",
          length(col("text")), lit(0.75), lit(4096)).as("q75"))
    val got = EventsStream.runToMemory(
      agg(EventsStream.readDocuments(spark, sf)),
      "quantile_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val want = agg(Tables.load(spark, sf, "documents"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming count-min state matches the batch grid byte-for-byte") {
    // the CMS grid is the streaming aggregation state: element-wise
    // addition is commutative/associative and the byte image is
    // shape-deterministic, so HOWEVER micro-batches split the input the
    // final state must be the identical byte array the batch pass builds.
    import org.apache.spark.sql.functions.{base64, call_function, lit}
    val agg = (d: org.apache.spark.sql.DataFrame) => d
      .groupBy(col("lang"))
      .agg(base64(call_function("graft_cms_state",
        col("source"), lit(4), lit(8))).as("st"))
    val got = EventsStream.runToMemory(
      agg(EventsStream.readDocuments(spark, sf)),
      "cms_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = agg(Tables.load(spark, sf, "documents"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming hll state matches the batch registers byte-for-byte") {
    // element-wise max is commutative/associative/idempotent, so the HLL
    // register image is micro-batch-split-invariant — the streamed state
    // must be the identical byte array the batch pass builds (the CMS
    // grid discipline).
    import org.apache.spark.sql.functions.{base64, call_function, lit}
    val agg = (d: org.apache.spark.sql.DataFrame) => d
      .groupBy(col("lang"))
      .agg(base64(call_function("graft_hll_state",
        col("source"), lit(64))).as("st"))
    val got = EventsStream.runToMemory(
      agg(EventsStream.readDocuments(spark, sf)),
      "hll_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = agg(Tables.load(spark, sf, "documents"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming bloom state matches the batch image byte-for-byte") {
    // bit-OR is commutative/associative/idempotent, so the Bloom image
    // is micro-batch-split-invariant — the streamed membership shard
    // must be the identical byte array the batch pass builds (the
    // CMS/HLL grid discipline, at the k9 membership point).
    import org.apache.spark.sql.functions.{base64, call_function, lit}
    val agg = (d: org.apache.spark.sql.DataFrame) => d
      .groupBy(col("lang"))
      .agg(base64(call_function("graft_bloom_state",
        col("text"), lit(2048))).as("st"))
    val got = EventsStream.runToMemory(
      agg(EventsStream.readDocuments(spark, sf)),
      "bloom_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = agg(Tables.load(spark, sf, "documents"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming windowed heavy-hitters match the batch per-window sketch") {
    // trending-monitor shape: event-time windows × a bounded SpaceSaving
    // state per window — the per-window top list a live dashboard reads.
    // The sketch buffer composes with the window aggregate exactly like
    // the flat group-by cases above; per-window states must equal the
    // batch pass however micro-batches split the stream.
    import org.apache.spark.sql.functions.{call_function, lit, posexplode, window}
    val agg = (d: org.apache.spark.sql.DataFrame) => d
      .groupBy(window(col("ts"), "6 hours"))
      .agg(call_function("graft_heavy_hitters",
        col("event_type"), lit(3), lit(1024)).as("hh"))
    def flat(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").cast("long").as("ws"),
        posexplode(col("hh")).as(Seq("i", "s")))
      .select(col("ws"), col("s.token"), col("s.cnt"), col("i"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val got = flat(EventsStream.runToMemory(
      agg(EventsStream.readEvents(spark, sf)),
      "hh_window_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete()))
    val want = flat(agg(Tables.load(spark, sf, "events")))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming sketch-cube states match the batch cube (k4 shape)") {
    // the sketch-CUBE pattern under streaming: per-(lang, shard) binary
    // STATES aggregate in the stream, then a batch rollup merges them —
    // the daily-pipeline shape where micro-batches maintain shard states
    // and reports merge whatever states exist. Exact regime ⇒ streamed
    // states must roll up to the identical answers.
    import org.apache.spark.sql.functions.{call_function, length, lit}
    val cube = (d: org.apache.spark.sql.DataFrame) => d
      .withColumn("shard", (col("doc_id") % 4).cast("int"))
      .groupBy(col("lang"), col("shard"))
      .agg(
        call_function("graft_kmv_state", col("text"), lit(4096)).as("ks"),
        call_function("graft_quantile_state",
          length(col("text")), lit(4096)).as("qs"))
    val rollup = (states: org.apache.spark.sql.DataFrame) => states
      .groupBy(col("lang"))
      .agg(
        call_function("graft_kmv_merge", col("ks"), lit(4096)).as("n_distinct"),
        call_function("graft_quantile_merge", col("qs"), lit(0.5), lit(4096))
          .cast("long").as("med_len"))
    val got = rollup(EventsStream.runToMemory(
        cube(EventsStream.readDocuments(spark, sf)),
        "cube_stream_test",
        org.apache.spark.sql.streaming.OutputMode.Complete()))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = rollup(cube(Tables.load(spark, sf, "documents")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("kmv set ops over streamed states match the batch answer (k5 shape)") {
    // k5 under streaming: micro-batches maintain per-language KMV states;
    // the pairwise union/intersection matrix is computed from whatever
    // states exist at read time. Exact regime ⇒ identical to batch.
    import org.apache.spark.sql.functions.{call_function, explode, lit}
    import graft.functions.TextFunctions
    val states = (d: org.apache.spark.sql.DataFrame) => d
      .select(col("lang"), explode(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2))
        .as("gram"))
      .groupBy(col("lang"))
      .agg(call_function("graft_kmv_state", col("gram"), lit(4096)).as("st"))
    val setops = (st: org.apache.spark.sql.DataFrame) => {
      val a = st.select(col("lang").as("l1"), col("st").as("sa"))
      val b = st.select(col("lang").as("l2"), col("st").as("sb"))
      a.join(b, col("l1") < col("l2")).select(col("l1"), col("l2"),
        call_function("graft_kmv_union", col("sa"), col("sb")).as("u"),
        call_function("graft_kmv_intersect", col("sa"), col("sb")).as("i"))
    }
    val got = setops(EventsStream.runToMemory(
        states(EventsStream.readDocuments(spark, sf)),
        "kmv_setops_stream_test",
        org.apache.spark.sql.streaming.OutputMode.Complete()))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = setops(states(Tables.load(spark, sf, "documents")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming near-dup vs static corpus index matches the batch pair set") {
    import graft.operators.Dedup
    // incremental-crawl shape: documents arrive as a stream, the corpus
    // index is a static table. Stream-static join — stateless, so this is
    // the one dedup flavor a forever-running ingest can afford.
    val corpus = Tables.load(spark, sf, "documents")
    val idx = Dedup.minhashIndex(corpus).persist()
    try {
      val stream = EventsStream.readDocuments(spark, sf)
      val got = EventsStream.runToMemory(
        EventsStream.nearDupPairsStream(stream, idx),
        "neardup_stream_test",
        org.apache.spark.sql.streaming.OutputMode.Append())
        .select(col("doc_id"), col("corpus_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // every arriving doc is also in the corpus, so the streamed pair set
      // must be the SYMMETRIC closure of the batch operator's (i < j) pairs
      val batch = Dedup.minhashLshPairs(corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Dedup.unpersistAll()
      val want = batch ++ batch.map(_.swap)
      assert(got == want,
        s"stream=${got.size} pairs, batch symmetric=${want.size}")
      assert(batch.nonEmpty, "sf0.001 corpus should contain planted near-dups")
    } finally idx.unpersist()
  }

  test("incremental minhash batch flags match the streaming probe's pair support") {
    import graft.operators.Dedup
    // d19's batch drop and nearDupPairsStream's continuous probe serve
    // the SAME persisted base band index; the streamed (doc_id,
    // corpus_id) pair set, distinct'd and aggregated per probe doc, must
    // equal the batch (n_dups, first_dup) flags. This also pins the
    // threshold-form agreement: the stream verifies inter/uni >= 0.8 in
    // doubles, the batch verifies 5·inter >= 4·uni in integers — at any
    // |A∪B| below ~1e10 the two predicates decide identically.
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val probe = d.filter(col("doc_id") % 4 === 0)
    val idx = Dedup.minhashIndex(base).persist()
    try {
      val stream = EventsStream.readDocuments(spark, sf)
        .filter(col("doc_id") % 4 === 0)
      val pairs = EventsStream.runToMemory(
        EventsStream.nearDupPairsStream(stream, idx, threshold = 0.8),
        "inc_minhash_stream_test",
        org.apache.spark.sql.streaming.OutputMode.Append())
        .select(col("doc_id"), col("corpus_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = pairs.groupBy(_._1).map { case (did, ps) =>
        (did, ps.size.toLong, ps.map(_._2).min) }.toSet
      val want = Dedup.incrementalMinhash(idx, probe, num = 4, den = 5)
        .filter(col("n_dups") > 0)
        .select(col("doc_id"), col("n_dups"), col("first_dup"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"stream=${got.size} docs, batch=${want.size}")
      assert(want.nonEmpty,
        "sf0.001 corpus should plant base-vs-drop shingle near-dups")
    } finally idx.unpersist()
  }

  test("streaming incremental dedup vs static base index matches the batch flags") {
    import graft.operators.Dedup
    // the d17 snapshot convention: doc_id % 4 == 0 is the arriving drop,
    // the rest is the base corpus whose prefix index is a static table.
    // The streamed pair set, distinct'd and aggregated per probe doc,
    // must equal the batch operator's (n_dups, first_dup) flags exactly —
    // one-sided prefixes (base-df order, probe probes whole) generate a
    // candidate superset and the identical integer verify decides.
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val probe = d.filter(col("doc_id") % 4 === 0)
    val idx = Dedup.incrementalIndex(base).persist()
    try {
      val stream = EventsStream.readDocuments(spark, sf)
        .filter(col("doc_id") % 4 === 0)
      val pairs = EventsStream.runToMemory(
        EventsStream.incrementalDedupStream(stream, idx),
        "inc_dedup_stream_test",
        org.apache.spark.sql.streaming.OutputMode.Append())
        .select(col("doc_id"), col("base_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = pairs.groupBy(_._1).map { case (did, ps) =>
        (did, ps.size.toLong, ps.map(_._2).min) }.toSet
      val want = Dedup.incrementalDedup(base, probe)
        .filter(col("n_dups") > 0)
        .select(col("doc_id"), col("n_dups"), col("first_dup"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      Dedup.unpersistAll()
      assert(got == want, s"stream=${got.size} docs, batch=${want.size}")
      assert(want.nonEmpty, "sf0.001 corpus should plant base-vs-drop near-dups")
    } finally idx.unpersist()
  }
}
