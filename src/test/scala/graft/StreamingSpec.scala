package graft

import graft.fixtures.Fixtures
import graft.schema.InputDoc
import graft.streaming.StreamPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("watermarked tumbling-window aggregation over the events stream") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // FileStreamSource needs a directory, the fixture is a single file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(streamDir, "events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ts", col("ts").cast("timestamp")) // watermark needs TIMESTAMP, parquet is NTZ
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory").queryName("ev_window")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT event_type, window.start AS hour, n FROM ev_window")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("event_type"), window(col("ts"), "1 hour").getField("start").as("hour"))
      .agg(count(lit(1)).as("n"))
    // streaming result equals the batch computation on the same input
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
    assert(got.count() > 0)
  }

  test("streaming dedup: re-ingested duplicate docs dropped within the watermark") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val base = Fixtures.inputDocs(10)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 10 docs + 5 duplicates re-ingested in the same window
    stream.addData(base.map(d => (d.doc_id, t0)) ++ base.take(5).map(d => (d.doc_id, t0)): _*)
    val byId = spark.createDataset(base).toDF()
    val docsStream = stream.toDS().toDF("doc_id", "ingest_ts")
      .join(byId, "doc_id") // attach spans (stream-static join, stream side preserved)
    val deduped = graft.streaming.StreamPipeline.dedupStream(docsStream)
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT doc_id FROM dedup_stream")
    assert(got.count() === 10) // 15 in, 5 dupes dropped
    assert(got.distinct().count() === 10)
  }

  test("streaming curation equals batch curation (verdict + dedup + sample)") {
    import graft.datapipe.{Dedup, TextQuality}
    implicit val sqlCtx = spark.sqlContext
    val r = new scala.util.Random(11)
    val vocab = (0 until 60).map(i => s"tok${('a' + i % 26).toChar}$i") ++ Seq("and", "of", "to", "in")
    val base = (0L until 30L).map { i =>
      (i, "the " + (0 until 29).map(_ => vocab(r.nextInt(vocab.length))).mkString(" "))
    }
    val junk = Seq((500L, "too short"),
      (501L, "the " + (0 until 29).map(_ => "dup").mkString(" ")))
    val dups = base.take(6).map { case (i, t) => (1000L + i, t) } // same text, later ingest
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamCurate.curate(
      stream.toDS().toDF("doc_id", "text", "ingest_ts"), sampleRateBp = lit(6000L))
    val q = out.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    // originals first, duplicates in a LATER micro-batch: first-seen-wins then
    // deterministically equals the batch min-id keep-one
    stream.addData((base ++ junk).map { case (i, t) => (i, t, t0) }: _*)
    q.processAllAvailable()
    stream.addData(dups.map { case (i, t) => (i, t, t0) }: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT doc_id FROM curate_stream").as[Long].collect().toSet

    val corpus = (base ++ junk ++ dups).toDF("doc_id", "text")
    val kept = corpus.filter(TextQuality.c4Reason(col("text")) === "ok")
    val dd = Dedup.exactDedupBy(kept, "doc_id", TextQuality.fingerprint(col("text")))
    val expect = TextQuality.stratifiedHashSample(dd, "doc_id", lit(6000L), salt = "curate")
      .select("doc_id").as[Long].collect().toSet
    assert(got === expect)
    assert(!got.contains(500L) && !got.contains(501L)) // junk rejected at ingest
    assert(got.nonEmpty && got.size < 30)              // the 60% sample engaged
  }

  test("StreamCurate.run writes manifested epoch tables of exactly the curated docs") {
    import graft.io.TableFormat
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-curate-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-curate-ckpt").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val good = (0L until 20L).map(i =>
      (i, "the " + (0 until 25).map(j =>
        s"tok${('a' + (i.toInt + j) % 26).toChar}${('a' + j % 26).toChar}").mkString(" "), t0))
    val junk = Seq((900L, "nope", t0))
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    stream.addData(good ++ junk: _*)
    val q = graft.streaming.StreamCurate.run(spark,
      stream.toDS().toDF("doc_id", "text", "ingest_ts"), out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable(); q.stop()

    assert(TableFormat.isComplete(s"$out/epoch=0"), "epoch table not manifested")
    val got = TableFormat.load(spark, s"$out/epoch=0")
    assert(got.columns.toSet === Set("doc_id", "text"))
    // default rate 10000 bp = keep-all: every clean doc lands, junk doesn't
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(ids === good.map(_._1).toSet)
    assert(!ids.contains(900L), "junk doc admitted at ingest")
  }

  test("stream-stream interval join (attribution) equals the batch join on micro-batched input") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJoin
    val base = 1700000000L
    def ev(id: Long, sec: Long, u: Long, typ: String) =
      (id, new java.sql.Timestamp((base + sec) * 1000L), u, typ)
    // views before/inside/outside the 600 s window, cross-user decoys, and a
    // view arriving in a LATER micro-batch than its click (out-of-order)
    val events = Seq(
      ev(1, 0, 7, "view"), ev(2, 300, 7, "click"),    // in-window pair
      ev(3, 1000, 7, "view"), ev(4, 1450, 7, "click"), // in-window pair
      ev(5, 2200, 7, "click"),                         // view 3 too old (1200 s)
      ev(6, 100, 8, "view"), ev(7, 150, 9, "click"),   // user mismatch
      ev(8, 5000, 8, "click"), ev(9, 4800, 8, "view")) // view arrives later
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val joined = StreamJoin.attributeViews(
      stream.toDS().toDF("event_id", "ts", "user_id", "event_type"),
      lagMaxS = 600L, watermarkDelay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    events.grouped(3).foreach { g => stream.addData(g: _*); q.processAllAvailable() }
    q.processAllAvailable(); q.stop()
    val got = spark.table("attrib")
      .select("click_id", "view_id", "lag_s").as[(Long, Long, Long)].collect().toSet
    val batch = StreamJoin.attributeViews(
      events.toDF("event_id", "ts", "user_id", "event_type"), lagMaxS = 600L)
      .select("click_id", "view_id", "lag_s").as[(Long, Long, Long)].collect().toSet
    assert(batch === Set((2L, 1L, 300L), (4L, 3L, 450L), (8L, 9L, 200L)))
    assert(got === batch, "stream output diverged from the batch join")
  }

  test("streaming sessionization (flatMapGroupsWithState) equals batch gap-and-island on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamSessionize, StreamSessionize.Event
    def ev(u: Long, sec: Long) = Event(u, new java.sql.Timestamp(sec * 1000L))
    val base = 1700000000L
    val events = Seq(
      ev(1, base), ev(1, base + 60), ev(1, base + 5000),        // user1: sessions of 2 and 1
      ev(2, base + 10), ev(2, base + 1700), ev(2, base + 3600), // user2: sessions of 2 and 1
      ev(3, base + 100))                                        // user3: one singleton
    val stream = MemoryStream[Event]
    val out = StreamSessionize.sessions(spark, stream.toDS(), gapSeconds = 1800, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_stream").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    stream.addData(events: _*); q.processAllAvailable()
    // two flusher events push the watermark past every gap boundary so the
    // event-time timeouts fire and the open sessions close
    stream.addData(ev(999, base + 100000)); q.processAllAvailable()
    stream.addData(ev(999, base + 200000)); q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM sess_stream WHERE user_id <> 999")
    val batch = graft.operators.Sessionize.sessions(
      spark.createDataset(events).toDF(), "user_id", "ts", gapSeconds = 1800)
      .filter(col("user_id") =!= 999)
      .select("user_id", "session_start", "session_end", "n_events")
    assert(got.count() === 5)
    assert(got.exceptAll(batch).count() === 0, "stream-only sessions")
    assert(batch.exceptAll(got).count() === 0, "batch-only sessions")
  }

  test("sessionization handles OUT-OF-ORDER in-watermark events like the batch operator") {
    // an admissible event EARLIER than the open session must form its own
    // earlier session (or lower the start) — eagerly folding it into the
    // running session absorbs it silently and diverges from batch
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamSessionize, StreamSessionize.Event
    def ev(u: Long, sec: Long) = Event(u, new java.sql.Timestamp(sec * 1000L))
    val base = 1700000000L
    val stream = MemoryStream[Event]
    val out = StreamSessionize.sessions(spark, stream.toDS(), gapSeconds = 1800,
      watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("sess_ooo").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    stream.addData(ev(1, base + 3600)); q.processAllAvailable()
    // out of order but inside the 2 h watermark: one event a full hour
    // EARLIER (own session — gap is 30 min), one extending the open session
    stream.addData(ev(1, base), ev(1, base + 3620)); q.processAllAvailable()
    stream.addData(ev(999, base + 100000)); q.processAllAvailable()
    stream.addData(ev(999, base + 300000)); q.processAllAvailable()
    q.stop()
    val events = Seq(ev(1, base + 3600), ev(1, base), ev(1, base + 3620))
    val got = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM sess_ooo WHERE user_id <> 999")
    val batch = graft.operators.Sessionize.sessions(
      spark.createDataset(events).toDF(), "user_id", "ts", gapSeconds = 1800)
      .select("user_id", "session_start", "session_end", "n_events")
    assert(got.count() === 2, "early event must form its own session")
    assert(got.exceptAll(batch).count() === 0 && batch.exceptAll(got).count() === 0)
  }

  test("sessionization survives an event older than watermark+gap (timeout clamp)") {
    // regression guard: setTimeoutTimestamp throws (killing the query) if
    // handed a timestamp at or before the current watermark. With
    // EventTimeTimeout the operator drops input rows older than the watermark
    // BEFORE the state function, so a straggler must (a) not kill the query
    // and (b) not materialize a session; the clamp in StreamSessionize guards
    // the remaining boundary (timeout computed exactly at the watermark).
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamSessionize, StreamSessionize.Event
    def ev(u: Long, sec: Long) = Event(u, new java.sql.Timestamp(sec * 1000L))
    val base = 1700000000L
    val stream = MemoryStream[Event]
    val out = StreamSessionize.sessions(spark, stream.toDS(), gapSeconds = 1800, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_late").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    // advance the watermark far ahead…
    stream.addData(ev(999, base + 100000)); q.processAllAvailable()
    // …then deliver an event whose end+gap is far BEFORE the watermark
    stream.addData(ev(1, base)); q.processAllAvailable()
    // flush: advance the watermark twice more so any state the straggler
    // could have created would time out and surface
    stream.addData(ev(999, base + 200000)); q.processAllAvailable()
    stream.addData(ev(999, base + 300000)); q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    q.stop()
    val got = spark.sql("SELECT user_id, n_events FROM sess_late WHERE user_id = 1").collect()
    assert(got.isEmpty, "straggler older than the watermark must be dropped, not sessionized")
  }

  test("streaming pipeline: docs stream → annotate → triples per epoch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[InputDoc]
    val dict = spark.createDataset(Fixtures.entityDictionary()).toDF()
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString

    stream.addData(Fixtures.inputDocs(30): _*)
    // continuous micro-batch trigger: AvailableNow would stop before batch 2
    val q = StreamPipeline.run(spark, stream.toDS(), dict, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()

    stream.addData(Fixtures.inputDocs(60).drop(30): _*)
    q.processAllAvailable()
    q.stop()

    val triples = spark.read.option("basePath", out).parquet(s"$out/epoch=*")
    assert(triples.count() > 0)
    // both micro-batches landed, all five predicate families present somewhere
    val preds = triples.select("pred").distinct().as[String].collect().toSet
    assert(Set("mentions", "inDoc", "label", "category", "sameAs").subsetOf(preds))
    // doc coverage spans both epochs
    val docIds = triples.select("doc_id").distinct().count()
    assert(docIds >= 50, s"only $docIds docs covered")

    // STREAM == BATCH parity: the same 60 docs through the batch path must
    // yield the identical triple multiset, including canonical subjects and
    // sameAs edges (the dictionary plants shared aliases, so canonicalization
    // is non-trivial here)
    val batchDocs = spark.createDataset(Fixtures.inputDocs(60))
    val models = spark.sparkContext.broadcast(Pipeline.fixtureModels())
    val mentions = Pipeline.extractMentions(Pipeline.annotate(spark, batchDocs, models), "morph")
    val linked = graft.kg.Linker.link(mentions, dict)
    val entities = graft.kg.Canonicalize.canonicalize(spark, dict)
    val withCanon = linked
      .join(broadcast(entities.select(col("entity_id"), col("canonical_id"))), Seq("entity_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("entity_id")))
    val batchTriples = graft.kg.Triples.fromLinkedMentions(withCanon)
      .select("subj", "pred", "obj", "doc_id")
    val streamTriples = triples.select("subj", "pred", "obj", "doc_id")
    assert(streamTriples.exceptAll(batchTriples).count() === 0, "stream-only triples")
    assert(batchTriples.exceptAll(streamTriples).count() === 0, "batch-only triples")
    assert(batchTriples.filter(col("pred") === "sameAs").count() > 0)
  }

  test("streaming ingest into the ONE queryable store: graph parity, live manifest, epoch skip") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[InputDoc]
    val dict = spark.createDataset(Fixtures.entityDictionary()).toDF()
    val store = java.nio.file.Files.createTempDirectory("graft-stream-store").toString + "/triples"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-store-ckpt").toString

    stream.addData(Fixtures.inputDocs(30): _*)
    val q = StreamPipeline.runIntoStore(spark, stream.toDS(), dict, store, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()
    stream.addData(Fixtures.inputDocs(60).drop(30): _*)
    q.processAllAvailable()
    q.stop()

    // GRAPH parity vs the batch path: distinct (s,p,o) sets identical after
    // two epochs of incremental applyDelta commits
    val batchDocs = spark.createDataset(Fixtures.inputDocs(60))
    val models = spark.sparkContext.broadcast(Pipeline.fixtureModels())
    val mentions = Pipeline.extractMentions(Pipeline.annotate(spark, batchDocs, models), "morph")
    val linked = graft.kg.Linker.link(mentions, dict)
    val entities = graft.kg.Canonicalize.canonicalize(spark, dict)
    val batchGraph = graft.kg.Triples.fromLinkedMentions(
        linked.join(broadcast(entities.select(col("entity_id"), col("canonical_id"))), Seq("entity_id"), "left")
          .withColumn("canonical_id", coalesce(col("canonical_id"), col("entity_id"))))
      .select("subj", "pred", "obj").distinct()
    val loaded = graft.io.TableFormat.load(spark, store)
    val streamGraph = loaded.select("subj", "pred", "obj")
    // one row per (s,p,o) — the store invariant, so no .distinct() needed
    assert(streamGraph.count() === streamGraph.distinct().count())
    assert(streamGraph.exceptAll(batchGraph).count() === 0, "stream-only triples")
    assert(batchGraph.exceptAll(streamGraph).count() === 0, "batch-only triples")

    // provenance passenger survived the insert path (no all-NULL doc_id)
    assert(loaded.filter(col("doc_id").isNotNull).count() > 0)

    // the manifest merged per epoch: metadata stats == a fresh recount,
    // so SPARQL's metadata-only COUNT path is correct mid-stream
    assert(graft.kg.Pattern.predStatsFromManifest(store) ===
      graft.kg.Pattern.predStats(loaded))

    // SPARQL reads the store the stream built
    val n = graft.kg.Sparql.query(loaded,
      "SELECT (COUNT(*) AS ?n) WHERE { ?s inDoc ?o }",
      stats = Some(graft.kg.Pattern.predStatsFromManifest(store)))
      .as[Long].head()
    assert(n > 0)

    // exactly-once: replaying the LAST epoch's commit is a skip (stamp
    // matches), and the store is unchanged
    val before = streamGraph.collect().toSet
    val fields = graft.io.TableFormat.readManifest(store).fields
    assert(fields.contains("update_id") && fields("update_id").endsWith(":1"))
    val rep = graft.kg.Update.applyDelta(spark, store,
      graft.kg.Update.noTriples(spark), graft.kg.Update.noTriples(spark))
    assert(rep.touchedLeaves === 0)
    assert(graft.io.TableFormat.load(spark, store).select("subj", "pred", "obj")
      .collect().toSet === before)
  }

  test("streaming HLL: register state across micro-batches equals the batch sketch") {
    // ingest-time cardinality tracking: hllRegisters is a plain groupBy-max,
    // so the SAME operator runs over a stream in complete mode — Spark keeps
    // the registers as aggregation state and the max-merge across
    // micro-batches is exactly the sketch's merge operation. Re-ingested
    // keys (batch overlap below) cannot inflate the registers.
    import graft.datapipe.Sketch
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val regs = Sketch.hllRegisters(stream.toDF().toDF("g", "k"), col("k"), Seq("g"))
    val q = regs.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    val b1 = (0 until 1500).map(i => ("a", s"x$i"))
    val b2 = (1000 until 2500).map(i => ("a", s"x$i")) // 500 keys re-ingested
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT g, reg, maxl FROM hll_stream")
    val batch = Sketch.hllRegisters((b1 ++ b2).toDF("g", "k"), col("k"), Seq("g"))
    assert(got.exceptAll(batch).count() === 0, "stream-only registers")
    assert(batch.exceptAll(got).count() === 0, "batch-only registers")
    val eS = Sketch.hllEstimate(got, Seq("g")).select("hll_est").as[Long].head()
    val eB = Sketch.hllEstimate(batch, Seq("g")).select("hll_est").as[Long].head()
    assert(eS === eB)
    assert(math.abs(eS - 2500.0) / 2500 < 0.20, s"est=$eS for true 2500")
  }

  test("streaming CDC with an op column applies upserts AND deletes per epoch") {
    import graft.io.Snapshots
    import graft.streaming.StreamUpsert
    implicit val sqlCtx = spark.sqlContext
    val tbl = java.nio.file.Files.createTempDirectory("graft-cdc").toString + "/tbl"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val stream = MemoryStream[(Long, String, Long, String)] // (id, v, ver, op)
    val q = StreamUpsert.run(spark, stream.toDS().toDF("id", "v", "ver", "op"),
      tbl, "id", "ver", ckpt, buckets = 2, statsCols = Seq("id"),
      opCol = Some("op"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    stream.addData((1L, "a", 1L, "upsert"), (2L, "b", 1L, "upsert"),
      (3L, "c", 1L, "upsert"))
    q.processAllAvailable()
    // epoch 2: delete 2; for key 3 a delete at ver 2 is SUPERSEDED by an
    // upsert at ver 3 (last-writer-wins across ops); insert 4
    stream.addData((2L, "", 2L, "delete"), (3L, "", 2L, "delete"),
      (3L, "c2", 3L, "upsert"), (4L, "d", 1L, "upsert"))
    q.processAllAvailable(); q.stop()
    val got = Snapshots.load(spark, tbl)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 3L -> "c2", 4L -> "d"))
    // an unknown op value fails loudly
    val e = intercept[Exception](StreamUpsert.upsertBatch(
      Seq((9L, "x", 1L, "replace")).toDF("id", "v", "ver", "op"),
      tbl, "id", "ver", 2, "manual-bad-op", opCol = Some("op")))
    assert(e.getMessage.contains("unknown"))
    // at-least-once redelivery: IDENTICAL duplicate rows are benign — only
    // rows sharing (key, version) while disagreeing elsewhere are fatal
    assert(StreamUpsert.upsertBatch(
      Seq((7L, "dup", 1L, "upsert"), (7L, "dup", 1L, "upsert"))
        .toDF("id", "v", "ver", "op"),
      tbl, "id", "ver", 2, "manual-dup", opCol = Some("op")))
    assert(Snapshots.load(spark, tbl).select("id", "v").as[(Long, String)]
      .collect().toMap.apply(7L) === "dup")
    // a delete-only batch on a table that exists commits a pure-delete merge
    assert(StreamUpsert.upsertBatch(
      Seq((4L, "", 9L, "delete")).toDF("id", "v", "ver", "op"),
      tbl, "id", "ver", 2, "manual-del", opCol = Some("op")))
    assert(!Snapshots.load(spark, tbl).select("id").as[Long]
      .collect().toSet.contains(4L))
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(tbl).getParentFile); rm(new java.io.File(ckpt))
  }

  test("streaming upsert sink: CDC stream merges each epoch exactly once") {
    import graft.io.Snapshots
    import graft.streaming.StreamUpsert
    implicit val sqlCtx = spark.sqlContext
    val tbl = java.nio.file.Files.createTempDirectory("graft-supsert").toString + "/tbl"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-supsert-ckpt").toString
    val stream = MemoryStream[(Long, String, Long)] // (id, v, ver)
    val q = StreamUpsert.run(spark, stream.toDS().toDF("id", "v", "ver"),
      tbl, "id", "ver", ckpt, buckets = 2, statsCols = Seq("id"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    stream.addData((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
    q.processAllAvailable()
    // epoch 2: an update, an insert, and an in-batch superseded row for 4
    stream.addData((2L, "b2", 2L), (4L, "d", 1L), (4L, "d2", 2L))
    q.processAllAvailable(); q.stop()
    val got = Snapshots.load(spark, tbl)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d2"))
    // log shape: initial commit then one CoW merge per non-empty epoch
    val snaps = Snapshots.snapshots(tbl)
    assert(snaps.map(_.op) === Vector("append", "merge"), snaps.map(_.op))
    assert(snaps.forall(_.stage.startsWith("upsert-")))
    // exactly-once: replaying a committed epoch's stage is a no-op
    val replay = Seq((2L, "GHOST", 2L)).toDF("id", "v", "ver")
    assert(!StreamUpsert.upsertBatch(replay, tbl, "id", "ver", 2, snaps.last.stage))
    assert(Snapshots.snapshots(tbl).map(_.id) === snaps.map(_.id))
    assert(Snapshots.load(spark, tbl).select("id", "v").as[(Long, String)]
      .collect().toMap.apply(2L) === "b2")
    // contradictory rows sharing (key, version) fail loudly
    val bad = Seq((9L, "x", 1L), (9L, "y", 1L)).toDF("id", "v", "ver")
    val e = intercept[Exception](
      StreamUpsert.upsertBatch(bad, tbl, "id", "ver", 2, "manual-bad"))
    assert(e.getMessage != null)
    // empty delta is a no-op, not an empty snapshot
    assert(!StreamUpsert.upsertBatch(
      Seq.empty[(Long, String, Long)].toDF("id", "v", "ver"),
      tbl, "id", "ver", 2, "manual-empty"))
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(tbl).getParentFile); rm(new java.io.File(ckpt))
  }

  test("streaming dedup admission: persistent store blocks cross-epoch dups, equals batch") {
    import graft.io.Snapshots
    import graft.streaming.StreamDedup
    import graft.datapipe.Dedup
    implicit val sqlCtx = spark.sqlContext
    val tbl = java.nio.file.Files.createTempDirectory("graft-sdedup").toString + "/tbl"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdedup-ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val fp = md5(col("text"))
    val q = StreamDedup.run(spark, stream.toDS().toDF("doc_id", "text"),
      tbl, "doc_id", fp, ckpt, buckets = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    // epoch 1: an internal dup pair (1,2) and a unique doc
    stream.addData((1L, "AAAA"), (2L, "AAAA"), (3L, "BBBB"))
    q.processAllAvailable()
    // epoch 2: a cross-EPOCH dup of A (must be blocked by the STORE — this
    // is precisely what watermarked stream dedup cannot promise), plus fresh
    stream.addData((10L, "AAAA"), (11L, "CCCC"))
    q.processAllAvailable(); q.stop()
    val got = Snapshots.load(spark, tbl)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 3L, 11L))
    // equals the batch incremental admission run epoch-by-epoch
    val e1 = Seq((1L, "AAAA"), (2L, "AAAA"), (3L, "BBBB")).toDF("doc_id", "text")
    val e2 = Seq((10L, "AAAA"), (11L, "CCCC")).toDF("doc_id", "text")
    val b1 = Dedup.incrementalDedup(
      Seq.empty[String].toDF("fp"), e1, "doc_id", fp)
    val b2 = Dedup.incrementalDedup(b1.select("fp"), e2, "doc_id", fp)
    assert(b1.select("doc_id").as[Long].collect().toSet
      ++ b2.select("doc_id").as[Long].collect().toSet === got)
    // exactly-once: replaying a committed epoch's stage is a no-op
    val snaps = Snapshots.snapshots(tbl)
    assert(snaps.length === 2 && snaps.forall(_.stage.startsWith("dedup-")))
    assert(!StreamDedup.admitBatch(e2, tbl, "doc_id", fp, 2, snaps.last.stage))
    assert(Snapshots.snapshots(tbl).map(_.id) === snaps.map(_.id))
    // an all-duplicate batch admits nothing and commits nothing
    assert(!StreamDedup.admitBatch(
      Seq((20L, "AAAA"), (21L, "BBBB")).toDF("doc_id", "text"),
      tbl, "doc_id", fp, 2, "manual-dups"))
    assert(Snapshots.snapshots(tbl).length === 2)
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(tbl).getParentFile); rm(new java.io.File(ckpt))
  }
}
