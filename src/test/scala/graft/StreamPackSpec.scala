package graft

import graft.streaming.{EventTimeOps, StreamingPack}
import graft.streaming.StreamingPack.{DocToks, PackedSeq, SeqPacker}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** MemoryStream harness for the continuous sequence packer (gate qem):
  * batch-split invariance, exactly-once emission of boundary-spanning
  * sequences, shard independence, and agreement with a brute-force
  * reference packer. */
class StreamPackSpec extends SparkSpec {
  import spark.implicits._

  private def runPack(batches: Seq[Seq[DocToks]], seqLen: Int): Seq[PackedSeq] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[DocToks]
    val ds = mem.toDS()
      .withColumn("ts", timestamp_micros(col("docId") * 1000000L))
      .withWatermark("ts", "0 seconds")
      .drop("ts").as[DocToks]
    val packed = EventTimeOps.ordered(ds, (d: DocToks) => d.key, new SeqPacker(seqLen))
    val name = s"pack_sink_${System.nanoTime()}"
    val q = packed.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(); q.processAllAvailable() // final watermark nudge
    } finally q.stop()
    spark.table(name).as[PackedSeq].collect().toSeq
  }

  /** Brute-force reference: concat each shard's tokens in docId order,
    * chunk at seqLen, keep complete chunks, count contributing docs. */
  private def reference(docs: Seq[DocToks], seqLen: Int): Seq[PackedSeq] =
    docs.groupBy(_.key).toSeq.flatMap { case (k, ds) =>
      val stream = ds.sortBy(_.docId).flatMap(d => d.toks.map(t => (d.docId, t)))
      stream.grouped(seqLen).zipWithIndex.collect {
        case (chunk, i) if chunk.length == seqLen =>
          PackedSeq(k, i.toLong, seqLen.toLong,
            chunk.map(_._1).distinct.length.toLong, chunk.map(_._2).mkString(" "))
      }.toSeq
    }

  private def doc(key: String, id: Long, text: String) =
    DocToks(key, id, text.split("\\s+").filter(_.nonEmpty))

  private val fixture = Seq(
    doc("en", 1, "a b c d e"), doc("en", 2, "f g"), doc("en", 3, ""),
    doc("en", 4, "h i j k l m n o p q"), doc("en", 5, "r"),
    doc("de", 1, "x y z"), doc("de", 2, "u v w q1 q2 q3 q4"))

  test("single batch matches the brute-force packer") {
    val got = runPack(Seq(fixture), seqLen = 4)
    assert(got.sortBy(p => (p.lang, p.seq_id)) ===
      reference(fixture, 4).sortBy(p => (p.lang, p.seq_id)))
  }

  test("output is batch-split invariant and boundary sequences emit exactly once") {
    val whole = runPack(Seq(fixture), seqLen = 4)
    // split so en doc 4 (which closes sequences started in earlier batches)
    // arrives alone, then the rest
    val split = runPack(Seq(fixture.take(3), Seq(fixture(3)), fixture.drop(4)), seqLen = 4)
    assert(split.sortBy(p => (p.lang, p.seq_id)) ===
      whole.sortBy(p => (p.lang, p.seq_id)))
    // no duplicate seq ids per shard
    assert(split.groupBy(p => (p.lang, p.seq_id)).forall(_._2.length == 1))
  }

  test("trailing partials stay open; shards pack independently") {
    val got = runPack(Seq(fixture), seqLen = 4)
    // en: 18 tokens -> 4 complete seqs (2 tokens open); de: 10 -> 2 (+2 open)
    assert(got.count(_.lang == "en") === 4)
    assert(got.count(_.lang == "de") === 2)
    assert(got.forall(_.n_toks == 4))
    // en seq 0 = docs 1 (a b c d); seq 1 = docs 1+2+4 (e f g h)
    val en = got.filter(_.lang == "en").sortBy(_.seq_id)
    assert(en(0).seq_text === "a b c d" && en(0).n_docs === 1)
    assert(en(1).seq_text === "e f g h" && en(1).n_docs === 3)
  }

  test("zero-token docs contribute nothing, including to n_docs") {
    val withEmpty = runPack(Seq(fixture), seqLen = 4)
    val without = runPack(Seq(fixture.filterNot(d => d.key == "en" && d.docId == 3)), seqLen = 4)
    assert(withEmpty.sortBy(p => (p.lang, p.seq_id)) ===
      without.sortBy(p => (p.lang, p.seq_id)))
  }

  test("ChunkClaim: first arrival wins across batches, later occurrences " +
    "suppressed, distinct fingerprints independent") {
    import graft.streaming.StreamingDedup.{ChunkClaim, ChunkRow, KeptChunk}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[ChunkRow]
    val ds = mem.toDS()
      .withColumn("ts", timestamp_micros(col("docId") * 1000000L))
      .withWatermark("ts", "0 seconds")
      .drop("ts").as[ChunkRow]
    val kept = EventTimeOps.ordered(ds, (r: ChunkRow) => r.key, new ChunkClaim)
    val name = s"claim_sink_${System.nanoTime()}"
    val q = kept.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: doc 1 claims chunk A twice (within-doc repeat) + chunk B
      mem.addData(ChunkRow(100L, 10L, 1L, 0L, "A"),
        ChunkRow(100L, 10L, 1L, 2L, "A"), ChunkRow(200L, 20L, 1L, 1L, "B"))
      q.processAllAvailable()
      // batch 2: doc 2 re-presents A and B (suppressed) + new chunk C
      mem.addData(ChunkRow(100L, 10L, 2L, 0L, "A"),
        ChunkRow(200L, 20L, 2L, 1L, "B"), ChunkRow(300L, 30L, 2L, 2L, "C"))
      q.processAllAvailable()
      mem.addData(); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).as[KeptChunk].collect().toSet
    assert(got === Set(KeptChunk(1L, 0L, "A"), KeptChunk(1L, 1L, "B"),
      KeptChunk(2L, 2L, "C")))
  }

  test("ChunkClaim: a first-fingerprint COLLISION keeps both distinct " +
    "chunks (double-fingerprint armor), while true duplicates still suppress") {
    import graft.streaming.StreamingDedup.{ChunkClaim, ChunkRow, KeptChunk}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[ChunkRow]
    val ds = mem.toDS()
      .withColumn("ts", timestamp_micros(col("docId") * 1000000L))
      .withWatermark("ts", "0 seconds")
      .drop("ts").as[ChunkRow]
    val kept = EventTimeOps.ordered(ds, (r: ChunkRow) => r.key, new ChunkClaim)
    val name = s"claim_collide_sink_${System.nanoTime()}"
    val q = kept.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      // planted collision: X and Y are DISTINCT chunks sharing key=999
      // (what a 64-bit birthday hit looks like at ~4e9 distinct chunks) —
      // a single-fingerprint claim would silently delete Y from doc 1
      mem.addData(ChunkRow(999L, 1L, 1L, 0L, "X"),
        ChunkRow(999L, 2L, 1L, 1L, "Y"))
      q.processAllAvailable()
      // true re-occurrences of both (same key AND key2) suppress, a
      // THIRD distinct chunk on the same hot key still keeps
      mem.addData(ChunkRow(999L, 1L, 2L, 0L, "X"),
        ChunkRow(999L, 2L, 2L, 1L, "Y"), ChunkRow(999L, 3L, 2L, 2L, "Z"))
      q.processAllAvailable()
      mem.addData(); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).as[KeptChunk].collect().toSet
    assert(got === Set(KeptChunk(1L, 0L, "X"), KeptChunk(1L, 1L, "Y"),
      KeptChunk(2L, 2L, "Z")))
  }

  test("randomized fuzz against the reference across batch splits") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val docs = (1 to 30).map { i =>
        val k = if (rnd.nextBoolean()) "a" else "b"
        DocToks(k, i.toLong, Array.fill(rnd.nextInt(9))(s"t${rnd.nextInt(50)}"))
      }
      val cut1 = rnd.nextInt(docs.length)
      val cut2 = cut1 + rnd.nextInt(docs.length - cut1)
      val batches = Seq(docs.take(cut1), docs.slice(cut1, cut2), docs.drop(cut2))
      val got = runPack(batches, seqLen = 5)
      assert(got.sortBy(p => (p.lang, p.seq_id)) ===
        reference(docs, 5).sortBy(p => (p.lang, p.seq_id)), s"trial $trial")
    }
  }
}
