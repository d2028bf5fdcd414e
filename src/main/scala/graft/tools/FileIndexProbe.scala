package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{ColStat, ColumnDef, FileEntry, GraftFileIndex}

/** Plan-time cost of the manifest-backed FileIndex vs FILE COUNT
  * (round-16 verdict task #2). The 100-TB claim for
  * [[graft.lake.GraftFileIndex]] is structural — zero store listing,
  * O(files × conjuncts) driver-side prune loop — but was unmeasured
  * past ~10³ entries. This probe builds synthetic manifests of
  * 10³/10⁴/10⁵/10⁶ entries (realistic stats: two stat columns with
  * min/max/null counts and a pvals set) and measures, per size:
  *
  *  - blob-load ms: JSON parse of the N-entry manifest blob (the same
  *    json4s extract the ManifestStore blob loader runs on a cold read);
  *  - listFiles ms per pushed-predicate shape (point equality, range
  *    conjunction, 3-conjunct mixed, IS NULL) over the fabricated
  *    entries, min of 5 reps, plus the kept-file count proving the
  *    prune actually bites.
  *
  * Everything is driver-side — no SparkSession, no filesystem: exactly
  * the code the planner runs. Expected and (round-17) measured shape:
  * linear in N with a small constant (~100 ns/entry/conjunct); results
  * table in BASELINE.md.
  *
  * Usage: `sbt "runMain graft.tools.FileIndexProbe"` */
object FileIndexProbe {
  def main(args: Array[String]): Unit = {
    implicit val fmts: org.json4s.Formats =
      org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)
    val cols = Seq(
      ColumnDef(1, "id", "\"long\"", None),
      ColumnDef(2, "k", "\"string\"", None),
      ColumnDef(3, "day", "\"long\"", None))
    val idAttr = AttributeReference("id", LongType)()
    val kAttr = AttributeReference("k", StringType)()
    val dayAttr = AttributeReference("day", LongType)()
    def entries(n: Int): Seq[FileEntry] = (0 until n).map { i =>
      FileEntry(
        path = f"data/part-$i%06d.parquet",
        sizeBytes = 128L * 1024 * 1024,
        rowCount = 100000L,
        schemaVersion = 1,
        stats = Map(
          "id" -> ColStat((i * 1000L).toString, (i * 1000L + 999).toString,
            Some(0L)),
          "k" -> ColStat(f"c${i % 97}%03d", f"c${i % 97 + 3}%03d",
            Some(if (i % 5 == 0) 10L else 0L))),
        pvals = Map("day" -> Seq((i % 30).toString)))
    }
    for (n <- Seq(1000, 10000, 100000, 1000000)) {
      val es = entries(n)
      // blob-load leg: the manifest's JSON round-trip at this entry count
      val json = org.json4s.jackson.Serialization.write(es)
      var parsed: Seq[FileEntry] = Nil
      val loadMs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        parsed = org.json4s.jackson.JsonMethods.parse(json)
          .extract[Seq[FileEntry]]
        (System.nanoTime() - t0) / 1e6
      }.min
      require(parsed.size == n)
      // multi-blob cold load: a long-lived table's entries arrive in
      // many per-commit blobs and Manifest.load parses uncached blobs
      // in PARALLEL — this leg is that shape (64 blobs, global EC)
      val blobJsons = es.grouped(math.max(1, n / 64)).toSeq
        .map(org.json4s.jackson.Serialization.write(_))
      val parMs = (1 to 3).map { _ =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val t0 = System.nanoTime()
        val total = Await.result(Future.sequence(blobJsons.map(j =>
          Future(org.json4s.jackson.JsonMethods.parse(j)
            .extract[Seq[FileEntry]].size))), Duration.Inf).sum
        require(total == n)
        (System.nanoTime() - t0) / 1e6
      }.min
      val fi = new GraftFileIndex(new Path("/lake/t"), es, cols,
        p => new Path("/lake/t/" + p), (_, _) => true)
      val mid = n / 2 * 1000L
      val preds = Seq(
        "point_eq" -> Seq[Expression](EqualTo(idAttr, Literal(mid))),
        "range" -> Seq[Expression](
          GreaterThanOrEqual(idAttr, Literal(mid)),
          LessThan(idAttr, Literal(mid + 100000L))),
        "conj3_mixed" -> Seq[Expression](
          IsNotNull(kAttr),
          EqualTo(kAttr, Literal(UTF8String.fromString("c010"), StringType)),
          EqualTo(dayAttr, Literal(7L))),
        "is_null" -> Seq[Expression](IsNull(kAttr)))
      for ((name, ps) <- preds) {
        var kept = -1L
        val ms = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          kept = fi.listFiles(Nil, ps).map(_.files.size.toLong).sum
          (System.nanoTime() - t0) / 1e6
        }.min
        println(f"""{"probe":"file_index","entries":$n,"leg":"$name","list_ms":$ms%.2f,"kept":$kept,"blob_load_ms":$loadMs%.1f,"par64_load_ms":$parMs%.1f,"json_mb":${json.length / 1e6}%.1f}""")
      }
    }
  }
}
