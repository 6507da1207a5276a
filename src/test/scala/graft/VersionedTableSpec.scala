package graft

import org.apache.spark.sql.functions._

import graft.batch.VersionedTable

/** The manifest commit protocol end to end: append/overwrite versions,
  * time travel, snapshot isolation against a concurrent commit, MERGE
  * as a new version, vacuum reclaiming only unreferenced files, and
  * torn-manifest invisibility. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vtable").toString

  test("append and overwrite commits version; time travel reads any retained version") {
    val root = tmp()
    val v1 = VersionedTable.commit(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = VersionedTable.commit(spark, root, Seq((3L, "c")).toDF("id", "v"))
    val v3 = VersionedTable.commit(spark, root,
      Seq((9L, "z")).toDF("id", "v"), overwrite = true)
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(VersionedTable.read(spark, root).as[(Long, String)].collect().toSet == Set((9L, "z")))
    assert(VersionedTable.read(spark, root, Some(2L)).count() == 3)
    assert(VersionedTable.read(spark, root, Some(1L)).count() == 2)
    assert(VersionedTable.versions(conf, root) == Seq(1L, 2L, 3L))
  }

  test("snapshot isolation: a frame resolved before a commit keeps its file set") {
    val root = tmp()
    VersionedTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val before = VersionedTable.read(spark, root) // resolves v1's files NOW
    VersionedTable.commit(spark, root, Seq((2L, "b")).toDF("id", "v"), overwrite = true)
    assert(before.as[(Long, String)].collect().toSet == Set((1L, "a")),
      "reader planned at v1 must not see v2")
    assert(VersionedTable.read(spark, root).as[(Long, String)].collect().toSet == Set((2L, "b")))
  }

  test("mergeCommit: upsert lands as a new version, history intact") {
    val root = tmp()
    val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
    VersionedTable.mergeCommit(spark, root, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "px"), Seq("id"), ts1)
    VersionedTable.mergeCommit(spark, root, Seq((2L, 25.0), (3L, 30.0)).toDF("id", "px"), Seq("id"), ts2)
    val now = VersionedTable.read(spark, root)
      .select($"id", $"px").as[(Long, Double)].collect().toSet
    assert(now == Set((1L, 10.0), (2L, 25.0), (3L, 30.0)))
    val was = VersionedTable.read(spark, root, Some(1L))
      .select($"id", $"px").as[(Long, Double)].collect().toSet
    assert(was == Set((1L, 10.0), (2L, 20.0)))
    // the stamp discriminates the two loads
    val stamps = VersionedTable.read(spark, root)
      .select($"id", $"last_updated".cast("string")).as[(Long, String)].collect().toMap
    assert(stamps(1L).startsWith("2026-01-01") && stamps(2L).startsWith("2026-01-02"))
  }

  test("vacuum drops unretained versions' files but never a retained reference") {
    val root = tmp()
    VersionedTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))           // v1
    VersionedTable.commit(spark, root, Seq((2L, "b")).toDF("id", "v"))           // v2 = v1 files + new
    VersionedTable.commit(spark, root, Seq((3L, "c")).toDF("id", "v"), overwrite = true) // v3 fresh
    val deleted = VersionedTable.vacuum(spark, root, retainLast = 1)
    // v1's and v2's files are referenced by nothing retained -> gone
    assert(deleted.nonEmpty)
    assert(VersionedTable.versions(conf, root) == Seq(3L))
    assert(VersionedTable.read(spark, root).as[(Long, String)].collect().toSet == Set((3L, "c")))

    // retained references survive: append chain where v_latest still
    // points at the first commit's files
    val root2 = tmp()
    VersionedTable.commit(spark, root2, Seq((1L, "a")).toDF("id", "v"))
    VersionedTable.commit(spark, root2, Seq((2L, "b")).toDF("id", "v"))
    val del2 = VersionedTable.vacuum(spark, root2, retainLast = 1)
    assert(del2.isEmpty, "v2 references v1's files — nothing may be deleted")
    assert(VersionedTable.read(spark, root2).count() == 2)
  }

  test("batch-stamped mergeCommit is idempotent: a replayed micro-batch commits nothing") {
    val root = tmp()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val batch = Seq((1L, 10.0)).toDF("id", "px")
    val v1 = VersionedTable.mergeCommit(spark, root, batch, Seq("id"), ts, batchId = Some(7L))
    val v2 = VersionedTable.mergeCommit(spark, root, batch, Seq("id"), ts, batchId = Some(7L)) // replay
    assert(v1 == v2 && VersionedTable.versions(conf, root) == Seq(v1),
      "replaying the same batch id must not create a version")
    val v3 = VersionedTable.mergeCommit(spark, root,
      Seq((1L, 11.0)).toDF("id", "px"), Seq("id"), ts, batchId = Some(8L))
    assert(v3 == v1 + 1)
    assert(VersionedTable.read(spark, root).select($"px").as[Double].head() == 11.0)
  }

  test("compact rewrites the file set as a new version; rows and history intact") {
    val root = tmp()
    (1 to 5).foreach(i =>
      VersionedTable.commit(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val filesBefore = VersionedTable.read(spark, root).inputFiles.length
    assert(filesBefore >= 5, "append chain should have accumulated small files")
    val cv = VersionedTable.compact(spark, root, numFiles = 1)
    assert(VersionedTable.read(spark, root).inputFiles.length == 1)
    assert(VersionedTable.read(spark, root).count() == 5)
    // pre-compaction version still time-travels to the same rows
    assert(VersionedTable.read(spark, root, Some(cv - 1)).count() == 5)
  }

  test("the commit point never replaces an existing version's manifest") {
    // RawLocal/ChecksumFileSystem rename delegates to POSIX rename(2),
    // which silently clobbers — the FileContext Rename.NONE commit
    // must instead report the race lost and leave the winner intact.
    val root = tmp()
    VersionedTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val winner = VersionedTable.read(spark, root).inputFiles.toSet
    val won = VersionedTable.writeManifest(conf, root, 1L, "append", Seq("/loser.parquet"))
    assert(!won, "writing v1 again must lose, not clobber")
    assert(VersionedTable.read(spark, root).inputFiles.toSet == winner,
      "the winning manifest's file set must be untouched")
    // and no .tmp debris is left behind
    val leftovers = new java.io.File(s"$root/_manifests").listFiles()
      .map(_.getName).filter(_.startsWith(".tmp"))
    assert(leftovers.isEmpty, s"tmp debris: ${leftovers.mkString(",")}")
  }

  test("a zero-file version reads as an empty frame and never wedges the table") {
    val root = tmp()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    VersionedTable.mergeCommit(spark, root, Seq((1L, 10.0)).toDF("id", "px"), Seq("id"), ts)
    // an overwrite whose frame is empty (e.g. a micro-batch fully
    // dropped by cleaning) writes NO part files — the manifest's
    // schema header must carry the reader through
    val empty = VersionedTable.commit(spark, root,
      VersionedTable.read(spark, root).limit(0), overwrite = true)
    val frame = VersionedTable.read(spark, root, Some(empty))
    assert(frame.count() == 0)
    assert(frame.columns.toSeq == Seq("id", "px", "last_updated"),
      "schema survives an empty version")
    // the table is NOT wedged: the next merge reads the (empty) head fine
    VersionedTable.mergeCommit(spark, root, Seq((2L, 20.0)).toDF("id", "px"), Seq("id"), ts)
    assert(VersionedTable.read(spark, root).count() == 1)
  }

  test("deleteKeys: head stops serving, time travel still serves, vacuum forgets") {
    val root = tmp()
    VersionedTable.commit(spark, root,
      Seq((1L, "keep"), (2L, "gdpr"), (3L, "keep")).toDF("id", "v"))
    val dv = VersionedTable.deleteKeys(spark, root, Seq("id"), Seq(Tuple1(2L)).toDF("id"))
    assert(VersionedTable.read(spark, root).select("id").as[Long].collect().toSet == Set(1L, 3L),
      "head version must no longer serve the deleted key")
    assert(VersionedTable.read(spark, root, Some(dv - 1))
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "pre-delete version still serves it — deletion is a version event")
    // vacuum to the delete version: the bytes leave disk
    VersionedTable.vacuum(spark, root, retainLast = 1)
    assert(VersionedTable.versions(conf, root) == Seq(dv))
    assert(VersionedTable.read(spark, root).count() == 2)
    // deleteWhere form
    VersionedTable.deleteWhere(spark, root, $"id" === 3L)
    assert(VersionedTable.read(spark, root).select("id").as[Long].collect().toSet == Set(1L))
  }

  test("deleteKeys rewrites ONLY files containing doomed rows; the rest carry by reference") {
    val root = tmp()
    // 4 append commits -> 4+ distinct files, disjoint key ranges
    (0 until 4).foreach(g =>
      VersionedTable.commit(spark, root,
        (g * 10 until g * 10 + 5).map(i => (i.toLong, s"v$i")).toDF("id", "v")))
    val before = VersionedTable.read(spark, root).inputFiles.toSet
    assert(before.size >= 4)
    // delete one key: it lives in exactly one commit's file(s)
    val dv = VersionedTable.deleteKeys(spark, root, Seq("id"), Seq(Tuple1(12L)).toDF("id"))
    val after = VersionedTable.read(spark, root).inputFiles.toSet
    assert(!VersionedTable.read(spark, root).select("id").as[Long].collect().contains(12L))
    assert(VersionedTable.read(spark, root).count() == 19)
    val carried = before & after
    assert(carried.size >= 3,
      s"untouched files must carry by reference: before ${before.size}, carried ${carried.size}")
    assert((after -- before).nonEmpty, "the touched file must have been rewritten")
    // deleting a key that exists nowhere rewrites NOTHING
    val dv2 = VersionedTable.deleteKeys(spark, root, Seq("id"), Seq(Tuple1(999L)).toDF("id"))
    assert(dv2 == dv + 1)
    assert(VersionedTable.read(spark, root).inputFiles.toSet == after,
      "a no-match delete must carry every file by reference")
    assert(VersionedTable.read(spark, root).count() == 19)
  }

  test("a torn (.tmp) manifest is invisible to readers") {
    val root = tmp()
    VersionedTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    // simulate a writer that died before its commit-point rename
    val torn = new java.io.File(s"$root/_manifests/.tmp-dead")
    java.nio.file.Files.writeString(torn.toPath, "version=99 action=append nFiles=1\n/nope.parquet\n")
    assert(VersionedTable.versions(conf, root) == Seq(1L))
    assert(VersionedTable.read(spark, root).count() == 1)
  }
}
