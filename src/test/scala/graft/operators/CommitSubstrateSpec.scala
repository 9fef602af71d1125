package graft.operators

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** The atomic-publish substrate seam (Delta's LogStore split, enforced):
  * rename-atomic filesystems get rename-no-replace, object stores get
  * put-if-absent ONLY by explicit opt-in, and anything else refuses
  * loudly — a silently-replacing rename must never reach the commit
  * log. */
class CommitSubstrateSpec extends AnyFunSuite {

  private val T = WriteOps.SnapshotTable

  test("rename-atomic schemes route to the rename substrate") {
    assert(T.substrateFor("hdfs") eq T.RenameSubstrate)
    assert(T.substrateFor("file") eq T.RenameSubstrate)
    assert(T.substrateFor("viewfs") eq T.RenameSubstrate)
    assert(T.substrateFor(null) eq T.RenameSubstrate) // schemeless local
  }

  test("an object-store scheme without the opt-in refuses loudly") {
    Seq("s3a", "gs", "abfs", "wasb", "oss").foreach { s =>
      val e = intercept[UnsupportedOperationException](T.substrateFor(s))
      assert(e.getMessage.contains("atomic publish"))
      assert(e.getMessage.contains("PUTIFABSENT"),
        "the refusal must carry the opt-in instructions")
    }
  }

  test("opted-in schemes get put-if-absent, whose publish REFUSES an " +
      "existing destination even where rename would silently replace") {
    sys.props("graft.putifabsent.schemes") = "s3a, gs"
    try {
      val sub = T.substrateFor("s3a")
      assert(sub eq T.PutIfAbsentSubstrate)
      assert(T.substrateFor("gs") eq T.PutIfAbsentSubstrate)
      // drive the substrate on the LOCAL filesystem — exactly the
      // substrate whose rename() silently replaces — and prove the
      // publish path refuses instead of clobbering the winner
      val dir = Files.createTempDirectory("g_substrate")
      val fs = FileSystem.getLocal(new Configuration())
      def put(name: String, body: String): HPath = {
        val p = new HPath(dir.resolve(name).toString)
        val out = fs.create(p, true)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        p
      }
      val staged = put("staged", "loser bytes")
      val committed = put("committed", "winner bytes")
      intercept[java.nio.file.FileAlreadyExistsException](
        sub.publishNoReplace(fs, staged, committed))
      val in = fs.open(committed)
      val kept =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      assert(kept === "winner bytes", "the loser overwrote the winner")
      // and a fresh destination publishes, consuming the staged file
      val fresh = new HPath(dir.resolve("fresh").toString)
      sub.publishNoReplace(fs, staged, fresh)
      val in2 = fs.open(fresh)
      val got =
        try scala.io.Source.fromInputStream(in2, "UTF-8").mkString
        finally in2.close()
      assert(got === "loser bytes")
      assert(!fs.exists(staged), "staged source must be consumed")
    } finally sys.props -= "graft.putifabsent.schemes"
  }

  test("put-if-absent surfaces transient store failures instead of " +
      "misreporting them as a lost commit race") {
    sys.props("graft.putifabsent.schemes") = "s3a"
    try {
      val sub = T.substrateFor("s3a")
      val dir = Files.createTempDirectory("g_substrate_err")
      val real = FileSystem.getLocal(new Configuration())
      val staged = new HPath(dir.resolve("staged").toString)
      val out = real.create(staged, true)
      try out.write("bytes".getBytes("UTF-8")) finally out.close()
      // a store whose create() fails TRANSIENTLY (network) — a genuine
      // store error, not a conditional-put conflict: the caller's
      // rebase-retry loop must SEE it, not spin 4 times against a
      // broken store on a bogus "lost the race" diagnosis
      val fs = new org.apache.hadoop.fs.FilterFileSystem(real) {
        override def create(p: HPath, overwrite: Boolean)
            : org.apache.hadoop.fs.FSDataOutputStream =
          throw new java.io.IOException("connection reset by peer")
      }
      val dst = new HPath(dir.resolve("fresh_dst").toString)
      val e = intercept[java.io.IOException](
        sub.publishNoReplace(fs, staged, dst))
      assert(!e.isInstanceOf[java.nio.file.FileAlreadyExistsException],
        s"store error misreported as a commit-race loss: $e")
      assert(e.getMessage.contains("connection reset"))
    } finally sys.props -= "graft.putifabsent.schemes"
  }

  test("rename substrate translates a cross-process rename loss into " +
      "the commit-race loser's signal") {
    // two DRIVERS racing on HDFS: both pass the exists() check (the
    // JVM lock covers one process only); the NameNode fails the
    // loser's rename with `false`. Simulate with a stub fs whose
    // exists() lies once — the re-check must classify the loss as
    // FileAlreadyExistsException so isCommitConflict rebases.
    val dir = Files.createTempDirectory("g_substrate_race")
    val real = FileSystem.getLocal(new Configuration())
    val staged = new HPath(dir.resolve("staged").toString)
    val o = real.create(staged, true); o.write('x'); o.close()
    val committed = new HPath(dir.resolve("committed").toString)
    val c = real.create(committed, true); c.write('w'); c.close()
    val fs = new org.apache.hadoop.fs.FilterFileSystem(real) {
      private var first = true
      override def exists(p: HPath): Boolean =
        if (p == committed && first) { first = false; false }
        else super.exists(p)
      override def rename(src: HPath, dst: HPath): Boolean =
        if (dst == committed) false // NameNode refuses: dst exists
        else super.rename(src, dst)
    }
    intercept[java.nio.file.FileAlreadyExistsException](
      T.RenameSubstrate.publishNoReplace(fs, staged, committed))
    // the lock-free unique-destination path runs the SAME translation
    val staged2 = new HPath(dir.resolve("staged2").toString)
    val o2 = real.create(staged2, true); o2.write('y'); o2.close()
    val fs2 = new org.apache.hadoop.fs.FilterFileSystem(real) {
      private var first = true
      override def exists(p: HPath): Boolean =
        if (p == committed && first) { first = false; false }
        else super.exists(p)
      override def rename(src: HPath, dst: HPath): Boolean =
        if (dst == committed) false
        else super.rename(src, dst)
    }
    intercept[java.nio.file.FileAlreadyExistsException](
      T.RenameSubstrate.publishNoReplaceUnique(fs2, staged2, committed))
  }

  test("unique-destination publishes keep no-replace arbitration under " +
      "concurrency: racers to distinct names all land, a taken name " +
      "refuses") {
    val dir = Files.createTempDirectory("g_substrate_par")
    val fs = FileSystem.getLocal(new Configuration())
    def put(name: String): HPath = {
      val p = new HPath(dir.resolve(name).toString)
      val out = fs.create(p, true)
      try out.write(name.getBytes("UTF-8")) finally out.close()
      p
    }
    // a pre-committed destination refuses even on the lock-free path
    val winner = put("winner")
    val loser = put("loser_src")
    intercept[java.nio.file.FileAlreadyExistsException](
      T.RenameSubstrate.publishNoReplaceUnique(fs, loser, winner))
    // 64 threads, 64 distinct destinations — the parallel commit-
    // finalization shape: every rename must land exactly once
    val srcs = (0 until 64).map(i => put(s"src_$i"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      Await.result(Future.traverse(srcs.zipWithIndex.toList) {
        case (src, i) => Future(T.RenameSubstrate
          .publishNoReplaceUnique(fs,
            src, new HPath(dir.resolve(s"dst_$i").toString)))
      }, scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    (0 until 64).foreach { i =>
      val p = new HPath(dir.resolve(s"dst_$i").toString)
      assert(fs.exists(p), s"dst_$i missing")
      val in = fs.open(p)
      val got =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      assert(got === s"src_$i", s"dst_$i carries the wrong bytes")
    }
  }

  test("a wide commit (pool-path finalization) reads back exactly") {
    val spark = graft.etl.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("g_substrate_wide").toString
    // 24 part files per year × 2 years = 48 renames > the serial
    // threshold — the thread-pool path finalizes this commit
    val df = (1L to 480L).map(k =>
      (k, if (k % 2 == 0) 2023 else 2024, k * 1.5))
      .toDF("k", "pt_year", "v").repartition(24)
    T.commit(spark, root, 0, df, Seq(2023, 2024))
    val got = T.read(spark, root, 0)
    assert(got.count() === 480L)
    assert(got.agg(org.apache.spark.sql.functions.sum("k"))
      .head.getLong(0) === (1L to 480L).sum)
  }
}
