package graft.store

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The OCC arbiter's primitive must admit EXACTLY ONE winner per
  * target under concurrency. Plain Hadoop local rename does not: Hive's
  * ProxyLocalFileSystem pre-checks isFile(dst) non-atomically and
  * RawLocalFileSystem.rename is POSIX rename(2) (clobbers), so two
  * simultaneous claims could both return true — the root cause of the
  * historical OccSpec lost-version flake. */
class AtomicClaimSpec extends AnyFunSuite {

  private def localFs(dir: String) = new Path(dir)
    .getFileSystem(new org.apache.hadoop.conf.Configuration())

  test("exactly one of many simultaneous claims wins, every run") {
    val dir = java.nio.file.Files.createTempDirectory("claim").toString
    val fs = localFs(dir)
    (1 to 50).foreach { round =>
      val target = new Path(dir, s"commit-$round.json")
      val n = 8
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to n).map { i =>
        new Thread(() => {
          try {
            val tmp = new Path(dir, s".commit-$round.$i.tmp")
            val o = fs.create(tmp, true)
            try o.write(s"claimant-$i".getBytes) finally o.close()
            gate.await()
            if (AtomicClaim.publish(fs, tmp, target)) wins.incrementAndGet()
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start())
      gate.countDown()
      threads.foreach(_.join())
      assert(errs.isEmpty, s"round $round: ${errs.peek()}")
      assert(wins.get() == 1, s"round $round: ${wins.get()} claims won")
      assert(fs.exists(target))
    }
    // no tmp litter
    val leftover = fs.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftover.isEmpty, s"leftover tmp files: ${leftover.toSeq}")
  }

  test("loser's content never replaces the winner's") {
    val dir = java.nio.file.Files.createTempDirectory("claim").toString
    val fs = localFs(dir)
    val target = new Path(dir, "c.json")
    def attempt(tag: String): Boolean = {
      val tmp = new Path(dir, s".c.$tag.tmp")
      val o = fs.create(tmp, true)
      try o.write(tag.getBytes) finally o.close()
      AtomicClaim.publish(fs, tmp, target)
    }
    assert(attempt("first"))
    assert(!attempt("second"))
    val in = fs.open(target)
    val buf = new Array[Byte](16)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n) == "first")
  }
}
