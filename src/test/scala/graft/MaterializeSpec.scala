package graft

import graft.domain.ChainFixture
import org.apache.hadoop.fs.Path
import java.nio.file.{Files, Paths}

/** The atomic-publish contract of the materialization store (ADVICE r7):
  * when two writers race one `matRoot`, the loser must never corrupt the
  * winner's published table — in particular RawLocalFileSystem's
  * move-INTO rename semantics must not nest a half-written attempt
  * inside the existing target. */
class MaterializeSpec extends SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def mkTable(dir: String, marker: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, marker), marker): Unit
  }

  test("publish wins when no target exists") {
    val root = Files.createTempDirectory("graft_pub").toString
    val tmp = s"$root/t.inprogress_1"; val target = s"$root/t"
    mkTable(tmp, "winner")
    ChainFixture.publish(conf, new Path(tmp), new Path(target))
    assert(Files.exists(Paths.get(target, "winner")))
    assert(!Files.exists(Paths.get(tmp)))
  }

  test("publish loser deletes its attempt and never nests inside the winner") {
    val root = Files.createTempDirectory("graft_pub").toString
    val target = s"$root/t"
    mkTable(target, "winner")
    val tmp = s"$root/t.inprogress_2"
    mkTable(tmp, "loser")
    ChainFixture.publish(conf, new Path(tmp), new Path(target))
    // winner's table intact, loser's attempt gone, nothing nested
    assert(Files.exists(Paths.get(target, "winner")))
    assert(!Files.exists(Paths.get(tmp)))
    val children = new java.io.File(target).listFiles().map(_.getName).toSet
    assert(children == Set("winner"), s"unexpected children: $children")
  }

  test("concurrent racers over one fresh target leave exactly one clean table") {
    val root = Files.createTempDirectory("graft_pub").toString
    val target = new Path(s"$root/t")
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        val tmp = s"$root/t.inprogress_$i"
        mkTable(tmp, s"w$i")
        try ChainFixture.publish(conf, new Path(tmp), target)
        catch { case _: java.io.IOException => () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val children = new java.io.File(s"$root/t").listFiles().map(_.getName).toSet
    assert(children.size == 1 && children.head.startsWith("w"), s"corrupt table: $children")
    val leftovers = new java.io.File(root).listFiles().map(_.getName).filter(_.contains("inprogress"))
    assert(leftovers.isEmpty, s"leftover attempts: ${leftovers.toSeq}")
  }

  test("g5 registry survives as a cross-run parquet cache: built once, reread after") {
    import graft.domain.PricingOps
    val q = SparkEntry.queries("g5_cross_run_cache")
    val first = q(spark, SfDir).collect()
    val path = PricingOps.g5CachePath(spark, SfDir)
    val dirF = new java.io.File(path)
    assert(dirF.isDirectory, s"registry cache not persisted at $path")
    val mtimes = dirF.listFiles().map(f => f.getName -> f.lastModified()).toMap
    val second = q(spark, SfDir).collect()
    val after = dirF.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == mtimes, "second run rewrote the registry instead of reusing it")
    assert(second.map(_.toString).sorted.sameElements(first.map(_.toString).sorted))
  }
}
