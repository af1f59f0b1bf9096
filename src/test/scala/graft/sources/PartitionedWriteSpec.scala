package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Dynamic-overwrite and compaction semantics on a real directory:
  * replacing one partition must leave the others' files untouched, and
  * compaction must shrink file counts without changing row content. */
class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(root: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
  }

  test("dynamic overwrite replaces only the partitions present in the new frame") {
    val dir = Files.createTempDirectory("pw_dyn").toString
    val full = Seq((1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40))
      .toDF("id", "part", "v")
    PartitionedWrite.overwritePartitions(full, dir, Seq("part"))
    val bFilesBefore = parquetFiles(java.nio.file.Paths.get(dir, "part=b"))
    // rewrite ONLY partition a with new content
    val newA = Seq((9, "a", 99)).toDF("id", "part", "v")
    PartitionedWrite.overwritePartitions(newA, dir, Seq("part"))
    val got = spark.read.parquet(dir).select("id", "part", "v")
      .as[(Int, String, Int)].collect().toSet
    assert(got == Set((9, "a", 99), (3, "b", 30), (4, "b", 40)),
      "partition a replaced, partition b intact")
    assert(parquetFiles(java.nio.file.Paths.get(dir, "part=b")) == bFilesBefore,
      "partition b's files must be byte-identical (not rewritten)")
  }

  test("maxRecordsPerFile bounds output file sizes") {
    val dir = Files.createTempDirectory("pw_max").toString
    val df = spark.range(100).select(col("id"), lit("x").as("part"))
      .coalesce(1) // single task: the per-file bound must still split it
    PartitionedWrite.overwritePartitions(df, dir, Seq("part"), maxRecordsPerFile = 30)
    val files = parquetFiles(java.nio.file.Paths.get(dir))
    assert(files.size >= 4, s"100 rows / 30 per file needs >= 4 files, got ${files.size}")
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("upsert replaces matched keys, keeps the rest, inserts new, skips untouched partitions") {
    val dir = Files.createTempDirectory("pw_ups").toString
    val seed = Seq((1, "a", 10), (2, "a", 20), (3, "b", 30)).toDF("id", "part", "v")
    PartitionedWrite.overwritePartitions(seed, dir, Seq("part"))
    val bFiles = parquetFiles(java.nio.file.Paths.get(dir, "part=b"))
    // update id=2, insert id=5 — both land in partition a only
    val updates = Seq((2, "a", 99), (5, "a", 50)).toDF("id", "part", "v")
    PartitionedWrite.upsertPartitions(updates, dir, Seq("part"), Seq("id"))
    val got = spark.read.parquet(dir).select("id", "part", "v")
      .as[(Int, String, Int)].collect().toSet
    assert(got == Set((1, "a", 10), (2, "a", 99), (5, "a", 50), (3, "b", 30)),
      "update wins on key, unmatched kept, insert added, b untouched")
    assert(parquetFiles(java.nio.file.Paths.get(dir, "part=b")) == bFiles,
      "partition b must not be rewritten by an upsert that never touches it")
  }

  test("compaction shrinks a fragmented partition without changing its rows") {
    val dir = Files.createTempDirectory("pw_cmp").toString
    // fragment: 10 writers x 10 rows → many small files in one partition
    val frag = spark.range(100)
      .select(col("id"), lit("hot").as("part")).repartition(10)
    PartitionedWrite.overwritePartitions(frag, dir, Seq("part"))
    val before = parquetFiles(java.nio.file.Paths.get(dir, "part=hot")).size
    assert(before >= 10, s"fixture must be fragmented, got $before files")
    PartitionedWrite.compactPartition(spark, dir, Seq("part"), Seq("hot"),
      targetRecordsPerFile = 1000)
    val after = parquetFiles(java.nio.file.Paths.get(dir, "part=hot")).size
    assert(after == 1, s"100 rows at 1000/file compacts to one file, got $after")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet ==
      (0L until 100L).toSet, "compaction must be content-preserving")
  }
}
