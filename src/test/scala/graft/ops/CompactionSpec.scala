package graft.ops

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class CompactionSpec extends SparkSpec {

  test("compact rewrites a fragmented directory into few sized files " +
      "with identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val df = spark.range(200000).selectExpr("id", "id * 3 AS v")
    df.repartition(64).write.parquet(s"$dir/frag")
    val conf = spark.sparkContext.hadoopConfiguration
    def nFiles(p: String) = new Path(p).getFileSystem(conf)
      .listStatus(new Path(p))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(nFiles(s"$dir/frag") == 64)
    val bytes = Compaction.dataBytes(spark, s"$dir/frag")
    val out = Compaction.compact(spark, s"$dir/frag", s"$dir/out",
      targetBytes = bytes / 4)
    assert(nFiles(s"$dir/out") <= 6, "expected ~4-5 compacted files")
    assert(out.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // idempotent: re-running against existing output is a no-op read
    Compaction.compact(spark, s"$dir/frag", s"$dir/out", bytes / 4)
    assert(nFiles(s"$dir/out") <= 6)
  }
}
