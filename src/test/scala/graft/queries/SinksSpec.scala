package graft.queries

import graft.SparkSpec

/** Pins the marker discipline of [[Sinks.ensureBuilt]]: the completion
  * marker alone is not trusted — a missing DATA table (the
  * compactPartitionedTable death window: DROP succeeded, staged RENAME
  * didn't) must trigger a rebuild, not a NoSuchTableException at every
  * later access. */
class SinksSpec extends SparkSpec {

  private def mkTable(name: String): Unit = {
    import spark.implicits._
    graft.ops.Compaction.dropManagedTable(spark, name)
    Seq(1).toDF("x").write.format("parquet").saveAsTable(name)
  }

  test("ensureBuilt re-runs the build when a required data table is " +
      "missing even though the marker survives") {
    var builds = 0
    def build(): Unit = { builds += 1; mkTable("t_sinks_data") }

    Seq("t_sinks_data", "t_sinks_data_ok")
      .foreach(graft.ops.Compaction.dropManagedTable(spark, _))
    Sinks.ensureBuilt(spark, "t_sinks_data_ok",
      requires = Seq("t_sinks_data"))(build())
    assert(builds == 1)
    // marker + data present: no rebuild
    Sinks.ensureBuilt(spark, "t_sinks_data_ok",
      requires = Seq("t_sinks_data"))(build())
    assert(builds == 1)
    // simulate the maintenance-death window: data table gone, marker
    // still standing — the next access must rebuild
    graft.ops.Compaction.dropManagedTable(spark, "t_sinks_data")
    Sinks.ensureBuilt(spark, "t_sinks_data_ok",
      requires = Seq("t_sinks_data"))(build())
    assert(builds == 2)
    assert(spark.catalog.tableExists("t_sinks_data"))
    Seq("t_sinks_data", "t_sinks_data_ok")
      .foreach(graft.ops.Compaction.dropManagedTable(spark, _))
  }

  test("contentKey changes when file bytes change, even at equal " +
      "length, and is stable across touches") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sinks_spec")
    val f = dir.resolve("data.bin")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3, 4))
    val k1 = Sinks.contentKey(dir.toString, "data.bin", "p")
    // same length, different bytes — the (length, mtime) key this
    // replaced could collide here. Bump mtime explicitly: the hash
    // MEMO is keyed on (path, length, mtime), so a same-millisecond
    // same-length rewrite inside one JVM would serve the stale hash
    // (impossible for the read-only driver testdata; this pins the
    // detection path deterministically on any mtime granularity)
    java.nio.file.Files.write(f, Array[Byte](1, 2, 9, 4))
    f.toFile.setLastModified(f.toFile.lastModified() + 2000)
    val k2 = Sinks.contentKey(dir.toString, "data.bin", "p")
    assert(k1 != k2, "byte change at equal length must change the key")
    // touch only (same bytes, new mtime): key stays — no spurious
    // rebuilds
    f.toFile.setLastModified(System.currentTimeMillis() + 5000)
    val k3 = Sinks.contentKey(dir.toString, "data.bin", "p")
    assert(k2 == k3, "mtime-only change must not change the key")
    // extra participates
    assert(Sinks.contentKey(dir.toString, "data.bin", "q") != k3)
  }
}
