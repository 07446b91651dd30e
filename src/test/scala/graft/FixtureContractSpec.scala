package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types.LongType

/** Contract spec for the driver-generated fixtures (TESTDATA.md): pins
  * the EXACT loaded schema of every table at sf0.001 so a driver-side
  * regeneration that changes a type fails HERE, in the builder's own
  * loop, instead of surfacing as 21 red gates in the driver's verify.
  *
  * Motivation: the round-7→8 regeneration flipped `events.ts` from
  * TIMESTAMP(NANOS) (read as int64 epoch-nanos) to TIMESTAMP(MICROS);
  * every events-family unit spec synthesized `ts` in memory, so the
  * suite stayed green while 13 batch gates crashed analysis and 8
  * streaming gates silently produced 1000×-compressed event times. */
class FixtureContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def loaded(name: String): String =
    spark.read.parquet(s"$sf/$name.parquet").schema
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")

  // what Spark loads with default confs (timestamps without UTC
  // adjustment infer as timestamp_ntz); any drift here means every
  // consumer of the table needs an audit, not a silent re-green
  private val expected = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint,ts:timestamp_ntz,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  for ((table, want) <- expected.toSeq.sortBy(_._1))
    test(s"fixture schema pinned: $table") {
      assert(loaded(table) == want,
        s"\n$table fixture schema changed — audit every consumer " +
          "(Tables.scala read boundaries first), then re-pin here")
    }

  test("documents.text is pure ASCII — the media/subword oracles' " +
      "character==byte assumption") {
    // Every decoded-media oracle indexes text by CHARACTER (DuckDB
    // ord/substr) while the render samples BYTES; the greedy-subword
    // kernel walks UTF-16 code units while its oracle walks
    // characters. Both equivalences hold only for ASCII text. A
    // regeneration that introduces multi-byte characters must fail
    // HERE, loudly, not as cryptic hash mismatches in the driver.
    val nonAscii = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text — the media render/" +
        "oracle arithmetic and subword position math need an audit " +
        "(Multimodal render grids, MultimodalQueries phashCtes, " +
        "TextQueries subword oracle) before re-pinning")
  }

  test("Tables.events normalizes ts to epoch-micros long in a sane range") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == LongType)
    val Row(mn: Long, mx: Long) =
      ev.agg(min(col("ts")), max(col("ts"))).head()
    // 2015..2035 as epoch-MICROS: a nanos-mislabeled read lands 1000×
    // above this band, a millis-mislabeled read 1000× below — either
    // way this fails loudly instead of compressing every event time
    val lo = 1420070400000000L // 2015-01-01T00:00:00Z
    val hi = 2051222400000000L // 2035-01-01T00:00:00Z
    assert(mn >= lo && mx <= hi,
      s"ts range [$mn, $mx] outside epoch-micros sanity band — " +
        "unit mislabeling at the read boundary?")
  }

  test("eventsStream carries the same normalized ts contract") {
    val st = graft.streaming.StreamingOps.eventsStream(spark, sf)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == LongType)
  }
}
