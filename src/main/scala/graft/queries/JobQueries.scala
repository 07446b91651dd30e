package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.jobs.{MergeDedupJob, PropnexJob, SrxJob}
import graft.schemas.Schemas
import graft.sources.Audited
import java.time.LocalDate

/** End-to-end job pipeline smoke query: inline reference-shaped fixture
  * rows through propnex + srx transforms and the merge-dedup flagship.
  * Exercises the full composed pipeline (schemas → cleaning → joins →
  * dedup → conformed 28-col output) under the driver's rows-only check;
  * exact golden values are locked by PipelineSpec. */
object JobQueries {

  private val runDate = LocalDate.of(2024, 11, 1)

  private def rawFromStrings(s: SparkSession,
                             schema: org.apache.spark.sql.types.StructType,
                             rows: Seq[Map[String, String]]): DataFrame = {
    val data = rows.map(m =>
      Row.fromSeq(schema.fieldNames.toSeq.map(f => m.get(f).orNull)))
    s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava), schema)
  }

  private def pnFixture(s: SparkSession): DataFrame = rawFromStrings(s,
    Schemas.propnexRaw, Seq(
      Map("url" -> "u1", "location" -> "Blk 123A upper serangoon rd",
        "price" -> "$550,000",
        "street_town_district" -> "Upper Serangoon Rd\nHougang (D19)",
        "num_bedroom" -> "3", "num_bathroom" -> "2",
        "floor_area_sqft" -> "1,184 sqft (110 sqm)",
        "agent_name" -> "Jane Tan", "agent_id" -> "agent#R123456A",
        "agent_email" -> "jane@propnex.com",
        "agent_phone_num" -> "+65 91234567", "district" -> "D19",
        "total_floor_area" -> "1184", "top" -> "1995",
        "furnishing" -> "Partially Furnished", "floor" -> "high floor",
        "post_code" -> "534011", "street_name" -> "upper serangoon rd",
        "description" -> "nice flat", "facilities" -> "pool,gym")))

  private def srxFixture(s: SparkSession): DataFrame = rawFromStrings(s,
    Schemas.srxRaw, Seq(
      Map("url" -> "u9", "price" -> "$560,000",
        "agent_id" -> "CEA: R111222C / L1234567A",
        "agent_phone_num" -> "tel:91112222",
        "address" -> "123A Upper Serangoon Rd (534011)",
        "property_name" -> "upper serangoon rd",
        "property_type" -> "HDB 4 Rooms", "model" -> "Model A",
        "bedrooms" -> "3+1", "bathrooms" -> "2",
        "furnish" -> "Not Furnished", "floor_level" -> "Mid",
        "built_year" -> "1995", "hdb_town" -> "Hougang",
        "size" -> "110 sqm", "psf" -> "$473 psf",
        "facilities" -> "pool,gym", "description" -> "great view")))

  private def dims(s: SparkSession) = {
    import s.implicits._
    (Seq((19, "53", "Hougang"), (20, "56", "Bishan"))
       .toDF("district", "postal_sector", "zone"),
     Seq((19, "North-East Region"), (20, "Central Region"))
       .toDF("district", "region"),
     Seq(("ERA REALTY NETWORK PTE LTD", "L1234567A"))
       .toDF("agency", "agency_id"))
  }

  /** Deterministic planted feed for the quarantine gate: 2 of 4 JSON
    * lines and 1 of 3 CSV rows are malformed (syntax error; string
    * where the schema says long). Written once to a constant temp
    * location. Content is fixed, so the files are written only when
    * absent, via temp-name + atomic rename — a plain truncating
    * rewrite would let a concurrent consumer (q_source_quarantine and
    * q_stream_quarantine share the dir) read a half-written file. */
  private[queries] def quarantineFixtureDir(): String = {
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_quarantine_fix_v1")
    dir.mkdirs()
    def put(name: String, content: String): Unit = {
      val dst = new java.io.File(dir, name).toPath
      if (!java.nio.file.Files.exists(dst)) {
        val tmp = java.nio.file.Files.createTempFile(
          dir.toPath, s".$name.", ".tmp")
        java.nio.file.Files.writeString(tmp, content)
        try java.nio.file.Files.move(tmp, dst,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // a concurrent writer won the rename: its content is
          // identical by construction — drop ours
          case _: java.nio.file.FileAlreadyExistsException =>
            java.nio.file.Files.deleteIfExists(tmp)
        }
      }
    }
    put("feed.json",
      """{"id": 1, "v": "alpha"}
        |{"id": 2 "v": "beta"}
        |{"id": "x3", "v": "gamma"}
        |{"id": 4, "v": "delta"}
        |""".stripMargin)
    put("feed.csv",
      """id,v
        |10,kilo
        |x11,lima
        |12,mike
        |""".stripMargin)
    dir.getAbsolutePath
  }

  def all: Seq[Q] = Seq(
    // ---- PERMISSIVE read + corrupt-record quarantine ledger ----------
    // The production answer to the reference's silent schema-inferred
    // reads (srx_transformation.py:122, HIST:21): planted corrupt rows
    // must land in the ledger WITH their raw payload and recovered
    // partial columns, clean rows must parse fully, and the two
    // channels must partition the input. Golden VALUES oracle — every
    // payload byte is hash-checked.
    Q("q_source_quarantine",
      (s, _) => {
        val dir = quarantineFixtureDir()
        val schema = StructType(Seq(
          StructField("id", LongType), StructField("v", StringType)))
        def view(df: DataFrame, src: String): DataFrame =
          df.select(lit(src).as("src"), col("id"), col("v"),
            col(Audited.CorruptCol).as("quarantined_payload"))
        view(Audited.readJsonAudited(s, schema, s"$dir/feed.json"), "json")
          .unionByName(
            view(Audited.readCsvAudited(s, schema, s"$dir/feed.csv"),
              "csv"))
          .orderBy("src", "id", "quarantined_payload")
      },
      Some("""
        |SELECT * FROM (VALUES
        |  ('json', CAST(1 AS BIGINT), 'alpha', CAST(NULL AS VARCHAR)),
        |  ('json', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |   '{"id": 2 "v": "beta"}'),
        |  ('json', CAST(NULL AS BIGINT), 'gamma',
        |   '{"id": "x3", "v": "gamma"}'),
        |  ('json', CAST(4 AS BIGINT), 'delta', CAST(NULL AS VARCHAR)),
        |  ('csv', CAST(10 AS BIGINT), 'kilo', CAST(NULL AS VARCHAR)),
        |  ('csv', CAST(NULL AS BIGINT), 'lima', 'x11,lima'),
        |  ('csv', CAST(12 AS BIGINT), 'mike', CAST(NULL AS VARCHAR))
        |) AS t(src, id, v, quarantined_payload)
        |ORDER BY src, id, quarantined_payload
        |""".stripMargin.trim)),

    Q("q_job_pipeline_merged",
      (s, _) => {
        val (dc, dr, ag) = dims(s)
        val pn = PropnexJob.transform(pnFixture(s), dc, dr, runDate)
        val srx = SrxJob.transform(srxFixture(s), dc, dr, ag, runDate)
        MergeDedupJob.transform(pn, srx, runDate).orderBy("url")
      },
      // Golden VALUES oracle: the fixtures and the injected runDate make
      // the 28-col output fully deterministic, so the whole composed
      // pipeline (schemas → cleaning → joins → dedup → conformed output)
      // is hash-checked — not just rows-counted. Values locked by
      // PipelineSpec-style golden assertions.
      Some("""
        |SELECT * FROM (VALUES
        |  ('123A Upper Serangoon Rd', CAST(550000 AS INTEGER),
        |   CAST(465 AS INTEGER), CAST(1995 AS INTEGER),
        |   CAST(70 AS INTEGER), CAST(2 AS INTEGER), CAST(3 AS INTEGER),
        |   CAST(1184 AS INTEGER), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR), 'high', 'Hougang',
        |   CAST(19 AS INTEGER), 'Hougang', 'North-East Region',
        |   'Upper Serangoon Rd', '534011', 'partial',
        |   CAST(110 AS INTEGER), CAST(2 AS INTEGER), 'R123456A',
        |   'Jane Tan', CAST(91234567 AS INTEGER),
        |   'PROPNEX REALTY PTE. LTD.', 'L3008022J', 'u1',
        |   '{"agent_email":"jane@propnex.com","facilities":"pool,gym","description":"nice flat"}',
        |   DATE '2024-11-01'),
        |  ('123A Upper Serangoon Rd', CAST(560000 AS INTEGER),
        |   CAST(473 AS INTEGER), CAST(1995 AS INTEGER),
        |   CAST(70 AS INTEGER), CAST(2 AS INTEGER), CAST(4 AS INTEGER),
        |   CAST(1184 AS INTEGER), '4 Rooms', 'Model A', 'middle',
        |   'Hougang', CAST(19 AS INTEGER), 'Hougang',
        |   'North-East Region', 'Upper Serangoon Rd', '534011',
        |   'unfurnished', CAST(110 AS INTEGER), CAST(2 AS INTEGER),
        |   'R111222C', CAST(NULL AS VARCHAR), CAST(91112222 AS INTEGER),
        |   'ERA REALTY NETWORK PTE LTD', 'L1234567A', 'u9',
        |   '{"facilities":"pool,gym","schools":"N/A","shopping_malls/markets":"N/A","train_stations":"N/A","description":"great view"}',
        |   DATE '2024-11-01')
        |) AS t(location, price, price_psf, "top", remaining_lease,
        |  bathrooms, bedrooms, total_floor_area, property_type, model,
        |  "floor", general_location, district, "zone", region,
        |  street_name, post_code, furnish, floor_area_sqm,
        |  facilities_num, agent_id, agent_name, agent_phone_num,
        |  agency, agency_id, url, additional_information,
        |  transformed_date)
        |ORDER BY url
        |""".stripMargin.trim))
  )
}
