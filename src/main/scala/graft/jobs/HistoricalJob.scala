package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Cleaning, Joins}
import graft.schemas.Schemas

/** Historical resale-transaction standardization — same observable
  * semantics as the reference job
  * (jobs/spark/historical_data_transformation.py:82-126). The
  * reference's driver-side GCS blob loop + per-file `unionByName`
  * (HIST:13-27) is replaced by Spark's native multi-file directory scan:
  * one `FileScan csv` with as many partitions as the cluster wants —
  * at 100 TB the scan parallelizes across executors instead of
  * serializing through a driver loop. Pure projections + three
  * broadcast joins; zero shuffles. */
object HistoricalJob {

  def readRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schemas.historicalRaw)
      .option("header", "true").csv(dir)
      .select(Schemas.historicalRaw.fieldNames.map(col).toIndexedSeq: _*)

  def transform(raw: DataFrame, districtCode: DataFrame,
                districtRegion: DataFrame,
                townDistrict: DataFrame): DataFrame = {
    val cleaned = raw
      // title-casing (HIST:29-32)
      .withColumn("general_location", initcap(col("town")))
      .withColumn("street_name", initcap(col("street_name")))
      .withColumn("property_type", initcap(col("flat_type")))
      // renames (HIST:34-37)
      .withColumnsRenamed(Map("flat_model" -> "model",
        "resale_price" -> "price", "lease_commence_date" -> "top"))
      // flat-type label fixes (HIST:39-42)
      .withColumn("property_type",
        Cleaning.fixFlatTypeLabels(col("property_type")))
      // sqm → sqft (HIST:44-46)
      .withColumn("total_floor_area",
        Cleaning.sqmToSqft(col("floor_area_sqm").try_cast(DoubleType)))
      // date assembly + parts (HIST:48-51); try_to_date: pre-ANSI null
      // behavior on malformed months
      .withColumn("date_of_sale",
        try_to_date(concat_ws("-", col("month"), lit("01")),
          "yyyy-MM-dd"))
      .withColumn("year", year(col("date_of_sale")))
      .withColumn("month", month(col("date_of_sale")))
      // remaining lease (HIST:53-54)
      .withColumn("remaining_lease",
        lit(99) - (col("year") - col("top").try_cast(IntegerType)))

    // J1: case-insensitive town→district enrich with initcap restore +
    // the '/w'→'/W' fix-up (HIST:59-63)
    val withTown = Joins.normalizedEnrich(cleaned, townDistrict,
      "general_location",
      c => regexp_replace(initcap(c), "/w", "/W"))
    // J2: distinct the 81-row sector table down to district grain first
    // (HIST:103); J3: region (HIST:104)
    val withZone = Joins.distinctDimEnrich(withTown, districtCode,
      Seq("district", "zone"), "district")
    val enriched = Joins.broadcastEnrich(withZone, districtRegion,
      Seq("district"))

    val shaped = Cleaning.castColumnsLenient(
      enriched.drop("town", "flat_type"),
      Map("district" -> IntegerType, "floor_area_sqm" -> IntegerType,
        "top" -> IntegerType, "price" -> IntegerType))
    shaped.select(Schemas.historicalCols.map(col): _*)
  }
}
