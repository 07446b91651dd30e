package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.Tables._
import graft.functions.GraftFunctions
import graft.ops.{Clustering, Quantization}

/** Embedding-clustering queries: integer-exact k-means and the
  * SemDeDup-style semantic dedup built on top of it (cluster first,
  * then compare pairs only WITHIN each cluster — the standard trick
  * that turns O(n²) semantic dedup into per-bucket work; Abbas et al.
  * 2023, "SemDeDup", arXiv:2303.09540).
  *
  * Both oracles replay the whole algorithm unrolled in DuckDB — the
  * milli-integer arithmetic ([[Clustering]]) is what makes that
  * possible: float k-means could not be pinned across engines. */
object ClusterQueries {

  /** embeddings ∪ near-duplicate perturbed copies (id+1e5, first
    * component +2⁻⁵ — binary-exact, cos ≈ 1): the corpus q_semdedup
    * dedups. Same planting recipe as q_embed_neardup. */
  private def semCorpus(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d).select("vec_id", "embedding")
    val pert = emb.select((col("vec_id") + 100000L).as("vec_id"),
      concat(
        array((element_at(col("embedding"), 1).cast(DoubleType)
          + 0.03125).cast(FloatType)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    emb.unionByName(pert)
  }

  private val semCorpusSql =
    """e AS (SELECT vec_id, embedding FROM embeddings),
      |pert AS (SELECT vec_id + 100000 AS vec_id,
      |    list_prepend(CAST(CAST(embedding[1] AS DOUBLE)
      |        + CAST(0.03125 AS DOUBLE) AS REAL),
      |      embedding[2:64]) AS embedding FROM e),
      |corp AS (SELECT * FROM e UNION ALL SELECT * FROM pert)""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- integer-exact k-means (k=8, 3 Lloyd iterations) -------------
    // Assignment is a codegen'd projection against a KB-sized literal
    // codebook (no join, no shuffle); each update is ONE
    // partial-aggregable (cluster, dim) sum — see Clustering's scaladoc
    // for the 100 TB contract. The oracle replays all three iterations
    // unrolled, bit-exact.
    Q("q_kmeans_clusters",
      (s, d) => {
        val qv = embeddings(s, d)
          .select(col("vec_id").as("id"),
            Clustering.quantizeMilli(col("embedding")).as("qv"))
        Clustering.kmeansAssign(qv, "id", "qv", k = 8, iters = 3)
          .orderBy("id")
      },
      Some(Clustering.oracleSql(
        s"SELECT vec_id AS id, ${OracleSql.quantMilli("embedding", 64)} " +
          "AS qv FROM embeddings",
        k = 8, iters = 3, dim = 64))),

    // ---- SemDeDup: within-cluster cosine dedup ------------------------
    // Cluster the corpus (k-means on quantized vectors), then flag every
    // vector that has a within-cluster partner with smaller id and
    // cos_milli >= 950. Pairs are generated ONLY inside clusters — the
    // SemDeDup move: at 100 TB, k grows with n so members-per-cluster
    // stays bounded and the per-cluster pair expansion is local work,
    // not an n² join (the cluster-id equi-join below is the bucketed
    // shape; a giant cluster is the same skew as any hot key — salt or
    // split it). Planted near-identical copies land in their source's
    // cluster and are flagged; the oracle replays clustering + pairing
    // end-to-end.
    Q("q_semdedup",
      (s, d) => {
        GraftFunctions.ensureRegistered(s)
        val corp = semCorpus(s, d)
        val qv = corp.select(col("vec_id").as("id"),
          Clustering.quantizeMilli(col("embedding")).as("qv"))
        val asg = Clustering.kmeansAssign(qv, "id", "qv", k = 8, iters = 2)
          .select("id", "cluster")
        val withV = asg.join(
          corp.select(col("vec_id").as("id"), col("embedding").as("ev")),
          "id")
        val a = withV.select(col("id").as("id_a"), col("cluster"),
          col("ev").as("ea"))
        val b = withV.select(col("id").as("id_b"), col("cluster"),
          col("ev").as("eb"))
        val dupIds = a.join(b, Seq("cluster"))
          .filter(col("id_a") < col("id_b"))
          .filter(GraftFunctions.cosineMilli(col("ea"), col("eb")) >= 950)
          .select(col("id_b").as("id")).distinct()
          .withColumn("dup", lit(true))
        asg.join(dupIds, Seq("id"), "left")
          .select(col("id"), col("cluster"),
            coalesce(col("dup"), lit(false)).as("is_dup"))
          .orderBy("id")
      },
      Some {
        val kmeans = Clustering.oracleCtes(
          s"SELECT vec_id AS id, ${OracleSql.quantMilli("embedding", 64)} " +
            "AS qv FROM corp",
          k = 8, iters = 2, dim = 64)
        s"""WITH $semCorpusSql,
           |$kmeans,
           |wv AS (SELECT a.id, a.cluster, c.embedding AS ev
           |  FROM asg a JOIN corp c ON c.vec_id = a.id),
           |dups AS (SELECT DISTINCT b.id FROM wv a JOIN wv b
           |  ON a.cluster = b.cluster AND a.id < b.id
           |  WHERE ${OracleSql.cosMilli("a.ev", "b.ev")} >= 950)
           |SELECT w.id, w.cluster, d.id IS NOT NULL AS is_dup
           |FROM wv w LEFT JOIN dups d ON w.id = d.id
           |ORDER BY w.id
           |""".stripMargin.trim
      }),

    // ---- product-quantization ANN top-k -------------------------------
    // The COMPRESSION ANN family beside brute/IVF/LSH: encode every
    // vector as 8 subspace codes from a 16-entry data-seeded codebook,
    // scan the asymmetric distance (raw query vs reconstructed
    // candidate) to shortlist 40, exact-cosine re-rank to 10. The ADC
    // shortlist and the re-rank are both integer/milli-exact, so the
    // oracle replays encode → scan → rerank bit-for-bit.
    Q("q_ann_pq_topk",
      (s, d) => {
        GraftFunctions.ensureRegistered(s)
        val base = embeddings(s, d).select(col("vec_id"), col("embedding"))
          .withColumn("qv", Clustering.quantizeMilli(col("embedding")))
        // KB-sized codebook collect: first 16 vectors, sliced 8×8
        val cbRows = base.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int"), col("qv"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList)
          .toSeq.sortBy(_._1)
        val codebooks = Quantization.sliceCodebooks(cbRows,
          subspaces = 8, subDim = 8)
        val rec = base.withColumn("recon",
          Quantization.pqReconstruct(col("qv"), codebooks, subDim = 8))
        val q = base.filter(col("vec_id") >= 20 && col("vec_id") < 25)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("qv").as("q_qv"))
        val wAdc = Window.partitionBy("q_id")
          .orderBy(col("adc").asc, col("vec_id").asc)
        val cands = rec.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("adc", Clustering.l2sqLong(col("recon"), col("q_qv")))
          .withColumn("rn", row_number().over(wAdc))
          .filter(col("rn") <= 40)
        val wCos = Window.partitionBy("q_id")
          .orderBy(col("cos_milli").desc, col("vec_id").asc)
        cands.withColumn("cos_milli",
            GraftFunctions.cosineMilli(col("q_emb"), col("embedding")))
          .withColumn("rank", row_number().over(wCos))
          .filter(col("rank") <= 10)
          .select("q_id", "rank", "vec_id", "cos_milli")
          .orderBy("q_id", "rank")
      },
      Some {
        def l2(a: String, b: String) =
          s"list_sum(list_transform(range(1, 65), i -> " +
            s"($a[i] - $b[i]) * ($a[i] - $b[i])))"
        s"""WITH v AS (SELECT vec_id AS id,
           |    ${OracleSql.quantMilli("embedding", 64)} AS qv
           |  FROM embeddings),
           |cb AS (SELECT CAST(id AS INTEGER) AS j, qv FROM v
           |  WHERE id < 16),
           |${Quantization.reconCtes(subspaces = 8, subDim = 8)},
           |qq AS (SELECT vec_id AS q_id, embedding AS q_emb,
           |    ${OracleSql.quantMilli("embedding", 64)} AS q_qv
           |  FROM embeddings WHERE vec_id >= 20 AND vec_id < 25),
           |adc AS (SELECT q.q_id, r.id AS vec_id,
           |    ${l2("r.recon", "q.q_qv")} AS adc
           |  FROM rec r, qq q WHERE r.id <> q.q_id),
           |cand AS (SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id, row_number() OVER (
           |      PARTITION BY q_id ORDER BY adc, vec_id) AS rn
           |    FROM adc) WHERE rn <= 40),
           |scored AS (SELECT c.q_id, c.vec_id,
           |    ${OracleSql.cosMilli("q.q_emb", "e.embedding")} AS cos_milli
           |  FROM cand c JOIN qq q ON q.q_id = c.q_id
           |    JOIN embeddings e ON e.vec_id = c.vec_id)
           |SELECT q_id, rank, vec_id, cos_milli FROM (
           |  SELECT *, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos_milli DESC, vec_id) AS rank FROM scored)
           |WHERE rank <= 10 ORDER BY q_id, rank
           |""".stripMargin.trim
      }),

    // ---- cluster-balanced diversity sample ----------------------------
    // Curation subsample that preserves SEMANTIC coverage: k-means
    // cluster the embeddings, then take 25 per cluster by the engine's
    // deterministic md5-rank (seedless, stable under corpus growth) —
    // uniform sampling oversamples dense regions; per-cluster quotas
    // keep every region represented. Clustering + rank replayed
    // end-to-end by the oracle.
    Q("q_cluster_sample",
      (s, d) => {
        val qv = embeddings(s, d)
          .select(col("vec_id").as("id"),
            Clustering.quantizeMilli(col("embedding")).as("qv"))
        val asg = Clustering.kmeansAssign(qv, "id", "qv", k = 8, iters = 2)
          .select("id", "cluster")
        graft.ops.Corpus.stratifiedHashSample(
            asg, strata = Seq("cluster"), idCol = "id", k = 25)
          .orderBy("cluster", "sample_rank")
      },
      Some {
        val kmeans = Clustering.oracleCtes(
          s"SELECT vec_id AS id, ${OracleSql.quantMilli("embedding", 64)} " +
            "AS qv FROM embeddings",
          k = 8, iters = 2, dim = 64)
        s"""WITH $kmeans
           |SELECT id, cluster, sample_rank FROM (
           |  SELECT id, cluster, row_number() OVER (PARTITION BY cluster
           |      ORDER BY md5(CAST(id AS VARCHAR)) ASC, id ASC)
           |    AS sample_rank
           |  FROM asg)
           |WHERE sample_rank <= 25 ORDER BY cluster, sample_rank
           |""".stripMargin.trim
      })
  )
}
