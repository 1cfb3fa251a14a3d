package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Corpus-preparation operators a training-data pipeline runs before any
  * model sees a token — profiling, splitting, and context packing — each
  * built as the plan that survives 100 TB:
  *
  *  - `t4_corpus_profile`: per-source distribution profile with EXACT
  *    nearest-rank percentiles. Percentile-by-sort is a single-task trap at
  *    scale; instead the values are pre-aggregated per (source, n_chars)
  *    (bounded by the distinct-value count, not the row count), cum-summed
  *    with a source-local window, and the rank test `100·cum ≥ p·n` stays
  *    in integers — bit-identical in any engine, no float interpolation.
  *
  *  - `d5_train_split`: deterministic stratified train/val/test split via a
  *    multiplicative hash of doc_id — pure map-side (no shuffle before the
  *    count agg), reproducible across engines and runs, the property a
  *    training pipeline needs so splits never leak when data is re-read.
  *
  *  - `t5_context_pack`: greedy sequential packing of docs (in doc_id
  *    order) into fixed token-budget context windows: window =
  *    floor(exclusive-prefix-sum of tokens / budget). A naive
  *    `Window.orderBy(doc_id)` prefix sum puts the WHOLE corpus through
  *    one task; this uses the same two-phase distributed prefix sum as the
  *    engine's sequence assignment (range-partition, per-partition totals
  *    collected — metadata-sized — then a broadcast running offset).
  */
object CorpusQueries {

  /** t5: token budget per packed context window. */
  val PackBudget = 256L

  /** d5: permille split boundaries (800 train / 100 val / 100 test). */
  val TrainPermille = 800L
  val ValPermille   = 900L

  /** d5: multiplicative-hash bucket in [0, 1000) — all operations bounded
    * in Long, so the same expression is exact in Spark and DuckDB. */
  private[llm] val splitBucket = "((doc_id % 1000003) * 2654435761 + 12345) % 1000"

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** BPE-ish subword token count (same regex as t1_text_stats). */
  private val tokensExpr =
    "cast(size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0)) as long)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t4_corpus_profile" -> { (s, dir) =>
      val d = docs(s, dir)
      val totals = d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"))
      // distinct-value pre-aggregation: the window below runs over
      // |distinct n_chars| rows per source, not |docs| rows
      val counts = d.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts.withColumn("cum", sum(col("c")).over(w))
      def rankPick(permille: Long, as: String) =
        min(when(col("cum") * 1000 >= lit(permille) * col("n_docs"), col("n_chars"))).as(as)
      cum.join(totals, "source")
        .groupBy(col("source"), col("n_docs"), col("n_langs"), col("total_chars").cast("long").as("total_chars"))
        .agg(rankPick(500L, "p50_chars"), rankPick(900L, "p90_chars"), rankPick(990L, "p99_chars"))
    },

    "d5_train_split" -> { (s, dir) =>
      docs(s, dir)
        .withColumn("b", expr(splitBucket))
        .withColumn("split",
          when(col("b") < TrainPermille, "train")
            .when(col("b") < ValPermille, "val")
            .otherwise("test"))
        .groupBy("source", "split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"), // checksum: one reassigned doc breaks it
          sum(col("n_chars")).cast("long").as("sum_chars"))
    },

    "t5_context_pack" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), expr(tokensExpr).as("tokens"))
      // two-phase distributed prefix sum in doc_id order
      val parts  = math.max(1, s.conf.get("spark.sql.shuffle.partitions", "32").toInt / 4)
      val sorted = d.repartitionByRange(parts, col("doc_id")).sortWithinPartitions("doc_id")
      val schema = sorted.schema
      val docIdx = schema.fieldIndex("doc_id")
      val tokIdx = schema.fieldIndex("tokens")
      val rdd    = sorted.rdd
      // per-range token totals: O(ranges) collect, metadata-sized
      val perRange = rdd
        .mapPartitionsWithIndex((i, it) => Iterator.single(i -> it.map(_.getLong(tokIdx)).sum))
        .collect().sortBy(_._1).map(_._2)
      val offsets = perRange.scanLeft(0L)(_ + _) // exclusive prefix per range
      val offB    = s.sparkContext.broadcast(offsets)
      val packed = rdd.mapPartitionsWithIndex { (i, it) =>
        var prefix = offB.value(i)
        it.map { r =>
          val t  = r.getLong(tokIdx)
          val wi = prefix / PackBudget // exclusive-prefix window assignment
          prefix += t
          Row(r.getLong(docIdx), t, wi)
        }
      }
      s.createDataFrame(packed, StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("tokens", LongType, nullable = false),
          StructField("window_id", LongType, nullable = false))))
        .groupBy("window_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("sum_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
    }
  )

  def oracles: Map[String, String] = Map(
    "t4_corpus_profile" ->
      """WITH t AS (
        |  SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY 1
        |), c AS (
        |  SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, n_chars,
        |         sum(c) OVER (PARTITION BY source ORDER BY n_chars
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c
        |)
        |SELECT t.source, t.n_docs, t.n_langs, t.total_chars,
        |  min(CASE WHEN cum.cum * 1000 >= 500 * t.n_docs THEN cum.n_chars END) AS p50_chars,
        |  min(CASE WHEN cum.cum * 1000 >= 900 * t.n_docs THEN cum.n_chars END) AS p90_chars,
        |  min(CASE WHEN cum.cum * 1000 >= 990 * t.n_docs THEN cum.n_chars END) AS p99_chars
        |FROM cum JOIN t USING (source)
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    "d5_train_split" ->
      s"""SELECT source,
         |  CASE WHEN b < $TrainPermille THEN 'train'
         |       WHEN b < $ValPermille THEN 'val'
         |       ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM (SELECT source, doc_id, n_chars, $splitBucket AS b FROM documents)
         |GROUP BY 1, 2""".stripMargin,
    "t5_context_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))::BIGINT AS tokens
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, tokens,
         |         CAST(coalesce(sum(tokens) OVER (ORDER BY doc_id
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
         |  FROM d
         |)
         |SELECT CAST(prefix // $PackBudget AS BIGINT) AS window_id, count(*) AS n_docs,
         |  CAST(sum(tokens) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM p GROUP BY 1""".stripMargin
  )
}
