package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{EventOps, Sampling, Stats}

/** Round-6 wave: the training-loop bookends around the engine's
  * existing model-eval and sampling families — sequential pattern
  * mining over the event log (the multi-step behavioral twin of the
  * Markov transition matrix), classifier calibration (the reliability
  * companion to x_auc's discrimination), and class-balanced
  * downsampling (the label-rebalancing step between corpus curation
  * and training).
  *
  * Oracle discipline as everywhere: integer arithmetic until single
  * final divisions, md5 hash order for determinism, window orders
  * totally tied down by (ts, id) tuples.
  */
object Ext5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Widespread 3-step behaviors: consecutive event triples with both
    // gaps <= 12h, pruned to patterns >= 3 distinct users (GSP with a
    // window constraint; support, not count, is the mining metric)
    "x_seq_patterns" -> ((s, d) =>
      EventOps.seqPatterns3(t(s, d, "events"), "user_id", "ts",
        "event_id", "event_type", maxGapSec = 43200L, minKeys = 3L)),

    // Reliability curve of the hashed quality classifier against the
    // English label: 10 equal-width margin bins, per-bin mean score
    // (ratio of integer sums) vs positive rate
    "x_calibration" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val hc = graft.operators.LangModel.hashedClassifier(
        docs, "doc_id", "text")
      Stats.calibrationCurve(
        hc.join(docs.select(col("doc_id"), (col("lang") === "en").as("lab")),
          Seq("doc_id")),
        col("score"), col("n_tokens"), col("lab"), k = 10)
    }),

    // Label-rebalanced corpus: every language keeps exactly
    // min-class-count documents in md5 hash order (WindowGroupLimit
    // pre-shuffle top-k; the bound is a 1-scalar driver action by
    // design — see Sampling.classBalance)
    "x_class_balance" -> ((s, d) =>
      Sampling.classBalance(t(s, d, "documents"), "lang", "doc_id")
        .select("doc_id", "lang", "rk")),
  )

  val oracle: Map[String, String] = Map(

    "x_seq_patterns" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS us,
                           event_id AS tie, event_type AS a FROM events),
         w AS (SELECT k, us, a,
                 lead(a, 1)  OVER win AS b,
                 lead(a, 2)  OVER win AS c,
                 lead(us, 1) OVER win AS us_b,
                 lead(us, 2) OVER win AS us_c
               FROM e WINDOW win AS (PARTITION BY k ORDER BY us, tie))
         SELECT a, b, c, CAST(count(*) AS BIGINT) AS n_occ,
                CAST(count(DISTINCT k) AS BIGINT) AS n_keys
         FROM w
         WHERE c IS NOT NULL
           AND us_b - us <= 43200000000
           AND us_c - us_b <= 43200000000
         GROUP BY a, b, c
         HAVING count(DISTINCT k) >= 3""",

    // scoring CTEs identical to the x_auc oracle (the proven
    // hashed-classifier replay), then the equal-width binning: doubles
    // appear only in the bin index and the two final divisions
    "x_calibration" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                      FROM documents),
         w AS (SELECT doc_id,
                      ('0x' || substr(md5(t), 1, 4))::BIGINT % 17 - 8 AS w
               FROM tok),
         sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS den,
                       CAST(sum(w) AS BIGINT) AS num
                FROM w GROUP BY doc_id),
         f AS (SELECT num::DOUBLE / den::DOUBLE AS s, num, den,
                      CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
               FROM sc JOIN documents d USING (doc_id)),
         mm AS (SELECT min(s) AS mn, max(s) AS mx FROM f),
         b AS (SELECT CASE WHEN mx = mn THEN 0
                      ELSE CAST(least(floor((s - mn) / (mx - mn) * 10), 9)
                           AS BIGINT) END AS bin,
                      num, den, y
               FROM f CROSS JOIN mm)
         SELECT bin, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(y) AS BIGINT) AS n_pos,
                CAST(sum(num) AS DOUBLE) / CAST(sum(den) AS DOUBLE)
                  AS mean_score,
                CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  AS pos_rate
         FROM b GROUP BY bin""",

    "x_class_balance" ->
      """WITH c AS (SELECT min(n) AS m FROM
                      (SELECT count(*) AS n FROM documents GROUP BY lang)),
         r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
               FROM documents)
         SELECT doc_id, lang, rk FROM r CROSS JOIN c WHERE rk <= m""",
  )
}
