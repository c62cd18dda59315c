package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond cleaning/dedup: turning a
  * filtered corpus into model-ready examples — chunking long documents
  * into overlapping context windows, packing short documents into fixed
  * token budgets (the concat-and-chunk packing every LM pretraining run
  * uses), deterministic domain-mixture downsampling, and a seeded global
  * shuffle for training order.
  *
  * Scale notes (100 TB): chunking and packing are narrow per-row /
  * windowed-per-source work (no corpus-wide shuffle beyond the per-source
  * window); mixture sampling is a scan with a hash predicate (no
  * stateful sampler, fully parallel, reproducible on retries — the same
  * md5-threshold trick as q_hash_split); the global shuffle is a
  * sort by seeded hash — one range-partitioned exchange, the standard
  * distributed permutation.
  */
object PipelineOps {

  private val toks = split(col("text"), " ")

  val all: Seq[QueryDef] = Seq(

    // ---- chunking: overlapping token windows (size 32, stride 24) per
    //      doc — the long-doc → context-window exploder. Chunk count and
    //      boundaries are exact integer arithmetic; each chunk carries
    //      the md5 of its joined text so content (not just shape) is
    //      verified cross-engine. ----
    QueryDef(
      "doc_chunking",
      (sp, dir) => {
        val chunk = 32
        val stride = 24
        Tables.documents(sp, dir)
          .select(col("doc_id"), toks.as("t"))
          .withColumn("n_tok", size(col("t")).cast("long"))
          .withColumn("n_chunks",
            when(col("n_tok") <= chunk, lit(1L))
              .otherwise(lit(1L) + expr(s"(n_tok - $chunk + ${stride - 1}) div $stride")))
          .select(col("doc_id"), col("n_tok"), col("t"),
            posexplode(sequence(lit(0L), col("n_chunks") - 1)).as(Seq("chunk_idx", "ci")))
          .select(col("doc_id"), col("n_tok"), col("chunk_idx").cast("long").as("chunk_idx"),
            (col("ci") * stride + 1).cast("int").as("start_tok"),
            least(lit(chunk).cast("long"), col("n_tok") - col("ci") * stride)
              .cast("int").as("chunk_len"),
            md5(concat_ws(" ",
              slice(col("t"), (col("ci") * stride + 1).cast("int"),
                least(lit(chunk).cast("long"), col("n_tok") - col("ci") * stride)
                  .cast("int")))).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS t,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, n_tok,
          |         CASE WHEN n_tok <= 32 THEN 1
          |              ELSE 1 + (n_tok - 32 + 23) // 24 END AS n_chunks, t
          |  FROM t)
          |SELECT doc_id, n_tok, CAST(ci AS BIGINT) AS chunk_idx,
          |       CAST(ci * 24 + 1 AS INT) AS start_tok,
          |       CAST(least(32, n_tok - ci * 24) AS INT) AS chunk_len,
          |       md5(array_to_string(t[ci * 24 + 1 : ci * 24 + least(32, n_tok - ci * 24)], ' '))
          |         AS chunk_md5
          |FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(ci)
          |ORDER BY doc_id, chunk_idx""".stripMargin),
    ),

    // ---- sequence packing: concat-and-chunk into a 256-token budget per
    //      source — doc d lands in bin floor(tokens_before_d / budget)
    //      (its tail may spill into the next bin, exactly like LM
    //      pretraining packing). One windowed cumsum per source, exact
    //      integer bins. ----
    QueryDef(
      "doc_pack_sequences",
      (sp, dir) => {
        val budget = 256
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(sp, dir)
          .select(col("source"), col("doc_id"), size(toks).cast("long").as("n_tok"))
          .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
          .withColumn("bin", expr(s"cum_before div $budget"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").cast("long").as("bin_tokens"),
            min("doc_id").as("first_doc"))
          .orderBy("source", "bin")
      },
      Some(
        """WITH d AS (
          |  SELECT source, doc_id,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |  FROM documents),
          |c AS (
          |  SELECT source, doc_id, n_tok,
          |         CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |              AS BIGINT) AS cum_before
          |  FROM d)
          |SELECT source, cum_before // 256 AS bin, count(*) AS n_docs,
          |       CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
          |       min(doc_id) AS first_doc
          |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin),
    ),

    // ---- domain mixture: deterministic per-source downsampling to a
    //      target mix (keep-rate by source) via an md5 threshold on the
    //      doc id — stateless, reproducible, skew-free (hash is uniform),
    //      and auditable (kept vs total in one output row per source). ----
    QueryDef(
      "doc_mix_sample",
      (sp, dir) => {
        val h2 = substring(md5(concat(lit("mix1:"), col("doc_id").cast("string"))), 1, 2)
        // keep-rates: src0 full, src1 50% ('80'=128/256), src2 25% ('40'),
        // src3 ~10% ('1a'=26/256), anything else full
        val thr = when(col("source") === "src1", "80")
          .when(col("source") === "src2", "40")
          .when(col("source") === "src3", "1a")
          .otherwise("zz")
        Tables.documents(sp, dir)
          .withColumn("kept", (h2 < thr).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("kept").cast("long").as("n_kept"),
            sum(col("kept") * col("n_chars")).cast("long").as("kept_chars"))
          .orderBy("source")
      },
      Some(
        """SELECT source, count(*) AS n_docs,
          |       CAST(sum(kept) AS BIGINT) AS n_kept,
          |       CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars
          |FROM (
          |  SELECT source, n_chars,
          |         CASE WHEN substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 2)
          |              < CASE source WHEN 'src1' THEN '80' WHEN 'src2' THEN '40'
          |                            WHEN 'src3' THEN '1a' ELSE 'zz' END
          |              THEN 1 ELSE 0 END AS kept
          |  FROM documents)
          |GROUP BY source ORDER BY source""".stripMargin),
    ),

    // ---- global shuffle: seeded deterministic training order — sort by
    //      md5(seed || doc_id). One range exchange; the permutation is
    //      stable across engines, retries and cluster sizes (unlike
    //      rand(), whose stream depends on partitioning). ----
    QueryDef(
      "doc_shuffle_order",
      (sp, dir) => {
        val key = md5(concat(lit("ep7:"), col("doc_id").cast("string")))
        Tables.documents(sp, dir)
          .select(col("doc_id"), key.as("shuffle_key"))
          .orderBy("shuffle_key", "doc_id")
          .limit(25)
      },
      Some(
        """SELECT doc_id, md5('ep7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
          |FROM documents
          |ORDER BY shuffle_key, doc_id LIMIT 25""".stripMargin),
    ),

    // ---- span-level dedup (the C4 move): disjoint 10-word spans hashed
    //      corpus-wide; spans occurring in >1 place are "duplicated" and
    //      their characters are what span-removal would delete. Two
    //      shuffles total (span-hash count + per-source rollup), both
    //      map-side-combined; span extraction itself is narrow. At
    //      100 TB this is exactly the C4/RefinedWeb span-dedup shape —
    //      the span-hash table is the only corpus-sized shuffle, and it
    //      carries 16-byte hashes, not text. ----
    QueryDef(
      "doc_span_dedup",
      (sp, dir) => {
        val span = 10
        val blocks = Tables.documents(sp, dir)
          .select(col("doc_id"), col("source"), toks.as("t"))
          .withColumn("nblk", expr(s"size(t) div $span").cast("long"))
          .filter(col("nblk") > 0)
          .select(col("doc_id"), col("source"),
            explode(sequence(lit(0L), col("nblk") - 1)).as("i"),
            col("t"))
          .select(col("doc_id"), col("source"),
            concat_ws(" ",
              slice(col("t"), (col("i") * span + 1).cast("int"), lit(span))).as("blk"))
          .select(col("source"), md5(col("blk")).as("m"),
            length(col("blk")).cast("long").as("nch"))
        val counts = blocks.groupBy("m").agg(count(lit(1)).as("cnt"))
        blocks.join(counts, "m")
          .groupBy("source")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_spans"),
            sum(when(col("cnt") > 1, col("nch")).otherwise(0L)).as("dup_chars"))
          .orderBy("source")
      },
      Some(
        """WITH t AS (SELECT doc_id, source, string_split(text,' ') AS w
          |           FROM documents),
          |b AS (
          |  SELECT doc_id, source,
          |         array_to_string(w[(i-1)*10+1 : (i-1)*10+10], ' ') AS blk
          |  FROM (SELECT doc_id, source, w,
          |               unnest(range(1, CAST(len(w)//10 AS BIGINT) + 1)) AS i
          |        FROM t)),
          |h AS (SELECT source, md5(blk) AS m, len(blk) AS nch FROM b),
          |c AS (SELECT m, count(*) AS cnt FROM h GROUP BY m)
          |SELECT source, count(*) AS n_spans,
          |       CAST(sum(CASE WHEN cnt>1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
          |       CAST(sum(CASE WHEN cnt>1 THEN nch ELSE 0 END) AS BIGINT) AS dup_chars
          |FROM h JOIN c USING (m) GROUP BY source ORDER BY source""".stripMargin),
    ),

    // ---- temperature-weighted mixture to a token budget: per-source
    //      sampling weight ∝ size^0.5 (the standard α-temperature
    //      flattening — small sources over-represented relative to raw
    //      proportions), realized as integer-exact per-source token
    //      budgets and a deterministic hash-ordered admission scan.
    //      EVERY step is integer arithmetic (floor(sqrt()) weights,
    //      integer-division budgets, windowed bigint cumsum) so the
    //      cross-engine hash can't drift on double summation order.
    //      Scale shape: one tiny per-source aggregate + one windowed
    //      cumsum per source — no global sort, no stateful sampler,
    //      reproducible on retries at any cluster size. ----
    QueryDef(
      "doc_mix_temperature",
      (sp, dir) => {
        val budgetTotal = 20000L
        val d = Tables.documents(sp, dir)
          .select(col("source"), col("doc_id"),
            size(toks).cast("long").as("n_tok"))
        val w = d.groupBy("source")
          .agg(sum("n_tok").as("src_tok"))
          .withColumn("wt", floor(sqrt(col("src_tok").cast("double"))).cast("long"))
        val total = w.select(sum("wt").cast("long").as("tw"))
        val budgets = w.crossJoin(broadcast(total))
          .select(col("source"),
            expr(s"($budgetTotal * wt) div tw").cast("long").as("budget"))
        val ordered = d.withColumn("cum",
          sum("n_tok").over(Window.partitionBy("source")
            .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))),
              col("doc_id"))))
        ordered.join(broadcast(budgets), "source")
          .groupBy("source", "budget")
          .agg(sum(when(col("cum") <= col("budget"), 1L).otherwise(0L))
              .as("n_admitted"),
            sum(when(col("cum") <= col("budget"), col("n_tok")).otherwise(0L))
              .as("admitted_tok"))
          .orderBy("source")
      },
      Some(
        """WITH d AS (SELECT source, doc_id,
          |                  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
          |           FROM documents),
          |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok
          |      FROM d GROUP BY source),
          |w AS (SELECT source,
          |             CAST(floor(sqrt(CAST(src_tok AS DOUBLE))) AS BIGINT) AS wt
          |      FROM s),
          |b AS (SELECT source,
          |             CAST((20000 * wt) // (SELECT CAST(sum(wt) AS BIGINT) FROM w)
          |               AS BIGINT) AS budget
          |      FROM w),
          |r AS (SELECT source, doc_id, n_tok,
          |             CAST(sum(n_tok) OVER (PARTITION BY source
          |               ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id)
          |               AS BIGINT) AS cum
          |      FROM d)
          |SELECT b.source, b.budget,
          |       CAST(sum(CASE WHEN r.cum <= b.budget THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_admitted,
          |       CAST(sum(CASE WHEN r.cum <= b.budget THEN r.n_tok ELSE 0 END) AS BIGINT)
          |         AS admitted_tok
          |FROM b JOIN r ON r.source = b.source
          |GROUP BY b.source, b.budget ORDER BY b.source""".stripMargin),
    ),
  )
}
