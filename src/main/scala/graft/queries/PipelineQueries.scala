package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.Multimodal

/** Training-data pipeline operators: deduplication (exact, MinHash,
  * SimHash, n-gram Jaccard, embedding cosine), similarity search
  * (brute-force and bucketed ANN), text analysis (language-ID, quality,
  * token counts, fingerprint), multimodal plumbing, and the end-to-end
  * extractor gates that run the REAL mapPartitions pipeline against
  * constructed ground truth.
  */
object PipelineQueries {
  import Q._

  private val M = HashMod

  // ---- SQL fragments mirroring TextFunctions (portable hash family) ----
  /** distinct lowercase alnum tokens len>2 (the P4 tokenizer) */
  private val sqlToks =
    "list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 2))"

  /** polyHashStr(t, seed) for a token variable `t` */
  private def sqlTokHash(seed: Long): String =
    s"list_reduce(list_prepend(CAST(${seed % M} AS BIGINT), " +
      s"list_transform(generate_series(1, length(t)), i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))), " +
      s"(a, x) -> (a * 131 + x) % $M)"

  private def minHashSeed(s: Int): Long = 0x9e3779b9L * (s + 1)

  val entries: Seq[(String, Entry)] = Seq(

    // ---------------- Deduplication ----------------

    // exact dedup: hash-groupBy, keep min id
    "dd_exact" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .groupBy(md5($"text").as("h"))
          .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy($"h")
      },
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY h""".stripMargin)),

    // n-gram (token-set) Jaccard near-dup pairs within language blocks
    "dd_ngram_jaccard" -> Entry(
      (s, d) => {
        import s.implicits._
        val t = rd(s, d, "documents").filter($"doc_id" < 200)
          .select($"doc_id", $"lang", tokens($"text").as("toks"))
        val a = t.select($"doc_id".as("id_a"), $"lang", $"toks".as("toks_a"))
        val b = t.select($"doc_id".as("id_b"), $"lang", $"toks".as("toks_b"))
        a.join(b, Seq("lang")).filter($"id_a" < $"id_b")
          .withColumn("jac", round(jaccard($"toks_a", $"toks_b"), 6))
          .filter($"jac" >= 0.8)
          .select($"lang", $"id_a", $"id_b", $"jac")
          .orderBy($"lang", $"id_a", $"id_b")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents WHERE doc_id < 200)
              |SELECT a.lang AS lang, a.doc_id AS id_a, b.doc_id AS id_b,
              |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
              |        CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6) AS jac
              |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
              |WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
              |            CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6) >= 0.8
              |ORDER BY lang, id_a, id_b""".stripMargin)),

    // MinHash signatures (k=6) — portable polynomial hash family, so the
    // signature itself is oracle-gated bit-for-bit
    "dd_minhash_sig" -> Entry(
      (s, d) => {
        import s.implicits._
        val toks = tokens($"text")
        val cols = (0 until 6).map { k =>
          array_min(transform(toks, t => polyHashStr(t, minHashSeed(k)))).as(s"mh$k")
        }
        rd(s, d, "documents").filter($"doc_id" < 100)
          .select(($"doc_id" +: cols): _*)
          .orderBy($"doc_id")
      },
      Some {
        val cols = (0 until 6).map { k =>
          s"list_min(list_transform($sqlToks, t -> ${sqlTokHash(minHashSeed(k))})) AS mh$k"
        }.mkString(",\n  ")
        s"SELECT doc_id,\n  $cols\nFROM documents WHERE doc_id < 100 ORDER BY doc_id"
      }),

    // SimHash 32-bit fingerprint — majority vote over token hashes
    "dd_simhash" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents").filter($"doc_id" < 100)
          .select($"doc_id", simHash(tokens($"text")).as("simhash"))
          .orderBy($"doc_id")
      },
      Some {
        val bitTerms = (0 until 32).map { b =>
          s"(CASE WHEN list_aggregate(list_transform(hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
        }.mkString(" +\n    ")
        s"""WITH t AS (SELECT doc_id,
           |  list_transform($sqlToks, t -> ${sqlTokHash(0x85ebca6bL)}) AS hs
           |  FROM documents WHERE doc_id < 100)
           |SELECT doc_id, $bitTerms AS simhash FROM t ORDER BY doc_id""".stripMargin
      }),

    // MinHash-LSH near-dup pipeline (shingle → minhash → band →
    // bucket-join), verified by true Jaccard over the shingle sets. The
    // banded join is the scale path: no all-pairs product. Non-SQL-
    // expressible join topology → gated by ScalaTest (planted near-dups),
    // rows-only here.
    "dd_minhash_lsh" -> Entry(
      (s, d) => {
        import s.implicits._
        val docs = rd(s, d, "documents").filter($"doc_id" < 200)
          .select($"doc_id", shingles($"text", 5, 2000).as("toks"))
          .withColumn("sig", minHashSig($"toks", 6))
          .withColumn("band", explode(lshBands($"sig", 3, 2)))
        val a = docs.select($"band", $"doc_id".as("id_a"), $"toks".as("toks_a"))
        val b = docs.select($"band", $"doc_id".as("id_b"), $"toks".as("toks_b"))
        a.join(b, Seq("band")).filter($"id_a" < $"id_b")
          .select($"id_a", $"id_b", $"toks_a", $"toks_b").distinct()
          .withColumn("jac", round(jaccard($"toks_a", $"toks_b"), 6))
          .filter($"jac" >= 0.4)
          .select($"id_a", $"id_b", $"jac")
          .orderBy($"id_a", $"id_b")
      },
      None),

    // embedding-cosine near-dup pairs within label blocks
    "dd_embedding_cosine" -> Entry(
      (s, d) => {
        import s.implicits._
        val e = rd(s, d, "embeddings")
        val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("v_a"))
        val b = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("v_b"))
        a.join(b, Seq("label")).filter($"id_a" < $"id_b")
          .withColumn("cos", round(cosine($"v_a", $"v_b"), 6))
          .filter($"cos" >= 0.35)
          .select($"label", $"id_a", $"id_b", $"cos")
          .orderBy($"label", $"id_a", $"id_b")
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
             |SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
             |ORDER BY label, id_a, id_b""".stripMargin)),

    // ---------------- Similarity search ----------------

    // brute-force cosine top-k (the correctness baseline): rank on the
    // 6-dp-rounded score with vec_id tiebreak → deterministic and portable
    "sim_topk_bruteforce" -> Entry(
      (s, d) => {
        import s.implicits._
        val e = rd(s, d, "embeddings")
        val q = e.filter($"vec_id" < 5)
          .select($"vec_id".as("q_id"), $"embedding".as("q_v"))
        val c = e.select($"vec_id".as("n_id"), $"embedding".as("n_v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
        c.crossJoin(broadcast(q)).filter($"n_id" =!= $"q_id")
          .withColumn("cos", round(cosine($"q_v", $"n_v"), 6))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"q_id", $"rank", $"n_id", $"cos")
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |s AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             |        round(list_cosine_similarity(q.v, c.v), 6) AS cos
             |      FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
             |SELECT q_id, rank, n_id, cos FROM (
             |  SELECT q_id, n_id, cos,
             |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
             |  FROM s) WHERE rank <= 5
             |ORDER BY q_id, rank""".stripMargin)),

    // bucketed ANN (IVF-style with the label as the coarse partition):
    // the scale path — candidates restricted to the probe's bucket
    "sim_topk_bucketed" -> Entry(
      (s, d) => {
        import s.implicits._
        val e = rd(s, d, "embeddings")
        val q = e.filter($"vec_id" < 20)
          .select($"vec_id".as("q_id"), $"label", $"embedding".as("q_v"))
        val c = e.select($"vec_id".as("n_id"), $"label", $"embedding".as("n_v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
        c.join(broadcast(q), Seq("label")).filter($"n_id" =!= $"q_id")
          .withColumn("cos", round(cosine($"q_v", $"n_v"), 6))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 3)
          .select($"q_id", $"rank", $"n_id", $"cos")
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |s AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             |        round(list_cosine_similarity(q.v, c.v), 6) AS cos
             |      FROM e q JOIN e c ON q.label = c.label AND q.vec_id < 20 AND c.vec_id <> q.vec_id)
             |SELECT q_id, rank, n_id, cos FROM (
             |  SELECT q_id, n_id, cos,
             |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
             |  FROM s) WHERE rank <= 3
             |ORDER BY q_id, rank""".stripMargin)),

    // random-hyperplane LSH ANN: bucket the corpus once, probe only the
    // query's bucket (the scale path — no full-corpus scan per query).
    // Approximate by construction → rows-only gate; plumbing asserted in
    // FunctionsSpec.
    "sim_lsh_ann" -> Entry(
      (s, d) => {
        import s.implicits._
        val planes = hyperplanes(4, 64)
        val e = rd(s, d, "embeddings")
          .withColumn("bucket", lshBucket($"embedding", planes))
        val q = e.filter($"vec_id" < 20)
          .select($"vec_id".as("q_id"), $"bucket", $"embedding".as("q_v"))
        val c = e.select($"vec_id".as("n_id"), $"bucket", $"embedding".as("n_v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
        c.join(broadcast(q), Seq("bucket")).filter($"n_id" =!= $"q_id")
          .withColumn("cos", round(cosine($"q_v", $"n_v"), 6))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 3)
          .select($"q_id", $"rank", $"n_id", $"cos")
          .orderBy($"q_id", $"rank")
      },
      None),

    // batched multimodal decode (stubbed decoder, real plumbing):
    // binary payload -> mapPartitions grouped batches -> feature vectors
    "mm_decode_batched" -> Entry(
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(s, rd(s, d, "documents"))
        Multimodal.decodeFeatures(s, media, batchSize = 64)
          .select($"doc_id", $"media_type", $"n_bytes",
            round(element_at($"features", 1).cast("double"), 6).as("f0"),
            round(element_at($"features", 2).cast("double"), 6).as("f1"))
          .orderBy($"doc_id")
      },
      None),

    // ---------------- Text analysis ----------------

    "ta_langid" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .select($"doc_id", langId($"text").as("lang_guess"))
          .orderBy($"doc_id")
      },
      Some {
        val lex = LangLexicons.map { case (lang, ws) =>
          lang -> ws.map(w => s"'$w'").mkString(", ")
        }
        val scores = lex.map { case (lang, in) =>
          s"len(list_filter(toks, t -> t IN ($in))) AS s_$lang"
        }.mkString(",\n  ")
        val best = lex.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
        val ladder = lex.map { case (l, _) =>
          s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
        }.mkString("\n  ")
        s"""WITH t AS (SELECT doc_id,
           |  list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> length(t) > 0) AS toks
           |  FROM documents)
           |SELECT doc_id, CASE $ladder ELSE 'und' END AS lang_guess
           |FROM (SELECT doc_id, $scores FROM t) ORDER BY doc_id""".stripMargin
      }),

    "ta_quality" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .select($"doc_id", qualityScore($"text").as("quality"))
          .orderBy($"doc_id")
      },
      Some {
        val stops = Stopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH t AS (SELECT doc_id, text,
           |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) /
           |    CAST(greatest(length(text), 1) AS DOUBLE) AS punct,
           |  CAST(len(list_filter(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0), t -> t IN ($stops))) AS DOUBLE) /
           |    CAST(greatest(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0)), 1) AS DOUBLE) AS stopr
           |  FROM documents)
           |SELECT doc_id, CAST(round(
           |  (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN CAST(0.4 AS DOUBLE)
           |        WHEN length(text) BETWEEN 20 AND 10000 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) +
           |  (CASE WHEN punct < 0.1 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.1 AS DOUBLE) END) +
           |  (CASE WHEN stopr > 0.05 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 2) AS DOUBLE) AS quality
           |FROM t ORDER BY doc_id""".stripMargin
      }),

    "ta_tokencount" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .select($"doc_id", wsTokenCount($"text").as("ws_tokens"),
            bpeishTokenCount($"text").as("bpeish_tokens"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  len(list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0)) AS ws_tokens,
             |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpeish_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // rolling-hash document fingerprint (first 64 chars)
    "ta_fingerprint" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .select($"doc_id", polyHash($"text", 64).as("fp"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform(generate_series(1, least(length(text), 64)),
              |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
              |    (a, x) -> (a * 31 + x) % $M) AS fp
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---------------- Multimodal plumbing (decode stubbed) ----------------

    // Treat the payload as an opaque binary column with typed metadata;
    // the "decode" stage is a deterministic fake (no image/audio libs in
    // this container) — the Spark-side schema/plumbing is real.
    "mm_binary_meta" -> Entry(
      (s, d) => {
        import s.implicits._
        val bin = encode($"text", "UTF-8")
        rd(s, d, "documents")
          .select($"doc_id",
            length(bin).as("n_bytes"),
            ascii($"text").as("first_code"),
            md5($"text").as("content_hash"),
            // stubbed decode: fake 2-dim feature from byte stats
            pmod(length(bin), lit(256)).as("fake_feat0"),
            pmod(ascii($"text") * 31 + length(bin), lit(997)).as("fake_feat1"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  ascii(text) AS first_code,
             |  md5(text) AS content_hash,
             |  octet_length(encode(text)) % 256 AS fake_feat0,
             |  (ascii(text) * 31 + octet_length(encode(text))) % 997 AS fake_feat1
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
