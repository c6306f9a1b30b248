package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: run the dedup / ANN / text-analysis operators over
  * 1x, 10x and 100x copies of the sf0.1 documents/embeddings tables and
  * commit the measured times — DIRECT linearity evidence for the
  * "clique-linear at 100x" claims instead of extrapolation.
  *
  * Scaled-corpus construction (deterministic, no external data):
  *  - documents: copy k gets doc_id + k*1,000,000 and a short
  *    k-distinct suffix (" rev<k> dup<id%9>") — each base doc becomes a
  *    NEAR-DUP CLIQUE of `factor` members (token sets differ by ~2
  *    tokens), which is exactly the template-heavy regime the banded-LSH
  *    hot-bucket cap and the bucket-min topology exist for. A quadratic
  *    candidate generator would blow up 100x here; the capped/bucket-min
  *    paths must stay ~linear in total rows.
  *  - embeddings: copy k is the base vector ROTATED by k % 64 positions
  *    (norm-preserving, near-zero cosine to the base for generic
  *    vectors) — corpus grows without manufacturing giant cosine
  *    cliques, so per-row work stays comparable across factors; the
  *    planted-dup regime is exercised inside dd_embedding_lsh itself.
  *
  * Output: one JSON line (machine-readable) + BENCH/SCALE10X.md.
  */
object ScaleProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def buildScaled(spark: SparkSession, base: String, outDir: String,
      factor: Int): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docCopies = (0 until factor).map { k =>
      val text =
        if (k == 0) $"text"
        else concat($"text", lit(s" rev$k dup"),
          pmod($"doc_id", lit(9)).cast("string"))
      docs.select(($"doc_id" + lit(k.toLong * 1000000L)).as("doc_id"),
        text.as("text"), $"lang", $"source", $"n_chars")
    }
    docCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val embs = spark.read.parquet(s"$base/embeddings.parquet")
    val embCopies = (0 until factor).map { k =>
      val rot = k % 64
      val emb =
        if (rot == 0) $"embedding"
        else transform(sequence(lit(0), lit(63)),
          j => element_at($"embedding", pmod(j + lit(rot), lit(64)) + 1))
      embs.select(($"vec_id" + lit(k.toLong * 1000000L)).as("vec_id"),
        emb.as("embedding"), $"label")
    }
    embCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events scaled by copy with offset user/event ids (distinct-user
    // cardinality grows linearly — the regime the KMV sketch bounds);
    // part scaled with a per-copy price shift so the skyline's price
    // axis genuinely widens instead of multiplying exact ties
    val ev = spark.read.parquet(s"$base/events.parquet")
    (0 until factor).map { k =>
      ev.select(($"event_id" + lit(k.toLong * 10000000L)).as("event_id"),
        $"ts", ($"user_id" + lit(k.toLong * 1000000L)).as("user_id"),
        $"event_type", $"value", $"props")
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    val pt = spark.read.parquet(s"$base/part.parquet")
    (0 until factor).map { k =>
      pt.select(($"p_partkey" + lit(k.toLong * 10000000L)).as("p_partkey"),
        $"p_name", $"p_brand", $"p_type", $"p_size",
        ($"p_retailprice" + lit(k * 0.01)).as("p_retailprice"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/part.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors: Seq[Int] =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = session(cpus)

    // catalog entries that scale with the CORPUS (probe/query counts are
    // constant, so ideal scaling is ~linear in rows), plus the unbounded
    // probe variants of the id-bounded entries
    val catalogNames = Seq("dd_exact", "dd_ngram_jaccard", "dd_embedding_lsh",
      "sim_topk_bucketed", "sim_lsh_ann", "ta_langid", "ta_tokencount",
      "ta_vocab_topk", "ta_hash_sample", "ta_pack_sequences",
      "emb_quantize_int8", "sim_topk_ivf", "ta_bigram_typicality",
      "dd_decontaminate", "ta_gopher_repetition", "dd_repeated_ngram_mask",
      "ta_tfidf_topk", "ta_lm_perplexity", "ta_dsir_weights",
      "ta_ccnet_bucket", "ta_domain_mix", "ta_length_quantiles",
      "dd_semdedup", "lt_table_cells", "ta_fix_encoding",
      "ta_token_budget_pick", "dd_incremental_history",
      "dd_paragraph_exact", "ta_gopher_rules", "ta_c4_filters",
      "ta_split_train_val", "ta_url_normalize",
      // transcript-axis ops under the doc-id shift: each copy's 5,000
      // docs land in ~3 conversations of ~2,000 turns (cv = floor(sqrt)),
      // so the 100x corpus is ~300 GIANT conversations — the adversarial
      // regime for the conv-set aggregation (big token unions) and the
      // band-min window; the regex PII screen scales with raw turn count
      "tr_conv_near_dup", "tr_pii_turns",
      // the r5 late additions with non-row-local topologies: prefix
      // dedup (per-conv running hash + cross-conv group), preference
      // pairing (per-conv window join), the composed SFT funnel, and
      // the budget-derived per-domain rebalance (agg -> broadcast
      // thresholds); row-local ops (refusal rate, code blocks,
      // truncation) are deliberately not probed — nothing to measure
      "tr_prefix_dedup", "tr_pref_pairs", "tr_sft_mix", "ta_mix_rebalance",
      // pairwise exact-substring analytics: at 10x each clique window
      // sits in 10 docs (45 in-cap pairs — the output itself grows
      // f^2 per clique); at 100x the 64-doc cap DROPS clique windows,
      // so time must fall back to ~linear explode cost — the probe
      // demonstrates the cap bounding the blowup, not avoiding work
      "dd_exact_substring", "dd_exact_substring_span",
      // r5 sketch/graph additions: the HLL register agg and CMS cell agg
      // must stay linear in corpus tokens (bounded keyspaces — the whole
      // point of a sketch); pagerank is 3 join+agg rounds over a graph
      // that grows with the corpus; the blocked fuzzy join must stay
      // bounded by block sizes as the vocabulary grows
      "sk_hll_distinct", "sk_cms_heavy_hitters", "q_pagerank_iter",
      "q_fuzzy_join_blocked",
      // r5 final additions with amplification or corpus-keyed stages:
      // mean-pool explodes every vector x64 before its bounded agg,
      // table-stats Expands the scan x3 and re-keys by distinct value,
      // zorder's tile agg is bounded but rides the full scan (the
      // span/splice/json ops are row-local — not probed, nothing to
      // measure)
      "emb_mean_pool", "src_table_stats", "src_zorder_tiles",
      // r5 late additions: bm25 (row-local TF + broadcast stats +
      // TakeOrdered), the block-sharded inverted index (one gram-keyed
      // exchange whose per-group size is bounded by the block width),
      // A-Res weighted sampling (row-local keys + top-k merge), the
      // KMV theta sketch over events (bounded agg state as distinct
      // users grow linearly), degree-ordered triangle counting (wedge
      // work charged to low-degree vertices as the ring+chord graph
      // grows), and the skyline's bounded-summary prune over part
      "ta_bm25_rank", "ta_inverted_index", "ta_weighted_sample",
      "sk_kmv_theta", "q_triangle_count", "q_skyline_pareto",
      // iterative peeling (4 rounds of degree agg + semi-join over a
      // graph that grows with the corpus) and the CDC apply's
      // anti-join + union read path; the late statistics entries
      // (corr/chi2/psi/ols/rate-limit/gap-fill) are single bounded
      // aggs — not probed, nothing to measure
      "q_kcore_peel", "src_cdc_apply")
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
      catalogNames.map(n => n -> SparkEntry.queries(n)) ++
        graft.queries.PipelineQueries.scaleProbes
    // exact-Jaccard verification over ~10^3-shingle SETS is inherently
    // per-pair heavy; with `factor`-member cliques the capped candidate
    // count is O(n*cap), but each verify costs ~|shingles| — bounded,
    // measured to 10x, and skipped at 100x to keep the probe's runtime
    // sane (the bucket-min topology of dd_ngram_jaccard IS measured at
    // 100x — that is the dedup-proper scale path)
    val skipAt100 = Set("sp_minhash_lsh_all")

    val dirs: Map[Int, String] = factors.map { f =>
      val d = Files.createTempDirectory(s"graft-scale-${f}x").toString
      val t0 = System.nanoTime()
      buildScaled(spark, base, d, f)
      System.err.println(f"[scale] built ${f}x corpus in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      f -> d
    }.toMap

    // one discarded warmup pass at the smallest factor
    for ((name, fn) <- queries)
      try fn(spark, dirs(factors.min)).foreach(_ => ())
      catch { case e: Throwable => System.err.println(s"[scale] warmup $name: $e") }

    val times = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
    for ((name, fn) <- queries; f <- factors
         if !(f >= 100 && skipAt100.contains(name))) {
      // best-of-2: throughput claim, min is honest vs one-sided noise
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, dirs(f)).foreach(_ => ())
        catch { case e: Throwable => System.err.println(s"[scale] $name@${f}x: $e") }
        (System.nanoTime() - t0) / 1e9
      }.min
      System.err.println(f"[scale] $name%-22s ${f}%3dx: $t%8.2fs")
      times((name, f)) = t
    }

    val f0 = factors.min
    def ratio(name: String, f: Int): Option[Double] =
      for (a <- times.get((name, f)); b <- times.get((name, f0)); if b > 0)
        yield a / b
    val names = queries.map(_._1)
    val json = names.map { n =>
      val per = factors.flatMap(f => times.get((n, f)).map(t => s""""${f}x":${f"$t%.3f"}"""))
      s""""$n":{${per.mkString(",")}}"""
    }.mkString("{\"probe\":\"scale-linearity\",\"base\":\"" + base + "\",\"times\":{", ",", "}}")
    println()
    println(json)
    System.out.flush()

    val fmax = factors.max
    val md = new StringBuilder
    md.append(s"# Scale rehearsal: ${factors.map(f => s"${f}x").mkString(" / ")} of sf0.1 (measured)\n\n")
      .append(s"Corpus: the $base documents table scaled by copy (each base doc\n")
      .append("becomes a near-dup clique of `factor` members — the template-heavy\n")
      .append("regime the banded-LSH bucket cap exists for); embeddings scaled by\n")
      .append("norm-preserving rotation (no manufactured cosine cliques). Times are\n")
      .append(s"best-of-2 wall seconds on local[$cpus]; IDEAL LINEAR scaling = ratio\n")
      .append(s"$fmax at ${fmax}x (fixed per-job overhead makes measured ratios\n")
      .append("SUB-linear on small corpora; a quadratic candidate path would show\n")
      .append(s"ratios near ${fmax.toLong * fmax}).\n\n")
      .append("| query | " + factors.map(f => s"${f}x s").mkString(" | ") +
        s" | t${fmax}/t$f0 |\n")
      .append("|---|" + factors.map(_ => "---").mkString("|") + "|---|\n")
    for (n <- names) {
      val cells = factors.map(f =>
        times.get((n, f)).map(t => f"$t%.2f").getOrElse("skipped"))
      val r = ratio(n, fmax).map(r => f"$r%.1f").getOrElse("-")
      md.append(s"| $n | ${cells.mkString(" | ")} | $r |\n")
    }
    md.append("\nThe exact-substring family reads: at 10x every clique window\n")
      .append("sits in 10 docs (45 in-cap PAIRS per window — the pairwise output\n")
      .append("itself grows f^2 per clique, and the time tracks that output); at\n")
      .append("100x the 64-doc boilerplate cap drops clique windows entirely, so\n")
      .append("the pairwise entries fall back to ~linear explode cost — the cap\n")
      .append("bounding the blowup is the measured behavior, not an assumption.\n")
      .append("sp_exact_substring_min is the capless dedup-proper bucket-min\n")
      .append("topology (doc -> min-doc links, clique via CC): linear throughout.\n")
    if (factors.exists(f => f >= 100 && skipAt100.nonEmpty))
      md.append("\nsp_minhash_lsh_all is measured to 10x only: its exact-Jaccard\n")
        .append("verify costs ~|shingle set| (~10^3) per candidate pair, so while the\n")
        .append("capped candidate COUNT stays O(n*cap), the probe's wall time at 100x\n")
        .append("exceeds a sane budget; dd_ngram_jaccard (bucket-min topology — the\n")
        .append("dedup-proper scale path) carries the 100x point instead.\n")
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/SCALE10X.md"), md.result())
    spark.stop()
  }
}
