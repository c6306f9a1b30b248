package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extraction-operator queries (SURVEY.md §2 ids in the names) over the
  * `documents` table.
  *
  * Oracle strategy — "construct and recover": where the reference operator
  * is a regex/field extractor, the query BUILDS a payload column with known
  * ground truth (pure string ops over doc_id/text, identical in Spark and
  * DuckDB), then the Spark side runs the real extraction expressions while
  * the oracle emits the constructed truth directly. The gate then verifies
  * the extractor's semantics, not just SQL-dialect parity — and avoids
  * Java-vs-RE2 regex dialect drift entirely (the oracle needs no regex).
  */
object DocQueries {
  import Q._

  /** Ordered fallback over regexp_extract results, where Spark's
    * regexp_extract yields '' (not null) on no-match (R2/R8 coalesce
    * semantics).
    */
  private def firstNonEmpty(cols: Column*): Column =
    coalesce(cols.map(c => when(length(c) > 0, c)) :+ lit(""): _*)

  import Q.{tok, cap, sqlTok1, sqlTok2, sqlCap}

  val entries: Seq[(String, Entry)] = Seq(

    // S2 — limited scan / top-K of the listing
    "s2_limit_scan" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents").select($"doc_id", $"lang", $"n_chars")
          .orderBy($"doc_id").limit(100)
      },
      Some("SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 100")),

    // S3 — point lookup by position in the stable listing order
    "s3_point_lookup" -> Entry(
      (s, d) => {
        import s.implicits._
        // two-phase point lookup (r5 verdict item 1): the N-th row of the
        // listing order is inside the global top-N, which Spark computes
        // as a per-partition top-k + driver merge (TakeOrderedAndProject)
        // — never a corpus-wide single-partition sort. The row_number
        // window then runs over AT MOST 64 rows (bounded by the lookup
        // position, not the corpus), unlike the r5 shape whose
        // unpartitioned window moved the entire documents table through
        // one task.
        val w = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
        rd(s, d, "documents")
          .select($"doc_id", $"lang")
          .orderBy($"doc_id").limit(64)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 64)
          .select($"rn", $"doc_id", $"lang")
      },
      Some("""SELECT rn, doc_id, lang FROM (
             |  SELECT doc_id, lang, row_number() OVER (ORDER BY doc_id) AS rn
             |  FROM documents) WHERE rn = 64""".stripMargin)),

    // S4 — point lookup by content hash (ETag analog)
    "s4_hash_lookup" -> Entry(
      (s, d) => {
        import s.implicits._
        val docs = rd(s, d, "documents").withColumn("h", md5($"text"))
        val probe = docs.filter($"doc_id" === 42)
          .select($"h".as("probe_h"))
        docs.join(broadcast(probe), $"h" === $"probe_h")
          .select($"doc_id", $"h").orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS h FROM documents
             |WHERE md5(text) = (SELECT md5(text) FROM documents WHERE doc_id = 42)
             |ORDER BY doc_id""".stripMargin)),

    // F1-F5 — whitelist + size cap + poison-key blacklist + substring
    "f_filters" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .filter($"lang".isin("en", "es") && $"n_chars" <= 400 &&
            !$"doc_id".isin(7, 13) && lower($"text").contains("spark"))
          .select($"doc_id", $"lang", $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE lang IN ('en','es') AND n_chars <= 400
             |  AND doc_id NOT IN (7,13) AND contains(lower(text), 'spark')
             |ORDER BY doc_id""".stripMargin)),

    // F6 — content predicate on the first-5-token window (HOF exists)
    "f6_header_probe" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .filter(exists(slice(split($"text", " "), 1, 5), w => w === "spark"))
          .select($"doc_id").orderBy($"doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE len(list_filter(string_split(text,' ')[1:5], w -> w = 'spark')) > 0
             |ORDER BY doc_id""".stripMargin)),

    // P4 — tokenizer (sorted distinct len>2), joined for comparison
    "p4_tokenize" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents").filter($"doc_id" < 50)
          .select($"doc_id",
            graft.functions.TextFunctions.tokenStr($"text").as("toks"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  array_to_string(list_sort(list_distinct(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 2))), ' ') AS toks
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin)),

    // P5/P6 — first-line label + last-N window slices
    "p5p6_slices" -> Entry(
      (s, d) => {
        import s.implicits._
        val arr = split($"text", " ")
        rd(s, d, "documents").filter(size(split($"text", " ")) >= 4)
          .select($"doc_id", tok($"text", 1).as("first_tok"),
            array_join(slice(arr, -3, 3), " ").as("last3"))
          .orderBy($"doc_id").limit(200)
      },
      Some("""SELECT doc_id, string_split(text,' ')[1] AS first_tok,
             |  array_to_string(string_split(text,' ')[-3:], ' ') AS last3
             |FROM documents WHERE len(string_split(text,' ')) >= 4
             |ORDER BY doc_id LIMIT 200""".stripMargin)),

    // P7 + S5 — content hash + metadata projection
    "p7_md5_meta" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .select($"doc_id", md5($"text").as("h"), length($"text").as("text_len"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS h, length(text) AS text_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // P9 — "Last, First" name split (construct-and-recover)
    "p9_name_split" -> Entry(
      (s, d) => {
        import s.implicits._
        val name = concat(upper(tok($"text", 1)), lit(", "), upper(tok($"text", 2)))
        rd(s, d, "documents")
          .select($"doc_id",
            substring_index(name, ",", 1).as("last_name"),
            trim(substring_index(name, ",", -1)).as("first_name"))
          .orderBy($"doc_id").limit(200)
      },
      Some(s"""SELECT doc_id, upper($sqlTok1) AS last_name, upper($sqlTok2) AS first_name
              |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin)),

    // P10 — member line: last token is the ID, rest is the name
    "p10_member_id" -> Entry(
      (s, d) => {
        import s.implicits._
        val arr = split($"text", " ")
        val window4 = slice(arr, 1, 4)
        rd(s, d, "documents").filter(size(split($"text", " ")) >= 4)
          .select($"doc_id",
            array_join(slice(window4, 1, 3), " ").as("member_name"),
            element_at(window4, 4).as("member_id"))
          .orderBy($"doc_id").limit(200)
      },
      Some("""SELECT doc_id,
             |  array_to_string(string_split(text,' ')[1:3], ' ') AS member_name,
             |  string_split(text,' ')[4] AS member_id
             |FROM documents WHERE len(string_split(text,' ')) >= 4
             |ORDER BY doc_id LIMIT 200""".stripMargin)),

    // R1 — patient field bank over a constructed facesheet-shaped payload
    "r1_patient_bank" -> Entry(
      (s, d) => {
        import s.implicits._
        val payload = concat(
          lit("Patient Name: "), upper(tok($"text", 1)), lit(", "), upper(tok($"text", 2)),
          lit("\nPatient Date of Birth: "),
          lpad((pmod($"doc_id", lit(12)) + 1).cast("string"), 2, "0"), lit("/"),
          lpad((pmod($"doc_id", lit(28)) + 1).cast("string"), 2, "0"), lit("/"),
          (lit(1980) + pmod($"doc_id", lit(40))).cast("string"),
          lit("\nPatient Phone Number: ("),
          (lit(200) + pmod($"doc_id", lit(700))).cast("string"), lit(") 555-"),
          lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"))
        import graft.extract.Extract
        rd(s, d, "documents").select($"doc_id", payload.as("p"))
          .select($"doc_id",
            regexp_extract($"p", Extract.PatientNameRe, 1).as("patient_name"),
            regexp_extract($"p", Extract.PatientDobRe, 1).as("patient_dob"),
            regexp_extract($"p", Extract.PatientPhoneRe, 1).as("patient_phone"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
              |  upper($sqlTok1)||', '||upper($sqlTok2) AS patient_name,
              |  lpad(CAST(doc_id % 12 + 1 AS VARCHAR),2,'0')||'/'||lpad(CAST(doc_id % 28 + 1 AS VARCHAR),2,'0')||'/'||CAST(1980 + doc_id % 40 AS VARCHAR) AS patient_dob,
              |  '('||CAST(200 + doc_id % 700 AS VARCHAR)||') 555-'||lpad(CAST(doc_id % 10000 AS VARCHAR),4,'0') AS patient_phone
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // R2 — ordered-fallback date bank over three payload variants
    "r2_date_bank" -> Entry(
      (s, d) => {
        import s.implicits._
        val dt = concat(
          lpad((pmod($"doc_id", lit(12)) + 1).cast("string"), 2, "0"), lit("/"),
          lpad((pmod($"doc_id", lit(28)) + 1).cast("string"), 2, "0"), lit("/"),
          (lit(1980) + pmod($"doc_id", lit(40))).cast("string"))
        val tm = concat(lpad((pmod($"doc_id", lit(12)) + 1).cast("string"), 2, "0"),
          lit(":"), lpad(pmod($"doc_id", lit(60)).cast("string"), 2, "0"))
        val payload = when(pmod($"doc_id", lit(3)) === 0,
            concat(lit("Date : "), dt, lit(" "), tm, lit(" CMT")))
          .when(pmod($"doc_id", lit(3)) === 1, concat(lit("Fecha: "), dt))
          .otherwise(concat(lit("meeting on "), dt, lit(" notes")))
        import graft.extract.Extract
        rd(s, d, "documents").select($"doc_id", payload.as("p"))
          .select($"doc_id", firstNonEmpty(
            regexp_extract($"p", Extract.DateTimeFullRe, 1),
            regexp_extract($"p", Extract.DateAnchoredRe, 1),
            regexp_extract($"p", Extract.DateBareRe, 1)).as("extracted_date"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE
             |    WHEN doc_id % 3 = 0 THEN
             |      lpad(CAST(doc_id % 12 + 1 AS VARCHAR),2,'0')||'/'||lpad(CAST(doc_id % 28 + 1 AS VARCHAR),2,'0')||'/'||CAST(1980 + doc_id % 40 AS VARCHAR)
             |      ||' '||lpad(CAST(doc_id % 12 + 1 AS VARCHAR),2,'0')||':'||lpad(CAST(doc_id % 60 AS VARCHAR),2,'0')||' CMT'
             |    ELSE
             |      lpad(CAST(doc_id % 12 + 1 AS VARCHAR),2,'0')||'/'||lpad(CAST(doc_id % 28 + 1 AS VARCHAR),2,'0')||'/'||CAST(1980 + doc_id % 40 AS VARCHAR)
             |  END AS extracted_date
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // R3 — signed-by extraction with negative name validation
    "r3_signed_validated" -> Entry(
      (s, d) => {
        import s.implicits._
        val goodName = concat(cap(tok($"text", 1)), lit(" "), cap(tok($"text", 2)))
        val signer = when(pmod($"doc_id", lit(5)) === 0, lit("X"))
          .when(pmod($"doc_id", lit(5)) === 1, lit("Customer"))
          .otherwise(goodName)
        val payload = concat(lit("terms body\nSigned by customer: "), signer,
          lit("\nDate : 01/02/2020"))
        val raw = regexp_extract(payload, graft.extract.Extract.SignedByRe, 1)
        val excluded = graft.extract.Extract.excludedSignerPhrases
        val valid = length(trim(raw)) > 2 && length(trim(raw)) < 50 &&
          !lower(trim(raw)).isin(excluded: _*)
        rd(s, d, "documents")
          .select($"doc_id", when(valid, trim(raw)).otherwise(lit("")).as("signed_by"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
              |  CASE WHEN doc_id % 5 IN (0, 1) THEN ''
              |       ELSE ${sqlCap(sqlTok1)}||' '||${sqlCap(sqlTok2)} END AS signed_by
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // R4 — ICD-10 with bullet-aware DOTALL pattern + fallback chain
    "r4_icd_fallback" -> Entry(
      (s, d) => {
        import s.implicits._
        val code = concat(lit("Z39."), pmod($"doc_id", lit(9)).cast("string"))
        val payload = when(pmod($"doc_id", lit(3)) === 0,
            concat(lit("ICD-10 Code(s) listed\nnotes • "), code, lit(" more")))
          .otherwise(concat(lit("ICD-10 Code(s): "), code))
        import graft.extract.Extract
        rd(s, d, "documents").select($"doc_id", payload.as("p"))
          .select($"doc_id", firstNonEmpty(
            regexp_extract($"p", Extract.IcdBulletRe, 1),
            regexp_extract($"p", Extract.IcdPlainRe, 1),
            regexp_extract($"p", Extract.IcdGenericRe, 1)).as("icd10"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, 'Z39.'||CAST(doc_id % 9 AS VARCHAR) AS icd10
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // C2 — keyword-density classifier with precedence ladder
    "c2_keyword_classify" -> Entry(
      (s, d) => {
        import s.implicits._
        import graft.functions.TextFunctions.keywordScore
        val low = lower($"text")
        val a = keywordScore(low, Seq("scan", "join", "merge", "hash"))
        val b = keywordScore(low, Seq("group", "filter", "sort", "window"))
        val c = keywordScore(low, Seq("query", "batch", "row", "data"))
        rd(s, d, "documents")
          .select($"doc_id",
            when(a >= 3, "TYPE_A")
              .when(b >= 3 && b > c, "TYPE_B")
              .when(c >= 2, "TYPE_C")
              .otherwise("UNKNOWN").as("doc_type"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, CASE
             |  WHEN s_a >= 3 THEN 'TYPE_A'
             |  WHEN s_b >= 3 AND s_b > s_c THEN 'TYPE_B'
             |  WHEN s_c >= 2 THEN 'TYPE_C'
             |  ELSE 'UNKNOWN' END AS doc_type
             |FROM (SELECT doc_id,
             |  (CASE WHEN contains(lower(text),'scan') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'join') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'merge') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'hash') THEN 1 ELSE 0 END) AS s_a,
             |  (CASE WHEN contains(lower(text),'group') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'filter') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'sort') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'window') THEN 1 ELSE 0 END) AS s_b,
             |  (CASE WHEN contains(lower(text),'query') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'batch') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'row') THEN 1 ELSE 0 END + CASE WHEN contains(lower(text),'data') THEN 1 ELSE 0 END) AS s_c
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // A1 — empty-value confidence over a map column via HOFs
    "a1_confidence_expr" -> Entry(
      (s, d) => {
        import s.implicits._
        val f1 = when(pmod($"doc_id", lit(2)) === 0, lit("v1")).otherwise(lit(""))
        val f2 = when(pmod($"doc_id", lit(3)) === 0, lit("v2")).otherwise(lit(""))
        val f3 = lit("v3")
        val m = map(lit("a"), f1, lit("b"), f2, lit("c"), f3)
        val empties = size(map_filter(m, (_, v) => v === ""))
        rd(s, d, "documents")
          .select($"doc_id",
            round((size(map_keys(m)) - empties).cast("double") /
              size(map_keys(m)).cast("double"), 6).as("confidence"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, round((
             |  (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) +
             |  (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) + 1) / 3.0, 6) AS confidence
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // A4 — run counters rollup (grouped metrics)
    "a4_group_counters" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"n_chars" > 300, 1L).otherwise(0L)).as("n_big"))
          .orderBy($"lang")
      },
      // DuckDB sum(CASE...) yields HUGEINT (int128) — cast to BIGINT to
      // match Spark's LongType at the driver's typed-hash layer
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // D1 — dedup keeping the minimum key per group
    "d1_dedup_minkey" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "documents")
          .groupBy($"lang", $"source")
          .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n"))
          .orderBy($"lang", $"source")
      },
      Some("""SELECT lang, source, min(doc_id) AS keep_id, count(*) AS n
             |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // O1 — stable output ordering under partitioned ranking
    "o1_stable_order" -> Entry(
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"doc_id")
        rd(s, d, "documents")
          .select($"lang", $"doc_id", row_number().over(w).as("rn"))
          .orderBy($"lang", $"doc_id")
          .limit(300)
      },
      Some("""SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |FROM documents ORDER BY lang, doc_id LIMIT 300""".stripMargin))
  )
}
