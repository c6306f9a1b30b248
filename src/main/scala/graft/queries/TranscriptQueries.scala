package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript-native training-data operators over the (conv_id, turn_idx,
  * role, text, ts) shape from BASELINE.json's input_hint — the operations a
  * pipeline needs BETWEEN per-turn extraction and dataset emission:
  * context-window assembly (the training-example join of each reply with
  * its dialogue history), conversation structural QA (role alternation /
  * malformed-dialogue detection), and reply-latency metrics.
  *
  * Like XQueries, the transcript frame is CONSTRUCTED deterministically
  * from the `documents` table so the DuckDB oracle reproduces it by the
  * same arithmetic: conv = floor(sqrt(doc_id)) gives a natural size ramp
  * (conversation k has 2k+1 turns — small convs and long-tail giants, the
  * skew family the engine's salted path exists for), turn_idx is the
  * offset within the square band, roles alternate user/assistant with a
  * deterministic 'tool' cadence and a deliberate violation family
  * (doc_id % 17 == 3 forces 'assistant', breaking alternation), and ts is
  * integer seconds monotone within each conversation with per-turn jitter.
  *
  * All three operators are per-conversation window/aggregate topologies:
  * one shuffle on conv_id, frames bounded by conversation length — at
  * 100 TB these run on the bucketed (conv_id)-sorted layout with NO
  * exchange at all (the zero-shuffle presorted path PlanSpec pins for the
  * extractor applies identically; windows reuse the bucketed sort order).
  */
object TranscriptQueries {
  import Q._

  /** Deterministic transcripts frame: (conv_id, turn_idx, role, ts_s, text). */
  private def transcripts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    rd(s, d, "documents")
      .withColumn("cv", floor(sqrt($"doc_id")).cast("long"))
      .withColumn("turn_idx", ($"doc_id" - $"cv" * $"cv").cast("long"))
      .select(
        concat(lit("conv-"), lpad($"cv".cast("string"), 4, "0")).as("conv_id"),
        $"turn_idx",
        when(pmod($"doc_id", lit(17)) === 3, "assistant")
          .when(pmod($"turn_idx", lit(7)) === 6, "tool")
          .when(pmod($"turn_idx", lit(2)) === 0, "user")
          .otherwise("assistant").as("role"),
        // input_hint's tool column: the invoked tool's name on tool
        // turns (deterministic 5-name rotation), null elsewhere
        when(pmod($"doc_id", lit(17)) =!= 3 && pmod($"turn_idx", lit(7)) === 6,
          concat(lit("fn"), pmod($"doc_id", lit(5)).cast("string"))).as("tool"),
        ($"turn_idx" * 40 + pmod($"doc_id" * 7, lit(13))).cast("long").as("ts_s"),
        // planted canned-reply family (doc_id % 23 == 5): a 3-variant
        // template answer repeated verbatim across conversations — the
        // corpus has no natural exact-duplicate texts, so the canned-
        // reply detector needs this family to be non-degenerate
        when(pmod($"doc_id", lit(23)) === 5,
          concat(lit("unable to help with that request variant "),
            pmod($"doc_id", lit(3)).cast("string")))
          .otherwise($"text").as("text"))
  }

  /** The same construction as a DuckDB CTE (shared by all oracles). */
  private val sqlTranscripts =
    """t0 AS (SELECT doc_id, CAST(floor(sqrt(doc_id)) AS BIGINT) AS cv, text
      |       FROM documents),
      |tr AS (SELECT 'conv-'||lpad(CAST(cv AS VARCHAR),4,'0') AS conv_id,
      |         doc_id - cv*cv AS turn_idx,
      |         CASE WHEN doc_id % 17 = 3 THEN 'assistant'
      |              WHEN (doc_id - cv*cv) % 7 = 6 THEN 'tool'
      |              WHEN (doc_id - cv*cv) % 2 = 0 THEN 'user'
      |              ELSE 'assistant' END AS role,
      |         CASE WHEN doc_id % 17 <> 3 AND (doc_id - cv*cv) % 7 = 6
      |              THEN 'fn' || CAST(doc_id % 5 AS VARCHAR) END AS tool,
      |         (doc_id - cv*cv)*40 + (doc_id*7) % 13 AS ts_s,
      |         CASE WHEN doc_id % 23 = 5
      |              THEN 'unable to help with that request variant ' ||
      |                   CAST(doc_id % 3 AS VARCHAR)
      |              ELSE text END AS text
      |       FROM t0)""".stripMargin

  val entries: Seq[(String, Entry)] = Seq(

    // Context-window assembly: every assistant turn paired with its
    // dialogue history (up to 3 preceding turns rendered "role: snippet"),
    // the join that turns a transcript table into SFT training examples.
    // Topology: ONE window per conversation with a BOUNDED frame
    // (ROWS -3..-1) — cost is O(K) per row regardless of conversation
    // length, and on the production bucketed layout the conv-sort is free.
    "tr_context_windows" -> Entry(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
          .rowsBetween(-3, -1)
        transcripts(s, d)
          .withColumn("ctx", concat_ws(" | ",
            collect_list(concat($"role", lit(": "), substring($"text", 1, 24)))
              .over(w)))
          .withColumn("n_ctx", least($"turn_idx", lit(3L)))
          .filter($"role" === "assistant")
          .select($"conv_id", $"turn_idx", $"n_ctx", $"ctx")
          .orderBy($"conv_id", $"turn_idx")
      },
      Some(s"""WITH $sqlTranscripts
              |SELECT conv_id, turn_idx, least(turn_idx, 3) AS n_ctx,
              |  COALESCE(array_to_string(list(role || ': ' || substr(text, 1, 24))
              |    OVER (PARTITION BY conv_id ORDER BY turn_idx
              |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), ' | '), '') AS ctx
              |FROM tr
              |QUALIFY role = 'assistant'
              |ORDER BY conv_id, turn_idx""".stripMargin)),

    // Conversation structural QA: per-conversation turn counts, role-
    // alternation violations (a turn repeating its predecessor's role),
    // and the wellformed flag (starts with 'user', zero violations) —
    // the malformed-dialogue gate run before any transcript enters a
    // training mix. One lag window + one aggregate, both keyed by conv.
    "tr_role_alternation" -> Entry(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        transcripts(s, d)
          .withColumn("prev_role", lag($"role", 1).over(w))
          .groupBy($"conv_id")
          .agg(count(lit(1)).as("n_turns"),
            count(when($"role" === "tool", 1)).as("n_tool"),
            count(when($"role" === $"prev_role", 1)).as("n_violations"),
            max(when($"turn_idx" === 0, $"role" === "user"))
              .as("starts_with_user"))
          .withColumn("wellformed",
            $"starts_with_user" && $"n_violations" === 0)
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |lg AS (SELECT conv_id, turn_idx, role,
              |         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
              |       FROM tr),
              |ag AS (SELECT conv_id, count(*) AS n_turns,
              |         count(CASE WHEN role = 'tool' THEN 1 END) AS n_tool,
              |         count(CASE WHEN role = prev_role THEN 1 END) AS n_violations,
              |         max(CASE WHEN turn_idx = 0 THEN role = 'user' END) AS starts_with_user
              |       FROM lg GROUP BY conv_id)
              |SELECT conv_id, n_turns, n_tool, n_violations, starts_with_user,
              |  starts_with_user AND n_violations = 0 AS wellformed
              |FROM ag ORDER BY conv_id""".stripMargin)),

    // Reply latency: seconds each assistant turn arrived after the turn
    // before it, aggregated per conversation (reply count, total and max
    // wait). All-integer arithmetic so the numbers are engine-exact; the
    // lag window and the aggregate are both conv-keyed (zero extra
    // exchanges on the bucketed layout). Conversations with no reply
    // (single-turn) drop out on both sides by the same rule.
    "tr_reply_latency" -> Entry(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        transcripts(s, d)
          .withColumn("prev_ts", lag($"ts_s", 1).over(w))
          .filter($"role" === "assistant" && $"prev_ts".isNotNull)
          .withColumn("wait_s", $"ts_s" - $"prev_ts")
          .groupBy($"conv_id")
          .agg(count(lit(1)).as("n_replies"),
            sum($"wait_s").as("total_wait_s"),
            max($"wait_s").as("max_wait_s"))
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |lg AS (SELECT conv_id, turn_idx, role, ts_s,
              |         lag(ts_s) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts
              |       FROM tr)
              |SELECT conv_id, count(*) AS n_replies,
              |  CAST(sum(ts_s - prev_ts) AS BIGINT) AS total_wait_s,
              |  max(ts_s - prev_ts) AS max_wait_s
              |FROM lg WHERE role = 'assistant' AND prev_ts IS NOT NULL
              |GROUP BY conv_id ORDER BY conv_id""".stripMargin)),

    // Canned-reply detection: assistant texts repeated VERBATIM across
    // conversations (template answers, refusal boilerplate — the stuff a
    // training mix must downweight or drop). One hash-keyed map-side-
    // combined aggregate over assistant turns only; nothing pairwise,
    // nothing corpus-windowed. At 100 TB this is the cheapest dedup
    // signal a transcript store yields.
    "tr_canned_replies" -> Entry(
      (s, d) => {
        import s.implicits._
        transcripts(s, d)
          .filter($"role" === "assistant")
          .groupBy(md5($"text").as("h"))
          .agg(countDistinct($"conv_id").as("n_convs"),
            count(lit(1)).as("n_uses"),
            min(substring($"text", 1, 32)).as("snippet"))
          .filter($"n_convs" >= 2)
          .orderBy(desc("n_uses"), $"h")
      },
      Some(s"""WITH $sqlTranscripts
              |SELECT md5(text) AS h,
              |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
              |  CAST(count(*) AS BIGINT) AS n_uses,
              |  min(substr(text, 1, 32)) AS snippet
              |FROM tr WHERE role = 'assistant'
              |GROUP BY md5(text) HAVING count(DISTINCT conv_id) >= 2
              |ORDER BY n_uses DESC, h""".stripMargin)),

    // Tool-transition statistics: which tool follows which within a
    // conversation's tool-call sequence (the agent-behavior profile a
    // transcript corpus is mined for before SFT). Lead over tool turns
    // per conversation, then a bounded (tool, tool) key-space aggregate
    // — the conv window and the extract share the bucketed layout's
    // conv_id clustering; the final agg key space is |tools|^2.
    "tr_tool_transitions" -> Entry(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        transcripts(s, d)
          .filter($"role" === "tool")
          .withColumn("next_tool", lead($"tool", 1).over(w))
          .filter($"next_tool".isNotNull)
          .groupBy($"tool", $"next_tool")
          .agg(count(lit(1)).as("n_transitions"),
            countDistinct($"conv_id").as("n_convs"))
          .orderBy($"tool", $"next_tool")
      },
      Some(s"""WITH $sqlTranscripts,
              |sq AS (SELECT conv_id, tool,
              |         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_tool
              |       FROM tr WHERE role = 'tool')
              |SELECT tool, next_tool,
              |  CAST(count(*) AS BIGINT) AS n_transitions,
              |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
              |FROM sq WHERE next_tool IS NOT NULL
              |GROUP BY tool, next_tool ORDER BY tool, next_tool""".stripMargin)),

    // Conversation-length profile: exact p50/p90/p99 turns-per-
    // conversation plus the max (the giant-conversation indicator that
    // decides whether the salted extract path is needed). Same scale-
    // safe selection topology as ta_length_quantiles: sizes from one
    // conv-keyed agg, then a bounded HISTOGRAM of distinct sizes — the
    // cumulative window ranges over that summary only, never the
    // conversations (k-th smallest = least size whose cumulative count
    // reaches k = exact type-1 selection on integers). The oracle stays
    // the row_number definition, so the hash match proves the bounded
    // topology computes the exact quantiles.
    "tr_conv_length_profile" -> Entry(
      (s, d) => {
        import s.implicits._
        val sizes = transcripts(s, d).groupBy($"conv_id")
          .agg(count(lit(1)).as("n_turns"))
        val hist = sizes.groupBy($"n_turns").agg(count(lit(1)).as("c"))
        val wCum = Window.orderBy($"n_turns")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist
          .withColumn("cum", sum($"c").over(wCum))
          .withColumn("n", sum($"c").over(Window.partitionBy()))
          .agg(max($"n").as("n_convs"),
            min(when($"cum" >= ceil($"n" * 0.5), $"n_turns")).as("p50_turns"),
            min(when($"cum" >= ceil($"n" * 0.9), $"n_turns")).as("p90_turns"),
            min(when($"cum" >= ceil($"n" * 0.99), $"n_turns")).as("p99_turns"),
            max($"n_turns").as("max_turns"))
      },
      Some(s"""WITH $sqlTranscripts,
              |sz AS (SELECT conv_id, count(*) AS n_turns FROM tr GROUP BY conv_id),
              |r AS (SELECT n_turns,
              |    row_number() OVER (ORDER BY n_turns, conv_id) AS rn,
              |    count(*) OVER () AS n FROM sz)
              |SELECT CAST(count(*) AS BIGINT) AS n_convs,
              |  max(CASE WHEN rn = ceil(n * 0.5) THEN n_turns END) AS p50_turns,
              |  max(CASE WHEN rn = ceil(n * 0.9) THEN n_turns END) AS p90_turns,
              |  max(CASE WHEN rn = ceil(n * 0.99) THEN n_turns END) AS p99_turns,
              |  CAST(max(n_turns) AS BIGINT) AS max_turns
              |FROM r""".stripMargin)),

    // Retry detection: a user re-sending (nearly) the same request right
    // after their previous message — the duplicated-prompt family an SFT
    // mix must collapse (it otherwise overweights whatever answer followed
    // the retry). Signal: token-set Jaccard between each user turn and the
    // PREVIOUS user turn of the same conversation. Topology: filter to
    // user turns, ONE conv-keyed lag window (frame = 1 row), row-local
    // tokenize + set math — no pairwise join, nothing corpus-windowed; on
    // the bucketed (conv_id, turn_idx)-sorted layout the window reuses the
    // scan order (zero exchanges, same shape PlanSpec pins for tr_*).
    // The corpus has no natural consecutive retries, so two families are
    // planted in the frame (same technique as dd_exact_substring's planted
    // spans / dd_embedding_lsh's perturbed copy): conv % 9 == 2 user turns
    // repeat one text verbatim (jac = 1, exact), conv % 9 == 5 user turns
    // differ only in a trailing config token (jac ≈ 0.8, near-retry).
    "tr_retry_detect" -> Entry(
      (s, d) => {
        import s.implicits._
        import graft.functions.TextFunctions.{jaccard, tokens}
        val cv = substring($"conv_id", 6, 4).cast("long")
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        transcripts(s, d)
          .withColumn("text",
            when(pmod(cv, lit(9)) === 2 && $"role" === "user",
              lit("cancel that and retry the export"))
            .when(pmod(cv, lit(9)) === 5 && $"role" === "user",
              concat(lit("please run the nightly job again with config cfg"),
                pmod($"turn_idx", lit(3)).cast("string")))
            .otherwise($"text"))
          .filter($"role" === "user")
          .withColumn("prev_idx", lag($"turn_idx", 1).over(w))
          .withColumn("prev_text", lag($"text", 1).over(w))
          .filter($"prev_idx".isNotNull)
          .withColumn("jac",
            round(jaccard(tokens($"text"), tokens($"prev_text")), 6))
          .filter($"jac" >= 0.5)
          .select($"conv_id", $"prev_idx", $"turn_idx", $"jac",
            ($"text" === $"prev_text").as("exact"))
          .orderBy($"conv_id", $"turn_idx")
      },
      Some(s"""WITH $sqlTranscripts,
              |rt AS (SELECT conv_id, turn_idx, role,
              |         CASE WHEN CAST(substr(conv_id, 6, 4) AS BIGINT) % 9 = 2
              |                   AND role = 'user'
              |              THEN 'cancel that and retry the export'
              |              WHEN CAST(substr(conv_id, 6, 4) AS BIGINT) % 9 = 5
              |                   AND role = 'user'
              |              THEN 'please run the nightly job again with config cfg'
              |                   || CAST(turn_idx % 3 AS VARCHAR)
              |              ELSE text END AS text
              |       FROM tr),
              |u AS (SELECT conv_id, turn_idx, text,
              |        lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx,
              |        lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
              |      FROM rt WHERE role = 'user'),
              |tk AS (SELECT conv_id, prev_idx, turn_idx, text, prev_text,
              |         list_sort(list_distinct(list_filter(
              |           string_split_regex(lower(text), '[^a-z0-9]+'),
              |           x -> length(x) > 2))) AS t_a,
              |         list_sort(list_distinct(list_filter(
              |           string_split_regex(lower(prev_text), '[^a-z0-9]+'),
              |           x -> length(x) > 2))) AS t_b
              |       FROM u WHERE prev_idx IS NOT NULL)
              |SELECT conv_id, prev_idx, turn_idx,
              |  round(CAST(len(list_intersect(t_a, t_b)) AS DOUBLE) /
              |        CAST(len(list_distinct(list_concat(t_a, t_b))) AS DOUBLE), 6) AS jac,
              |  text = prev_text AS exact
              |FROM tk
              |WHERE round(CAST(len(list_intersect(t_a, t_b)) AS DOUBLE) /
              |            CAST(len(list_distinct(list_concat(t_a, t_b))) AS DOUBLE), 6) >= 0.5
              |ORDER BY conv_id, turn_idx""".stripMargin)),

    // Duplicate conversation-PREFIX detection: agent logs share openings
    // verbatim (system prompt + canned greeting + first probe), and a
    // training mix that keeps every copy overweights the template. The
    // fingerprint is order-sensitive over the first 4 turns — per-turn
    // md5, slotted by turn_idx into a conditional-max aggregate (map-side
    // combinable: no collect_list, no window), concatenated in slot order
    // and re-hashed. Topology: one conv-keyed agg builds fingerprints,
    // one fingerprint-keyed agg groups them — both exchanges bounded-key,
    // nothing pairwise. The corpus has no natural shared openings, so two
    // template families are planted (cv % 11 == 4 and == 7), each
    // overriding turns 0-3 with a fixed per-slot text.
    "tr_prefix_dedup" -> Entry(
      (s, d) => {
        import s.implicits._
        val cv = substring($"conv_id", 6, 4).cast("long")
        def slot(i: Int) = coalesce(
          max(when($"turn_idx" === i, md5($"text"))), lit(""))
        transcripts(s, d)
          .withColumn("text",
            when(pmod(cv, lit(11)) === 4 && $"turn_idx" < 4,
              concat(lit("standard onboarding greeting step "),
                $"turn_idx".cast("string")))
            .when(pmod(cv, lit(11)) === 7 && $"turn_idx" < 4,
              concat(lit("escalation template opener step "),
                $"turn_idx".cast("string")))
            .otherwise($"text"))
          .filter($"turn_idx" < 4)
          .groupBy($"conv_id")
          .agg(md5(concat_ws("|", slot(0), slot(1), slot(2), slot(3)))
            .as("h"))
          .groupBy($"h")
          .agg(count(lit(1)).as("n_convs"), min($"conv_id").as("keeper_conv"))
          .filter($"n_convs" >= 2)
          .orderBy($"h")
      },
      Some(s"""WITH $sqlTranscripts,
              |pt AS (SELECT conv_id, turn_idx,
              |         CASE WHEN CAST(substr(conv_id, 6, 4) AS BIGINT) % 11 = 4
              |                   AND turn_idx < 4
              |              THEN 'standard onboarding greeting step ' ||
              |                   CAST(turn_idx AS VARCHAR)
              |              WHEN CAST(substr(conv_id, 6, 4) AS BIGINT) % 11 = 7
              |                   AND turn_idx < 4
              |              THEN 'escalation template opener step ' ||
              |                   CAST(turn_idx AS VARCHAR)
              |              ELSE text END AS text
              |       FROM tr WHERE turn_idx < 4),
              |pf AS (SELECT conv_id, md5(concat_ws('|',
              |         coalesce(max(CASE WHEN turn_idx = 0 THEN md5(text) END), ''),
              |         coalesce(max(CASE WHEN turn_idx = 1 THEN md5(text) END), ''),
              |         coalesce(max(CASE WHEN turn_idx = 2 THEN md5(text) END), ''),
              |         coalesce(max(CASE WHEN turn_idx = 3 THEN md5(text) END), ''))) AS h
              |       FROM pt GROUP BY conv_id)
              |SELECT h, CAST(count(*) AS BIGINT) AS n_convs,
              |  min(conv_id) AS keeper_conv
              |FROM pf GROUP BY h HAVING count(*) >= 2 ORDER BY h""".stripMargin)),

    // Speaker-balance QA: per-conversation turn and character mass by
    // role, assistant character share, and the balance verdict (share in
    // [0.2, 0.8]) — the monologue/echo-chamber gate before a transcript
    // enters an SFT mix (a conversation that is 95 % assistant text is a
    // lecture, not a dialogue). One conv-keyed map-side-combinable
    // aggregate; the share is one integer-over-integer division rounded
    // to 6 dp (same determinism idiom as tr_retry_detect's jac).
    "tr_speaker_balance" -> Entry(
      (s, d) => {
        import s.implicits._
        def chars(r: String) =
          sum(when($"role" === r, length($"text")).otherwise(0L))
        transcripts(s, d)
          .groupBy($"conv_id")
          .agg(count(lit(1)).as("n_turns"),
            count(when($"role" === "user", 1)).as("n_user"),
            count(when($"role" === "assistant", 1)).as("n_assistant"),
            count(when($"role" === "tool", 1)).as("n_tool"),
            chars("user").as("chars_user"),
            chars("assistant").as("chars_assistant"),
            sum(length($"text")).as("chars_total"))
          .withColumn("assistant_share",
            round($"chars_assistant".cast("double") / $"chars_total", 6))
          .withColumn("balanced",
            $"assistant_share".between(0.2, 0.8))
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |ag AS (SELECT conv_id, count(*) AS n_turns,
              |         count(CASE WHEN role = 'user' THEN 1 END) AS n_user,
              |         count(CASE WHEN role = 'assistant' THEN 1 END) AS n_assistant,
              |         count(CASE WHEN role = 'tool' THEN 1 END) AS n_tool,
              |         CAST(sum(CASE WHEN role = 'user' THEN length(text) ELSE 0 END) AS BIGINT) AS chars_user,
              |         CAST(sum(CASE WHEN role = 'assistant' THEN length(text) ELSE 0 END) AS BIGINT) AS chars_assistant,
              |         CAST(sum(length(text)) AS BIGINT) AS chars_total
              |       FROM tr GROUP BY conv_id)
              |SELECT conv_id, n_turns, n_user, n_assistant, n_tool,
              |  chars_user, chars_assistant, chars_total,
              |  round(CAST(chars_assistant AS DOUBLE) / chars_total, 6) AS assistant_share,
              |  round(CAST(chars_assistant AS DOUBLE) / chars_total, 6)
              |    BETWEEN 0.2 AND 0.8 AS balanced
              |FROM ag ORDER BY conv_id""".stripMargin)),

    // PII screen over turns: which conversations carry emails / phone
    // numbers / SSNs, per-type turn counts — the privacy gate a transcript
    // corpus passes before training (CCPA/GDPR-style triage: route to
    // redaction, don't silently train). Spark runs the REAL TextFunctions
    // regex detectors over a payload of sanitized corpus text (letters
    // only — provably match-free) plus PII planted by a (doc_id % 13)
    // rule; the oracle counts by the same modular rule with no regex at
    // all, so a hash match proves the detectors fire exactly on the
    // planted turns and never on clean text. Row-local rlike chain
    // (codegen'd), one conv-keyed aggregate; zero windows, zero joins.
    "tr_pii_turns" -> Entry(
      (s, d) => {
        import s.implicits._
        import graft.functions.TextFunctions.{EmailRe, PhoneRe, SsnRe}
        val cv = substring($"conv_id", 6, 4).cast("long")
        val docId = cv * cv + $"turn_idx"
        val base = regexp_replace(lower(substring($"text", 1, 64)),
          "[^a-z ]", "")
        val payload = concat(base,
          when(pmod(docId, lit(13)) === 2,
            concat(lit(" contact user"), docId.cast("string"),
              lit("@mail.example.org")))
          .when(pmod(docId, lit(13)) === 6, lit(" call (555) 555-0199"))
          .when(pmod(docId, lit(13)) === 9, lit(" ssn 123-45-6789"))
          .otherwise(lit("")))
        transcripts(s, d)
          .withColumn("p", payload)
          .withColumn("e", $"p".rlike(EmailRe))
          .withColumn("f", $"p".rlike(PhoneRe))
          .withColumn("n", $"p".rlike(SsnRe))
          .groupBy($"conv_id")
          .agg(count(lit(1)).as("n_turns"),
            count(when($"e", 1)).as("n_email_turns"),
            count(when($"f", 1)).as("n_phone_turns"),
            count(when($"n", 1)).as("n_ssn_turns"),
            count(when($"e" || $"f" || $"n", 1)).as("n_pii_turns"))
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |pk AS (SELECT conv_id,
              |         (CAST(substr(conv_id, 6, 4) AS BIGINT) *
              |          CAST(substr(conv_id, 6, 4) AS BIGINT) + turn_idx) % 13 AS k
              |       FROM tr)
              |SELECT conv_id, count(*) AS n_turns,
              |  count(CASE WHEN k = 2 THEN 1 END) AS n_email_turns,
              |  count(CASE WHEN k = 6 THEN 1 END) AS n_phone_turns,
              |  count(CASE WHEN k = 9 THEN 1 END) AS n_ssn_turns,
              |  count(CASE WHEN k IN (2, 6, 9) THEN 1 END) AS n_pii_turns
              |FROM pk GROUP BY conv_id ORDER BY conv_id""".stripMargin)),

    // Per-tool latency profile: how long each tool's call took, measured
    // as the gap from the tool turn to the NEXT turn of the conversation
    // (any role — the transcript records when control returned). Lead
    // over the full conv-keyed window, then a bounded |tools|-key
    // aggregate: call count, total / max wait, conversation coverage —
    // the agent-behavior profile that decides which tool traces are worth
    // mining. All-integer arithmetic; same one-conv-exchange topology as
    // tr_tool_transitions (the per-tool re-key is a 5-key space).
    "tr_tool_latency" -> Entry(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        transcripts(s, d)
          .withColumn("next_ts", lead($"ts_s", 1).over(w))
          .filter($"role" === "tool" && $"next_ts".isNotNull)
          .withColumn("gap_s", $"next_ts" - $"ts_s")
          .groupBy($"tool")
          .agg(count(lit(1)).as("n_calls"),
            sum($"gap_s").as("total_gap_s"),
            max($"gap_s").as("max_gap_s"),
            countDistinct($"conv_id").as("n_convs"))
          .orderBy($"tool")
      },
      Some(s"""WITH $sqlTranscripts,
              |sq AS (SELECT conv_id, role, tool, ts_s,
              |         lead(ts_s) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_ts
              |       FROM tr)
              |SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
              |  CAST(sum(next_ts - ts_s) AS BIGINT) AS total_gap_s,
              |  max(next_ts - ts_s) AS max_gap_s,
              |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
              |FROM sq WHERE role = 'tool' AND next_ts IS NOT NULL
              |GROUP BY tool ORDER BY tool""".stripMargin)),

    // Conversation-level near-dup detection: the dd_ngram_jaccard
    // banded-MinHash topology lifted from documents to WHOLE conversations
    // (the same dialogue re-logged under a new conv_id — run twice,
    // mirrored from a retry queue — is the transcript corpus's dominant
    // redundancy, and turn-level dedup can't see it). Per-conversation
    // token SET (explode + collect_set: one conv-keyed partial-aggregating
    // exchange, set size bounded by conversation text), 6-seed MinHash +
    // 3x2 banding over the set, each conversation compared ONLY to its
    // band bucket's min id (min(struct) window carries the payload — no
    // self-join, O(n) verifies), exact Jaccard >= 0.8 confirms. Two
    // planted families: cv % 9 == 4 shares 20 of 22 tokens pairwise
    // (jac 0.909 — detected), cv % 9 == 7 shares 10 of 16 (jac 0.625 —
    // a banding collision must be REJECTED by the verify, pinning the
    // two-stage candidate/confirm contract).
    "tr_conv_near_dup" -> Entry(
      (s, d) => {
        import s.implicits._
        import graft.functions.TextFunctions.{jaccard, lshBands, minHashSig, tokens}
        val cv = substring($"conv_id", 6, 4).cast("long")
        val sharedB = "standard workflow narration shared vocabulary alpha beta gamma delta"
        val sharedA = sharedB + " epsilon zeta eta theta iota kappa lambda omicron sigma tau"
        val planted =
          when(pmod(cv, lit(9)) === 4,
            concat(lit(sharedA + " step "), pmod($"turn_idx", lit(5)).cast("string"),
              lit(" convtag"), cv.cast("string")))
          .when(pmod(cv, lit(9)) === 7,
            concat(lit(sharedB + " step "), pmod($"turn_idx", lit(5)).cast("string"),
              lit(" uniqalpha"), cv.cast("string"),
              lit(" uniqbeta"), cv.cast("string"),
              lit(" uniqgamma"), cv.cast("string")))
          .otherwise($"text")
        val sets = transcripts(s, d)
          .withColumn("text", planted)
          .select($"conv_id".as("id"), explode(tokens($"text")).as("t"))
          .groupBy($"id").agg(array_sort(collect_set($"t")).as("p"))
        val wb = Window.partitionBy($"band")
        sets
          .select($"id", $"p",
            explode(lshBands(minHashSig($"p", 6), 3, 2)).as("band"))
          .withColumn("mn", min(struct($"id", $"p")).over(wb))
          .withColumn("jac", round(jaccard($"p", $"mn.p"), 6))
          .filter($"id" =!= $"mn.id" && $"jac" >= 0.8)
          .groupBy($"id")
          .agg(min(struct($"mn.id".as("dup_of"), $"jac".as("jac"))).as("m"))
          .select($"id".as("conv_id"), $"m.dup_of".as("dup_of"),
            $"m.jac".as("jac"))
          .orderBy($"conv_id")
      },
      Some {
        val cvSql = "CAST(substr(conv_id, 6, 4) AS BIGINT)"
        val sharedB = "standard workflow narration shared vocabulary alpha beta gamma delta"
        val sharedA = sharedB + " epsilon zeta eta theta iota kappa lambda omicron sigma tau"
        s"""WITH $sqlTranscripts,
           |pt AS (SELECT conv_id, turn_idx,
           |         CASE WHEN $cvSql % 9 = 4
           |              THEN '$sharedA step ' || CAST(turn_idx % 5 AS VARCHAR) ||
           |                   ' convtag' || CAST($cvSql AS VARCHAR)
           |              WHEN $cvSql % 9 = 7
           |              THEN '$sharedB step ' || CAST(turn_idx % 5 AS VARCHAR) ||
           |                   ' uniqalpha' || CAST($cvSql AS VARCHAR) ||
           |                   ' uniqbeta' || CAST($cvSql AS VARCHAR) ||
           |                   ' uniqgamma' || CAST($cvSql AS VARCHAR)
           |              ELSE text END AS text
           |       FROM tr),
           |tk AS (SELECT conv_id AS id,
           |         list_sort(list_distinct(flatten(list(${PipelineQueries.sqlToks})))) AS toks
           |       FROM pt GROUP BY conv_id),
           |sigs AS (SELECT id, toks, ${PipelineQueries.sqlSig()} AS sig FROM tk),
           |bands AS (SELECT id, unnest(${PipelineQueries.sqlBandKeys(3, 2)}) AS band FROM sigs),
           |wm AS (SELECT id, min(id) OVER (PARTITION BY band) AS min_id FROM bands),
           |cand AS (SELECT DISTINCT id, min_id FROM wm WHERE id <> min_id),
           |jc AS (SELECT c.id, c.min_id,
           |         round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
           |               CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6) AS jac
           |       FROM cand c JOIN tk a ON a.id = c.id JOIN tk b ON b.id = c.min_id)
           |SELECT id AS conv_id, min(min_id) AS dup_of, arg_min(jac, min_id) AS jac
           |FROM jc WHERE jac >= 0.8 GROUP BY id ORDER BY conv_id""".stripMargin
      }),

    // Refusal-rate QA: the share of each conversation's assistant turns
    // that are refusals (template decline phrases). A conversation whose
    // assistant mostly refuses teaches the model to refuse — the mix
    // must cap its weight. BOTH engines run the same phrase regex over
    // the same text (no planted-rule oracle needed; the transcripts
    // frame's doc_id % 23 == 5 canned-decline family keeps the detector
    // non-degenerate). Row-local rlike + one conv-keyed map-side-
    // combined aggregate; zero windows, zero joins.
    "tr_refusal_rate" -> Entry(
      (s, d) => {
        import s.implicits._
        val refusal = lower($"text")
          .rlike("unable to help|cannot comply|i cannot assist")
        transcripts(s, d)
          .filter($"role" === "assistant")
          .groupBy($"conv_id")
          .agg(count(lit(1)).as("n_assistant"),
            count(when(refusal, 1)).as("n_refusals"))
          .withColumn("refusal_share",
            round($"n_refusals".cast("double") / $"n_assistant", 6))
          .withColumn("flagged", $"refusal_share" > 0.5)
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |ag AS (SELECT conv_id, count(*) AS n_assistant,
              |         count(CASE WHEN regexp_matches(lower(text),
              |           'unable to help|cannot comply|i cannot assist')
              |           THEN 1 END) AS n_refusals
              |       FROM tr WHERE role = 'assistant' GROUP BY conv_id)
              |SELECT conv_id, n_assistant, n_refusals,
              |  round(CAST(n_refusals AS DOUBLE) / n_assistant, 6) AS refusal_share,
              |  round(CAST(n_refusals AS DOUBLE) / n_assistant, 6) > 0.5 AS flagged
              |FROM ag ORDER BY conv_id""".stripMargin)),

    // Fenced code-block extraction: agent transcripts carry code in
    // markdown fences, and a code-capable training mix needs it located,
    // measured and language-tagged per turn (the turn-level analog of
    // the doc-side layout parse). Both engines run the SAME fence regex
    // over the same text, so the oracle is exact without a planted-rule
    // shortcut; two planted families (cv % 8 == 1 assistant turns carry
    // an sql + py pair, cv % 8 == 6 a single py block) make the output
    // non-degenerate. Entirely row-local (regexp_extract_all + array
    // math — codegen'd, no UDF), then just the presentation sort: at
    // 100 TB this is a pure scan-shaped map with zero exchanges.
    "tr_code_blocks" -> Entry(
      (s, d) => {
        import s.implicits._
        val cv = substring($"conv_id", 6, 4).cast("long")
        val planted =
          when($"role" === "assistant" && pmod(cv, lit(8)) === 1,
            concat(lit("see snippet ```sql\nselect "),
              $"turn_idx".cast("string"),
              lit(" from logs\n``` and helper ```py\nprint("),
              $"turn_idx".cast("string"), lit(")\n``` done")))
          .when($"role" === "assistant" && pmod(cv, lit(8)) === 6,
            concat(lit("run ```py\nretry(job, n="),
              $"turn_idx".cast("string"), lit(")\n``` next")))
          .otherwise($"text")
        transcripts(s, d)
          .withColumn("text", planted)
          .withColumn("bodies",
            regexp_extract_all($"text", lit("```[a-z]*\\n([^`]+)```"), lit(1)))
          .filter(size($"bodies") > 0)
          .select($"conv_id", $"turn_idx",
            size($"bodies").as("n_blocks"),
            aggregate(transform($"bodies", b => length(b)), lit(0),
              (acc, x) => acc + x).as("code_chars"),
            array_join(array_sort(array_distinct(
              regexp_extract_all($"text", lit("```([a-z]+)\\n"), lit(1)))), ",")
              .as("langs"))
          .orderBy($"conv_id", $"turn_idx")
      },
      Some {
        val cvSql = "CAST(substr(conv_id, 6, 4) AS BIGINT)"
        s"""WITH $sqlTranscripts,
           |pt AS (SELECT conv_id, turn_idx,
           |         CASE WHEN role = 'assistant' AND $cvSql % 8 = 1
           |              THEN 'see snippet ${"```"}sql' || chr(10) || 'select ' ||
           |                   CAST(turn_idx AS VARCHAR) || ' from logs' || chr(10) ||
           |                   '${"```"} and helper ${"```"}py' || chr(10) || 'print(' ||
           |                   CAST(turn_idx AS VARCHAR) || ')' || chr(10) || '${"```"} done'
           |              WHEN role = 'assistant' AND $cvSql % 8 = 6
           |              THEN 'run ${"```"}py' || chr(10) || 'retry(job, n=' ||
           |                   CAST(turn_idx AS VARCHAR) || ')' || chr(10) || '${"```"} next'
           |              ELSE text END AS text
           |       FROM tr),
           |ex AS (SELECT conv_id, turn_idx,
           |         regexp_extract_all(text, '${"```"}[a-z]*\\n([^${"`"}]+)${"```"}', 1) AS bodies,
           |         regexp_extract_all(text, '${"```"}([a-z]+)\\n', 1) AS langtags
           |       FROM pt)
           |SELECT conv_id, turn_idx,
           |  CAST(len(bodies) AS INT) AS n_blocks,
           |  CAST(list_sum(list_transform(bodies, b -> length(b))) AS INT) AS code_chars,
           |  array_to_string(list_sort(list_distinct(langtags)), ',') AS langs
           |FROM ex WHERE len(bodies) > 0
           |ORDER BY conv_id, turn_idx""".stripMargin
      }),

    // Context-budget truncation: the longest SUFFIX of each conversation
    // whose total text fits a fixed character budget — the fit-into-
    // context-window step every SFT assembler runs (recent turns matter
    // most, so the tail is what survives). Reverse cumulative sum over
    // ONE conv-keyed window (ordered by turn_idx DESC), then the conv
    // aggregate REUSES the same exchange: kept-turn count, kept chars,
    // the first surviving turn_idx, and the truncated verdict. All-
    // integer arithmetic; on the bucketed layout the single exchange
    // disappears like every other tr_* window op.
    "tr_truncate_budget" -> Entry(
      (s, d) => {
        import s.implicits._
        val budget = 1500L
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx".desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        transcripts(s, d)
          .withColumn("len", length($"text").cast("long"))
          .withColumn("cum", sum($"len").over(w))
          .groupBy($"conv_id")
          .agg(count(lit(1)).as("n_turns"),
            sum($"len").as("chars_total"),
            count(when($"cum" <= budget, 1)).as("n_kept"),
            sum(when($"cum" <= budget, $"len").otherwise(0L)).as("chars_kept"),
            min(when($"cum" <= budget, $"turn_idx")).as("first_kept_idx"))
          .withColumn("truncated", $"n_kept" < $"n_turns")
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |cm AS (SELECT conv_id, turn_idx, length(text) AS len,
              |         sum(length(text)) OVER (PARTITION BY conv_id
              |           ORDER BY turn_idx DESC
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |       FROM tr),
              |ag AS (SELECT conv_id, count(*) AS n_turns,
              |         CAST(sum(len) AS BIGINT) AS chars_total,
              |         count(CASE WHEN cum <= 1500 THEN 1 END) AS n_kept,
              |         CAST(sum(CASE WHEN cum <= 1500 THEN len ELSE 0 END) AS BIGINT) AS chars_kept,
              |         min(CASE WHEN cum <= 1500 THEN turn_idx END) AS first_kept_idx
              |       FROM cm GROUP BY conv_id)
              |SELECT conv_id, n_turns, chars_total, n_kept, chars_kept,
              |  first_kept_idx, n_kept < n_turns AS truncated
              |FROM ag ORDER BY conv_id""".stripMargin)),

    // Preference-pair mining: when the SAME user prompt appears in
    // several conversations with different assistant replies, those
    // replies form candidate preference pairs (the raw material of a
    // DPO/RM set; here chosen/rejected is the deterministic lexical
    // min/max — a real ranker plugs into the same topology). One conv-
    // keyed lag window attaches each reply to its prompt, one prompt-
    // hash aggregate groups replies across the corpus; no pairwise
    // join anywhere. The cv % 7 == 3 family plants a shared prompt
    // (natural corpus prompts never repeat cross-conversation).
    "tr_pref_pairs" -> Entry(
      (s, d) => {
        import s.implicits._
        val cv = substring($"conv_id", 6, 4).cast("long")
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        transcripts(s, d)
          .withColumn("text",
            when($"role" === "user" && pmod(cv, lit(7)) === 3,
              lit("how do i rotate my api key please"))
            .otherwise($"text"))
          .withColumn("prev_role", lag($"role", 1).over(w))
          .withColumn("prev_text", lag($"text", 1).over(w))
          .filter($"role" === "assistant" && $"prev_role" === "user")
          .select(md5($"prev_text").as("prompt_h"),
            substring($"prev_text", 1, 32).as("prompt0"),
            substring($"text", 1, 40).as("reply"), $"conv_id")
          .groupBy($"prompt_h")
          .agg(min($"prompt0").as("prompt"),
            count(lit(1)).as("n_replies"),
            countDistinct($"conv_id").as("n_convs"),
            min($"reply").as("chosen"),
            max($"reply").as("rejected"))
          .filter($"n_convs" >= 2 && $"chosen" =!= $"rejected")
          .orderBy($"prompt_h")
      },
      Some {
        val cvSql = "CAST(substr(conv_id, 6, 4) AS BIGINT)"
        s"""WITH $sqlTranscripts,
           |pt AS (SELECT conv_id, turn_idx, role,
           |         CASE WHEN role = 'user' AND $cvSql % 7 = 3
           |              THEN 'how do i rotate my api key please'
           |              ELSE text END AS text
           |       FROM tr),
           |lg AS (SELECT conv_id, role, text,
           |         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
           |         lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
           |       FROM pt),
           |rp AS (SELECT md5(prev_text) AS prompt_h,
           |         substr(prev_text, 1, 32) AS prompt0,
           |         substr(text, 1, 40) AS reply, conv_id
           |       FROM lg WHERE role = 'assistant' AND prev_role = 'user'),
           |ag AS (SELECT prompt_h, min(prompt0) AS prompt,
           |         CAST(count(*) AS BIGINT) AS n_replies,
           |         CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           |         min(reply) AS chosen, max(reply) AS rejected
           |       FROM rp GROUP BY prompt_h)
           |SELECT prompt_h, prompt, n_replies, n_convs, chosen, rejected
           |FROM ag WHERE n_convs >= 2 AND chosen <> rejected
           |ORDER BY prompt_h""".stripMargin
      }),

    // The capstone composition: the full transcript-to-training-mix
    // funnel in ONE query — (1) conversation structural QA (starts with
    // user, zero role-alternation violations; the doc_id % 17 == 3
    // violation family disqualifies its conversations), (2) PII turns
    // dropped before history assembly (the real detectors over the
    // tr_pii_turns payload — redact-or-drop, not train), (3) canned
    // assistant replies excluded as example targets (verbatim texts in
    // ≥2 conversations — the transcripts frame's doc_id % 23 == 5
    // family), (4) SFT context windows over the SURVIVING turns.
    // Topology: the QA verdicts are unbounded-frame windows on the SAME
    // conv_id exchange the context window uses (no agg + join-back for
    // the verdict); the canned set is one hash-keyed aggregate applied
    // as a left-anti join on the md5 key — the only join, equi on a
    // bounded-collision hash, never pairwise.
    "tr_sft_mix" -> Entry(
      (s, d) => {
        import s.implicits._
        import graft.functions.TextFunctions.{EmailRe, PhoneRe, SsnRe}
        val cv = substring($"conv_id", 6, 4).cast("long")
        val docId = cv * cv + $"turn_idx"
        val base0 = regexp_replace(lower(substring($"text", 1, 64)),
          "[^a-z ]", "")
        val payload = concat(base0,
          when(pmod(docId, lit(13)) === 2,
            concat(lit(" contact user"), docId.cast("string"),
              lit("@mail.example.org")))
          .when(pmod(docId, lit(13)) === 6, lit(" call (555) 555-0199"))
          .when(pmod(docId, lit(13)) === 9, lit(" ssn 123-45-6789"))
          .otherwise(lit("")))
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        val wConv = Window.partitionBy($"conv_id")
        val base = transcripts(s, d)
          .withColumn("pii",
            payload.rlike(EmailRe) || payload.rlike(PhoneRe) ||
              payload.rlike(SsnRe))
          .withColumn("prev_role", lag($"role", 1).over(w))
          .withColumn("viol",
            count(when($"role" === $"prev_role", 1)).over(wConv))
          .withColumn("swu",
            max(when($"turn_idx" === 0, $"role" === "user")).over(wConv))
        val canned = transcripts(s, d).filter($"role" === "assistant")
          .groupBy(md5($"text").as("ch"))
          .agg(countDistinct($"conv_id").as("nc"))
          .filter($"nc" >= 2).select($"ch")
        base
          .filter($"swu" && $"viol" === 0 && !$"pii")
          .withColumn("ctxl", collect_list(
            concat($"role", lit(": "), substring($"text", 1, 24)))
            .over(w.rowsBetween(-3, -1)))
          .filter($"role" === "assistant")
          .join(canned, md5($"text") === $"ch", "left_anti")
          .select($"conv_id", $"turn_idx",
            size($"ctxl").as("n_ctx"),
            concat_ws(" | ", $"ctxl").as("ctx"))
          .orderBy($"conv_id", $"turn_idx")
      },
      Some {
        val cvSql = "CAST(substr(conv_id, 6, 4) AS BIGINT)"
        s"""WITH $sqlTranscripts,
           |base AS (SELECT conv_id, turn_idx, role, text,
           |           ($cvSql * $cvSql + turn_idx) % 13 AS k,
           |           lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
           |         FROM tr),
           |wf AS (SELECT conv_id,
           |         count(CASE WHEN role = prev_role THEN 1 END) AS viol,
           |         max(CASE WHEN turn_idx = 0 THEN role = 'user' END) AS swu
           |       FROM base GROUP BY conv_id),
           |canned AS (SELECT md5(text) AS ch FROM tr WHERE role = 'assistant'
           |           GROUP BY md5(text) HAVING count(DISTINCT conv_id) >= 2),
           |kept AS (SELECT b.conv_id, b.turn_idx, b.role, b.text
           |         FROM base b JOIN wf ON wf.conv_id = b.conv_id
           |         WHERE wf.swu AND wf.viol = 0 AND b.k NOT IN (2, 6, 9)),
           |win AS (SELECT conv_id, turn_idx, role, md5(text) AS h,
           |          list(role || ': ' || substr(text, 1, 24))
           |            OVER (PARTITION BY conv_id ORDER BY turn_idx
           |                  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ctxl
           |        FROM kept)
           |SELECT conv_id, turn_idx,
           |  CAST(coalesce(len(ctxl), 0) AS INT) AS n_ctx,
           |  coalesce(array_to_string(ctxl, ' | '), '') AS ctx
           |FROM win
           |WHERE role = 'assistant' AND h NOT IN (SELECT ch FROM canned)
           |ORDER BY conv_id, turn_idx""".stripMargin
      }),

    // Longest same-role streak per conversation (gaps-and-islands): a
    // run of consecutive turns by one role is an island keyed by
    // turn_idx - row_number-within-role; the per-conversation maximum
    // flags monologue-shaped dialogues (stuck agents, flooding tools).
    // Topology: two windows and one agg, ALL partitioned by conv_id —
    // one shuffle, frames bounded by conversation length, free on the
    // bucketed conv-sorted layout.
    "tr_streaks" -> Entry(
      (s, d) => {
        import s.implicits._
        val wr = Window.partitionBy($"conv_id", $"role").orderBy($"turn_idx")
        transcripts(s, d)
          .withColumn("isl", $"turn_idx" - row_number().over(wr))
          .groupBy($"conv_id", $"role", $"isl")
          .agg(count(lit(1)).as("run_len"), min($"turn_idx").as("run_start"))
          // argmax run per conversation: longest run, earliest start as
          // the deterministic tiebreak (run starts are unique in a conv,
          // so the struct ordering is total before role is consulted)
          .groupBy($"conv_id")
          .agg(max(struct($"run_len", (-$"run_start").as("neg_start"),
            $"role")).as("best"))
          .select($"conv_id", $"best.run_len".as("max_streak"),
            (-$"best.neg_start").as("streak_start"),
            $"best.role".as("streak_role"))
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |isl AS (SELECT conv_id, role,
              |    turn_idx - row_number() OVER (PARTITION BY conv_id, role
              |                                  ORDER BY turn_idx) AS g,
              |    turn_idx FROM tr),
              |runs AS (SELECT conv_id, role, g, count(*) AS run_len,
              |    min(turn_idx) AS run_start
              |  FROM isl GROUP BY conv_id, role, g)
              |SELECT conv_id, run_len AS max_streak,
              |  run_start AS streak_start, role AS streak_role
              |FROM runs
              |QUALIFY row_number() OVER (PARTITION BY conv_id
              |    ORDER BY run_len DESC, run_start ASC) = 1
              |ORDER BY conv_id""".stripMargin)),

    // Per-turn token novelty: the fraction of a turn's distinct tokens
    // never seen earlier in the same conversation — the information-gain
    // signal that separates substantive replies from parroting. Tokens
    // are attributed to their FIRST turn via one (conv, token) min-agg;
    // novelty is recovered by re-joining on (conv, token, turn) — no
    // quadratic turn-vs-history comparison, no window over token sets.
    // Topology: explode, one shuffle on (conv_id, tok) for the min-agg,
    // one co-keyed join back, one (conv, turn) agg. All keys are
    // fine-grained (conv × token), so skew from giant conversations
    // spreads across their vocabulary instead of landing on one task.
    "tr_turn_novelty" -> Entry(
      (s, d) => {
        import s.implicits._
        // first-seen turn as a window min over the SAME (conv_id, tok)
        // clustering the rows need anyway — the r5 agg + self-join shape
        // tokenized and exploded the corpus twice and shuffled both join
        // sides (guide §2.4; plan: 2 token-level exchanges -> 1)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"conv_id", $"tok")
        transcripts(s, d)
          .select($"conv_id", $"turn_idx",
            explode(array_distinct(split($"text", " "))).as("tok"))
          .filter(length($"tok") > 0)
          .withColumn("first_turn", min($"turn_idx").over(w))
          .groupBy($"conv_id", $"turn_idx")
          .agg(count(lit(1)).as("n_distinct_toks"),
            count(when($"first_turn" === $"turn_idx", 1)).as("n_novel"))
          // basis points as an exact integer: floor on BOTH engines
          // (Spark's long/long `/` is double division then truncation,
          // DuckDB's CAST(double AS BIGINT) rounds — floor pins them)
          .withColumn("novelty_pct",
            floor($"n_novel" * 10000L / $"n_distinct_toks").cast("long"))
          .orderBy($"conv_id", $"turn_idx")
      },
      Some(s"""WITH $sqlTranscripts,
              |toks AS (SELECT DISTINCT conv_id, turn_idx, tok
              |  FROM (SELECT conv_id, turn_idx,
              |          unnest(string_split(text, ' ')) AS tok FROM tr)
              |  WHERE len(tok) > 0),
              |fs AS (SELECT conv_id, tok, min(turn_idx) AS first_turn
              |  FROM toks GROUP BY conv_id, tok)
              |SELECT t.conv_id, t.turn_idx,
              |  count(*) AS n_distinct_toks,
              |  count(CASE WHEN fs.first_turn = t.turn_idx THEN 1 END) AS n_novel,
              |  CAST(floor(count(CASE WHEN fs.first_turn = t.turn_idx THEN 1 END)
              |       * 10000 / count(*)) AS BIGINT) AS novelty_pct
              |FROM toks t JOIN fs ON t.conv_id = fs.conv_id AND t.tok = fs.tok
              |GROUP BY t.conv_id, t.turn_idx
              |ORDER BY t.conv_id, t.turn_idx""".stripMargin)),

    // Assistant verbosity trend per conversation: the least-squares slope
    // of reply length over turn index — drifting-verbosity conversations
    // (an agent rambling longer and longer, or collapsing to one-liners)
    // are a curation signal. The slope is emitted as an EXACT integer
    // fraction (num = nΣxy − ΣxΣy, den = nΣx² − (Σx)², both BIGINT) so
    // the oracle comparison is engine-exact — no regr_slope float drift.
    // Topology: one map-side-combined agg keyed on conv_id; no window,
    // no join. den > 0 whenever a conversation has ≥2 assistant turns
    // (turn indices are distinct), so sign(num) is the trend.
    "tr_verbosity_trend" -> Entry(
      (s, d) => {
        import s.implicits._
        transcripts(s, d)
          .filter($"role" === "assistant")
          .select($"conv_id", $"turn_idx".as("x"),
            length($"text").cast("long").as("y"))
          .groupBy($"conv_id")
          .agg(count(lit(1)).as("n_pts"),
            sum($"x").as("sx"), sum($"y").as("sy"),
            sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
          .filter($"n_pts" >= 2)
          .select($"conv_id", $"n_pts",
            ($"n_pts" * $"sxy" - $"sx" * $"sy").as("slope_num"),
            ($"n_pts" * $"sxx" - $"sx" * $"sx").as("slope_den"))
          .withColumn("trend",
            when($"slope_num" > 0, "up")
              .when($"slope_num" < 0, "down").otherwise("flat"))
          .orderBy($"conv_id")
      },
      Some(s"""WITH $sqlTranscripts,
              |pts AS (SELECT conv_id, turn_idx AS x,
              |    CAST(len(text) AS BIGINT) AS y FROM tr
              |  WHERE role = 'assistant'),
              |agg AS (SELECT conv_id, count(*) AS n_pts,
              |    sum(x) AS sx, sum(y) AS sy,
              |    sum(x * x) AS sxx, sum(x * y) AS sxy
              |  FROM pts GROUP BY conv_id HAVING count(*) >= 2)
              |SELECT conv_id, n_pts,
              |  CAST(n_pts * sxy - sx * sy AS BIGINT) AS slope_num,
              |  CAST(n_pts * sxx - sx * sx AS BIGINT) AS slope_den,
              |  CASE WHEN n_pts * sxy - sx * sy > 0 THEN 'up'
              |       WHEN n_pts * sxy - sx * sy < 0 THEN 'down'
              |       ELSE 'flat' END AS trend
              |FROM agg ORDER BY conv_id""".stripMargin))
  )
}
