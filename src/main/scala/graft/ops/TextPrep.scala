package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Training-data preparation operators: chunking, PII redaction, and
  * n-gram language-model scoring — the steps between "deduplicated
  * corpus" and "training batches".
  *
  * All three are single-pass relational shapes: chunking is an explode
  * over precomputed window offsets, redaction is a codegen'd
  * `regexp_replace` chain, and the LM score is two vocabulary-bounded
  * aggregations plus a bigram join — nothing here shuffles corpus bytes
  * except the explode, whose output IS the product.
  */
object TextPrep {

  /** Split each document into overlapping token windows of `size` tokens
    * with `stride` tokens between window starts (stride < size ⇒
    * overlap). The last window is kept short rather than padded — models
    * mask, storage shouldn't. Output: (id, chunk_idx, chunk_text,
    * n_tokens).
    *
    * The windows-per-doc sequence is computed once per row and exploded;
    * at 100 TB the explode factor len/stride IS the dataset growth a
    * chunking pass implies — there is no cheaper shape, only smaller
    * chunks.
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int,
  ): DataFrame = {
    require(stride > 0 && chunkSize > 0, "chunkSize and stride must be positive")
    val toks = TextAnalysis.tokens(col(textCol))
    // window starts 0, stride, 2·stride, …: ceil((len−size)/stride)+1 of
    // them (sequence is inclusive), so the final window reaches the end
    val lastStart = greatest(
      ceil((size(toks) - lit(chunkSize)).cast("double") / stride).cast("int"),
      lit(0))
    df.select(
      col(idCol),
      posexplode(
        transform(sequence(lit(0), lastStart),
          w => slice(toks, w * stride + 1, lit(chunkSize))))
        .as(Seq("chunk_idx", "chunk_toks")))
      .filter(size(col("chunk_toks")) > 0)
      .select(
        col(idCol), col("chunk_idx"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"),
        size(col("chunk_toks")).as("n_tokens"))
  }

  /** PII patterns → replacement tags. Deliberately conservative regexes
    * (emails, E.164-ish and US-formatted phones, SSNs, IPv4) in both
    * Java and RE2 syntax subsets, so the same pattern strings run in
    * Spark (java.util.regex) and DuckDB (RE2) identically.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "\\+?\\d{1,3}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
  )

  /** Redact PII in-place: one codegen'd `regexp_replace` per pattern,
    * fused into a single projection — a full-corpus map pass with zero
    * shuffle. Adds `n_redactions` (count of tags inserted) so the
    * pipeline can quarantine PII-dense documents instead of silently
    * laundering them.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (pat, tag)) => regexp_replace(c, pat, tag)
    }
    val tagPattern = "<(EMAIL|SSN|PHONE|IP)>"
    df.withColumn("text_redacted", redacted)
      .withColumn("n_redactions",
        size(regexp_extract_all(col("text_redacted"), lit(tagPattern), lit(0))))
  }

  /** Per-document bigram language-model score: corpus-level bigram/
    * unigram counts with add-one smoothing, then each document's mean
    * negative log-probability (lower = more fluent under the corpus LM)
    * — the KenLM-shaped quality filter, relationally.
    *
    * Determinism: each bigram's log-prob is rounded to 6 dp FIRST (one
    * double log per distinct bigram — the same cross-engine contract as
    * TF-IDF's idf), then summed as DECIMAL (order-independent), then
    * divided. Shuffles are bounded by |bigram vocabulary| and docs ×
    * distinct-bigrams-per-doc — never corpus bytes.
    */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // (w1, w2) structs via zip_with over the shifted token array: the
    // exploded rows carry ONLY the two words. (The posexplode +
    // element_at spelling copies the whole token array into every
    // output row — O(len) per bigram, quadratic bytes per document.)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    // per-document distinct bigram counts: every downstream consumer
    // derives from this ONE aggregate (its exchange is reused across
    // branches), and the occurrence stream never crosses the wire again
    val docBigrams = df
      .select(col(idCol), explode(bigrams).as("_p"))
      .select(col(idCol), col("_p.w1").as("w1"), col("_p.w2").as("w2"))
      .groupBy(idCol, "w1", "w2")
      .agg(count(lit(1)).as("cnt"))
    val bigramCounts = docBigrams.groupBy("w1", "w2").agg(sum("cnt").as("c12"))
    val unigramCounts = docBigrams.groupBy("w1").agg(sum("cnt").as("c1"))
    val vocab = docBigrams.agg(countDistinct("w2").as("v"))
    // smoothed per-bigram -log p, rounded before any summation
    val scored = bigramCounts
      .join(unigramCounts, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("nlp",
        r6(-log((col("c12") + 1.0) / (col("c1") + col("v")))))
      .select("w1", "w2", "nlp")
    // decimal nlp × exact count ≡ summing nlp once per occurrence
    // (decimal addition is exact), so this matches the per-occurrence
    // oracle bit-for-bit while joining only distinct (doc, bigram) rows
    docBigrams
      .join(scored, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        r6(sum(col("nlp").cast("decimal(25,6)") * col("cnt")).cast("double") /
          sum(col("cnt"))).as("mean_surprisal"))
  }

  /** Tracking query parameters dropped by [[canonicalUrl]]: matched
    * against the FULL `name=value` param (or bare name), same regex in
    * both engines' RE2/java.util.regex common subset.
    */
  val TrackingParamPattern: String =
    "^(utm_[^=&]*|gclid|fbclid|msclkid|ref|mc_eid)(=.*)?$"

  /** Canonicalize an absolute http(s) URL for web-corpus deduplication —
    * the normalization pass a crawl pipeline runs before URL-level exact
    * dedup (two spellings of the same resource must collide):
    *
    *   - scheme and host lowercased; `www.` prefix dropped
    *   - default ports stripped (`:80` for http, `:443` for https)
    *   - fragment dropped (client-side only, never reaches the server)
    *   - path: trailing slashes trimmed, empty path → `/`
    *   - query: tracking params removed ([[TrackingParamPattern]]),
    *     remaining params sorted (param order is almost always
    *     insignificant), empty query dropped
    *
    * Pure codegen'd string expressions (regexp + array ops) — a
    * full-corpus canonicalization is one narrow map pass, no shuffle;
    * the dedup that follows shuffles only the canonical-url digest.
    * Contract: input is an absolute `scheme://...` URL without userinfo
    * (crawl frontiers normalize those away upstream).
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val authority = regexp_extract(noFrag, "^([^/?]*)", 1)
    val afterAuth = noFrag.substr(length(authority) + 1, length(noFrag))
    val path = regexp_extract(afterAuth, "^([^?]*)", 1)
    val query = regexp_replace(afterAuth, "^[^?]*\\??", "")
    val hostport = lower(authority)
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noPort, "^www\\.", "")
    val trimmedPath = regexp_replace(path, "/+$", "")
    val canonPath = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    val keptParams = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern)))
    val canonQuery = array_join(keptParams, "&")
    concat(scheme, lit("://"), host, canonPath,
      when(canonQuery === "", lit("")).otherwise(concat(lit("?"), canonQuery)))
  }

  /** The registrable host of an absolute URL after [[canonicalUrl]]'s
    * authority rules (lowercased, `www.` and default ports stripped,
    * a non-default port kept OFF the host — blocklists name domains,
    * not ports).
    */
  def urlHost(url: Column): Column = {
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val noPort = regexp_replace(lower(authority), ":[0-9]+$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** All parent-domain suffixes of a host: "a.b.co" → ["a.b.co",
    * "b.co", "co"]. The unit a domain blocklist matches on.
    */
  def domainSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts) - i), "."))
  }

  /** Domain-blocklist filtering — the crawl-pipeline kill rule "drop
    * every URL under any blocked domain, subdomains included".
    *
    * Scale shape: the host EXPLODES into its ≤label-count parent
    * suffixes and equi-joins the blocklist on the suffix — a
    * broadcast-hash semi-join keyed on an exact string. The naive
    * spelling (`url LIKE '%' || blocked || '%'` or endswith against
    * every blocklist row) is a cross-join that evaluates |corpus| ×
    * |blocklist| predicates and can never hash-partition; the suffix
    * form is |corpus| × ~4 rows joined on a key, and the blocklist
    * (thousands of rows at production size) broadcasts.
    *
    * Returns the input plus `host` and `blocked` (true ⇔ some suffix
    * of the host appears in `blocklist.domain`). Callers filter or
    * quarantine on the flag. `host` and `blocked` are RESERVED output
    * names: an input already carrying either would be silently
    * overwritten, so the call fails fast instead — rename before
    * flagging.
    */
  def flagBlockedDomains(
      df: DataFrame,
      urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("host", "blocked"))
    require(clash.isEmpty,
      s"flagBlockedDomains writes reserved columns ${clash.mkString(", ")} " +
        "already present on the input; rename them first")
    val withHost = df.withColumn("host", urlHost(col(urlCol)))
    // blocked HOSTS (not rows): the explode fans each distinct host into
    // its suffixes, the blocklist broadcasts, and the distinct bounds
    // the re-join key set. The final join is host-keyed (uniform) and
    // left to AQE — the hit set is usually broadcastable but nothing
    // above requires it.
    val hits = withHost
      .select(col("host")).distinct()
      .select(col("host"), explode(domainSuffixes(col("host"))).as("domain"))
      .join(broadcast(blocklist.select(col("domain"))), "domain")
      .select(col("host")).distinct()
      .withColumn("blocked", lit(true))
    withHost
      .join(hits, Seq("host"), "left")
      .withColumn("blocked", coalesce(col("blocked"), lit(false)))
  }

  /** Corpus-frequency boilerplate removal (the CCNet/C4 duplicated-
    * paragraph pass, mapped to disjoint token chunks since this corpus
    * is single-line): split each document into disjoint `chunkSize`-
    * token chunks, count each chunk text's document frequency across
    * the corpus, DROP every chunk appearing in ≥ `minDf` distinct
    * documents, and reassemble the survivors in order. Returns one row
    * per input document: the cleaned text plus the removal audit
    * (`n_chunks`, `n_removed`, `removed_frac`).
    *
    * Scale shape: one explode (output-sized), one chunk-text-keyed
    * count-distinct aggregate (the "paragraph hash table", shuffled on
    * the chunk hash so hot boilerplate chunks partial-aggregate
    * map-side), one equi-join back, one per-doc reassembly aggregate.
    * Never pairs of documents — corpus² never appears.
    */
  def removeDuplicateChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 8,
      minDf: Int = 2): DataFrame = {
    require(minDf >= 2, "minDf < 2 would drop every chunk")
    val chunks = chunk(df, idCol, textCol, chunkSize, stride = chunkSize)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"))
    val docFreq = chunks
      .groupBy("chunk_text")
      .agg(countDistinct(col(idCol)).as("_df"))
    val kept = chunks.join(docFreq, "chunk_text")
      .filter(col("_df") < minDf)
    val perDoc = chunks.groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"))
    val keptAgg = kept.groupBy(idCol)
      .agg(
        count(lit(1)).as("_n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          _.getField("chunk_text"))).as("clean_text"))
    // a doc whose text yields zero chunks (empty/whitespace) still
    // reports: 0 chunks, 0 removed, frac 0.0 — it must not vanish from
    // (or NULL out of) the cleaned corpus
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .join(keptAgg, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        (coalesce(col("n_chunks"), lit(0L)) -
          coalesce(col("_n_kept"), lit(0L))).as("n_removed"),
        when(col("n_chunks") > 0,
          r6((col("n_chunks") - coalesce(col("_n_kept"), lit(0L)))
            .cast("double") / col("n_chunks").cast("double")))
          .otherwise(lit(0.0)).as("removed_frac"))
  }
}
