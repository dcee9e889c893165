"""Text-analysis operators for LLM training-data pipelines
(BASELINE.json north star; extension beyond the reference surface).

Everything here is built from JVM-side built-in functions (no Python in
the hot path), so each op is a narrow map over the scan: at 100 TB they
pipeline with the parquet read, no shuffle at all. Each has an exact
ANSI-SQL equivalent used as the DuckDB oracle in __spark_entry__.py.

Functions that feed Spark higher-order functions (transform/sequence)
take the source column as a SQL expression string and return a Column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic marker-word lists for the language-ID heuristic —
# SQL-portable (plain substring counts, same formula in DuckDB).
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "de"],
    "zh": ["的", "是", "了"],
}


def normalize_text_sql(col: str) -> str:
    """SQL for lowercase + collapse whitespace + trim (canonical form
    for fingerprinting and shingling). Identical string in DuckDB."""
    return f"lower(regexp_replace(trim({col}), '\\\\s+', ' '))"


def token_count(col: str) -> Column:
    """Whitespace token count (reference word-count recipe,
    datastream.py:700-713 via pyarrow split_whitespace — same result)."""
    return F.expr(
        f"case when length(trim({col})) = 0 then 0 "
        f"else size(split(trim({col}), '\\\\s+')) end")


def normalize_text(col: str) -> Column:
    return F.expr(normalize_text_sql(col))


def fingerprint(col: str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.expr(f"md5({normalize_text_sql(col)})")


def char_ngrams(col: str, n: int = 5) -> Column:
    """Array of character n-grams of the normalized text (shingles)."""
    norm = normalize_text_sql(col)
    return F.expr(
        f"transform(sequence(1, greatest(length({norm}) - {n - 1}, 1)), "
        f"i -> substring({norm}, i, {n}))")


def word_ngrams(col: str, n: int = 3) -> Column:
    """Array of word n-grams ('shingles') of the normalized text."""
    norm = normalize_text_sql(col)
    return F.expr(
        f"transform(sequence(1, greatest(size(split({norm}, ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split({norm}, ' '), i, {n})))")


def quality_score(col: str) -> Column:
    """Heuristic quality in [0,1]: length score × alpha ratio ×
    mean-word-length sanity. Built from Column ops (Python float
    literals → DoubleType; Spark SQL decimal literals would silently
    turn this into DECIMAL arithmetic). DuckDB-oracle equivalent in
    __spark_entry__.py uses the same formula in double arithmetic."""
    c = F.col(col)
    n = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z ]", "")).cast("double")
    toks = token_count(col).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    mean_wl = F.when(toks > 0, n / toks).otherwise(F.lit(0.0))
    wl_score = F.when((toks > 0) & (mean_wl >= 3.0) & (mean_wl <= 12.0),
                      F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * alpha_ratio * wl_score, 6)


def lang_id(col: str) -> Column:
    """Marker-word language ID: marker hits per language on the
    normalized text, argmax with first-wins tie-break (map-side only)."""
    return F.expr(lang_id_sql(col))


def _marker_score_sql(norm: str, markers: list) -> str:
    terms = []
    for mk in markers:
        token = f" {mk} "
        # substring occurrence count via length difference
        terms.append(
            f"(length({norm}) - length(replace({norm}, '{token}', ''))) "
            f"/ {len(token)}")
    return "(" + " + ".join(terms) + ")"


def lang_id_sql(col: str) -> str:
    """Same expression runs in Spark SQL and DuckDB (portable subset)."""
    norm = normalize_text_sql(col)
    padded = f"concat(' ', {norm}, ' ')"
    scores = {lang: _marker_score_sql(padded, mks)
              for lang, mks in LANG_MARKERS.items()}
    langs = list(scores)
    # argmax with first-wins tie-break, expressed as nested CASE
    conds = []
    for i, lang in enumerate(langs):
        others = [f"{scores[lang]} >= {scores[o]}" for o in langs[:i]]
        others += [f"{scores[lang]} > {scores[o]}" for o in langs[i + 1:]]
        conds.append((lang, " and ".join(others) if others else "true"))
    expr = "case "
    for lang, cond in conds:
        expr += f"when {scores[lang]} > 0 and ({cond}) then '{lang}' "
    expr += "else 'unknown' end"
    return expr


def rolling_hash_fingerprint(col: str, window: int = 64) -> Column:
    """Chunk fingerprints: xxhash64 of each ``window``-char slice at
    stride window/2, as an array — near-dup signal robust to local
    edits. (xxhash64 is Spark-only → verified rows-only / in pytest.)"""
    norm = normalize_text_sql(col)
    return F.expr(
        f"transform(sequence(1, greatest(length({norm}) - {window - 1}, 1), "
        f"{window // 2}), i -> xxhash64(substring({norm}, i, {window})))")


# Gopher quality-filter stopword set (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", app. A1.1: a document must contain at
# least two of these to pass)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_columns(col: str) -> list:
    """Gopher-rules document quality signals (Rae et al. 2021 A1.1),
    as pure JVM expressions — zero exchanges, embarrassingly parallel:

    - ``n_words``            whitespace word count
    - ``mean_word_len``      total non-space chars / n_words
    - ``symbol_word_ratio``  ('#' + ellipsis chars) / n_words
    - ``alpha_word_ratio``   fraction of words containing [A-Za-z]
    - ``stop_hits``          how many of the 8 Gopher stopwords occur
    - ``gopher_pass``        the paper's thresholds: 50 <= n_words <=
      100k, 3 <= mean_word_len <= 10, symbol ratio < 0.1, alpha ratio
      >= 0.8, stop_hits >= 2

    The per-LINE rules (bullet-start / ellipsis-end ratios) live in
    line space — compose with dedup.line_dedup's exploded form when
    the corpus has multi-line documents.

    Ratios are NULL for empty documents (n_words = 0, which also
    fails ``gopher_pass``). Every expression has a verbatim DuckDB
    equivalent (oracle in __spark_entry__.py)."""
    c = F.trim(F.col(col))
    n_words = F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))).cast("bigint")
    nw = n_words.cast("double")
    n_chars = F.length(F.regexp_replace(c, r"\s+", "")).cast("double")
    mean_wl = F.when(n_words > 0, F.round(n_chars / nw, 6))
    n_sym = (F.length(c) - F.length(F.replace(c, F.lit("#")))
             + F.length(c) - F.length(F.replace(c, F.lit("…")))
             + (F.length(c) - F.length(F.replace(c, F.lit("...")))) / F.lit(3)
             ).cast("double")
    sym_ratio = F.when(n_words > 0, F.round(n_sym / nw, 6))
    alpha_n = F.size(F.filter(F.split(c, r"\s+"),
                              lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = F.when(n_words > 0,
                         F.round(alpha_n.cast("double") / nw, 6))
    norm = normalize_text(col)
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    stop_hits = sum(
        (F.contains(padded, F.lit(f" {w} "))).cast("int")
        for w in GOPHER_STOPWORDS).cast("bigint")
    passes = ((n_words >= 50) & (n_words <= 100000)
              & (mean_wl >= 3.0) & (mean_wl <= 10.0)
              & (sym_ratio < 0.1) & (alpha_ratio >= 0.8)
              & (stop_hits >= 2))
    return [n_words.alias("n_words"), mean_wl.alias("mean_word_len"),
            sym_ratio.alias("symbol_word_ratio"),
            alpha_ratio.alias("alpha_word_ratio"),
            stop_hits.alias("stop_hits"),
            F.coalesce(passes, F.lit(False)).alias("gopher_pass")]


# PII regexes in the common Java-regex / RE2 subset so the identical
# pattern runs in Spark (Java) and the DuckDB oracle (RE2): no
# backrefs, no lookaround, ASCII classes only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_columns(col: str) -> list:
    """PII detection signals (Dolma / RedPajama-style scrub pass) —
    per-document counts of email addresses, NANP-style phone numbers,
    and IPv4 literals, plus a ``has_pii`` flag. Pure map-side
    ``regexp_count`` over the scan: zero exchanges, pipelines with the
    parquet read at 100 TB. Patterns are intentionally high-precision /
    ASCII (the standard corpus-scrub tradeoff — a looser phone pattern
    floods on numeric tables).

    NOTE on masking order (see :func:`redact_pii`): the ipv4 pattern
    matches dotted-quads INSIDE email domains too; counts here count
    raw matches per pattern independently, exactly like the oracle."""
    c = F.col(col)
    counts = [F.regexp_count(c, F.lit(p)).cast("bigint").alias(f"n_{name}")
              for name, p in PII_PATTERNS.items()]
    has = sum(F.regexp_count(c, F.lit(p)) for p in PII_PATTERNS.values()) > 0
    return counts + [F.coalesce(has, F.lit(False)).alias("has_pii")]


def redact_pii(col: str) -> Column:
    """Replace PII matches with typed placeholder tokens
    (``<EMAIL>``, ``<PHONE>``, ``<IP>``). Email first so dotted-quad
    domains are consumed before the ipv4 pass; the same replacement
    order runs in the oracle. Map-side only."""
    out = F.regexp_replace(F.col(col), PII_PATTERNS["email"], "<EMAIL>")
    out = F.regexp_replace(out, PII_PATTERNS["phone"], "<PHONE>")
    return F.regexp_replace(out, PII_PATTERNS["ipv4"], "<IP>")


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", delimiter: str = "\n",
                      top_n: int = 2, dup_n: int = 5) -> DataFrame:
    """Gopher repetition-removal signals (Rae et al. 2021 app. A1.1 —
    the REPETITION half of the rules; the document-quality half is
    :func:`gopher_quality_columns`). Per document:

    - ``dup_line_frac``       fraction of segments whose content occurs
      more than once in the document (all occurrences of a repeated
      segment count, matching the paper's "duplicate line fraction")
    - ``dup_line_char_frac``  fraction of segment characters inside
      occurrences BEYOND the first of each repeated segment
    - ``top_{top_n}gram_char_frac``  characters covered by the single
      most frequent word-``top_n``-gram (count × gram length) over
      total non-space characters
    - ``dup_{dup_n}gram_char_frac``  characters inside occurrences
      beyond the first of repeated word-``dup_n``-grams, counted
      per-gram WITHOUT overlap-dedup (deterministic upper bound of the
      paper's span measure — the exact span version is
      ``dedup.duplicated_spans``), capped at 1.0

    Scale shape: two explode pipelines (segments, n-grams) each
    partial-agg → shuffle on (doc, key) → per-doc reduce — the same
    two-shuffle profile as a word count, no driver materialization.
    Every expression has a verbatim DuckDB mirror (oracle gate
    ``text_repetition``)."""
    doc = df.select(id_col, F.col(text_col).alias("__t__"))

    segs = doc.select(
        id_col, F.posexplode(F.split("__t__", delimiter)).alias("__p__", "__s__")
    ).withColumn("__s__", F.trim(F.lower("__s__"))) \
     .filter(F.length("__s__") > 0)
    per_seg = segs.groupBy(id_col, "__s__").agg(
        F.count(F.lit(1)).alias("__c__"),
        F.length(F.first("__s__")).alias("__len__"))
    line_stats = per_seg.groupBy(id_col).agg(
        F.sum("__c__").alias("__n_seg__"),
        F.sum(F.when(F.col("__c__") > 1, F.col("__c__")).otherwise(0))
         .alias("__n_dup_seg__"),
        F.sum(F.col("__c__") * F.col("__len__")).alias("__chars__"),
        F.sum((F.col("__c__") - 1) * F.col("__len__")).alias("__dup_chars__"))

    def gram_stats(n: int):
        norm = F.expr(normalize_text_sql("__t__"))
        words = F.split(norm, " ")
        m = f"greatest(size(__w__) - {n - 1}, 1)"
        slices = ", ".join(f"slice(__w__, {k + 1}, {m})" for k in range(n))
        fields = ", ".join(f"s.`{k}`" for k in range(n))
        grams = F.expr(f"transform(arrays_zip({slices}), "
                       f"s -> concat_ws(' ', {fields}))")
        g = (doc.select(id_col, words.alias("__w__"),
                        F.length(F.regexp_replace(norm, " ", ""))
                        .alias("__nchars__"))
             .select(id_col, "__nchars__", F.explode(grams).alias("__g__"))
             .filter(F.length("__g__") > 0))
        return g.groupBy(id_col, "__g__").agg(
            F.count(F.lit(1)).alias("__c__"),
            F.first("__nchars__").alias("__nchars__"),
            F.length(F.regexp_replace(F.first("__g__"), " ", ""))
            .alias("__glen__"))

    # the output is the max covered-chars VALUE itself, so ties need no
    # break — equal keys yield the same max
    top = gram_stats(top_n).groupBy(id_col).agg(
        F.max(F.col("__c__") * F.col("__glen__")).alias("__top_chars__"),
        F.first("__nchars__").alias("__nchars__"))
    dup = gram_stats(dup_n).groupBy(id_col).agg(
        F.sum((F.col("__c__") - 1) * F.col("__glen__")).alias("__dup_g_chars__"),
        F.first("__nchars__").alias("__nchars2__"))

    r6 = lambda c: F.round(c, 6)  # noqa: E731
    out = (line_stats.join(top, id_col, "left").join(dup, id_col, "left")
           .select(
               id_col,
               r6(F.col("__n_dup_seg__") / F.col("__n_seg__"))
               .alias("dup_line_frac"),
               r6(F.col("__dup_chars__") / F.col("__chars__"))
               .alias("dup_line_char_frac"),
               r6(F.col("__top_chars__") / F.col("__nchars__"))
               .alias(f"top_{top_n}gram_char_frac"),
               r6(F.least(F.col("__dup_g_chars__") / F.col("__nchars2__"),
                          F.lit(1.0)))
               .alias(f"dup_{dup_n}gram_char_frac")))
    return out


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", max_words: int = 100,
                    overlap: int = 20) -> DataFrame:
    """Split documents into overlapping word-window chunks (the
    standard embedding/RAG ingest step): chunk ``c`` covers words
    ``[c·step, c·step + max_words)`` of the normalized text with
    ``step = max_words − overlap``. Start positions stop once a chunk
    would add fewer than one new word beyond the overlap, so trailing
    fully-contained chunks are never emitted; empty/whitespace-only
    documents yield no chunks.

    Returns (id, chunk_id, chunk_text, n_words). Map-side only —
    sequence + slice + explode over the scan, zero exchanges at any
    scale."""
    assert 0 <= overlap < max_words
    step = max_words - overlap
    staged = (df.select(F.col(id_col),
                        F.expr(normalize_text_sql(text_col)).alias("__n__"))
              .filter(F.length("__n__") > 0)
              .select(id_col, F.split("__n__", " ").alias("__w__")))
    starts = F.expr(
        f"sequence(0, greatest(size(__w__) - {overlap + 1}, 0), {step})")
    return (staged.select(id_col, "__w__", F.explode(starts).alias("__s__"))
            .select(F.col(id_col),
                    (F.col("__s__") / step).cast("long").alias("chunk_id"),
                    F.expr(f"concat_ws(' ', slice(__w__, __s__ + 1, {max_words}))")
                    .alias("chunk_text"),
                    F.expr(f"size(slice(__w__, __s__ + 1, {max_words}))")
                    .cast("long").alias("n_words")))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    smoothing: float = 0.5) -> DataFrame:
    """Language-model quality proxy (the CCNet/RedPajama perplexity
    filter, with the corpus's own additive-smoothed unigram model
    standing in for the external KenLM): per document, the mean
    negative log-probability of its tokens under
    p(t) = (count(t) + a) / (total + a·|V|). Lower = more typical of
    the corpus; thresholding drops gibberish and boilerplate alike.

    Returns (id, n_tokens, mean_neg_logprob).

    Scale shape: one token-count shuffle with map-side partial agg
    (hot tokens collapse before the exchange), one slim 2-scalar agg
    to the driver (total, |V|), then a token→frequency join — AQE
    broadcasts the frequency table when the vocabulary is small and
    skew-splits the hot-token keys when it is not — and a final
    per-doc mean. The model itself never materializes on the driver."""
    norm = F.expr(normalize_text_sql(text_col))
    toks = (df.select(F.col(id_col), norm.alias("__n__"))
            .filter(F.length("__n__") > 0)
            .select(id_col, F.explode(F.split("__n__", " ")).alias("__t__"))
            .filter(F.length("__t__") > 0))
    freq = toks.groupBy("__t__").agg(F.count(F.lit(1)).alias("__c__"))
    row = freq.agg(F.sum("__c__").alias("t"),
                   F.count(F.lit(1)).alias("v")).first()
    total, vocab = int(row["t"] or 0), int(row["v"] or 0)
    denom = float(total + smoothing * vocab)
    logp = F.log((F.col("__c__") + F.lit(float(smoothing))) / F.lit(denom))
    return (toks.join(freq, "__t__")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.round(F.avg(-logp), 6).alias("mean_neg_logprob")))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", top_n: int = 3) -> DataFrame:
    """Top-``top_n`` TF-IDF terms per document (smooth idf:
    ln((1+N)/(1+df)) + 1, the scikit-learn formulation) — the standard
    keyword/topic signal for corpus exploration, clustering labels,
    and near-dup triage. Ties broken by term ascending, so the ranking
    is fully deterministic. Returns (id, term, rank, tfidf).

    Scale shape: tokenize map-side; ONE shuffle builds the (doc, term)
    tf table with map-side partial agg; document frequency is a second
    partial-agged groupBy over that already-slim table; N is a driver
    scalar. The term→idf join AQE-broadcasts the vocabulary when small
    and skew-splits hot terms when not. The per-doc top-n runs as a
    rank-limit pushdown (WindowGroupLimit): each map task emits at
    most top_n candidates per doc before the final per-doc sort."""
    from pyspark.sql import Window
    norm = F.expr(normalize_text_sql(text_col))
    toks = (df.select(F.col(id_col), norm.alias("__n__"))
            .filter(F.length("__n__") > 0)
            .select(id_col, F.explode(F.split("__n__", " ")).alias("term"))
            .filter(F.length("term") > 0))
    dt = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf__"))
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("__df__"))
    # N as a LAZY one-row broadcast (optimization round 13): df.count()
    # here was an eager driver job re-scanning the corpus at every
    # plan build; the broadcast cross join folds the same scalar into
    # the single job. 1.0 + count is exact in double either way.
    ndf = df.select(F.count(F.lit(1)).cast("double").alias("__nd__"))
    score = (F.col("__tf__")
             * (F.log((1.0 + F.col("__nd__")) / (1.0 + F.col("__df__")))
                + 1.0))
    w = Window.partitionBy(id_col).orderBy(F.desc("__s__"), F.asc("term"))
    return (dt.join(dfreq, "term")
            .crossJoin(F.broadcast(ndf))
            .withColumn("__s__", score)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select(F.col(id_col), "term", F.col("rank").cast("bigint"),
                    F.round("__s__", 6).alias("tfidf")))


# BPE-style pre-tokenization pattern (the GPT-2 regex's portable core:
# letter runs, digit runs, punctuation runs — no lookarounds, so the
# identical pattern runs in Spark's Java regex and DuckDB's RE2)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_columns(col: str, pattern: str = BPE_TOKEN_PATTERN) -> list:
    """Sub-word-style token accounting: ``n_bpe_tokens`` (total
    pre-token matches — the budget a BPE tokenizer would then split
    further, a far better cost proxy than whitespace words for code
    and punctuation-heavy text) and ``n_unique_bpe`` (distinct
    pre-tokens, case-folded). Map-side regexp only, zero exchanges."""
    c = F.lower(F.col(col))
    toks = F.regexp_extract_all(c, F.lit(pattern), 0)
    return [F.size(toks).cast("bigint").alias("n_bpe_tokens"),
            F.size(F.array_distinct(toks)).cast("bigint")
            .alias("n_unique_bpe")]


# URL pattern in the shared Java-regex / RE2 subset (no lookarounds):
# scheme + non-space run; the host is capture group 1 of HOST_PATTERN.
URL_PATTERN = r"https?://[^\s]+"
HOST_PATTERN = r"https?://([^/\s:]+)"


def url_columns(col: str) -> list:
    """URL accounting for crawl filtering (the C4/RefinedWeb URL
    rules): ``n_urls`` (total matches), ``domains`` (distinct hosts,
    sorted — deterministic), ``main_domain`` (first sorted host, NULL
    when none). Map-side regexp only, zero exchanges; the identical
    pattern runs in DuckDB's RE2 for the oracle."""
    urls = F.regexp_extract_all(F.col(col), F.lit(URL_PATTERN), 0)
    hosts = F.array_sort(F.array_distinct(
        F.transform(urls, lambda u: F.regexp_extract(u, HOST_PATTERN, 1))))
    return [F.size(urls).cast("bigint").alias("n_urls"),
            hosts.alias("domains"),
            F.get(hosts, 0).alias("main_domain")]


def flag_blocked_domains(df: DataFrame, id_col: str, domains_col: str,
                         blocklist, out: str = "blocked") -> DataFrame:
    """Flag rows whose extracted ``domains`` hit a blocklist.

    ``blocklist`` may be a Python list (compiled to a literal
    ``arrays_overlap`` — fully map-side, zero exchanges; right size
    for the usual 10²-10⁵-entry lists) or a single-column DataFrame —
    the scale path when the list is itself a table: explode the
    domains with the row id, broadcast semi-join against the list,
    distinct the hit ids (slim), and left-join the flag back on the
    id. Rows with an empty domain array are never blocked."""
    if isinstance(blocklist, (list, tuple)):
        return df.withColumn(
            out, F.arrays_overlap(F.col(domains_col),
                                  F.array(*[F.lit(d) for d in blocklist])))
    bcol = blocklist.columns[0]
    bl = blocklist.select(F.col(bcol).alias("__qs_bd__")).distinct()
    marker = "__qs_blocked__"
    hits = (df.select(id_col, F.explode(domains_col).alias("__qs_bd__"))
            .join(F.broadcast(bl), "__qs_bd__", "left_semi")
            .select(id_col).distinct().withColumn(marker, F.lit(True)))
    return (df.join(hits, id_col, "left")
            .withColumn(out, F.coalesce(F.col(marker), F.lit(False)))
            .drop(marker))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   smoothing: float = 0.5) -> DataFrame:
    """Bigram-LM quality scoring — the sharper sibling of
    unigram_logprob (word-order-aware: scrambled or boilerplate text
    scores worse even when its word histogram is typical): per
    document, the mean negative log of the additive-smoothed
    conditional P(b|a) = (count(a b) + α) / (count(a ·) + α·|V|),
    with the model trained ON the corpus itself. Documents with fewer
    than two tokens are not scored (no bigrams).

    Returns (id, n_bigrams, mean_neg_logprob).

    Scale shape: bigrams assemble map-side (sequence + element_at —
    no self-join); ONE partial-agged shuffle counts bigrams, a second
    slim one counts contexts; |V| is a driver scalar; the two
    frequency joins AQE-broadcast when the vocabulary is small and
    skew-split hot tokens when not."""
    norm = F.expr(normalize_text_sql(text_col))
    d = (df.select(F.col(id_col), norm.alias("__n__"))
         .filter(F.length("__n__") > 0)
         .select(id_col,
                 F.filter(F.split("__n__", " "),
                          lambda t: F.length(t) > 0).alias("__w__")))
    # empty tokens are filtered from the word array (Spark trim()
    # strips spaces only, so a tab-only doc normalizes to " " and
    # would otherwise emit a phantom empty-token bigram); and
    # sequence(1, 0) DESCENDS in Spark (it is not empty) — single-token
    # docs must be dropped before building index sequences, or
    # element_at(w, 0) throws under ANSI
    bg_src = d.filter(F.size("__w__") >= 2)
    bg_arr = F.expr(
        "transform(sequence(1, size(__w__) - 1), "
        "i -> struct(concat(element_at(__w__, i), ' ', "
        "element_at(__w__, i + 1)) as b, element_at(__w__, i) as a))")
    bg = (bg_src.select(id_col, F.explode(bg_arr).alias("__bg__"))
          .select(id_col, F.col("__bg__.b").alias("__b__"),
                  F.col("__bg__.a").alias("__a__")))
    cb = bg.groupBy("__b__").agg(F.count(F.lit(1)).alias("__cb__"))
    ca = bg.groupBy("__a__").agg(F.count(F.lit(1)).alias("__ca__"))
    toks = (d.select(F.explode("__w__").alias("__t__"))
            .filter(F.length("__t__") > 0))
    vocab = float(toks.select("__t__").distinct().count())
    a = float(smoothing)
    logp = F.log((F.col("__cb__") + F.lit(a))
                 / (F.col("__ca__") + F.lit(a * vocab)))
    return (bg.join(cb, "__b__").join(ca, "__a__")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                 F.round(F.avg(-logp), 6).alias("mean_neg_logprob")))


def _portable_bucket(tok: Column, dim: int, salt: str = "") -> Column:
    """Hash a token into [0, dim) with engine-portable arithmetic:
    fold the first 4 hex digits of md5(salt + token) positionally (the
    same instr-fold trick as sampling.hash_uniform) and take mod. Both
    Spark and DuckDB evaluate the identical integer expression;
    different salts give independent hash rows (the CMS sketch's d
    rows)."""
    h = F.md5(F.concat(F.lit(salt), tok).cast("binary"))
    val = F.lit(0)
    for i in range(4):
        digit = F.instr(F.lit("0123456789abcdef"),
                        F.substring(h, i + 1, 1)) - 1
        val = val + digit * (16 ** (3 - i))
    return F.pmod(val, F.lit(dim))


def hashed_tf_vectors(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", dim: int = 64,
                      dense: bool = True) -> DataFrame:
    """Feature-hashing TF vectors (the "hashing trick"): tokens hash
    into ``dim`` buckets and the document becomes a term-frequency
    vector — no vocabulary build, no model download; the bridge from
    raw text into every vector op here (k-means topic clustering, ANN
    similarity, embedding-LSH dedup) without an external encoder.

    ``dense=False`` returns the sparse histogram (id, bucket, cnt);
    ``dense=True`` assembles ``array<float>`` of length ``dim``.

    Scale shape: tokenize + bucket map-side; ONE partial-agged shuffle
    on (id, bucket) builds the histogram (hot buckets collapse
    map-side); the dense form adds a per-id collect of ≤ dim entries —
    bounded by dim, never by document length. The bucket hash is
    engine-portable (md5 hex fold), so the oracle is hash-exact."""
    norm = F.expr(normalize_text_sql(text_col))
    toks = (df.select(F.col(id_col), norm.alias("__n__"))
            .filter(F.length("__n__") > 0)
            .select(id_col, F.explode(F.split("__n__", " ")).alias("__t__"))
            .filter(F.length("__t__") > 0))
    sparse = (toks.withColumn("__b__", _portable_bucket(F.col("__t__"), dim))
              .groupBy(id_col, "__b__")
              .agg(F.count(F.lit(1)).alias("__c__")))
    if not dense:
        return sparse.select(F.col(id_col),
                             F.col("__b__").cast("int").alias("bucket"),
                             F.col("__c__").cast("bigint").alias("cnt"))
    m = (sparse.groupBy(id_col)
         .agg(F.map_from_entries(
             F.collect_list(F.struct("__b__", "__c__"))).alias("__m__")))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("__m__", i), F.lit(0))
        .cast("float"))
    return m.select(F.col(id_col), vec.alias("tfvec"))


def char_entropy(col: str) -> Column:
    """Shannon entropy (bits/char) of the normalized text — the
    compressibility proxy that separates natural language (~4 bits)
    from base64/hex blobs (high) and boilerplate repetition (low);
    the standard cheap filter for binary-junk and padding documents.

    Pure JVM higher-order expression: per distinct character, count
    occurrences via filter() over the char array — O(distinct × len)
    per row, fine at document granularity — then -Σ p·log2(p). The
    distinct characters are SORTED before the fold so the float
    summation order (and hence the 6dp rounding) is engine-identical.
    NULL for empty documents. Identical expression mirrors in DuckDB."""
    norm = normalize_text_sql(col)
    chars = f"split({norm}, '')"
    # split('ab','') yields ['a','b'] in Spark; guard the empty string
    n = f"size({chars})"
    probs = (f"transform(array_sort(array_distinct({chars})), "
             f"c -> size(filter({chars}, x -> x = c)) / cast({n} as double))")
    ent = (f"-aggregate({probs}, cast(0.0 as double), "
           f"(a, p) -> a + p * log2(p))")
    return F.expr(f"case when length({norm}) = 0 then null "
                  f"else round({ent}, 6) end")


# Latin-1/Latin-Extended accent folding table (common European corpus
# characters). Paired strings for translate(); both engines implement
# translate identically (per-codepoint mapping), so the fold is
# engine-portable by construction — unlike ICU-backed strip_accents.
_ACCENT_SRC = 'áàâäãåāăÁÀÂÄÃÅĀĂéèêëēĕÉÈÊËĒĔíìîïīĭÍÌÎÏĪĬóòôöõøōŏÓÒÔÖÕØŌŎúùûüūŭÚÙÛÜŪŬñÑçćčÇĆČýÿÝŸžŽšŠđĐ'
_ACCENT_DST = 'aaaaaaaaAAAAAAAAeeeeeeEEEEEEiiiiiiIIIIIIooooooooOOOOOOOOuuuuuuUUUUUUnNcccCCCyyYYzZsSdD'


def strip_accents(col) -> Column:
    """Accent folding for cross-lingual matching (dedup keys, search,
    fingerprints): á→a, ñ→n, ç→c … via a fixed translate() table —
    per-codepoint, zero exchanges, and the IDENTICAL expression runs
    in DuckDB (engine-portable where locale-dependent strip_accents
    implementations are not). Characters outside the table pass
    through unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _ACCENT_SRC, _ACCENT_DST)


def readability_columns(col: str) -> list:
    """Flesch reading-ease signals as portable expressions:
    ``n_sentences`` ([.!?]+ runs, min 1 for non-empty text),
    ``n_syllables`` ([aeiouy]+ vowel-group proxy, the standard cheap
    estimator), and ``flesch`` = 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words); NULL for empty documents. Everything is a
    map-side regexp count in the shared Java/RE2 subset — zero
    exchanges — and the identical expressions run in DuckDB."""
    c = F.trim(F.col(col))
    norm = normalize_text(col)
    n_words = F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))).cast("double")
    n_sent = F.greatest(F.regexp_count(c, F.lit(r"[.!?]+")),
                        F.lit(1)).cast("double")
    n_syl = F.regexp_count(norm, F.lit("[aeiouy]+")).cast("double")
    flesch = F.when(
        n_words > 0,
        F.round(F.lit(206.835) - F.lit(1.015) * (n_words / n_sent)
                - F.lit(84.6) * (n_syl / n_words), 6))
    return [n_sent.cast("bigint").alias("n_sentences"),
            n_syl.cast("bigint").alias("n_syllables"),
            flesch.alias("flesch")]


# ---------------------------------------------------------------------------
# C4-style line/document filtering (Raffel et al. 2020, §2.2) — the
# other canonical web-corpus rule set next to Gopher. Line-level rules
# run as a higher-order filter() over the split lines (order-preserving
# array ops, no explode, no shuffle); document-level policy flags are
# plain substring/regexp tests. Everything mirrors verbatim into
# DuckDB's list_filter/string_split for the oracle.
# ---------------------------------------------------------------------------

C4_MIN_LINE_WORDS = 5
C4_TERMINAL_RE = "[.!?\"'”]$"


def c4_filter_columns(col: str, min_line_words: int = C4_MIN_LINE_WORDS
                      ) -> list:
    """C4 cleaning signals for one document column:

    - ``n_lines`` / ``n_kept`` — lines before/after the line rules:
      keep a line iff it has >= ``min_line_words`` whitespace words,
      ends in terminal punctuation (``. ! ? " ' ”``), and does not
      mention 'javascript' (case-insensitive).
    - ``clean_text`` — the kept lines re-joined with ``\\n`` in their
      original order (filter() is order-preserving).
    - ``n_sentences`` — terminal-punctuation runs in the CLEANED text.
    - ``has_brace`` / ``has_lorem`` — the C4 policy triggers (source
      code braces, boilerplate 'lorem ipsum').
    - ``c4_keep`` — the paper's page rule: >= 3 sentences after line
      cleaning and neither policy trigger fired.

    All array/higher-order built-ins: one narrow map over the scan,
    zero exchanges, pipelines with the parquet read at 100 TB. The
    identical list_filter/string_split formulation runs in DuckDB
    (oracle in __spark_entry__.py). Reference parity: extension op —
    the reference ships Gopher-style filtering apps only.
    """
    lines = F.split(F.col(col), "\n")
    keep = lambda x: (
        (F.size(F.split(F.trim(x), r"\s+")) >= min_line_words)
        & F.trim(x).rlike(C4_TERMINAL_RE)
        & ~F.contains(F.lower(x), F.lit("javascript")))
    kept = F.filter(lines, keep)
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]+")).cast("bigint")
    has_brace = F.contains(F.col(col), F.lit("{"))
    has_lorem = F.contains(F.lower(F.col(col)), F.lit("lorem ipsum"))
    c4_keep = (n_sent >= 3) & ~has_brace & ~has_lorem
    return [F.size(lines).cast("bigint").alias("n_lines"),
            F.size(kept).cast("bigint").alias("n_kept"),
            clean.alias("clean_text"),
            n_sent.alias("n_sentences"),
            F.coalesce(has_brace, F.lit(False)).alias("has_brace"),
            F.coalesce(has_lorem, F.lit(False)).alias("has_lorem"),
            F.coalesce(c4_keep, F.lit(False)).alias("c4_keep")]


# Tracking query parameters stripped by URL canonicalization — the
# standard crawl-dedup list (utm_* et al.). Kept literal so the
# identical regexes run in DuckDB's RE2.
_TRACKING_PARAM_RE = (
    r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)"
    r"=[^&#\s]*")


def canonicalize_url(col) -> Column:
    """URL canonicalization for crawl-level dedup keys — the
    normalization every web pipeline runs before grouping by URL:

    1. lowercase scheme+host (path stays case-sensitive per RFC 3986),
    2. drop the fragment (``#...``),
    3. strip tracking query parameters (utm_*, fbclid, gclid, ...),
       then tidy separators (``?&``→``?``, trailing ``?``/``&``),
    4. drop a trailing slash on a non-root path.

    A fixed chain of portable regexp_replace passes in the shared
    Java/RE2 subset — map-side, zero exchanges, and the IDENTICAL
    chain replays in DuckDB (oracle). Input must be a bare URL value
    (compose with url_columns' extractor for free text)."""
    c = F.col(col) if isinstance(col, str) else col
    # 1: lowercase the scheme://host prefix only ((?i) — the scheme
    # itself may arrive uppercased)
    head = F.lower(F.regexp_extract(c, r"^((?i:https?)://[^/?#]*)", 1))
    tail = F.regexp_replace(c, r"^(?i:https?)://[^/?#]*", "")
    u = F.concat(head, tail)
    # 2: fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3: tracking params — three passes so separators stay well-formed
    # regardless of position: "&p=v" anywhere drops; a leading "?p=v&"
    # hands "?" to the next param; a lone "?p=v" disappears
    u = F.regexp_replace(u, r"&" + _TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, r"\?" + _TRACKING_PARAM_RE + r"&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACKING_PARAM_RE + r"$", "")
    # 4: trailing slash on a non-root path
    u = F.regexp_replace(u, r"(https?://[^/?#]+/[^?#]*?)/+(\?|$)", r"$1$2")
    return u
