"""Sequence packing for training-batch preparation.

Concatenative packing (the GPT-style pretraining layout): documents
in a canonical order are laid end-to-end on a global token tape and
cut into fixed-budget packs. Each document's pack is decided by the
token offset at which it STARTS — a pure function of the corpus, so
the layout is stable across runs and cluster sizes. A document longer
than the budget still gets the pack where it starts (the trainer's
chunker splits it downstream); packs are therefore complete and
gap-free but may overflow by at most one document tail.

The global prefix sum is the classic two-level formulation: range-
partition by the order key, per-partition running sums (a window over
the partition id), plus one slim per-partition-total pass whose
cumulative offsets broadcast back — no global single-task window, the
scan stays fully parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, token_col: str, id_col: str,
                   budget: int) -> DataFrame:
    """Add ``pack_id`` / ``pack_offset`` columns: the pack index and
    the token offset within the global tape at which this document
    starts. Deterministic in (id order, token counts) only."""
    assert budget > 0
    sc = df.sparkSession.sparkContext
    n_range = max(sc.defaultParallelism,
                  df.rdd.getNumPartitions())
    # pid must be materialized before any downstream exchange (same
    # hazard as multimodal.repartition_by_payload_size): localCheckpoint
    # snapshots it; blocks reclaimed when the plan is GC'd
    ranged = (df.repartitionByRange(n_range, F.col(id_col).asc())
              .withColumn("__pid__", F.spark_partition_id())
              .localCheckpoint(eager=True))
    sums = (ranged.groupBy("__pid__")
            .agg(F.sum(token_col).alias("s")).collect())
    totals = {r["__pid__"]: int(r["s"] or 0) for r in sums}
    offsets, acc = {}, 0
    # range partition index order == key order for repartitionByRange
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("__pid__"))
    w = (Window.partitionBy("__pid__").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    start = off + F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (ranged
            .withColumn("pack_id", F.floor(start / budget))
            .withColumn("pack_offset", start - F.col("pack_id") * budget)
            .drop("__pid__"))


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 50,
              driver_vocab_limit: int = 500_000) -> "tuple[list, DataFrame]":
    """Distributed BPE tokenizer training (Sennrich et al. 2016): the
    missing piece between corpus prep and model training — learn the
    merge table ON the cluster, over the same corpus the pipeline just
    cleaned.

    Algorithm (classic BPE over whitespace words, </w> end marker):
      1. ONE corpus-scale job: word → count (explode + partial agg).
         Everything after runs on the DISTINCT-WORD table — the
         Zipf collapse that makes BPE training tractable: the merge
         loop's working set is the vocabulary, not the corpus.
      2. Per merge round: count adjacent symbol pairs weighted by word
         count (ALL adjacent positions, overlaps included — exactly
         Sennrich's get_stats; only the merge APPLY is leftmost
         non-overlapping), pick the max-count pair
         (deterministic count-desc, pair-asc tiebreak), and apply the
         merge to every word's symbol array in an Arrow-batched
         kernel. The words table persists; lineage resets every few
         rounds (localCheckpoint, the kmeans/pagerank loop pattern).

    Returns (merges, vocab_df) — merges as [(left, right), ...] in
    rank order; vocab_df = (word, symbols, count) after all merges.
    Deterministic: pure function of the corpus. Matches a pure-Python
    reference implementation exactly (test-pinned)."""
    from pyspark.storagelevel import StorageLevel
    norm = F.expr(
        f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))")
    words = (df.select(norm.alias("__n__"))
             .filter(F.length("__n__") > 0)
             .select(F.explode(F.split("__n__", " ")).alias("w"))
             .filter(F.length("w") > 0)
             .groupBy("w").agg(F.count(F.lit(1)).alias("count"))
             .select("w",
                     F.concat(F.split("w", ""), F.array(F.lit("</w>")))
                     .alias("symbols"),
                     "count"))
    words = words.persist(StorageLevel.MEMORY_AND_DISK)
    merges: list = []

    # Zipf collapse: after the one corpus-scale word count, the
    # distinct-word table is tiny relative to the corpus (even
    # 100 TB crawls have ~10^7-10^8 distinct words). When it fits the
    # driver budget, run the merge loop locally over (word, count) —
    # the same bounded-driver-training precedent as IVF's k-means
    # sample — and return instantly; the fully distributed loop below
    # is the overflow path (tested equal on a forced low limit).
    if words.count() <= driver_vocab_limit:
        rows = words.select("w", "count").collect()
        wc = {r["w"]: int(r["count"]) for r in rows}
        vocab = {w: list(w) + ["</w>"] for w in wc}
        for _ in range(num_merges):
            stats: dict = {}
            for w, syms in vocab.items():
                c = wc[w]
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    stats[p] = stats.get(p, 0) + c
            if not stats:
                break
            m = max(stats.values())
            if m < 2:
                break
            a, b = sorted(p for p, c in stats.items() if c == m)[0]
            merges.append((a, b))
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
        spark = df.sparkSession
        out_df = spark.createDataFrame(
            [(w, vocab[w], wc[w]) for w in wc],
            "w string, symbols array<string>, count long")
        words.unpersist()
        return merges, out_df

    def pair_counts(wdf):
        # all adjacent pairs weighted by count (Sennrich get_stats),
        # pre-combined into one dict per Arrow batch before the
        # JVM-side partial agg
        import pandas as pd

        def kernel(it):
            for pdf in it:
                out: dict = {}
                for syms, cnt in zip(pdf["symbols"], pdf["count"]):
                    i = 0
                    while i < len(syms) - 1:
                        p = (syms[i], syms[i + 1])
                        out[p] = out.get(p, 0) + int(cnt)
                        i += 1
                yield pd.DataFrame(
                    {"left": [k[0] for k in out],
                     "right": [k[1] for k in out],
                     "c": list(out.values())})

        return (wdf.mapInPandas(kernel, "left string, right string, c long")
                .groupBy("left", "right").agg(F.sum("c").alias("c")))

    for it in range(num_merges):
        top = (pair_counts(words)
               .orderBy(F.desc("c"), F.asc("left"), F.asc("right"))
               .limit(1).collect())
        if not top or top[0]["c"] < 2:
            break
        a, b = top[0]["left"], top[0]["right"]
        merges.append((a, b))

        def apply_merge(it, a=a, b=b):
            import pandas as pd
            for pdf in it:
                merged = []
                for syms in pdf["symbols"]:
                    out, i = [], 0
                    while i < len(syms):
                        if (i < len(syms) - 1 and syms[i] == a
                                and syms[i + 1] == b):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    merged.append(out)
                yield pd.DataFrame({"w": pdf["w"], "symbols": merged,
                                    "count": pdf["count"]})

        new = words.mapInPandas(
            apply_merge, "w string, symbols array<string>, count long")
        if (it + 1) % 8 == 0:
            new = new.localCheckpoint(eager=True)
        new = new.persist(StorageLevel.MEMORY_AND_DISK)
        words.unpersist()
        words = new
    return merges, words


#: Symbol wrappers for the string form of a BPE symbol sequence. Every
#: symbol is stored as ``STX symbol ETX``, so the merge pattern
#: ``STX a ETX STX b ETX`` can only match two COMPLETE adjacent
#: symbols: a neighbor that merely ends with ``a`` (or starts with
#: ``b``) breaks the delimiter sandwich, and — unlike a space-padded
#: pattern — a replacement never consumes the next pair's boundary, so
#: leftmost-non-overlapping chains (``t t t t`` → ``tt tt``) behave
#: exactly like the array kernel in :func:`bpe_train`. Control chars
#: are safe: they cannot survive the ``\\s+`` whitespace collapse of
#: any real text corpus.
BPE_SYM_L = "\x02"
BPE_SYM_R = "\x03"


def bpe_symbol_expr(text_col: str) -> "F.Column":
    """The BPE staging form of a document as ONE string: lowercase +
    whitespace-collapse (identical to :func:`bpe_train`'s word norm),
    every character wrapped as ``STX c ETX``, and a ``</w>``
    end-of-word symbol closing each word. Built from portable string
    ops (mark word breaks with a newline sentinel — impossible in the
    collapsed text — wrap chars, rewrite the sentinel as the boundary
    symbol), so the IDENTICAL staging runs in the DuckDB oracle.
    Empty documents stage to ''.

    Char wrap (optimization round 13): ``split(s, '')`` + array_join
    instead of the original per-char ``(?s)(.)`` regexp substitution —
    same output for every code point (Spark's split on the empty
    pattern yields code-point pieces, surrogate pairs intact, no
    trailing empty; pinned equal on the corpus and non-BMP edges) at
    ~25% less stage time; the ORACLE keeps its regexp form, which the
    hash-exact gate continues to compare end-to-end."""
    L, R = BPE_SYM_L, BPE_SYM_R
    norm = F.expr(
        f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))")
    marked = F.replace(norm, F.lit(" "), F.lit("\n"))
    wrapped = F.concat(
        F.lit(L), F.array_join(F.split(marked, ""), f"{R}{L}"), F.lit(R))
    closed = F.concat(
        F.replace(wrapped, F.lit(f"{L}\n{R}"), F.lit(f"{L}</w>{R}")),
        F.lit(f"{L}</w>{R}"))
    return F.when(F.length(norm) == 0, F.lit("")).otherwise(closed)


def bpe_encode(df: DataFrame, merges: list, text_col: str = "text",
               id_col: str = "doc_id",
               compiled_limit: int = 256) -> DataFrame:
    """Apply a trained BPE merge table (rank-ordered ``[(left, right),
    ...]`` — :func:`bpe_train`'s output) to tokenize documents.

    Each merge is a literal leftmost-non-overlapping string
    replacement ``STX a ETX STX b ETX → STX ab ETX`` on the
    delimiter-wrapped symbol string (see :data:`BPE_SYM_L`) — exactly
    the semantics of bpe_train's apply kernel, so encoding the
    corpus's distinct words reproduces the trained vocab's
    segmentation (test-pinned). Word boundaries are safe by
    construction: ``</w>`` is always a word's LAST symbol, so no
    trained merge has it on the left, and a wrapped pattern can never
    span two words.

    Plan shape: for vocabularies up to ``compiled_limit`` merges the
    whole chain compiles to nested JVM ``replace`` expressions — a
    narrow map over the scan, zero exchanges, whole-stage codegen,
    and an exact ANSI-SQL mirror for the oracle. Past the limit
    (real tokenizers run 30k-100k merges; a 30k-deep codegen
    expression is not a plan, it's a stack overflow) the same
    replacement loop runs as an Arrow-batched kernel over
    ``mapInPandas`` — still map-side, still zero exchanges; both
    paths are pinned equal in tests.

    Output: ``(id_col, tokens array<string>, n_tokens)``. Reference
    parity: extension op — the reference ships no tokenizer-apply
    operator (its pipelines stop at corpus prep)."""
    for a, b in merges:
        if a.endswith("</w>"):
            raise ValueError(
                f"invalid merge table: left symbol {a!r} ends with "
                "'</w>'. A '</w>'-suffixed symbol is always word-FINAL, "
                "so it never has a right neighbor inside a word — no "
                "real bpe_train output contains such a merge, and "
                "applying one to the document-level symbol string would "
                "merge across word boundaries")
    L, R = BPE_SYM_L, BPE_SYM_R
    staged = bpe_symbol_expr(text_col)
    pairs = [(f"{L}{a}{R}{L}{b}{R}", f"{L}{a}{b}{R}") for a, b in merges]
    if len(merges) <= compiled_limit:
        s = staged
        for pat, rep in pairs:
            s = F.replace(s, F.lit(pat), F.lit(rep))
        encoded = df.select(F.col(id_col), s.alias("__s__"))
    else:
        import pandas as pd

        def kernel(it):
            for pdf in it:
                col = pdf["__s__"]
                for pat, rep in pairs:
                    col = col.str.replace(pat, rep, regex=False)
                yield pd.DataFrame({id_col: pdf[id_col], "__s__": col})

        encoded = df.select(F.col(id_col), staged.alias("__s__")) \
                    .mapInPandas(kernel, f"{id_col} long, __s__ string")
    inner = F.expr(f"substring(__s__, 2, length(__s__) - 2)")
    toks = F.when(F.length("__s__") == 0,
                  F.array().cast("array<string>")) \
            .otherwise(F.split(inner, f"{R}{L}"))
    return encoded.select(id_col, toks.alias("tokens"),
                          F.size(toks).cast("bigint").alias("n_tokens"))
