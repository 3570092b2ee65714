"""Training-data text operators over a `documents(doc_id, text, lang,
source, n_chars)` table: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), language-ID, quality scoring, token counting, document
fingerprinting.

Not in the reference (ocaml-rdf is an RDF library) — these are the
large-scale-corpus operators the driver mandates as first-class. Every
operator here is pure `pyspark.sql.functions` (JVM-side, whole-stage
codegen; zero Python UDFs) and each has an exact DuckDB-SQL twin in
suite.py, so the oracle gate covers them value-for-value.

Engine-portability rules used throughout:
- hashes are md5 hex strings (identical in Spark/DuckDB; xxhash64/hash()
  are engine-specific so banned from oracle-checked outputs);
- hex→int decoding is done by digit position (`instr('0123…f', ch)`) —
  both engines lack a shared strtol;
- all scores are integers (no double formatting/rounding drift).

Scale notes: exact-dup and fingerprint are one shuffle each (groupBy on a
hash). MinHash explodes words (corpus-token-count rows) then re-aggregates
— the shuffle carries (doc_id, band, min-hash) only, ~k rows per doc.
LSH candidate pairs come from a bucket self-join; bucket skew (stop-word
buckets) is capped via a per-bucket size limit before the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

# Tiny stopword lists per language for the n-gram/stopword heuristic
# language-ID. Deterministic and mirrored literally in the SQL oracle.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
}


def words(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (portable: split on ' +')."""
    return F.split(F.trim(text), " +")


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: md5(text) → (hash, n_docs, keep_id). One shuffle."""
    return (
        docs.select(F.md5(F.col("text")).alias("hash"), F.col("doc_id"))
        .groupBy("hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def minhash_signature_col(text: Column, bands: int = 8) -> Column:
    """The full MinHash signature as ONE per-row column expression —
    `bands` min-hashes over the word set, joined with '|'. Agrees
    band-for-band with `minhash_signatures` (same md5(band:word) hash,
    min over the same word set), but needs no explode/groupBy, so it is
    legal in a streaming stage (no aggregation before a stateful op) and
    keeps whole-stage codegen in batch plans. Empty/whitespace-only docs
    hash to the empty signature (they dedup together)."""
    ws = F.array_distinct(F.filter(words(text), lambda w: w != ""))

    def band_min(i: int) -> Column:
        # NB: the lambda must stay single-arg — a 2-arg transform lambda
        # receives (element, index) and would shadow the band id
        b = F.lit(i)
        return F.array_min(F.transform(ws, lambda w: F.md5(F.concat_ws(":", b, w))))

    return F.concat_ws("|", *[band_min(i) for i in range(bands)])


def minhash_signatures(docs: DataFrame, bands: int = 8) -> DataFrame:
    """Per-doc MinHash over the word *set*: band b's hash is
    min(md5(b || ':' || word)). → (doc_id, band, mh).

    min over md5-hex strings is a valid uniform min-hash (hex orders like
    the underlying 128-bit value), and is byte-identical across engines.
    """
    # single pass: one min-aggregate column per band over the exploded words
    # (no ×bands row blowup pre-shuffle — the old explode(0..bands) form put
    # 8× rows through the hash aggregate); the tiny post-agg explode just
    # reshapes (doc_id, mh0..mh7) into the (doc_id, band, mh) long form
    w = docs.select("doc_id", F.explode(words(F.col("text"))).alias("w")).filter(F.col("w") != "")
    mins = w.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat_ws(":", F.lit(i), F.col("w")))).alias(f"mh{i}")
            for i in range(bands)
        ]
    )
    arr = F.array([F.struct(F.lit(i).alias("band"), F.col(f"mh{i}").alias("mh")) for i in range(bands)])
    return mins.select("doc_id", F.explode(arr).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.mh").alias("mh")
    )


def minhash_candidates(docs: DataFrame, bands: int = 8, max_bucket: int = 50) -> DataFrame:
    """LSH blocking: docs sharing any (band, mh) bucket → candidate pairs
    (a < b) with the number of agreeing bands (jaccard estimate ≈ n_bands/
    bands). Buckets larger than `max_bucket` are dropped (mega-bucket skew
    guard — at web scale a boilerplate bucket can hold millions of docs and
    the self-join would be quadratic)."""
    # materialize signatures once: the bucket-size aggregate and BOTH
    # self-join sides reference this subtree, and Catalyst does not dedupe
    # it across a self-join — at scale this is the signatures table the
    # pipeline would persist anyway
    sig = minhash_signatures(docs, bands).localCheckpoint(eager=False)
    small = sig.join(
        sig.groupBy("band", "mh").agg(F.count(F.lit(1)).alias("bsz")).filter(F.col("bsz") <= max_bucket),
        ["band", "mh"],
    ).select("doc_id", "band", "mh")
    a, b = small.alias("a"), small.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.mh") == F.col("b.mh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), F.col("a.band").alias("band"))
        .distinct()
    )
    return pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_bands"))


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, n: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs → (doc_a, doc_b,
    jac_pct int 0..100). Verification stage after LSH blocking.

    Grams are generated ONLY for docs that appear in a candidate pair
    (semi-join before the explode): at web scale the candidate set is a
    tiny fraction of the corpus, so gram generation is candidate-bounded
    instead of corpus-wide."""
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs = docs.join(cand_ids, "doc_id", "left_semi")
    # materialize the word array before the gram lambda (a raw expression
    # referenced inside transform() re-evaluates per element — the split
    # would run len(words) times per doc, O(len²); cf. tfidf_pairs)
    docs = docs.withColumn("__w", words(F.col("text")))
    w = F.col("__w")
    # guard: sequence(1, k) with k<1 would generate a DESCENDING sequence
    idx = F.when(F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = (
        docs.select(
            "doc_id",
            F.explode(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))).alias("g"),
        )
        .filter(F.length("g") > 0)
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("g"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("g"))
    inter = (
        pairs.join(ga, "doc_a").join(gb, ["doc_b", "g"]).groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    out = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "sz_b"), "doc_b")
        .withColumn(
            "jac_pct",
            F.floor(F.col("n_inter") * 100 / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))).cast("long"),
        )
    )
    return out.select("doc_a", "doc_b", "jac_pct")


def _hex16(s: Column) -> Column:
    """First 4 hex digits of md5 → int 0..65535. Spark: conv(hex,16,10);
    the DuckDB oracle decodes by digit position — independent decoders,
    same value."""
    return F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("long")


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over words → (doc_id, simhash int). Near-dups share
    most bits; grouping by simhash finds templated near-identical docs."""
    w = docs.select("doc_id", F.explode(words(F.col("text"))).alias("w")).filter(F.col("w") != "")
    w = w.withColumn("h", _hex16(F.col("w")))
    bitlits = F.array(
        [F.struct(F.lit(i).alias("bit"), F.lit(1 << i).alias("p2")) for i in range(16)]
    )
    bits = (
        w.select("doc_id", "h", F.explode(bitlits).alias("b"))
        .select("doc_id", "h", F.col("b.bit").alias("bit"), F.col("b.p2").alias("p2"))
        .withColumn("contrib", F.when((F.floor(F.col("h") / F.col("p2")) % 2) == 1, 1).otherwise(-1))
    )
    per_bit = bits.groupBy("doc_id", "bit", "p2").agg(F.sum("contrib").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.col("p2")).otherwise(0)).cast("long").alias("simhash")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language ID → (doc_id, lang_guess, top_hits int).
    Ties break alphabetically (deterministic; mirrored in SQL)."""
    w = words(F.col("text"))
    scores = [
        F.size(F.filter(w, lambda x: F.lower(x).isin(*sw))).alias(f"s_{lg}")
        for lg, sw in sorted(LANG_STOPWORDS.items())
    ]
    d = docs.select("doc_id", *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"s_{lg}") == best, F.lit(lg)) for lg in langs]
    )
    return d.select(
        "doc_id",
        F.when(best > 0, guess).otherwise(F.lit("und")).alias("lang_guess"),
        best.cast("long").alias("top_hits"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features, all integers:
    n_tokens, mean token length ×100, punctuation per 1000 chars,
    stopword-per-1000-token rate, and a composite score."""
    t = F.col("text")
    w = words(t)
    n_tok = F.size(w).cast("long")
    n_chars = F.length(t).cast("long")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))).cast("long")
    en = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*en))).cast("long")
    mean_tok_x100 = F.floor(n_chars * 100 / F.greatest(n_tok, F.lit(1))).cast("long")
    punct_x1000 = F.floor(n_punct * 1000 / F.greatest(n_chars, F.lit(1))).cast("long")
    stop_x1000 = F.floor(n_stop * 1000 / F.greatest(n_tok, F.lit(1))).cast("long")
    score = (
        F.when((n_tok >= 10) & (mean_tok_x100 >= 300) & (mean_tok_x100 <= 1200), 50).otherwise(0)
        + F.when(stop_x1000 > 0, 30).otherwise(0)
        + F.when(punct_x1000 <= 200, 20).otherwise(0)
    ).cast("long")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_tok_x100.alias("mean_tok_x100"),
        punct_x1000.alias("punct_x1000"),
        stop_x1000.alias("stop_x1000"),
        score.alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace count + a BPE-ish
    regex count (word pieces / numbers / single punctuation — an upper
    bound proxy for subword tokenizer cost accounting)."""
    t = F.col("text")
    ws = F.size(words(t)).cast("long")
    # counted via regexp_extract_all in BOTH engines (greedy alternation
    # over disjoint char classes — same match count in Java regex and RE2)
    bpe = F.size(F.regexp_extract_all(t, F.lit(r"[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9\s]"), F.lit(0))).cast("long")
    return docs.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_ish_tokens"))


def vocab_topk(docs: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: top-k tokens by term frequency with document
    frequency — the tokenizer-training / stopword-mining primitive.
    Tokens are lowercase alnum words (non-alnum → space, collapsed).

    Skew-safe by construction: a stopword ('the') appears in every doc,
    so a single groupBy(tok).agg(countDistinct(doc_id)) would funnel the
    mega-token's raw occurrences through one reducer. Instead the first
    groupBy is on (tok, doc_id) — map-side combine bounds the exchange at
    one row per (tok, doc) — and the second aggregates the bounded cells.
    Top-k is TakeOrderedAndProject (count desc, token asc tie-break —
    fully deterministic), never a full sort."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "), r" +", " "
                    )
                ),
                " ",
            )
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    pairs = toks.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("n"))
    counts = pairs.groupBy("tok").agg(
        F.sum("n").alias("tf"), F.count(F.lit(1)).alias("df")
    )
    return counts.orderBy(F.col("tf").desc(), F.col("tok").asc()).limit(k)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized content fingerprint: md5 of lowercased alnum+space text
    with collapsed whitespace → (doc_id, fp). Near-exact dedup key robust
    to case/punctuation drift."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""), r" +", " ")
    )
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def near_dup_clusters(
    docs: DataFrame,
    bands: int = 8,
    band_min: int = 4,
    jac_min: int = 60,
    max_bucket: int = 50,
    n: int = 3,
) -> DataFrame:
    """Corpus-level near-dup clustering — the composed production dedup
    pipeline: MinHash-LSH blocking → n-gram Jaccard verification →
    connected components → (doc_id, cluster_id, is_keeper).

    cluster_id = the minimum doc_id of the near-dup component (padding the
    ids before CC makes lexicographic component-min equal numeric min);
    docs in no verified pair are their own singleton cluster. `is_keeper`
    marks the canonical representative to keep.

    Scale: candidate generation is the bucket-capped LSH join (never
    all-pairs), verification is candidate-pair-bounded, and the component
    step is O(log n) large-star/small-star rounds over the verified-pair
    edge set — each stage is exactly the bounded shape its standalone
    operator ships with (SURVEY §9)."""
    from .cc import connected_components

    pairs = minhash_candidates(docs, bands, max_bucket).filter(F.col("n_bands") >= band_min)
    ver = ngram_jaccard(docs, pairs.select("doc_a", "doc_b"), n=n).filter(
        F.col("jac_pct") >= jac_min
    )

    def pad(c: str) -> Column:
        return F.lpad(F.col(c).cast("string"), 12, "0")

    edges = ver.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst"))
    comp = connected_components(edges).select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )
    out = docs.select("doc_id").join(comp, "doc_id", "left")
    out = out.withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    return out.withColumn(
        "is_keeper", (F.col("cluster_id") == F.col("doc_id")).cast("long")
    )


def paragraph_dedup(
    docs: DataFrame, delim: str = "\n\n", id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Paragraph-level exact dedup (the C4/RefinedWeb recipe): split each
    document on `delim`, keep only the globally-FIRST occurrence of every
    distinct paragraph (order = (doc_id, position)), reassemble what's
    left → (id, text, n_paras). Documents whose every paragraph was seen
    earlier drop out entirely.

    100 TB shape: two shuffles — one window over md5(paragraph) (hash-
    partitioned; row_number, no global sort) and one groupBy(doc) for
    reassembly. Paragraph hashing keys the shuffle, so mega-duplicate
    boilerplate paragraphs skew a single partition at worst (AQE skew-join
    handles it; the paragraphs themselves are short rows).
    """
    from pyspark.sql import Window

    parts = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "para"),
    )
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy(F.col(id_col), F.col("pos"))
    kept = parts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            delim,
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_paras"),
    )


def repetition_stats(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    table A1): the fraction of characters sitting in duplicated lines and
    the count fraction of the single most frequent word bigram. High
    values flag boilerplate / template spam for training-data filtering.

    Output: (id, n_lines, dup_line_x1000, n_bigrams, top_bigram_x1000) —
    fractions as floor(x*1000) BIGINTs so the cross-engine oracle compares
    exactly.

    100 TB shape: every aggregation is keyed by the document id (or
    (id, line) / (id, bigram) — strictly finer), so this is two map-side-
    combinable shuffle chains with no cross-document join anywhere; a
    mega-document skews one partition at worst and AQE splits it."""
    lines = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .withColumn("line", F.trim("line"))
        .filter(F.length("line") > 0)
    )
    per_line = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_stats = (
        per_line.withColumn("chars", F.length("line") * F.col("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.floor(
                F.sum(F.when(F.col("cnt") > 1, F.col("chars")).otherwise(F.lit(0)))
                * 1000.0
                / F.sum("chars")
            ).alias("dup_line_x1000"),
        )
    )
    words = docs.select(
        id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("__w")
    )
    bigrams = words.select(
        id_col,
        F.explode(
            F.when(
                F.size("__w") >= 2,
                F.expr(
                    "transform(sequence(1, size(__w)-1),"
                    " i -> concat(element_at(__w, i), ' ', element_at(__w, i+1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    per_bg = bigrams.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("cnt"))
    bg_stats = per_bg.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.floor(F.max("cnt") * 1000.0 / F.sum("cnt")).alias("top_bigram_x1000"),
    )
    return (
        docs.select(id_col)
        .dropDuplicates()
        .join(line_stats, id_col, "left")
        .join(bg_stats, id_col, "left")
        .fillna(0, ["n_lines", "dup_line_x1000", "n_bigrams", "top_bigram_x1000"])
    )


# ---------------------------------------------------------------------------
# benchmark decontamination + exact substring-span dedup
# ---------------------------------------------------------------------------


def _shingle_arr(tok_col: str, n: int) -> Column:
    """Array of n-token shingles (space-joined) over an array<string>
    column, empty when the doc has fewer than n tokens. SQL `sequence`
    would count DOWN for start > stop, hence the explicit guard."""
    return F.expr(
        f"CASE WHEN size({tok_col}) >= {n} THEN "
        f"transform(sequence(1, size({tok_col}) - {n - 1}), "
        f"i -> array_join(slice({tok_col}, i, {n}), ' ')) "
        f"ELSE array() END"
    ).cast("array<string>")


def _norm_tokens(text_col: str = "text") -> Column:
    """Case/punct-normalized token array (the fingerprint normalization):
    lowercase, non-alnum → space, collapsed. Decontamination matches on
    normalized text so cosmetic edits can't hide benchmark overlap."""
    return F.split(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "), r" +", " "
            )
        ),
        " ",
    )


def decontaminate(
    docs: DataFrame, bench: DataFrame, n: int = 8, threshold_pct: int = 50
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM n-gram recipe): flag
    corpus documents whose normalized n-gram sets overlap a benchmark/
    eval set. `bench` needs a `text` column.

    Returns (doc_id, n_grams, n_matched, contam_pct, flagged) for EVERY
    corpus doc (0s when the doc is shorter than n tokens).

    Scale shape: the benchmark side is eval-set-sized (MBs) → its distinct
    gram set is broadcast; the corpus side is a map-only shingle explode
    feeding a broadcast hash semi-join, so NO corpus-sized shuffle ever
    happens — only matched grams (tiny) reach the per-doc aggregation.
    Per-doc totals come from the pre-explode array, not a second pass."""
    corpus = (
        docs.select("doc_id", _norm_tokens().alias("__t"))
        .select("doc_id", F.array_distinct(_shingle_arr("__t", n)).alias("gs"))
        .withColumn("n_grams", F.size("gs").cast("long"))
    )
    bench_grams = (
        bench.select(_norm_tokens().alias("__t"))
        .select(F.explode(_shingle_arr("__t", n)).alias("g"))
        .dropDuplicates()
    )
    matched = (
        corpus.select("doc_id", F.explode("gs").alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    pct = F.floor(
        F.coalesce(F.col("n_matched"), F.lit(0)) * 100.0 / F.greatest(F.col("n_grams"), F.lit(1))
    ).cast("long")
    return (
        corpus.select("doc_id", "n_grams")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
            pct.alias("contam_pct"),
            F.when(pct >= threshold_pct, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("flagged"),
        )
    )


def span_dedup(docs: DataFrame, w: int = 8, stride: int = 1) -> DataFrame:
    """Exact substring-span dedup stats (the suffix-array recipe of
    "Deduplicating Training Data Makes Language Models Better",
    re-expressed as a distributed shingle-hash count): a w-token window
    whose hash occurs more than once ANYWHERE in the corpus is a
    duplicated span. Returns per-doc
    (doc_id, n_windows, n_dup_windows, dup_pct).

    Scale shape: windows are generated map-side from the token array
    (one row per stride-th position — `stride` is the scale lever: w/2
    keeps detection of any ≥1.5w-token clone while cutting the exchange
    by w/2×); the only corpus-sized shuffle is the groupBy on the 16-byte
    window hash (map-side combined). The hash→count join back is a plain
    hash join on the same key, so AQE can reuse the exchange."""
    toks = docs.select("doc_id", words(F.col("text")).alias("__t"))
    wins = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(__t) >= {w} THEN "
                f"transform(sequence(1, size(__t) - {w - 1}, {stride}), "
                f"i -> md5(array_join(slice(__t, i, {w}), ' '))) "
                f"ELSE array() END"
            ).cast("array<string>")
        ).alias("h"),
    )
    hot = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)
    dups = wins.join(hot, "h").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows")
    )
    sizes = toks.select(
        "doc_id",
        F.when(F.size("__t") >= w, ((F.size("__t") - w) / stride).cast("long") + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_windows"),
    )
    nd = F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long")
    return sizes.join(dups, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        nd.alias("n_dup_windows"),
        F.floor(nd * 100.0 / F.greatest(F.col("n_windows"), F.lit(1))).cast("long").alias("dup_pct"),
    )


def pack_offsets(docs: DataFrame, seq_len: int = 2048, buckets: int = 64) -> DataFrame:
    """Sequence-packing offsets (the GPT-style concat-and-chunk recipe):
    conceptually concatenate every document's tokens in doc_id order and
    cut the stream into fixed `seq_len` chunks; report where each doc
    lands. Returns (doc_id, n_tok, tok_offset, first_chunk, last_chunk,
    n_chunks) — the metadata a training loader needs to materialize packed
    sequences without ever shuffling the text itself.

    Distributed prefix-sum shape (the classic two-stage scan): a naive
    `sum() OVER (ORDER BY doc_id)` with no partition key funnels the whole
    corpus through ONE reducer. Instead (1) docs are range-bucketed on
    doc_id; per-bucket token totals (`buckets` rows, map-side combined)
    get a driver-small cumulative scan and are BROADCAST back; (2) the
    intra-bucket cumsum is a window PARTITIONED BY bucket — so the only
    corpus-wide movement is one bucket-keyed exchange, and every reducer
    scans ~1/buckets of the corpus. Global offset = bucket prefix +
    intra-bucket prefix. Exact, deterministic, engine-portable ints."""
    from pyspark.sql import Window

    ids = docs.select(F.max("doc_id").alias("mx"), F.min("doc_id").alias("mn")).first()
    width = max(1, (int(ids["mx"]) - int(ids["mn"])) // buckets + 1)
    base = docs.select(
        "doc_id",
        ((F.col("doc_id") - F.lit(int(ids["mn"]))) / width).cast("long").alias("__b"),
        F.size(words(F.col("text"))).cast("long").alias("n_tok"),
    )
    btot = base.groupBy("__b").agg(F.sum("n_tok").alias("bt"))
    boff = btot.select(
        "__b",
        F.coalesce(
            F.sum("bt").over(Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long").alias("boff"),
    )
    intra = F.coalesce(
        F.sum("n_tok").over(
            Window.partitionBy("__b").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    off = (F.col("boff") + intra).alias("tok_offset")
    out = base.join(F.broadcast(boff), "__b").select("doc_id", "n_tok", off)
    first = F.floor(F.col("tok_offset") / seq_len).cast("long")
    last = F.floor((F.col("tok_offset") + F.col("n_tok") - 1) / seq_len).cast("long")
    return out.select(
        "doc_id",
        "n_tok",
        "tok_offset",
        F.when(F.col("n_tok") > 0, first).otherwise(F.lit(None)).alias("first_chunk"),
        F.when(F.col("n_tok") > 0, last).otherwise(F.lit(None)).alias("last_chunk"),
        F.when(F.col("n_tok") > 0, (last - first + 1)).otherwise(F.lit(0)).cast("long").alias("n_chunks"),
    )


def bpe_pair_counts(docs: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Adjacent-token-pair frequencies — the inner loop of a BPE/WordPiece
    merge step (count all adjacent symbol pairs, merge the argmax) lifted
    to the corpus: top-k (pair, n) by occurrence count. Tokens are the
    same lowercase-alnum words as `vocab_topk`.

    Scale: pair generation is a scan-local array transform (no UDF); the
    count is ONE map-side-combined hash aggregation — partial aggregation
    bounds the exchange at distinct-pairs-per-partition even though hot
    pairs ('of the') dominate raw occurrences — and top-k is
    TakeOrderedAndProject, never a full sort. One shuffle total."""
    toks = F.split(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "), r" +", " "
            )
        ),
        " ",
    )
    pairs = docs.withColumn("toks", toks).select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat(
                        F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(k)


def nfc_normalize_col(col: Column) -> Column:
    """Unicode NFC normalization (canonical composition) — the step that
    runs BEFORE any hash-keyed dedup so 'café' composed and 'cafe' +
    U+0301 dedup together (md5 sees bytes, not canonical equivalence).

    This is the one textops column that cannot stay JVM-side: Spark has
    no built-in normalizer, so it is an Arrow-batched pandas UDF
    (vectorized batch transfer, never row-at-a-time Python). The DuckDB
    oracle uses its native nfc_normalize, verified char-identical to
    Python's unicodedata on composed/decomposed/combining forms."""
    from pyspark.sql.functions import pandas_udf

    # functional form: the module's `from __future__ import annotations`
    # would turn Series type hints into unevaluable strings
    _nfc = pandas_udf(lambda s: s.str.normalize("NFC"), "string")
    return _nfc(col)


def bm25_rank(
    docs: DataFrame, terms: list, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """BM25-style relevance ranking of the corpus against a bag of query
    terms → top-k (doc_id, score). Classic retrieval scoring (k1=1.2,
    b=0.75) with ONE deliberate change: the idf log is omitted — the raw
    Robertson odds ratio (N - df + 0.5)/(df + 0.5) is used directly,
    floor-scaled ×1000. Rationale: ln() is the only non-correctly-rounded
    op in the formula, so with it the score could differ between engines
    in the last ulp and break the exact value oracle; without it every
    step is integer arithmetic + IEEE correctly-rounded double division,
    bit-identical across Spark/DuckDB/partitionings. The ratio is
    monotone in df, so per-term discrimination ordering is preserved
    (scores skew further toward rare terms than log-idf BM25 — this is a
    ranking surrogate with an exact oracle, like the integer PageRank).

    score(d) = Σ_t idf_x1k(t) * tfn_x1k(d, t)
      idf_x1k = floor(1000 * (2N - 2df + 1) / (2df + 1))      [×2 trick]
      tfn_x1k = floor(22000 * L * tf / (10*L*tf + 3*L + 9*dl*N))
                 = floor(1000 * tf*(k1+1) / (tf + k1*(1-b+b*dl/avdl)))
                   with avdl = L/N, scaled by 10L
    (N docs, L total tokens, dl doc length, tf term frequency.)

    Scale: term stats and corpus totals are tiny aggregates (|terms| and
    1 rows) → broadcast; the per-doc side is one map-side-combined
    groupBy(doc_id, term) over tokens filtered to the query terms BEFORE
    the explode-shuffle. Intermediate products stay < 2^53 up to ~10^13
    total tokens; past that the same formula runs in DECIMAL(38).
    Top-k is TakeOrderedAndProject."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "),
                        r" +",
                        " ",
                    )
                ),
                " ",
            )
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    qt = toks.filter(F.col("tok").isin(list(terms)))
    tf = qt.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    j = (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
    )
    idf = F.floor(
        (F.lit(1000) * (2 * F.col("n_docs") - 2 * F.col("df") + 1)).cast("double")
        / (2 * F.col("df") + 1)
    )
    tfn = F.floor(
        (F.lit(22000) * F.col("total_len") * F.col("tf")).cast("double")
        / (
            F.lit(10) * F.col("total_len") * F.col("tf")
            + F.lit(3) * F.col("total_len")
            + F.lit(9) * F.col("dl") * F.col("n_docs")
        )
    )
    scores = (
        j.select("doc_id", (idf * tfn).alias("s"))
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )
    return scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken MOSS):
    hash every k-token gram, then in each sliding window of `window`
    consecutive gram positions keep the minimum hash → (doc_id, pos, fp).
    Guarantee: any two documents sharing a token run of length ≥
    window + k - 1 share at least one fingerprint, at ~1/window the
    storage of all-grams — the clone-detection index primitive.

    Determinism/portability: the per-window argmin is the min of the
    STRING md5(gram) || ':' || lpad(pos) — lexicographic (hash, pos), so
    ties (and engines) agree; selection is a single doc-partitioned
    window min over a [0, window-1] row frame (ONE shuffle on doc_id),
    full windows only. At 100 TB the fingerprint table is the join key
    for cross-corpus clone search (bucket by fp)."""
    toks = F.split(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "), r" +", " "
            )
        ),
        " ",
    )
    idx = F.when(
        F.size("toks") >= k, F.sequence(F.lit(1), F.size("toks") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = (
        docs.withColumn("toks", toks)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i, k))))
            ).alias("p0", "h"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    )
    n = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    from pyspark.sql.window import Window as W

    key = F.concat(F.col("h"), F.lit(":"), F.lpad(F.col("pos").cast("string"), 8, "0"))
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    sel = (
        grams.withColumn("minkey", F.min(key).over(win))
        .join(n, "doc_id")
        .filter(F.col("pos") <= F.col("n_grams") - (window - 1))
        .select("doc_id", "minkey")
        .distinct()
    )
    return sel.select(
        "doc_id",
        F.split_part(F.col("minkey"), F.lit(":"), F.lit(2)).cast("int").alias("pos"),
        F.split_part(F.col("minkey"), F.lit(":"), F.lit(1)).alias("fp"),
    )


def clone_pairs(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fp_docs: int = 50,
) -> DataFrame:
    """Cross-document clone search over winnowing fingerprints:
    (doc_a < doc_b, n_shared) for pairs sharing ≥ `min_shared` distinct
    fingerprints. The MOSS join stage: candidate generation is
    fingerprint-bucketed (never all-pairs), with the same mega-bucket
    guard as MinHash-LSH — a fingerprint present in > `max_fp_docs`
    documents is boilerplate and is dropped before the self-join, so a
    license-header fp can never go quadratic at 100 TB."""
    fps = winnow_fingerprints(docs, k=k, window=window, text_col="text").select(
        "doc_id", "fp"
    ).distinct()
    small = fps.join(
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("nd")).filter(
            F.col("nd") <= max_fp_docs
        ),
        "fp",
    ).select("doc_id", "fp")
    a, b = small.alias("a"), small.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def quality_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style heuristic quality rules, the per-document filter
    battery (Rae et al. Gopher §A1.1, Raffel et al. C4 §2.2) — each
    signal an exact integer, each rule a 0/1 flag, `keep` their AND:

    - n_words (whitespace tokens) in [50, 100000]  (gopher bounds)
    - mean word length ×100 in [300, 1000]         (gopher 3..10 chars)
    - bullet-started lines < 90% of lines          (gopher)
    - ellipsis-ended lines < 30% of lines          (gopher)
    - '#' symbols per word < 10%                   (gopher symbol ratio)
    - lines ending in terminal punctuation .!?" ≥ 1 (C4's sentence test,
      relaxed to document granularity here)

    Pure Column algebra over split arrays — scan-local, no shuffle; at
    100 TB this runs inside the same stage as lang-ID/token counts.
    documents.text is one synthetic line, so the line-level rules mostly
    pass there — the unit tests exercise each rule's trip wire."""
    lines = F.split(F.col(text_col), "\n")
    words_ = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    n_words = F.size(words_)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    total_chars = F.aggregate(
        F.transform(words_, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    # explicit floor: Spark's double→long cast truncates but DuckDB's
    # rounds — floor() is the portable spelling
    mean_wl_x100 = F.floor(
        F.when(n_words > 0, (F.lit(100) * total_chars) / n_words).otherwise(F.lit(0))
    ).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    )
    n_terminal = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike('[.!?"]$'))
    )
    n_hash = F.size(F.filter(words_, lambda w: w.contains("#")))
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl_x100.alias("mean_wl_x100"),
        F.floor(F.lit(100) * n_bullet / n_lines).cast("long").alias("bullet_pct"),
        F.floor(F.lit(100) * n_ellipsis / n_lines).cast("long").alias("ellipsis_pct"),
        n_terminal.cast("long").alias("n_terminal_lines"),
        F.floor(F.lit(100) * n_hash / F.greatest(n_words, F.lit(1))).cast("long").alias("hash_pct"),
    )
    flags = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
        & (F.col("mean_wl_x100") >= 300) & (F.col("mean_wl_x100") <= 1000)
        & (F.col("bullet_pct") < 90)
        & (F.col("ellipsis_pct") < 30)
        & (F.col("hash_pct") < 10)
        & (F.col("n_terminal_lines") >= 1)
    )
    return out.withColumn("keep", flags.cast("int"))


def encode_tokens(
    docs: DataFrame, vocab_size: int = 256, text_col: str = "text"
) -> DataFrame:
    """Vocabulary-rank token encoding — the step between `vocab_topk`
    (mine the vocabulary) and `pack_offsets` (pack the id stream):
    every document becomes its token-id sequence under a corpus-derived
    vocabulary of the `vocab_size` most frequent tokens (id = frequency
    rank, 1-based, ties broken token-asc; 0 = OOV) →
    (doc_id, n_tok, ids_csv).

    Scale: the vocabulary is `vocab_size` rows by construction, so the
    rank window (partition-less, but over k rows) and the encode join
    (BROADCAST) are both bounded by a parameter, not the corpus; the
    only corpus-sized shuffles are the vocab count and the per-doc
    regroup. ids_csv is a string so the value oracle is
    representation-stable across engines (array renderings differ)."""
    from pyspark.sql.window import Window as W

    norm = F.split(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "), r" +", " "
            )
        ),
        " ",
    )
    toks = (
        docs.withColumn("toks", norm)
        .select("doc_id", F.posexplode("toks").alias("pos", "tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(vocab_size)
    vocab = top.withColumn(
        "tid", F.row_number().over(W.orderBy(F.col("n").desc(), F.col("tok").asc()))
    ).select("tok", "tid")
    enc = toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "pos", F.coalesce(F.col("tid"), F.lit(0)).alias("tid")
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tid")))
                    ),
                    lambda s: s["tid"].cast("string"),
                ),
                ",",
            ).alias("ids_csv"),
        )
    )


def lm_score(docs: DataFrame, scale: int = 1_000_000, text_col: str = "text") -> DataFrame:
    """Bigram-LM pseudo-likelihood quality score — the CCNet/KenLM
    LM-filter shape with the model trained on the corpus itself:
    (doc_id, n_bigrams, score_sum, score_avg) where each bigram (w1, w2)
    contributes q = (scale · n(w1,w2)) div n(w1,·), the integer-quantized
    conditional probability. Low score_avg = improbable word sequences
    (boilerplate, gibberish, OCR noise); high = fluent running text.

    Integer-exact by construction (the integer-PageRank/BM25 precedent):
    counts are BIGINT, q is one exact integer division, per-doc sums are
    associative — bit-identical across partitionings and engines, so the
    suite value-oracles it where a log-prob float LM could never hash
    equal. Docs with < 2 tokens emit no bigrams and are absent (same rule
    both engines).

    Scale: bigram generation is scan-local (transform over the token
    array — no self-join); the model is two map-side-combined aggs whose
    output is vocabulary²-bounded, NOT corpus-bounded; the score join is
    a hash join on (w1, w2) with AQE skew handling for stop-word pairs.
    At extreme corpus sizes prune the model to top-k bigrams per w1
    before the join (the table stays a filter-pushed parquet side) and
    drop `scale` to 10⁴ so scale·n stays far from 2⁶³."""
    toks = docs.withColumn("__t", _norm_tokens(text_col))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(__t) >= 2 THEN transform(sequence(1, size(__t) - 1), "
                "i -> struct(element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2)) "
                "ELSE array() END"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    cp = cb.groupBy("w1").agg(F.sum("n").alias("np"))
    q = cb.join(cp, "w1").select("w1", "w2", F.expr(f"{scale} * n div np").alias("q"))
    return (
        bg.join(q, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("q").alias("score_sum"),
            F.expr("sum(q) div count(1)").alias("score_avg"),
        )
    )


def cms_sketch(docs: DataFrame, depth: int = 4, width: int = 64, text_col: str = "text") -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of corpus token
    frequencies: a depth×width BIGINT counter grid as (r, c, cnt) rows
    (nonzero cells only) — counter(r, c) = Σ occurrences of tokens with
    h_r(tok) = c, h_r = md5-derived (deterministic, seeded by the row
    index). Point estimate for any token = min over r of
    counter[r, h_r(tok)] — see `cms_estimate` for the read path.

    The sketch is THE mergeable-summary scale story: per partition the
    reducer state is ≤ depth·width counters regardless of corpus size,
    one map-side-combined shuffle carries ≤ depth·width rows per task,
    and sketches of shards merge by cell-wise addition (integer sums ⇒
    associative ⇒ bit-identical across partitionings and engines, so the
    cells value-oracle exactly — a uniqueness no sampled summary has)."""
    toks = docs.select(F.explode(_norm_tokens(text_col)).alias("tok")).filter(
        F.col("tok") != ""
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("\x1f", F.lit(str(r)), F.col("tok"))), 1, 15
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("c"),
            )
            for r in range(depth)
        ]
    )
    return (
        toks.select(F.explode(arr).alias("x"))
        .select(F.col("x.r").alias("r"), F.col("x.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    docs: DataFrame, probe_k: int = 20, depth: int = 4, width: int = 64, text_col: str = "text"
) -> DataFrame:
    """Count-min read path over `cms_sketch`: for the probe_k most
    frequent tokens (exact top-k, ties token-asc — a deterministic probe
    set), (tok, exact_n, est) where est = min over rows r of the sketch
    cell the token hashes into. CMS guarantees est ≥ exact_n; the suite
    oracle pins the exact estimate values, and the ≥ invariant is
    pytest-checked.

    Scale: the probe set is probe_k rows and the sketch depth·width rows
    — both parameter-bounded, so the probe⋈sketch join broadcasts no
    matter the corpus size; only the exact top-k (already the audited
    vocab_topk shape) touches corpus-sized data."""
    sk = cms_sketch(docs, depth=depth, width=width, text_col=text_col)
    toks = docs.select(F.explode(_norm_tokens(text_col)).alias("tok")).filter(
        F.col("tok") != ""
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("tok").asc())
        .limit(probe_k)
    )
    probes = top.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(F.concat_ws("\x1f", F.lit(str(r)), F.col("tok"))),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("x"),
    ).select("tok", "exact_n", F.col("x.r").alias("r"), F.col("x.c").alias("c"))
    return (
        probes.join(F.broadcast(sk), ["r", "c"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("est"))
    )


def chunk_docs(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document's normalized token
    stream into windows of `chunk_tokens` tokens advancing by
    `chunk_tokens - overlap` (so consecutive chunks share `overlap`
    tokens — the standard training/RAG chunking shape) →
    (doc_id, chunk_id, start_tok, n_toks, chunk_text).

    Semantics pinned for the cross-engine oracle: chunk i starts at
    token i·step (0-based); chunks stop as soon as the window covers
    the final token — ⌈(n-chunk_tokens)/step⌉+1 chunks, so only the
    LAST chunk may be short and no degenerate tail window is emitted;
    a doc with n ≤ chunk_tokens yields exactly one chunk;
    empty/whitespace docs yield none. Offsets are exact integers.

    Scale: scan-local — tokenize, a `sequence`+`explode` bounded by
    ⌈n/step⌉ per doc, and two `slice`/`array_join` projections; no
    shuffle, no Python, whole-stage codegen end to end. Output row
    width is bounded by chunk_tokens, so downstream (embedding,
    packing) partitions stay balanced even when source docs are
    pathologically long — exactly why chunking exists at 100 TB."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("chunk_docs: require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = docs.select(
        "doc_id", _norm_tokens(text_col).alias("__t")
    ).withColumn("__n", F.size("__t")).filter(
        (F.col("__n") > 0) & (F.element_at("__t", 1) != "")
    )
    # chunk count: 1 for n <= chunk_tokens, else 1 + ceil((n - chunk_tokens)/step)
    nchunks = F.when(F.col("__n") <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.expr(f"(__n - {chunk_tokens} + {step} - 1) div {step}")
    )
    out = t.select(
        "doc_id", "__t", "__n",
        F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("chunk_id"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * step).cast("long").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("chunk_id") * step)
        .cast("long")
        .alias("n_toks"),
        F.array_join(
            F.slice(F.col("__t"), F.col("chunk_id") * step + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
    )
    return out


def tfidf_pairs(
    docs: DataFrame,
    df_cap: int = 100,
    min_shared: int = 2,
    scale: int = 1_000_000,
    text_col: str = "text",
    term_ngram: int = 1,
) -> DataFrame:
    """Related-document mining by weighted term overlap (the
    term-at-a-time all-pairs-similarity shape — Elsayed et al. 2008,
    "Pairwise document similarity in large collections with MapReduce"):
    for every unordered doc pair sharing ≥ `min_shared` distinct terms,
    emit (a, b, shared, w_overlap) with w_overlap = Σ_t ⌊scale/df(t)⌋
    over shared terms — the integer-exact idf surrogate (1/df is
    monotone in idf; log would be fp, the bm25_rank precedent). Rare
    shared vocabulary dominates, which is the signal that survives
    paraphrase better than the shingle/winnowing families (clone_pairs
    catches verbatim runs; this catches topical twins).

    Scale: pairs are generated AT the term via the inverted index
    (postings self-join — two hash equi-joins), never all-pairs; terms
    with df > `df_cap` are dropped BEFORE the join, which is
    simultaneously the skew guard (a stop-word's df² pair fan-out never
    happens) and the signal cut (⌊scale/df⌋ → 0 for common terms) —
    the same cap-at-the-center rule as linkpred_scores and the LSH
    mega-bucket guard. Per-doc term SETS (distinct), so repeated words
    don't inflate overlap.

    `term_ngram` sets the term granularity: 1 = single tokens (natural
    corpora), n>1 = word n-gram shingles — the right unit when the
    vocabulary is small relative to the corpus (every unigram becomes a
    stop word and the df cap would empty the index)."""
    if term_ngram <= 1:
        toks = (
            docs.select("doc_id", F.explode(_norm_tokens(text_col)).alias("tok"))
            .filter(F.col("tok") != "")
            .dropDuplicates(["doc_id", "tok"])
        )
    else:
        n = term_ngram
        # materialize the token array BEFORE the gram lambda: an expression
        # referenced inside transform() re-evaluates per element, so using
        # _norm_tokens(text) directly would run the regex normalization
        # len(toks) times per doc — O(len²) (measured 15s → 1s at sf0.1)
        base = docs.select("doc_id", _norm_tokens(text_col).alias("__t"))
        tcol = F.col("__t")
        idx = F.when(F.size(tcol) >= n, F.sequence(F.lit(1), F.size(tcol) - (n - 1))).otherwise(
            F.array().cast("array<int>")
        )
        toks = (
            base.select(
                "doc_id",
                F.explode(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tcol, i, n)))).alias("tok"),
            )
            .filter(F.length("tok") > 0)
            .dropDuplicates(["doc_id", "tok"])
        )
    # materialize the postings once: the df aggregate and BOTH self-join
    # sides reference this subtree, and Catalyst doesn't dedupe it across
    # a self-join — without this the normalize+explode runs 3× (the
    # minhash_candidates precedent; at scale the postings ARE the
    # inverted index the pipeline would persist anyway)
    toks = toks.localCheckpoint(eager=False)
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    rare = dfreq.filter(F.col("df") <= df_cap).select(
        "tok", F.expr(f"CAST({int(scale)} AS BIGINT) div df").alias("w")
    )
    post = toks.join(rare, "tok").localCheckpoint(eager=False)
    pairs = (
        post.select("tok", "w", F.col("doc_id").alias("a"))
        .join(post.select("tok", F.col("doc_id").alias("b")), "tok")
        .filter(F.col("a") < F.col("b"))
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"), F.sum("w").alias("w_overlap"))
        .filter(F.col("shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# PII scrubbing + corpus-level line dedup (CCNet-style)
# ---------------------------------------------------------------------------

# Deterministic patterns shared verbatim with the DuckDB oracle. Both
# engines (Java regex / RE2) agree on these constructs: character
# classes, bounded repetition, \d, and leftmost matching with no
# ambiguous alternation. Replacement order matters (email first, so an
# address's host part can't later be half-eaten by the IP pattern) and
# is mirrored in the SQL.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PII_PHONE = "\\+\\d{1,2}-\\d{3}-\\d{4}"


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Regex PII detection + redaction (emails, IPv4 addresses, phone
    numbers) — the standard pre-training scrub pass. Counts each PII kind
    and redacts occurrences with typed placeholders (<EMAIL>/<IP>/<PHONE>).

    Output: (id, n_email, n_ipv4, n_phone, clean_md5, chars_removed) —
    the redacted text itself is returned as an md5 so the oracle compares
    it exactly without hashing megabytes of strings through the driver.

    100 TB shape: map-only (regexp_count/regexp_replace are JVM-side,
    whole-stage codegen) — no shuffle at all; this pass pipelines into
    whatever scan feeds it."""
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        id_col,
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phone"),
        F.md5(clean).alias("clean_md5"),
        (F.length(t) - F.length(clean)).cast("long").alias("chars_removed"),
    )


def line_dedup_corpus(
    docs: DataFrame, min_docs: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level line deduplication (CCNet, Wenzek et al. 2020): drop
    every line whose exact trimmed content appears in ≥ `min_docs`
    DISTINCT documents (boilerplate: nav bars, cookie banners, footers).
    Unlike repetition_stats (within-doc), the counting here is across the
    corpus, so it needs one global shuffle keyed by the line hash.

    Output: (id, n_lines_in, n_lines_kept, kept_md5) where kept_md5 is
    the md5 of the surviving lines re-joined with \\n in original order
    (docs whose every line is boilerplate keep md5('')).

    100 TB shape: explode lines → groupBy(line md5) countDistinct(doc) is
    map-side-combinable; the join back is an equi-join on the same key so
    Catalyst reuses the shuffle partitioning. Mega-common lines (the
    whole point) are count-only on the build side — no row blow-up — and
    AQE skew-split covers the probe side."""
    lines = (
        docs.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("line", F.trim("line"))
        .filter(F.length("line") > 0)
        .withColumn("lh", F.md5("line"))
    )
    boiler = (
        lines.groupBy("lh")
        .agg(F.countDistinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("lh")
    )
    kept = lines.join(boiler, "lh", "left_anti")
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines_kept"),
        F.md5(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            )
        ).alias("kept_md5"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines_in"))
    return (
        docs.select(id_col)
        .dropDuplicates()
        .join(totals, id_col, "left")
        .join(kept_agg, id_col, "left")
        .fillna(0, ["n_lines_in", "n_lines_kept"])
        .fillna({"kept_md5": "d41d8cd98f00b204e9800998ecf8427e"})
    )


def incremental_dedup(
    index_docs: DataFrame,
    new_docs: DataFrame,
    bands: int = 8,
    band_min: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """Incremental snapshot dedup: admit each NEW doc only if it is not a
    MinHash near-dup of (a) any already-indexed doc or (b) a lower-id doc
    in the same new batch → (doc_id, keep, dup_of, reason) for every new
    doc, reason ∈ {'', 'index', 'batch'}, dup_of = min matching partner.

    This is how a crawl pipeline actually runs dedup at 10^12 docs: the
    indexed corpus is never re-paired against itself (that cost was paid
    when those snapshots landed); each incremental batch costs
    new×index + new×new candidate generation ONLY, both LSH-bucketed
    equi-joins on (band, mh) — Σ bucket_new·bucket_idx ≪ |new|·|index|.
    The within-batch rule is the deterministic keep-min-id ball
    (semdedup_keep's rule): a new doc drops if ANY lower-id batch mate
    agrees on ≥ band_min bands, independent of that mate's own fate —
    order-free, so bit-identical across partitionings and engines.

    Mega-bucket guard: buckets larger than `max_bucket` PER SIDE are
    dropped before pairing (boilerplate signatures would otherwise pair
    quadratically); the index side's signatures are what the pipeline
    persists per snapshot — here they are recomputed from text, the
    store-and-reuse being a sink concern (pipeline.py), not a dedup one.
    """
    sig_i = minhash_signatures(index_docs, bands)
    sig_n = minhash_signatures(new_docs, bands)

    def small(sig: DataFrame) -> DataFrame:
        sized = sig.groupBy("band", "mh").agg(F.count(F.lit(1)).alias("bsz"))
        return sig.join(sized.filter(F.col("bsz") <= max_bucket), ["band", "mh"]).select(
            "doc_id", "band", "mh"
        )
    si, sn = small(sig_i), small(sig_n)

    # new × index candidates: agree on >= band_min bands
    xi = (
        sn.join(si.select(F.col("doc_id").alias("idx_id"), "band", "mh"), ["band", "mh"])
        .dropDuplicates(["doc_id", "idx_id", "band"])
        .groupBy("doc_id", "idx_id")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= band_min)
        .groupBy("doc_id")
        .agg(F.min("idx_id").alias("idx_dup"))
    )
    # new × new candidates against LOWER ids only
    s2 = sn.select(F.col("doc_id").alias("doc_b"), "band", "mh")
    xn = (
        sn.join(s2, ["band", "mh"])
        .filter(F.col("doc_b") < F.col("doc_id"))
        .dropDuplicates(["doc_id", "doc_b", "band"])
        .groupBy("doc_id", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= band_min)
        .groupBy("doc_id")
        .agg(F.min("doc_b").alias("batch_dup"))
    )
    return (
        new_docs.select("doc_id")
        .join(xi, "doc_id", "left")
        .join(xn, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("idx_dup").isNull() & F.col("batch_dup").isNull(), 1)
            .otherwise(0)
            .alias("keep"),
            F.coalesce(
                # an index hit wins the report (the doc already exists)
                F.col("idx_dup").cast("string"),
                F.col("batch_dup").cast("string"),
                F.lit(""),
            ).alias("dup_of"),
            F.when(F.col("idx_dup").isNotNull(), "index")
            .when(F.col("batch_dup").isNotNull(), "batch")
            .otherwise("")
            .alias("reason"),
        )
    )


def freq_spectrum(docs: DataFrame) -> DataFrame:
    """Token frequency-of-frequencies spectrum with Good-Turing
    numerators (Gale & Sampson 1995 simple GT, the vocabulary-analysis /
    smoothing input): → (r, n_r, gt_num) where n_r = |{w : count(w)=r}|
    and gt_num = (r+1)·n_{r+1}, so the GT re-estimate r* = gt_num / n_r
    — the division is left to the consumer, keeping every engine-side
    value an exact BIGINT (the pagerank rule).

    Scale: one (token)-keyed map-side-combined count over the corpus,
    then a count over counts — the spectrum is at most |distinct
    frequencies| rows (≈ log-scale few thousand even at web scale), and
    the n_{r+1} lookup is a self-join on that metadata-sized frame."""
    counts = (
        docs.select(F.explode(_norm_tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    spec = counts.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    nxt = spec.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next"))
    return (
        spec.join(nxt, "r", "left")
        .select(
            "r",
            "n_r",
            ((F.col("r") + 1) * F.coalesce("n_next", F.lit(0))).cast("long").alias("gt_num"),
        )
    )


def encoding_quality(docs, text_col: str = "text", scale: int = 1_000_000):
    """Encoding-quality / mojibake scoring — the crawl-text filter that
    catches mis-decoded pages (CCNet/Gopher-style pipelines drop them
    before any language or quality model sees them): per doc, exact
    counts of

    - ``n_repl``   U+FFFD replacement characters (the decoder gave up),
    - ``n_ctrl``   C0/C1 control characters minus tab/newline/CR — raw
                   bytes or cp1252-as-latin1 mis-decodes land here,
    - ``n_double`` UTF-8 double-encoding digraphs (U+00C3/U+00C2 followed
                   by a Latin-1-supplement continuation: 'Ã©' is 'é'
                   encoded twice, the classic mojibake signature),

    and ``penalty`` = scale·(5·n_repl + 2·n_ctrl + 3·n_double) div
    n_chars (integer division — the pagerank exactness rule; weights
    follow severity: a replacement char proves loss, a digraph only
    suggests it).

    Pure regexp_count/length column algebra: map-only, whole-stage
    codegen, ZERO shuffles at any corpus size; the regex subset
    (character classes with hex escapes, no lookaround) parses
    identically in Java regex and RE2, so the DuckDB mirror runs the
    verbatim same patterns."""
    t = F.col(text_col)
    counted = docs.select(
        "doc_id",
        F.regexp_count(t, F.lit("\uFFFD")).cast("long").alias("n_repl"),
        F.regexp_count(t, F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"))
        .cast("long")
        .alias("n_ctrl"),
        F.regexp_count(t, F.lit(r"[\xc3\xc2][\x80-\xbf\xa0-\xff]"))
        .cast("long")
        .alias("n_double"),
        F.length(t).cast("long").alias("n_chars"),
    )
    return counted.select(
        "doc_id",
        "n_repl",
        "n_ctrl",
        "n_double",
        "n_chars",
        F.when(
            F.col("n_chars") > 0,
            F.expr(
                f"CAST({int(scale)} AS BIGINT)"
                " * (5*n_repl + 2*n_ctrl + 3*n_double) div n_chars"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("penalty"),
    )


def kn_counts(docs: DataFrame) -> DataFrame:
    """Kneser-Ney continuation counts (Kneser & Ney 1995; the quantities
    interpolated-KN smoothing is built from) per vocabulary word →
    (w, c_w, n1plus_left, n1plus_right):

    - ``c_w``            raw unigram count,
    - ``n1plus_left``    N1+(•w) = |{w1 : c(w1 w) > 0}| — the KN
                         lower-order numerator ('how many contexts does
                         w CONTINUE?', the insight that makes KN beat
                         raw-frequency backoff: 'Francisco' is frequent
                         but continues only 'San'),
    - ``n1plus_right``   N1+(w •) = |{w2 : c(w w2) > 0}| — the backoff
                         normalizer.

    The smoothed probability assembles driver/consumer-side from these
    exact BIGINTs (plus |distinct bigrams| = Σ n1plus_right); keeping
    division out keeps the table value-exact cross-engine (the lm_score
    rule). Scale: one bigram distinct (map-side-combined on (w1, w2)),
    two distinct-counts over it, one unigram count — all token-keyed
    shuffles with partial aggregation, nothing per-doc stateful."""
    toks = docs.select("doc_id", _norm_tokens("text").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bg = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .dropDuplicates()
    )
    left = bg.groupBy(F.col("w2").alias("w")).agg(
        F.count(F.lit(1)).alias("n1plus_left")
    )
    right = bg.groupBy(F.col("w1").alias("w")).agg(
        F.count(F.lit(1)).alias("n1plus_right")
    )
    return (
        uni.join(left, "w", "left")
        .join(right, "w", "left")
        .select(
            "w",
            F.col("c_w").cast("long").alias("c_w"),
            F.coalesce("n1plus_left", F.lit(0)).cast("long").alias("n1plus_left"),
            F.coalesce("n1plus_right", F.lit(0)).cast("long").alias("n1plus_right"),
        )
    )


def mixture_plan(
    group_tokens: DataFrame,
    targets: DataFrame,
    budget_tokens: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """Training-data MIXTURE planner: given available tokens per source
    group (`group_tokens`: (grp, n_tokens)) and target mixture shares
    (`targets`: (grp, share_ppm), Σ ≤ 10^6), compute for each group the
    deterministic integer sampling plan toward a `budget_tokens` run →
    (grp, n_tokens, share_ppm, want_tokens, rate_ppm, planned_tokens,
    starved):

      want_tokens    = budget · share ÷ 10^6 (the mixture's ask),
      rate_ppm       = min(10^6, want·10^6 ÷ available) — the per-doc
                       acceptance rate a downstream hash-mod sampler
                       (score_resample's mechanism) applies,
      planned_tokens = available · rate ÷ 10^6 (what the run will get),
      starved        = 1 when available < want (the group can't fill its
                       share without upsampling — the signal mixture
                       designers act on).

    All fixed-point BIGINT (the pagerank rule) so the plan is
    reproducible cross-engine. Scale: `group_tokens` is the output of a
    corpus aggregation (langid/host/domain groups — metadata-sized);
    this op itself is a broadcast join over that metadata. The plan's
    rate_ppm column drives the actual corpus pass (one map-only
    hash-mod filter per doc), keeping planning and execution separate
    exactly like compaction_plan."""
    t = F.broadcast(targets.select("grp", "share_ppm"))
    j = group_tokens.join(t, "grp", "inner")
    want = F.expr(f"CAST({int(budget_tokens)} AS BIGINT) * share_ppm div {int(scale)}")
    out = j.select(
        "grp",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("share_ppm").cast("long").alias("share_ppm"),
        want.cast("long").alias("want_tokens"),
    )
    return out.select(
        "grp",
        "n_tokens",
        "share_ppm",
        "want_tokens",
        F.least(
            F.lit(int(scale)).cast("long"),
            F.expr(f"CAST({int(scale)} AS BIGINT) * want_tokens div n_tokens"),
        ).alias("rate_ppm"),
    ).select(
        "grp",
        "n_tokens",
        "share_ppm",
        "want_tokens",
        "rate_ppm",
        F.expr(f"n_tokens * rate_ppm div {int(scale)}").cast("long").alias("planned_tokens"),
        (F.col("n_tokens") < F.col("want_tokens")).cast("int").alias("starved"),
    )


def allpairs_jaccard(
    docs: DataFrame, n: int = 3, jac_min: int = 60, max_df: int = 50
) -> DataFrame:
    """EXACT all-pairs near-duplicate ground truth via a gram inverted
    index: every document pair sharing at least one (document-frequency
    ≤ max_df) word n-gram is verified with full-gram-set Jaccard and
    kept at jac_pct ≥ jac_min. This is the evaluation/ground-truth tier
    the LSH blocker is *measured against* (blocking_metrics) — the
    production dedup path stays minhash_candidates → ngram_jaccard.

    Completeness: a pair can be missed only if EVERY shared gram has
    df > max_df — i.e. the overlap is pure boilerplate — which is the
    same guard (and the same argument) as minhash_candidates'
    max_bucket. Scale: the candidate self-join is bounded by
    Σ_g df(g)² ≤ max_df · Σ_g df(g) — linear in corpus grams with a
    constant-factor cap, never O(N²) over documents."""
    docs = docs.withColumn("__w", words(F.col("text")))
    w = F.col("__w")
    idx = F.when(F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = (
        docs.select(
            "doc_id",
            F.explode(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))).alias("g"),
        )
        .filter(F.length("g") > 0)
        .distinct()
        # the gram table feeds FOUR consumers (df counts, the pair
        # self-join's two sides, sizes, intersections) — without a
        # checkpoint each re-derives the corpus-wide explode from lineage
        .localCheckpoint(eager=False)
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    keep = grams.join(dfreq.filter(F.col("__df") <= max_df), "g").select("doc_id", "g")
    pairs = (
        keep.alias("a")
        .join(keep.alias("b"), "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), "g")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        pairs.join(ga, "doc_a").join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    scored = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.floor(
                F.col("n_inter") * 100 / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).cast("long").alias("jac_pct"),
        )
    )
    return scored.filter(F.col("jac_pct") >= jac_min)


def containment_pairs(
    docs: DataFrame, n: int = 3, cont_min: int = 80, max_df: int = 50
) -> DataFrame:
    """Directional containment dedup (Broder's containment coefficient
    C(A,B) = |A∩B| / |A|): catches the quote/wrapper/expansion cases
    symmetric Jaccard misses — a short doc fully embedded in a long one
    has tiny Jaccard but containment ≈ 100. Pairs come from the same
    df-capped gram inverted index as allpairs_jaccard; emitted when
    EITHER direction reaches cont_min.

    Output: (doc_a, doc_b, cont_a_pct, cont_b_pct, jac_pct) — cont_a is
    how much of doc_a's gram set lies inside doc_b.

    Scale: identical shape to allpairs_jaccard (candidate self-join
    bounded by Σ df² ≤ max_df·Σ df); the extra columns are free — same
    intersection count, two more integer divisions."""
    docs = docs.withColumn("__w", words(F.col("text")))
    w = F.col("__w")
    idx = F.when(F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = (
        docs.select(
            "doc_id",
            F.explode(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))).alias("g"),
        )
        .filter(F.length("g") > 0)
        .distinct()
        # four consumers below — checkpoint or the explode re-runs per use
        .localCheckpoint(eager=False)
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    keep = grams.join(dfreq.filter(F.col("__df") <= max_df), "g").select("doc_id", "g")
    pairs = (
        keep.alias("a")
        .join(keep.alias("b"), "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), "g")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        pairs.join(ga, "doc_a").join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    scored = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.floor(F.col("n_inter") * 100 / F.col("sz_a")).cast("long").alias("cont_a_pct"),
            F.floor(F.col("n_inter") * 100 / F.col("sz_b")).cast("long").alias("cont_b_pct"),
            F.floor(
                F.col("n_inter") * 100 / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).cast("long").alias("jac_pct"),
        )
    )
    return scored.filter(
        (F.col("cont_a_pct") >= cont_min) | (F.col("cont_b_pct") >= cont_min)
    )


def corpus_card(docs: DataFrame) -> DataFrame:
    """Dataset-card rollup — the per-language corpus report a training-
    data pipeline publishes next to each snapshot (docs, token supply,
    exact-dup rate, quality profile). ONE text scan: the lang-ID,
    quality, token, and dup-hash columns are the same audited
    expressions as lang_id / quality_score / token_counts /
    exact_dup_groups, fused into a single projection so the corpus is
    read once (three separate operator joins would re-scan the text
    column per feature at 100 TB); then one map-side-combined
    per-language aggregation whose reduce side is |languages| rows.

    Output per lang: (lang, n_docs, ws_tokens, dup_docs, quality_sum,
    mean_quality_x100) — all exact BIGINTs (mean = sum·100 div n)."""
    t = F.col("text")
    w = words(t)
    langs = sorted(LANG_STOPWORDS)
    def _score(sw):
        # closure factory, NOT a default-arg lambda: PySpark passes one
        # Column per lambda PARAMETER (a 2-arg lambda means value+index)
        return F.size(F.filter(w, lambda x: F.lower(x).isin(*sw)))

    scores = {lg: _score(sw) for lg, sw in sorted(LANG_STOPWORDS.items())}
    best = F.greatest(*scores.values())
    guess = F.coalesce(*[F.when(scores[lg] == best, F.lit(lg)) for lg in langs])
    lang = F.when(best > 0, guess).otherwise(F.lit("und"))
    n_tok = F.size(w).cast("long")
    n_chars = F.length(t).cast("long")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))).cast("long")
    en = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*en))).cast("long")
    mean_tok_x100 = F.floor(n_chars * 100 / F.greatest(n_tok, F.lit(1))).cast("long")
    punct_x1000 = F.floor(n_punct * 1000 / F.greatest(n_chars, F.lit(1))).cast("long")
    stop_x1000 = F.floor(n_stop * 1000 / F.greatest(n_tok, F.lit(1))).cast("long")
    quality = (
        F.when((n_tok >= 10) & (mean_tok_x100 >= 300) & (mean_tok_x100 <= 1200), 50).otherwise(0)
        + F.when(stop_x1000 > 0, 30).otherwise(0)
        + F.when(punct_x1000 <= 200, 20).otherwise(0)
    ).cast("long")
    per_doc = docs.select(
        lang.alias("lang"),
        n_tok.alias("ws_tokens"),
        quality.alias("q"),
        F.md5(t).alias("h"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("ws_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("dup_docs"),
        F.sum("q").alias("quality_sum"),
        F.expr("sum(q) * 100 div count(1)").alias("mean_quality_x100"),
    )


def keeper_by_quality(clusters: DataFrame, quality: DataFrame) -> DataFrame:
    """Quality-aware dedup keeper selection: near_dup_clusters keeps the
    min doc_id per cluster (deterministic but arbitrary); production
    pipelines keep the BEST duplicate instead (highest quality score —
    the Gopher/CCNet practice). Joins the (doc_id, cluster_id) map with
    (doc_id, quality) and re-elects each cluster's keeper by
    (quality DESC, doc_id ASC).

    Output: (doc_id, cluster_id, quality, is_keeper).

    Scale: one doc-keyed hash join + one cluster-keyed argmax window
    whose per-key group is the cluster size (near-dup clusters are
    small by construction — mega-clusters were already capped by the
    LSH max_bucket guard upstream)."""
    from pyspark.sql import Window

    j = clusters.select("doc_id", "cluster_id").join(
        quality.select("doc_id", "quality"), "doc_id", "inner"
    )
    win = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return j.withColumn(
        "is_keeper",
        F.when(F.row_number().over(win) == 1, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    max_vocab_rows: int = 10_000_000,
) -> DataFrame:
    """Full BPE merge-rule training (Sennrich et al., ACL 2016 — the
    tokenizer-training loop itself, not just one pair count): learn the
    ordered merge table over the corpus. Two-phase, the same split every
    production BPE trainer (HuggingFace tokenizers, SentencePiece) uses:

    - **Phase 1 (corpus-sized, ONE distributed shuffle)**: word-frequency
      table. After this the corpus is never touched again — 100 TB of
      text collapses to a vocabulary-sized (word, freq) table (low
      millions of rows for web text; Heaps' law, not corpus size).
    - **Phase 2 (vocab-sized, DRIVER-LOCAL)**: the sequential merge loop
      runs as plain Python over the collected vocab with incremental
      pair-count maintenance — an inverted index pair→{words containing
      it} means each merge touches only the words it occurs in, not the
      whole vocab. Zero Spark jobs inside the loop: n_merges=32k is
      32k dict updates, not 32k scheduled rounds + checkpointed plans
      (the r3 scale flag this rewrite closes). Merge apply is the same
      left-to-right greedy non-overlapping fold as before.

    The driver-side collect is vocab-bounded and guarded: more than
    `max_vocab_rows` distinct words raises with instructions to
    pre-truncate (frequency-floor the tail — standard practice: hapax
    words can't win a merge against any pair occurring ≥2 times, and a
    min_count floor is what production trainers apply anyway).

    Deterministic end-to-end (integer counts, total tiebreak
    count DESC, pair ASC) — verified against an independent pure-Python
    mirror by differential fuzz; no SQL oracle (iterative argmax is not
    SQL-expressible; the suite entry is rows-only like extract_corpus).

    → merges DataFrame (rank, left, right, pair_count), rank 1-based in
    merge order."""
    from collections import Counter, defaultdict

    words = (
        docs.select(
            F.explode(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "),
                            r" +",
                            " ",
                        )
                    ),
                    " ",
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    n_vocab = words.count()
    if n_vocab > max_vocab_rows:
        raise ValueError(
            f"bpe_train: {n_vocab} distinct words exceeds max_vocab_rows="
            f"{max_vocab_rows}. Apply a frequency floor first (e.g. drop "
            "freq==1 hapax words — they cannot win a merge over any pair "
            "occurring twice) or raise max_vocab_rows if driver memory "
            "allows (~100 bytes/word)."
        )

    # deterministic driver-local state: word id → (symbol tuple, freq)
    rows = words.collect()
    syms: list[list] = [list(r["word"]) + ["</w>"] for r in rows]
    freqs: list[int] = [int(r["freq"]) for r in rows]

    def _pairs_of(s):
        return zip(s, s[1:])

    pair_counts: Counter = Counter()
    index: defaultdict = defaultdict(set)  # pair -> word ids containing it
    for wid, s in enumerate(syms):
        f = freqs[wid]
        for p in _pairs_of(s):
            pair_counts[p] += f
            index[p].add(wid)

    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        live = [(p, n) for p, n in pair_counts.items() if n > 0]
        if not live:
            break
        (a, b), n = min(live, key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, int(n)))
        ab = a + b
        touched = sorted(index.get((a, b), ()))
        for wid in touched:
            s, f = syms[wid], freqs[wid]
            # retract this word's old pair contributions
            for p in _pairs_of(s):
                pair_counts[p] -= f
                idx = index[p]
                idx.discard(wid)
            # greedy left-to-right non-overlapping apply
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wid] = out
            for p in _pairs_of(out):
                pair_counts[p] += f
                index[p].add(wid)
        pair_counts.pop((a, b), None)
        index.pop((a, b), None)

    return docs.sparkSession.createDataFrame(
        merges or [(0, "", "", 0)][0:0],
        "rank int, left string, right string, pair_count long",
    )


def readability(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Flesch-Kincaid readability in exact integer ppm — the classic
    quality-filter feature (Kincaid 1975; a heuristic gate in
    C4/CCNet-style pipeline configs):

        grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    computed entirely in scan-local column algebra with the
    engine-portable integer recipe: sentences = count of ``[.!?]+``
    runs (min 1), words = whitespace tokens (min 1), syllables = per
    word the count of ``[aeiouy]+`` vowel groups in lowercase (min 1 —
    'rhythm'-class words still syllabify), and

        grade_ppm = 390000·W div S + 11800000·Y div W − 15590000.

    The vowel-group syllable counter is the documented approximation
    every streaming implementation uses (CMU-dict lookups don't fit a
    scan); both engines run the same RE2/Java-common regexes, so the
    oracle is exact. Map-only — no shuffle, no Python."""
    text = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(text), F.lit("[^ \\t\\n]+"), F.lit(0))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(
            F.size(F.regexp_extract_all(text, F.lit("[.!?]+"), F.lit(0))), F.lit(1)
        ).cast("long").alias("n_sentences"),
        F.greatest(F.size(toks), F.lit(1)).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(
                toks,
                lambda t: F.greatest(
                    F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0))), F.lit(1)
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_syllables"),
    )
    return base.withColumn(
        "fk_grade_ppm",
        F.expr(
            "CAST(390000 * n_words AS BIGINT) div n_sentences"
            " + CAST(11800000 * n_syllables AS BIGINT) div n_words - 15590000"
        ),
    )


def compression_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """zlib compressibility quality signal (the Gopher / RefinedWeb
    family's cheap repetition proxy: machine-generated and boilerplate
    text compresses far better than natural prose) → (doc_id, n_bytes,
    n_compressed, ratio_x1000) with ratio_x1000 = 1000·compressed div
    max(raw, 1) — LOW ratios flag spammy repetition, ratios near/above
    1000 flag high-entropy junk (base64 blobs, minified bundles).

    This is the package's one deliberately Python-loop operator besides
    parsing and stub-decode: zlib is not SQL-expressible, so it runs as
    Arrow-batched mapInPandas (the extract.py discipline — never
    row-at-a-time F.udf), map-only, no shuffle; at 100 TB it is
    embarrassingly parallel and CPU-bound exactly like the parse stage.
    Determinism: zlib.compress at a FIXED level (6) is deterministic for
    a given zlib build (container-pinned); verified by a differential
    test against direct zlib, not a cross-engine SQL oracle."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("n_compressed", T.LongType(), False),
            T.StructField("ratio_x1000", T.LongType(), False),
        ]
    )

    def run(batches):
        import zlib

        for pdf in batches:
            raw = [
                ("" if t is None else str(t)).encode("utf-8")
                for t in pdf[text_col]
            ]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio_x1000": [
                        (1000 * c) // b if b > 0 else 1000 * c
                        for b, c in zip(nb, nc)
                    ],
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, schema=out_schema)

def sentence_spans(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic sentence segmentation with token-offset spans →
    (doc_id, sent_id, start_tok, n_toks, n_chars, sent). The span table
    is the substrate for sentence-level pipelines (bitext mining feeds
    on sentences, not documents; sentence-dedup and quality filters in
    the CCNet/ROOTS family likewise), so the segmenter must be pinned,
    not "smart": a sentence boundary is a run of [.!?] followed by
    whitespace. That rule is regex-portable (no lookbehind — RE2 engines
    lack it), reproducible, and — like all segmenters — approximate on
    abbreviations, which downstream consumers tolerate by construction.

    Pinned semantics for the cross-engine oracle: the terminator run
    stays with its sentence; pieces are trimmed; empty pieces are
    dropped BEFORE numbering, so sent_id is 1-based and contiguous;
    n_chars counts the trimmed sentence; n_toks counts the sentence's
    normalized tokens (the corpus-wide `_norm_tokens` normalization —
    a sentence of pure punctuation has n_toks = 0 but keeps its row);
    start_tok is the prefix sum of earlier sentences' n_toks, i.e. the
    sentence's offset in the document's normalized token stream.

    Scale shape: entirely scan-local — split, per-element trim/filter,
    and an `aggregate` prefix sum over the sentence array, then ONE
    posexplode; no shuffle, no window, no Python. The prefix sum rides
    the array (not a doc-partitioned window) precisely so a 100x corpus
    adds map parallelism with zero exchange; intermediate arrays are
    bound to columns stage-by-stage (the transform-lambda re-evaluation
    trap documented at tfidf_pairs)."""
    sentinel = "\x1e"
    pieces = F.split(
        F.regexp_replace(F.col(text_col), r"([.!?]+)[ \t\n\r]+", "$1" + sentinel),
        sentinel,
    )
    staged = (
        docs.select(F.col(id_col).alias("doc_id"), pieces.alias("__p"))
        .select(
            "doc_id",
            F.expr("filter(transform(__p, x -> trim(x)), x -> x <> '')").alias("__s"),
        )
        .filter(F.size("__s") > 0)
        .select(
            "doc_id",
            "__s",
            F.expr(
                "transform(__s, s -> size(filter(split(trim(regexp_replace("
                "regexp_replace(lower(s), '[^a-z0-9 ]', ' '), ' +', ' ')), ' '), "
                "t -> t <> '')))"
            ).alias("__nt"),
        )
        .select(
            "doc_id",
            "__s",
            "__nt",
            F.expr(
                "aggregate(__nt, array(CAST(0 AS BIGINT)), "
                "(acc, x) -> concat(acc, array(element_at(acc, -1) + x)))"
            ).alias("__off"),
        )
    )
    return staged.select(
        "doc_id", F.posexplode("__s").alias("__i", "sent"), "__nt", "__off"
    ).select(
        "doc_id",
        (F.col("__i") + 1).cast("long").alias("sent_id"),
        F.element_at("__off", F.col("__i") + 1).cast("long").alias("start_tok"),
        F.element_at("__nt", F.col("__i") + 1).cast("long").alias("n_toks"),
        F.length("sent").cast("long").alias("n_chars"),
        "sent",
    )


#: pinned soft-404 phrase battery (portable subset: plain alternation,
#: case handled by lower() — the rules both engines parse identically)
SOFT404_PATTERNS = (
    "page not found|not be found|error 404|404 error|404 not found|"
    "does not exist|no longer available|has been removed|temporarily unavailable"
)


def soft404_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Soft-404 / error-page detection (crawl hygiene: servers that
    answer 200 with a 'page not found' body poison both the link graph
    and the training corpus — Bar-Yossef et al. WWW'04 'Sic transit
    gloria telae' made the case; every production crawler carries a
    phrase battery like this): exact counts of the pinned error phrases
    over the lowercased body, flagged when the signal is strong
    (≥ 2 hits) or a weak page says it (≥ 1 hit on a < 50-token body —
    real articles MENTIONING 404s are long, error pages are short).

    → (doc_id, n_hits, n_toks, is_soft404). Map-only regexp_count +
    token-count algebra, zero shuffles at any crawl size; the DuckDB
    oracle runs the verbatim same pattern."""
    toks = F.filter(_norm_tokens(text_col), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.regexp_count(F.lower(F.col(text_col)), F.lit(SOFT404_PATTERNS)).alias("n_hits"),
        F.size(toks).cast("long").alias("n_toks"),
    ).select(
        "doc_id", "n_hits", "n_toks",
        ((F.col("n_hits") >= 2) | ((F.col("n_hits") >= 1) & (F.col("n_toks") < 50)))
        .alias("is_soft404"),
    )


def build_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Positional inverted index (the IR substrate under bm25_rank /
    winnow / phrase queries, materialized as a first-class table the way
    a search tier stores it): one row per (term, doc) with term
    frequency and the 1-based positions of the term in the document's
    NORMALIZED token stream (the corpus-wide `_norm_tokens` pinning —
    the same coordinates chunk_docs / sentence_spans emit, so spans and
    postings compose). Positions serialize as a sorted CSV string
    (`pos_csv`) — cross-engine array stringification differs, CSV text
    does not.

    → (term, doc_id, tf, pos_csv). Scale shape: tokenize + posexplode
    is scan-local; the ONLY shuffle is the (term, doc)-keyed aggregate,
    map-side combined — stop-word skew is bounded because the key
    includes doc_id (the vocab_topk cell argument). Per-term df / idf
    stats are one further term-keyed agg downstream (bm25_rank owns
    that)."""
    t = (
        docs.select("doc_id", _norm_tokens(text_col).alias("__t"))
        .filter((F.size("__t") > 0) & (F.element_at("__t", 1) != ""))
        .select("doc_id", F.posexplode("__t").alias("__i", "term"))
        .filter(F.col("term") != "")
    )
    return (
        t.groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_join(F.array_sort(F.collect_list(F.col("__i") + 1)), ",").alias("pos_csv"),
        )
        .select("term", "doc_id", F.col("tf").cast("long").alias("tf"), "pos_csv")
    )


def phrase_search(
    docs: DataFrame, phrase: list, text_col: str = "text"
) -> DataFrame:
    """Exact phrase search over the positional index (the classic
    adjacency chain: an occurrence of 'w₀ w₁ … wₖ' is a position p of w₀
    with p+1 ∈ positions(w₁), p+2 ∈ positions(w₂), … — Manning/IR ch.2):
    per-word position sets meet in k doc-keyed hash joins, and the
    adjacency test is array algebra (shift + intersect), so the corpus
    text is NEVER rescanned per query — the postings are index-sized,
    which is the entire point of positional indexes at 100 TB.

    `phrase` must be ≥ 2 already-normalized tokens (lowercase alnum —
    the `_norm_tokens` alphabet; checked). Returns (doc_id,
    n_occurrences) for documents containing the phrase at least once,
    n_occurrences = number of distinct start positions."""
    if len(phrase) < 2 or any(not w or not w.isalnum() or w != w.lower() for w in phrase):
        raise ValueError("phrase_search: need >= 2 normalized lowercase tokens")
    tok = (
        docs.select("doc_id", _norm_tokens(text_col).alias("__t"))
        .filter((F.size("__t") > 0) & (F.element_at("__t", 1) != ""))
        .select("doc_id", F.posexplode("__t").alias("__i", "term"))
        .filter(F.col("term").isin(*set(phrase)))
    )
    base = None
    for k, w in enumerate(phrase):
        pk = (
            tok.filter(F.col("term") == w)
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.col("__i") + 1)).alias(f"__p{k}"))
        )
        base = pk if base is None else base.join(pk, "doc_id")
    m = F.col("__p0")
    for k in range(1, len(phrase)):
        m = F.array_intersect(F.transform(m, lambda x: x + 1), F.col(f"__p{k}"))
    return (
        base.select("doc_id", F.size(m).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 1)
    )


def cluster_aware_split(
    docs: DataFrame,
    splits=(("train", 8), ("val", 1), ("test", 1)),
    **cluster_kwargs,
) -> DataFrame:
    """Leak-free train/val/test assignment: split by the NEAR-DUP
    CLUSTER, not the document — a near-duplicate pair straddling
    train/test is benchmark leakage by construction (the Lee et al.
    dedup paper's eval argument), and per-doc hashing guarantees
    exactly that for every dup pair. Composes the audited
    `near_dup_clusters` pipeline with `hash_split` keyed on cluster_id,
    so every member of a cluster inherits one split.

    → (doc_id, cluster_id, split). Adds ONE map-only hash over the
    cluster column to the dedup pipeline's audited cost."""
    from .sketches import hash_split

    clusters = near_dup_clusters(docs, **cluster_kwargs)
    return hash_split(clusters, "cluster_id", splits=splits).select(
        "doc_id", "cluster_id", "split"
    )


def filter_funnel(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-filter funnel report (pipeline observability: which
    filter kills how many docs, MARGINALLY, in cascade order — the
    number a corpus curator actually reads; per-filter totals
    double-count docs that fail several filters): four pinned stages
    over ONE fused text scan (the corpus_card rule — k operator joins
    would rescan text k times at 100 TB):

        1 min_tokens    — ≥ 10 normalized tokens (drops e.g. non-Latin
                          docs under the a-z normalization — a visible,
                          pinned consequence, not a bug)
        2 max_chars     — ≤ 20,000 chars
        3 no_mojibake   — zero U+FFFD replacement chars
        4 digit_ratio   — digits ≤ 25% of chars

    → (stage, name, n_in, n_killed, n_out) per stage, cumulative. The
    whole report is one map-side-combined aggregate + a constant-width
    melt (Generate, no joins)."""
    toks = F.filter(_norm_tokens(text_col), lambda t: t != "")
    n_chars = F.length(text_col)
    digits = n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    f1 = F.size(toks) >= 10
    f2 = n_chars <= 20000
    f3 = F.instr(F.col(text_col), "�") == 0
    f4 = digits * 4 <= n_chars
    agg = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(f1.cast("long")).alias("s1"),
        F.sum((f1 & f2).cast("long")).alias("s2"),
        F.sum((f1 & f2 & f3).cast("long")).alias("s3"),
        F.sum((f1 & f2 & f3 & f4).cast("long")).alias("s4"),
    )
    names = ["min_tokens", "max_chars", "no_mojibake", "digit_ratio"]
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("int").alias("stage"),
                F.lit(nm).alias("name"),
                F.col("n" if i == 0 else f"s{i}").alias("n_in"),
                (F.col("n" if i == 0 else f"s{i}") - F.col(f"s{i + 1}")).alias("n_killed"),
                F.col(f"s{i + 1}").alias("n_out"),
            )
            for i, nm in enumerate(names)
        ]
    )
    return agg.select(F.explode(stages).alias("r")).select(
        "r.stage", "r.name",
        F.col("r.n_in").cast("long").alias("n_in"),
        F.col("r.n_killed").cast("long").alias("n_killed"),
        F.col("r.n_out").cast("long").alias("n_out"),
    )


def rrf_fuse(runs: DataFrame, k: int = 60, scale: int = 1_000_000) -> DataFrame:
    """Reciprocal-rank fusion (Cormack-Clarke-Büttcher SIGIR'09 — the
    standard hybrid-retrieval combiner: fuse a lexical run (bm25_rank)
    with a vector run (ann_*) WITHOUT score calibration, since only
    RANKS enter): fused score = Σ_runs scale div (k + rank), k = 60 per
    the paper; integer division keeps every score an exact BIGINT (the
    lm_score/bm25 rule — float 1/(k+r) sums drift by addition order).

    Input (run, doc_id, rank) for ONE query (callers with many queries
    add their query column to the grouping — noted so the single-query
    shape stays oracle-readable); returns every fused doc as
    (doc_id, n_runs, rrf_score, fused_rank), fused_rank by
    (score desc, doc_id asc) — deterministic under ties, which RRF
    produces freely on disjoint run tails.

    Scale shape: the input is query-result-sized (runs × top-k rows),
    so the doc-keyed agg and the rank window are metadata-sized by
    construction — fusion is never a corpus operation; that is exactly
    why retrieval stacks fuse ranks instead of re-scoring."""
    from pyspark.sql.window import Window

    scored = runs.select(
        "run", "doc_id", F.expr(f"{scale} div ({k} + rank)").alias("c")
    )
    agg = scored.groupBy("doc_id").agg(
        F.countDistinct("run").cast("long").alias("n_runs"),
        F.sum("c").alias("rrf_score"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return agg.select(
        "doc_id", "n_runs", "rrf_score", F.row_number().over(w).cast("int").alias("fused_rank")
    )


def dup_span_extents(docs: DataFrame, w: int = 8) -> DataFrame:
    """Maximal duplicated-span extents — the cut list the Lee et al.
    suffix-array dedup actually emits (their tool outputs byte ranges to
    REMOVE, not just per-doc ratios like `span_dedup`): corpus-wide
    duplicated w-token windows, merged per document into maximal token
    intervals via gaps-and-islands. Two duplicated windows join one
    island when their starts differ by ≤ w (overlap or exact adjacency
    ⇒ the covered text is contiguous). Returns one row per maximal
    extent: (doc_id, span_start, span_end, n_dup_windows) with 1-based
    inclusive token positions.

    Scale shape: window hashing is map-side (same explode as
    span_dedup); the corpus-sized shuffles are the hash-count groupBy
    (map-side combined) and the hash join back; island numbering is a
    window PARTITIONED BY doc_id — per-doc state, bounded by document
    length, never a corpus-ordered scan."""
    from pyspark.sql.window import Window

    toks = docs.select("doc_id", words(F.col("text")).alias("__t"))
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(__t) >= {w} THEN "
                f"transform(sequence(1, size(__t) - {w - 1}, 1), "
                f"i -> md5(array_join(slice(__t, i, {w}), ' '))) "
                f"ELSE array() END"
            ).cast("array<string>")
        ).alias("p", "h"),
    ).select("doc_id", (F.col("p") + 1).alias("i"), "h")
    hot = (
        wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)
    )
    pos = wins.join(hot.select("h"), "h").select("doc_id", "i")
    wspec = Window.partitionBy("doc_id").orderBy("i")
    brk = F.when(
        F.lag("i").over(wspec).isNull() | ((F.col("i") - F.lag("i").over(wspec)) > w),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = pos.select("doc_id", "i", F.sum(brk).over(wspec).alias("isl"))
    return islands.groupBy("doc_id", "isl").agg(
        F.min("i").cast("long").alias("span_start"),
        (F.max("i") + F.lit(w - 1)).cast("long").alias("span_end"),
        F.count(F.lit(1)).alias("n_dup_windows"),
    ).select("doc_id", "span_start", "span_end", "n_dup_windows")


def sentence_langs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-SENTENCE language ID over the pinned segmenter → (doc_id,
    sent_id, lang_guess, top_hits): `lang_id`'s stopword-ratio vote
    applied to each `sentence_spans` sentence instead of the whole
    document. Document-level language ID silently mislabels
    code-switched pages (boilerplate in one language wrapping content
    in another — navigation chrome, quoted sources, bilingual product
    pages), and multilingual corpus curation (the CCNet recipe) splits
    by SEGMENT language for exactly that reason.

    Same pinned vote as lang_id: hits = sentence tokens in each
    language's stopword list, winner = max hits with alphabetical
    tie-break, zero hits → 'und' (short/technical sentences abstain
    rather than guess).

    Scale shape: sentence_spans is scan-local (no shuffle — the prefix
    sum rides the sentence array) and the vote is per-row array
    algebra, so the whole operator is map-only whole-stage codegen."""
    sp = sentence_spans(docs, text_col=text_col, id_col=id_col).select(
        "doc_id", "sent_id", "sent"
    )
    w = words(F.col("sent"))
    langs = sorted(LANG_STOPWORDS)

    def hits(sw):
        # closure factory: a default-arg lambda would read as 2-parameter
        # to F.filter's arity probe and receive the element INDEX
        return F.size(F.filter(w, lambda x: F.lower(x).isin(*sw)))

    scores = [
        hits(sw).alias(f"s_{lg}") for lg, sw in sorted(LANG_STOPWORDS.items())
    ]
    d = sp.select("doc_id", "sent_id", *scores)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    guess = F.coalesce(*[F.when(F.col(f"s_{lg}") == best, F.lit(lg)) for lg in langs])
    return d.select(
        "doc_id",
        "sent_id",
        F.when(best > 0, guess).otherwise(F.lit("und")).alias("lang_guess"),
        best.cast("long").alias("top_hits"),
    )


def code_switch_report(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document-level code-switching summary over `sentence_langs` →
    (doc_id, n_sents, n_langs, dom_lang, dom_sents, switched): among
    sentences with a CONFIDENT vote (lang ≠ 'und'), the count, the
    distinct-language count, the dominant language (most sentences,
    alphabetical tie-break — pinned), its sentence count, and
    switched = 1 iff ≥ 2 languages appear. Docs whose every sentence
    abstained emit no row (nothing to report — same absent-row rule as
    lm_score on short docs).

    The `switched` flag is the routing bit: monolingual docs flow to
    their language's pipeline, switched docs to segment-level handling
    (per-sentence splits, or exclusion for monolingual training mixes).

    Scale shape: map-only sentence voting + per-(doc, lang) count +
    per-doc fold — two map-side-combined aggs sharing the doc_id key,
    reduce state ≤ |languages| rows per doc, no joins, no windows."""
    sl = sentence_langs(docs, text_col=text_col, id_col=id_col).filter(
        F.col("lang_guess") != "und"
    )
    per_lang = sl.groupBy("doc_id", "lang_guess").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_lang.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_sents"),
            F.count(F.lit(1)).alias("n_langs"),
            F.expr("min_by(lang_guess, struct(-cnt, lang_guess))").alias("dom_lang"),
            F.max("cnt").alias("dom_sents"),
        )
        .select(
            "doc_id",
            F.col("n_sents").cast("long").alias("n_sents"),
            F.col("n_langs").cast("long").alias("n_langs"),
            "dom_lang",
            F.col("dom_sents").cast("long").alias("dom_sents"),
            F.when(F.col("n_langs") > 1, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("switched"),
        )
    )


def cdc_chunks(
    docs: DataFrame,
    w: int = 4,
    mod: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the LBFS/rsync/FastCDC anchor trick,
    Muthitacharoen et al. SOSP'01 — chunk boundaries from the CONTENT,
    not from fixed offsets, so an insertion early in a document shifts
    only the chunk it lands in: every later boundary re-aligns and
    those chunks keep their hashes, which is what makes chunk-level
    storage dedup work across near-identical crawls of the same page):
    a boundary opens before token i (i ≥ 2) iff the w-token window
    starting at i hashes to 0 mod `mod` — expected chunk length ≈ mod
    tokens. Gear/Rabin rolling hashes are a streaming-cost trick; the
    pinned equivalent here is the corpus-wide md5 w-gram hash (the
    `fingerprint`/`winnow` anchor discipline) — same boundaries, exact
    cross-engine mirror.

    Output: (doc_id, chunk_ix, start_tok, end_tok, n_toks, chunk_hash)
    with 1-based inclusive token coordinates in the corpus-normalized
    `_norm_tokens` stream (the postings/sentence-spans coordinate
    system) and chunk_hash = md5 of the chunk's space-joined tokens.
    Docs shorter than w tokens form one chunk. `dup_extents` reports
    duplicated REGIONS for cutting; cdc_chunks partitions EVERY token
    into stable-identity units for chunk-store dedup — the two compose
    (dedup the store, then cut what remains duplicated).

    Scale shape: entirely scan-local — anchor positions, boundary
    arrays, and per-chunk hashes all ride the token array (filter/
    transform/slice algebra), then ONE posexplode; no shuffle, no
    window, no Python. Downstream chunk-store dedup is one
    chunk_hash-keyed map-side-combined agg."""
    if w < 1:
        raise ValueError("cdc_chunks: w must be >= 1")
    if mod < 1:
        raise ValueError("cdc_chunks: mod must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _norm_tokens(text_col).alias("__t")
    )
    n = "size(__t)"
    gram = f"concat_ws(' ', slice(__t, i, {int(w)}))"
    anchor = (
        f"CAST(conv(substring(md5({gram}), 1, 15), 16, 10) AS BIGINT)"
        f" % {int(mod)} = 0"
    )
    staged = toks.select(
        "doc_id",
        "__t",
        # boundary candidates: window starts 2..n-w+1 (Spark sequence
        # DESCENDS when stop < start, so short docs need the guard)
        F.expr(
            f"concat(array(1), CASE WHEN {n} - {int(w)} + 1 >= 2 THEN "
            f"filter(sequence(2, {n} - {int(w)} + 1), i -> {anchor}) "
            "ELSE array() END)"
        ).alias("__b"),
    )
    # materialization barrier BEFORE the explode: GenerateExec re-evaluates
    # the generator's child expression per OUTPUT row, so posexplode over
    # the raw __b expression re-runs the O(n·w) md5 anchor sweep once per
    # CHUNK (measured 11.3s -> 0.14s at sf0.1 with the barrier; a plain
    # Project restructure does not help — CollapseProject re-inlines it).
    # localCheckpoint is a local materialization, NOT a shuffle: the
    # operator stays exchange-free (plan: ExistingRDD -> Generate).
    staged = staged.localCheckpoint(eager=False)
    ex = staged.select(
        "doc_id", "__t", "__b", F.posexplode("__b").alias("__i", "start_tok")
    )
    end = (
        "CASE WHEN __i + 2 <= size(__b) THEN element_at(__b, __i + 2) - 1"
        f" ELSE {n} END"
    )
    return ex.select(
        "doc_id",
        (F.col("__i") + 1).cast("long").alias("chunk_ix"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.expr(end).cast("long").alias("end_tok"),
        (F.expr(end) - F.col("start_tok") + 1).cast("long").alias("n_toks"),
        F.md5(
            F.expr(f"concat_ws(' ', slice(__t, start_tok, ({end}) - start_tok + 1))")
        ).alias("chunk_hash"),
    )


#: license-signal regexes (family -> pattern over the LOWERCASED body),
#: each portable across Java regex and RE2 (no lookaround, no backrefs).
#: Flags are independent hits; `license_flags` applies the precedence.
LICENSE_SIGNALS = [
    ("cc_by", r"creativecommons\.org/licenses/|creative commons attribution"),
    ("cc_nc", r"by-nc|noncommercial|non-commercial"),
    ("cc_nd", r"by-nc-nd|by-nd|noderiv"),
    ("cc_sa", r"by-nc-sa|by-sa|sharealike|share-alike"),
    ("cc0", r"creativecommons\.org/publicdomain/zero|\bcc0\b|public domain dedication"),
    ("mit", r"\bmit license\b|licensed under the mit"),
    ("apache", r"apache license,? version 2|apache-2\.0"),
    ("gpl", r"gnu (lesser general|general) public license|\bl?gplv?[23]\b"),
    ("arr", r"all rights reserved"),
]


def license_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """License / usage-rights detection (training-data governance: the
    C4/ROOTS-era audits and the licensed-corpus efforts all start from
    exactly this — which pages DECLARE terms, before any legal
    interpretation): the pinned `LICENSE_SIGNALS` battery over the
    lowercased body — Creative Commons license URLs + phrase forms
    (attribution / noncommercial / noderivatives / sharealike axes kept
    as separate flags, since the CC suite is combinatorial), CC0/public-
    domain dedications, MIT / Apache-2.0 / GPL declarations, and the
    'all rights reserved' notice.

    → (doc_id, cc_by, cc_nc, cc_nd, cc_sa, cc0, mit, apache, gpl, arr,
    n_signals, license_guess): one 0/1 flag per signal (independent
    pattern hits — a page quoting two licenses keeps both flags; the
    CONFLICT is the governance signal), their sum, and a pinned
    most-specific-first precedence guess (nc+nd → cc-by-nc-nd, …,
    plain attribution → cc-by, then cc0, mit, apache-2.0, gpl,
    all-rights-reserved, else NULL — pages declaring nothing stay
    NULL rather than guessing 'unlicensed').

    Scale shape: map-only rlike algebra over one scan, zero shuffles at
    any crawl size; the DuckDB oracle runs the verbatim same patterns."""
    lo = F.lower(F.col(text_col))
    flags = [
        lo.rlike(pat).cast("int").alias(name) for name, pat in LICENSE_SIGNALS
    ]
    d = docs.select("doc_id", *flags)
    c = F.col
    guess = (
        F.when((c("cc_nc") == 1) & (c("cc_nd") == 1), "cc-by-nc-nd")
        .when((c("cc_nc") == 1) & (c("cc_sa") == 1), "cc-by-nc-sa")
        .when(c("cc_nc") == 1, "cc-by-nc")
        .when(c("cc_nd") == 1, "cc-by-nd")
        .when(c("cc_sa") == 1, "cc-by-sa")
        .when(c("cc_by") == 1, "cc-by")
        .when(c("cc0") == 1, "cc0")
        .when(c("mit") == 1, "mit")
        .when(c("apache") == 1, "apache-2.0")
        .when(c("gpl") == 1, "gpl")
        .when(c("arr") == 1, "all-rights-reserved")
    )
    total = None
    for name, _ in LICENSE_SIGNALS:
        total = c(name) if total is None else total + c(name)
    return d.select(
        "doc_id",
        *[name for name, _ in LICENSE_SIGNALS],
        total.cast("long").alias("n_signals"),
        guess.alias("license_guess"),
    )


def distinctive_terms(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """Per-group distinctive vocabulary by smoothed odds ratio (the
    Monroe-Colaresi-Quinn "Fightin' Words" family, taken at its
    integer-exact member: log-odds z-scoring needs floats, the RAW
    smoothed odds ratio does not, and the per-group RANKING — which is
    what the corpus card displays — is what both share): for token t
    in group g vs the rest of the corpus,

        or_x1e6 = 10⁶·(a·d) div (b·c)
        a = cnt(t,g)+1, b = total(g)−cnt(t,g)+1,
        c = cnt(t,¬g)+1, d = total(¬g)−cnt(t,¬g)+1   (+1 Haldane
        smoothing — zero-count-safe in every cell),

    keeping each group's top-`k` (or desc, token asc — pinned) among
    tokens with cnt(t,g) ≥ `min_count`. Output (grp, token, n_in,
    or_x1e6, rank).

    Scale shape: ONE (group, token) map-side-combined count, corpus
    totals derived from it by two tiny re-aggs (|vocab| and |groups|
    rows) joined back on their keys, and a per-group top-k window over
    the |group × vocab| cell table — catalog-sized, not corpus-sized.
    64-bit bound: a·d·10⁶ needs total(¬g) ≲ 9·10⁹ tokens per shard;
    beyond that pre-partition the audit (stated, the changepoint
    rule)."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(words(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    cell = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("n"))
    gtot = cell.groupBy("grp").agg(F.sum("n").alias("gt"))
    ttot = cell.groupBy("token").agg(F.sum("n").alias("tt"))
    alltot = cell.agg(F.sum("n").alias("at"))
    scored = (
        cell.join(gtot, "grp").join(ttot, "token").crossJoin(F.broadcast(alltot))
        .filter(F.col("n") >= min_count)
        .withColumn("a", F.col("n") + 1)
        .withColumn("b", F.col("gt") - F.col("n") + 1)
        .withColumn("c", F.col("tt") - F.col("n") + 1)
        .withColumn("d", F.col("at") - F.col("gt") - F.col("tt") + F.col("n") + 1)
        .withColumn("or_x1e6", F.expr("1000000 * a * d div (b * c)").cast("long"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("or_x1e6").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "grp", "token", F.col("n").cast("long").alias("n_in"),
            "or_x1e6", F.col("rank").cast("int").alias("rank"),
        )
    )


def burstiness(
    docs: DataFrame, text_col: str = "text", min_total: int = 50
) -> DataFrame:
    """Token burstiness via the Fano factor (Church & Gale 1995 —
    content words BURST: their per-document counts are overdispersed
    vs Poisson, while function words spread evenly; a vocabulary
    triage that needs no stopword list): over per-doc counts x_d
    (zero-docs included through the algebra, never materialized),

        fano_ppm = 10⁶·(N·Σx² − (Σx)²) div ((N−1)·Σx)

    with N = |docs| — ≈10⁶ ppm is Poisson-like (function word),
    ≫10⁶ is bursty (content word). Exact integers; tokens with
    Σx < `min_total` drop (dispersion is meaningless on scraps).
    Output (token, n_docs_with, total, fano_ppm).

    Scale shape: ONE (doc, token) count agg → ONE token agg carrying
    (Σx, Σx², docs-with) → a 1-row N broadcast. The zero-doc mass
    enters through N only — no explosion of absent cells."""
    toks = docs.select(
        F.col("doc_id"), F.explode(words(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("x"))
    per_tok = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_with"),
        F.sum("x").cast("long").alias("total"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    return (
        per_tok.filter(F.col("total") >= min_total)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token", "n_docs_with", "total",
            F.expr("1000000 * (nd * sx2 - total * total) div ((nd - 1) * total)")
            .cast("long").alias("fano_ppm"),
        )
    )


def novelty_scores(docs: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram novelty against everything EARLIER (the
    dedup-aware sampling signal data-mixing pipelines weight by:
    a page whose shingles all appeared in earlier pages adds nothing,
    whatever its exact-hash says; the per-DOC aggregate view of what
    winnow/incr_dedup track per span): with document order = ascending
    `id_col` (crawl order; any total order works) and each doc's
    DISTINCT word n-grams (set semantics, pinned),

        novelty_ppm = 10⁶·|grams first owned by this doc| div |grams|

    where a gram's owner is the MINIMUM doc id containing it. Docs
    shorter than n words emit no row (no grams, no score).

    Output: (doc_id, n_grams, n_new, novelty_ppm).

    Scale shape: gram explode → (gram, doc) distinct (ONE corpus-keyed
    shuffle, map-side combined) → per-gram min-owner agg → ONE hash
    join back on the gram key → per-doc count agg. The gram key is the
    shuffle key; boilerplate mega-grams are exactly the keys AQE skew
    handling splits, and each contributes one owner row regardless of
    frequency."""
    w = words(F.col("text"))
    grams = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.transform(
                    # explicit short-doc guard: sequence(0, -1) would INFER
                    # a descending step (Spark semantics), not an empty list
                    F.when(
                        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
                )
            ).alias("gram"),
        )
        .filter(F.col("gram") != "")
        .distinct()
    )
    owner = grams.groupBy("gram").agg(F.min("doc").alias("owner"))
    scored = grams.join(owner, "gram")
    return (
        scored.groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("owner") == F.col("doc")).cast("long")).cast("long").alias("n_new"),
        )
        .select(
            F.col("doc").alias(id_col), "n_grams", "n_new",
            F.expr("1000000 * n_new div n_grams").cast("long").alias("novelty_ppm"),
        )
    )


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 64,
    seed_size: int = 512,
    max_piece_len: int = 6,
    n_em_rounds: int = 4,
    prune_frac: float = 0.25,
    text_col: str = "text",
    max_vocab_rows: int = 10_000_000,
) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo, ACL 2018 — the SentencePiece
    unigram model; the OTHER production tokenizer family next to
    `bpe_train`). Same two-phase split as the r4 BPE rewrite:

    - **Phase 1 (corpus-sized, distributed)**: word-frequency table
      (one shuffle), then the SEED vocabulary — every substring of
      length 1..`max_piece_len` weighted by word frequency, top
      `seed_size` by (weight DESC, piece ASC) via ONE map-side-combined
      agg + TakeOrdered; all single characters are force-included
      (coverage guarantee). The corpus is never touched again.
    - **Phase 2 (vocab-sized, DRIVER-LOCAL)**: EM over the collected
      (word, freq) table — E-step computes each piece's expected count
      with the forward-backward marginals over the word's segmentation
      lattice, M-step renormalizes; then iterative pruning drops the
      lowest-likelihood-contribution pieces (never single chars) by
      `prune_frac` per round until `vocab_size` remains, re-running EM
      between prunes. Zero Spark jobs inside the loop (the bpe_train
      discipline); the collect is guarded by `max_vocab_rows`.

    Determinism: EM is plain float arithmetic in a FIXED iteration
    order (pieces sorted, words sorted), so the result is reproducible
    on a given platform; the returned score is rounded to integer ppm
    (log-prob × 10⁶) to pin the output surface. Differential-fuzzed
    against an independently written mirror (tests/test_unigram.py);
    no SQL oracle — EM over a segmentation lattice is not expressible
    in DuckDB SQL (rows-only registry entry, justified like bpe_train).

    → pieces DataFrame (piece string, logprob_ppm long, is_char
    boolean), descending probability, size == vocab_size (or fewer if
    the seed was smaller)."""
    import math
    from collections import Counter

    words_df = (
        docs.select(
            F.explode(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "),
                            r" +",
                            " ",
                        )
                    ),
                    " ",
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    n_vocab = words_df.count()
    if n_vocab > max_vocab_rows:
        raise ValueError(
            f"unigram_train: {n_vocab} distinct words exceeds max_vocab_rows="
            f"{max_vocab_rows}; apply a frequency floor first (bpe_train's rule)"
        )

    # distributed seed candidates: substrings weighted by word freq
    subs = words_df.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.lit(max_piece_len), F.length("word"))),
                    lambda L: F.transform(
                        F.sequence(F.lit(1), F.length("word") - L + 1),
                        lambda i: F.substring(F.col("word"), i, F.lit(0) + L),
                    ),
                )
            )
        ).alias("piece"),
        "freq",
    )
    seed_rows = (
        subs.groupBy("piece").agg(F.sum("freq").alias("w"))
        .orderBy(F.col("w").desc(), F.col("piece").asc())
        .limit(seed_size)
        .collect()
    )
    words = sorted((r["word"], int(r["freq"])) for r in words_df.collect())
    chars = sorted({c for w, _f in words for c in w})
    pieces = sorted({r["piece"] for r in seed_rows} | set(chars))

    def em(pieces_list, probs, rounds):
        pset = {p: i for i, p in enumerate(pieces_list)}
        maxlen = max(len(p) for p in pieces_list)
        for _ in range(rounds):
            expected = [0.0] * len(pieces_list)
            total_ll = 0.0
            for w, f in words:
                n = len(w)
                # forward: alpha[j] = total prob of segmentations of w[:j]
                alpha = [0.0] * (n + 1)
                alpha[0] = 1.0
                for j in range(1, n + 1):
                    s = 0.0
                    for L in range(1, min(maxlen, j) + 1):
                        pi = pset.get(w[j - L : j])
                        if pi is not None and alpha[j - L] > 0:
                            s += alpha[j - L] * probs[pi]
                    alpha[j] = s
                if alpha[n] <= 0:
                    continue  # unsegmentable (cannot happen with chars kept)
                # backward
                beta = [0.0] * (n + 1)
                beta[n] = 1.0
                for j in range(n - 1, -1, -1):
                    s = 0.0
                    for L in range(1, min(maxlen, n - j) + 1):
                        pi = pset.get(w[j : j + L])
                        if pi is not None and beta[j + L] > 0:
                            s += probs[pi] * beta[j + L]
                    beta[j] = s
                # piece marginals
                inv = f / alpha[n]
                for j in range(n):
                    if alpha[j] <= 0:
                        continue
                    for L in range(1, min(maxlen, n - j) + 1):
                        pi = pset.get(w[j : j + L])
                        if pi is not None and beta[j + L] > 0:
                            expected[pi] += alpha[j] * probs[pi] * beta[j + L] * inv
                total_ll += f * math.log(alpha[n])
            z = sum(expected)
            if z <= 0:
                break
            probs = [max(e / z, 1e-12) for e in expected]
        return probs

    probs = [1.0 / len(pieces)] * len(pieces)
    probs = em(pieces, probs, n_em_rounds)

    # prune until vocab_size: drop lowest-prob multi-char pieces
    char_set = set(chars)
    while len(pieces) > max(vocab_size, len(char_set)):
        n_drop = min(
            max(1, int(len(pieces) * prune_frac)),
            len(pieces) - max(vocab_size, len(char_set)),
        )
        order = sorted(
            range(len(pieces)),
            key=lambda i: (pieces[i] in char_set, probs[i], pieces[i]),
        )
        drop = {i for i in order[:n_drop] if pieces[i] not in char_set}
        if not drop:
            break
        keep = [i for i in range(len(pieces)) if i not in drop]
        pieces = [pieces[i] for i in keep]
        kept = [probs[i] for i in keep]
        z = sum(kept)
        probs = [p / z for p in kept]
        probs = em(pieces, probs, 1)

    out = sorted(
        ((p, probs[i], p in char_set) for i, p in enumerate(pieces)),
        key=lambda t: (-t[1], t[0]),
    )
    rows = [
        (p, int(round(math.log(pr) * 1_000_000)), is_c) for p, pr, is_c in out
    ]
    return docs.sparkSession.createDataFrame(
        rows, "piece string, logprob_ppm long, is_char boolean"
    )


def unigram_encode(
    docs: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Viterbi segmentation under a trained unigram LM
    (`unigram_train`'s pieces table): each document's words are split
    into the max-probability piece sequence → (doc_id, n_pieces,
    pieces_ssv) with pieces space-joined (the encode_tokens
    representation-stability rule: a string column oracles across
    engines where array renderings differ).

    Deterministic tie-break: on equal path log-prob the segmentation
    preferring the LONGER piece at the earliest split point wins
    (argmax scans piece length descending — pinned by pytest against
    the mirror).

    Scale: the piece table is vocab-sized and BROADCAST (Spark task
    closure); segmentation is per-word DP inside Arrow-batched
    `mapInPandas` — the same Python-at-the-leaves shape as the parser
    stage, no shuffle beyond the per-doc regroup already in the plan."""
    import pandas as pd
    from pyspark.sql import types as T

    prows = [(r["piece"], int(r["logprob_ppm"])) for r in pieces.collect()]
    ptab = dict(prows)
    maxlen = max((len(p) for p in ptab), default=1)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_pieces", T.LongType(), False),
            T.StructField("pieces_ssv", T.StringType(), False),
        ]
    )

    def run(batches):
        import re

        def viterbi(w):
            n = len(w)
            NEG = float("-inf")
            best = [NEG] * (n + 1)
            back = [None] * (n + 1)
            best[0] = 0.0
            for j in range(1, n + 1):
                # longer pieces scanned first so ties keep the longest
                for L in range(min(maxlen, j), 0, -1):
                    p = w[j - L : j]
                    lp = ptab.get(p)
                    if lp is not None and best[j - L] > NEG:
                        cand = best[j - L] + lp
                        if cand > best[j]:
                            best[j] = cand
                            back[j] = L
            if best[n] == NEG:
                return None
            out, j = [], n
            while j > 0:
                L = back[j]
                out.append(w[j - L : j])
                j -= L
            return out[::-1]

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", str(text).lower())).strip()
                seq = []
                for w in t.split(" "):
                    if not w:
                        continue
                    seg = viterbi(w)
                    seq.extend(seg if seg is not None else ["<unk>"])
                rows.append((int(did), len(seq), " ".join(seq)))
            yield pd.DataFrame(rows, columns=["doc_id", "n_pieces", "pieces_ssv"])

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def textrank_keywords(
    docs: DataFrame,
    k: int = 3,
    window: int = 2,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    min_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) at
    corpus scale: per document, build the word co-occurrence graph
    (candidate tokens within `window` positions of each other in the
    ORIGINAL token sequence), run `iters` fixed PageRank rounds, and
    emit the top-k tokens per doc. The LLM-pipeline use: cheap
    per-document keyword/topic signals for mixture planning and
    retrieval indexing without a model in the loop.

    Candidate tokens are the house tokenization (lowercase alnum words)
    of length ≥ `min_len` — the cheap content-word filter; positions are
    indices in the FULL token stream, so co-occurrence distance is
    preserved across dropped short words.

    Integer-exact contract (the pagerank recipe): scores start at
    `scale`, each round is

        pr'(v) = (100−d)·scale/100 + d · (Σ_u pr(u) div deg(u)) div 100

    with integer division throughout — bit-identical across engines and
    partitionings, so the suite value-oracles (doc, tok, rank, score)
    against a rounds-unrolled DuckDB mirror. Ties in the top-k break
    token-ascending; ALL per-doc graphs ride ONE DataFrame keyed by
    (doc, tok) — a billion tiny graphs is one fixed-round distributed
    job, never a driver loop.

    Scale shape: tokenize+posexplode is scan-local; the window self-join
    is an equi-join on doc_id with the ≤`window` position band as a
    residual filter (each probe row matches ≤ window rows); each round
    is one map-side-combined agg + one hash join; top-k is a bounded
    per-doc window, never a global sort."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "),
                            r" +", " ",
                        )
                    ),
                    " ",
                )
            ).alias("pos", "tok"),
        )
        .filter((F.col("tok") != "") & (F.length("tok") >= min_len))
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("tok").alias("ta"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("tok").alias("tb"))
    und = (
        a.join(b, "doc_id")
        .filter(
            (F.col("pb") - F.col("pa") >= 1)
            & (F.col("pb") - F.col("pa") <= window)
            & (F.col("ta") != F.col("tb"))
        )
        .select(
            "doc_id",
            F.least("ta", "tb").alias("x"),
            F.greatest("ta", "tb").alias("y"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # both directions + deg read it
    )
    dirn = und.select("doc_id", F.col("x").alias("src"), F.col("y").alias("dst")).unionByName(
        und.select("doc_id", F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    deg = dirn.groupBy("doc_id", "src").agg(F.count(F.lit(1)).alias("deg"))
    # checkpoint: nodes feeds BOTH sides of every round's left join (pr
    # carries its lineage) — without the barrier the self-reference trips
    # conflicting-attribute resolution, and the multi-consumer reuse is
    # real anyway (iters+1 readers)
    nodes = toks.select("doc_id", "tok").distinct().localCheckpoint(eager=False)
    pr = nodes.select("doc_id", "tok", F.lit(scale).cast("long").alias("pr"))
    base = (100 - damping_pct) * scale // 100
    contrib_src = dirn.join(deg, ["doc_id", "src"])
    for it in range(iters):
        acc = (
            contrib_src.join(
                pr.select("doc_id", F.col("tok").alias("src"), "pr"), ["doc_id", "src"]
            )
            .select("doc_id", F.col("dst").alias("tok"), F.expr("pr div deg").alias("c"))
            .groupBy("doc_id", "tok")
            .agg(F.sum("c").alias("acc"))
        )
        pr = nodes.join(acc, ["doc_id", "tok"], "left").select(
            "doc_id", "tok",
            F.expr(f"{base}L + ({damping_pct} * coalesce(acc, 0L)) div 100")
            .cast("long").alias("pr"),
        )
        if it < iters - 1:
            # cap the O(iters) lineage, but leave the LAST round's join+agg
            # visible on the returned frame (the sssp plan-audit discipline)
            pr = pr.localCheckpoint(eager=False)
    w = Window.partitionBy("doc_id").orderBy(F.col("pr").desc(), F.col("tok").asc())
    return (
        pr.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "tok",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("pr").cast("long").alias("score"),
        )
    )


def feature_hash(
    docs: DataFrame,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick term vectorizer (Weinberger et al., ICML 2009): map
    each house token to bucket = md5(token) mod `buckets` and count per
    (doc, bucket) → the fixed-width sparse feature rows every
    vocabulary-free trainer (linear probes, quality classifiers, dedup
    prefilters) consumes. No vocabulary pass, no driver state — the
    feature space is defined by the hash, so new shards never shift
    indices (the property that makes the trick work at corpus scale).

    Deterministic and engine-portable: bucket = first-15-hex-digits of
    md5 mod buckets, exact integers (the sssp weight-derivation trick),
    so the suite value-oracles (doc, bucket, cnt) against the identical
    DuckDB expression. Signed variants (±1 by a second hash bit) add
    nothing for counts; omitted.

    Scale shape: tokenize is scan-local; ONE map-side-combined
    groupBy(doc, bucket) whose exchange carries at most
    min(tokens, buckets) rows per doc."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "),
                        r" +", " ",
                    )
                ),
                " ",
            )
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % buckets
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
