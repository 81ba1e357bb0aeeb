"""Corpus-cleaning operators for LLM training-data prep — BASELINE extension.

Three cleaning tiers a 100 TB pretraining pipeline runs between ingest and
dedup (all from the public C4 / Dolma recipes — Raffel et al. 2020 §2.2,
Soldaini et al. 2024 — generalizing the reference's junk-content predicate,
backend/app/core/text_splitter.py:123-179):

1. **PII redaction** (`redact_pii`): regex detection + masking of emails,
   phone numbers, IPv4 addresses and SSN-shaped ids. A pure JVM projection
   (`regexp_count` / `regexp_replace`) — embarrassingly parallel, zero
   shuffle, and the patterns are restricted to the RE2-compatible subset so
   the DuckDB oracle twin matches byte-for-byte.
2. **Line-level quality filtering** (`line_quality_filter`): C4's line rules
   (minimum word count, banned substrings, single-token domination — the
   "word word word" failure mode) over a long `(doc_id, line_no, line)`
   frame. Filter first, THEN reassemble: the filter is a projection over the
   exploded frame, and reassembly is one map-side-combinable groupBy.
3. **Global line dedup** (`global_line_dedup`): Dolma-style removal of lines
   that repeat across too many documents (boilerplate headers, nav bars).
   Doc-frequency by 64-bit *hash* of the normalized line — the shuffle key
   is 8 bytes, never the line text — then a shuffle hash join back. Both
   sides partial-aggregate, so the 100 TB cost is ~2 narrow shuffles of
   (hash, count) pairs.

Scale notes: nothing here collects, nothing is quadratic, and every rule is
a JVM column expression (no Python in the hot path). The only shuffles are
the groupBys in (2)-(3), all on bounded-width keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import portable_hash64

#: RE2-compatible PII patterns (same semantics under Java regex and DuckDB's
#: RE2 — no backrefs, no lookaround). Order matters: emails before phones so
#: digits inside a masked token are not re-matched.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
}


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Detect and mask PII in ``text_col``.

    Output: ``(doc_id, n_<kind>... one count column per pattern,
    text_redacted)``. Counts are taken BEFORE masking (on the original
    text), then masks are applied in dict order so earlier masks cannot
    create or destroy later matches of the same text region.

    One projection, no shuffle — safe to run as the first pass over a
    100 TB corpus with column pruning intact.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    cols = [F.col(id_col).alias("doc_id")]
    for kind, (rx, _mask) in pats.items():
        cols.append(F.regexp_count(F.col(text_col), F.lit(rx)).alias(f"n_{kind}"))
    redacted = F.col(text_col)
    for _kind, (rx, mask) in pats.items():
        redacted = F.regexp_replace(redacted, rx, mask)
    cols.append(redacted.alias("text_redacted"))
    return df.select(*cols)


def split_lines(df: DataFrame, id_col: str, text_col: str, delim: str = "\n") -> DataFrame:
    """Explode documents into a long ``(doc_id, line_no, line)`` frame.

    Blank/whitespace-only lines are dropped (they carry no signal and would
    all hash-collide in :func:`global_line_dedup`). ``line_no`` is the
    0-based position in the ORIGINAL document so cleaned text can be
    reassembled in order.
    """
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), delim)).alias("line_no", "line"),
    )
    return exploded.where(F.trim(F.col("line")) != "")


def token_lines(df: DataFrame, id_col: str, text_col: str, words_per_line: int) -> DataFrame:
    """Deterministic fixed-width "lines" for corpora without newlines: split
    on whitespace and group every ``words_per_line`` consecutive tokens.

    Same output shape as :func:`split_lines`. Pure JVM (split + sequence +
    slice + array_join) — no collect_list ordering hazard, no Python.
    """
    n = F.lit(words_per_line)
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    lines = staged.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.size("_toks") / n.cast("double")).cast("int") - 1)
        ).alias("line_no"),
        F.col("_toks"),
    ).select(
        "doc_id",
        "line_no",
        F.array_join(F.slice(F.col("_toks"), F.col("line_no") * n + 1, words_per_line), " ").alias(
            "line"
        ),
    )
    return lines.where(F.trim(F.col("line")) != "")


def line_quality_flags(
    lines: DataFrame,
    min_words: int = 5,
    banned_substrings: tuple[str, ...] = ("javascript", "lorem ipsum", "{"),
    max_top_token_share: float = 0.5,
) -> DataFrame:
    """C4-style per-line quality rules as a ``keep`` flag.

    Rules (all JVM expressions over the line string):
      * ``n_words >= min_words`` — fragments carry little training signal;
      * no banned substring (case-insensitive) — the C4 boilerplate list;
      * the most frequent token must not exceed ``max_top_token_share`` of
        the line — kills "word word word word" degenerate lines (the
        line-local analog of the Gopher repetition gate).

    Output: input columns + ``(n_words, top_token_share, keep)``.
    top_token_share is computed with one sort of the line's token array —
    O(L log L) per line, L bounded by line length, no shuffle.
    """
    toks = F.split(F.trim(F.col("line")), r"\s+")
    n_words = F.size(toks)
    # count the modal token via sorted-run scan: sort the array, then the
    # longest run of equal adjacent tokens is the max count
    sorted_toks = F.array_sort(toks)
    run_struct = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_share = F.when(n_words > 0, run_struct["best"].cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    lower = F.lower(F.col("line"))
    banned_hit = F.lit(False)
    for s in banned_substrings:
        banned_hit = banned_hit | lower.contains(s.lower())
    return lines.select(
        "*",
        n_words.alias("n_words"),
        F.round(top_share, 6).alias("top_token_share"),
        (
            (n_words >= F.lit(min_words))
            & ~banned_hit
            & (top_share <= F.lit(max_top_token_share))
        ).alias("keep"),
    )


def line_quality_filter(lines: DataFrame, **kwargs) -> DataFrame:
    """Keep only lines passing :func:`line_quality_flags`, original columns."""
    flagged = line_quality_flags(lines, **kwargs)
    return flagged.where(F.col("keep")).select(*lines.columns)


def global_line_dedup(
    lines: DataFrame,
    max_doc_freq: int = 2,
) -> DataFrame:
    """Dolma-style global line dedup: drop lines whose *normalized* form
    occurs in more than ``max_doc_freq`` distinct documents.

    Plan shape (the part that must survive 100 TB):
      1. ``line_key = portable_hash64(lower(trim(line)))`` — the shuffle and
         join key is 8 bytes; the full line text never shuffles twice.
      2. doc-frequency: ``groupBy(line_key).agg(countDistinct(doc_id))`` —
         two-stage (partial distinct per map task, merge on reduce).
      3. shuffle hash join back on ``line_key`` and filter. The frequency
         side is (n_distinct_lines × 16 bytes); for boilerplate-heavy
         corpora it is FAR smaller than the lines frame, and Spark's AQE
         will broadcast it when it fits.

    Output: the input columns, restricted to surviving lines.
    """
    key = portable_hash64(F.lower(F.trim(F.col("line"))))
    keyed = lines.select("*", key.alias("_line_key"))
    freq = (
        keyed.groupBy("_line_key")
        .agg(F.countDistinct("doc_id").alias("_line_df"))
        .where(F.col("_line_df") > max_doc_freq)
    )
    survivors = keyed.join(freq, "_line_key", "left_anti")
    return survivors.select(*lines.columns)


def domain_boilerplate_dedup(
    lines: DataFrame,
    source_col: str = "source",
    min_docs: int = 2,
    max_doc_frac: float = 0.3,
) -> DataFrame:
    """CCNet-style per-domain boilerplate removal: drop lines whose
    normalized form appears in "too many" documents OF THE SAME SOURCE —
    nav bars, footers, cookie banners that repeat across one site but are
    legitimate prose elsewhere (the reason CCNet dedups per-shard/domain
    rather than globally; see also Dolma's per-source passes).

    A line is boilerplate within a source when it occurs in
    ``>= min_docs`` distinct documents AND in ``> max_doc_frac`` of that
    source's documents. Both thresholds matter at 100 TB: the absolute
    floor keeps tiny sources (2-doc domains) from nuking every shared
    line, the fraction keeps huge sources honest (1000 hits on a 1M-doc
    domain is noise, not boilerplate).

    Plan shape: the shuffle/join key is ``(source, hash64(line))`` —
    16 bytes, never the text. Three map-side-combinable groupBys
    (per-source line DF, per-source doc count) and one hash join back;
    the per-source doc-count dim is O(#sources) and broadcast by AQE.

    Input must carry ``doc_id``, ``line``, and ``source_col``.
    Output: the input columns, restricted to surviving lines.
    """
    key = portable_hash64(F.lower(F.trim(F.col("line"))))
    keyed = lines.select("*", key.alias("_line_key"))
    line_df = (
        keyed.groupBy(source_col, "_line_key")
        .agg(F.countDistinct("doc_id").alias("_line_df"))
    )
    source_docs = (
        lines.groupBy(source_col)
        .agg(F.countDistinct("doc_id").alias("_src_docs"))
    )
    boiler = (
        line_df.join(F.broadcast(source_docs), source_col)
        .where(
            (F.col("_line_df") >= F.lit(min_docs))
            & (F.col("_line_df") > F.lit(max_doc_frac) * F.col("_src_docs"))
        )
        .select(source_col, "_line_key")
    )
    survivors = keyed.join(boiler, [source_col, "_line_key"], "left_anti")
    return survivors.select(*lines.columns)


def reassemble_documents(lines: DataFrame) -> DataFrame:
    """Rebuild ``(doc_id, text_clean, n_lines_kept)`` from a cleaned lines
    frame, preserving original line order.

    Uses sort_array over (line_no, line) structs inside one groupBy — a
    single map-side-combinable shuffle, no window over raw lines.
    """
    return (
        lines.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean"),
            F.count("*").alias("n_lines_kept"),
        )
    )


def remove_token_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    tokens_col: str | None = None,
) -> DataFrame:
    """Cut TOKEN-position ranges out of documents — the apply step for span
    producers (dedup.repeated_ngram_spans' cross-doc duplicated passages,
    or any (id, span_start, span_end) table). Output text is the kept
    tokens of the NORMALIZED token stream space-joined (the same stream
    fingerprint/minhash read), since char-level offsets don't survive
    tokenization.

    This is the aggressive cut-everywhere mode; a keep-one-occurrence
    policy (Lee et al.'s dedup action) is the same call with the survivor
    docs' rows filtered OUT of ``spans`` first.

    Output: (id, clean_text, n_tokens, n_removed).

    Scale: posexplode + one equi-key (id) anti join whose extra range
    predicate runs inside the join, + one groupBy reassembly — the span
    table is tiny relative to the corpus and never fans out.

    ``tokens_col``: a pre-tokenized array column to read instead of
    tokenizing ``text_col`` (see :func:`span_cut_docs` for the fused
    detect+cut chain that tokenizes once).
    """
    from vectordb_bioinsight_spark.functions.text import tokenize

    tok_expr = F.col(tokens_col) if tokens_col is not None else tokenize(text_col)
    toks = df.select(
        F.col(id_col).alias("_id"), F.posexplode(tok_expr).alias("pos", "tok")
    )
    sp = spans.select(
        F.col(id_col).alias("_sid"),
        F.col("span_start").alias("_ss"),
        F.col("span_end").alias("_se"),
    )
    kept = toks.join(
        sp,
        (F.col("_id") == F.col("_sid"))
        & (F.col("pos") >= F.col("_ss"))
        & (F.col("pos") <= F.col("_se")),
        "left_anti",
    )
    # totals from the INPUT rows (size of the token array), not the exploded
    # stream: a doc whose text tokenizes to zero tokens yields no posexplode
    # rows, and a groupBy over the stream would silently drop it from the
    # output instead of reporting (id, '', 0, 0)
    total = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.size(tok_expr), F.lit(0)).cast("long").alias("n_tokens"),
    )
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.getField("tok"),
            ),
        ).alias("clean_text"),
        F.count("*").cast("long").alias("_n_kept"),
    )
    return (
        total.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0))).cast("long").alias("n_removed"),
        )
    )


def span_cut_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Fused ExactSubstr detect + cut: find every cross-doc repeated
    ``n``-gram span (:func:`~vectordb_bioinsight_spark.operators.dedup.
    repeated_ngram_spans`) and cut it from every doc
    (:func:`remove_token_spans`) with the corpus tokenized ONCE.

    The tokenized projection is persisted disk-spillable and both stages
    read it, so the chain costs one corpus scan + one tokenizer pass
    instead of two of each (the r02 bench's span_cut_docs plan re-tokenized
    the corpus in the cut stage). At cluster scale the persisted token
    arrays are bounded by executor storage (MEMORY_AND_DISK spills, never
    OOMs) and remain cheaper than the second full scan + regex pass; the
    lineage stays recomputable if blocks are evicted.
    """
    from pyspark.storagelevel import StorageLevel

    from vectordb_bioinsight_spark.functions.text import tokenize
    from vectordb_bioinsight_spark.operators.dedup import repeated_ngram_spans

    toked = df.select(
        F.col(id_col), tokenize(text_col).alias("_toks")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    spans = repeated_ngram_spans(
        toked, id_col, "_toks", n=n, min_docs=min_docs, tokens_col="_toks",
        # the token projection above is already persisted; storing the
        # position-level shingle table too costs more than recomputing
        # shingle+hash from the cached arrays
        materialize=False,
    )
    return remove_token_spans(toked, spans, id_col, "_toks", tokens_col="_toks")


# ---------------------------------------------------------------------------
# Web-text repair: HTML stripping + entity decode, mojibake fix
# ---------------------------------------------------------------------------

#: literal HTML entities decoded after tag stripping. ORDER MATTERS:
#: ``&amp;`` must decode LAST or "&amp;lt;" would double-decode — the same
#: rule every HTML entity decoder follows. Numeric entities (&#x27;-style
#: beyond the explicit apostrophe) are out of scope: turning a captured
#: code point into a character is not a single JVM/RE2 expression, and the
#: six below cover the overwhelming share of crawl text.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

#: UTF-8-read-as-Latin-1 sequences (the classic double-encoding accident)
#: → the intended character. Literal replaces, longest/most-specific
#: first; the bare "Â " stray only matches with its trailing space so
#: legitimate "Â«" quoting survives.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "’"),
    ("â€œ", "“"),
    ("â€“", "–"),
    ("â€”", "—"),
    ("â€¦", "…"),
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ã¤", "ä"),
    ("Ã¶", "ö"),
    ("Ã¼", "ü"),
    ("Ã±", "ñ"),
    ("Ã§", "ç"),
    ("Â ", " "),
]


def strip_html(text):  # noqa: ANN001, ANN201
    """Column expression: HTML → plain text. Script/style blocks and
    comments vanish wholly (non-greedy RE2 with (?is)), ``<br>``/``</p>``
    become newlines, remaining tags drop, entities decode, runs of
    spaces/tabs squeeze. Pure JVM projection — zero shuffle, zero UDF;
    the RE2-compatible subset keeps the DuckDB twin byte-identical."""
    # two anchored patterns, not one with a backreference — RE2 (the
    # DuckDB twin's engine) has no backrefs
    t = F.regexp_replace(text, r"(?is)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, r"(?i)<br\s*/?>|</p\s*>", "\n")
    t = F.regexp_replace(t, "<[^>]+>", "")
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, "[ \\t]+", " ")
    # trim() strips SPACES only in both engines — anchor-strip all
    # leading/trailing whitespace instead so '</p>' newlines don't linger
    return F.regexp_replace(t, "^\\s+|\\s+$", "")


def fix_mojibake(text):  # noqa: ANN001, ANN201
    """Column expression: undo the UTF-8-decoded-as-Latin-1 accident for
    the common punctuation/accent sequences (``MOJIBAKE_MAP``). Chain of
    literal replaces — scan-local, shared corpus scan with the other
    gates."""
    t = text
    for bad, good in MOJIBAKE_MAP:
        t = F.replace(t, F.lit(bad), F.lit(good))
    return t


def clean_web_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The combined web-repair projection: tag count (pre-strip), HTML
    strip + entity decode, mojibake fix. One scan, three derived columns.

    Output: input + (n_tags, text_clean, mojibake_fixed flag).
    """
    n_tags = F.size(F.regexp_extract_all(F.col(text_col), F.lit("<[^>]+>"), F.lit(0)))
    stripped = strip_html(F.col(text_col))
    fixed = fix_mojibake(stripped)
    return df.select(
        "*",
        n_tags.cast("int").alias("n_tags"),
        fixed.alias("text_clean"),
        (fixed != stripped).cast("int").alias("mojibake_fixed"),
    )


# ---------------------------------------------------------------------------
# Sentence segmentation
# ---------------------------------------------------------------------------

#: abbreviations whose trailing '.' does NOT end a sentence. Protected by
#: a literal sentinel swap before the terminator scan (RE2 — the DuckDB
#: twin's engine — has no lookbehind, so the classic (?<=[.!?]) split is
#: not portable; protect-split-restore is, exactly).
SENTENCE_ABBREVIATIONS: tuple[str, ...] = (
    "Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "Fig.", "No.",
    "e.g.", "i.e.", "etc.", "vs.", "et al.", "cf.",
)

_SENTINEL = "\x01"


def split_sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic sentence segmentation: protect known abbreviations,
    extract maximal ``[^.!?]+[.!?]*`` runs, restore, trim. A final
    unterminated fragment is kept as its own sentence.

    Not a learned segmenter — a pinned, engine-portable recipe (the same
    trade the C4 pipeline makes): every rule is a literal replace or an
    RE2-subset regex, so the DuckDB twin reproduces it byte-for-byte and
    the whole pass stays scan-local (explode is the only row op; no
    shuffle, no UDF).

    Output: (id, sent_no 0-based, sentence) — empty/whitespace-only
    fragments dropped.
    """
    t = F.col(text_col)
    for abbr in SENTENCE_ABBREVIATIONS:
        # EVERY dot in the abbreviation becomes the sentinel ("e.g." has an
        # interior one that would otherwise still split)
        t = F.replace(t, F.lit(abbr), F.lit(abbr.replace(".", _SENTINEL)))
    sents = F.regexp_extract_all(t, F.lit("[^.!?]+[.!?]*"), F.lit(0))
    # restore + trim + drop empties INSIDE the array, before posexplode,
    # so sent_no stays contiguous
    restored = F.transform(
        sents, lambda s: F.trim(F.replace(s, F.lit(_SENTINEL), F.lit(".")))
    )
    kept = F.filter(restored, lambda s: s != F.lit(""))
    return df.select(
        F.col(id_col),
        F.posexplode(kept).alias("sent_no", "sentence"),
    ).select(id_col, F.col("sent_no").cast("long").alias("sent_no"), "sentence")


def nfc_normalize(text):  # noqa: ANN001, ANN201
    """Column expression: Unicode NFC normalization (Arrow-batched pandas
    UDF over ``Series.str.normalize`` — no JVM builtin exists for this).

    Run it BEFORE any hash-keyed dedup: "café" composed (U+00E9) and
    decomposed (e + U+0301) are different STRINGS with different 64-bit
    hashes, so un-normalized corpora silently miss exact duplicates that
    every human would call identical. This is the one deliberate
    Python-UDF stage in the cleaning tier — a documented Arrow slow path,
    still scan-local (no shuffle), and only needed once per corpus at
    ingest.
    """
    import pandas as pd  # noqa: F401

    @F.pandas_udf("string")
    def _nfc(s):  # noqa: ANN001, ANN202
        return s.str.normalize("NFC")

    return _nfc(text)


# ------------------------------------------------------------- garbled text
#: Known TeX-font mojibake fragments (pdf_parser.py:129-134). The two
#: space-containing entries can never match a whitespace-split word — kept
#: for behavioral parity with the reference, where they are equally inert
#: at word level.
GARBLED_PATTERNS = [
    "lfs", "pdb", "bgk", "hth", "lfsr", "pdbgk",
    "jcj", "clfs", "fsrj", "fsrg", "sosrh",
    "map of", "1/4 p", "j2c",
]

#: unusual character sequences at LINE level (pdf_parser.py:149-153)
_UNUSUAL_SEQ = r"[;:]\s*[a-z]\s*[;:]|1/4\s+[a-z]|[a-z]\s*<\s*[a-z]{2,}\s*>"


def garbled_line_flag(line):  # noqa: ANN001, ANN201
    """Boolean column: is this line garbled TeX-font mojibake?

    The reference's ``GarbledTextDetector.is_garbled`` scoring
    (pdf_parser.py:116-206), re-expressed as ONE JVM expression tree per
    line (no UDF, RE2-compatible so the DuckDB twin replays it):

    * per word (lowercased, ``.,;:()[]{}`` stripped at both ends,
      length >= 2): +2 if length >= 4 with at least one consonant and a
      vowel ratio under 0.15, +3 if it contains a known TeX-garble
      fragment, +2 if the ORIGINAL word has an interior lower-Upper-lower
      case flip (the 'hTh' signature);
    * line is garbled when mean word score > 0.3, or when >= 2 unusual
      punctuation sequences (``; a :``-style) appear — lines under 10
      chars after trimming never flag.
    """
    line = F.regexp_replace(line, r"^\s+|\s+$", "")
    words = F.filter(F.split(line, r"\s+"), lambda w: F.length(w) > 0)
    strip = r"^[.,;:()\[\]{}]+|[.,;:()\[\]{}]+$"

    # let-binding (SCALING rules 40/42): interpreted lambdas get no
    # subexpression elimination, so the stripped-lowered word and its
    # length — each referenced several times by the score — are bound
    # ONCE per word into a struct; the first cut recomputed the strip
    # regexp ~5x per word and measured 46.9 s/1M docs
    bound = F.transform(
        words,
        lambda w: F.struct(
            w.alias("w"),
            F.lower(F.regexp_replace(w, strip, "")).alias("wl"),
        ),
    )

    def word_score(s):
        w, wl = s["w"], s["wl"]
        n = F.length(wl)
        vowels = n - F.length(F.regexp_replace(wl, "[aeiou]", ""))
        consonants = F.length(F.regexp_replace(wl, "[^b-df-hj-np-tv-z]", ""))
        low_vowel = (
            (n >= 4) & (consonants > 0)
            & (vowels.cast("double") / n.cast("double") < 0.15)
        )
        # substring containment == unanchored rlike; no pattern contains a
        # regex metacharacter ('/' and ' ' are literals in RE2 and Java)
        has_pattern = wl.rlike("|".join(GARBLED_PATTERNS))
        mixed = w.rlike("[a-z][A-Z][a-z]")
        score = (
            F.when(low_vowel, 2).otherwise(0)
            + F.when(has_pattern, 3).otherwise(0)
            + F.when(mixed & (F.length(w) >= 3), 2).otherwise(0)
        )
        return F.when(n >= 2, score).otherwise(F.lit(0))

    total = F.aggregate(
        bound, F.lit(0), lambda acc, s: acc + word_score(s)
    )
    n_words = F.greatest(F.size(words), F.lit(1))
    unusual = F.regexp_count(line, F.lit(_UNUSUAL_SEQ))
    return (F.length(line) >= 10) & (
        (total.cast("double") / n_words.cast("double") > 0.3) | (unusual >= 2)
    )


def garbled_line_flag_arrow(line):  # noqa: ANN001, ANN201
    """Arrow-batched twin of :func:`garbled_line_flag` — IDENTICAL output
    (property-pinned in tests/test_cleaning.py), several times the
    throughput: like the keyword-discovery candidate build (SCALING rule
    40, r08 coda), the expression form is an interpreted HOF fold
    (CodegenFallback, no CSE) whose floor is the interpreter itself; the
    python kernel pays one compiled-regex pass per probe and plain
    character counts per word. ASCII-locale regex classes match the Java
    defaults; the unicode-casing divergence surface is the documented
    functions/text.tokenize caveat."""
    import re as _re

    trim_re = _re.compile(r"^\s+|\s+$", _re.ASCII)
    ws_re = _re.compile(r"\s+", _re.ASCII)
    strip_re = _re.compile(r"^[.,;:()\[\]{}]+|[.,;:()\[\]{}]+$")
    mixed_re = _re.compile(r"[a-z][A-Z][a-z]")
    unusual_re = _re.compile(_UNUSUAL_SEQ, _re.ASCII)
    patterns = list(GARBLED_PATTERNS)
    vowels_set = frozenset("aeiou")
    cons_set = frozenset("bcdfghjklmnpqrstvwxyz")

    def _one(raw) -> bool:
        t = trim_re.sub("", raw or "")
        if len(t) < 10:
            return False
        words = [w for w in ws_re.split(t) if w]
        total = 0
        for w in words:
            wl = strip_re.sub("", w).lower()
            n = len(wl)
            if n < 2:
                continue
            nv = sum(c in vowels_set for c in wl)
            nc = sum(c in cons_set for c in wl)
            if n >= 4 and nc > 0 and nv / n < 0.15:
                total += 2
            if any(p in wl for p in patterns):
                total += 3
            if len(w) >= 3 and mixed_re.search(w):
                total += 2
        n_words = max(len(words), 1)
        if total / n_words > 0.3:
            return True
        return len(unusual_re.findall(t)) >= 2

    def _flag(*cols):  # no type hints: postponed annotations break
        (lines,) = cols  # pandas_udf's hint inference under __future__
        return lines.map(_one)

    return F.pandas_udf(_flag, "boolean")(line)


def garbled_text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document garbled-line profile over newline-split text: the
    triage view run before deciding to re-OCR or drop a scan-heavy
    ingest batch. One posexplode + one doc-keyed groupBy.

    Output: (id, n_lines, n_garbled, garbled_frac) — lines are the
    non-empty trimmed ones; frac rounded 6 dp, 0.0 for line-less docs.

    Scores lines with the Arrow kernel (:func:`garbled_line_flag_arrow`)
    — measured 29.8 -> 10.8 s/1M docs (2.8x) over the interpreted
    expression fold on an identical corpus, flags identical.
    """
    lines = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), "\n")).alias("_l")
    ).withColumn("_t", F.regexp_replace(F.col("_l"), r"^\s+|\s+$", "")).filter(
        F.length("_t") > 0
    )
    flagged = lines.withColumn("_g", garbled_line_flag_arrow(F.col("_l")))
    return flagged.groupBy("id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("_g").cast("long")).cast("long").alias("n_garbled"),
        F.round(
            F.sum(F.col("_g").cast("int")) / F.count("*"), 6
        ).alias("garbled_frac"),
    )


def strip_garbled_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Remove garbled lines and reassemble each document (the reference's
    OCR post-clean applies the same detector line-by-line) — a projection
    plus one doc-keyed groupBy, composing with the C4 line rules.

    Output: (id, text) with only the non-garbled, non-empty lines kept in
    original order. Every input id yields exactly one row — a document
    whose lines are ALL garbled (or all empty) comes back as (id, '')
    rather than vanishing (ADVICE r06: downstream joins expect one row
    per input doc). That contract costs no extra shuffle: instead of
    pre-filtering kept lines, the keep-condition moves inside the
    collect (collect_list skips the NULLs the when() leaves behind, and
    array_join over the resulting empty array is '').
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        # coalesce: a NULL text must still explode to one (empty) line so
        # the id keeps its output row
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("_i", "_l"),
    ).withColumn("_t", F.regexp_replace(F.col("_l"), r"^\s+|\s+$", ""))
    kept_line = F.when(
        (F.length("_t") > 0) & ~garbled_line_flag_arrow(F.col("_l")),
        F.struct("_i", "_l"),
    )
    return lines.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_line)), lambda s: s["_l"]
            ),
            "\n",
        ).alias("text")
    )
