"""Subword tokenization: BPE merge-table fit + distributed apply.

The fit/apply split mirrors the engine's other learned components
(`similarity.fit_ivf_centroids`, `text.fit_text_classifier`): the FIT
runs on a deterministic sample reduced to a word-frequency table
(Zipf's law makes the top words carry almost all token mass, so the
table is tiny relative to the corpus), while APPLY is an
embarrassingly parallel Arrow-batched pass with no shuffle at all.

Algorithm: byte-pair encoding over word-internal symbol sequences with
an end-of-word marker (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the reference BPE).
Ties in pair counts are broken LEXICOGRAPHICALLY on the pair, making
the fit deterministic — the classic implementation's arbitrary
dict-order tie-break would make merge tables irreproducible across
runs, which is unacceptable for a table other jobs persist and share.

At 100 TB: the word-frequency aggregation is one narrow shuffle of
(word, count) pairs with map-side partial aggregation; everything
after runs on the driver over at most ``max_words`` rows.  Apply
broadcasts the merge table inside the UDF closure (vocab-sized, a few
MB) and caches encodings per distinct word within each Arrow batch —
natural-language batches repeat words heavily, so the cache turns the
per-word merge loop into a per-DISTINCT-word loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from streaming_parquet_spark.functions.portable import (
    WORD_SPLIT_RULES,
    hash_bucket_expr,
    ordered_words_expr,
    py_word_splitter,
)

#: end-of-word marker (Sennrich 2016's convention).  KNOWN LIMITATION:
#: a word whose CONTENT contains the literal marker string (markup-
#: bearing web text can produce one) is ambiguous in the concatenated
#: representation — ``tokens_to_text`` rewrites interior lookalikes to
#: spaces, so such words do not round-trip (the piece arrays and token
#: counts are still exact; only the decode-to-text leg is lossy).
#: Scrub or escape the marker in a pre-filter (c4_clean_lines /
#: normalize) when decode fidelity matters on such corpora.
_EOW = "</w>"

#: StructField metadata key carrying a frame's word-split rule.  The
#: fits stamp it on their ``word_split`` column (so an EMPTY fit — a
#: zero-merge BPE table is a legitimate char-level tokenizer — still
#: pins its rule: rows can't carry what zero rows don't have), and the
#: applies stamp it on the encoded TOKENS column (so downstream
#: consumers like :func:`subword_vocab` derive the rule from the data
#: instead of trusting a caller to re-state it).  Column metadata
#: survives select/withColumn/persist/localCheckpoint and parquet
#: round trips (Spark stores its schema, metadata included, in the
#: footer), which is exactly the trip these frames make.
_RULE_META = "word_split_rule"


def _bpe_train(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training over a word-frequency dict; deterministic
    via the (count DESC, pair ASC) selection rule.

    Pair counts update INCREMENTALLY: merging (a, b) only changes the
    counts of pairs inside words that contain the bigram, so each
    round costs O(words touched), not O(all corpus symbols) — the
    standard trick that makes a 50k-word table / 1k-merge fit
    driver-practical.  An index pair -> {words containing it} bounds
    the touched set."""
    seqs: dict[str, list[str]] = {
        w: list(w) + [_EOW] for w in word_freq
    }
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[str]] = {}
    for w, freq in word_freq.items():
        seq = seqs[w]
        for pair in zip(seq, seq[1:]):
            counts[pair] = counts.get(pair, 0) + freq
            where.setdefault(pair, set()).add(w)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # prune zero/negative residue before selecting
        best = None
        for pair, c in counts.items():
            if c <= 0:
                continue
            if best is None or (-c, pair) < (-counts[best], best):
                best = pair
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w in sorted(where.get(best, ())):
            freq, seq = word_freq[w], seqs[w]
            out, i = [], 0
            changed = False
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                    changed = True
                else:
                    out.append(seq[i])
                    i += 1
            if not changed:
                continue
            # retract the old window counts, add the new ones
            for pair in zip(seq, seq[1:]):
                counts[pair] -= freq
                if counts[pair] <= 0:
                    where.pop(pair, None)
            seqs[w] = out
            for pair in zip(out, out[1:]):
                counts[pair] = counts.get(pair, 0) + freq
                where.setdefault(pair, set()).add(w)
        counts.pop(best, None)
        where.pop(best, None)
    return merges


def _by_value(fn):
    """A copy of ``fn`` that cloudpickle serializes BY VALUE: the copy
    gets a fresh globals dict with no ``__name__``, so it cannot be
    resolved by module+qualname lookup and ships inside the pickle
    instead of as an import reference.  UDF closures that capture such
    copies (the tokenizer apply encoders) run on executors that do NOT
    have this package on PYTHONPATH — unlike e.g. the multimodal
    mapInPandas operators, which resolve by module name and need the
    package shipped (``--py-files`` / the PYTHONPATH export in
    ``__spark_entry__.py``).  Only valid for functions whose code
    touches builtins exclusively (no module globals) — asserted."""
    import builtins
    import types

    # co_names holds every global/attribute name a code object
    # references — including NESTED code objects (comprehensions,
    # nested defs), which have their own co_names, so walk co_consts
    # recursively.  Module-global CONSTANTS (the _EOW marker) copy
    # into the fresh globals — immutable values pickle by value
    # anyway.  Anything else resolving through module globals
    # (another function, a class) would ship as an import reference
    # and defeat the point — refuse now, at construction, not at
    # executor runtime.
    def all_names(code):
        names = set(code.co_names)
        for c in code.co_consts:
            if isinstance(c, types.CodeType):
                names |= all_names(c)
        return names

    g: dict = {}
    for n in sorted(all_names(fn.__code__)):
        if n not in fn.__globals__:
            continue
        val = fn.__globals__[n]
        if getattr(builtins, n, None) is val:
            continue
        if isinstance(val, (str, bytes, int, float, bool, frozenset)) or val is None:
            g[n] = val
            continue
        raise ValueError(
            f"_by_value({fn.__qualname__}): code references module "
            f"global {n!r} of type {type(val).__name__}; only "
            f"builtins and immutable constants can ship by value"
        )
    out = types.FunctionType(
        fn.__code__, g, fn.__name__, fn.__defaults__, fn.__closure__
    )
    out.__qualname__ = fn.__qualname__ + ".by_value"
    return out


def _bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Encode one word under a rank table: repeatedly merge the
    lowest-rank adjacent pair (the standard BPE apply loop)."""
    seq = list(word) + [_EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def _make_bpe_encoder(ranks: dict, word_split: str):
    """Build the per-batch BPE encode function the apply UDF wraps:
    ``texts -> [piece arrays]``, encodings cached per DISTINCT word
    within the batch.  Every captured object pickles BY VALUE — the
    splitter (py_word_splitter returns a nested closure), the
    :func:`_by_value` copy of the merge loop, and the plain-dict rank
    table — so the cloudpickled UDF carries no import reference to
    this package and runs on executors without it on PYTHONPATH."""
    split = py_word_splitter(word_split)
    enc_word = _by_value(_bpe_encode_word)

    def encode_batch(texts):
        cache: dict = {}
        out_all = []
        for t in texts:
            if t is None:
                out_all.append([])
                continue
            out: list = []
            for w in split(t):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = enc_word(w, ranks)
                out.extend(got)
            out_all.append(out)
        return out_all

    return encode_batch


def _make_unigram_encoder(
    logp: dict, max_len: int, floor: float, eow: str, word_split: str
):
    """Unigram twin of :func:`_make_bpe_encoder` — Viterbi per
    distinct word per batch, each word's last piece carrying the
    end-of-word marker; same by-value self-containment contract."""
    split = py_word_splitter(word_split)
    segment = _by_value(_viterbi_segment)

    def encode_batch(texts):
        cache: dict = {}
        out_all = []
        for t in texts:
            if t is None:
                out_all.append([])
                continue
            out: list = []
            for w in split(t):
                got = cache.get(w)
                if got is None:
                    pieces = segment(w, logp, max_len, floor)
                    pieces[-1] = pieces[-1] + eow
                    got = cache[w] = pieces
                out.extend(got)
            out_all.append(out)
        return out_all

    return encode_batch


def fit_bpe_merges(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 256,
    sample_pct: int | None = None,
    max_words: int = 50_000,
    word_split: str = "ascii-space-v1",
) -> DataFrame:
    """Fit a BPE merge table: (rank, left, right) with rank 0 the
    first (most frequent) merge.  The corpus reduces to a word-
    frequency table (one narrow shuffle, map-side combined), capped at
    the ``max_words`` most frequent words (count DESC, word ASC — the
    deterministic Zipf-head cut; the dropped tail carries a vanishing
    share of token mass), then the classic merge loop runs driver-side
    over that table.

    ``sample_pct``: deterministic percentage sample via the portable
    id hash (NOT df.sample — partition-layout-dependent), same recipe
    as ``fit_ivf_centroids``.  None = fit on the full corpus.

    ``word_split``: the registered word-splitting rule (see
    ``ordered_words_expr``).  The default ``ascii-space-v1`` makes a
    whole CJK/Thai line ONE word — fit CJK corpora under
    ``cjk-char-v1`` and pass the SAME rule to apply/write, or the
    artifact pinning will (correctly) refuse the mismatch.

    Not DuckDB-oracle-able as a value hash (the fit is an iterative
    driver-side algorithm); gated in pytest on the published worked
    examples and on fit determinism."""
    sample = corpus.select(F.col(id_col), F.col(text_col))
    if sample_pct is not None:
        bucket = hash_bucket_expr("spark", id_col, 100)
        sample = sample.filter(F.expr(bucket) < int(sample_pct))
    words = (
        f"filter({ordered_words_expr('spark', text_col, word_split)},"
        f" w -> w != '')"
    )
    freq_rows = (
        sample.select(F.explode(F.expr(words)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(int(max_words))
        .collect()
    )
    merges = _bpe_train(
        {r["w"]: r["c"] for r in freq_rows}, int(n_merges)
    )
    spark = corpus.sparkSession
    # the fit CARRIES its word-split rule twice over: a constant column
    # (human-greppable, survives any row-level handling) AND column
    # metadata (survives EMPTY fits — a zero-merge table is a
    # legitimate char-level tokenizer, and rows can't carry what zero
    # rows don't have).  Applies and artifact writers derive the rule
    # from the frame instead of trusting a caller to re-state it —
    # re-stating is exactly where a CJK fit silently regressed to the
    # ascii default (r9 review).
    return spark.createDataFrame(
        [(i, a, b, word_split) for i, (a, b) in enumerate(merges)],
        "rank bigint, left string, right string, word_split string",
    ).withMetadata("word_split", {_RULE_META: word_split})


def apply_bpe(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    ids: DataFrame | None = None,
    word_split: str | None = None,
) -> DataFrame:
    """Tokenize ``text_col`` under a fitted merge table: adds
    ``out_col`` (array<string> of subword units, each word terminated
    by the ``</w>`` marker) and ``n_{out_col}`` (their count).
    ``ids``: an id table (:func:`subword_vocab`) — when given, also
    adds ``{out_col}_ids`` (array<int>, unknown pieces at the unk id):
    the trainable integer form.

    Plan: the merge table collects to a rank dict (vocab-sized) and
    ships in the UDF closure; the pass is one Arrow-batched pandas
    UDF over the scan — no shuffle, no join.  The word-split rule is
    DERIVED from the merge frame itself (the fits carry it as column
    metadata + a constant column), so a CJK fit cannot silently
    regress to the ascii default; pass ``word_split`` only for
    hand-built frames without either — an explicit value conflicting
    with the carried one raises.  The resolved rule is stamped as
    metadata on ``out_col``, so :func:`subword_vocab` derives it from
    the encoded frame.  Splitting via ``py_word_splitter`` (the exact
    Python twin of ``ordered_words_expr``) keeps ``n_bpe_tokens``
    composing with the token-budget operators downstream.  Per-batch
    distinct-word caching makes throughput scale with distinct words
    per batch, not total words.  The UDF closure is fully
    self-contained (see :func:`_by_value`): executors do not need
    this package on PYTHONPATH for the tokenizer applies."""
    from pyspark.sql.functions import pandas_udf

    word_split = _frame_rule(merges, word_split)
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }
    encode_batch = _make_bpe_encoder(ranks, word_split)

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts):
        import pandas as pd

        return pd.Series(encode_batch(texts))

    out = df.withColumn(out_col, encode(F.col(text_col)))
    out = out.withMetadata(out_col, {_RULE_META: word_split})
    out = out.withColumn(f"n_{out_col}", F.size(F.col(out_col)))
    if ids is not None:
        out = tokens_to_ids(out, ids, out_col)
    return out


def _viterbi_segment(
    word: str, logp: dict[str, float], max_len: int, floor: float
) -> list[str]:
    """Best unigram-LM segmentation of ``word``: maximize the sum of
    piece log-probs (Kudo 2018 §3.2's decoding step).  Any character
    absent from the vocab falls back to a single-char piece at the
    ``floor`` log-prob, so every word segments.  Deterministic: ties
    keep the FIRST candidate found scanning piece lengths 1..max_len
    at each end position (strict ``>`` comparison), so equal-score
    segmentations resolve to the shortest-piece split — the same
    iteration order every run."""
    n = len(word)
    best = [0.0] + [float("-inf")] * n  # best score for prefix [:i]
    back: list[int] = [0] * (n + 1)     # piece start for prefix [:i]
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            piece = word[i - ln : i]
            lp = logp.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = floor
            cand = best[i - ln] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = i - ln
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _unigram_train(
    word_freq: dict[str, int],
    vocab_size: int,
    max_piece_len: int,
    em_iters: int,
    seed_size: int,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Unigram-LM vocabulary fit over a word-frequency table (Kudo
    2018, "Subword Regularization" — the SentencePiece unigram
    trainer's shape, driver-side like ``_bpe_train``):

      seed (frequent substrings) -> [EM -> prune lowest-prob pieces]*
      until ``vocab_size`` -> final EM.

    Two documented simplifications, both standard practice and both
    chosen for DETERMINISM on a persisted, shared artifact:
    Viterbi (hard) EM instead of forward-backward soft counts, and
    probability-ranked pruning instead of Kudo's exact per-piece
    loss-delta ranking.  Single-character pieces are never pruned
    (every word must remain segmentable).  All selections tie-break
    on the piece string, so two fits over one table are identical."""
    # seed: every substring up to max_piece_len, occurrence-weighted
    seed_counts: dict[str, int] = {}
    for w, c in word_freq.items():
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                p = w[i : i + ln]
                seed_counts[p] = seed_counts.get(p, 0) + c
    chars = {p for p in seed_counts if len(p) == 1}
    multi = sorted(
        (p for p in seed_counts if len(p) > 1),
        key=lambda p: (-seed_counts[p] * len(p), p),
    )[: max(seed_size - len(chars), 0)]
    vocab = {p: seed_counts[p] for p in chars}
    vocab.update((p, seed_counts[p]) for p in multi)

    import math

    def _estimate(counts: dict[str, int]) -> dict[str, float]:
        total = sum(counts.values())
        return {p: math.log(c / total) for p, c in counts.items() if c > 0}

    logp = _estimate(vocab)
    floor = min(logp.values()) - 10.0
    while True:
        for _ in range(max(em_iters, 1)):
            counts: dict[str, int] = {}
            for w, c in word_freq.items():
                for piece in _viterbi_segment(
                    w, logp, max_piece_len, floor
                ):
                    counts[piece] = counts.get(piece, 0) + c
            # single chars survive at count floor 1: a char squeezed
            # out of every Viterbi path this round must stay reachable
            # for unseen words at apply time
            for ch in chars:
                counts[ch] = max(counts.get(ch, 0), 1)
            logp = _estimate(counts)
            floor = min(logp.values()) - 10.0
        if len(logp) <= vocab_size:
            return logp
        # prune the lowest-probability multi-char pieces, at most
        # prune_frac of the overage-eligible set per round (the
        # SentencePiece shrinking schedule), never below vocab_size
        prunable = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (logp[p], p),
        )
        n_over = len(logp) - vocab_size
        n_drop = min(
            max(int(len(prunable) * prune_frac), 1), n_over, len(prunable)
        )
        if n_drop <= 0:
            return logp  # vocab_size smaller than the char alphabet
        for p in prunable[:n_drop]:
            del logp[p]


def fit_unigram_vocab(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 512,
    max_piece_len: int = 8,
    em_iters: int = 2,
    seed_size: int | None = None,
    sample_pct: int | None = None,
    max_words: int = 50_000,
    word_split: str = "ascii-space-v1",
) -> DataFrame:
    """Fit a unigram-LM subword vocabulary: (piece, logp), logp the
    fitted log-probability (base e).  The corpus reduces to the same
    capped word-frequency table as :func:`fit_bpe_merges` (one narrow
    map-side-combined shuffle; driver work is O(max_words) not
    O(corpus)), then the Kudo 2018 seed->EM->prune loop runs
    driver-side (see :func:`_unigram_train` for the two documented
    determinism-first simplifications).

    ``vocab_size`` is an UPPER bound: hard-EM assigns each word one
    best path, so pieces off every best path hit count zero and drop
    in a single EM round — on small or low-entropy corpora the fit
    converges well below the bound (soft-EM's fractional counts would
    keep them; the determinism trade is documented in
    :func:`_unigram_train`).  Downstream code must size against
    ``vocab.count()``, not the requested bound.

    ``sample_pct``: deterministic portable-hash percentage sample,
    same recipe as ``fit_bpe_merges``/``fit_ivf_centroids``.
    ``word_split``: same contract as :func:`fit_bpe_merges` — fit CJK
    corpora under ``cjk-char-v1`` and keep the rule consistent through
    apply/write (the pinning refuses drift).

    Not DuckDB-oracle-able (iterative driver-side fit); gated in
    pytest on a worked example, fit determinism, apply round-trip,
    and composition with the token-budget operators."""
    sample = corpus.select(F.col(id_col), F.col(text_col))
    if sample_pct is not None:
        bucket = hash_bucket_expr("spark", id_col, 100)
        sample = sample.filter(F.expr(bucket) < int(sample_pct))
    words = (
        f"filter({ordered_words_expr('spark', text_col, word_split)},"
        f" w -> w != '')"
    )
    freq_rows = (
        sample.select(F.explode(F.expr(words)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(int(max_words))
        .collect()
    )
    spark = corpus.sparkSession
    word_freq = {r["w"]: r["c"] for r in freq_rows}
    schema = "piece string, logp double, word_split string"
    if not word_freq:
        # empty / whitespace-only corpus: an empty vocab, cleanly —
        # the same contract as fit_bpe_merges' empty merge table
        # (apply_unigram refuses an empty vocab explicitly); the
        # metadata stamp keeps even THIS frame's rule derivable
        return spark.createDataFrame([], schema).withMetadata(
            "word_split", {_RULE_META: word_split}
        )
    logp = _unigram_train(
        word_freq,
        int(vocab_size),
        int(max_piece_len),
        int(em_iters),
        int(seed_size) if seed_size is not None else 8 * int(vocab_size),
    )
    # rule carried on the artifact (rows + metadata) — see
    # fit_bpe_merges
    return spark.createDataFrame(
        sorted(
            ((p, lp, word_split) for p, lp in logp.items()),
            key=lambda t: (-t[1], t[0]),
        ),
        schema,
    ).withMetadata("word_split", {_RULE_META: word_split})


def apply_unigram(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int | None = None,
    ids: DataFrame | None = None,
    word_split: str | None = None,
) -> DataFrame:
    """Tokenize ``text_col`` under a fitted unigram vocab: adds
    ``out_col`` (array<string>; each word's LAST piece carries the
    ``</w>`` marker, so ``concat(tokens) == concat(word + '</w>')`` —
    the same reconstruction contract as :func:`apply_bpe`) and
    ``n_{out_col}``.  ``ids``: an id table (:func:`subword_vocab`) —
    when given, also adds ``{out_col}_ids`` (array<int>).

    ``max_piece_len`` defaults to the vocab's own longest piece (the
    vocab is collected here anyway) — a fixed default smaller than the
    fit's reach would silently drop longer pieces from Viterbi's
    lookups, the same drift hazard :func:`write_unigram_vocab`
    documents.  Pass it explicitly only to deliberately CAP lookup
    cost below the vocab's reach.

    Plan: identical to ``apply_bpe`` — the vocab collects to a dict
    that ships in the Arrow-batched UDF closure (no shuffle, no join),
    Viterbi runs per DISTINCT word per batch (cached), and the word
    split is ``ordered_words_expr``'s exact rule so ``n_*`` composes
    with the token-budget operators; the resolved rule is stamped as
    metadata on ``out_col`` and the closure is self-contained
    (:func:`_by_value` — no package needed on executor PYTHONPATH).
    Characters never seen at fit time segment as single-char pieces
    at a floor log-prob rather than failing the batch."""
    from pyspark.sql.functions import pandas_udf

    logp = {r["piece"]: r["logp"] for r in vocab.collect()}
    if not logp:
        raise ValueError("apply_unigram: empty vocab")
    floor = min(logp.values()) - 10.0
    max_len = (
        int(max_piece_len)
        if max_piece_len is not None
        else max(len(p) for p in logp)
    )

    word_split = _frame_rule(vocab, word_split)
    encode_batch = _make_unigram_encoder(
        logp, max_len, floor, _EOW, word_split
    )

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts):
        import pandas as pd

        return pd.Series(encode_batch(texts))

    out = df.withColumn(out_col, encode(F.col(text_col)))
    out = out.withMetadata(out_col, {_RULE_META: word_split})
    out = out.withColumn(f"n_{out_col}", F.size(F.col(out_col)))
    if ids is not None:
        out = tokens_to_ids(out, ids, out_col)
    return out


# ---------------------------------------------------------------------------
# Token IDS — the last inch between subword pieces and a trainable
# shard: every actual training pipeline consumes INTEGER ids against a
# frozen vocabulary, not piece strings.  The id table is its own
# persisted artifact (write_subword_ids) with the assignment rule
# pinned, exactly like the merge ranks.
# ---------------------------------------------------------------------------

#: reserved ids: 0 pads sequences, 1 is every piece outside the frozen
#: vocabulary (a character unseen at vocab time, or a piece from a
#: different tokenizer artifact).
PAD_PIECE = "<pad>"
UNK_PIECE = "<unk>"
PAD_ID = 0
UNK_ID = 1

#: the deterministic id-assignment rule, pinned on the persisted table:
#: specials at 0/1, then every observed piece in lexicographic order.
#: Versioned like the word-split rule — ids encode corpora that outlive
#: any one process, so the assignment must never silently change.
_ID_ASSIGN_RULE = "piece-asc-v1"


def subword_vocab(
    encoded: DataFrame,
    tokens_col: str,
    word_split: str | None = None,
    extra_specials: tuple[str, ...] = (),
) -> DataFrame:
    """Freeze the integer vocabulary of an ENCODED corpus: (id int,
    piece string, word_split, is_special) with ``<pad>``=0,
    ``<unk>``=1, then every distinct piece observed in ``tokens_col``
    in lexicographic order (the ``piece-asc-v1`` rule — a pure
    function of the (declared specials, piece set) pair, so two
    builds over the same encoded corpus are identical).

    ``extra_specials``: additional reserved sentinel pieces assigned
    the ids 2..k+1 in the DECLARED order, ahead of every corpus piece
    — the FIM transform's ``<fim_prefix>/<fim_middle>/<fim_suffix>``
    sentinels, a ``<doc>`` separator, instruction-format role markers.
    Declaring them at vocab-freeze time is what keeps their ids
    stable: appending specials to an existing vocab would renumber
    nothing, but RE-freezing with different specials renumbers every
    corpus piece, which is why :func:`write_subword_ids` pins the
    special block and the readback refuses drift.  Sentinels never
    collide with tokenizer output (collision with a corpus piece
    raises below), so ``tokens_to_ids`` can never emit them by
    accident — they enter id streams only through explicit ops like
    ``pack_token_windows(eos_id=...)`` or ``fim_transform``.

    The word-split rule is DERIVED from ``tokens_col``'s column
    metadata (``apply_bpe``/``apply_unigram`` stamp the rule they
    encoded under), not defaulted: a CJK pipeline that built its id
    artifact through this function used to pin ``ascii-space-v1``
    unless the caller remembered to restate the rule — the exact
    restate-drift failure the fit artifacts already refuse (r9
    advice).  Pass ``word_split`` explicitly ONLY for hand-built
    encoded frames without the stamp; an explicit value conflicting
    with the stamp raises, and a frame with neither raises rather
    than guess.

    Built from the encoded output, not the fit artifact, because the
    output token inventory is larger than the fit vocabulary: BPE
    emits unmerged alphabet characters the merge table never names,
    and unigram emits both ``p`` and ``p</w>`` forms of each piece.
    Encoding the fit corpus once and freezing what it actually emits
    is the standard vocabulary-finalization step; pieces that appear
    only in LATER corpora map to ``<unk>`` by construction.

    Scale: one explode -> map-side-combined DISTINCT (vocab-sized
    output), then a model-sized driver collect — the same shuffle
    shape and collect discipline as the fits.

    PERSIST the encoded frame first when its lineage is deep (filters
    over higher-order lambdas, e.g. exact_substring_dedup output):
    Spark 4's optimizer can collapse the tokenizer's pandas UDF into
    this explode+distinct aggregate and then fail with INTERNAL_ERROR
    "Cannot evaluate expression" — and you want one encode pass shared
    with :func:`tokens_to_ids` anyway (the pattern in
    examples/training_data_pipeline.py).  A caller who doesn't is
    still covered: on that specific internal error this function
    retries once behind a ``localCheckpoint`` barrier of the projected
    token column (a second, avoidable encode pass — the persist advice
    stands)."""

    def _distinct_pieces(frame):
        return (
            frame.select(F.explode(F.col(tokens_col)).alias("piece"))
            .distinct()
            .collect()
        )

    carried = _column_rule(encoded, tokens_col)
    if word_split is None:
        if carried is None:
            raise ValueError(
                f"subword_vocab: {tokens_col!r} carries no word-split "
                f"stamp (apply_bpe/apply_unigram output does) and no "
                f"explicit word_split= was given — refusing to pin a "
                f"default rule on a persisted id artifact"
            )
        word_split = carried
    elif carried is not None and carried != word_split:
        raise ValueError(
            f"subword_vocab: {tokens_col!r} was encoded under "
            f"word-split rule {carried!r}; explicit {word_split!r} "
            f"would pin the wrong rule on the id artifact"
        )
    specials = [PAD_PIECE, UNK_PIECE] + list(extra_specials)
    if len(set(specials)) != len(specials):
        raise ValueError(
            f"subword_vocab: duplicate special pieces in {specials}"
        )
    try:
        rows = _distinct_pieces(encoded)
    except Exception as exc:  # narrow retry: the known Spark 4 collapse
        if "Cannot evaluate expression" not in str(exc):
            raise
        rows = _distinct_pieces(
            encoded.select(tokens_col).localCheckpoint(eager=True)
        )
    pieces = sorted(r["piece"] for r in rows)
    clash = set(specials).intersection(pieces)
    if clash:
        # a corpus piece spelled exactly like a special would give two
        # ids one string — decode becomes ambiguous; refuse loudly
        raise ValueError(
            f"subword_vocab: corpus emits pieces colliding with the "
            f"reserved specials: {sorted(clash)}"
        )
    _check_rule(word_split)
    spark = encoded.sparkSession
    rows = [
        (i, s, word_split, True) for i, s in enumerate(specials)
    ] + [
        (i + len(specials), p, word_split, False)
        for i, p in enumerate(pieces)
    ]
    return spark.createDataFrame(
        rows, "id int, piece string, word_split string, is_special boolean"
    ).withMetadata("word_split", {_RULE_META: word_split})


def tokens_to_ids(
    df: DataFrame,
    vocab_ids: DataFrame,
    tokens_col: str,
    out_col: str | None = None,
    unk_id: int = UNK_ID,
) -> DataFrame:
    """Map a piece array to its integer ids under a frozen id table:
    adds ``out_col`` (default ``{tokens_col}_ids``, array<int>).
    Pieces outside the table map to ``unk_id`` — encountering them is
    expected (new corpora contain new characters), losing them
    silently is not.

    Plan: the id table collects to a dict (vocab-sized) shipped in an
    Arrow-batched UDF closure — one shuffle-free pass, the same shape
    as the tokenizer applies."""
    from pyspark.sql.functions import pandas_udf

    mapping = {r["piece"]: r["id"] for r in vocab_ids.collect()}

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def to_ids(arrs):
        import pandas as pd

        return pd.Series(
            [
                None
                if a is None
                else [mapping.get(p, unk_id) for p in a]
                for a in arrs
            ]
        )

    return df.withColumn(out_col or f"{tokens_col}_ids", to_ids(F.col(tokens_col)))


def ids_to_tokens(
    df: DataFrame,
    vocab_ids: DataFrame,
    ids_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Inverse of :func:`tokens_to_ids`: ids back to piece strings
    (unknown ids render as ``<unk>``).  Adds ``out_col`` (default
    ``{ids_col}_pieces``).  Same Arrow-batched vocab-in-closure
    shape."""
    from pyspark.sql.functions import pandas_udf

    inverse = {r["id"]: r["piece"] for r in vocab_ids.collect()}

    @pandas_udf(T.ArrayType(T.StringType()))
    def to_pieces(arrs):
        import pandas as pd

        return pd.Series(
            [
                None
                if a is None
                else [inverse.get(i, UNK_PIECE) for i in a]
                for a in arrs
            ]
        )

    return df.withColumn(
        out_col or f"{ids_col}_pieces", to_pieces(F.col(ids_col))
    )


def tokens_to_text(
    df: DataFrame, tokens_col: str, out_col: str
) -> DataFrame:
    """Reconstruct text from a piece array under the ``</w>``
    contract (``concat(tokens) == concat(word + '</w>')``): pieces
    concatenate, end-of-word markers become spaces, the trailing space
    trims.  Pure JVM expressions — no UDF — so the decode leg of the
    ids round trip costs one projection.

    LIMITATION (inherent to the marker scheme, see ``_EOW``): a word
    whose content contains the literal ``</w>`` decodes with that
    substring replaced by a space — the concatenated representation
    cannot distinguish content markers from appended ones (token
    boundaries don't disambiguate either: merges can end a piece at a
    content marker).  Pinned by
    ``test_tokens_to_text_marker_collision``; scrub the marker
    upstream when decode fidelity matters."""
    return df.withColumn(
        out_col,
        F.expr(f"rtrim(replace(array_join({tokens_col}, ''), '{_EOW}', ' '))"),
    )


# ---------------------------------------------------------------------------
# Persisted tokenizer artifacts: the same pinned-parameter discipline as
# the LSH/ANN index tables (operators/dedup.py write_lsh_index) — the
# parameters that silently change tokenization if they drift between fit
# and apply are stored ON the table, and the readers fail fast on a
# table that is not the right kind of artifact.
#
# Property keys say "subword", never "tokenizer": SHOW TBLPROPERTIES
# redacts values whose KEY matches spark.sql.redaction.regex, which
# includes the substring "token" — 'maw.tokenizer.kind' reads back as
# '*********(redacted)'.
# ---------------------------------------------------------------------------

#: the DEFAULT word-split rule (ordered_words_expr: trim ASCII spaces,
#: split on space runs).  Rules are versioned and pinned on every
#: artifact so a rule change can never silently re-tokenize corpora
#: encoded under the old rule; fit/apply/write all take ``word_split``
#: and the table readers thread the pinned value back.  CJK corpora
#: need ``cjk-char-v1`` — see ordered_words_expr's limitation note.
_WORD_SPLIT_RULE = "ascii-space-v1"


def _check_rule(word_split: str) -> str:
    if word_split not in WORD_SPLIT_RULES:
        raise ValueError(
            f"unknown word-split rule {word_split!r}; "
            f"registered: {WORD_SPLIT_RULES}"
        )
    return word_split


def _column_rule(frame: DataFrame, col: str) -> str | None:
    """The word-split rule stamped as metadata on ``col`` (the fits
    stamp their ``word_split`` column, the applies their output tokens
    column), or None for unstamped hand-built frames."""
    if col not in frame.columns:
        return None
    meta = frame.schema[col].metadata or {}
    return meta.get(_RULE_META)


def _frame_rule(frame: DataFrame, explicit: str | None) -> str:
    """The word-split rule an artifact frame CARRIES (column metadata
    and/or the constant ``word_split`` column the fits emit),
    reconciled with an explicit caller value: the artifact wins, a
    conflicting explicit value raises, and a frame carrying neither
    (hand-built) falls back to the explicit value or the default.
    This is what stops a CJK fit from silently regressing to the
    ascii default when a caller forgets to re-state the rule at
    apply/write time.  Metadata is checked FIRST (free — no job) and
    covers empty fits, whose zero rows carry nothing; a frame whose
    metadata and rows disagree raises — someone rewrote one without
    the other."""
    carried = _column_rule(frame, "word_split")
    if "word_split" in frame.columns:
        vals = [
            r["word_split"]
            for r in frame.select("word_split").distinct().collect()
            if r["word_split"] is not None
        ]
        if len(vals) > 1:
            raise ValueError(
                f"artifact carries MIXED word-split rules {sorted(vals)} "
                f"— refusing to guess"
            )
        row_rule = vals[0] if vals else None
        if carried is not None and row_rule is not None and carried != row_rule:
            raise ValueError(
                f"artifact metadata pins word-split rule {carried!r} but "
                f"its rows carry {row_rule!r} — refusing to guess"
            )
        carried = carried if carried is not None else row_rule
    if carried is None:
        return _check_rule(
            explicit if explicit is not None else _WORD_SPLIT_RULE
        )
    if explicit is not None and explicit != carried:
        raise ValueError(
            f"artifact was fitted under word-split rule {carried!r}; "
            f"explicit {explicit!r} would silently mis-segment"
        )
    return _check_rule(carried)


def write_bpe_merges(
    merges: DataFrame, table: str, word_split: str | None = None
) -> None:
    """Persist a fitted BPE merge table with its contract pinned as
    table properties: the word-split rule — DERIVED from the frame's
    carried ``word_split`` column (the fits emit it), never trusted
    from a caller default, so a CJK fit written without re-stating
    the rule pins the RIGHT rule; an explicit conflicting value
    raises — and the end-of-word marker.  Overwrites ``table``."""
    rule = _frame_rule(merges, word_split)
    spark = merges.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    merges.write.format("parquet").saveAsTable(table)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'maw.subword.kind' = 'bpe',"
        f"'maw.subword.word_split' = '{rule}',"
        f"'maw.subword.eow' = '{_EOW}')"
    )


def write_unigram_vocab(
    vocab: DataFrame,
    table: str,
    max_piece_len: int | None = None,
    word_split: str | None = None,
) -> None:
    """Persist a fitted unigram vocab.  ``max_piece_len`` is pinned:
    applying with a SMALLER value than the fit's silently drops every
    longer piece from Viterbi's reach — a wrong-segmentation hazard,
    not an error Spark would raise — so the reader hands the pinned
    value back and :func:`apply_unigram_table` threads it through.

    The pinned value is DERIVED from the vocab itself (the longest
    piece's length — lookups past that can never match, so it is
    functionally the fit's reach) rather than trusted from the caller:
    a caller-supplied default that disagreed with the fit would
    re-create exactly the drift this mechanism exists to close.  An
    explicit ``max_piece_len`` below the derived reach raises."""
    spark = vocab.sparkSession
    derived = (
        vocab.agg(F.max(F.length("piece"))).first()[0] or 1
    )
    if max_piece_len is None:
        max_piece_len = derived
    elif int(max_piece_len) < derived:
        raise ValueError(
            f"max_piece_len={max_piece_len} is below the vocab's "
            f"longest piece ({derived} chars) — applying with it would "
            f"silently drop longer pieces from Viterbi's reach"
        )
    # rule DERIVED from the frame's carried column, like every other
    # pin on this table (see write_bpe_merges / the r8 lesson)
    rule = _frame_rule(vocab, word_split)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    vocab.write.format("parquet").saveAsTable(table)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'maw.subword.kind' = 'unigram',"
        f"'maw.subword.word_split' = '{rule}',"
        f"'maw.subword.eow' = '{_EOW}',"
        f"'maw.subword.max_piece_len' = '{int(max_piece_len)}')"
    )


def write_subword_ids(
    vocab_ids: DataFrame, table: str, word_split: str | None = None
) -> None:
    """Persist a frozen id table (:func:`subword_vocab`) with its
    contract pinned: word-split rule, end-of-word marker, pad/unk ids,
    the SPECIAL BLOCK (count + comma-joined pieces — extra sentinels
    declared at freeze time renumber every corpus piece, so they are
    part of the assignment contract), and the id-assignment rule —
    the parameters that silently re-map a corpus encoded under the
    old table if they drift.  The pinned pad/unk ids are DERIVED from
    the table (the rows carrying the special pieces), not trusted
    from callers, and the table is validated dense (ids 0..N-1,
    unique pieces, specials contiguous at the head) before the write
    — a ragged id space would corrupt every embedding matrix sized
    off it.  Overwrites ``table``."""
    rows = vocab_ids.orderBy("id").collect()
    ids = [r["id"] for r in rows]
    pieces = [r["piece"] for r in rows]
    if ids != list(range(len(ids))):
        raise ValueError(
            f"write_subword_ids: ids must be dense 0..{len(ids) - 1}"
        )
    if len(set(pieces)) != len(pieces):
        raise ValueError("write_subword_ids: duplicate pieces")
    by_piece = {p: i for i, p in zip(ids, pieces)}
    if by_piece.get(PAD_PIECE) != PAD_ID or by_piece.get(UNK_PIECE) != UNK_ID:
        raise ValueError(
            f"write_subword_ids: specials must sit at "
            f"{PAD_PIECE}={PAD_ID}, {UNK_PIECE}={UNK_ID}; got "
            f"{by_piece.get(PAD_PIECE)}, {by_piece.get(UNK_PIECE)}"
        )
    # the special block (pad/unk + any extra sentinels declared at
    # vocab-freeze time) must be CONTIGUOUS at the head — ids after it
    # are the lexicographic corpus assignment; a special buried among
    # corpus pieces means the frame was hand-edited.  Frames without
    # the is_special column (pre-sentinel builds) have exactly the two
    # reserved specials.
    if "is_special" in vocab_ids.columns:
        flags = [r["is_special"] for r in rows]
        n_specials = sum(1 for f in flags if f)
        if flags[:n_specials] != [True] * n_specials:
            raise ValueError(
                "write_subword_ids: special pieces must occupy the "
                "contiguous id block 0..n_specials-1"
            )
    else:
        n_specials = 2
    special_pieces = pieces[:n_specials]
    if any("'" in s or "," in s for s in special_pieces):
        raise ValueError(
            f"write_subword_ids: special pieces {special_pieces} may "
            f"not contain quotes or commas (they pin as a "
            f"comma-joined table property)"
        )
    specials_prop = ",".join(special_pieces)
    # rule DERIVED from the frame's carried column (subword_vocab
    # emits it), never trusted from a caller default
    rule = _frame_rule(vocab_ids, word_split)
    spark = vocab_ids.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    vocab_ids.write.format("parquet").saveAsTable(table)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'maw.subword.kind' = 'ids',"
        f"'maw.subword.word_split' = '{rule}',"
        f"'maw.subword.eow' = '{_EOW}',"
        f"'maw.subword.pad_id' = '{PAD_ID}',"
        f"'maw.subword.unk_id' = '{UNK_ID}',"
        f"'maw.subword.n_specials' = '{n_specials}',"
        f"'maw.subword.specials' = '{specials_prop}',"
        f"'maw.subword.id_assign' = '{_ID_ASSIGN_RULE}')"
    )


def read_subword_ids(spark, table: str) -> tuple[DataFrame, int, int]:
    """Load a persisted id table, validating the pinned contract (kind
    + word-split rule + id-assignment rule); returns (vocab_ids,
    pad_id, unk_id)."""
    props = _tokenizer_props(spark, table, "ids")
    if props.get("maw.subword.id_assign") != _ID_ASSIGN_RULE:
        raise ValueError(
            f"{table} assigns ids under rule "
            f"{props.get('maw.subword.id_assign')!r}; this build "
            f"expects {_ID_ASSIGN_RULE!r} — ids would not compose "
            f"with corpora encoded here"
        )
    return (
        spark.table(table),
        int(props["maw.subword.pad_id"]),
        int(props["maw.subword.unk_id"]),
    )


def _tokenizer_props(spark, table: str, kind: str) -> dict:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    props = {r["key"]: r["value"] for r in rows}
    got = props.get("maw.subword.kind")
    if got != kind:
        raise ValueError(
            f"{table} is not a persisted {kind} tokenizer "
            f"(maw.subword.kind = {got!r})"
        )
    rule = props.get("maw.subword.word_split")
    if rule not in WORD_SPLIT_RULES:
        raise ValueError(
            f"{table} was fitted under word-split rule {rule!r}, which "
            f"this build does not implement (registered: "
            f"{WORD_SPLIT_RULES}) — applying a different rule would "
            f"silently mis-segment; token counts would not compose"
        )
    return props


def read_bpe_merges(spark, table: str) -> DataFrame:
    """Load a persisted BPE merge table, validating the pinned
    contract (kind + word-split rule)."""
    _tokenizer_props(spark, table, "bpe")
    return spark.table(table)


def read_unigram_vocab(spark, table: str) -> tuple[DataFrame, int]:
    """Load a persisted unigram vocab; returns (vocab,
    max_piece_len) with the pinned fit-time piece-length bound."""
    props = _tokenizer_props(spark, table, "unigram")
    return spark.table(table), int(props["maw.subword.max_piece_len"])


def _pinned_rule(spark, table: str, kind: str, kw: dict) -> dict:
    """Resolve the word-split rule for a table-backed apply: the
    table's pinned value wins; an EXPLICIT caller value that disagrees
    raises (silently preferring either side would re-create the drift
    the pinning exists to close).  Sets ``kw['word_split']`` in place
    and returns the full props dict so callers read their other pins
    (max_piece_len) without a second SHOW TBLPROPERTIES round trip."""
    props = _tokenizer_props(spark, table, kind)
    pinned = props["maw.subword.word_split"]
    explicit = kw.get("word_split")
    if explicit is not None and explicit != pinned:
        raise ValueError(
            f"{table} was fitted under word-split rule {pinned!r}; "
            f"applying with {explicit!r} would silently mis-segment"
        )
    kw["word_split"] = pinned
    return props


def apply_bpe_table(df: DataFrame, table: str, **kw) -> DataFrame:
    """:func:`apply_bpe` under a persisted merge table, with the
    fit-time word-split rule threaded through (a conflicting explicit
    ``word_split`` raises)."""
    spark = df.sparkSession
    _pinned_rule(spark, table, "bpe", kw)
    return apply_bpe(df, spark.table(table), **kw)


def apply_unigram_table(df: DataFrame, table: str, **kw) -> DataFrame:
    """:func:`apply_unigram` under a persisted vocab, with the
    fit-time ``max_piece_len`` AND word-split rule threaded through
    automatically (a conflicting explicit ``word_split`` raises)."""
    spark = df.sparkSession
    props = _pinned_rule(spark, table, "unigram", kw)
    return apply_unigram(
        df,
        spark.table(table),
        max_piece_len=int(props["maw.subword.max_piece_len"]),
        **kw,
    )
