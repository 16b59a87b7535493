"""Dialect-portable SQL expression builders.

The dedup / fingerprint / similarity operators must hash *identically* in
the engine (Spark) and the oracle (DuckDB) — neither engine exposes the
other's native hash. These builders emit the same arithmetic in both
dialects from one template:

  * ``hex_to_i32`` — positional hex-digit parse of an md5 prefix:
    deterministic 32-bit hash available everywhere md5 + instr + substr
    exist. All arithmetic is explicit-BIGINT so Spark's ANSI mode cannot
    overflow and DuckDB's INTEGER ops cannot saturate.
  * ``word_hashes`` — md5 computed ONCE per word via chained
    transforms, then hex-parsed (avoids 8x md5 recomputation).
  * minhash / band / rolling-hash / simhash builders on top.

Dialect cheat sheet (spark | duckdb):
  transform | list_transform,  array_min | list_min,
  aggregate | list_reduce(list_prepend(init, ...)),
  element_at(a,i) | a[i]   (both 1-based),
  size | len,  array_distinct | list_distinct,
  sequence(1,n) incl. | range(1,n+1) excl.

Everything here is a *string* expression: Spark consumes it via
``F.expr`` (JVM-side, codegen'd — no Python in the hot path), DuckDB via
the oracle SQL text.
"""

from __future__ import annotations

MERSENNE31 = 2_147_483_647  # 2^31 - 1, the modulus for all rolling hashes

# Deterministic universal-hash coefficients (k-th minhash permutation:
# h_k(x) = (A[k]*x + B[k]) mod 2^31-1). A[k] < 2^20 keeps A*x < 2^52.
def _coeff_a(k: int) -> int:
    return (999_983 * (k + 1) + 124_651) % 1_000_003 + 1


def _coeff_b(k: int) -> int:
    return (777_767 * (k + 1) + 911_382_323) % MERSENNE31


def hex_word_expr(h: str, start: int = 1) -> str:
    """Parse 8 hex chars of ``h`` beginning at 1-based ``start`` into a
    BIGINT in [0, 2^32).  Identical text in both dialects
    (instr/substr/casts exist in both)."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {start + i}, 1)) - 1)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    )
    return f"({terms})"


def hex_to_i32(h: str) -> str:
    """Parse the first 8 hex chars of ``h`` into a BIGINT in [0, 2^32)."""
    return hex_word_expr(h, 1)


#: character class for the cjk-char-v1 split rule: CJK Unified
#: Ideographs, Hiragana, Katakana (+ phonetic extensions), and
#: halfwidth Katakana — scripts written WITHOUT spaces, where the
#: ascii-space rule degrades a whole line to one "word".
_CJK_CHAR_CLASS = (
    "[一-鿿぀-ヿㇰ-ㇿｦ-ﾟ]"
)

#: registered word-split rules (ordered_words_expr / py_word_splitter).
#: Versioned because persisted artifacts (subword tokenizers, id
#: tables) pin the rule they were fitted under — a silent rule change
#: would re-segment corpora encoded under the old rule.
WORD_SPLIT_RULES = ("ascii-space-v1", "cjk-char-v1")


def ordered_words_expr(
    dialect: str, text: str, rule: str = "ascii-space-v1"
) -> str:
    """Words of a text column in document order.
    Use for order-sensitive ops: shingling, rolling fingerprints.

    Rules:
      * ``ascii-space-v1`` (default): trim ASCII spaces, split on
        space RUNS.  **Limitation — scriptio continua scripts**: CJK,
        Thai, Lao, Khmer text carries no spaces, so an entire line
        becomes ONE "word" under this rule — silently degrading every
        consumer (Gopher repetition stats, BPE/unigram fits, DSIR
        n-grams, batch_drift, domain_similarity) on exactly the
        multilingual corpora those operators exist for.
      * ``cjk-char-v1``: every CJK ideograph / kana character becomes
        its own word (spaced out before the ascii-space split) — the
        standard character-level fallback for Chinese/Japanese
        (XLM-R/mT5 pretokenizers do the same).  Thai/Khmer still need
        a dictionary segmenter and remain one-word-per-run under this
        rule; plug a real segmenter upstream for those.

    The persisted tokenizer artifacts pin the rule as a table
    property and their readers fail fast on a mismatch."""
    if rule == "ascii-space-v1":
        if dialect == "spark":
            return f"split(trim({text}), ' +')"
        # trim must name the character set: DuckDB's one-arg trim
        # strips Unicode whitespace (U+00A0 etc.) while Spark's strips
        # only ASCII space — a NBSP-padded document diverged (found by
        # hypothesis).
        return f"string_split_regex(trim({text}, ' '), ' +')"
    if rule == "cjk-char-v1":
        cls = _CJK_CHAR_CLASS
        if dialect == "spark":
            spaced = f"regexp_replace({text}, '({cls})', ' $1 ')"
            return f"split(trim({spaced}), ' +')"
        # DuckDB (RE2): backslash group refs and an explicit 'g' flag
        # (its regexp_replace is first-match-only by default)
        spaced = f"regexp_replace({text}, '({cls})', ' \\1 ', 'g')"
        return f"string_split_regex(trim({spaced}, ' '), ' +')"
    raise ValueError(
        f"unknown word-split rule {rule!r}; registered: {WORD_SPLIT_RULES}"
    )


def py_word_splitter(rule: str = "ascii-space-v1"):
    """The Python-side twin of :func:`ordered_words_expr` for
    Arrow-batched UDF closures (the tokenizer applies): returns
    ``text -> [words]`` implementing the EXACT same rule, empty words
    dropped.  Keep the two in lockstep — the fit consumes the SQL
    side, the apply the Python side, and they must segment
    identically or token counts stop composing."""
    import re

    sp = re.compile(" +").split
    if rule == "ascii-space-v1":
        return lambda t: [w for w in sp(t.strip(" ")) if w]
    if rule == "cjk-char-v1":
        cjk = re.compile(f"({_CJK_CHAR_CLASS})")

        def split_cjk(t):
            return [w for w in sp(cjk.sub(r" \1 ", t).strip(" ")) if w]

        return split_cjk
    raise ValueError(
        f"unknown word-split rule {rule!r}; registered: {WORD_SPLIT_RULES}"
    )


def round_to_expr(dialect: str, x: str, k: int) -> str:
    """Portable fixed-place rounding of a DOUBLE:
    ``floor(x * 10^k + 0.5) / 10^k`` — every step a correctly-rounded
    IEEE op on the binary value, so both engines produce the identical
    double.

    Native ROUND is NOT portable on doubles: Spark rounds the SHORTEST
    DECIMAL rendering (Java BigDecimal.valueOf) while DuckDB rounds the
    binary value, so ROUND(1.005, 2) = 1.01 in Spark but 1.0 in DuckDB
    (the stored double is 1.00499999999999989...). Any ratio of small
    integers can land on such a value (3/2000 = 0.0015 prints as a
    half at 3 places but sits below it in binary) — a silent oracle
    hash mismatch waiting on the right denominator.

    Convention: half cases round toward +infinity (floor(+0.5)), which
    also differs from both engines' away-from-zero on exact negative
    halves — consistency across engines is the contract, not agreement
    with either native ROUND. Operand magnitude must keep x*10^k
    within 2^52 (integer-exact doubles) — true for every rounded
    metric in this repo. NULL propagates; NaN is passed through by an
    explicit isnan guard (Spark's floor returns BIGINT and would
    swallow NaN to 0 while DuckDB's floor keeps it — the exact
    divergence this helper exists to prevent). Do not feed infinities
    (Spark's floor->bigint would overflow under ANSI mode)."""
    del dialect  # identical expression text in spark and duckdb
    # e-notation literals: both engines type 1e4 as DOUBLE, while a
    # plain 10000.0 parses as DECIMAL (and silently switches the whole
    # expression to decimal arithmetic with a different result type)
    return (
        f"(CASE WHEN isnan({x}) THEN ({x})"
        f" ELSE floor(({x}) * 1e{k} + 5e-1) / 1e{k} END)"
    )


def round_to_col(col, k: int):
    """Column-level round_to_expr for Spark call sites (same
    floor-based portable formula incl. the NaN passthrough; see
    round_to_expr for why native ROUND cannot be used on doubles
    destined for the oracle gate)."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    scale = float(10 ** k)
    rounded = F.floor(col * scale + F.lit(0.5)) / F.lit(scale)
    return F.when(F.isnan(col), col).otherwise(rounded)


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower_expr(dialect: str, text: str) -> str:
    """ASCII-only case fold via translate — IDENTICAL in both engines.
    Full lower() is NOT portable: Java's toLowerCase (Spark) is
    context-sensitive (U+0130 'İ' -> 'i'+combining dot, Greek final
    sigma at word end), DuckDB's is not — so any lower()-keyed hash
    diverges on such text. Exact-dedup keys fold ASCII only; non-ASCII
    case variants count as distinct (the deterministic choice — full
    Unicode case folding is engine-specific by nature)."""
    del dialect  # same function/semantics in spark and duckdb
    return f"translate({text}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def n_words_expr(dialect: str, text: str) -> str:
    """Whitespace-token count: split on any whitespace run (spaces,
    tabs, newlines) and drop empty tokens, so empty / whitespace-only
    text counts 0 words (a bare split returns [''] → 1)."""
    if dialect == "spark":
        return f"size(filter(split({text}, '\\\\s+'), w -> w != ''))"
    return f"len(list_filter(string_split_regex({text}, '\\s+'), w -> w != ''))"


def words_expr(dialect: str, text: str) -> str:
    """DISTINCT words of a text column. Set semantics only — DuckDB's
    list_distinct does NOT preserve order, so never build order-sensitive
    structures (shingles, fingerprints) from this."""
    if dialect == "spark":
        return f"array_distinct(split(trim({text}), ' +'))"
    # two-arg trim: see ordered_words_expr (Spark/DuckDB trim parity)
    return f"list_distinct(string_split_regex(trim({text}, ' '), ' +'))"


def word_hashes_expr(dialect: str, words: str) -> str:
    """32-bit hash per word, md5 computed once per word."""
    t = "transform" if dialect == "spark" else "list_transform"
    return f"{t}({t}({words}, s -> md5(s)), m -> {hex_to_i32('m')})"


def shingles_expr(dialect: str, words: str, n: int = 3) -> str:
    """Word n-gram shingles (default 3), distinct.

    Spark: the words array is LET-BOUND via a single-element-array
    transform (``transform(array(words), ws -> ...)``), so the inner
    per-position ``element_at(ws, i)`` hits a materialized array.
    Naively inlining ``words`` into the lambda re-evaluates the split
    per position — Spark's subexpression elimination does not run inside
    higher-order-function lambdas, which made shingling ~10x slower.
    """
    if dialect == "spark":
        parts = ", ".join(f"element_at(ws, i + {j})" for j in range(n))
        body = (
            f"transform(sequence(1, size(ws) - {n - 1}),"
            f" i -> concat_ws(' ', {parts}))"
        )
        # sequence(1, k) descends when k < 1 -> guard short docs
        return (
            f"array_distinct(element_at(transform(array({words}), ws -> "
            f"CASE WHEN size(ws) >= {n} THEN {body} ELSE array() END), 1))"
        )
    parts = " || ' ' || ".join(f"{words}[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, len({words}) - {n - 2}),"
        f" i -> {parts}))"
    )


def minhash_expr(dialect: str, hashes: str, k: int) -> str:
    """k-th minhash over a BIGINT hash list."""
    t = "transform" if dialect == "spark" else "list_transform"
    amin = "array_min" if dialect == "spark" else "list_min"
    a, b = _coeff_a(k), _coeff_b(k)
    return (
        f"{amin}({t}({hashes}, h -> (CAST({a} AS BIGINT) * h"
        f" + CAST({b} AS BIGINT)) % {MERSENNE31}))"
    )


def minhash_sig_expr(dialect: str, hashes: str, num_hashes: int) -> str:
    """ALL ``num_hashes`` minhash components as one array<bigint> in a
    single pass (Spark dialect).

    Building the signature as array(minhash_expr(0), minhash_expr(1), …)
    is a trap: Catalyst's projection collapse inlines the upstream
    ``word_hashes`` (an md5 per shingle) into every component, so md5
    runs K times per document. This form keeps one aggregate over the
    hash list — md5 once, K affine permutations per element, zip_with
    min-fold. Same values, ~K× less hashing.

    DuckDB has no list-accumulator reduce; the oracle keeps per-k
    minhash_expr over a MATERIALIZED hash CTE (computed once there too).
    """
    if dialect != "spark":
        raise ValueError("minhash_sig_expr is the Spark fast path; "
                         "use minhash_expr per-k for duckdb oracles")
    a_arr = ", ".join(f"CAST({_coeff_a(k)} AS BIGINT)" for k in range(num_hashes))
    b_arr = ", ".join(f"CAST({_coeff_b(k)} AS BIGINT)" for k in range(num_hashes))
    perms = (
        f"transform(sequence(1, {num_hashes}), k ->"
        f" (element_at(array({a_arr}), k) * h + element_at(array({b_arr}), k))"
        f" % {MERSENNE31})"
    )
    init = f"transform(sequence(1, {num_hashes}), k -> CAST({MERSENNE31} AS BIGINT))"
    return (
        f"aggregate({hashes}, {init},"
        f" (acc, h) -> zip_with(acc, {perms}, (x, y) -> least(x, y)))"
    )


def simhash_single_pass_expr(hashes: str, bits: int = 32) -> str:
    """SimHash in ONE aggregate pass (Spark dialect): array-of-votes
    accumulator, finish-lambda folds votes into the signature bigint.

    The naive rendering (simhash_expr) scans the hash list once per bit
    — and worse, projection collapse inlines the md5-per-shingle hash
    computation into each of the ``bits`` vote terms. Identical values.
    """
    votes = (
        f"transform(sequence(0, {bits - 1}), j ->"
        f" CAST(shiftright(h, j) & 1 AS BIGINT) * 2 - 1)"
    )
    init = f"transform(sequence(0, {bits - 1}), j -> CAST(0 AS BIGINT))"
    fold = (
        f"aggregate(zip_with(acc, sequence(0, {bits - 1}),"
        f" (v, j) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), j)"
        f" ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (s, x) -> s + x)"
    )
    return (
        f"aggregate({hashes}, {init},"
        f" (acc, h) -> zip_with(acc, {votes}, (x, y) -> x + y),"
        f" acc -> {fold})"
    )


def band_hash_expr(minhashes: list[str]) -> str:
    """Fold one band's minhashes into a single BIGINT (dialect-neutral
    Horner fold; values < 2^31 so the fold stays < 2^46)."""
    acc = minhashes[0]
    for m in minhashes[1:]:
        acc = f"(({acc}) * 31 + {m}) % {MERSENNE31}"
    return f"({acc})"


def rolling_hash_expr(dialect: str, hashes: str) -> str:
    """Order-sensitive polynomial fingerprint over a hash list
    (the document-fingerprint primitive)."""
    if dialect == "spark":
        return (
            f"aggregate({hashes}, CAST(0 AS BIGINT),"
            f" (acc, x) -> (acc * 31 + x) % {MERSENNE31})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashes}),"
        f" (acc, x) -> (acc * 31 + x) % {MERSENNE31})"
    )


def simhash_expr(dialect: str, hashes: str, bits: int = 32) -> str:
    """SimHash over a BIGINT hash list: bit j of the result is set when
    the sum of (+1/-1) votes of bit j across hashes is positive."""
    t = "transform" if dialect == "spark" else "list_transform"
    lsum = "aggregate" if dialect == "spark" else "list_sum"
    terms = []
    for j in range(bits):
        if dialect == "spark":
            vote = (
                f"aggregate({t}({hashes}, h -> CAST((h >> {j}) & 1 AS BIGINT)"
                f" * 2 - 1), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            )
        else:
            vote = f"list_sum({t}({hashes}, h -> ((h >> {j}) & 1) * 2 - 1))"
        terms.append(
            f"(CASE WHEN {vote} > 0 THEN CAST({1 << j} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return "(" + " + ".join(terms) + ")"


def jaccard_expr(dialect: str, a: str, b: str) -> str:
    """Exact Jaccard of two DISTINCT element lists."""
    if dialect == "spark":
        return (
            f"CAST(size(array_intersect({a}, {b})) AS DOUBLE)"
            f" / size(array_union({a}, {b}))"
        )
    return (
        f"CAST(len(list_intersect({a}, {b})) AS DOUBLE)"
        f" / len(list_distinct(list_concat({a}, {b})))"
    )


def dot_expr(dialect: str, a: str, b: str, dims: int | None = None) -> str:
    """Double-precision dot product of two float-array columns
    (sequential fold — deterministic and identical across engines).

    With ``dims`` (fixed-width vectors, e.g. 64-dim embeddings) the Spark
    side emits an UNROLLED left-associated sum of element_at terms
    instead of aggregate(zip_with(...)). Higher-order-function lambdas
    are CodegenFallback — interpreted per element, closure allocation per
    row — while the unrolled sum whole-stage-codegens; measured ~5x on a
    pair-join of 64-dim vectors. Left-association reproduces the fold's
    FP summation order exactly ((0+t1)+t2 == t1+t2 in IEEE), so results
    stay bit-identical with the DuckDB oracle. Requires every array to
    have >= dims elements (ANSI element_at raises otherwise — the
    fixed-width contract this operator documents)."""
    if dialect == "spark":
        if dims is not None:
            terms = " + ".join(
                f"CAST(element_at({a}, {i + 1}) AS DOUBLE)"
                f" * CAST(element_at({b}, {i + 1}) AS DOUBLE)"
                for i in range(dims)
            )
            return f"({terms})"
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) ->"
            f" CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def filter_count_expr(dialect: str, arr: str, inlist: list[str]) -> str:
    """Count of elements of ``arr`` contained in a literal string list."""
    t = "filter" if dialect == "spark" else "list_filter"
    ln = "size" if dialect == "spark" else "len"
    lits = ", ".join(f"'{w}'" for w in inlist)
    return f"{ln}({t}({arr}, w -> w IN ({lits})))"


def hash_bucket_expr(
    dialect: str, id_col: str, buckets: int = 100, seed: int = 0
) -> str:
    """Deterministic bucket in [0, buckets) from a NON-NEGATIVE
    integer id — the portable primitive behind hash sampling and
    train/val/test splits. (Negative ids would ride each dialect's
    signed-% convention through the chain; all fixture/surrogate ids
    are non-negative, so the expression stays branch-free.)
    Knuth multiplicative step mod 2^31-1; the id is first reduced mod
    1_000_003 so the product stays < 2^52 (exact in BIGINT for Spark's
    ANSI mode AND in DuckDB without HUGEINT promotion). Identical text
    in both dialects — plain arithmetic only.

    ``seed`` salts the hash per PURPOSE: with one unseeded hash,
    (h % 1000) % 100 == h % 100, so a 1000-bucket stratified-sample
    filter composed with a later 100-bucket split over the same id
    correlates (a kept stratum at a non-multiple-of-0.1 rate feeds the
    downstream split a biased residue mix). Distinct seeds make the
    bucket assignments of different pipeline stages independent. seed=0
    reproduces the historical unsalted expression byte-for-byte."""
    base = f"CAST({id_col} AS BIGINT) % 1000003"
    if seed:
        base = f"(({base}) + {int(seed)}) % 1000003"
    h = f"(({base}) * 2654435761) % {MERSENNE31}"
    return f"(({h}) % {buckets})"


def wide_hash_expr(dialect: str, id_col: str, seed: int = 0) -> str:
    """Full-width (62-bit) portable hash key for TRAINING-ORDER
    shuffles, where key collisions degrade the product: two
    independent Knuth stages over DIFFERENT prime moduli (1000003 and
    999983), packed as ``h1 * 2^31 + h2``.

    ``hash_bucket_expr`` reduces the id mod 1000003 before hashing
    (the product-exactness trick), so its key has at most ~1e6
    distinct values — fine for BUCKET assignment, but as a SORT key
    every id pair colliding mod 1000003 would tie and fall back to
    ascending-id order, silently turning the per-epoch permutation of
    a >1M-doc corpus into deterministic stride-structured runs. With
    two coprime moduli a key collision needs id_a == id_b mod
    (1000003 * 999983) ~ 1e12 — residual ties at that density are
    ordinary hash ties, not structure.

    Exactness: each stage's product is < 1000003 * 2654435761 < 2^52
    (exact BIGINT in Spark ANSI and DuckDB without HUGEINT promotion),
    and the pack h1 * 2^31 + h2 < 2^62 stays in BIGINT. Identical
    expression text in both dialects — plain arithmetic only."""
    key = f"CAST({id_col} AS BIGINT)"
    parts = []
    for prime in (1000003, 999983):
        base = f"({key}) % {prime}"
        if seed:
            base = f"(({base}) + {int(seed)}) % {prime}"
        parts.append(f"((({base}) * 2654435761) % {MERSENNE31})")
    return f"(({parts[0]}) * 2147483648 + ({parts[1]}))"


def bigrams_all_expr(dialect: str, words: str) -> str:
    """ALL word bigrams in document order (NOT distinct — repetition
    statistics need multiplicity). Same let-binding discipline as
    shingles_expr on the Spark side; short docs (<2 words) yield an
    empty list in both dialects."""
    if dialect == "spark":
        body = (
            "transform(sequence(1, size(ws) - 1),"
            " i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"
        )
        return (
            f"element_at(transform(array({words}), ws -> "
            f"CASE WHEN size(ws) >= 2 THEN {body} ELSE array() END), 1)"
        )
    return (
        f"list_transform(range(1, len({words})),"
        f" i -> {words}[i] || ' ' || {words}[i + 1])"
    )


def top_count_expr(dialect: str, arr: str) -> str:
    """Highest multiplicity of any element of ``arr`` (the mode's
    count), 0 for an empty list. O(distinct * n) per row — documents are
    short (hundreds of words), so this stays a per-row expression with
    no shuffle; a corpus-wide mode would be a groupBy instead.

    Spark's array_max errors on empty arrays under ANSI; guard both
    dialects with an explicit CASE."""
    if dialect == "spark":
        body = (
            "array_max(transform(array_distinct(xs),"
            " x -> size(filter(xs, y -> y = x))))"
        )
        return (
            f"element_at(transform(array({arr}), xs -> "
            f"CASE WHEN size(xs) = 0 THEN CAST(0 AS INT) ELSE {body} END), 1)"
        )
    body = (
        f"list_max(list_transform(list_distinct({arr}),"
        f" x -> len(list_filter({arr}, y -> y = x))))"
    )
    return f"(CASE WHEN len({arr}) = 0 THEN 0 ELSE {body} END)"


def word_len_sum_expr(dialect: str, words: str) -> str:
    """Total character count over a word list (exact integer).
    CHARACTERS on both sides: DuckDB ``strlen`` counts UTF-8 BYTES and
    silently diverged from Spark's ``length`` on any multi-byte word
    (found by the shingle-family property test) — ``length`` is the
    character count in both engines."""
    if dialect == "spark":
        return (
            f"aggregate({words}, CAST(0 AS BIGINT),"
            f" (acc, w) -> acc + length(w))"
        )
    return (
        f"list_sum(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({words}, w -> CAST(length(w) AS BIGINT))))"
    )


def fixed_ln_expr(dialect: str, x: str, sqrts: int = 20,
                  scale_bits: int = 20) -> str:
    """Fixed-point natural log of a POSITIVE double expression,
    bit-identical across engines: ``floor(2^scale_bits * ln(x) + 0.5)``
    as BIGINT, with ln approximated by the repeated-sqrt identity

        ln(x) ~= 2^k * (x^(1/2^k) - 1),   x^(1/2^k) = sqrt applied k times

    — the same correctly-rounded-sqrt trick temperature_mix uses for
    portable powers (IEEE 754 requires sqrt correctly rounded, so both
    engines walk the identical double sequence; native LN/LOG differ
    between libm implementations in the last ulps and are banned from
    gate-hashed columns). Every other step is exact or correctly
    rounded on identical operands: the scale factors are powers of two
    (exact), s - 1 is exact near 1 (Sterbenz), and floor(y + 0.5)
    rounds half toward +infinity consistently in both engines.

    Approximation error vs true ln is ~ln(x)^2 / 2^(k+1) — about 1e-4
    absolute at k=20 for ratios within [1e-6, 1e6]; callers get a
    deterministic SCORE with documented log semantics, not a libm ln.
    Intended for SMALL relations (per-bucket/model rows): the chained
    sqrt is ~k flops per row, trivial there, wasteful per-corpus-row."""
    del dialect  # sqrt/floor/CAST spell identically in both engines
    s = x
    for _ in range(sqrts):
        s = f"sqrt({s})"
    return (
        f"CAST(floor((({s}) - 1e0) * {float(2 ** sqrts)!r}"
        f" * {float(2 ** scale_bits)!r} + 5e-1) AS BIGINT)"
    )
