"""ml.HashingTF-compatible murmur3 as a NATIVE (UDF-free) expression.

Why this exists (SURVEY §7 handoff note b / VERDICT r7 item 4):
``F.hash`` and ``pyspark.ml.feature.HashingTF`` both run murmur3_x86_32
with seed 42 over the term's UTF-8 bytes, but they use DIFFERENT tail
handling for byte lengths not divisible by 4:

* ``F.hash`` → ``Murmur3_x86_32.hashUnsafeBytes``: every trailing byte
  is mixed as its OWN block (``h1 = mixH1(h1, mixK1(byte))``) — a
  Spark-lenient variant, not standard murmur3.
* ``HashingTF`` → ``hashUnsafeBytes2``: trailing bytes accumulate
  little-endian into one ``k1``, then ``h1 ^= mixK1(k1)`` — standard
  murmur3_x86_32.

So the two agree exactly when ``octet_length(term) % 4 == 0`` and can
disagree otherwise.  This module provides the standard
(``hashUnsafeBytes2``) variant three ways, pinned against each other
and against the real ``HashingTF.indexOf`` in
``tests/test_hashingtf_parity.py``:

* :func:`murmur3_py` — pure-Python reference implementation;
* :func:`with_murmur3` / :func:`with_hashingtf_index` — native Spark
  SQL expressions (no Python UDF), rendered as a data-dependent
  ``aggregate()``/``transform()`` higher-order program since r11 (see
  the Spark-surface section comment: the unrolled form's ~255 KB
  codegen unit cost ~3 s of Janino compile per query and evaluated all
  8 word rounds for every token);
* :func:`hashingtf_index_duckdb_items` — the unrolled word-round
  program rendered in DuckDB's dialect, so hashed-feature queries are
  DuckDB-oracle-checkable.

The two renderings share the same overflow-free non-negative-BIGINT
arithmetic (16-bit-split multiplies, div-based shifts) and differ only
in loop structure; value agreement is pinned three ways — murmur3_py
property tests, real ``HashingTF.indexOf`` parity, and the driver's
DuckDB oracle compare on every hashed-features entry.  Terms longer
than ``max_bytes`` FAIL LOUDLY on the Spark side via ``assert_true`` —
never silent truncation.  The DuckDB rendering writes a NAMED
intermediate per step (nested subqueries), keeping the expression tree
linear — a naive nested column expression duplicates operands per
rotate/multiply and grows exponentially (~50M nodes at 32 bytes; it
OOMed a 1 GiB driver).

All arithmetic stays in non-negative BIGINT space: 32-bit multiplies
split into 16-bit halves so no intermediate exceeds 2^49 — overflow-free
under Spark 4's default ANSI mode.

Reference parity: the reference featurizes tokenized complaint
narratives with pyspark.ml TF transformers (CountVectorizer in
complaints_narrative_LDA.py:70-80); HashingTF is that family's
hashed-dimension sibling, and this module makes it cross-checkable
instead of trust-me.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_SEED = 42
_M32 = 1 << 32


# ---------------------------------------------------------------------------
# pure-Python reference (tested against pyspark.ml.feature.HashingTF)
# ---------------------------------------------------------------------------


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _MASK32


def murmur3_py(data: bytes, seed: int = _SEED) -> int:
    """Standard murmur3_x86_32 (Spark's ``hashUnsafeBytes2``), returned
    as a SIGNED 32-bit int — exactly ``HashingTF``'s internal hash."""
    h1 = seed & _MASK32
    n_words = len(data) // 4
    for i in range(n_words):
        k1 = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        h1 ^= _mix_k1(k1)
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _MASK32
    k1 = 0
    for shift, b in enumerate(data[4 * n_words :]):
        k1 ^= (b & 0xFF) << (8 * shift)
    h1 ^= _mix_k1(k1)
    # fmix
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1 - _M32 if h1 >= (1 << 31) else h1


def hashingtf_index_py(term: str, num_features: int) -> int:
    """``HashingTF.indexOf`` = ``Utils.nonNegativeMod(hash, n)``."""
    h = murmur3_py(term.encode("utf-8"))
    return (h % num_features + num_features) % num_features


# ---------------------------------------------------------------------------
# shared SQL program generator
# ---------------------------------------------------------------------------


class _SparkDialect:
    """Spark SQL rendering (selectExpr items, lateral column aliases)."""

    def hex_utf8(self, col: str) -> str:
        return f"hex(encode({col}, 'UTF-8'))"

    def octet_len(self, col: str) -> str:
        return f"cast(octet_length({col}) as bigint)"

    def hex_int(self, hx: str, pos_sql: str, len_sql: str) -> str:
        # conv returns NULL/'0' beyond the string end → 0
        return (
            f"coalesce(cast(conv(substring({hx}, {pos_sql}, {len_sql}), 16, 10)"
            f" as bigint), 0)"
        )

    def xor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})"

    def idiv(self, a: str, b: int) -> str:
        return f"({a} div {b})"


class _DuckDBDialect:
    def hex_utf8(self, col: str) -> str:
        return f"to_hex(encode({col}))"

    def octet_len(self, col: str) -> str:
        return f"cast(octet_length(encode({col})) as bigint)"

    def hex_int(self, hx: str, pos_sql: str, len_sql: str) -> str:
        return (
            f"coalesce(try_cast(('0x' || substring({hx}, {pos_sql}, {len_sql}))"
            f" as bigint), 0)"
        )

    def xor(self, a: str, b: str) -> str:
        return f"xor({a}, {b})"

    def idiv(self, a: str, b: int) -> str:
        return f"({a} // {b})"


def _murmur3_program(
    col_sql: str, prefix: str, dialect, max_bytes: int = 32, seed: int = _SEED
) -> tuple[list[tuple[str, str]], str]:
    """Emit ``(steps, final_name)``: a linear list of ``(name, expr)``
    steps (each expr may reference earlier names) whose final name holds
    the signed 32-bit murmur3 hash of ``col_sql``."""
    if max_bytes % 4 != 0 or max_bytes <= 0:
        raise ValueError(f"max_bytes must be a positive multiple of 4, got {max_bytes}")
    d = dialect
    items: list[tuple[str, str]] = []

    def emit(name: str, expr: str) -> str:
        items.append((f"{prefix}_{name}", expr))
        return f"{prefix}_{name}"

    def mul32(a: str, c: int) -> str:
        c_lo, c_hi = c & 0xFFFF, c >> 16
        if c_hi == 0:
            return f"(({a}) * {c_lo} % {_M32})"
        return f"((({a}) * {c_lo} + (({a}) * {c_hi} % 65536) * 65536) % {_M32})"

    def rotl(a: str, r: int) -> str:
        return f"((({a}) * {1 << r} % {_M32}) + {d.idiv(f'({a})', 1 << (32 - r))})"

    hx = emit("hx", d.hex_utf8(col_sql))
    nb = emit("nb", d.octet_len(col_sql))

    h = emit("h0", f"cast({seed} as bigint)")
    for w in range(max_bytes // 4):
        # ONE hex parse per 4-byte word (big-endian), byte-swapped to the
        # little-endian word murmur3 consumes by pure arithmetic — 8 hex
        # parses per 32-byte term instead of 32 (the per-byte variant was
        # ~15 µs/term; string slicing dominated the projection).  Partial
        # parses beyond the string end yield garbage that the nb guard on
        # the h-chain masks (CaseWhen branches evaluate lazily per row).
        be = emit(f"b{w}", d.hex_int(hx, str(8 * w + 1), "8"))
        word = emit(
            f"w{w}",
            f"({d.idiv(be, 1 << 24)} + ({d.idiv(be, 1 << 16)} % 256) * 256"
            f" + ({d.idiv(be, 1 << 8)} % 256) * 65536 + ({be} % 256) * 16777216)",
        )
        ka = emit(f"k{w}a", mul32(word, _C1))
        kb = emit(f"k{w}b", rotl(ka, 15))
        kc = emit(f"k{w}c", mul32(kb, _C2))
        hxr = emit(f"hx{w}", d.xor(h, kc))
        hrr = emit(f"hr{w}", rotl(hxr, 13))
        h = emit(
            f"h{w + 1}",
            f"(case when {nb} >= {4 * (w + 1)}"
            f" then ({mul32(hrr, 5)} + 3864292196) % {_M32} else {h} end)",
        )

    # tail: little-endian fold of the 0-3 trailing bytes, one hex parse.
    # The big-endian partial value tv (tl bytes) byte-swaps per length:
    # tl=1 → tv; tl=2 → b0 + b1·256; tl=3 → b0 + b1·256 + b2·65536.
    ts = emit("ts", f"({d.idiv(nb, 4)} * 4)")
    tl = emit("tl", f"({nb} - {ts})")
    tv = emit("tv", d.hex_int(hx, f"({ts} * 2 + 1)", f"({tl} * 2)"))
    k = emit(
        "tk",
        f"(case when {tl} = 1 then {tv}"
        f" when {tl} = 2 then {d.idiv(tv, 1 << 8)} + ({tv} % 256) * 256"
        f" when {tl} = 3 then {d.idiv(tv, 1 << 16)}"
        f" + ({d.idiv(tv, 1 << 8)} % 256) * 256 + ({tv} % 256) * 65536"
        f" else cast(0 as bigint) end)",
    )
    ta = emit("ta", mul32(k, _C1))
    tb = emit("tb", rotl(ta, 15))
    tc = emit("tc", mul32(tb, _C2))
    h = emit("hT", d.xor(h, tc))

    # fmix
    h = emit("f0", d.xor(h, nb))
    h = emit("f1", d.xor(h, d.idiv(h, 1 << 16)))
    h = emit("f2", mul32(h, 0x85EBCA6B))
    h = emit("f3", d.xor(h, d.idiv(h, 1 << 13)))
    h = emit("f4", mul32(h, 0xC2B2AE35))
    h = emit("f5", d.xor(h, d.idiv(h, 1 << 16)))

    final = emit("m3", f"(case when {h} >= {1 << 31} then {h} - {_M32} else {h} end)")
    return items, final


# ---------------------------------------------------------------------------
# Spark DataFrame surface
# ---------------------------------------------------------------------------
#
# The Spark rendering is a HIGHER-ORDER-FUNCTION program, not the
# unrolled word loop the DuckDB oracle uses.  The unrolled form emitted
# ~100 lateral-alias steps → a ~255 KB whole-stage-codegen unit: ~3 s of
# Janino compile PER QUERY (the docs_hashed_features bench constant
# adjudicated in r11) and eager evaluation of all 8 word rounds for
# every token even though natural-language tokens average ~6 bytes.
# Folding the word loop into aggregate()/transform() emits the mix
# expression ONCE (≈40 KB codegen unit, compiles in well under a
# second) and iterates DATA-DEPENDENTLY — a 6-byte token runs one word
# round, not eight.  Measured at sf0.1 (270k tokens, local[8]): 4.6 s →
# 1.2 s end-to-end; fixed plan cost 3.2 s → 0.6 s.
#
# Value parity with the DuckDB unrolled rendering is pinned three ways:
# murmur3_py (property tests), pyspark.ml HashingTF.indexOf
# (tests/test_hashingtf_parity.py), and the driver's DuckDB oracle
# compare on every hashed-features entry.


def _murmur3_hof_steps(
    col_sql: str, prefix: str, max_bytes: int = 32, seed: int = _SEED
) -> tuple[list[tuple[str, str]], str]:
    """Emit the Spark-only higher-order-function step program: a short
    ``(name, expr)`` list (hex, length, word array, one aggregate() over
    the murmur3 word mix, tail fold, fmix) whose final name holds the
    signed 32-bit murmur3 of ``col_sql``'s UTF-8 bytes.

    All arithmetic is the same overflow-free non-negative-BIGINT program
    as ``_murmur3_program`` (16-bit-split multiplies, div-based shifts);
    only the loop structure differs.  NULL inputs propagate to NULL
    through the NULL word array (slice/transform/aggregate of NULL).
    """
    if max_bytes % 4 != 0 or max_bytes <= 0:
        raise ValueError(f"max_bytes must be a positive multiple of 4, got {max_bytes}")
    items: list[tuple[str, str]] = []

    def emit(name: str, expr: str) -> str:
        items.append((f"{prefix}_{name}", expr))
        return f"{prefix}_{name}"

    def mul32(a: str, c: int) -> str:
        c_lo, c_hi = c & 0xFFFF, c >> 16
        if c_hi == 0:
            return f"(({a}) * {c_lo} % {_M32})"
        return f"((({a}) * {c_lo} + (({a}) * {c_hi} % 65536) * 65536) % {_M32})"

    def rotl(a: str, r: int) -> str:
        return f"((({a}) * {1 << r} % {_M32}) + (({a}) div {1 << (32 - r)}))"

    hx = emit("hx", f"hex(encode({col_sql}, 'UTF-8'))")
    nb = emit("nb", f"cast(octet_length({col_sql}) as bigint)")
    # one hex parse per word (big-endian), then a second transform pass
    # byte-swaps to little-endian — two passes so the parse is evaluated
    # ONCE per word (a single-pass expr references the parse 4×, and
    # higher-order lambdas evaluate per reference, not per name)
    bes = emit(
        "bes",
        f"transform(slice(sequence(0, {max_bytes // 4 - 1}), 1,"
        f" cast({nb} div 4 as int)),"
        f" __w -> coalesce(cast(conv(substring({hx}, 8 * __w + 1, 8),"
        f" 16, 10) as bigint), 0))",
    )
    swap = (
        "((__be) div 16777216 + ((__be) div 65536 % 256) * 256"
        " + ((__be) div 256 % 256) * 65536 + ((__be) % 256) * 16777216)"
    )
    words = emit("words", f"transform({bes}, __be -> {swap})")
    kc = mul32(rotl(mul32("__k", _C1), 15), _C2)
    hmix = f"({mul32(rotl(f'(__h ^ {kc})', 13), 5)} + 3864292196) % {_M32}"
    h_words = emit(
        "hW",
        f"aggregate({words}, cast({seed} as bigint), (__h, __k) -> {hmix})",
    )
    # tail: little-endian fold of the 0-3 trailing bytes, one hex parse
    tv = emit(
        "tv",
        f"coalesce(cast(conv(substring({hx}, {nb} div 4 * 8 + 1,"
        f" ({nb} % 4) * 2), 16, 10) as bigint), 0)",
    )
    tk = emit(
        "tk",
        f"(case when {nb} % 4 = 1 then {tv}"
        f" when {nb} % 4 = 2 then ({tv} div 256) + ({tv} % 256) * 256"
        f" when {nb} % 4 = 3 then ({tv} div 65536)"
        f" + (({tv} div 256) % 256) * 256 + ({tv} % 256) * 65536"
        f" else cast(0 as bigint) end)",
    )
    tc = mul32(rotl(mul32(tk, _C1), 15), _C2)
    h = emit("f0", f"(({h_words} ^ {tc}) ^ {nb})")
    h = emit("f1", f"({h} ^ ({h} div 65536))")
    h = emit("f2", mul32(h, 0x85EBCA6B))
    h = emit("f3", f"({h} ^ ({h} div 8192))")
    h = emit("f4", mul32(h, 0xC2B2AE35))
    h = emit("f5", f"({h} ^ ({h} div 65536))")
    final = emit("m3", f"(case when {h} >= {1 << 31} then {h} - {_M32} else {h} end)")
    return items, final


def with_murmur3(
    df: DataFrame, in_col: str, out_col: str, max_bytes: int = 32
) -> DataFrame:
    """Append ``out_col`` = standard murmur3_x86_32(seed 42) of the
    UTF-8 bytes of string column ``in_col`` (signed 32-bit, as bigint).

    Native SQL expressions only — no Python transfer; at 100 TB this
    hashes tokens JVM-side.  The word loop is a data-dependent
    ``aggregate()`` higher-order function (see module-section comment:
    ~8× smaller codegen unit and no wasted rounds on short tokens vs
    the unrolled form the DuckDB oracle rendering keeps).  Values
    longer than ``max_bytes`` raise at runtime (assert_true).
    """
    steps, final = _murmur3_hof_steps(in_col, f"__m3_{out_col}", max_bytes)
    items = [f"{expr} AS {name}" for name, expr in steps]
    # NULL terms pass the guard and hash to NULL (the nb=NULL chain
    # propagates) — matching the DuckDB rendering; without the IS NULL
    # arm, assert_true(NULL) would kill the job with a bogus max_bytes
    # message (r8 review finding).
    guard = (
        f"coalesce(cast(assert_true({in_col} IS NULL OR "
        f"octet_length({in_col}) <= {max_bytes}, "
        f"concat('murmur3 term exceeds max_bytes={max_bytes}: ', {in_col})) as bigint), "
        f"{final})"
    )
    keep = df.columns
    return df.selectExpr("*", *items, f"{guard} AS {out_col}").select(*keep, out_col)


def with_hashingtf_index(
    df: DataFrame, in_col: str, out_col: str, num_features: int, max_bytes: int = 32
) -> DataFrame:
    """Append ``out_col`` = ``HashingTF(numFeatures).indexOf(in_col)``
    as a native int column (``pmod`` = Java ``nonNegativeMod`` here)."""
    tmp = f"__m3h_{out_col}"
    out = with_murmur3(df, in_col, tmp, max_bytes=max_bytes)
    return out.selectExpr(
        *df.columns, f"cast(pmod({tmp}, {num_features}) as int) AS {out_col}"
    )


# ---------------------------------------------------------------------------
# DuckDB rendering (for oracle_sql)
# ---------------------------------------------------------------------------
#
# DuckDB's binder resolves lateral column aliases by INLINING the
# referenced expression (not by introducing a projection), so the same
# step list rendered as one flat select list re-creates the exponential
# blowup (a 20-row hash query ran >2 min before being killed).  Nested
# subqueries bind as real projections and stay linear (measured: 96
# chained levels with double references bind in ~17 ms), so the DuckDB
# rendering wraps each step in its own subquery level, carrying only the
# columns still LIVE (referenced by a later step or requested by the
# caller).


def steps_to_nested_subqueries(
    inner_sql: str,
    carry_cols: list[str],
    input_cols: list[str],
    steps: list[tuple[str, str]],
    final: str,
    out_name: str,
    alias_prefix: str,
) -> str:
    """Render a ``(name, expr)`` step program over ``inner_sql`` as one
    nested-subquery-per-step chain — the ONE wrapping implementation
    every generated step program shares (murmur3, Hilbert, future
    programs; r8 review finding: the liveness loop was copy-pasted).

    Each level carries ``carry_cols`` ∪ ``input_cols`` ∪ any earlier
    step name still referenced by a later expr (a conservative substring
    scan).  Returns a parenthesized subquery selecting
    ``carry_cols + [final AS out_name]``.
    """
    q = f"({inner_sql})"
    for i, (name, expr) in enumerate(steps):
        later = " ".join(e for _, e in steps[i + 1 :])
        live = [c for c in carry_cols if c not in input_cols] + list(input_cols)
        for prev_name, _ in steps[:i]:
            if prev_name in later or prev_name == final:
                live.append(prev_name)
        q = f"(select {', '.join(live)}, {expr} as {name} from {q} as {alias_prefix}{i})"
    outer = ", ".join(list(carry_cols) + [f"{final} as {out_name}"])
    return f"(select {outer} from {q} as {alias_prefix}f)"


def murmur3_duckdb_subquery(
    inner_sql: str,
    carry_cols: list[str],
    term_col: str,
    out_name: str,
    max_bytes: int = 32,
) -> str:
    """Wrap ``inner_sql`` (a query exposing ``carry_cols`` and string
    column ``term_col``) in nested subqueries computing the signed
    murmur3 hash of ``term_col`` into column ``out_name``.

    Returns a parenthesized subquery selecting ``carry_cols + [out_name]``;
    splice into ``SELECT ... FROM <this> t``.  Assumes every term
    satisfies ``octet_length(term) <= max_bytes`` (mirror the Spark
    guard with a WHERE filter on both sides).
    """
    steps, final = _murmur3_program(term_col, f"__m3_{out_name}", _DuckDBDialect(), max_bytes)
    return steps_to_nested_subqueries(
        inner_sql, list(carry_cols), [term_col], steps, final, out_name, "__m3q"
    )


def hashingtf_index_duckdb_subquery(
    inner_sql: str,
    carry_cols: list[str],
    term_col: str,
    out_name: str,
    num_features: int,
    max_bytes: int = 32,
) -> str:
    """Like :func:`murmur3_duckdb_subquery` but producing
    ``HashingTF.indexOf(term)`` (nonNegativeMod of the hash)."""
    tmp = f"__m3raw_{out_name}"
    sub = murmur3_duckdb_subquery(inner_sql, carry_cols, term_col, tmp, max_bytes)
    cols = ", ".join(carry_cols)
    return (
        f"(select {cols}, cast((({tmp}) % {num_features} + {num_features})"
        f" % {num_features} as int) as {out_name} from {sub} as __m3ix)"
    )
