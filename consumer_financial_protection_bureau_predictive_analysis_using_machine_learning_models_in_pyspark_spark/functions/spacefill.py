"""Hilbert-curve index as native Spark + DuckDB integer SQL.

The layout family's locality ladder: a 1-D sort clusters one dimension
and stripes the other; Z-order (operators/layout.py) clusters both into
squares but takes long diagonal jumps between quadrants; the Hilbert
curve removes the jumps — consecutive index values are ALWAYS
grid-adjacent, so range-bucketed files get strictly tighter bounding
boxes at the same bit depth (the reason newer lake formats offer
OPTIMIZE ... HILBERT alongside ZORDER).

Same generation discipline as functions/hashing.py: ONE unrolled step
program (the classic xy2d state machine, ~7 steps per bit level; all
arithmetic — the quadrant Gray code (3·rx) XOR ry is folded to
``3·rx + ry − 2·rx·ry`` so no dialect bitwise ops are needed) rendered
into a Spark lateral-alias projection AND nested DuckDB subqueries, so
the engine column and the oracle can never drift.  Tested by exhaustive
bijection + unit-step adjacency against the pure-Python reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .hashing import _DuckDBDialect, _SparkDialect


# ---------------------------------------------------------------------------
# pure-Python reference
# ---------------------------------------------------------------------------


def hilbert_xy2d_py(x: int, y: int, bits: int) -> int:
    """Hilbert xy2d: map (x, y) in [0, 2^bits)² to the curve index d in
    [0, 4^bits).  The coordinates are MASKED to the remaining sub-square
    (``x %= s``) before each rotation, so every intermediate stays
    non-negative — the textbook variant flips with the high bits still
    attached and relies on two's-complement ``&`` semantics, which
    SQL ``div``/``%`` do not reproduce.  Masking yields the same family
    of curves (bijective, unit-step adjacent; pinned in tests)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        x %= s
        y %= s
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


# ---------------------------------------------------------------------------
# shared step program
# ---------------------------------------------------------------------------


def _hilbert_program(
    xa: str, ya: str, prefix: str, dialect, bits: int = 8
) -> tuple[list[tuple[str, str]], str]:
    """Emit ``(steps, final_name)`` computing the Hilbert index of the
    two integer-binned SQL expressions ``xa``/``ya`` (each in
    [0, 2^bits)).  Each step may reference earlier names."""
    d = dialect
    items: list[tuple[str, str]] = []

    def emit(name: str, expr: str) -> str:
        items.append((f"{prefix}_{name}", expr))
        return f"{prefix}_{name}"

    x = emit("x0", f"cast({xa} as bigint)")
    y = emit("y0", f"cast({ya} as bigint)")
    dd = emit("d0", "cast(0 as bigint)")
    for lvl in range(bits):
        s = 1 << (bits - 1 - lvl)
        rx = emit(f"rx{lvl}", f"({d.idiv(x, s)} % 2)")
        ry = emit(f"ry{lvl}", f"({d.idiv(y, s)} % 2)")
        # (3·rx) XOR ry over {0,1}² == 3·rx + ry − 2·rx·ry (pure arithmetic)
        dd = emit(
            f"d{lvl + 1}",
            f"({dd} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}))",
        )
        if lvl == bits - 1:
            break  # final rotation never affects d
        # mask to the remaining sub-square BEFORE rotating: keeps every
        # intermediate in [0, s) so div/% never see a negative (see
        # hilbert_xy2d_py docstring)
        xm = emit(f"xm{lvl}", f"({x} % {s})")
        ym = emit(f"ym{lvl}", f"({y} % {s})")
        fx = emit(
            f"fx{lvl}",
            f"(case when {ry} = 1 then {xm}"
            f" when {rx} = 1 then {s - 1} - {xm} else {xm} end)",
        )
        fy = emit(
            f"fy{lvl}",
            f"(case when {ry} = 1 then {ym}"
            f" when {rx} = 1 then {s - 1} - {ym} else {ym} end)",
        )
        x = emit(f"x{lvl + 1}", f"(case when {ry} = 0 then {fy} else {xm} end)")
        y = emit(f"y{lvl + 1}", f"(case when {ry} = 0 then {fx} else {ym} end)")
    return items, dd


# ---------------------------------------------------------------------------
# renderings
# ---------------------------------------------------------------------------


def with_hilbert(
    df: DataFrame, x_col: str, y_col: str, out_col: str, bits: int = 8
) -> DataFrame:
    """Append ``out_col`` = Hilbert index of the integer bin columns
    ``x_col``/``y_col`` (each must already be in [0, 2^bits) — the
    binning is the caller's min-max scaling, same as zorder_values).
    Native integer SQL, linear Project chain, no UDF, no shuffle."""
    steps, final = _hilbert_program(x_col, y_col, f"__hb_{out_col}", _SparkDialect(), bits)
    items = [f"{expr} AS {name}" for name, expr in steps]
    keep = df.columns
    return df.selectExpr("*", *items, f"{final} AS {out_col}").select(*keep, out_col)


def hilbert_duckdb_subquery(
    inner_sql: str,
    carry_cols: list[str],
    x_col: str,
    y_col: str,
    out_name: str,
    bits: int = 8,
) -> str:
    """Wrap ``inner_sql`` (exposing ``carry_cols`` + integer bin columns
    ``x_col``/``y_col``) in nested subqueries computing the Hilbert
    index into ``out_name``.  Returns a parenthesized subquery selecting
    ``carry_cols + [out_name]`` (nested because DuckDB inlines lateral
    aliases; the wrapping is hashing.steps_to_nested_subqueries — one
    shared implementation for every step program)."""
    from .hashing import steps_to_nested_subqueries

    steps, final = _hilbert_program(
        x_col, y_col, f"__hb_{out_name}", _DuckDBDialect(), bits
    )
    return steps_to_nested_subqueries(
        inner_sql, list(carry_cols), [x_col, y_col], steps, final, out_name, "__hbq"
    )
