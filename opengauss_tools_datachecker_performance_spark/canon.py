"""Canonicalization: every value → deterministic string.

The reference's single most semantics-laden layer: two rows are equal
iff their canonical strings are equal.  Per-type rules from
datachecker-extract/.../task/functional/SimpleTypeHandlerFactory.java
(see SURVEY.md §1.2 for the file:line table).  Re-expressed here as
vectorized Catalyst expressions — no per-row handler objects, no
Python: the whole canonical projection stays inside whole-stage
codegen.

Rules implemented (reference file:line in each function):
- strings: identity                       (SimpleTypeHandlerFactory.java:138-140)
- integers: plain decimal string          (:368-402)
- decimal(p,s): toPlainString             (:434-452)
- float/double w/ scale: %.<scale>f       (:63-75,262-358)
- boolean: true/false                     (:520-522)
- binary/blob: upper hex                  (:489-510; HexUtil.java)
- date: yyyy-MM-dd                        (:49,182-187)
- timestamp(scale): yyyy-MM-dd HH:mm:ss[.f*scale]  (:165-172,553-563)
- NULL: stays SQL NULL at this layer; it is mapped to "" only inside
  digests (HashHandler.java:58) — preserving the reference's split
  between the canonical map (null) and the hash input ("").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def canon_string(c: Column) -> Column:
    return c.cast("string")


def canon_integer(c: Column) -> Column:
    return c.cast("long").cast("string")


def canon_decimal(c: Column) -> Column:
    # Spark decimal → string never produces scientific notation and
    # keeps the declared scale, matching toPlainString() semantics.
    return c.cast("string")


def canon_float(c: Column, scale: int | None = None) -> Column:
    """Float/double: fixed ``scale`` digits when declared, else the
    shortest round-trip string (Spark's default double→string)."""
    if scale is not None:
        # format_number inserts thousands separators; strip them to
        # match the reference's %.<scale>f (SimpleTypeHandlerFactory.java:63-75).
        return F.regexp_replace(F.format_number(c.cast("double"), scale), ",", "")
    return c.cast("double").cast("string")


def canon_boolean(c: Column) -> Column:
    return c.cast("boolean").cast("string")


def canon_bit(c: Column) -> Column:
    """bit(1) → "0"/"1" — distinct from boolean's "true"/"false"
    (SimpleTypeHandlerFactory.java:87-95)."""
    return c.cast("boolean").cast("int").cast("string")


def canon_unsigned(c: Column) -> Column:
    """unsigned bigint → full-precision decimal string; Spark has no
    unsigned longs, so values arriving as decimal(20,0)/string pass
    through a decimal cast (SimpleTypeHandlerFactory.java:412-424)."""
    return c.cast("decimal(20,0)").cast("string")


def canon_time(c: Column) -> Column:
    """TIME-of-day → ``HH:mm:ss`` (SimpleTypeHandlerFactory.java:209-214).
    Accepts timestamp-like input; Spark's TIME type (4.x) also formats
    through the same expression after a timestamp cast."""
    return F.date_format(c.cast("timestamp"), "HH:mm:ss")


def canon_double_plain(c: Column) -> Column:
    """Double → string with scientific notation expanded, mirroring the
    reference's BigDecimal.toPlainString expansion at FULL precision
    (SimpleTypeHandlerFactory.java:262-358). Values whose Spark string
    form is already plain pass through unchanged; E-notation values are
    expanded by shifting the decimal point of the shortest-round-trip
    mantissa with string ops — no bounded decimal cast, so 1e308 and
    1e-320 expand exactly instead of overflowing to NULL (every
    distinct double keeps a distinct string: the rewrite is a bijection
    of Java's injective toString). (Bit-compatibility with Java's
    toString is NOT the contract — SURVEY.md §1.4 — only determinism +
    injectivity on distinct values.)
    """
    s = c.cast("double").cast("string")
    # shortest-round-trip form is [-]d[.ddd]E[-]e  (one digit before the
    # point, no trailing zeros in the fraction except the lone ".0")
    mant = F.substring_index(s, "E", 1)
    exp = F.substring_index(s, "E", -1).cast("int")
    sign = F.when(mant.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    m = F.regexp_replace(mant, "^-", "")
    ip = F.substring_index(m, ".", 1)
    fp = F.when(m.contains("."), F.substring_index(m, ".", -1)).otherwise(F.lit(""))
    digits = F.concat(ip, fp)
    int_len = exp + F.lit(1)
    # E ≥ 0: place the point after 1+E digits (pad zeros if shorter);
    # digits never end in 0 on the fractional branch (only "d.0"
    # mantissas do, and those always take the integer branch at E ≥ 7)
    pos_frac = F.concat(
        F.substr(digits, F.lit(1), int_len),
        F.lit("."),
        F.substr(digits, int_len + 1, F.length(digits)),
    )
    pos_plain = F.when(
        F.length(digits) <= int_len,
        F.concat(digits, F.repeat(F.lit("0"), int_len - F.length(digits))),
    ).otherwise(pos_frac)
    # E < 0: 0.<(-E-1) zeros><digits>; trim the trailing zero a "d.0"
    # mantissa leaves (never trims to empty — digits lead with 1-9)
    neg_plain = F.regexp_replace(
        F.concat(F.lit("0."), F.repeat(F.lit("0"), -exp - F.lit(1)), digits),
        "0+$",
        "",
    )
    expanded = F.concat(sign, F.when(exp >= 0, pos_plain).otherwise(neg_plain))
    return F.when(s.contains("E"), expanded).otherwise(s)


def canon_binary(c: Column) -> Column:
    """bytes → upper-case hex (HexUtil + SimpleTypeHandlerFactory.java:489-510)."""
    return F.upper(F.hex(c))


# --- Oracle dialect (OracleResultSetHandler.java:40-54) ---------------
# The reference's third dialect handler maps NUMBER through BigDecimal
# (integer for scale ≤ 0, double for scale > 0, sci-notation
# flattened), RAW through JDBC getString (plain upper hex), BLOB
# through HexUtil.byteToHexTrim (upper hex, TRAILING ZERO BYTES
# dropped), CLOB/NCLOB through a BufferedReader.readLine loop (which
# CONCATENATES lines — line terminators vanish), XMLTYPE through
# getString.  Same families as the generic handlers above, but the
# edge behavior differs enough to warrant explicit expressions +
# goldens (tests/test_canon.py).


def canon_oracle_number(c: Column, scale: int = 0) -> Column:
    """NUMBER(p,s) → BigInteger string when -84 ≤ s ≤ 0, else the
    double's string with scientific notation expanded
    (SimpleTypeHandlerFactory.java:574-591 createOracleBigDecimalHandler).

    BigDecimal.toBigInteger() TRUNCATES toward zero (2.7 → 2,
    -2.7 → -2); a bare decimal(38,0) cast would round HALF_UP
    (2.7 → 3). ``c - (c % 1)`` is the type-generic truncation — exact
    for decimal inputs, overflow-free for doubles (Spark's % keeps the
    dividend's sign, so the subtraction moves toward zero for
    negatives too); the decimal cast then only relabels an
    already-integral value.

    Magnitudes beyond Spark's decimal(38,0) ceiling (only reachable
    from DOUBLE inputs — Spark decimals max out at 38 digits) fall
    back to :func:`canon_double_plain`: ``try_cast`` yields NULL
    exactly when the truncated value overflows decimal(38,0) (where a
    bare cast would abort under ANSI mode), and such doubles are
    integral (ulp ≥ 1 from 2^52), so the full-precision plain
    expansion IS the reference's toBigInteger() digit string.  A
    38-digit decimal input (e.g. NUMBER(38) of all nines) stays on
    the exact decimal path — a magnitude pre-check on the double cast
    would mis-route it (it rounds UP to 1e38 as a double)."""
    if -84 <= scale <= 0:
        trunc = c - (c % F.lit(1))
        return F.coalesce(
            trunc.try_cast("decimal(38,0)").cast("string"),
            canon_double_plain(trunc),
        )
    return canon_double_plain(c)


def canon_oracle_raw(c: Column) -> Column:
    """RAW → plain upper-case hex, no trim (createOracleRawHandler is
    ResultSet::getString; Oracle JDBC renders RAW as upper hex)."""
    return F.upper(F.hex(c))


def canon_oracle_blob(c: Column) -> Column:
    """BLOB → upper hex with trailing ZERO BYTES removed
    (HexUtil.byteToHexTrim: 02AA00 → 02AA).  The reference's trim loop
    unconditionally emits the byte at its slow pointer, so an ALL-zero
    array yields '00' — never the empty string; only a genuinely empty
    BLOB renders as ''."""
    hexs = F.upper(F.hex(c))
    trimmed = F.regexp_replace(hexs, "(00)+$", "")
    return F.when((trimmed == "") & (hexs != ""), F.lit("00")).otherwise(
        trimmed
    )


def canon_oracle_clob(c: Column) -> Column:
    """CLOB/NCLOB → the reader-loop concatenation of lines: line
    terminators are DROPPED, not normalized
    (createOracleClobHandler appends readLine() results bare)."""
    return F.regexp_replace(c.cast("string"), "\r\n|\r|\n", "")


def canon_oracle_xml(c: Column) -> Column:
    """XMLTYPE → pass-through string (createOracleXmlHandler)."""
    return c.cast("string")


def canon_date(c: Column) -> Column:
    return F.date_format(c.cast("date"), "yyyy-MM-dd")


def canon_timestamp(c: Column, scale: int = 0) -> Column:
    """Timestamp at fractional ``scale`` 0..6 (DateTimeFormatterMap.java:38-60)."""
    fmt = "yyyy-MM-dd HH:mm:ss" + ("." + "S" * scale if scale > 0 else "")
    return F.date_format(c.cast("timestamp"), fmt)


_BY_TYPE = {
    T.StringType: canon_string,
    T.IntegerType: canon_integer,
    T.LongType: canon_integer,
    T.ShortType: canon_integer,
    T.ByteType: canon_integer,
    T.BooleanType: canon_boolean,
    T.BinaryType: canon_binary,
    T.DateType: canon_date,
}


def canon_expr(field: T.StructField) -> Column:
    """Canonical-string expression for one schema field."""
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, T.DecimalType):
        return canon_decimal(c)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return canon_float(c)
    if isinstance(dt, T.TimestampType):
        return canon_timestamp(c)
    fn = _BY_TYPE.get(type(dt))
    if fn is not None:
        return fn(c)
    # arrays/structs/maps: canonical JSON (sorted span handling is done
    # upstream in digest.span_sequence_canonical, not here)
    return F.to_json(c)


def canonical_projection(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Project every column (or ``cols``) to its canonical string,
    keeping names — the Spark analogue of the reference's
    ResultSetHandler.putOneResultSetToMap (ResultSetHandler.java:83-101),
    but columnar."""
    fields = {f.name: f for f in df.schema.fields}
    names = cols or [f.name for f in df.schema.fields]
    return df.select(*[canon_expr(fields[n]).alias(n) for n in names])
