"""Per-row byte-size and word-count expressions.

Re-expresses the reference's eager per-example TF micro-ops
(``tf_utils.py:20-41`` get_tensor_byte_size, ``tf_utils.py:44-60``
get_tensor_num_words) as pure Catalyst column expressions — vectorized,
whole-stage-codegen'd, no Python or TF in the row path (SURVEY §4).

Semantics parity:
- byte size: strings/binary -> byte length; fixed-width numerics ->
  dtype size (x element count for arrays/tensors); accumulate across
  all features of the row (tf_utils.py:26-38).
- word count: non-strings contribute 0; a string contributes
  ``len(s.strip().split(' '))`` — single-space split, so the empty
  string counts as 1 word and consecutive spaces produce empty tokens
  (tf_utils.py:44-51, verified by tf_utils_test.py:69-100).

Each expression has a twin SQL generator producing the identical ANSI
SQL so an external engine (the DuckDB oracle) computes byte-identical
results from the same dtype metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixed dtype widths, mirroring numpy/tf dtype.size used by
# tf_utils.py:26-28 (shape product x dtype size).
_WIDTHS: dict[type, int] = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.LongType: 8,
    T.FloatType: 4,
    T.DoubleType: 8,
    T.DateType: 4,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
}

# The same widths keyed by the names DuckDB's information schema /
# parquet reader uses, for SQL twin generation.
_SQL_WIDTHS: dict[str, int] = {
    "boolean": 1,
    "tinyint": 1,
    "smallint": 2,
    "int": 4,
    "integer": 4,
    "bigint": 8,
    "float": 4,
    "real": 4,
    "double": 8,
    "date": 4,
    "timestamp": 8,
}


def _strip(c: Column) -> Column:
    # Python str.strip() strips all leading/trailing whitespace; SQL
    # trim() only strips spaces — use a regexp for parity.
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def words_expr(col: str | Column) -> Column:
    """Word count of one string column (tf_utils.py:44-51 semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(_strip(F.coalesce(c, F.lit(""))), " ", -1)).cast("long")


def words_sql(col: str) -> str:
    """DuckDB twin of words_expr."""
    return (
        f"CAST(len(string_split(regexp_replace(coalesce({col}, ''),"
        f" '^\\s+|\\s+$', '', 'g'), ' ')) AS BIGINT)"
    )


def _bytes_of(c: Column, dt: T.DataType) -> Column:
    """Byte size of one value expression — recursive over arbitrary
    nesting, matching the reference's flatten-then-sum tensor sizing
    (``prod(shape) x dtype.size``, tf_utils.py:26-28; nested structures
    accumulate via tf.nest, tf_utils.py:33-38). A multidim tensor
    stored as array<array<...>> therefore sizes as total element count
    x element width."""
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return F.coalesce(F.octet_length(c), F.lit(0)).cast("long")
    if isinstance(dt, T.ArrayType):
        elem_w = _WIDTHS.get(type(dt.elementType))
        if elem_w is not None:
            return (F.coalesce(F.size(c), F.lit(0)) * elem_w).cast("long")
        # nested arrays / strings / structs: fold over elements, each
        # sized recursively; null elements contribute 0
        elem_dt = dt.elementType
        return F.coalesce(
            F.aggregate(
                c,
                F.lit(0).cast("long"),
                lambda acc, x: acc + _bytes_of(x, elem_dt),
            ),
            F.lit(0).cast("long"),
        )
    if isinstance(dt, T.StructType):
        # Nested dicts accumulate recursively (tf_utils.py:33-38).
        out = None
        for sub in dt.fields:
            e = _bytes_of(c.getField(sub.name), sub.dataType)
            out = e if out is None else out + e
        return out if out is not None else F.lit(0).cast("long")
    w = _WIDTHS.get(type(dt))
    if w is None:
        raise TypeError(f"unsupported type for byte sizing: {dt}")
    return F.when(c.isNull(), F.lit(0)).otherwise(F.lit(w)).cast("long")


def _field_bytes_expr(field: T.StructField) -> Column:
    return _bytes_of(F.col(field.name), field.dataType)


def row_bytes_expr(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Total serialized byte size of a row across all (or the given)
    columns — the Catalyst twin of get_tensor_byte_size over the whole
    example (tf_utils.py:20-41).
    """
    fields = [
        f for f in df.schema.fields if cols is None or f.name in cols
    ]
    if cols is not None:
        unknown = set(cols) - {f.name for f in df.schema.fields}
        if unknown:
            # a typo'd name would otherwise be silently dropped from
            # the byte sum (and an all-typo list crashed IndexError)
            raise ValueError(
                f"row_bytes_expr: unknown columns {sorted(unknown)}"
            )
    if not fields:
        return F.lit(0).cast("long")
    exprs = [_field_bytes_expr(f) for f in fields]
    out = exprs[0]
    for e in exprs[1:]:
        out = out + e
    return out.cast("long")


def row_bytes_sql(schema: list[tuple[str, str]]) -> str:
    """DuckDB twin of row_bytes_expr from (column, duckdb-type) pairs.

    Types: 'string'/'varchar', 'blob', fixed-width names in _SQL_WIDTHS,
    or 'list:<elem>' for lists of fixed-width elements.
    """
    parts = []
    for name, kind in schema:
        k = kind.lower()
        if k in ("string", "varchar", "text"):
            # DuckDB: strlen() is byte length for VARCHAR.
            parts.append(f"CAST(coalesce(strlen({name}), 0) AS BIGINT)")
        elif k in ("blob", "binary"):
            parts.append(f"CAST(coalesce(octet_length({name}), 0) AS BIGINT)")
        elif k.startswith("list:list:"):
            # 2-d tensor: flatten then count (total elements x width)
            w = _SQL_WIDTHS[k.split(":", 2)[2]]
            parts.append(
                f"CAST(coalesce(len(flatten({name})), 0) * {w} AS BIGINT)"
            )
        elif k.startswith("list:"):
            w = _SQL_WIDTHS[k.split(":", 1)[1]]
            parts.append(f"CAST(coalesce(len({name}), 0) * {w} AS BIGINT)")
        else:
            w = _SQL_WIDTHS[k]
            parts.append(
                f"CAST(CASE WHEN {name} IS NULL THEN 0 ELSE {w} END AS BIGINT)"
            )
    return "(" + " + ".join(parts) + ")"


def row_words_expr(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Total word count across all string columns of the row —
    get_tensor_num_words over the whole example (tf_utils.py:53-60;
    non-strings contribute 0).
    """
    string_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType) and (cols is None or f.name in cols)
    ]
    if not string_cols:
        return F.lit(0).cast("long")
    out = words_expr(string_cols[0])
    for c in string_cols[1:]:
        out = out + words_expr(c)
    return out.cast("long")


def row_words_sql(string_cols: list[str]) -> str:
    """DuckDB twin of row_words_expr."""
    if not string_cols:
        return "CAST(0 AS BIGINT)"
    return "(" + " + ".join(words_sql(c) for c in string_cols) + ")"


def format_group_count(delimiter: str = ",") -> Column:
    """'key<d>num_examples<d>num_bytes<d>num_words' line formatting —
    FormatGroupCount (count_utils.py:50-58), via concat_ws (no UDF).
    Expects columns group_id, num_examples, num_bytes, num_words.
    """
    # concat_ws SKIPS NULL fields (a NULL count would emit a 3-field
    # line, silently shifting every downstream parser's columns) —
    # coalesce keeps the field present as an empty string
    return F.concat_ws(
        delimiter,
        F.coalesce(F.col("group_id"), F.lit("")),
        F.coalesce(F.col("num_examples").cast("string"), F.lit("")),
        F.coalesce(F.col("num_bytes").cast("string"), F.lit("")),
        F.coalesce(F.col("num_words").cast("string"), F.lit("")),
    )
