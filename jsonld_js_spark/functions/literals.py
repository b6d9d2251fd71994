"""Canonical RDF literal lexical forms as Spark column expressions
(the vectorized counterpart of kernel/util.py canonical_double, which
implements ref lib/toRdf.js:237-243:
`toExponential(15).replace(/(\\d)0*e\\+?/, '$1E')`).

Rule (reference semantics): 15-significant-digit exponential form with
trailing fraction zeros stripped — but always at least one fraction
digit — and exponent rendered without '+' or leading zeros. Examples:
1.1 → 1.1E0, 5.0 → 5.0E0, 0.000125 → 1.25E-4, 1e21 → 1.0E21.

Built from '%.15E' (identical C-style double formatting in the JVM and
DuckDB), then regex/arith normalization — so the Spark column fn and
the DuckDB oracle SQL produce byte-identical strings; tests verify
both against the kernel's Python formatter on a value grid.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_double_col(col: Column) -> Column:
    """Exact reference-parity canonical doubles.

    NOT expressible with `format_string('%.15E', ...)`: the JVM
    Formatter rounds from `Double.toString`'s shortest representation
    (8.95 → '8.950000000000000E+00') while JS toExponential / C printf
    / Python '%.15e' round the exact binary value
    (→ '8.949999999999999e+0'). So this one function is an
    Arrow-batched pandas UDF over the kernel formatter — the documented
    exception to the all-JVM hot path (SURVEY.md §7 hard part 2).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _canon(s):  # pd.Series -> pd.Series (annotations break under
        # `from __future__ import annotations`; returnType is explicit)
        from ..kernel.util import canonical_double
        return pd.Series(
            [None if pd.isna(v) else canonical_double(v) for v in s])

    return _canon(col.cast("double"))


def canonical_double_col_jvm(col: Column) -> Column:
    """JVM-only variant (whole-stage codegen, no Python). Matches the
    canonical form except for doubles whose shortest repr rounds
    differently at 15 fraction digits than the exact expansion (e.g.
    8.95). Use when approximate canonical form is acceptable and the
    Python worker round-trip is not."""
    col = col.cast("double")
    col = F.when(col == 0, F.lit(0.0)).otherwise(col)  # -0 → 0 (JS)
    sci = F.format_string("%.15E", col)
    mant = F.regexp_extract(sci, r"^(-?\d\.\d{15})E", 1)
    exp = F.regexp_extract(sci, r"E([+-]\d+)$", 1).cast("int")
    mant_trim = F.regexp_replace(mant, r"0+$", "")
    mant_fixed = F.when(mant_trim.endswith("."),
                        F.concat(mant_trim, F.lit("0"))) \
        .otherwise(mant_trim)
    return F.concat(mant_fixed, F.lit("E"), exp.cast("string"))


def canonical_double_sql(expr: str) -> str:
    """DuckDB equivalent of canonical_double_col."""
    sci = (f"printf('%.15E', (case when cast({expr} as double) = 0 "
           f"then 0.0 else cast({expr} as double) end))")
    mant = f"regexp_extract({sci}, '^(-?\\d\\.\\d{{15}})E', 1)"
    exp = f"cast(regexp_extract({sci}, 'E([+-]\\d+)$', 1) as int)"
    mant_trim = f"regexp_replace({mant}, '0+$', '')"
    mant_fixed = (f"(case when {mant_trim} LIKE '%.' "
                  f"then {mant_trim} || '0' else {mant_trim} end)")
    return f"({mant_fixed} || 'E' || cast({exp} as string))"
