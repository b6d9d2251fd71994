from .literals import (  # noqa: F401
    canonical_double_col, canonical_double_col_jvm, canonical_double_sql,
)  # noqa: F401
