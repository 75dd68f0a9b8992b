from .naming import qcol, standardize_col_name, standardize_unique  # noqa: F401
