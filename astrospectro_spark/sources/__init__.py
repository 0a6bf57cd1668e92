from .io import read_table, write_catalog_csv, read_catalog_csv  # noqa: F401
