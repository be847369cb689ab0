"""Sources (SURVEY.md §2.1): parquet/Iceberg-style table catalog, the
interleaved-doc builder over the flat documents table, CSV with row
locators."""
