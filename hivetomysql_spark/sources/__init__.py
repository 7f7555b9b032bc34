from hivetomysql_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_hive_table,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_tsv_dump,
)
