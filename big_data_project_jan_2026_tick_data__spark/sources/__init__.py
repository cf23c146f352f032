from .io import (  # noqa: F401
    read_csv_ticks,
    read_parquet,
    read_testdata,
    write_parquet,
    write_csv_report,
)
