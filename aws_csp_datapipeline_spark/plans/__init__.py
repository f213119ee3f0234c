"""Query registry: named (spark, sf_dir) -> DataFrame plans with
DuckDB oracle twins (the driver-contract surface)."""
