from .columns import (
    derive_ts_columns,
    url_encode_path,
    with_literal_columns,
)

__all__ = ["derive_ts_columns", "url_encode_path", "with_literal_columns"]
