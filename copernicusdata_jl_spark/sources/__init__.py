from .datatree import (  # noqa: F401
    DataTree,
    open_datatree,
    open_json_datatree,
    open_parquet_datatree,
    normalize_fill_value,
)
from .mapping import apply_mapping, open_mapped_datatree  # noqa: F401
