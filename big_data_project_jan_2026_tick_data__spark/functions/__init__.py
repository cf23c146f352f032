from .scalars import (  # noqa: F401
    parse_tick_ts,
    sanitize_table_name,
    symbol_prefix,
    window_id_str,
    clamped_spread,
)
from . import sql_macros  # noqa: F401
