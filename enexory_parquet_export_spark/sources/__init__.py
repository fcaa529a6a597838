from .tables import CANONICAL_TABLES, load_table, register_views  # noqa: F401
from .writer import write_day_partitioned, remove_empty_days  # noqa: F401
