from .tables import TABLES, load_table, load_tables, get_spark, configure
from .views import register_views
from .io import read_table, write_table
from .bucketing import write_bucketed, read_bucketed
