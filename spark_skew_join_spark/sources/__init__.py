from .tables import TABLES, load_table, load_tables, get_spark, configure
