from .tables import FIXTURE_TABLES, load_table  # noqa: F401
