from .session import get_spark, tune_session
from .catalog import Catalog, TABLES

__all__ = ["get_spark", "tune_session", "Catalog", "TABLES"]
