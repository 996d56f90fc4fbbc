"""bathyscaphe_spark — PySpark-native re-creation of bathyscaphe (creekorful/bathyscaphe)."""

__version__ = "0.1.0"
