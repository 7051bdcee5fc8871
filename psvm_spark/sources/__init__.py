"""Custom Python data sources (Spark 4 DataSource API)."""
