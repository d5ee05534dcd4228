"""newspaper_spark package."""
