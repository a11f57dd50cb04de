from kafka_connect_jsonata_spark.sources.readers import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
