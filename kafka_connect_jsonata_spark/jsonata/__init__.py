"""JSONata expression engine, Spark-first.

The reference embeds JSONata4Java 2.4.5 (reference pom.xml:45-49) and calls
``Expressions.parse`` / ``expr.evaluate(json, timeoutMs, maxDepth)``
(reference JsonataTransformation.java:68,104). We implement the JSONata
language (public spec, jsonata.org) natively:

- ``tokenizer`` / ``parser`` — text -> AST (pure Python, driver-side).
- ``interpreter``            — tier 2: tree-walking evaluator over Python
  dict/list trees with the reference's timeout + recursion guards; 100%
  semantic coverage; wrapped as a pandas UDF for the dynamic tier.
- ``compiler``               — tier 1: AST -> native pyspark Column
  expressions for the compilable subset (Catalyst optimizes; no Python in
  the hot path).
"""

from kafka_connect_jsonata_spark.jsonata.errors import JsonataError
from kafka_connect_jsonata_spark.jsonata.parser import parse
from kafka_connect_jsonata_spark.jsonata.interpreter import Jsonata, UNDEFINED

__all__ = ["parse", "Jsonata", "JsonataError", "UNDEFINED"]
