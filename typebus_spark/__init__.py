"""typebus_spark — a PySpark-native re-expression of the typebus event-bus
engine (reference: coreyauger/typebus, surveyed in /root/repo/SURVEY.md).

Layers
------
- ``catalog``   : schema catalog + 3-rule evolution gate
                  (reference: typebus/macros/.../Typebus.scala:396-453)
- ``codec``     : PublishedEvent/EventMeta envelope encode/decode
                  (reference: event/package.scala:140-169)
- ``registry``  : typed stream registration — the five runtime maps
                  (reference: module/Module.scala:16-27)
- ``runtime``   : materializes registered streams as Structured Streaming
                  queries (reference: KafkaBus.scala:191-242)
- ``streaming`` : retry machine, RPC correlation, keyed entity state
- ``operators`` : analytic operators (dedup, similarity, text, as-of, ...)
- ``functions`` : scalar/vector helper expressions (all JVM-side built-ins)

Everything relational runs on stock Catalyst; custom logic is plain Python.
"""

from typebus_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
