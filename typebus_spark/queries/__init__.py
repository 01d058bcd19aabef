"""Query inventory package.

Importing ANY submodule directly (e.g. ``typebus_spark.queries.similarity``)
first loads :mod:`typebus_spark.suite`, which imports every query module in
canonical registration order. Without this, a direct submodule import can
enter the cross-module dependency chain mid-way (similarity → dedup → text
→ suite → corpus → text-partial) and die on a circular import.
"""

import typebus_spark.suite  # noqa: F401  (registers all query modules)
