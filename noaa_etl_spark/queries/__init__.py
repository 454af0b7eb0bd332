"""Graded query modules. Importing this package populates the registry."""

from noaa_etl_spark import registry

registry.load_all_queries()

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
