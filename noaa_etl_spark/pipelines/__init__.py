"""End-to-end pipelines demonstrating the reference layer (NOAA-style
weather ETL) assembled from the engine's operators."""
