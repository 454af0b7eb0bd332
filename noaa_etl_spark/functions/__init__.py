"""Column-level helper functions (pure expression builders — everything
here stays JVM-side inside whole-stage codegen unless noted)."""
