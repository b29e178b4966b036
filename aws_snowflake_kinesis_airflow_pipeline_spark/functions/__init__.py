"""Column-level helper functions (all JVM-side built-ins unless noted)."""
