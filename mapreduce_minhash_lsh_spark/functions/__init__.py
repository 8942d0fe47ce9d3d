"""Column-level building blocks (pure ``pyspark.sql.functions``
expressions — JVM-side, whole-stage-codegen friendly; zero Python UDFs)."""
