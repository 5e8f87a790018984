"""ftp_blueprints_spark — a PySpark-native analytics engine with the
capabilities of shipyardapp/ftp-blueprints, extended with a relational
query surface and LLM-data-pipeline operators, designed for 100 TB scale.

Layers (SURVEY.md §7):
  functions/  — pure column-expression library (path/name semantics,
                text analysis, vector math)
  operators/  — DataFrame operators (manifest match/project, dedup,
                similarity, multimodal)
  plans/      — declared relational queries over the star schema
  sources/    — FTP connector (Python DataSource API) + action sinks
  streaming/  — Structured Streaming slice over `events`
"""

__version__ = "0.1.0"
